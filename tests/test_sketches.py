"""HLL sketch tests: accuracy vs exact, merge associativity,
parallelism independence."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from rayrl.sketches import (
    _hll_accumulate,
    _hll_estimate,
    HLL_P,
    approx_distinct_tokens,
    distinct_tokens_exact,
    hll_distinct_agg,
)


def test_hll_register_math_known_counts():
    rng = np.random.default_rng(5)
    for true_n in (100, 10_000, 300_000):
        h = rng.integers(0, 2**64, true_n, dtype=np.uint64)
        regs = _hll_accumulate(np.zeros(2**HLL_P, np.uint8), h, HLL_P)
        est = _hll_estimate(regs)
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_is_register_max():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 2**64, 5000, dtype=np.uint64)
    b = rng.integers(0, 2**64, 5000, dtype=np.uint64)
    ra = _hll_accumulate(np.zeros(2**HLL_P, np.uint8), a, HLL_P)
    rb = _hll_accumulate(np.zeros(2**HLL_P, np.uint8), b, HLL_P)
    rab = _hll_accumulate(ra, b, HLL_P)
    assert (np.maximum(ra, rb) == rab).all()


def test_hll_agg_vs_exact_and_parallelism(ray_session):
    sf = "/root/testdata/sf0.01"
    exact = int(distinct_tokens_exact(sf)["n_distinct"].iloc[0])
    approx = float(approx_distinct_tokens(sf)["approx_distinct"].iloc[0])
    assert abs(approx - exact) / exact < 0.03, (exact, approx)
    # same estimate at any block layout (merge associativity end-to-end)
    ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    a = ds.repartition(2).aggregate(hll_distinct_agg("text"))["approx_distinct"]
    b = ds.repartition(17).aggregate(hll_distinct_agg("text"))["approx_distinct"]
    assert a == b == pytest.approx(approx, abs=0.51)
