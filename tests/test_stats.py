"""Unit tests for rayrl.stats: moment-merge associativity and the
deterministic sample gate. Oracle parity for the three queries rides
tests/test_entry_oracles.py's parametrized sweep."""

import numpy as np
import pandas as pd
import pyarrow as pa

from rayrl.stats import corr_covar_agg, hash_sample_mask


def test_corr_agg_merge_equals_single_pass():
    rng = np.random.default_rng(11)
    x = rng.normal(10, 3, 5000)
    y = 2.5 * x + rng.normal(0, 4, 5000)
    agg = corr_covar_agg("x", "y")
    whole = agg.accumulate_block(agg.init(None), pa.table({"x": x, "y": y}))
    parts = agg.init(None)
    for lo in range(0, 5000, 700):
        part = agg.accumulate_block(
            agg.init(None), pa.table({"x": x[lo : lo + 700], "y": y[lo : lo + 700]})
        )
        parts = agg.merge(parts, part)
    a, b = agg.finalize(whole), agg.finalize(parts)
    assert a["n"] == b["n"] == 5000
    assert abs(a["corr"] - b["corr"]) < 1e-12
    assert abs(a["covar_samp"] - b["covar_samp"]) < 1e-9
    # sanity vs pandas
    ref = pd.Series(x).corr(pd.Series(y))
    assert abs(a["corr"] - ref) < 1e-9


def test_corr_agg_degenerate():
    agg = corr_covar_agg("x", "y")
    one = agg.accumulate_block(agg.init(None), pa.table({"x": [1.0], "y": [2.0]}))
    out = agg.finalize(one)
    assert out["n"] == 1 and np.isnan(out["corr"])
    const = agg.accumulate_block(
        agg.init(None), pa.table({"x": [3.0, 3.0], "y": [1.0, 2.0]})
    )
    assert np.isnan(agg.finalize(const)["corr"])  # zero variance side


def test_hash_sample_mask_deterministic_and_calibrated():
    ids = np.arange(200_000, dtype=np.int64)
    m1 = hash_sample_mask(ids, 10)
    m2 = hash_sample_mask(ids[::-1], 10)[::-1]  # order-independent
    assert np.array_equal(m1, m2)
    rate = m1.mean()
    assert 0.09 < rate < 0.11
    # nested: a 5% sample is a subset of the 10% sample (prefix property)
    m5 = hash_sample_mask(ids, 5)
    assert not (m5 & ~m1).any()
