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


# ------------------------------------------- quantile log-sketch

def test_qsketch_accuracy_and_merge():
    import pyarrow as pa

    from rayrl.sketches import quantile_sketch_agg, _u2f
    from rayrl.quantiles import _f2u

    rng = np.random.default_rng(3)
    v = rng.lognormal(8, 2, 200_000)  # heavy-tailed, 5 decades of range
    qs = (0.25, 0.5, 0.75, 0.99)
    agg = quantile_sketch_agg("x", qs)
    whole = agg.accumulate_block(agg.init(None), pa.table({"x": v}))
    # merge law: chunked accumulation sums to the same histogram
    merged = agg.init(None)
    for lo in range(0, len(v), 30_000):
        merged = agg.merge(
            merged, agg.accumulate_block(agg.init(None), pa.table({"x": v[lo:lo + 30_000]}))
        )
    assert np.array_equal(whole, merged)
    est = agg.finalize(whole)
    for q in qs:
        exact = np.quantile(v, q, method="lower")
        assert abs(est[f"q{q}"] - exact) / exact < 0.04, (q, est[f"q{q}"], exact)


def test_u2f_inverts_f2u():
    from rayrl.sketches import _u2f
    from rayrl.quantiles import _f2u

    rng = np.random.default_rng(4)
    v = np.concatenate([rng.normal(0, 1e6, 1000), [-1.5, 0.0, 2.25, 1e-300, -1e300]])
    assert np.array_equal(_u2f(_f2u(v)), v)
    # monotone: sorted floats give sorted uints
    u = _f2u(np.sort(v))
    assert (np.diff(u.astype(np.float64)) >= 0).all()


def test_approx_matches_exact_query(ray_session):
    from rayrl.sketches import approx_order_price_quantiles
    from rayrl.quantiles import order_price_quantiles

    sf = "/root/testdata/sf0.001"
    approx = approx_order_price_quantiles(sf)
    exact = order_price_quantiles(sf)
    exact = exact.to_pandas() if hasattr(exact, "to_pandas") else exact
    m = approx.merge(exact, on=["o_orderpriority", "q"], suffixes=("_a", "_e"))
    assert len(m) == len(approx) > 0
    rel = (m["value_a"] - m["value_e"]).abs() / m["value_e"]
    assert (rel < 0.04).all(), m[rel >= 0.04]


def test_misra_gries_guarantees_any_layout(ray_session):
    import collections

    import pandas as pd
    import ray.data

    from rayrl.sketches import MG_K, misra_gries_agg

    # zipf-skewed synthetic corpus: a few heavy tokens + long tail
    rng = np.random.default_rng(9)
    vocab = [f"tok{i}" for i in range(2000)]
    weights = 1.0 / np.arange(1, len(vocab) + 1) ** 1.2
    weights /= weights.sum()
    docs = [
        " ".join(rng.choice(vocab, size=30, p=weights)) for _ in range(400)
    ]
    truth = collections.Counter(t for d in docs for t in d.split(" "))
    n_total = sum(truth.values())
    k = MG_K
    sure_heavy = {t for t, c in truth.items() if c > n_total / (k + 1)}
    assert len(sure_heavy) >= 5  # the fixture actually exercises the bound

    for nblocks in (2, 13):
        ds = ray.data.from_pandas(pd.DataFrame({"text": docs})).repartition(nblocks)
        out = ds.aggregate(misra_gries_agg("text", k))["heavy_hitters"]
        counts, err = out["counts"], out["err"]
        assert out["n_total"] == n_total
        assert len(counts) <= k
        assert sure_heavy <= set(counts), sure_heavy - set(counts)
        for t, est in counts.items():
            assert 0 <= truth[t] - est <= err + 1e-9, (t, est, truth[t], err)
