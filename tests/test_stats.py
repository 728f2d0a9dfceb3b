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


def test_global_row_number_layout_independent(ray_session):
    """The block-metadata prefix-sum rank must equal a driver argsort
    at ANY input block layout (the sort re-partitions, but the meta
    pass must still identify every block by its first key tuple)."""
    import ray

    from rayrl.analytics import global_row_number

    rng = np.random.default_rng(7)
    ids = np.arange(5_000, dtype=np.int64)
    vals = rng.integers(0, 50, size=len(ids)).astype(np.int64)  # heavy key ties
    df = pd.DataFrame({"id": ids, "v": vals})
    expect = df.sort_values(["v", "id"], ascending=[False, True]).reset_index(drop=True)
    expect["rank"] = np.arange(1, len(expect) + 1, dtype=np.int64)
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = (
            global_row_number(ds, ["v", "id"], descending=[True, False])
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_shuffled_documents_is_exact_permutation(ray_session):
    """shuffle_pos must be a bijection onto 1..N and reproduce the
    driver-side argsort of the multiplicative hash order."""
    import pyarrow.parquet as pq

    from rayrl.stats import SAMPLE_MOD, SAMPLE_MUL, SAMPLE_PRIME, shuffled_documents

    sf = "/root/testdata/sf0.001"
    got = shuffled_documents(sf).to_pandas().sort_values("shuffle_pos")
    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    n = len(ids)
    assert sorted(got["shuffle_pos"]) == list(range(1, n + 1))
    h = (ids.astype(np.int64) % SAMPLE_MOD) * SAMPLE_MUL % SAMPLE_PRIME
    order = np.lexsort((ids, h))
    assert list(got["doc_id"]) == list(ids[order])


def test_leakage_safe_splits_colocates_duplicates(ray_session):
    """Every copy of a duplicated text must land in the SAME split
    (the leakage guard), the assignment must be invariant to input
    block layout, and singleton docs must match corpus_splits' plain
    per-id hash (the representative IS the doc)."""
    from rayrl.stats import (
        LEAK_DUP_MOD,
        LEAK_DUP_SHIFT,
        SAMPLE_MOD,
        SAMPLE_MUL,
        SAMPLE_PRIME,
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
        leakage_safe_splits,
    )

    sf = "/root/testdata/sf0.001"
    got = leakage_safe_splits(sf).to_pandas()
    m = got.set_index("doc_id")["split"]
    dup_ids = [i for i in m.index if i >= LEAK_DUP_SHIFT]
    assert dup_ids, "fixture union produced no duplicate block"
    # co-location: the re-keyed copy inherits its source's split
    assert all(m[i] == m[i - LEAK_DUP_SHIFT] for i in dup_ids)
    # determinism across runs (block layout is Ray's to choose; two
    # executions must agree row-for-row)
    again = leakage_safe_splits(sf).to_pandas().set_index("doc_id")["split"]
    assert m.sort_index().equals(again.sort_index())
    # singleton docs (not in the dup block) follow the plain rep-hash
    labels = np.array(["train", "val", "test"])
    singles = m[(m.index < LEAK_DUP_SHIFT) & (m.index % LEAK_DUP_MOD != 0)]
    h = (singles.index.to_numpy(np.int64) % SAMPLE_MOD) * SAMPLE_MUL % SAMPLE_PRIME % 100
    want = labels[(h >= SPLIT_TRAIN_PCT).astype(np.int8) + (h >= SPLIT_VAL_PCT)]
    assert (singles.to_numpy() == want).all()


def test_source_dup_matrix_counts(ray_session):
    """Within-source pairs count C(c,2): the 'mirror' source holds one
    copy of every 5th doc plus a second copy of every 10th, so
    (mirror, mirror) = #(%10 docs) and each real source's cross count
    equals its mirrored docs (doubled for %10 ones)."""
    import pyarrow.parquet as pq

    from rayrl.stats import LEAK_DUP_MOD, source_dup_matrix

    sf = "/root/testdata/sf0.001"
    got = source_dup_matrix(sf).to_pandas()
    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    n10 = int((ids % (2 * LEAK_DUP_MOD) == 0).sum())
    within = got[(got["source_a"] == "mirror") & (got["source_b"] == "mirror")]
    assert int(within["n_dup_pairs"].iloc[0]) == n10
    # cross totals: every %5 doc contributes c_mirror pairs to its source
    cross = got[got["source_a"] != got["source_b"]]["n_dup_pairs"].sum()
    n5 = int((ids % LEAK_DUP_MOD == 0).sum())
    assert int(cross) == n5 + n10  # c=1 rows pair once, c=2 rows twice
