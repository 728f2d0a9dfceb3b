"""Round-4 regressions: the driver-window ordering contract, the
_small_linkage cache, and the logged (never silent) oversize-bucket
skips in the dedup pair scans (VERDICT r3 #1/#2/#4)."""

import logging

import numpy as np
import pandas as pd

import __ray_entry__ as entry_mod
from rayrl.dedup import _hamming_bucket_fn, _minhash_bucket_fn

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------- driver-window contract

def test_window_is_first_50_and_oracle_backed():
    """The driver verifies exactly the first ~50 queries() keys. The
    round-5 window: the SQL-checkable flagship invariant first, four
    er_* representatives, then only oracle-backed keys (the 19
    never-★-verified rows ahead of ★r3 re-confirmations), nothing
    duplicated, nothing missing."""
    q = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    assert len(entry_mod._WINDOW_FIRST) == 50
    assert q[:50] == entry_mod._WINDOW_FIRST
    assert len(set(entry_mod._WINDOW_FIRST)) == 50
    assert q[0] == "er_invariant_check" and "er_invariant_check" in oracles
    # rows-only representatives: the four er_* history keys + the r5
    # caret-model zoo (model training — non-SQL by nature)
    reps = {
        "er_linkage_metrics", "er_ledger", "er_error_rate",
        "er_perturb_flow", "er_model_zoo",
    }
    assert reps <= set(entry_mod._WINDOW_FIRST[:6])
    # every other window entry is oracle-backed
    rest = [k for k in entry_mod._WINDOW_FIRST if k not in reps]
    assert all(k in oracles for k in rest), [k for k in rest if k not in oracles]


def test_oracles_after_window_then_no_oracle_tail():
    q = list(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    tail = q[50:]
    # once a no-oracle key appears after the window, no oracle-backed
    # key may follow it (oracle-backed rows rotate back in first)
    seen_no_oracle = False
    for k in tail:
        if k not in oracles:
            seen_no_oracle = True
        else:
            assert not seen_no_oracle, f"oracle-backed {k} after no-oracle tail began"
    # folded intermediates are gone from the registry
    assert "doc_fingerprints" not in q
    assert "pq_codes" not in q
    # every oracle key still has a query
    assert set(entry_mod.oracle_sql()) <= set(q)


# ------------------------------------------------- _small_linkage cache

def test_small_linkage_cached_once(ray_session):
    entry_mod._LINKAGE_CACHE.clear()
    entry_mod._LINKAGE_BUILDS.clear()
    entry_mod.er_pair_metrics(SF_DIR)
    entry_mod.er_links_1to1(SF_DIR)
    entry_mod.er_best_links(SF_DIR)
    assert entry_mod._LINKAGE_BUILDS == [SF_DIR]
    # single-entry cache: a second sf_dir evicts, not accumulates
    assert len(entry_mod._LINKAGE_CACHE) == 1


# --------------------------------------------- logged oversize-bucket skips

def _minhash_bucket_df(n_big: int, n_small: int = 3) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "band": [0] * n_big + [1] * n_small,
            "band_hash": [7] * n_big + [9] * n_small,
            "doc_id": np.arange(n_big + n_small, dtype=np.int64),
        }
    )


def test_minhash_oversize_bucket_logged(caplog):
    fn = _minhash_bucket_fn("star", cap=5)
    with caplog.at_level(logging.WARNING, logger="rayrl.dedup"):
        out = fn(_minhash_bucket_df(10))
    # the 10-member bucket is dropped, the 3-member bucket survives
    assert len(out) == 2
    assert any("skipped 1 oversize bucket" in r.message for r in caplog.records)
    assert any("largest 10" in r.message for r in caplog.records)


def test_minhash_no_cap_keeps_all(caplog):
    fn = _minhash_bucket_fn("star", cap=None)
    with caplog.at_level(logging.WARNING, logger="rayrl.dedup"):
        out = fn(_minhash_bucket_df(10))
    assert len(out) == 9 + 2
    assert not caplog.records


def _hamming_bucket_df(n_big: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "seg": [0] * n_big + [1, 1],
            "val": [5] * n_big + [6, 6],
            "doc_id": np.arange(n_big + 2, dtype=np.int64),
            "fp": np.zeros(n_big + 2, dtype=np.int64),
        }
    )


def test_hamming_oversize_bucket_logged(caplog):
    fn = _hamming_bucket_fn("doc_id", "fp", 4, "doc_a", "doc_b", cap=5)
    with caplog.at_level(logging.WARNING, logger="rayrl.dedup"):
        out = fn(_hamming_bucket_df(8))
    assert len(out) == 1  # only the 2-member bucket's pair
    assert any("hamming_near_pairs: skipped 1 oversize" in r.message for r in caplog.records)


def test_hamming_no_cap_scans_all(caplog):
    fn = _hamming_bucket_fn("doc_id", "fp", 4, "doc_a", "doc_b", cap=None)
    with caplog.at_level(logging.WARNING, logger="rayrl.dedup"):
        out = fn(_hamming_bucket_df(8))
    assert len(out) == 8 * 7 // 2 + 1
    assert not caplog.records


# --------------------------------------------- twin ↔ scale-path coherence

def test_ngram_dup_clusters_match_components(ray_session):
    """The twin's components must agree with driver union-find over the
    exact pair list (same edges ⇒ same min-id labels)."""
    from rayrl.dedup import ngram_dup_clusters, ngram_jaccard_exact
    from rayrl.linkage.clustering import _driver_union_find

    pairs = ngram_jaccard_exact(SF_DIR).to_pandas()
    got = ngram_dup_clusters(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _driver_union_find(
        pairs.rename(columns={"doc_a": "node_a", "doc_b": "node_b"})
    ).rename(columns={"node": "doc_id", "label": "cluster"})
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rollup_cube_null_keys(ray_session, tmp_path):
    """NULL grouping keys must survive into every grain as the 'NULL'
    sentinel (ADVICE r3: pandas dropna silently removed them from the
    grand total) — engine vs the GROUPING()-disambiguated oracle."""
    import duckdb

    from rayrl.stats import (
        REVENUE_CUBE_ORACLE,
        REVENUE_ROLLUP_ORACLE,
        revenue_cube,
        revenue_rollup,
    )

    df = pd.DataFrame(
        {
            "o_orderpriority": ["1-URGENT", None, "2-HIGH", None],
            "o_orderstatus": ["F", "O", None, None],
            "o_totalprice": [10.0, 20.0, 30.0, 40.0],
        }
    )
    df.to_parquet(tmp_path / "orders.parquet", index=False)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet')")

    for fn, oracle in ((revenue_rollup, REVENUE_ROLLUP_ORACLE), (revenue_cube, REVENUE_CUBE_ORACLE)):
        got = fn(str(tmp_path)).sort_values(["priority", "status"]).reset_index(drop=True)
        want = con.sql(oracle).df().sort_values(["priority", "status"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # the grand total must count ALL four rows
        top = got[(got["priority"] == "ALL") & (got["status"] == "ALL")]
        assert int(top["n_orders"].iloc[0]) == 4


def test_marker_fingerprints_parity(ray_session):
    """Engine parity bits must equal SQL's non-overlapping
    length/replace counting (pc.count_substring parity)."""
    import duckdb

    from rayrl.dedup import _marker_list, marker_fingerprints

    got = marker_fingerprints(SF_DIR).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    bits = " | ".join(
        f"(CASE WHEN ((length(text) - length(replace(text, '{w}', ''))) // {len(w)}) % 2 = 1"
        f" THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i, w in enumerate(_marker_list())
    )
    want = con.sql(
        f"SELECT doc_id, {bits} AS fp FROM read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).df()
    assert np.array_equal(got["fp"].to_numpy(), want["fp"].to_numpy())


def test_c4_filter_discriminates(ray_session):
    """The filter battery must actually split the corpus (not pass or
    drop everything) and every survivor must satisfy the floors."""
    from rayrl.text import C4_MIN_CHARS, C4_MIN_TOKENS, c4_filtered

    got = c4_filtered(SF_DIR).to_pandas()
    import pyarrow.parquet as pq

    total = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    assert 0 < len(got) < total
    assert (got["n_tokens"] >= C4_MIN_TOKENS).all()
    assert (got["n_chars"] >= C4_MIN_CHARS).all()


def test_corpus_splits_partition_conservation(ray_session):
    """The three splits must partition the corpus exactly: doc and
    char totals conserve, and every split is non-empty at sf0.01."""
    from rayrl.stats import corpus_splits

    got = corpus_splits(SF_DIR).set_index("split")
    import duckdb

    want = duckdb.sql(
        f"SELECT count(*) AS n, sum(n_chars) AS ch FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    assert set(got.index) == {"train", "val", "test"}
    assert got["n_docs"].sum() == want["n"][0]
    assert got["total_chars"].sum() == want["ch"][0]
    assert (got["n_docs"] > 0).all()
