"""er_invariant_check: the ledger⇔data invariant holds on the real
injector output, the DuckDB twin recomputes the identical summary from
the exported Parquet, and the oracle actually DETECTS tampering (a
corrupted dirty row flips at least one n_bad_* counter)."""

import glob

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from rayrl.invariant import ER_INVARIANT_ORACLE, EXPORT_DIR, er_invariant_check

BAD_COLS = [
    "n_chain_breaks", "n_bad_untouched", "n_bad_before", "n_bad_after",
    "n_bad_url", "n_bad_pristine", "n_bad_dup", "n_bad_twin",
    "n_lang_breaks", "n_bad_lang_untouched", "n_bad_lang_before",
    "n_bad_lang_after",
    "n_ts_breaks", "n_bad_ts_untouched", "n_bad_ts_before",
    "n_bad_ts_after",
]


def test_invariant_holds_and_oracle_detects_tampering(ray_session):
    res = er_invariant_check("/root/testdata/sf0.001")
    row = res.iloc[0]
    assert (res[BAD_COLS].iloc[0] == 0).all(), res.T
    assert row["n_twin_ledger"] == row["n_twin_rows"]
    assert row["n_dirty"] >= row["n_clean"]  # dups/twins append
    assert 0 < row["n_text_touched"] < row["n_clean"]

    # DuckDB twin over the exported triple reproduces the summary
    odf = duckdb.sql(ER_INVARIANT_ORACLE).df()
    pd.testing.assert_frame_equal(
        res[sorted(res.columns)].reset_index(drop=True),
        odf[sorted(odf.columns)].reset_index(drop=True),
        check_dtype=False,
    )

    # tamper with one ORIGINAL dirty row's text → the oracle must flag
    # it (touched row → n_bad_after; untouched → n_bad_untouched; and
    # a pristine row additionally fires n_bad_pristine)
    f = sorted(glob.glob(f"{EXPORT_DIR}/dirty/*.parquet"))[0]
    t = pq.read_table(f).to_pandas()
    orig_ix = t.index[t["row_uid"] < (1 << 60)][0]
    t.loc[orig_ix, "text"] = str(t.loc[orig_ix, "text"]) + " XTAMPERX"
    pq.write_table(
        __import__("pyarrow").Table.from_pandas(t, preserve_index=False), f
    )
    tampered = duckdb.sql(ER_INVARIANT_ORACLE).df()
    assert int(tampered[BAD_COLS].sum().sum()) >= 1


def test_invariant_zero_draw_chains(ray_session):
    """Spec chains that draw ZERO entries for a whole field family (no
    text ops; or nothing mutating at all) leave that chain's Dataset
    schemaless — the guards must skip those joins and the DuckDB twin
    must still reproduce the summary (r5 review: the text chain and
    any-touched joins were unguarded, unlike their lang/ts siblings)."""
    from rayrl.pipeline import ErrorSpec

    # date-only chain: text/lang chains empty, warc_ts chain live
    res = er_invariant_check(
        "/root/testdata/sf0.001",
        specs=[ErrorSpec("date_swap", 0.2, ("warc_ts",))],
        n_rows=400,
    )
    row = res.iloc[0]
    assert (res[BAD_COLS].iloc[0] == 0).all(), res.T
    assert row["n_text_touched"] == 0 and row["n_lang_touched"] == 0
    assert row["n_ts_touched"] > 0
    odf = duckdb.sql(ER_INVARIANT_ORACLE).df()
    pd.testing.assert_frame_equal(
        res[sorted(res.columns)].reset_index(drop=True),
        odf[sorted(odf.columns)].reset_index(drop=True),
        check_dtype=False,
    )

    # duplicates-only chain: nothing mutates, and add_duplicates copies
    # only ERRED ids — so zero dups too; every guard fires at once
    res = er_invariant_check(
        "/root/testdata/sf0.001",
        specs=[ErrorSpec("add_duplicates", 0.10, ("__dup__",))],
        n_rows=400,
    )
    row = res.iloc[0]
    assert (res[BAD_COLS].iloc[0] == 0).all(), res.T
    assert row["n_ledger"] == 0 and row["n_dirty"] == row["n_clean"]
    odf = duckdb.sql(ER_INVARIANT_ORACLE).df()
    pd.testing.assert_frame_equal(
        res[sorted(res.columns)].reset_index(drop=True),
        odf[sorted(odf.columns)].reset_index(drop=True),
        check_dtype=False,
    )
