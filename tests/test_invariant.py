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


def test_chain_per_record_matches_slow_mirror():
    """_chain_per_record (the per-record first/last/breaks kernel the
    whole invariant hangs off, refactored in r5) vs a row-by-row
    mirror over hypothesis-random multi-entry ledgers, including ties
    and out-of-order input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rayrl.invariant import _chain_per_record

    entry = st.tuples(
        st.integers(0, 6),  # record_id (few ids → multi-entry chains)
        st.integers(0, 20),  # seq
        st.text("abc", min_size=0, max_size=2),  # before
        st.text("abc", min_size=0, max_size=2),  # after
    )

    @settings(max_examples=120, deadline=None)
    @given(st.lists(entry, min_size=1, max_size=40))
    def run(rows):
        # the bucketed caller never hands the kernel two entries of one
        # record with the SAME seq (seq is the ledger's per-record
        # mutation counter) — dedupe to honor that contract
        seen = set()
        rows = [r for r in rows if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
        df = pd.DataFrame(rows, columns=["record_id", "seq", "before", "after"])
        got = (
            _chain_per_record(df.sample(frac=1, random_state=1))
            .sort_values("record_id")
            .reset_index(drop=True)
        )
        want_rows = []
        for rid, g in df.sort_values(["record_id", "seq"]).groupby("record_id"):
            breaks = sum(
                g["after"].iloc[i] != g["before"].iloc[i + 1] for i in range(len(g) - 1)
            )
            want_rows.append((rid, g["before"].iloc[0], g["after"].iloc[-1], breaks))
        want = pd.DataFrame(
            want_rows, columns=["record_id", "first_before", "last_after", "n_breaks"]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    run()
