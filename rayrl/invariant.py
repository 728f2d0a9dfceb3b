"""Hard oracle for the error-injection flagship (VERDICT r4 #2).

The er_* family is rows-only in the driver because linkage/injection
semantics aren't SQL-expressible — but the NORTH-RULE INVARIANT is:
rows the ledger never touched must be byte-identical to clean per url,
and the ledger's before/after chain must reconcile exactly with the
dirty table. ``er_invariant_check`` runs the injector, exports the
(clean, dirty, ledger) triple to Parquet under /tmp, verifies the
invariant DISTRIBUTED (bucketed joins — no driver-side row loops), and
returns a one-row all-integer summary. ``ER_INVARIANT_ORACLE`` is a
DuckDB twin that recomputes the same summary from the exported Parquet
— so the driver's hash compare ★-verifies the engine's core
deliverable end-to-end.

Reference semantics being checked (file:line into /root/reference/):
- ledger shape + "only erred values enter the ledger": R/1_error.R:30-36
- every error op appends (id, field, before, after): update_error_record
  call sites, e.g. R/2_edit_errors.R and R/1_error.R:56-60
- realized-rate reads DISTINCT ledger ids: utils.R:648-661
- add_duplicates re-appends the PRISTINE original: R/6_file_based_errors.R:53-56
- twins get id "123{id}789": R/6_file_based_errors.R:167

Checks (every n_bad_* must be 0):
- n_bad_untouched: orig rows with no text-ledger entry whose text
  differs from clean (the byte-identity invariant).
- n_bad_before / n_bad_after: the text chain's first ``before`` must be
  the clean text; its last ``after`` must be the dirty text.
- n_chain_breaks: consecutive text entries must hand off after→before.
- n_bad_url: url is never an error target — must match clean on every
  original row.
- n_bad_pristine: rows with NO ledger entry of any mutating kind must
  match clean on text, lang AND warc_ts.
- n_bad_dup: add_duplicates copies must be byte-identical to clean.
- n_bad_twin: each twin ledger entry's ``after`` must equal the text of
  the dirty row holding the mangled id (and n_twin_rows ==
  n_twin_ledger).
- n_bad_lang_untouched / n_bad_lang_before / n_bad_lang_after /
  n_lang_breaks: the same chain contract for the ``lang`` field, where
  ``after`` can be NULL (make_missing) — nulls ride a chr(1) sentinel
  through the chain aggregation on BOTH engines because DuckDB's
  arg_max skips NULL args (a bare arg_max(after, seq) would silently
  return the penultimate value for a missing-last chain).
- n_bad_ts_untouched / n_bad_ts_before / n_bad_ts_after / n_ts_breaks:
  the chain contract for ``warc_ts`` (date_swap / date_transpose /
  date_replace). Ledger values are ISO strings
  (np.datetime_as_string); both engines normalize ledger strings AND
  table timestamps to '%Y-%m-%d %H:%M:%S' before comparing (the data
  is second-granularity, so the format is lossless).

With all three mutated fields chained, the invariant covers the FULL
mutating surface of the benchmark spec chain — the dirty table is
exactly (clean ⊕ ledger) or the hash check fails.
"""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd

import ray
import ray.data

EXPORT_DIR = "/tmp/rayrl_er_invariant"


def _chain_per_record(df: pd.DataFrame) -> pd.DataFrame:
    """Per-record text-chain summary over (record_id, seq, before,
    after) rows: first before, last after, count of after→before
    hand-off breaks. Vectorized over the bucket."""
    df = df.sort_values(["record_id", "seq"], kind="stable")
    rid = df["record_id"].to_numpy()
    first = np.concatenate([[True], rid[1:] != rid[:-1]])
    last = np.concatenate([rid[1:] != rid[:-1], [True]])
    before = df["before"].to_numpy()
    after = df["after"].to_numpy()
    brk = np.zeros(len(df), dtype=np.int64)
    if len(df) > 1:
        brk[:-1] = ((after[:-1] != before[1:]) & (rid[:-1] == rid[1:])).astype(np.int64)
    seg = np.flatnonzero(first)
    return pd.DataFrame(
        {
            "record_id": rid[first],
            "first_before": before[first],
            "last_after": after[last],
            # int64 is safe here: n_breaks is summed and then dropped
            # before any join (no null-padding, so no rule-14 exposure)
            "n_breaks": np.add.reduceat(brk, seg),
        }
    )


def er_invariant_check(sf_dir: str, specs=None, n_rows: int | None = None):
    """Inject at 10% on the pages fixture, export (clean, dirty,
    ledger) to EXPORT_DIR (overwritten per call — the DuckDB twin reads
    the same triple), and verify the ledger⇔data invariant with
    distributed joins. One all-int64 row; every n_bad_* must be 0.

    ``specs``/``n_rows`` exist for tests that force zero-draw chains
    (a spec list with no text ops, or none that mutate at all) — the
    driver and oracle always run the defaults."""
    from . import pipeline, synth
    from .schema import DUP_UID_OFFSET, TWIN_UID_OFFSET
    from .shuffle import bucketed_group_apply, bucketed_join

    import pyarrow.parquet as pq

    n = n_rows or max(
        2000, pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows // 12
    )
    clean = synth.pages_dataset(n).materialize()
    out = pipeline.mess_dataset(
        clean, pipeline.benchmark_specs(0.10) if specs is None else specs, seed=7
    )
    combined = out.combined.materialize()
    dirty = pipeline.strip_ledger(combined).materialize()
    ledger = pipeline.extract_ledger(combined).materialize()

    cols = ["row_uid", "record_id", "url", "warc_ts", "text", "lang"]
    shutil.rmtree(EXPORT_DIR, ignore_errors=True)
    clean.select_columns(cols).write_parquet(f"{EXPORT_DIR}/clean")
    dirty.select_columns(cols).write_parquet(f"{EXPORT_DIR}/dirty")

    n_clean = clean.count()
    n_dirty = dirty.count()
    n_ledger = ledger.count()
    if n_ledger:
        ledger.write_parquet(f"{EXPORT_DIR}/ledger")
    else:
        # zero draws: Ray writes NO files for an empty Dataset and the
        # oracle's read_parquet would fail — emit one typed empty file
        from .schema import LEDGER

        import os

        os.makedirs(f"{EXPORT_DIR}/ledger", exist_ok=True)
        pq.write_table(
            LEDGER.empty_table(), f"{EXPORT_DIR}/ledger/empty.parquet"
        )

    # --- null sentinel shared by every chain (DuckDB's arg_min/arg_max
    # SKIP NULL args, and pandas counts NaN != str — a NULL before or
    # after anywhere in a chain would silently corrupt the verdict on
    # exactly one engine; see the duckdb-oracle gotcha in the module
    # docstring)
    NULL_S = "\x01"

    def _sentinel(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "record_id": df["record_id"].to_numpy(),
                "seq": df["seq"].to_numpy(),
                "before": df["before"].fillna(NULL_S).to_numpy(),
                "after": df["after"].fillna(NULL_S).to_numpy(),
            }
        )

    # --- warc_ts ledger entries hold ISO strings
    # (np.datetime_as_string, 'T' separator + micros); normalize to
    # second-granularity '%Y-%m-%d %H:%M:%S' — the same form _slim
    # exports — so chain values compare exactly against table values
    _TS_FMT = "%Y-%m-%d %H:%M:%S"

    def _ts_sentinel(df: pd.DataFrame) -> pd.DataFrame:
        b = pd.to_datetime(df["before"]).dt.strftime(_TS_FMT)
        a = pd.to_datetime(df["after"]).dt.strftime(_TS_FMT)
        return pd.DataFrame(
            {
                "record_id": df["record_id"].to_numpy(),
                "seq": df["seq"].to_numpy(),
                "before": b.fillna(NULL_S).to_numpy(),
                "after": a.fillna(NULL_S).to_numpy(),
            }
        )

    def _field_chain(field: str, prep, prefix: str):
        """One per-record mutation chain: ledger rows for ``field``
        (excluding 'twin' — it annotates the SOURCE record but rewrites
        a NEW row, checked separately below) → sentinel encode →
        chained first/last/breaks per record. Returns (chain_ds | None,
        n_touched, n_breaks); the chain carries {prefix}_first /
        {prefix}_last only. Zero-draw guard (CLAUDE.md rule 21): an
        empty filter result is SCHEMALESS — return None rather than
        thread a schemaless Dataset into drop_columns/joins."""
        led = ledger.filter(expr=f"field == '{field}' and error != 'twin'").map_batches(
            prep, batch_format="pandas"
        )
        raw = bucketed_group_apply(
            led, ["record_id"], _chain_per_record, num_buckets=16
        ).materialize()
        n_touched = raw.count()
        if not n_touched:
            return None, 0, 0
        n_breaks = int(raw.sum("n_breaks") or 0)
        ren = raw.drop_columns(["n_breaks"]).map_batches(
            lambda df: df.rename(
                columns={"first_before": f"{prefix}_first", "last_after": f"{prefix}_last"}
            ),
            batch_format="pandas",
        )
        return ren, n_touched, n_breaks

    xchain, n_text_touched, n_chain_breaks = _field_chain("text", _sentinel, "x")
    lchain, n_lang_touched, n_lang_breaks = _field_chain("lang", _sentinel, "l")
    tchain, n_ts_touched, n_ts_breaks = _field_chain("warc_ts", _ts_sentinel, "t")

    # --- record ids with ANY mutating ledger entry (duplicate/twin
    # entries do not mutate their source row)
    def _any_mark(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(subset=["record_id"])[["record_id"]].copy()
        out["any_mark"] = "y"
        return out

    any_tbl = bucketed_group_apply(
        ledger.filter(expr="error != 'twin' and error != 'duplicate'").select_columns(
            ["record_id"]
        ),
        ["record_id"],
        _any_mark,
        num_buckets=16,
    ).materialize()
    n_any_touched = any_tbl.count()  # zero-draw guard (rule 21)

    # --- original rows: dirty ⋈ clean on record_id, then LEFT joins
    # with the chain and any-touched marks (string columns only on the
    # left-join right sides — rule 14)
    def _slim(prefix):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "record_id": df["record_id"].to_numpy(),
                    f"{prefix}_url": df["url"].to_numpy(),
                    f"{prefix}_text": df["text"].to_numpy(),
                    f"{prefix}_lang": df["lang"].to_numpy(),
                    f"{prefix}_ts": df["warc_ts"]
                    .astype("datetime64[us]")
                    .dt.strftime(_TS_FMT)
                    .fillna(NULL_S)
                    .to_numpy(),
                }
            )

        return fn

    dirty_orig = dirty.filter(expr=f"row_uid < {DUP_UID_OFFSET}").map_batches(
        _slim("d"), batch_format="pandas"
    )
    # materialized: consumed by TWO joins (originals + duplicates) —
    # unmaterialized, the full clean scan + projection would execute
    # twice (r5 review)
    clean_slim = clean.map_batches(_slim("c"), batch_format="pandas").materialize()
    j = bucketed_join(dirty_orig, clean_slim, ["record_id"], num_buckets=16)
    for side in (xchain, lchain, tchain, any_tbl if n_any_touched else None):
        if side is not None:
            j = bucketed_join(j, side, ["record_id"], num_buckets=16, how="left")

    def _flags(df: pd.DataFrame) -> pd.DataFrame:
        def field_bad(prefix: str, col: str, sentinel: bool):
            """Per-field (untouched-diff, bad-before, bad-after) counts.
            ``sentinel``: fill the table side's NULLs with NULL_S before
            comparing against the sentinel-encoded chain values (d_ts /
            c_ts are already sentinel-filled by _slim)."""
            c, d = df[f"c_{col}"], df[f"d_{col}"]
            diff = d.fillna("\0") != c.fillna("\0")
            if f"{prefix}_first" not in df.columns:
                # no errors drawn for this field: nothing is touched, so
                # every diff is a violation and before/after are vacuous
                return pd.Series(False, index=df.index), diff, int(diff.sum()), 0, 0
            if sentinel:
                c, d = c.fillna(NULL_S), d.fillna(NULL_S)
            touched = df[f"{prefix}_first"].notna()
            unt = int((~touched & diff).sum())
            bef = int((touched & (df[f"{prefix}_first"] != c)).sum())
            aft = int((touched & (df[f"{prefix}_last"] != d)).sum())
            return touched, diff, unt, bef, aft

        _, text_diff, bad_unt, bad_before, bad_after = field_bad(
            "x", "text", sentinel=True
        )
        _, lang_diff, bad_l_unt, bad_l_bef, bad_l_aft = field_bad(
            "l", "lang", sentinel=True
        )
        _, ts_diff, bad_t_unt, bad_t_bef, bad_t_aft = field_bad(
            "t", "ts", sentinel=False
        )
        if "any_mark" in df.columns:
            pristine = df["any_mark"].isna()
        else:  # no mutating errors drawn at all: every row is pristine
            pristine = pd.Series(True, index=df.index)
        return pd.DataFrame(
            {
                "n_bad_untouched": [bad_unt],
                "n_bad_before": [bad_before],
                "n_bad_after": [bad_after],
                "n_bad_url": [int((df["d_url"] != df["c_url"]).sum())],
                "n_bad_pristine": [
                    int((pristine & (text_diff | lang_diff | ts_diff)).sum())
                ],
                "n_bad_lang_untouched": [bad_l_unt],
                "n_bad_lang_before": [bad_l_bef],
                "n_bad_lang_after": [bad_l_aft],
                "n_bad_ts_untouched": [bad_t_unt],
                "n_bad_ts_before": [bad_t_bef],
                "n_bad_ts_after": [bad_t_aft],
            }
        )

    agg = j.map_batches(_flags, batch_format="pandas").to_pandas().sum()

    # --- duplicate rows byte-identical to clean (pristine re-append)
    dup_rows = dirty.filter(
        expr=f"row_uid >= {DUP_UID_OFFSET} and row_uid < {TWIN_UID_OFFSET}"
    ).map_batches(_slim("d"), batch_format="pandas").materialize()
    if dup_rows.count() == 0:  # zero duplicates drawn (rule 21)
        n_bad_dup = 0
    else:
        jd = bucketed_join(dup_rows, clean_slim, ["record_id"], num_buckets=16)

        def _dup_flags(df: pd.DataFrame) -> pd.DataFrame:
            bad = (
                (df["d_text"].fillna("\0") != df["c_text"].fillna("\0"))
                | (df["d_lang"].fillna("\0") != df["c_lang"].fillna("\0"))
                | (df["d_ts"] != df["c_ts"])
                | (df["d_url"] != df["c_url"])
            )
            return pd.DataFrame({"n_bad_dup": [int(bad.sum())]})

        n_bad_dup = int(
            jd.map_batches(_dup_flags, batch_format="pandas").to_pandas().sum().iloc[0]
        )

    # --- twin rows: ledger 'twin' entries point (via the mangled id)
    # at a dirty row whose text is the entry's ``after``
    def _mangle(df: pd.DataFrame) -> pd.DataFrame:
        rid = df["record_id"].astype("int64")
        return pd.DataFrame(
            {
                "record_id": ("123" + rid.astype(str) + "789").astype("int64"),
                "twin_after": df["after"].to_numpy(),
            }
        )

    twin_led = ledger.filter(expr="error == 'twin'").map_batches(
        _mangle, batch_format="pandas"
    ).materialize()
    twin_rows = dirty.filter(expr=f"row_uid >= {TWIN_UID_OFFSET}").map_batches(
        lambda df: pd.DataFrame(
            {"record_id": df["record_id"].to_numpy(), "twin_text": df["text"].to_numpy()}
        ),
        batch_format="pandas",
    ).materialize()
    n_twin_ledger = twin_led.count()
    n_twin_rows = twin_rows.count()
    if n_twin_ledger == 0 or n_twin_rows == 0:
        # small fixtures can draw zero twins (the op skips records
        # whose tokens have no same-length/initial candidate); an
        # empty Dataset has no schema, so skip the join outright
        n_bad_twin = 0
    else:
        jt = bucketed_join(twin_led, twin_rows, ["record_id"], num_buckets=16)

        def _twin_flags(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"n_bad_twin": [int((df["twin_after"] != df["twin_text"]).sum())]}
            )

        n_bad_twin = int(
            jt.map_batches(_twin_flags, batch_format="pandas").to_pandas().sum().iloc[0]
        )

    return pd.DataFrame(
        [
            {
                "n_clean": n_clean,
                "n_dirty": n_dirty,
                "n_ledger": n_ledger,
                "n_text_touched": n_text_touched,
                "n_chain_breaks": n_chain_breaks,
                "n_bad_untouched": int(agg["n_bad_untouched"]),
                "n_bad_before": int(agg["n_bad_before"]),
                "n_bad_after": int(agg["n_bad_after"]),
                "n_bad_url": int(agg["n_bad_url"]),
                "n_bad_pristine": int(agg["n_bad_pristine"]),
                "n_bad_dup": n_bad_dup,
                "n_bad_twin": n_bad_twin,
                "n_twin_ledger": n_twin_ledger,
                "n_twin_rows": n_twin_rows,
                "n_lang_touched": n_lang_touched,
                "n_lang_breaks": n_lang_breaks,
                "n_bad_lang_untouched": int(agg["n_bad_lang_untouched"]),
                "n_bad_lang_before": int(agg["n_bad_lang_before"]),
                "n_bad_lang_after": int(agg["n_bad_lang_after"]),
                "n_ts_touched": n_ts_touched,
                "n_ts_breaks": n_ts_breaks,
                "n_bad_ts_untouched": int(agg["n_bad_ts_untouched"]),
                "n_bad_ts_before": int(agg["n_bad_ts_before"]),
                "n_bad_ts_after": int(agg["n_bad_ts_after"]),
            }
        ]
    ).astype("int64")


# DuckDB twin over the exported triple. The query MUST run first (it
# writes EXPORT_DIR) — the driver and test_entry_oracles both run the
# Ray query before its oracle. DUP/TWIN offsets inlined (1<<60, 1<<61).
ER_INVARIANT_ORACLE = f"""
WITH clean AS (SELECT * FROM read_parquet('{EXPORT_DIR}/clean/*.parquet')),
     dirty AS (SELECT * FROM read_parquet('{EXPORT_DIR}/dirty/*.parquet')),
     ledger AS (SELECT * FROM read_parquet('{EXPORT_DIR}/ledger/*.parquet')),
     tl AS (SELECT record_id, seq,
                   coalesce(before, chr(1)) AS before,
                   coalesce(after, chr(1)) AS after
            FROM ledger WHERE field = 'text' AND error <> 'twin'),
     chain AS (
       SELECT record_id,
              arg_min(before, seq) AS first_before,
              arg_max(after, seq) AS last_after,
              coalesce(sum(CASE WHEN prev_after IS NOT NULL
                                 AND prev_after <> before THEN 1 ELSE 0 END), 0)
                AS n_breaks
       FROM (SELECT record_id, seq, before, after,
                    lag(after) OVER (PARTITION BY record_id ORDER BY seq)
                      AS prev_after
             FROM tl)
       GROUP BY record_id
     ),
     any_touched AS (
       SELECT DISTINCT record_id FROM ledger
       WHERE error NOT IN ('twin', 'duplicate')
     ),
     ll AS (SELECT record_id, seq,
                   coalesce(before, chr(1)) AS before,
                   coalesce(after, chr(1)) AS after
            FROM ledger WHERE field = 'lang' AND error <> 'twin'),
     lchain AS (
       SELECT record_id,
              arg_min(before, seq) AS l_first,
              arg_max(after, seq) AS l_last,
              coalesce(sum(CASE WHEN prev_after IS NOT NULL
                                 AND prev_after <> before THEN 1 ELSE 0 END), 0)
                AS l_breaks
       FROM (SELECT record_id, seq, before, after,
                    lag(after) OVER (PARTITION BY record_id ORDER BY seq)
                      AS prev_after
             FROM ll)
       GROUP BY record_id
     ),
     tt AS (SELECT record_id, seq,
                   coalesce(strftime(CAST(before AS TIMESTAMP),
                                     '%Y-%m-%d %H:%M:%S'), chr(1)) AS before,
                   coalesce(strftime(CAST(after AS TIMESTAMP),
                                     '%Y-%m-%d %H:%M:%S'), chr(1)) AS after
            FROM ledger WHERE field = 'warc_ts' AND error <> 'twin'),
     tchain AS (
       SELECT record_id,
              arg_min(before, seq) AS t_first,
              arg_max(after, seq) AS t_last,
              coalesce(sum(CASE WHEN prev_after IS NOT NULL
                                 AND prev_after <> before THEN 1 ELSE 0 END), 0)
                AS t_breaks
       FROM (SELECT record_id, seq, before, after,
                    lag(after) OVER (PARTITION BY record_id ORDER BY seq)
                      AS prev_after
             FROM tt)
       GROUP BY record_id
     ),
     orig AS (
       SELECT d.record_id,
              d.text AS d_text, c.text AS c_text,
              d.lang AS d_lang, c.lang AS c_lang,
              d.warc_ts AS d_ts, c.warc_ts AS c_ts,
              coalesce(strftime(d.warc_ts, '%Y-%m-%d %H:%M:%S'), chr(1)) AS d_tss,
              coalesce(strftime(c.warc_ts, '%Y-%m-%d %H:%M:%S'), chr(1)) AS c_tss,
              d.url AS d_url, c.url AS c_url,
              ch.first_before, ch.last_after,
              lc.l_first, lc.l_last,
              tc.t_first, tc.t_last,
              (a.record_id IS NOT NULL) AS touched_any
       FROM dirty d
       JOIN clean c ON d.record_id = c.record_id
       LEFT JOIN chain ch ON d.record_id = ch.record_id
       LEFT JOIN lchain lc ON d.record_id = lc.record_id
       LEFT JOIN tchain tc ON d.record_id = tc.record_id
       LEFT JOIN any_touched a ON d.record_id = a.record_id
       WHERE d.row_uid < {1 << 60}
     ),
     dup AS (
       SELECT d.text AS d_text, c.text AS c_text, d.lang AS d_lang,
              c.lang AS c_lang, d.warc_ts AS d_ts, c.warc_ts AS c_ts,
              d.url AS d_url, c.url AS c_url
       FROM dirty d JOIN clean c ON d.record_id = c.record_id
       WHERE d.row_uid >= {1 << 60} AND d.row_uid < {1 << 61}
     ),
     twin_led AS (
       SELECT CAST('123' || CAST(record_id AS VARCHAR) || '789' AS BIGINT)
                AS twin_id,
              after AS twin_after
       FROM ledger WHERE error = 'twin'
     ),
     twin_rows AS (
       SELECT record_id AS twin_id, text AS twin_text FROM dirty
       WHERE row_uid >= {1 << 61}
     )
SELECT CAST((SELECT count(*) FROM clean) AS BIGINT) AS n_clean,
       CAST((SELECT count(*) FROM dirty) AS BIGINT) AS n_dirty,
       CAST((SELECT count(*) FROM ledger) AS BIGINT) AS n_ledger,
       CAST((SELECT count(*) FROM chain) AS BIGINT) AS n_text_touched,
       CAST((SELECT coalesce(sum(n_breaks), 0) FROM chain) AS BIGINT)
         AS n_chain_breaks,
       CAST((SELECT count(*) FROM orig
             WHERE first_before IS NULL AND d_text IS DISTINCT FROM c_text)
            AS BIGINT) AS n_bad_untouched,
       CAST((SELECT count(*) FROM orig
             WHERE first_before IS NOT NULL
               AND first_before <> coalesce(c_text, chr(1)))
            AS BIGINT) AS n_bad_before,
       CAST((SELECT count(*) FROM orig
             WHERE last_after IS NOT NULL
               AND last_after <> coalesce(d_text, chr(1)))
            AS BIGINT) AS n_bad_after,
       CAST((SELECT count(*) FROM orig WHERE d_url <> c_url) AS BIGINT)
         AS n_bad_url,
       CAST((SELECT count(*) FROM orig
             WHERE NOT touched_any
               AND (d_text IS DISTINCT FROM c_text
                    OR d_lang IS DISTINCT FROM c_lang
                    OR d_ts IS DISTINCT FROM c_ts)) AS BIGINT)
         AS n_bad_pristine,
       CAST((SELECT count(*) FROM dup
             WHERE d_text IS DISTINCT FROM c_text
                OR d_lang IS DISTINCT FROM c_lang
                OR d_ts IS DISTINCT FROM c_ts
                OR d_url <> c_url) AS BIGINT) AS n_bad_dup,
       CAST((SELECT count(*) FROM twin_led t JOIN twin_rows r USING (twin_id)
             WHERE t.twin_after <> r.twin_text) AS BIGINT) AS n_bad_twin,
       CAST((SELECT count(*) FROM twin_led) AS BIGINT) AS n_twin_ledger,
       CAST((SELECT count(*) FROM twin_rows) AS BIGINT) AS n_twin_rows,
       CAST((SELECT count(*) FROM lchain) AS BIGINT) AS n_lang_touched,
       CAST((SELECT coalesce(sum(l_breaks), 0) FROM lchain) AS BIGINT)
         AS n_lang_breaks,
       CAST((SELECT count(*) FROM orig
             WHERE l_first IS NULL AND d_lang IS DISTINCT FROM c_lang)
            AS BIGINT) AS n_bad_lang_untouched,
       CAST((SELECT count(*) FROM orig
             WHERE l_first IS NOT NULL
               AND l_first <> coalesce(c_lang, chr(1))) AS BIGINT)
         AS n_bad_lang_before,
       CAST((SELECT count(*) FROM orig
             WHERE l_first IS NOT NULL
               AND l_last <> coalesce(d_lang, chr(1))) AS BIGINT)
         AS n_bad_lang_after,
       CAST((SELECT count(*) FROM tchain) AS BIGINT) AS n_ts_touched,
       CAST((SELECT coalesce(sum(t_breaks), 0) FROM tchain) AS BIGINT)
         AS n_ts_breaks,
       CAST((SELECT count(*) FROM orig
             WHERE t_first IS NULL AND d_ts IS DISTINCT FROM c_ts)
            AS BIGINT) AS n_bad_ts_untouched,
       CAST((SELECT count(*) FROM orig
             WHERE t_first IS NOT NULL AND t_first <> c_tss) AS BIGINT)
         AS n_bad_ts_before,
       CAST((SELECT count(*) FROM orig
             WHERE t_first IS NOT NULL AND t_last <> d_tss) AS BIGINT)
         AS n_bad_ts_after
"""

INVARIANT_QUERIES = {"er_invariant_check": er_invariant_check}
INVARIANT_ORACLES = {"er_invariant_check": ER_INVARIANT_ORACLE}
