"""URL canonicalization + canonical-URL dedup (keep-latest capture).

Web crawls carry the same page under many url spellings — http/https,
a ``www.`` prefix, trailing slashes, ``#fragment`` suffixes, random
case. The crawl-side dedup staple is therefore: canonicalize the url,
keep exactly ONE capture per canonical url (latest ``warc_ts`` wins,
smallest record id breaks ties), and record how many aliases
collapsed into each keeper.

No direct reference counterpart (the reference links person records,
not crawls); this is part of the LLM-corpus operator family the brief
adds. The winner semantics mirror the reference's best-link selection
(``find_best_links``, benchmarking/utils.R — max score, deterministic
tiebreak) applied to the crawl key instead of a match score.

Scale shape: canonicalization is five Arrow kernels over the string
buffer (no Python per row); the winner reduction is a per-batch
pandas partial (one row per canonical url per batch) followed by ONE
bucketed shuffle of those already-collapsed partials — the shuffle
moves (canon, id, ts, count) rows only, never text/html payloads, and
the winner-of-winners merge is associative so block layout can't
change the answer.

Oracle strategy (CLAUDE.md rule 20): the fixture has deliberately
generated url aliases, which no testdata table carries — so the query
exports its variant table to ``EXPORT_DIR`` (overwritten per call)
and the DuckDB twin recomputes the dedup from the same files with
``lower``/``split_part``/``substr``/``rtrim`` + a ``row_number``
window (kernel parity verified value-by-value in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

EXPORT_DIR = "/tmp/rayrl_urldedup"
_SEED = 42
_N_VARIANTS = 3
_BIG = 1 << 30


def canonicalize_urls(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Canonical url form, all-Arrow: lowercase → drop ``#fragment`` →
    strip ``https://``/``http://`` scheme → strip leading ``www.`` →
    strip trailing slashes. Matches the DuckDB expression in
    ``URL_CANONICAL_DEDUP_ORACLE`` byte-for-byte on ASCII urls."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    u = pc.utf8_lower(col)
    u = pc.list_element(pc.split_pattern(u, "#", max_splits=1), 0)
    # ONE scheme strip, first match wins — nested if_else over the SAME
    # input, exactly like the oracle's CASE. Sequential reassignment
    # would double-strip a chained scheme ('https://http://x' → 'x'
    # instead of the CASE's 'http://x') and break the byte-for-byte
    # parity claim (r5 review).
    u = pc.if_else(
        pc.starts_with(u, "https://"),
        pc.utf8_slice_codeunits(u, 8, _BIG),
        pc.if_else(pc.starts_with(u, "http://"), pc.utf8_slice_codeunits(u, 7, _BIG), u),
    )
    u = pc.if_else(pc.starts_with(u, "www."), pc.utf8_slice_codeunits(u, 4, _BIG), u)
    return pc.utf8_rtrim(u, characters="/")


def _alias_batch(batch: pa.Table) -> pa.Table:
    """Fixture stage: expand each page into ``_N_VARIANTS`` url
    spellings of the same canonical page (scheme / www. / trailing
    slash / fragment / case drawn from the counter rng) with distinct
    capture timestamps (hour offsets; deliberately collision-prone so
    the record-id tiebreak is exercised). Python string assembly is
    fine here — this is fixture construction, same as synth.py, not a
    corpus-scale hot path."""
    from . import rng

    rid = batch.column("record_id").to_numpy(zero_copy_only=False)
    # strip the fixture's uniform "https://" prefix once; decorations
    # are re-applied per variant below
    base = pc.utf8_slice_codeunits(
        batch.column("url").combine_chunks(), 8, _BIG
    ).to_pylist()
    ts = batch.column("warc_ts").combine_chunks().cast(pa.int64()).to_numpy()

    ids, urls, tss = [], [], []
    for v in range(_N_VARIANTS):
        uid = rid * _N_VARIANTS + v
        bits = rng.randint(uid, 32, _SEED, rng.tag_for("urlalias.bits"))
        off = rng.randint(uid, 4, _SEED, rng.tag_for("urlalias.off"))
        frag = f"#s{v}"
        for i, b in enumerate(base):
            x = bits[i]
            stem = b.upper() if x & 16 else b
            urls.append(
                ("http://" if x & 1 else "https://")
                + ("www." if x & 2 else "")
                + stem
                + ("/" if x & 4 else "")
                + (frag if x & 8 else "")
            )
        ids.append(uid)
        tss.append(ts + off * 3_600_000_000)  # hours → µs
    return pa.table(
        {
            "record_id": pa.array(np.concatenate(ids), pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.concatenate(tss), pa.int64()).cast(pa.timestamp("us")),
        }
    )


def _canon_slim(batch: pa.Table) -> pa.Table:
    """Shuffle-input rows: (canonical_url, id, ts µs, count=1) — the
    text-free narrow stream that rides the bucketed reduce."""
    return pa.table(
        {
            "canonical_url": canonicalize_urls(batch.column("url")),
            "kept_record_id": batch.column("record_id"),
            "kept_ts_us": batch.column("warc_ts").combine_chunks().cast(pa.int64()),
            "n_aliases": pa.array(np.ones(batch.num_rows, np.int64)),
        }
    )


def _winner(df: pd.DataFrame) -> pd.DataFrame:
    """Winner-of-winners merge: latest ts, then smallest id. Stable
    sort + first is associative across partial rounds, so this same
    function is both the per-batch combiner and the in-bucket reduce."""
    df = df.sort_values(
        ["kept_ts_us", "kept_record_id"], ascending=[False, True], kind="mergesort"
    )
    return df.groupby("canonical_url", sort=False, as_index=False).agg(
        kept_record_id=("kept_record_id", "first"),
        kept_ts_us=("kept_ts_us", "first"),
        n_aliases=("n_aliases", "sum"),
    )


def url_canonical_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Canonical-url dedup over the alias-expanded pages fixture: one
    row per canonical url with the kept capture (latest warc_ts,
    record-id tiebreak) and the alias count. Exports the variant table
    to ``EXPORT_DIR`` for the DuckDB twin."""
    import shutil

    import pyarrow.parquet as pq

    from . import synth
    from .shuffle import bucketed_group_apply

    n = max(2000, pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows // 12)
    variants = (
        synth.pages_dataset(n)
        .map_batches(_alias_batch, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    shutil.rmtree(EXPORT_DIR, ignore_errors=True)
    variants.write_parquet(f"{EXPORT_DIR}/variants")

    partials = variants.map_batches(
        _canon_slim, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(_winner, batch_format="pandas")
    return bucketed_group_apply(partials, ["canonical_url"], _winner, num_buckets=32)


URL_CANONICAL_DEDUP_ORACLE = f"""
WITH v AS (
    SELECT record_id, epoch_us(warc_ts) AS ts_us, lower(url) AS u
    FROM read_parquet('{EXPORT_DIR}/variants/*.parquet')
), c0 AS (
    SELECT record_id, ts_us, split_part(u, '#', 1) AS u FROM v
), c1 AS (
    SELECT record_id, ts_us,
           CASE WHEN u LIKE 'https://%' THEN substr(u, 9)
                WHEN u LIKE 'http://%' THEN substr(u, 8)
                ELSE u END AS u
    FROM c0
), c2 AS (
    SELECT record_id, ts_us,
           rtrim(CASE WHEN u LIKE 'www.%' THEN substr(u, 5) ELSE u END, '/')
               AS canonical_url
    FROM c1
), r AS (
    SELECT canonical_url, record_id, ts_us,
           count(*) OVER (PARTITION BY canonical_url) AS n_aliases,
           row_number() OVER (
               PARTITION BY canonical_url
               ORDER BY ts_us DESC, record_id ASC
           ) AS rn
    FROM c2
)
SELECT canonical_url, record_id AS kept_record_id, ts_us AS kept_ts_us,
       n_aliases
FROM r WHERE rn = 1
"""

URL_QUERIES = {"url_canonical_dedup": url_canonical_dedup}
URL_ORACLES = {"url_canonical_dedup": URL_CANONICAL_DEDUP_ORACLE}
