"""Sequence packing — assigning documents to fixed token-budget
training sequences — as a distributed prefix sum. The reference has
nothing like it (it is an LLM-training-data op, SURVEY §2.4's gap
list); at corpus scale it is the step between "deduped documents" and
"tokenized shards".

The pack boundary rule is deterministic and engine-independent:
documents are laid out in doc_id order and ``pack_id =
exclusive_prefix_tokens // budget`` — i.e. a document goes into the
pack its first token lands in. That rule is a window function in SQL
(the oracle) and a classic two-level scan here:

1. one narrow pass computes (doc_id, n_tokens, range_key) — ints only,
   texts never leave the read;
2. per-range token sums (``range_key = doc_id >> range_bits``, so a
   range is a contiguous id span) reduce to a tiny table whose
   exclusive prefix is computed driver-side and broadcast — at true
   corpus scale (> ~1e8 ranges) this level recurses, same shape;
3. each range finishes its own exclusive cumsum locally: offset +
   within-range scan, floor-div budget.

``packed_texts`` then materializes the actual training rows — the one
stage where text legitimately rides a shuffle (each byte moves exactly
once, to its pack)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

PACK_BUDGET = 2048
RANGE_BITS = 12  # 4096 ids per range at fixture scale; widen with the corpus


def _token_ranges(sf_dir: str, range_bits: int):
    """Narrow (doc_id, n_tokens, range_key) dataset — single-space
    token counts (token_counts/SQL semantics) via the byte kernels."""
    from .bytekernels import token_count_kernels

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        k = token_count_kernels(batch.column("text"))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(k["n_tokens"].astype(np.int64)),
                "range_key": pa.array(ids >> range_bits),
            }
        )

    return ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)


def pack_assignments(
    sf_dir: str, budget: int = PACK_BUDGET, range_bits: int = RANGE_BITS
):
    """(doc_id, n_tokens, pack_id) for every document — the scale path:
    only int rows move, the driver touches one row per id-range."""
    return pack_assignments_ds(_token_ranges(sf_dir, range_bits), budget)


def pack_assignments_ds(narrow_ds: "ray.data.Dataset", budget: int = PACK_BUDGET):
    """The packing kernel over any (doc_id, n_tokens, range_key)
    dataset (see pack_assignments; range_key must be a monotone
    bucketing of doc_id so the range prefix sums order correctly)."""
    from .shuffle import bucketed_group_apply, group_agg

    narrow = narrow_ds.materialize()  # ints only, reused twice

    if narrow.count() == 0:
        # every doc filtered upstream (rule 21): the schemaless reduce
        # would KeyError on 'range_key' — the assignment set is empty
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "pack_id": pa.array([], pa.int64()),
                }
            )
        )
    sums = group_agg(
        narrow, ["range_key"], {"s": ("n_tokens", "sum")}, num_buckets=16
    ).to_pandas()  # one row per id-range
    sums = sums.sort_values("range_key").reset_index(drop=True)
    offsets = pd.Series(
        np.concatenate([[0], np.cumsum(sums["s"].to_numpy())[:-1]]),
        index=sums["range_key"].to_numpy(),
    )
    off_ref = ray.put(offsets)

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values(["range_key", "doc_id"])
        excl = df.groupby("range_key")["n_tokens"].cumsum() - df["n_tokens"]
        start = df["range_key"].map(off).to_numpy() + excl.to_numpy()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": df["n_tokens"].to_numpy(),
                "pack_id": (start // budget).astype(np.int64),
            }
        )

    return bucketed_group_apply(narrow, ["range_key"], pack, num_buckets=32)


PACK_ASSIGNMENTS_ORACLE = f"""
    WITH t AS (SELECT doc_id,
                      CAST(CASE WHEN text IS NULL OR text = '' THEN 0
                                ELSE length(string_split(text, ' ')) END AS BIGINT) AS n_tokens
               FROM documents)
    SELECT doc_id, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER
                    (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
    FROM t
"""


def packed_texts(
    sf_dir: str, budget: int = PACK_BUDGET, range_bits: int = RANGE_BITS
):
    """Materialized training sequences: one row per pack with the
    doc_id-ordered concatenated text.

    pack_id is MONOTONE in doc_id, so pack grouping has the same
    locality as id-range bucketing: texts ride exactly ONE wide shuffle
    (range-keyed), every pack whose token interval [P·B, (P+1)·B) lies
    inside its range's token interval [off_r, off_{r+1}) assembles
    locally, and only boundary packs — at most one piece per range edge
    — go through a second, range-count-sized merge pass. (The first
    version joined assignments to texts and regrouped by pack_id:
    the payload moved twice — 46.7 s at 500k docs vs this plan's
    number in BASELINE.md.)"""
    from .shuffle import bucketed_group_apply

    # range-level token offsets (same two cheap narrow passes as
    # pack_assignments; texts stay in the read)
    narrow = _token_ranges(sf_dir, range_bits)
    from .shuffle import group_agg

    sums = group_agg(
        narrow, ["range_key"], {"s": ("n_tokens", "sum")}, num_buckets=16
    ).to_pandas()
    if len(sums) == 0:
        # empty corpus (rule 21): no ranges, no packs — typed empty
        return ray.data.from_arrow(
            pa.table(
                {
                    "pack_id": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        )
    sums = sums.sort_values("range_key").reset_index(drop=True)
    starts = np.concatenate([[0], np.cumsum(sums["s"].to_numpy())])
    off = pd.Series(starts[:-1], index=sums["range_key"].to_numpy())
    off_end = pd.Series(starts[1:], index=sums["range_key"].to_numpy())
    bounds_ref = ray.put((off, off_end))

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_range(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("range_key", pa.array(ids >> range_bits))

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        from .bytekernels import token_count_kernels

        lo, hi = ray.get(bounds_ref)
        df = df.sort_values(["range_key", "doc_id"])
        toks = token_count_kernels(pa.array(df["text"].to_numpy(dtype=object)))[
            "n_tokens"
        ].astype(np.int64)
        excl = (
            pd.Series(toks, index=df.index).groupby(df["range_key"], sort=False).cumsum()
            - toks
        )
        start = df["range_key"].map(lo).to_numpy() + excl.to_numpy()
        pack = start // budget
        r_lo = df["range_key"].map(lo).to_numpy()
        r_hi = df["range_key"].map(hi).to_numpy()
        interior = (pack * budget >= r_lo) & ((pack + 1) * budget <= r_hi)
        work = pd.DataFrame(
            {
                "pack_id": pack,
                "range_key": df["range_key"].to_numpy(),
                "n_tokens": toks,
                "text": df["text"].to_numpy(),
                "interior": interior,
            }
        )
        out = []
        for flag, grp_keys in ((True, ["pack_id"]), (False, ["pack_id", "range_key"])):
            part = work[work["interior"] == flag]
            if len(part):
                g = part.groupby(grp_keys, sort=False, as_index=False).agg(
                    n_docs=("n_tokens", "size"),
                    n_tokens=("n_tokens", "sum"),
                    text=("text", " ".join),
                )
                g["final"] = np.int8(1 if flag else 0)
                if flag:
                    g["range_key"] = -1
                out.append(g[["pack_id", "range_key", "n_docs", "n_tokens", "text", "final"]])
        return pd.concat(out, ignore_index=True)

    # materialized: BOTH filter legs below consume it — and either
    # leg can be legally empty (all-interior corpora have no boundary
    # pieces; tiny corpora have no interior packs), coming back
    # schemaless (rule 21, r5 review)
    assembled = bucketed_group_apply(
        docs.map_batches(add_range, batch_format="pyarrow", zero_copy_batch=True),
        ["range_key"],
        assemble,
        num_buckets=32,
    ).materialize()

    def merge_pieces(df: pd.DataFrame) -> pd.DataFrame:
        # boundary pieces arrive (pack_id, range_key)-keyed; ranges are
        # doc_id-ordered, so sorting by range_key restores text order
        g = df.sort_values(["pack_id", "range_key"]).groupby(
            "pack_id", sort=False, as_index=False
        ).agg(
            n_docs=("n_docs", "sum"),
            n_tokens=("n_tokens", "sum"),
            text=("text", " ".join),
        )
        return g[["pack_id", "n_docs", "n_tokens", "text"]]

    final = assembled.filter(expr="final == 1").materialize()
    pieces = assembled.filter(expr="final == 0").materialize()
    parts = []
    if final.count():
        parts.append(final.drop_columns(["range_key", "final"]))
    if pieces.count():
        parts.append(
            bucketed_group_apply(
                pieces.drop_columns(["final"]), ["pack_id"], merge_pieces, num_buckets=8
            )
        )
    if not parts:  # empty corpus: typed empty result
        return ray.data.from_arrow(
            pa.table(
                {
                    "pack_id": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        )
    return parts[0] if len(parts) == 1 else parts[0].union(parts[1])


PACKED_TEXTS_ORACLE = f"""
    WITH t AS (SELECT doc_id, text,
                      CAST(CASE WHEN text IS NULL OR text = '' THEN 0
                                ELSE length(string_split(text, ' ')) END AS BIGINT) AS n_tokens
               FROM documents),
    a AS (SELECT doc_id, text, n_tokens,
                 CAST(floor(coalesce(sum(n_tokens) OVER
                          (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
          FROM t)
    SELECT pack_id, CAST(count(*) AS BIGINT) AS n_docs,
           sum(n_tokens) AS n_tokens,
           string_agg(text, ' ' ORDER BY doc_id) AS text
    FROM a GROUP BY pack_id
"""


PACKING_QUERIES = {
    "pack_assignments": pack_assignments,
    "packed_texts": packed_texts,
}
PACKING_ORACLES = {
    "pack_assignments": PACK_ASSIGNMENTS_ORACLE,
    "packed_texts": PACKED_TEXTS_ORACLE,
}
