"""Incremental snapshot diff — the crawl-over-crawl op: given two
snapshots of a corpus, classify every doc id as added / removed /
changed / unchanged. The two "snapshots" here are deterministic views
of the documents table (old = even doc_ids; new = ids not divisible by
3, with every 7th doc's text mutated) so the fixture exercises all
four statuses and DuckDB can reproduce them exactly.

Scale shape: texts NEVER ride the shuffle — both snapshots reduce in
ONE read pass to (doc_id, content_hash, side) int rows (the full-outer
join key plus a 63-bit equality witness), and one bucketed shuffle on
doc_id classifies each id from the side pattern. The oracle compares
text equality where the engine compares hashes — identical up to a
~2⁻⁶³-per-pair collision (same documented trade as decontam.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .bytekernels import content_hash64
from .shuffle import bucketed_group_apply

OLD_MOD = 2  # old snapshot: doc_id % 2 == 0
NEW_MOD = 3  # new snapshot: doc_id % 3 != 0
MUT_MOD = 7  # re-crawl mutation: doc_id % 7 == 0 gets ' v2' appended


def snapshot_diff(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # NULL texts must hash DISTINCT from '' and from every real text:
    # content_hash64 sees a null slot as the empty slice, so an
    # unmutated NULL row would read 'unchanged' while SQL's equality
    # says otherwise (r5 review). Sentinel-fill nulls before hashing;
    # the oracle compares with IS NOT DISTINCT FROM so NULL==NULL is
    # 'unchanged' on both engines. Collision bound: a real text equal
    # to the two-byte control sentinel (negligible, rule-17 trade).
    _NULL_TEXT = "\x01\x00"

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        col = batch.column("text")
        texts = col.to_pylist()
        if col.null_count:
            old_texts = [t if t is not None else _NULL_TEXT for t in texts]
            h_old = content_hash64(pa.array(old_texts, pa.string()))
        else:  # zero-copy fast path — the common all-non-null batch
            h_old = content_hash64(col)
        mut = ids % MUT_MOD == 0
        new_texts = [
            ((t or "") + " v2") if m else (t if t is not None else _NULL_TEXT)
            for t, m in zip(texts, mut)
        ]
        h_new = content_hash64(pa.array(new_texts, pa.string()))
        old_mask = ids % OLD_MOD == 0
        new_mask = ids % NEW_MOD != 0
        out_ids = np.concatenate([ids[old_mask], ids[new_mask]])
        out_h = np.concatenate([h_old[old_mask], h_new[new_mask]])
        out_side = np.concatenate(
            [np.zeros(int(old_mask.sum()), np.int8), np.ones(int(new_mask.sum()), np.int8)]
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "h": pa.array(out_h, pa.int64()),
                "side": pa.array(out_side, pa.int8()),
            }
        )

    rows = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        # nullable Int64 (not float) through the outer merge — a float
        # pivot would truncate 63-bit hashes at 2^53 and alias them
        o = df.loc[df["side"] == 0, ["doc_id", "h"]].rename(columns={"h": "h_old"})
        n = df.loc[df["side"] == 1, ["doc_id", "h"]].rename(columns={"h": "h_new"})
        m = o.astype({"h_old": "Int64"}).merge(
            n.astype({"h_new": "Int64"}), on="doc_id", how="outer"
        )
        status = np.where(
            m["h_old"].isna(),
            "added",
            np.where(
                m["h_new"].isna(),
                "removed",
                np.where((m["h_old"] == m["h_new"]).fillna(False), "unchanged", "changed"),
            ),
        )
        return pd.DataFrame({"doc_id": m["doc_id"].to_numpy(), "status": status})

    return bucketed_group_apply(rows, ["doc_id"], classify)


SNAPSHOT_DIFF_ORACLE = f"""
    WITH old AS (
        SELECT doc_id, text FROM documents WHERE doc_id % {OLD_MOD} = 0
    ), new AS (
        SELECT doc_id,
               CASE WHEN doc_id % {MUT_MOD} = 0
                    THEN COALESCE(text, '') || ' v2' ELSE text END AS text
        FROM documents WHERE doc_id % {NEW_MOD} != 0
    )
    SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.doc_id IS NULL THEN 'added'
                WHEN new.doc_id IS NULL THEN 'removed'
                WHEN old.text IS NOT DISTINCT FROM new.text THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM old FULL JOIN new ON old.doc_id = new.doc_id
"""

MERGE_BROADCAST_GATE = 5_000_000  # max delta keys to ship as one array


def merge_upsert(
    base: "ray.data.Dataset",
    delta: "ray.data.Dataset",
    key: str = "doc_id",
    broadcast_gate: int = MERGE_BROADCAST_GATE,
) -> "ray.data.Dataset":
    """Latest-wins upsert: every base row whose key also appears in
    delta is replaced by the delta row; delta-only keys are inserts.
    Keys are unique per side (snapshot semantics). Output = base
    columns + ``origin`` ('base' | 'delta').

    Scale shape: the winner per key depends ONLY on delta's key set, so
    payloads never need to co-locate. Below the gate the delta key set
    (8-byte ints, sublinear in the corpus for an incremental crawl)
    broadcasts once via ``ray.put`` and base rows drop batch-side with a
    ``searchsorted`` probe — NO shuffle at all, both sides stream
    straight through. Above the gate (a delta comparable to the
    corpus), both sides meet in ONE bucketed shuffle keyed on ``key``
    and a vectorized drop_duplicates keeps the delta row. Paths are
    equivalence-tested with the gate forced to 0 (test_newops)."""

    def tag(origin: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "origin", pa.array(np.repeat(origin, batch.num_rows))
            )

        return fn

    n_delta = delta.count()
    if n_delta == 0:
        # an incremental crawl with zero new/changed docs is a routine
        # input, and its all-filtered delta is typically SCHEMALESS
        # (CLAUDE.md rule 21) — selecting its key column would raise.
        # The upsert is exactly "base, all rows tagged 'base'".
        return base.map_batches(tag("base"), batch_format="pyarrow")
    if n_delta <= broadcast_gate:
        parts = [
            b.column(key).to_numpy()
            for b in delta.select_columns([key]).iter_batches(batch_format="pyarrow")
        ]
        arr = np.sort(np.concatenate(parts)) if parts else np.array([], np.int64)
        ref = ray.put(arr)

        def drop_overridden(batch: pa.Table) -> pa.Table:
            ids = batch.column(key).to_numpy(zero_copy_only=False)
            ds_arr = ray.get(ref)
            if not len(ds_arr):
                return batch
            pos = np.searchsorted(ds_arr, ids)
            hit = ds_arr[np.minimum(pos, len(ds_arr) - 1)] == ids
            return batch.filter(pa.array(~hit))

        kept = base.map_batches(
            drop_overridden, batch_format="pyarrow", zero_copy_batch=True
        )
        return kept.map_batches(tag("base"), batch_format="pyarrow").union(
            delta.map_batches(tag("delta"), batch_format="pyarrow")
        )

    # big-delta fallback: one bucketed shuffle, delta row wins per key
    both = base.map_batches(tag("base"), batch_format="pyarrow").union(
        delta.map_batches(tag("delta"), batch_format="pyarrow")
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("origin").drop_duplicates(subset=[key], keep="last")
        # 'base' < 'delta' lexically; keep='last' keeps the delta row

    return bucketed_group_apply(both, [key], pick)


def _snapshot_views(sf_dir: str):
    """The deterministic (base, delta) pair of the documents table —
    the same views SNAPSHOT_DIFF_ORACLE's CTEs define."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def old_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % OLD_MOD == 0))

    def new_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids % NEW_MOD != 0
        texts = batch.column("text").to_pylist()
        mut = ids % MUT_MOD == 0
        new_texts = [(t or "") + " v2" if m else t for t, m in zip(texts, mut)]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text": pa.array(new_texts, pa.string())}
        ).filter(pa.array(keep))

    base = ds.map_batches(old_side, batch_format="pyarrow", zero_copy_batch=True)
    delta = ds.map_batches(new_side, batch_format="pyarrow", zero_copy_batch=True)
    return base, delta


def merged_snapshot(sf_dir: str, broadcast_gate: int = MERGE_BROADCAST_GATE):
    base, delta = _snapshot_views(sf_dir)
    return merge_upsert(base, delta, broadcast_gate=broadcast_gate)


MERGED_SNAPSHOT_ORACLE = f"""
    WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id % {OLD_MOD} = 0
    ), delta AS (
        SELECT doc_id,
               CASE WHEN doc_id % {MUT_MOD} = 0
                    THEN COALESCE(text, '') || ' v2' ELSE text END AS text
        FROM documents WHERE doc_id % {NEW_MOD} != 0
    )
    SELECT COALESCE(d.doc_id, b.doc_id) AS doc_id,
           CASE WHEN d.doc_id IS NULL THEN b.text ELSE d.text END AS text,
           CASE WHEN d.doc_id IS NULL THEN 'base' ELSE 'delta' END AS origin
    FROM base b FULL JOIN delta d ON b.doc_id = d.doc_id
"""

SNAPSHOT_QUERIES = {"snapshot_diff": snapshot_diff, "merged_snapshot": merged_snapshot}
SNAPSHOT_ORACLES = {
    "snapshot_diff": SNAPSHOT_DIFF_ORACLE,
    "merged_snapshot": MERGED_SNAPSHOT_ORACLE,
}
