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

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h_old = content_hash64(batch.column("text"))
        texts = batch.column("text").to_pylist()
        mut = ids % MUT_MOD == 0
        new_texts = [
            (t or "") + " v2" if m else t for t, m in zip(texts, mut)
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
               CASE WHEN doc_id % {MUT_MOD} = 0 THEN text || ' v2' ELSE text END AS text
        FROM documents WHERE doc_id % {NEW_MOD} != 0
    )
    SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.doc_id IS NULL THEN 'added'
                WHEN new.doc_id IS NULL THEN 'removed'
                WHEN old.text = new.text THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM old FULL JOIN new ON old.doc_id = new.doc_id
"""

SNAPSHOT_QUERIES = {"snapshot_diff": snapshot_diff}
SNAPSHOT_ORACLES = {"snapshot_diff": SNAPSHOT_DIFF_ORACLE}
