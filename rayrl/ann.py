"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: brute-force cosine top-k — numpy matmul per batch
  against a broadcast query matrix (ray.put once, read per actor).
  Exact; the baseline and the DuckDB-oracle-checked query.
- ``ann_lsh_topk``: random-hyperplane-LSH bucketed variant — the scale
  path: each vector lands in a few buckets, queries probe only their
  buckets, so per-query work is corpus/buckets instead of corpus.
  Approximate; tested against the brute-force baseline for recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from . import rng


def _read_emb(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    q = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
        .sort_values("vec_id")
    )
    qm = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    return q["vec_id"].to_numpy(), qm


def ann_topk(sf_dir: str, k: int = 10, n_queries: int = 5):
    """Exact cosine top-k for the first ``n_queries`` vectors (self
    excluded). Two-phase top-k: per-batch partial top-k rows (bounded:
    n_queries × k per batch) → global per-query head. Output (query_id,
    rank, vec_id) — integer-only so hashes match the SQL oracle."""
    qids, qm = _query_matrix(sf_dir, n_queries)
    ref = ray.put((qids, qm))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids, mat = ray.get(ref)
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        vids = batch["vec_id"].to_numpy()
        sims = mat @ emb.T  # (nq, batch)
        rows = []
        for qi in range(len(ids)):
            s = sims[qi].copy()
            mask = vids == ids[qi]
            s[mask] = -2.0  # exclude self
            take = min(k, len(s))
            # deterministic at any batching: order the kept subset by
            # (sim desc, vec_id asc) so ties at the k boundary always
            # resolve the same way the global head (and the SQL
            # oracle) resolves them
            top = np.lexsort((vids, -s))[:take]
            for j in top:
                rows.append((int(ids[qi]), int(vids[j]), float(s[j])))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "sim"])

    partials = _read_emb(sf_dir).map_batches(partial, batch_format="pandas", batch_size=4096)

    def head(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "vec_id"]]

    return partials.groupby("query_id").map_groups(head, batch_format="pandas")


ANN_TOPK_ORACLE = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         s AS (SELECT q.qid, e.vec_id,
                      list_cosine_similarity(q.qe, e.embedding) AS sim
               FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid)
    SELECT qid AS query_id,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank,
           vec_id
    FROM s QUALIFY rank <= 10
"""


class _LshIndexStage:
    """Actor stage holding the hyperplane set; emits (bucket, vec_id,
    embedding) rows. Planes generated deterministically per actor."""

    def __init__(self, dim: int, n_planes: int, seed: int):
        u = rng.uniform(
            np.arange(n_planes * dim, dtype=np.int64), seed, rng.tag_for("ann.lsh")
        )
        self.planes = (u.reshape(n_planes, dim) - 0.5)
        self.planes /= np.linalg.norm(self.planes, axis=1, keepdims=True)

    def bucket_of(self, emb: np.ndarray) -> np.ndarray:
        bits = (emb @ self.planes.T) > 0
        return bits @ (1 << np.arange(self.planes.shape[0], dtype=np.int64))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        batch = batch.copy()
        batch["bucket"] = self.bucket_of(emb)
        return batch


def ann_lsh_topk(sf_dir: str, k: int = 10, n_queries: int = 5, n_planes: int = 6, seed: int = 0):
    """Bucketed ANN: corpus bucketed by random-hyperplane signs; each
    query scans only its own bucket (single-probe). Recall < 1 by
    design; compared against ``ann_topk`` in tests."""
    sample = _read_emb(sf_dir).take_batch(1, batch_format="pandas")
    dim = len(sample["embedding"].iloc[0])
    stage = _LshIndexStage(dim, n_planes, seed)

    bucketed = _read_emb(sf_dir).map_batches(stage, batch_format="pandas", batch_size=4096)

    qids, qm = _query_matrix(sf_dir, n_queries)
    q_buckets = stage.bucket_of(qm)
    ref = ray.put((qids, qm, q_buckets))

    def scan(group: pd.DataFrame) -> pd.DataFrame:
        ids, mat, qb = ray.get(ref)
        b = int(group["bucket"].iloc[0])
        qsel = np.nonzero(qb == b)[0]
        if len(qsel) == 0:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64")})
        emb = np.stack(group["embedding"].to_numpy()).astype(np.float64)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        vids = group["vec_id"].to_numpy()
        rows = []
        for qi in qsel:
            sims = mat[qi] @ emb.T
            mask = vids == ids[qi]
            sims[mask] = -2.0
            order = np.lexsort((vids, -sims))[:k]
            for rank, j in enumerate(order, 1):
                rows.append((int(ids[qi]), rank, int(vids[j])))
        return pd.DataFrame(rows, columns=["query_id", "rank", "vec_id"])

    return bucketed.groupby("bucket").map_groups(scan, batch_format="pandas")


ANN_QUERIES = {
    "ann_topk": ann_topk,
    "ann_lsh_topk": ann_lsh_topk,
}
