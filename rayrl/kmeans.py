"""Distributed k-means (Lloyd's) over the embedding column — the
clustering stage of semantic corpus curation (SemDeDup-style cluster-
then-dedup, cluster-balanced sampling, IVF coarse quantizer training).
Reference parity: an added LLM-corpus operator (no rlErrorGeneratoR
counterpart); no SQL oracle (iterative ML) — driver records rows-only,
pytest verifies recovery on planted blobs and determinism at any
parallelism.

Scale shape: embeddings NEVER shuffle. Every iteration broadcasts the
(k × dim) centroid matrix via ``ray.put`` and runs ONE map_batches
pass: assignment is a vectorized argmin over ``x·cᵀ`` and the batch
emits long-form (cluster, pos, sum, cnt) partials — k·dim rows per
batch, not n rows — which one small bucketed reduce combines. The
driver touches only k·dim floats per iteration. Determinism at any
parallelism (CLAUDE.md rule 6): the reduce's float64 summation order
varies with block arrival, so centroids are ROUNDED to 6 decimals each
iteration — the jitter is ~1e-10 relative, the rounding re-quantizes
it away, and every downstream argmin sees bit-identical centroids.
Seeding is counter-based (splitmix64 over vec_id), not np.random.

Empty clusters keep their previous centroid. Assignment ties break to
the lowest cluster index (np.argmin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .rng import _splitmix64
from .shuffle import group_agg

K_CLUSTERS = 8
ITERS = 5


def _id_mat(batch: pa.Table):
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    mat = flat.reshape(len(ids), -1).astype(np.float64)
    return ids, mat


def _seed_centroids(ds: "ray.data.Dataset", k: int, seed: int) -> np.ndarray:
    """The k vectors with the smallest splitmix64(vec_id ^ seed) — a
    deterministic, order-independent sample. Each batch forwards only
    its k best candidates, so the driver merges ≤ k·n_blocks rows."""

    def best(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _id_mat(batch)
        h = _splitmix64(ids.view(np.uint64) ^ np.uint64(seed))
        take = np.argsort(h, kind="stable")[:k]
        return pd.DataFrame(
            {
                # stays uint64: an int64 cast would sign-flip the order
                # and pick different seeds at different block counts
                "h": h[take],
                "vec_id": ids[take],
                "embedding": [row.tolist() for row in mat[take]],
            }
        )

    cand = ds.map_batches(best, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    cand = cand.sort_values(["h", "vec_id"], kind="stable").head(k)
    return np.round(np.array(cand["embedding"].tolist(), dtype=np.float64), 6)


def kmeans_fit(
    ds: "ray.data.Dataset", k: int = K_CLUSTERS, iters: int = ITERS, seed: int = 1
) -> np.ndarray:
    """Lloyd's iterations over a Dataset with (vec_id, embedding).
    Returns the (k, dim) float64 centroid matrix (rounded 6dp)."""
    ds = ds.materialize()  # scanned once per iteration
    centroids = _seed_centroids(ds, k, seed)
    dim = centroids.shape[1]

    for _ in range(iters):
        ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pd.DataFrame:
            _, mat = _id_mat(batch)
            c = ray.get(ref)
            # argmin over squared distance: |x|² is constant per row
            d = -2.0 * (mat @ c.T) + (c * c).sum(axis=1)[None, :]
            assign = np.argmin(d, axis=1)
            labs, inv = np.unique(assign, return_inverse=True)
            sums = np.zeros((len(labs), mat.shape[1]), dtype=np.float64)
            np.add.at(sums, inv, mat)
            cnts = np.bincount(inv, minlength=len(labs)).astype(np.int64)
            return pd.DataFrame(
                {
                    "cluster": np.repeat(labs.astype(np.int64), mat.shape[1]),
                    "pos": np.tile(np.arange(mat.shape[1], dtype=np.int64), len(labs)),
                    "s": sums.ravel(),
                    "cnt": np.repeat(cnts, mat.shape[1]),
                }
            )

        red = group_agg(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["cluster", "pos"],
            {"s": ("s", "sum"), "cnt": ("cnt", "sum")},
            num_buckets=8,
        ).to_pandas()  # ≤ k·dim rows
        nxt = centroids.copy()  # empty clusters keep their centroid
        for cl, grp in red.groupby("cluster"):
            g = grp.sort_values("pos")
            nxt[int(cl)] = g["s"].to_numpy() / g["cnt"].to_numpy()
        centroids = np.round(nxt, 6)
        assert centroids.shape == (k, dim)
    return centroids


def kmeans_assign(ds: "ray.data.Dataset", centroids: np.ndarray) -> "ray.data.Dataset":
    """(vec_id, cluster, dist): nearest centroid per vector (dist is
    the Euclidean distance, rounded 6dp; row-local — no accumulation,
    so it is exactly reproducible given the rounded centroids)."""
    ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        ids, mat = _id_mat(batch)
        c = ray.get(ref)
        d = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        best = np.argmin(d, axis=1)
        dist = np.sqrt(np.maximum(d[np.arange(len(ids)), best], 0.0))
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(best.astype(np.int64), pa.int64()),
                "dist": pa.array(np.round(dist, 6), pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_embeddings(sf_dir: str, k: int = K_CLUSTERS, iters: int = ITERS):
    """Driver query: fit on the embeddings table, return assignments."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    centroids = kmeans_fit(ds, k=k, iters=iters)
    return kmeans_assign(ds, centroids)


KMEANS_QUERIES = {"kmeans_embeddings": kmeans_embeddings}
