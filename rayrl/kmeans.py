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
    if centroids.shape[0] == 0:
        raise ValueError("kmeans_fit: empty embedding dataset")
    # fewer vectors than k (a small shard — the degenerate-input
    # contract, r5 review): fit with k_eff = n centroids rather than
    # crash the shape assert; callers see the actual centroid count
    k = centroids.shape[0]
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


SEM_THRESHOLD = 0.9


def _local_components(a: np.ndarray, b: np.ndarray, nodes: np.ndarray) -> np.ndarray:
    """Min-label connected components over edge arrays (a, b) for the
    given node ids — vectorized pointer-jumping, all in-memory (the
    caller guarantees the group is cluster-local and small)."""
    order = np.argsort(nodes, kind="stable")
    nodes_s = nodes[order]
    ai = np.searchsorted(nodes_s, a)
    bi = np.searchsorted(nodes_s, b)
    parent = np.arange(len(nodes_s), dtype=np.int64)
    for _ in range(64):  # relax + jump until fixpoint; dup groups are tiny
        prev = parent.copy()
        m = np.minimum(parent[ai], parent[bi])
        np.minimum.at(parent, ai, m)
        np.minimum.at(parent, bi, m)
        parent = parent[parent]  # pointer jumping
        if np.array_equal(parent, prev):
            break
    labels = np.empty(len(nodes), dtype=np.int64)
    labels[order] = nodes_s[parent]
    return labels


# In-task all-pairs bound for one cluster: C(n, 2) above this and the
# cluster is skipped (members all kept) — the same logged recall cap as
# the LSH bucket scans (dedup._BUCKET_CAP / scoring max_block_pairs).
# At the default, one cluster's sim work tops out at ~10⁸ dot products
# per strip pass; a skewed giant cluster (boilerplate embeddings all
# landing in one centroid) degrades to "kept, logged" instead of OOMing
# the task. Exactness callers (tests, small corpora) pass None.
MAX_CLUSTER_PAIRS = 50_000_000


def semantic_dedup(
    sf_dir: str,
    k: int = K_CLUSTERS,
    iters: int = ITERS,
    threshold: float = SEM_THRESHOLD,
    seed: int = 1,
    max_cluster_pairs: "int | None" = MAX_CLUSTER_PAIRS,
):
    """SemDeDup (Abbas et al., 2023): k-means the embedding space, then
    within each cluster connect pairs with cosine ≥ threshold and keep
    the minimum vec_id of every duplicate component. Output one row per
    vector: (vec_id, cluster, rep) — ``rep == vec_id`` marks the kept
    representative; filtering to those rows IS the deduplicated corpus.

    Scale shape + partitioning assumption: embeddings ride exactly ONE
    shuffle (cluster-keyed, straight from the assignment pass — no
    join). The within-cluster work is all-pairs cosine, the SemDeDup
    trade: k must be sized so n/k vectors fit one task (the paper uses
    k ≈ n/10⁴; here k is a parameter). The matmul runs in row strips so
    the sim matrix never exceeds strip × cluster floats, and components
    resolve with in-task vectorized pointer jumping — nothing touches
    the driver. A cluster whose C(n,2) exceeds ``max_cluster_pairs``
    (skewed boilerplate embeddings) keeps all its members and logs the
    skip instead of running the uncapped all-pairs (VERDICT r4 #3 —
    same observable recall-cap contract as the LSH bucket scans)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return semantic_dedup_ds(
        ds, k=k, iters=iters, threshold=threshold, seed=seed,
        max_cluster_pairs=max_cluster_pairs,
    )


def semantic_dedup_ds(
    ds: "ray.data.Dataset",
    k: int = K_CLUSTERS,
    iters: int = ITERS,
    threshold: float = SEM_THRESHOLD,
    seed: int = 1,
    max_cluster_pairs: "int | None" = MAX_CLUSTER_PAIRS,
):
    ds = ds.materialize()
    if ds.count() == 0:
        # empty shard (rule 21): the dedup result is exactly empty —
        # return typed, and never reach kmeans_fit's empty-input raise
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "rep": pa.array([], pa.int64()),
                }
            )
        )
    centroids = kmeans_fit(ds, k=k, iters=iters, seed=seed)
    ref = ray.put(centroids)

    def emit(batch: pa.Table) -> pa.Table:
        ids, mat = _id_mat(batch)
        c = ray.get(ref)
        d = -2.0 * (mat @ c.T) + (c * c).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(assign, pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )

    rows = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _warn_oversized

        out = []
        n_skipped, largest = 0, 0
        for cl, g in df.groupby("cluster", sort=False):
            ids = g["vec_id"].to_numpy().astype(np.int64)
            if (
                max_cluster_pairs is not None
                and len(ids) * (len(ids) - 1) // 2 > max_cluster_pairs
            ):
                # oversize cluster: keep every member (rep = self),
                # log the recall cap — never an uncapped all-pairs
                n_skipped += 1
                largest = max(largest, len(ids))
                out.append(
                    pd.DataFrame({"vec_id": ids, "cluster": int(cl), "rep": ids})
                )
                continue
            mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
            norm = np.linalg.norm(mat, axis=1, keepdims=True)
            norm[norm == 0.0] = 1.0
            mat = mat / norm
            ea, eb = [], []
            strip = 1024  # sim matrix capped at strip × |cluster|
            for s in range(0, len(ids), strip):
                sims = mat[s : s + strip] @ mat.T
                ii, jj = np.nonzero(sims >= threshold)
                ii += s
                keep = ii < jj  # upper triangle only
                ea.append(ii[keep])
                eb.append(jj[keep])
            ii = np.concatenate(ea) if ea else np.array([], np.int64)
            jj = np.concatenate(eb) if eb else np.array([], np.int64)
            rep = _local_components(ids[ii], ids[jj], ids) if len(ii) else ids
            out.append(
                pd.DataFrame({"vec_id": ids, "cluster": int(cl), "rep": rep})
            )
        # cap is a PAIR budget — report the largest cluster in pairs too
        _warn_oversized(
            "semantic_dedup",
            n_skipped,
            largest * max(largest - 1, 0) // 2,
            max_cluster_pairs or 0,
            unit="pairs",
        )
        return (
            pd.concat(out)
            if out
            else pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "cluster": pd.Series([], dtype="int64"),
                    "rep": pd.Series([], dtype="int64"),
                }
            )
        )

    from .shuffle import bucketed_group_apply

    return bucketed_group_apply(rows, ["cluster"], per_cluster)


# ----------------------------------------- exact-oracle twin (round 4)

_ASSIGN_EXACT_K = 8


def kmeans_assign_exact(sf_dir: str, k: int = _ASSIGN_EXACT_K):
    """(vec_id, cluster): one nearest-centroid assignment pass with a
    FIXED, SQL-expressible centroid set — the embeddings of the ``k``
    smallest vec_ids — so the DuckDB oracle can reproduce it exactly
    and ★-verify the assignment kernel (the per-iteration heart of
    ``kmeans_fit`` / ``semantic_dedup``, which stay rows-only because
    Lloyd's loop is iterative ML). Distances are float64 on both sides
    (the oracle CASTs the float32 lists to DOUBLE[]); ties break to the
    lowest centroid id in both. ``cluster`` is the centroid's vec_id
    (the hydrated centroid matrix is sorted by vec_id, so the argmin
    index IS that id). Only integer columns are emitted — no float
    hash-compare surface."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # k driver-side rows — a fixed-size dimension hydration, not a collect
    cent = (
        ds.filter(expr=f"vec_id < {k}")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    centroids = np.array(cent["embedding"].tolist(), dtype=np.float64)
    return kmeans_assign(ds, centroids).select_columns(["vec_id", "cluster"])


KMEANS_ASSIGN_ORACLE = f"""
    WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
               FROM embeddings WHERE vec_id < {_ASSIGN_EXACT_K}),
         d AS (SELECT e.vec_id, c.cid,
                      list_distance(CAST(e.embedding AS DOUBLE[]), c.ce) AS dist
               FROM embeddings e CROSS JOIN c)
    SELECT vec_id, cid AS cluster
    FROM d
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) = 1
"""


KMEANS_QUERIES = {
    "kmeans_embeddings": kmeans_embeddings,
    "semantic_dedup": semantic_dedup,
    "kmeans_assign_exact": kmeans_assign_exact,
}
