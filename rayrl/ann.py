"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: brute-force cosine top-k — numpy matmul per batch
  against a broadcast query matrix (ray.put once, read per actor).
  Exact; the baseline and the DuckDB-oracle-checked query.
- ``ann_lsh_topk``: random-hyperplane-LSH bucketed variant — the scale
  path: each vector lands in a few buckets, queries probe only their
  buckets, so per-query work is corpus/buckets instead of corpus.
  Approximate; tested against the brute-force baseline for recall.
- ``ann_ivf_topk``: coarse-k-means IVF — queries probe nprobe cells;
  zero-shuffle (centroids broadcast, cells scanned batch-side).
- ``ann_pq_topk`` / ``pq_codes``: product quantization (Jégou 2011) —
  byte codes + per-query ADC lookup tables; ~32× vector compression.
- ``ann_recall_report``: recall@k of every approximate path vs the
  exact brute-force top-k on shared queries (the deployment QA gate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from . import rng


def _read_emb(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _l2_normalize(mat: np.ndarray) -> np.ndarray:
    """Row-normalize in place with the zero-norm guard: an all-zero
    embedding (the hygiene case embedding_norms flags) must yield a
    zero row, not a 0/0 NaN row that poisons every comparison
    downstream (r5 review — the IVF/PQ paths already guarded, the
    brute/LSH paths did not)."""
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return mat


def _topk_head(k: int):
    """Per-query global head: (sim desc, vec_id asc), rank 1..k — the
    ONE tie-break every exact-twin oracle depends on (r5 review: three
    verbatim copies risked drifting)."""

    def head(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "vec_id"]]

    return head


def _train_sample(emb_ds, n: int, max_n: int, seed: int, tag: int):
    """Deterministic hash-gated training sample, collected, id-sorted
    and L2-normalized — the shared prelude of the IVF and PQ trainers
    (r5 review: two hand copies)."""

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        if n <= max_n:
            return batch
        cut = np.uint64(int(max_n / n * 2**64))
        h = rng.hash_u64(batch["vec_id"].to_numpy(), seed, tag)
        return batch[h < cut]

    df = emb_ds.map_batches(gate, batch_format="pandas").to_pandas()
    df = df.sort_values("vec_id").reset_index(drop=True)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df, _l2_normalize(X)


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    q = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
        .sort_values("vec_id")
    )
    qm = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    _l2_normalize(qm)
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
        _l2_normalize(emb)
        vids = batch["vec_id"].to_numpy()
        sims = mat @ emb.T  # (nq, batch)
        rows = []
        for qi in range(len(ids)):
            # DROP the self row rather than down-ranking it with a
            # sentinel sim: on a corpus with <= k vectors the sentinel
            # row reached the global head while the oracle's
            # `vec_id <> qid` excludes it (r5 review)
            valid = vids != ids[qi]
            s, vv = sims[qi][valid], vids[valid]
            take = min(k, len(s))
            # deterministic at any batching: order the kept subset by
            # (sim desc, vec_id asc) so ties at the k boundary always
            # resolve the same way the global head (and the SQL
            # oracle) resolves them
            top = np.lexsort((vv, -s))[:take]
            for j in top:
                rows.append((int(ids[qi]), int(vv[j]), float(s[j])))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "sim"])

    partials = _read_emb(sf_dir).map_batches(partial, batch_format="pandas", batch_size=4096)

    return partials.groupby("query_id").map_groups(_topk_head(k), batch_format="pandas")


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
        _l2_normalize(emb)
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


# ----------------------------------------------------------- IVF

# deterministic hash-gated training sample for the coarse quantizer
# (faiss-style: IVF centroids are trained on a bounded sample, never
# the full corpus)
_IVF_TRAIN_MAX = 100_000


def train_ivf_centroids(
    emb_ds, n_centroids: int = 16, iters: int = 8, seed: int = 0
) -> np.ndarray:
    """K-means coarse quantizer, deterministic at any parallelism:

    - the training set is a hash-gated sample (rng counter stream on
      vec_id → membership is a pure row function), collected and
      sorted by vec_id so the float summation order is fixed;
    - init = the ``n_centroids`` sample vectors with smallest
      hash(vec_id) (spread, but deterministic);
    - fixed ``iters`` Lloyd steps in float64 on the driver (the sample
      is bounded by ``_IVF_TRAIN_MAX``; ties → lowest centroid id).

    Returns a normalized (n_centroids, dim) matrix (cosine/IP space)."""
    n = emb_ds.count()
    tag = rng.tag_for("ann.ivf_train")

    df, X = _train_sample(emb_ds, n, _IVF_TRAIN_MAX, seed, tag)
    order = np.argsort(rng.hash_u64(df["vec_id"].to_numpy(), seed, rng.tag_for("ann.ivf_init")), kind="stable")
    C = X[order[:n_centroids]].copy()
    for _ in range(iters):
        # cosine assignment (argmax IP == argmin angular distance);
        # np.argmax breaks ties toward the lowest centroid id
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 1e-12:
                    C[c] = v / nv
    return C


def ann_ivf_topk(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 0,
):
    """IVF-style ANN — the scale path for large query sets: a coarse
    k-means quantizer partitions the corpus into ``n_centroids`` cells;
    each query probes only its ``nprobe`` nearest cells.

    Ray shape: NO shuffle of embeddings at all. Centroids (trained on a
    deterministic bounded sample) and the per-query probe sets are
    broadcast once; each corpus batch assigns its own vectors to cells
    with one (batch × n_centroids) matmul, computes similarities only
    for rows falling in some probing query's cells (~nprobe/n_centroids
    of the corpus per query), and emits bounded partial top-k rows; a
    tiny per-query groupby head merges them. Contrast: a materialized
    inverted index (the classic IVF layout) would pay one full
    embedding shuffle to co-locate cells — the right trade only when
    the index is reused across many query waves; for a query-stream
    API the batch-side probe wins at every scale.

    Approximate (recall vs ann_topk tested); same output schema /
    tie-breaks as ann_topk."""
    C = train_ivf_centroids(_read_emb(sf_dir), n_centroids, seed=seed)
    qids, qm = _query_matrix(sf_dir, n_queries)
    # per-query probe cells: nprobe nearest centroids
    probes = np.argsort(-(qm @ C.T), kind="stable", axis=1)[:, :nprobe]
    # (n_centroids, nq) membership: does query q probe cell c?
    probe_mask = np.zeros((len(C), len(qids)), dtype=bool)
    for qi in range(len(qids)):
        probe_mask[probes[qi], qi] = True
    ref = ray.put((qids, qm, C, probe_mask))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids, mat, cent, pmask = ray.get(ref)
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        vids = batch["vec_id"].to_numpy()
        assign = np.argmax(emb @ cent.T, axis=1)  # (batch,)
        rows = []
        for qi in range(len(ids)):
            m = pmask[assign, qi]
            m &= vids != ids[qi]  # exclude self
            if not m.any():
                continue
            sims = mat[qi] @ emb[m].T
            sel_ids = vids[m]
            take = min(k, len(sims))
            top = np.lexsort((sel_ids, -sims))[:take]
            for j in top:
                rows.append((int(ids[qi]), int(sel_ids[j]), float(sims[j])))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "sim"])

    partials = _read_emb(sf_dir).map_batches(partial, batch_format="pandas", batch_size=4096)

    return partials.groupby("query_id").map_groups(_topk_head(k), batch_format="pandas")


def label_centroids(sf_dir: str):
    """Per-label embedding centroid (element-wise mean) — the vector
    aggregate behind IVF training and class prototypes. Partial
    (label, pos, sum, cnt) rows per batch (labels bounded; the flat
    list values reshape zero-copy to an (n, dim) float matrix), one
    tiny bucketed reduce, finalize sum/cnt on the driver-sized result.
    Accumulation is float64 so the round(6) output matches DuckDB's
    avg-over-float exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .shuffle import group_agg

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        labels = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(labels), -1).astype(np.float64)
        dim = mat.shape[1]
        labs, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(labs), dim), dtype=np.float64)
        np.add.at(sums, inv, mat)
        cnts = np.bincount(inv, minlength=len(labs)).astype(np.int64)
        return pd.DataFrame(
            {
                "label": np.repeat(labs, dim),
                "pos": np.tile(np.arange(1, dim + 1, dtype=np.int64), len(labs)),
                "s": sums.ravel(),
                "cnt": np.repeat(cnts, dim),
            }
        )

    red = group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["label", "pos"],
        {"s": ("s", "sum"), "cnt": ("cnt", "sum")},
        num_buckets=16,
    ).to_pandas()
    red["centroid"] = (red["s"] / red["cnt"]).round(6)
    return red[["label", "pos", "centroid"]]


LABEL_CENTROIDS_ORACLE = """
    SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
           round(avg(e), 6) AS centroid
    FROM (SELECT label, unnest(embedding) AS e,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings)
    GROUP BY 1, 2
"""


OUTLIER_TOP_K = 20


def embedding_outliers(sf_dir: str, k_top: int = OUTLIER_TOP_K):
    """The ``k_top`` vectors farthest (Euclidean) from their OWN
    label's centroid — embedding-space outlier detection, the vector-QA
    pass that flags mislabeled or corrupted embeddings before they
    poison a similarity index or a semantic-dedup run.

    Scale shape: the (labels × dim) centroid matrix reduces exactly
    like :func:`label_centroids` (long-form partials, one tiny bucketed
    reduce) and broadcasts once via ``ray.put``; the distance pass is
    one vectorized matrix op per batch that keeps only its LOCAL top-k
    (top-k is mergeable), so the driver merges ≤ k·n_blocks candidate
    rows. Ties at the rounded distance break by vec_id ascending on
    both engines."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .shuffle import group_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )

    def _mats(batch: pa.Table):
        labels = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        return labels, flat.reshape(len(labels), -1).astype(np.float64)

    def cent_partial(batch: pa.Table) -> pd.DataFrame:
        labels, mat = _mats(batch)
        dim = mat.shape[1]
        labs, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(labs), dim), dtype=np.float64)
        np.add.at(sums, inv, mat)
        cnts = np.bincount(inv, minlength=len(labs)).astype(np.int64)
        return pd.DataFrame(
            {
                "label": np.repeat(labs, dim),
                "pos": np.tile(np.arange(dim, dtype=np.int64), len(labs)),
                "s": sums.ravel(),
                "cnt": np.repeat(cnts, dim),
            }
        )

    red = group_agg(
        ds.map_batches(cent_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["label", "pos"],
        {"s": ("s", "sum"), "cnt": ("cnt", "sum")},
        num_buckets=16,
    ).to_pandas()  # labels × dim rows
    red = red.sort_values(["label", "pos"])
    labs = np.sort(red["label"].unique())
    dim = int(red["pos"].max()) + 1
    C = (red["s"].to_numpy() / red["cnt"].to_numpy()).reshape(len(labs), dim)
    ref = ray.put((labs, C))

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        labs_, C_ = ray.get(ref)
        labels, mat = _mats(batch)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.searchsorted(labs_, labels)
        diff = mat - C_[li]
        dist = np.round(np.sqrt((diff * diff).sum(axis=1)), 6)
        order = np.lexsort((ids, -dist))[:k_top]
        return pd.DataFrame(
            {"vec_id": ids[order], "label": labels[order], "dist": dist[order]}
        )

    cand = ds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # ≤ k_top × n_blocks rows
    cand = cand.sort_values(["dist", "vec_id"], ascending=[False, True]).head(k_top)
    return cand.reset_index(drop=True)


EMBEDDING_OUTLIERS_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
    ), c AS (
        SELECT label, pos, avg(v) AS cv FROM e GROUP BY 1, 2
    ), d AS (
        SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
               round(sqrt(sum((e.v - c.cv) * (e.v - c.cv))), 6) AS dist
        FROM e JOIN c USING (label, pos) GROUP BY 1, 2
    )
    SELECT vec_id, label, dist FROM d
    ORDER BY dist DESC, vec_id ASC LIMIT {OUTLIER_TOP_K}
"""


def embedding_norms(sf_dir: str):
    """Per-vector L2 norm + dimension — the vector-column hygiene pass
    (norm-0 / wrong-dim detection before any similarity stage). The
    flat list values square-sum per segment via ``np.add.reduceat``
    over the list offsets (zero Python per row); float64 accumulation,
    round(6) output to absorb last-ulp summation-order variance vs the
    SQL list_sum."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def norms(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        dims = (offs[1:] - offs[:-1]).astype(np.int64)
        sq = flat * flat
        sums = np.add.reduceat(sq, offs[:-1]) if len(flat) else np.zeros(0)
        sums = np.where(dims == 0, 0.0, sums)  # reduceat repeats on empty segments
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "dim": pa.array(dims, pa.int64()),
                "l2_norm": pa.array(np.round(np.sqrt(sums), 6), pa.float64()),
            }
        )

    return ds.map_batches(norms, batch_format="pyarrow", zero_copy_batch=True)


EMBEDDING_NORMS_ORACLE = """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
"""


# ------------------------------------------- product quantization (PQ)

_PQ_TRAIN_MAX = 200_000


def train_pq_codebooks(
    emb_ds, m_sub: int = 8, n_codes: int = 32, iters: int = 8, seed: int = 0
) -> np.ndarray:
    """Per-subspace k-means codebooks (Jégou et al. 2011 product
    quantization): the normalized vectors are split into ``m_sub``
    contiguous subvectors and each subspace gets ``n_codes`` Euclidean
    centroids. Deterministic at any parallelism, same recipe as
    `train_ivf_centroids`: hash-gated bounded sample, sorted by vec_id
    (fixed float summation order), init = first ``n_codes`` sample rows
    in hash order, fixed Lloyd steps on the driver, argmin ties → the
    lowest code; empty codes keep their previous centroid. Returns
    (m_sub, n_codes, dim/m_sub) float64."""
    n = emb_ds.count()
    tag = rng.tag_for("ann.pq_train")

    df, X = _train_sample(emb_ds, n, _PQ_TRAIN_MAX, seed, tag)
    dim = X.shape[1]
    assert dim % m_sub == 0, "m_sub must divide the embedding dim"
    dsub = dim // m_sub
    order = np.argsort(
        rng.hash_u64(df["vec_id"].to_numpy(), seed, rng.tag_for("ann.pq_init")),
        kind="stable",
    )
    books = np.empty((m_sub, n_codes, dsub), dtype=np.float64)
    for j in range(m_sub):
        Xj = X[:, j * dsub : (j + 1) * dsub]
        C = Xj[order[:n_codes]].copy()
        for _ in range(iters):
            # argmin ||x-c||² = argmin(||c||² - 2x·c); ties → lowest code
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xj @ C.T)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                m = assign == c
                if m.any():
                    C[c] = Xj[m].mean(axis=0)
        books[j] = C
    return books


def _pq_encode(emb: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(rows, m_sub) uint8 codes: per-subspace Euclidean argmin (ties →
    lowest code). Pure per-row function of the broadcast codebooks —
    identical at any block layout."""
    m_sub, n_codes, dsub = books.shape
    codes = np.empty((emb.shape[0], m_sub), dtype=np.uint8)
    for j in range(m_sub):
        Xj = emb[:, j * dsub : (j + 1) * dsub]
        C = books[j]
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xj @ C.T)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def pq_codes(sf_dir: str, m_sub: int = 8, n_codes: int = 32, seed: int = 0):
    """(vec_id, codes list<int64>): the materialized PQ compression of
    the embedding column — m_sub bytes per vector instead of dim×4 (a
    100-TB vector corpus compresses ~32× before it ever rides a shuffle
    or an index build). Codebooks broadcast once; encoding is one
    matmul per subspace per batch."""
    books = train_pq_codebooks(_read_emb(sf_dir), m_sub, n_codes, seed=seed)
    ref = ray.put(books)

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(ref)
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        codes = _pq_encode(emb, b).astype(np.int64)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(), "codes": list(codes)}
        )

    return _read_emb(sf_dir).map_batches(encode, batch_format="pandas", batch_size=4096)


def ann_pq_topk(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 5,
    m_sub: int = 8,
    n_codes: int = 32,
    seed: int = 0,
    batch_size: int = 4096,
):
    """PQ asymmetric-distance (ADC) ANN — the memory-bound scale path:
    corpus vectors are quantized to ``m_sub`` byte codes and each query
    scores a row with m_sub table LOOKUPS (query-subvector · codebook,
    precomputed) instead of a dim-wide dot product. Jégou et al. 2011.

    Ray shape: NO shuffle. Codebooks (trained on a deterministic
    bounded sample) and the per-query lookup tables broadcast once;
    each corpus batch encodes its own rows (one matmul per subspace)
    and emits bounded partial top-k by ADC score; a tiny per-query
    head merges. The ADC score is a pure per-row function of the
    broadcast state, so output is identical at any block layout (same
    argument as ann_topk). A reusing deployment materializes
    `pq_codes` once and scans codes only — this query API fuses
    encode+scan into the single read pass.

    Approximate: ranks by ADC (quantized) similarity; the
    planted-near-identical guarantee is tested like LSH/IVF."""
    books = train_pq_codebooks(_read_emb(sf_dir), m_sub, n_codes, seed=seed)
    qids, qm = _query_matrix(sf_dir, n_queries)
    dsub = books.shape[2]
    # (nq, m_sub, n_codes) lookup tables: q_subj · codebook_j
    tables = np.einsum(
        "qjd,jcd->qjc", qm.reshape(len(qids), m_sub, dsub), books
    )
    ref = ray.put((qids, tables, books))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids, tabs, b = ray.get(ref)
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        vids = batch["vec_id"].to_numpy()
        codes = _pq_encode(emb, b)  # (rows, m_sub)
        j_idx = np.arange(codes.shape[1])[None, :]
        rows = []
        for qi in range(len(ids)):
            sims = tabs[qi][j_idx, codes].sum(axis=1)  # (rows,)
            s = sims.copy()
            s[vids == ids[qi]] = -2.0  # exclude self
            take = min(k, len(s))
            top = np.lexsort((vids, -s))[:take]
            for j in top:
                rows.append((int(ids[qi]), int(vids[j]), float(s[j])))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "sim"])

    partials = _read_emb(sf_dir).map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    )

    return partials.groupby("query_id").map_groups(_topk_head(k), batch_format="pandas")


def ann_recall_report(sf_dir: str, k: int = 10, n_queries: int = 5) -> pd.DataFrame:
    """Self-measuring ANN QA: recall@k of every approximate path (LSH /
    IVF / PQ-ADC) against the exact brute-force top-k on the SAME
    queries — the "measure, don't guess" gate a deployment runs on a
    corpus sample before trusting an index config at full scale.
    Returns one row per method with mean and min per-query recall.

    Scale shape: four already-scale-safe pipelines over the same read;
    the comparison itself touches only 4·k·n_queries id rows on the
    driver."""
    truth = ann_topk(sf_dir, k, n_queries).to_pandas()
    tsets = {q: set(g["vec_id"]) for q, g in truth.groupby("query_id")}
    rows = []
    for method, fn in (
        ("lsh", ann_lsh_topk),
        ("ivf", ann_ivf_topk),
        ("pq", ann_pq_topk),
    ):
        got = fn(sf_dir, k=k, n_queries=n_queries).to_pandas()
        gsets = {q: set(g["vec_id"]) for q, g in got.groupby("query_id")}
        per_q = [
            len(tsets[q] & gsets.get(q, set())) / max(len(tsets[q]), 1)
            for q in sorted(tsets)
        ]
        rows.append(
            (method, round(float(np.mean(per_q)), 4), round(float(np.min(per_q)), 4))
        )
    return pd.DataFrame(rows, columns=["method", "mean_recall", "min_recall"])


# ----------------------------------------- exact-oracle twins (round 4)

_IVF_EXACT_CENTROIDS = 16


def ann_ivf_exact(sf_dir: str, k: int = 10, n_queries: int = 5):
    """IVF with nprobe = n_centroids — every cell probed, so the output
    is BY CONSTRUCTION the exact brute-force top-k and the ``ann_topk``
    SQL oracle verifies the whole IVF machinery (quantizer training,
    cell assignment, probe masking, partial top-k merge) rather than
    just its recall. The approximate production config stays
    ``ann_ivf_topk`` (rows-only + ann_recall_report)."""
    return ann_ivf_topk(
        sf_dir,
        k=k,
        n_queries=n_queries,
        n_centroids=_IVF_EXACT_CENTROIDS,
        nprobe=_IVF_EXACT_CENTROIDS,
    )


ANN_IVF_EXACT_ORACLE = ANN_TOPK_ORACLE


def ann_lsh_exact(sf_dir: str, k: int = 10, n_queries: int = 5):
    """LSH with ``n_planes = 0`` — every vector (and every query) lands
    in the single bucket 0, so the bucket probe degenerates to the
    exact brute-force scan and the ``ann_topk`` SQL oracle verifies the
    whole LSH machinery (plane hashing, bucket grouping, per-bucket
    query masking, in-bucket top-k with the (sim desc, vec_id asc)
    tie-break) rather than just its recall. The approximate production
    config stays ``ann_lsh_topk`` (rows-only + ann_recall_report);
    the single-group shuffle here is test-scale by construction."""
    return ann_lsh_topk(sf_dir, k=k, n_queries=n_queries, n_planes=0)


ANN_LSH_EXACT_ORACLE = ANN_TOPK_ORACLE

COSINE_PAIRS_THRESHOLD = 0.4


def embedding_cosine_pairs_exact(sf_dir: str, threshold: float = COSINE_PAIRS_THRESHOLD):
    """(vec_a, vec_b, sim): EXACT all-pairs cosine ≥ threshold over the
    embeddings table — the ★-oracle twin of ``embedding_near_dups``
    (which pigeonholes a signed-projection signature and is rows-only).

    Engine shape: the normalized corpus matrix broadcasts ONCE
    (``ray.put``) and each batch emits its (row < col) above-threshold
    hits from one (batch × n) matmul. Quadratic in the corpus BY
    DESIGN — this is the bounded-table test oracle (the ann_topk
    pattern); the 100-TB path remains ``embedding_near_dups``. Both
    sides compute the cosine in float64 (the oracle CASTs the float32
    lists to DOUBLE[]); disagreement needs a value within ~1e-15 of
    the threshold or a round-6 midpoint — the documented
    measure-zero trade of the oracle family."""
    df = _read_emb(sf_dir).to_pandas().sort_values("vec_id")
    ids = df["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def hits(batch: pd.DataFrame) -> pd.DataFrame:
        aids, amat = ray.get(ref)
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        vids = batch["vec_id"].to_numpy().astype(np.int64)
        sims = emb @ amat.T  # (batch, n)
        m = (sims >= threshold) & (vids[:, None] < aids[None, :])
        bi, aj = np.nonzero(m)
        return pd.DataFrame(
            {
                "vec_a": vids[bi],
                "vec_b": aids[aj],
                "sim": np.round(sims[bi, aj], 6),
            }
        )

    return _read_emb(sf_dir).map_batches(hits, batch_format="pandas", batch_size=4096)


EMBEDDING_COSINE_PAIRS_ORACLE = f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= {COSINE_PAIRS_THRESHOLD}
"""


ANN_QUERIES = {
    "ann_topk": ann_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_pq_topk": ann_pq_topk,
    "pq_codes": pq_codes,
    "ann_recall_report": ann_recall_report,
    "label_centroids": label_centroids,
    "embedding_norms": embedding_norms,
    "embedding_outliers": embedding_outliers,
    "ann_ivf_exact": ann_ivf_exact,
    "ann_lsh_exact": ann_lsh_exact,
    "embedding_cosine_pairs_exact": embedding_cosine_pairs_exact,
}
