"""Deduplication suite for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram-Jaccard verification, and
embedding-cosine near-dup. All are compositions of map_batches +
bucketed groupby (the same explicit-partitioning shape as the linkage
blocker — one engine, two uses)."""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Min

from . import rng
from .linkage.stringsim import jaccard, minhash_tags

# Default in-bucket member cap for the LSH / pigeonhole pair scans:
# in-bucket work is quadratic, and a bucket this big is degenerate
# boilerplate whose true pairs are recovered via their other bands /
# segments. Skips are LOGGED (never silent — ADVICE r3, the
# scoring.py:276 principle); callers that need exactness (the oracle
# twins) pass ``bucket_cap=None``.
_BUCKET_CAP = 1000


def _warn_oversized(
    op: str, n_skipped: int, largest: int, cap: int, unit: str = "members"
) -> None:
    """Log a recall-cap event: ``n_skipped`` buckets exceeded ``cap``
    (measured in ``unit`` — callers must pass largest and cap in the
    SAME unit, members or pairs) and were dropped from the pair scan.
    Observable by design — a hot segment value (e.g. flat thumbnails
    dHashing to 0) must not lose its pairs without a trace."""
    if n_skipped:
        logging.getLogger(__name__).warning(
            "%s: skipped %d oversize bucket(s) (largest %d %s > cap %d)"
            " — recall cap on degenerate buckets, their pairs are dropped",
            op,
            n_skipped,
            largest,
            unit,
            cap,
        )


def _read_docs(sf_dir: str, columns):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# needed-id sets up to this size are broadcast for semi-join pruning;
# above it the payload side rides the bucketed join unpruned
_SEMIJOIN_BROADCAST_MAX = 4_000_000


def _prune_to_ids(ds, pairs_ds, pair_col: "str | list[str]", id_col: str):
    """Semi-join prune before a payload-hydration join: filter ``ds``
    to rows whose ``id_col`` appears in ``pairs_ds[pair_col]``. The
    candidate-pair side is typically orders of magnitude smaller than
    the corpus, so shipping the full payload (texts / embeddings)
    through the join shuffle to hydrate a few pairs is waste; the
    needed-id set (ints) is collected and broadcast once, and the
    payload side is filtered with a vectorized sorted-membership test
    before it ever reaches the shuffle. Above the broadcast gate the
    join runs unpruned (``pairs_ds`` must be materialized — callers
    already are, so ``count()`` is free)."""
    n_pairs = pairs_ds.count()
    if n_pairs > _SEMIJOIN_BROADCAST_MAX:
        return ds
    if n_pairs == 0:
        # empty pair sets come back schemaless; nothing survives the
        # prune — keep ds's schema, drop every row
        return ds.map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")
    cols = [pair_col] if isinstance(pair_col, str) else list(pair_col)
    key_df = pairs_ds.select_columns(cols).to_pandas()
    ids = np.unique(np.concatenate([key_df[c].to_numpy() for c in cols]))
    ref = ray.put(ids)

    def keep(batch: pa.Table) -> pa.Table:
        arr = ray.get(ref)
        vals = batch.column(id_col).to_numpy()
        pos = np.searchsorted(arr, vals)
        pos_c = np.minimum(pos, max(len(arr) - 1, 0))
        m = (arr[pos_c] == vals) if len(arr) else np.zeros(len(vals), dtype=bool)
        return batch.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- exact

def dedup_exact(sf_dir: str):
    """Exact dedup by content hash: one row per distinct text with the
    keeper id (= min doc_id) and copy count. Hash-partitioned groupby;
    the full text never leaves the first stage — the shuffle key is the
    64-bit fingerprint (C-speed crc pair over the zero-copy Arrow byte
    view). This is the SCALE path; ``exact_dedup_documents`` in
    relational.py is the oracle-parity variant that groups by full text."""
    from .bytekernels import content_hash64

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        h = content_hash64(batch.column("text"))
        return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(h, pa.int64())})

    return (
        ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fp")
        .aggregate(Min("doc_id", alias_name="keeper"), Count(alias_name="n_copies"))
    )


# distinct-fp (fp, n) entries broadcast below this (16 B each → ≤400 MB
# in the object store); above it the counts ride the bucketed join
SOFT_DEDUP_BROADCAST_MAX = 25_000_000


def soft_dedup_weights(sf_dir: str, broadcast_gate: int = SOFT_DEDUP_BROADCAST_MAX):
    """(doc_id, n_copies, weight): SOFT exact dedup — instead of
    dropping duplicates, every doc gets training weight 1/n_copies so
    a text repeated n times contributes one document's worth of
    gradient in aggregate (the down-weighting alternative to removal).

    Scale shape: texts hash to the 64-bit content fingerprint in the
    read pass (C-speed, zero-copy) and NEVER shuffle; per-batch
    (fp, n) partials feed one distinct-text-sized count reduce. The
    counts table is distinct-TEXT-sized (sublinear in a duplicated
    corpus), so below the gate it broadcasts as two sorted int64
    arrays and the weight lookup fuses into a second streaming pass
    over the fps — ONE narrow int shuffle total (CLAUDE.md rule 12:
    the bucketed join here cost 22.5 s of a 41.9 s run at 500k docs;
    the fused plan reads ~14 s). Above the gate the counts meet the
    (doc_id, fp) rows in the bucketed int join (path-equivalence
    tested with the gate forced to 0). Same fp-vs-text grouping trade
    as `dedup_exact` (63-bit collisions merge distinct texts at
    ~corpus²/2⁶³ probability; the oracle groups by the text itself)."""
    from .bytekernels import content_hash64
    from .shuffle import bucketed_join, group_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        h = content_hash64(batch.column("text"))
        return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(h, pa.int64())})

    fps = ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def cnt(batch: pa.Table) -> pd.DataFrame:
        u, c = np.unique(batch.column("fp").to_numpy(), return_counts=True)
        return pd.DataFrame({"fp": u, "n_copies": c.astype(np.int64)})

    counts = group_agg(
        fps.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"],
        {"n_copies": ("n_copies", "sum")},
    ).materialize()

    if counts.count() <= broadcast_gate:
        parts = [
            (b.column("fp").to_numpy(), b.column("n_copies").to_numpy())
            for b in counts.iter_batches(batch_format="pyarrow")
        ]
        if parts:
            fp_arr = np.concatenate([p[0] for p in parts])
            n_arr = np.concatenate([p[1] for p in parts]).astype(np.int64)
            order = np.argsort(fp_arr)
            fp_arr, n_arr = fp_arr[order], n_arr[order]
        else:
            fp_arr = n_arr = np.zeros(0, np.int64)
        ref = ray.put((fp_arr, n_arr))

        def attach(batch: pa.Table) -> pd.DataFrame:
            fa, na = ray.get(ref)
            f = batch.column("fp").to_numpy()
            # every fp comes from the same corpus pass, so the lookup
            # always hits
            n = na[np.searchsorted(fa, f)]
            return pd.DataFrame(
                {
                    "doc_id": batch.column("doc_id")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "n_copies": n,
                    "weight": np.round(1.0 / n, 6),
                }
            )

        return fps.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    joined = bucketed_join(fps, counts, ["fp"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_copies"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_copies": n,
                "weight": np.round(1.0 / n, 6),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


SOFT_DEDUP_ORACLE = """
    SELECT doc_id,
           CAST(count(*) OVER (PARTITION BY text) AS BIGINT) AS n_copies,
           round(1.0 / count(*) OVER (PARTITION BY text), 6) AS weight
    FROM documents
"""


# ------------------------------------------------------- MinHash + LSH

class _MinHashBands:
    """Actor stage: batched MinHash (one ``minhash_signatures_batch``
    call per Arrow batch — ~5× the per-row throughput) + vectorized
    band folding. Tags built once per actor."""

    def __init__(self, k: int, bands: int, seed: int):
        # A real raise: bands > k makes r = 0 and every band hash
        # identical (one global bucket — recall silently collapses to
        # the bucket-cap skips, or O(n²) uncapped); a non-divisible k
        # silently ignores trailing signature lanes (r5 review).
        if bands > k or k % bands:
            raise ValueError(
                f"minhash bands ({bands}) must divide the signature width ({k})"
            )
        self.tags = minhash_tags(k, seed)
        self.bands = bands
        self.r = k // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .linkage.stringsim import batch_shingles, kmin_from_shingles

        ids = batch.column("doc_id").to_numpy()
        # shared whole-buffer shingle pass (byte-identical to the
        # per-row minhash_signatures_batch — parity-tested)
        codes, row_of, n_rows = batch_shingles(batch.column("text"))
        sig = kmin_from_shingles(codes, row_of, n_rows, self.tags)  # (n, k) uint64
        # non-empty mask without materializing texts into Python
        # objects (VERDICT r4): byte length > 0, null → False
        nonempty = pc.fill_null(
            pc.greater(pc.binary_length(batch.column("text")), 0), False
        ).to_numpy(zero_copy_only=False)
        sig = sig[nonempty]
        keep_ids = ids[nonempty]
        n = len(keep_ids)
        folded = np.zeros((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            h = np.zeros(n, dtype=np.uint64)
            for c in range(self.r):
                h = h * np.uint64(1000003) + sig[:, b * self.r + c]
            folded[:, b] = h >> np.uint64(1)  # int64-positive
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()),
                "band_hash": pa.array(folded.reshape(-1).astype(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(keep_ids, self.bands), pa.int64()),
            }
        )


def _minhash_bucket_fn(pair_mode: str, cap: int | None):
    """Bucket-scan callback for :func:`minhash_candidate_pairs` —
    module-level so the oversize-skip behavior is unit-testable on the
    driver (the closure itself runs inside Ray map tasks)."""

    def pairs(bucket_df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        n_skipped, largest = 0, 0
        for _, idx in bucket_df.groupby(["band", "band_hash"], sort=False).indices.items():
            ids = np.sort(bucket_df["doc_id"].to_numpy()[idx])
            if len(ids) < 2:
                continue
            if cap is not None and len(ids) > cap:
                n_skipped += 1
                largest = max(largest, len(ids))
                continue
            if pair_mode == "star":
                out_a.append(np.full(len(ids) - 1, ids[0], dtype=ids.dtype))
                out_b.append(ids[1:])
            else:
                a, b = np.meshgrid(ids, ids)
                m = a < b
                out_a.append(a[m])
                out_b.append(b[m])
        _warn_oversized("minhash_candidate_pairs", n_skipped, largest, cap or 0)
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)})

    return pairs


def minhash_candidate_pairs(
    sf_dir: str,
    k: int = 64,
    bands: int = 16,
    seed: int = 0,
    pair_mode: str = "star",
    bucket_cap: int | None = _BUCKET_CAP,
):
    """Shingle → MinHash → band → bucket groupby → candidate pairs
    (doc_a < doc_b), deduped.

    ``pair_mode="star"`` (default): each bucket contributes edges from
    its min doc to every other member — O(n) per bucket instead of
    C(n,2), the spanning topology production dedup uses (a bucket's
    members end up in one component either way). Dense boilerplate
    clusters make this the difference between linear and quadratic
    candidate volume: 100-copy clusters at 500k docs emit 396M pair
    rows under all-pairs vs ~8M under star (BASELINE.md). ``"all"``
    keeps the complete in-bucket pair list (the shape
    ngram_jaccard_pairs / exact pair-list consumers need)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    band_ds = ds.map_batches(_MinHashBands(k, bands, seed), batch_format="pyarrow", zero_copy_batch=True)

    from .shuffle import bucketed_group_apply, group_agg

    cands = bucketed_group_apply(
        band_ds, ["band", "band_hash"], _minhash_bucket_fn(pair_mode, bucket_cap)
    )
    return group_agg(cands, ["doc_a", "doc_b"], {"n_bands": ("doc_a", "size")})


class _SigStage:
    """Byte-packed k-wide MinHash signature per doc (one batched call
    per Arrow batch) — the dedup analogue of the linkage payload's
    ``sig`` column. est-Jaccard(a,b) = mean(bytes equal) − 1/256."""

    def __init__(self, k: int, seed: int):
        self.tags = minhash_tags(k, seed ^ 0x5ED5)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .linkage.blocking import _packed_binary
        from .linkage.stringsim import batch_shingles, kmin_from_shingles

        codes, row_of, n_rows = batch_shingles(batch.column("text"))
        sig = (kmin_from_shingles(codes, row_of, n_rows, self.tags) & np.uint64(0xFF)).astype(
            np.uint8
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": _packed_binary(np.ascontiguousarray(sig)),
            }
        )


def dedup_minhash(sf_dir: str, threshold: float = 0.8, k: int = 64, bands: int = 16, sig_k: int = 128):
    """Full MinHash-LSH near-dup: LSH candidates → signature est-Jaccard
    PREFILTER → exact shingle-Jaccard verify → connected components →
    (doc_id, cluster) rows for docs in any near-dup cluster.

    Candidates use star edges per LSH bucket (minhash_candidate_pairs
    pair_mode="star"): clustering consumes components, not pair lists,
    and a bucket's members land in one component under either topology
    while dense boilerplate clusters stop costing C(n,2) rows.

    Verification shape (round-3, the full ADVICE-r2 slack-band design):
    a k=128 signature estimate has σ = √(J(1−J)/k) ≈ 0.035 at J = 0.8,
    so thresholding the estimate alone coin-flips pairs within ~1σ of
    the cutoff. Pairs therefore split in three bands:
    est < threshold − 3σ → dropped (true pairs land here w.p. ≲ 0.1%);
    est ≥ threshold + 3σ → accepted from the signature alone (false
    accepts ≲ 0.1%, and no text ever moves for them — on dense
    boilerplate corpora this is nearly every pair); the borderline band
    in between is hydrated with its two texts via bucketed hash joins
    (the ngram_jaccard_pairs shape — texts ride once per side,
    borderline candidates only) and decided by the EXACT unique-shingle
    Jaccard. Clustering goes through the size-gated ``cluster_edges``
    (driver numpy below the gate, distributed label propagation above).

    The narrow pair streams (cands / survivors / edges — int rows,
    bounded by candidate volume) are materialized: each is consumed
    more than once (join schema probes; cluster_edges' size gate), and
    without the barrier the whole upstream join chain re-executes per
    consumer (measured 34 s → 12 s at sf0.01)."""
    from .linkage.clustering import cluster_edges
    from .shuffle import bucketed_join

    cands = minhash_candidate_pairs(sf_dir, k=k, bands=bands).materialize()
    if cands.count() == 0:
        # no banding collisions (tiny/blank/single-doc corpus, or an
        # all-distinct shard): the cluster set is exactly empty — and
        # the empty cands Dataset is SCHEMALESS, so short-circuit
        # before the join chain rather than threading it through
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())})
        )
    # semi-join prune: only candidate docs are signed / join-shuffled
    cand_docs = _prune_to_ids(
        _read_docs(sf_dir, ["doc_id", "text"]), cands, ["doc_a", "doc_b"], "doc_id"
    )
    sigs = cand_docs.map_batches(
        _SigStage(sig_k, seed=0), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    a_side = sigs.map_batches(
        lambda t: t.rename_columns(["doc_a", "sig_a"]), batch_format="pyarrow"
    )
    b_side = sigs.map_batches(
        lambda t: t.rename_columns(["doc_b", "sig_b"]), batch_format="pyarrow"
    )
    hydrated = bucketed_join(
        bucketed_join(cands, a_side, ["doc_a"]), b_side, ["doc_b"]
    )
    sigma = (threshold * (1.0 - threshold) / sig_k) ** 0.5
    prefilter_cut = threshold - 3.0 * sigma
    confident_cut = threshold + 3.0 * sigma

    def prefilter(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "confident": pd.Series([], dtype="int8"),
                }
            )
        sig_a = np.frombuffer(b"".join(batch["sig_a"]), dtype=np.uint8).reshape(len(batch), -1)
        sig_b = np.frombuffer(b"".join(batch["sig_b"]), dtype=np.uint8).reshape(len(batch), -1)
        est = (sig_a == sig_b).mean(axis=1) - (1.0 / 256.0)
        keep = est >= prefilter_cut
        return pd.DataFrame(
            {
                "doc_a": pd.Series(batch["doc_a"].to_numpy()[keep], dtype="int64"),
                "doc_b": pd.Series(batch["doc_b"].to_numpy()[keep], dtype="int64"),
                "confident": pd.Series(
                    (est[keep] >= confident_cut).astype(np.int8), dtype="int8"
                ),
            }
        )

    flagged = hydrated.map_batches(prefilter, batch_format="pandas").materialize()
    # est ≥ threshold + 3σ: the one-sided error is < 0.1% — accept from
    # the signature alone, no text hydration (ADVICE-r2's slack-band
    # shape). Only the borderline band pays the text join.
    confident = flagged.filter(expr="confident == 1").select_columns(["doc_a", "doc_b"])
    survivors = (
        flagged.filter(expr="confident == 0")
        .select_columns(["doc_a", "doc_b"])
        .materialize()
    )
    if survivors.count() == 0:
        with_texts = None  # no borderline band: nothing to hydrate
    else:
        docs = _prune_to_ids(
            _read_docs(sf_dir, ["doc_id", "text"]), survivors, ["doc_a", "doc_b"], "doc_id"
        )
        ta_side = docs.map_batches(
            lambda t: t.rename_columns(["doc_a", "text_a"]), batch_format="pyarrow"
        )
        tb_side = docs.map_batches(
            lambda t: t.rename_columns(["doc_b", "text_b"]), batch_format="pyarrow"
        )
        with_texts = bucketed_join(
            bucketed_join(survivors, ta_side, ["doc_a"]), tb_side, ["doc_b"]
        )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        from .linkage.stringsim import shingle_codes

        memo: dict = {}  # star edges repeat the hub doc ~bucket-size times

        def codes(doc_id, text):
            c = memo.get(doc_id)
            if c is None:
                c = np.unique(shingle_codes(text or ""))
                memo[doc_id] = c
            return c

        rows = []
        for a, b, ta, tb in zip(
            batch["doc_a"], batch["doc_b"], batch["text_a"], batch["text_b"]
        ):
            ca = codes(a, ta)
            cb = codes(b, tb)
            inter = len(np.intersect1d(ca, cb, assume_unique=True))
            j = inter / max(len(ca) + len(cb) - inter, 1)
            if j >= threshold:
                rows.append((int(a), int(b), round(j, 4)))
        return pd.DataFrame(rows, columns=["node_a", "node_b", "jaccard"]).astype(
            {"node_a": "int64", "node_b": "int64", "jaccard": "float64"}
        )

    conf_edges = confident.map_batches(
        lambda t: t.rename_columns(["node_a", "node_b"]), batch_format="pyarrow"
    )
    if with_texts is None:
        edges = conf_edges.materialize()
    else:
        verified = with_texts.map_batches(verify, batch_format="pandas").select_columns(
            ["node_a", "node_b"]
        )
        edges = verified.union(conf_edges).materialize()
    labels = cluster_edges(edges)
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster"]), batch_format="pyarrow"
    )


def near_dedup_keepers(sf_dir: str, threshold: float = 0.8):
    """Production near-dedup FINISH: every doc in a MinHash near-dup
    cluster, labeled with its cluster's keeper — the longest document
    (``n_chars``), ties → lowest doc_id — and a ``keep`` flag. The
    downstream corpus filter is then one anti-join on
    ``keep == 0`` ids; docs in no cluster are untouched by definition.

    Scale shape: clusters come from `dedup_minhash` (int rows only);
    lengths hydrate from the parquet metadata columns via ONE bucketed
    hash join restricted to clustered docs (no text moves). The winner
    rule packs into a single mergeable max per cluster —
    n_chars·2³³ − (doc_id+1), the `text.canonical_documents` pack —
    so the reduce is one cluster-sized group_agg, then keepers ride a
    cluster-keyed join back onto the members."""
    clusters = dedup_minhash(sf_dir, threshold=threshold).materialize()
    lens = _prune_to_ids(
        _read_docs(sf_dir, ["doc_id", "n_chars"]), clusters, ["doc_id"], "doc_id"
    )
    return _keeper_finish(clusters, lens)


def _keeper_finish(clusters, lens):
    """Keeper-selection finish shared by :func:`near_dedup_keepers`
    (LSH clusters) and :func:`ngram_dup_keepers` (the exact-oracle
    twin): join (doc_id, cluster) members with (doc_id, n_chars),
    pick per cluster the longest doc (ties → lowest id) via the ONE
    mergeable packed max (n_chars·2³³ − (doc_id+1)), and flag keepers.
    Returns (doc_id, cluster, keeper, keep)."""
    from .shuffle import bucketed_join, group_agg

    members = bucketed_join(clusters, lens, ["doc_id"])

    def local_best(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        assert ids.max(initial=0) < 2**33, "doc_id exceeds the pack bound"
        p = df["n_chars"].to_numpy(np.int64) * 2**33 - (ids + 1)
        out = pd.DataFrame({"cluster": df["cluster"].to_numpy(np.int64), "best": p})
        return out.groupby("cluster", sort=False, as_index=False).agg(
            best=("best", "max")
        )

    winners = group_agg(
        members.map_batches(local_best, batch_format="pandas"),
        ["cluster"],
        {"best": ("best", "max")},
    )

    def unpack(df: pd.DataFrame) -> pd.DataFrame:
        best = df["best"].to_numpy(np.int64)
        n = (best >> 33) + 1
        return pd.DataFrame(
            {"cluster": df["cluster"].to_numpy(np.int64), "keeper": n * 2**33 - best - 1}
        )

    keepers = winners.map_batches(unpack, batch_format="pandas")
    out = bucketed_join(clusters, keepers, ["cluster"])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["keep"] = (df["doc_id"] == df["keeper"]).astype(np.int64)
        return df[["doc_id", "cluster", "keeper", "keep"]]

    return out.map_batches(flag, batch_format="pandas")


# ------------------------------------------------------------- SimHash

def simhash_fingerprints(sf_dir: str, seed: int = 0):
    """64-bit SimHash per doc over char shingles: weighted bit-vote of
    shingle hashes. Vectorized per batch: one bit-matrix over the
    concatenated shingle hashes, per-doc segment sums via cumsum gather
    (the round-1 per-doc/per-bit Python loops, same values)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    from .linkage.stringsim import batch_shingles

    def sim(batch: pa.Table) -> pa.Table:
        # one whole-buffer shingle pass (VERDICT r4: replaces the
        # to_pylist + per-doc shingle_codes loop; per-row code
        # multisets are identical, and the bit votes are per-row sums
        # so order within a row cannot matter)
        codes, row_of, n = batch_shingles(batch.column("text"))
        out = np.zeros(n, dtype=np.int64)
        if len(codes):
            seg_starts = np.flatnonzero(
                np.concatenate([[True], row_of[1:] != row_of[:-1]])
            )
            urows = row_of[seg_starts]
            lens = np.diff(np.concatenate([seg_starts, [len(codes)]]))
            hashes = rng._splitmix64(codes ^ np.uint64(seed))
            bits = (
                (hashes[:, None] >> np.arange(63, dtype=np.uint64)[None, :]) & np.uint64(1)
            ).astype(np.int64)
            seg = np.add.reduceat(bits, seg_starts, axis=0)  # per-doc bit counts
            votes = seg * 2 - lens[:, None]
            fp = ((votes > 0).astype(np.int64) << np.arange(63, dtype=np.int64)[None, :]).sum(axis=1)
            out[urows] = fp  # 63 bits → stays positive in int64
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())})

    return ds.map_batches(sim, batch_format="pyarrow", zero_copy_batch=True)


def simhash_near_pairs(sf_dir: str, max_hamming: int = 6, blocks: int = 8):
    """Near-dup pairs by SimHash hamming distance ≤ k via the
    block-permutation trick: split the 64-bit print into ``blocks``
    segments; pairs within hamming ≤ k must agree on ≥ 1 segment
    (pigeonhole when blocks > k) → groupby segment value."""
    fps = simhash_fingerprints(sf_dir)
    return hamming_near_pairs_ds(
        fps,
        "doc_id",
        "simhash",
        max_hamming=max_hamming,
        blocks=blocks,
        seg_bits=64 // blocks,
        prefix="doc",
    )


_POPCOUNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def _hamming_bucket_fn(
    id_col: str, fp_col: str, max_hamming: int, a_col: str, b_col: str, cap: int | None
):
    """Bucket-scan callback for :func:`hamming_near_pairs_ds` —
    module-level so the oversize-skip logging is unit-testable."""

    def pairs(bucket_df: pd.DataFrame) -> pd.DataFrame:
        all_ids = bucket_df[id_col].to_numpy()
        all_hs = bucket_df[fp_col].to_numpy()
        out_a, out_b, out_d = [], [], []
        n_skipped, largest = 0, 0
        for _, idx in bucket_df.groupby(["seg", "val"], sort=False).indices.items():
            order = idx[np.argsort(all_ids[idx])]
            ids, hs = all_ids[order], all_hs[order]
            n = len(ids)
            if n < 2:
                continue
            if cap is not None and n > cap:
                n_skipped += 1
                largest = max(largest, n)
                continue
            # vectorized pairwise hamming: byte-wise popcount of the
            # (n, n) xor matrix via a 256-entry lookup table
            x = hs.astype(np.uint64)
            xor = (x[:, None] ^ x[None, :]).view(np.uint8).reshape(n, n, 8)
            d = _POPCOUNT8[xor].sum(axis=2)
            ii, jj = np.nonzero(np.triu(d <= max_hamming, k=1))
            keep = ids[ii] != ids[jj]
            out_a.append(ids[ii][keep])
            out_b.append(ids[jj][keep])
            out_d.append(d[ii, jj][keep])
        _warn_oversized("hamming_near_pairs", n_skipped, largest, cap or 0)
        if not out_a:
            return pd.DataFrame(
                {
                    a_col: pd.Series([], dtype="int64"),
                    b_col: pd.Series([], dtype="int64"),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                a_col: pd.Series(np.concatenate(out_a), dtype="int64"),
                b_col: pd.Series(np.concatenate(out_b), dtype="int64"),
                "hamming": pd.Series(np.concatenate(out_d), dtype="int64"),
            }
        )

    return pairs


def hamming_near_pairs_ds(
    fps,
    id_col: str,
    fp_col: str,
    max_hamming: int = 6,
    blocks: int = 8,
    seg_bits: int = 8,
    prefix: str = "doc",
    bucket_cap: int | None = _BUCKET_CAP,
):
    """Generic pigeonhole hamming near-pair kernel over any
    (id, 64-bit-fingerprint) dataset: ``blocks`` segments of
    ``seg_bits`` bits each (blocks·seg_bits ≤ 64); pairs within
    hamming ≤ max_hamming must agree on ≥ 1 segment when
    blocks > max_hamming. Shared by :func:`simhash_near_pairs` (text
    SimHash), ``multimodal.media_phash_near_dups`` (image dHash) and
    :func:`marker_hamming_pairs` (the exact-oracle twin, which passes
    ``bucket_cap=None``). Shuffle rows are ints only (seg, val, id,
    fp); oversize buckets are skipped with a LOGGED count (recall
    cap, never silent)."""
    width = seg_bits
    mask = (1 << width) - 1

    a_col, b_col = f"{prefix}_a", f"{prefix}_b"

    def emit(batch: pa.Table) -> pa.Table:
        # vectorized segment emit: np.repeat rows × np.tile segments
        # (row-major, same order and values as the former Python loop)
        ids = batch.column(id_col).to_numpy()
        hs = batch.column(fp_col).to_numpy()
        n = len(ids)
        segs = np.tile(np.arange(blocks, dtype=np.int64), n)
        rep = np.repeat(hs, blocks).astype(np.uint64)
        vals = ((rep >> (segs.astype(np.uint64) * np.uint64(width))) & np.uint64(mask)).astype(
            np.int64
        )
        return pa.table(
            {
                "seg": pa.array(segs.astype(np.int32), pa.int32()),
                "val": pa.array(vals, pa.int64()),
                id_col: pa.array(np.repeat(ids, blocks), pa.int64()),
                fp_col: pa.array(np.repeat(hs, blocks), pa.int64()),
            }
        )

    from .shuffle import bucketed_group_apply, group_agg

    cand = bucketed_group_apply(
        fps.map_batches(emit, batch_format="pyarrow"),
        ["seg", "val"],
        _hamming_bucket_fn(id_col, fp_col, max_hamming, a_col, b_col, bucket_cap),
    )
    return group_agg(cand, [a_col, b_col], {"hamming": ("hamming", "min")})


# -------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(sf_dir: str, n: int = 3, threshold: float = 0.5):
    """Word-n-gram Jaccard over LSH candidates (the n-gram flavour of
    near-dup verification). Candidate pairs are hydrated with their two
    texts via bucketed hash joins — a semi-join prune filters the doc
    side to CANDIDATE docs before the shuffle, so texts ride it once
    per side and only for docs that appear in a pair, never as a
    whole-corpus driver broadcast (the round-1 shape)."""
    from .shuffle import bucketed_join

    # complete in-bucket pair list: this op's product IS the pairs
    cands = minhash_candidate_pairs(sf_dir, pair_mode="all").materialize()
    docs = _prune_to_ids(
        _read_docs(sf_dir, ["doc_id", "text"]), cands, ["doc_a", "doc_b"], "doc_id"
    )
    a_side = docs.map_batches(
        lambda t: t.rename_columns(["doc_a", "text_a"]), batch_format="pyarrow"
    )
    b_side = docs.map_batches(
        lambda t: t.rename_columns(["doc_b", "text_b"]), batch_format="pyarrow"
    )
    hydrated = bucketed_join(bucketed_join(cands, a_side, ["doc_a"]), b_side, ["doc_b"])

    def grams(t: str) -> set:
        toks = t.split(" ")
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for a, b, ta, tb in zip(batch["doc_a"], batch["doc_b"], batch["text_a"], batch["text_b"]):
            j = jaccard(grams(ta or ""), grams(tb or ""))
            if j >= threshold:
                rows.append((int(a), int(b), round(j, 4)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "ngram_jaccard"])

    return hydrated.map_batches(verify, batch_format="pandas")


# -------------------------------------------- embedding cosine near-dup

def embedding_near_dups(
    sf_dir: str,
    threshold: float = 0.35,
    method: str = "lsh",
    n_planes: int = 6,
    seed: int = 0,
):
    """Near-dup pairs by embedding cosine ≥ threshold (default tuned
    to the test embeddings' similarity range — real corpora use ~0.95).

    ``method="lsh"`` (default, the scale path): hyperplane-LSH
    signatures (rayrl.ann's plane set); a pair is compared iff its
    signatures differ in ≤ 1 plane — found via the pigeonhole trick
    (split the n_planes bits into two halves: hamming ≤ 1 ⇒ at least
    one half identical), NOT multi-probe replication. Round-3 shape
    (ADVICE r2): NO embedding ever rides a shuffle — the grouped rows
    are four ints (seg, half-value, full signature, vec_id), candidate
    generation is a vectorized int-hamming filter inside each half
    bucket, and only the surviving candidate PAIRS hydrate their two
    vectors via bucketed hash joins (once per side) for the exact
    cosine decision. Same compared-pair set as the former ×(n_planes+1)
    payload-replicating multi-probe, ~7× less shuffle volume, and the
    in-bucket work drops from dim-wide matmul to 1-byte popcounts.
    Nothing is materialized on the driver.

    ``method="brute"``: batch×corpus matmul against a broadcast
    normalized matrix — O(N²) exact baseline, kept as the recall
    oracle for tests."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    if method == "brute":
        corpus = ds.to_pandas()
        mat = np.stack(corpus["embedding"].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        ids = corpus["vec_id"].to_numpy()
        ref = ray.put((ids, mat))

        def pairs(batch: pd.DataFrame) -> pd.DataFrame:
            cids, cmat = ray.get(ref)
            q = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            sims = q @ cmat.T
            qa, qb, qs = [], [], []
            for i, qid in enumerate(batch["vec_id"]):
                hit = np.nonzero(sims[i] >= threshold)[0]
                for j in hit:
                    if int(qid) < int(cids[j]):
                        qa.append(int(qid))
                        qb.append(int(cids[j]))
                        qs.append(round(float(sims[i, j]), 4))
            return pd.DataFrame({"vec_a": qa, "vec_b": qb, "cosine": qs})

        return ds.map_batches(pairs, batch_format="pandas", batch_size=2048)

    from .ann import _LshIndexStage
    from .shuffle import bucketed_group_apply, bucketed_join, distinct_rows

    sample = ds.take_batch(1, batch_format="pandas")
    dim = len(sample["embedding"].iloc[0])
    stage = _LshIndexStage(dim, n_planes, seed)
    h1 = n_planes // 2
    lo_mask = (1 << h1) - 1

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        # int-only rows: (seg, half-value, full signature, vec_id)
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sig = stage.bucket_of(emb).astype(np.int64)
        vids = batch["vec_id"].to_numpy()
        seg = np.tile(np.array([0, 1], dtype=np.int32), len(vids))
        rep_sig = np.repeat(sig, 2)
        val = np.where(seg == 0, rep_sig & lo_mask, rep_sig >> h1)
        return pd.DataFrame(
            {
                "seg": seg,
                "val": val.astype(np.int64),
                "sig": rep_sig,
                "vec_id": np.repeat(vids, 2).astype(np.int64),
            }
        )

    popcount8 = _POPCOUNT8  # shared module table (r5 review: was a second copy)

    def near_sig_pairs(df: pd.DataFrame) -> pd.DataFrame:
        all_ids = df["vec_id"].to_numpy()
        all_sig = df["sig"].to_numpy()
        out_a, out_b = [], []
        for _, idx in df.groupby(["seg", "val"], sort=False).indices.items():
            ids = all_ids[idx]
            sg = all_sig[idx].astype(np.uint64)
            m = len(ids)
            if m < 2:
                continue
            for s0 in range(0, m, 4096):  # row-chunk the (m, m) hamming
                chunk = sg[s0 : s0 + 4096]
                xor = (chunk[:, None] ^ sg[None, :]).view(np.uint8).reshape(len(chunk), m, 8)
                d = popcount8[xor].sum(axis=2)
                ii, jj = np.nonzero(d <= 1)
                a, b = ids[s0 + ii], ids[jj]
                keep = a < b
                out_a.append(a[keep])
                out_b.append(b[keep])
        if not out_a:
            return pd.DataFrame(
                {"vec_a": pd.Series([], dtype="int64"), "vec_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                "vec_a": pd.Series(np.concatenate(out_a), dtype="int64"),
                "vec_b": pd.Series(np.concatenate(out_b), dtype="int64"),
            }
        )

    rows = ds.map_batches(emit, batch_format="pandas", batch_size=2048)
    cand = bucketed_group_apply(rows, ["seg", "val"], near_sig_pairs)
    # a hamming-0 pair is discovered in both halves → distinct;
    # materialized (tiny int rows) so the semi-join prune and the two
    # hydration joins don't re-run the bucket scan
    cand = distinct_rows(cand, ["vec_a", "vec_b"]).materialize()
    ds = _prune_to_ids(ds, cand, ["vec_a", "vec_b"], "vec_id")

    def pack(idc: str, embc: str):
        # byte-pack the vectors for the join (binary rides pandas/Arrow
        # cleanly; a list<float> column trips Ray's tensor-extension
        # slicing inside map_groups)
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            emb = np.stack(batch["embedding"].to_numpy()).astype(np.float32)
            return pd.DataFrame(
                {idc: batch["vec_id"].to_numpy(), embc: [e.tobytes() for e in emb]}
            )

        return fn

    a_side = ds.map_batches(pack("vec_a", "emb_a"), batch_format="pandas")
    b_side = ds.map_batches(pack("vec_b", "emb_b"), batch_format="pandas")
    hydrated = bucketed_join(bucketed_join(cand, a_side, ["vec_a"]), b_side, ["vec_b"])

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype="int64"),
                    "vec_b": pd.Series([], dtype="int64"),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        n = len(batch)
        ea = np.frombuffer(b"".join(batch["emb_a"]), np.float32).reshape(n, -1).astype(np.float64)
        eb = np.frombuffer(b"".join(batch["emb_b"]), np.float32).reshape(n, -1).astype(np.float64)
        ea /= np.maximum(np.linalg.norm(ea, axis=1, keepdims=True), 1e-12)
        eb /= np.maximum(np.linalg.norm(eb, axis=1, keepdims=True), 1e-12)
        cos = np.einsum("ij,ij->i", ea, eb)
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "vec_a": pd.Series(batch["vec_a"].to_numpy()[keep], dtype="int64"),
                "vec_b": pd.Series(batch["vec_b"].to_numpy()[keep], dtype="int64"),
                "cosine": pd.Series(np.round(cos[keep], 4), dtype="float64"),
            }
        )

    return hydrated.map_batches(verify, batch_format="pandas")


# ------------------------------------- exact n-gram Jaccard (sparse)

def ngram_jaccard_exact(sf_dir: str, n: int = 3, threshold: float = 0.5):
    """EXACT word-n-gram Jaccard over ALL doc pairs — the oracle-parity
    twin of ``ngram_jaccard_pairs`` (which verifies LSH candidates
    only). Sparse-join algorithm, never O(n²) over docs: per-doc
    DISTINCT shingle hashes self-join on the shingle (bucketed), pair
    intersection counts reduce by summation, and per-doc shingle
    counts hydrate via two more bucketed joins. Shuffle volume is
    Σ_shingles C(df, 2) — exact sparse Jaccard explodes on hot
    shingles at corpus scale, which is exactly why the LSH variant is
    the scale path; this one exists for bounded doc tables and the
    DuckDB oracle. The jaccard column is an unrounded double computed
    with the same integer division the oracle uses (bit-identical)."""
    from .bytekernels import content_hash64
    from .shuffle import bucketed_group_apply, bucketed_join, group_agg

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def emit_shingles(batch: pa.Table) -> pd.DataFrame:
        ids, codes = [], []
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = (t or "").split(" ")
            if len(toks) < n:
                grams = {" ".join(toks)}
            else:
                grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            h = np.unique(content_hash64(pa.array(sorted(grams), pa.string())))
            ids.append(np.full(len(h), did, dtype=np.int64))
            codes.append(h)
        return pd.DataFrame(
            {"doc_id": np.concatenate(ids), "code": np.concatenate(codes)}
        )

    shingles = docs.map_batches(
        emit_shingles, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # materialized: consumed as BOTH hydration sides (a_n / b_n) —
    # unmaterialized, the doc-count shuffle would run twice (r5 review)
    nsh = group_agg(shingles, ["doc_id"], {"nsh": ("code", "size")}).materialize()

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="code", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return (
            m.groupby(["doc_id_a", "doc_id_b"], sort=False)
            .size()
            .reset_index(name="inter")
        )

    inter = group_agg(
        bucketed_group_apply(shingles, ["code"], pairs_in_bucket),
        ["doc_id_a", "doc_id_b"],
        {"inter": ("inter", "sum")},
    )

    a_n = nsh.map_batches(
        lambda t: t.rename_columns(["doc_id_a", "nsh_a"]), batch_format="pyarrow"
    )
    b_n = nsh.map_batches(
        lambda t: t.rename_columns(["doc_id_b", "nsh_b"]), batch_format="pyarrow"
    )
    hyd = bucketed_join(bucketed_join(inter, a_n, ["doc_id_a"]), b_n, ["doc_id_b"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        inter_c = df["inter"].to_numpy(dtype=np.int64)
        union = df["nsh_a"].to_numpy(dtype=np.int64) + df["nsh_b"].to_numpy(dtype=np.int64) - inter_c
        j = inter_c / union
        keep = j >= threshold
        return pd.DataFrame(
            {
                "doc_a": df["doc_id_a"].to_numpy()[keep],
                "doc_b": df["doc_id_b"].to_numpy()[keep],
                "ngram_jaccard": j[keep],
            }
        )

    return hyd.map_batches(score, batch_format="pandas")


NGRAM_JACCARD_EXACT_ORACLE = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), g AS (
        SELECT doc_id,
               CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                    ELSE list_transform(generate_series(1, len(ts) - 2),
                                        i -> array_to_string(ts[i:i+2], ' '))
               END AS grams
        FROM toks
    ), s AS (
        SELECT DISTINCT doc_id, sh
        FROM (SELECT doc_id, unnest(grams) AS sh FROM g)
    ), cnt AS (
        SELECT doc_id, count(*) AS nsh FROM s GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           i / CAST(na.nsh + nb.nsh - i AS DOUBLE) AS ngram_jaccard
    FROM inter
    JOIN cnt na ON na.doc_id = doc_a
    JOIN cnt nb ON nb.doc_id = doc_b
    WHERE i / CAST(na.nsh + nb.nsh - i AS DOUBLE) >= 0.5
"""


# ----------------------------------------- exact-oracle twins (round 4)
# Each twin drives the SAME engine machinery as a rows-only op through
# inputs a DuckDB oracle can reproduce value-for-value (VERDICT r3 #6,
# the ngram_jaccard_exact precedent / CLAUDE.md rule 17).

# The common CTE chain: exact n-gram Jaccard pairs → undirected edges →
# transitive closure (recursive CTE; near-dup components are shallow
# stars, so the closure stays tiny) → min-id component labels.
_NGRAM_CLUSTER_CTES = """
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), g AS (
        SELECT doc_id,
               CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                    ELSE list_transform(generate_series(1, len(ts) - 2),
                                        i -> array_to_string(ts[i:i+2], ' '))
               END AS grams
        FROM toks
    ), s AS (
        SELECT DISTINCT doc_id, sh
        FROM (SELECT doc_id, unnest(grams) AS sh FROM g)
    ), cnt AS (
        SELECT doc_id, count(*) AS nsh FROM s GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), p AS (
        SELECT doc_a, doc_b FROM inter
        JOIN cnt na ON na.doc_id = doc_a
        JOIN cnt nb ON nb.doc_id = doc_b
        WHERE i / CAST(na.nsh + nb.nsh - i AS DOUBLE) >= 0.5
    ), e AS (
        SELECT doc_a AS u, doc_b AS v FROM p
        UNION SELECT doc_b, doc_a FROM p
    ), walk(u, v) AS (
        SELECT u, v FROM e
        UNION
        SELECT w.u, e.v FROM walk w JOIN e ON w.v = e.u WHERE e.v <> w.u
    ), lab AS (
        SELECT u AS doc_id, least(u, min(v)) AS cluster FROM walk GROUP BY u
    )
"""


def ngram_dup_clusters(sf_dir: str, n: int = 3, threshold: float = 0.5):
    """(doc_id, cluster): transitive connected components over the
    EXACT n-gram-Jaccard near-dup pairs — the ★-oracle twin of
    ``dedup_minhash``'s clustering finish. Same ``cluster_edges``
    component labeling (label = min doc_id of the component) the LSH
    path uses; candidates come from :func:`ngram_jaccard_exact` so a
    recursive-CTE DuckDB oracle reproduces the output value-for-value
    (the LSH path is rows-only by necessity)."""
    from .linkage.clustering import cluster_edges

    pairs = ngram_jaccard_exact(sf_dir, n=n, threshold=threshold)
    edges = pairs.map_batches(
        lambda t: t.select(["doc_a", "doc_b"]).rename_columns(["node_a", "node_b"]),
        batch_format="pyarrow",
    )
    return cluster_edges(edges).map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster"]), batch_format="pyarrow"
    )


NGRAM_DUP_CLUSTERS_ORACLE = (
    _NGRAM_CLUSTER_CTES
    + """
    SELECT doc_id, CAST(cluster AS BIGINT) AS cluster FROM lab
"""
)


def ngram_dup_keepers(sf_dir: str, n: int = 3, threshold: float = 0.5):
    """(doc_id, cluster, keeper, keep): the ``near_dedup_keepers``
    keeper-selection finish (bucketed n_chars hydration → packed-max
    winner → cluster-keyed join back) driven by the exact-Jaccard
    clusters, giving the whole finish a hash-exact DuckDB oracle
    (``near_dedup_keepers`` itself rides LSH candidates — rows-only)."""
    clusters = ngram_dup_clusters(sf_dir, n=n, threshold=threshold).materialize()
    lens = _prune_to_ids(
        _read_docs(sf_dir, ["doc_id", "n_chars"]), clusters, ["doc_id"], "doc_id"
    )
    return _keeper_finish(clusters, lens)


NGRAM_DUP_KEEPERS_ORACLE = (
    _NGRAM_CLUSTER_CTES
    + """
    , k AS (
        SELECT l.doc_id, l.cluster,
               first_value(l.doc_id) OVER (
                   PARTITION BY l.cluster ORDER BY d.n_chars DESC, l.doc_id
               ) AS keeper
        FROM lab l JOIN documents d ON d.doc_id = l.doc_id
    )
    SELECT doc_id, CAST(cluster AS BIGINT) AS cluster,
           CAST(keeper AS BIGINT) AS keeper,
           CAST(doc_id = keeper AS BIGINT) AS keep
    FROM k
"""
)


def _marker_list() -> list[str]:
    """63 deterministic marker substrings (31 corpus tokens + 32
    token bigrams) for the parity-bit fingerprint. The token list is
    the synthetic webtext fixture's vocabulary — this op is the
    oracle-parity twin of the SimHash pigeonhole path, so its
    fingerprint function must be computable by BOTH the engine and
    ANSI SQL on the same corpus; occurrence-count parity of a fixed
    substring is (the real SimHash is not SQL-expressible)."""
    toks = [
        "join", "hash", "row", "batch", "scan", "column", "customer",
        "filter", "small", "slow", "merge", "order", "vector", "line",
        "data", "table", "agg", "value", "key", "stream", "window",
        "a", "spark", "group", "part", "big", "sort", "query", "fast",
        "the", "dup",
    ]
    markers = list(toks)
    k = 0
    for i in range(31):
        for j in range(31):
            if i != j and k < 32 and (i * 31 + j) % 29 == 0:
                markers.append(f"{toks[i]} {toks[j]}")
                k += 1
    i = 0
    while len(markers) < 63:
        a, b = i % 31, (i * 5 + 2) % 31
        if a != b:
            m = f"{toks[a]} {toks[b]}"
            if m not in markers:
                markers.append(m)
        i += 1
    return markers[:63]


def marker_fingerprints(sf_dir: str):
    """(doc_id, fp): 63-bit fingerprint — bit i is the occurrence-count
    parity of marker substring i (non-overlapping count, matching
    SQL's length/replace counting). Near-duplicate docs flip few
    parities; unrelated docs differ in ~half the p≈0.5 token bits."""
    import pyarrow.compute as pc

    markers = _marker_list()

    def fp(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        v = np.zeros(batch.num_rows, dtype=np.int64)
        for i, w in enumerate(markers):
            c = pc.count_substring(t, w).to_numpy(zero_copy_only=False).astype(np.int64)
            v |= (c & 1) << i
        return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(v, pa.int64())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow", zero_copy_batch=True
    )


def marker_hamming_pairs(sf_dir: str, max_hamming: int = 4):
    """(doc_a, doc_b, hamming): the pigeonhole hamming kernel
    (:func:`hamming_near_pairs_ds`, shared with simhash_near_pairs and
    media_phash_near_dups) over the SQL-computable marker-parity
    fingerprints — its ★-oracle twin. 9 blocks × 7 bits > max_hamming
    ⇒ the pigeonhole scan is EXACT, and ``bucket_cap=None`` keeps it
    so (no silent drops; in-bucket work is quadratic — the documented
    oracle-twin setting, production paths keep the logged cap)."""
    fps = marker_fingerprints(sf_dir)
    return hamming_near_pairs_ds(
        fps,
        "doc_id",
        "fp",
        max_hamming=max_hamming,
        blocks=9,
        seg_bits=7,
        prefix="doc",
        bucket_cap=None,
    )


def _marker_hamming_oracle(max_hamming: int = 4) -> str:
    bits = " | ".join(
        f"(CASE WHEN ((length(text) - length(replace(text, '{w}', ''))) // {len(w)}) % 2 = 1"
        f" THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i, w in enumerate(_marker_list())
    )
    return f"""
    WITH f AS (SELECT doc_id, {bits} AS fp FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
    FROM f a JOIN f b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
"""


MARKER_HAMMING_ORACLE = _marker_hamming_oracle()


DEDUP_QUERIES = {
    "dedup_exact": dedup_exact,
    "soft_dedup_weights": soft_dedup_weights,
    "dedup_minhash": dedup_minhash,
    "near_dedup_keepers": near_dedup_keepers,
    "simhash_fingerprints": simhash_fingerprints,
    "simhash_near_pairs": simhash_near_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "ngram_jaccard_exact": ngram_jaccard_exact,
    "embedding_near_dups": embedding_near_dups,
    "ngram_dup_clusters": ngram_dup_clusters,
    "ngram_dup_keepers": ngram_dup_keepers,
    "marker_hamming_pairs": marker_hamming_pairs,
}
