"""Candidate-pair generation + pairwise scoring → match edges.

Replaces the reference's materialize-all-candidate-pairs +
add_feature_vector flow (/root/reference/benchmarking/utils.R:502-645,
189-311) with a two-phase shape chosen for shuffle volume:

1. ``candidate_pairs``: NARROW band rows (ints only) → bucketed
   groupby → within-block clean×dirty pair ids → bucketed DISTINCT.
   The only wide shuffle in the linkage pipeline moves ~21 bytes/row.
2. scoring: each unique pair scored ONCE, fully vectorized. The
   128-wide byte-packed MinHash signatures computed by the payload
   stage give an est-Jaccard per pair as one numpy comparison (k=128 ⇒
   σ ≤ 0.045, so a threshold decision at 0.42 with same-entity
   near-misses ≤ 0.26 has > 3σ of margin on both sides — texts are
   never shipped to the scorer at all). The broadcast side is FOUR
   numpy arrays (ray.put once, zero-copy ray.get per actor); above
   ``cfg.broadcast_payload_max_rows`` nodes the signatures are attached
   via two hash joins instead (cluster-scale path) — same kernel.

The exact metrics (shingle Jaccard, Jaro-Winkler — the reference's
stringdist set, utils.R:180-187) live in stringsim and back the
feature-parity tests; the production decision is signature-based."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..shuffle import bucketed_group_apply, distinct_rows
from .blocking import LinkageConfig

_EMPTY_PAIRS = pd.DataFrame(
    {"node_a": pd.Series([], dtype="int64"), "node_b": pd.Series([], dtype="int64")}
)


def candidate_pairs(band_ds, cfg: LinkageConfig):
    """bucketed within-block clean×dirty pair generation → distinct."""

    def pairs(bucket_df: pd.DataFrame) -> pd.DataFrame:
        nodes = bucket_df["node"].to_numpy()
        sides = bucket_df["side"].to_numpy()
        out_a, out_b = [], []
        for _, idx in bucket_df.groupby("block_key", sort=False).indices.items():
            s = sides[idx]
            c = nodes[idx[s == 0]]
            d = nodes[idx[s == 1]]
            n_pairs = len(c) * len(d)
            if n_pairs == 0 or n_pairs > cfg.max_block_pairs:
                # pathological block (boilerplate collision): skip — the
                # pair is recovered via its other bands
                continue
            a, b = np.meshgrid(c, d)
            out_a.append(a.ravel())
            out_b.append(b.ravel())
        if not out_a:
            return _EMPTY_PAIRS
        df = pd.DataFrame({"node_a": np.concatenate(out_a), "node_b": np.concatenate(out_b)})
        return df.drop_duplicates()  # local dedup before the global one

    raw = bucketed_group_apply(
        band_ds.select_columns(["bucket", "block_key", "node", "side"]),
        ["block_key"],
        pairs,
        num_buckets=cfg.num_buckets,
    )
    return distinct_rows(raw, ["node_a", "node_b"], num_buckets=cfg.num_buckets)


def payload_arrays(payload: "pa.Table | pd.DataFrame") -> dict[str, np.ndarray]:
    """payload table → plasma-friendly numpy arrays, sorted by node
    (searchsorted lookups in the scorer). Accepts Arrow directly so the
    driver never builds a pandas frame of the whole payload."""
    if isinstance(payload, pa.Table):
        import pyarrow.compute as pc

        node = payload.column("node").to_numpy()
        truth = payload.column("truth").to_numpy()
        lang_codes = (
            pc.dictionary_encode(payload.column("lang").combine_chunks())
            .indices.fill_null(-1)
            .to_numpy(zero_copy_only=False)
        )
        from ..bytekernels import binary_matrix

        sig = binary_matrix(payload.column("sig"))
    else:
        node = payload["node"].to_numpy()
        truth = payload["truth"].to_numpy()
        _, lang_codes = np.unique(
            np.asarray([x or "\0" for x in payload["lang"]]), return_inverse=True
        )
        sig = np.frombuffer(b"".join(payload["sig"]), dtype=np.uint8).reshape(len(node), -1)
    order = np.argsort(node)
    return {
        "node": node[order],
        "truth": truth[order],
        "sig": np.ascontiguousarray(sig[order]),
        "lang_code": lang_codes.astype(np.int8)[order],
    }


def _score_kernel(na, nb, arrs: dict[str, np.ndarray], cfg: LinkageConfig) -> pd.DataFrame:
    ia = np.searchsorted(arrs["node"], na)
    ib = np.searchsorted(arrs["node"], nb)
    est = (arrs["sig"][ia] == arrs["sig"][ib]).mean(axis=1) - (1.0 / 256.0)
    keep = est >= cfg.jaccard_threshold
    if not keep.any():
        return pd.DataFrame(
            {
                "node_a": pd.Series([], dtype="int64"),
                "node_b": pd.Series([], dtype="int64"),
                "truth_a": pd.Series([], dtype="int64"),
                "truth_b": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    lang_eq = arrs["lang_code"][ia[keep]] == arrs["lang_code"][ib[keep]]
    score = np.minimum(0.55 + 0.35 * np.minimum(est[keep], 1.0) + 0.01 * lang_eq, 1.0)
    return pd.DataFrame(
        {
            "node_a": pd.Series(np.asarray(na)[keep], dtype="int64"),
            "node_b": pd.Series(np.asarray(nb)[keep], dtype="int64"),
            "truth_a": pd.Series(arrs["truth"][ia[keep]], dtype="int64"),
            "truth_b": pd.Series(arrs["truth"][ib[keep]], dtype="int64"),
            "score": pd.Series(np.round(score, 6), dtype="float64"),
        }
    )


@ray.remote
def _build_band_index(refs: list) -> dict:
    """Sorted (block_key → clean nodes) probe index from the clean
    side's band rows, built off-driver. ~16 B/entry."""
    t = pa.concat_tables(ray.get(refs))
    keys = t.column("block_key").to_numpy()
    nodes = t.column("node").to_numpy()
    order = np.argsort(keys, kind="stable")
    return {"keys": np.ascontiguousarray(keys[order]), "nodes": np.ascontiguousarray(nodes[order])}


class _IndexProber:
    """Actor stage: probe the broadcast clean-band index with dirty
    band rows → raw candidate pairs. Index fetched zero-copy once per
    actor. Blocks whose clean side exceeds ``cap`` = √max_block_pairs
    are skipped: the shuffle path's len(c)·len(d) cap needs the global
    dirty count this streaming path never sees, and a block that big is
    degenerate boilerplate in either reading — its true pairs are
    recovered via their other bands. Identical output on non-degenerate
    blocks (equivalence-tested).
    Emits locally-deduped pairs: a batch carries all bands of its
    records (band emit is row-major), so most of the ×bands pair
    multiplicity dies here instead of in the global distinct."""

    def __init__(self, idx_ref, cap: int):
        self.idx = ray.get(idx_ref)
        self.cap = cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        bk = batch.column("block_key").to_numpy()
        dn = batch.column("node").to_numpy()
        keys, nodes = self.idx["keys"], self.idx["nodes"]
        lo = np.searchsorted(keys, bk, "left")
        hi = np.searchsorted(keys, bk, "right")
        tot = hi - lo
        keep = (tot > 0) & (tot <= self.cap)
        lo, tot, dn = lo[keep], tot[keep], dn[keep]
        s = int(tot.sum())
        if s == 0:
            return pa.table(
                {"node_a": pa.array([], pa.int64()), "node_b": pa.array([], pa.int64())}
            )
        starts = np.concatenate([[0], np.cumsum(tot)[:-1]])
        idxs = np.repeat(lo - starts, tot) + np.arange(s)
        a = nodes[idxs]
        b = np.repeat(dn, tot)
        lim = np.int64(1) << 31
        if a.max() < lim and b.max() < (lim << 1):
            # local ×bands dedup via packed-key unique (node ids fit
            # 31/32 bits below the broadcast gate by construction)
            packed = np.unique(a * (lim << 1) + b)
            a = packed // (lim << 1)
            b = packed % (lim << 1)
        return pa.table({"node_a": pa.array(a, pa.int64()), "node_b": pa.array(b, pa.int64())})


def candidate_pairs_broadcast(band_ds, cfg: LinkageConfig):
    """Broadcast-index candidate generation — the single-node / small-
    side fast path: the clean side's band rows become a sorted numpy
    index in the object store; the dirty side's band rows probe it in
    actor batches. NO groupby shuffle of the ×bands row stream (the
    round-1 candidates phase spent ~15 s of machinery floor shuffling
    10.8M band rows at 600k pages). Above
    ``cfg.broadcast_index_max_entries`` clean band rows, callers use
    ``candidate_pairs`` (the all-shuffle cluster path)."""
    import pyarrow.compute as pc

    clean_bands = (
        band_ds.map_batches(
            lambda t: t.filter(pc.equal(t.column("side"), 0)).select(["block_key", "node"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ).materialize()
    idx_ref = _build_band_index.remote(clean_bands.to_arrow_refs())
    dirty_bands = band_ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("side"), 1)).select(["block_key", "node"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    raw = dirty_bands.map_batches(
        _IndexProber,
        fn_constructor_args=(idx_ref, max(64, int(cfg.max_block_pairs**0.5))),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
        concurrency=(2, 16),
    )
    pairs = distinct_rows(raw, ["node_a", "node_b"], num_buckets=cfg.num_buckets)
    # keep the index alive until the lazy pair stream executes
    pairs._rayrl_band_index_ref = idx_ref
    return pairs


@ray.remote
def _build_payload_arrays(refs: list) -> dict:
    """Build the scorer's numpy payload INSIDE a Ray task from the
    materialized payload's Arrow refs — the driver never concatenates
    or transforms the (possibly hundreds of MB) payload; the task's
    return value lands in the object store ready for zero-copy actor
    reads. (Round-2 fix for the serial driver tail in the N→4N
    scaling measurement.)"""
    tables = ray.get(refs)
    return payload_arrays(pa.concat_tables(tables))


def payload_arrays_ref(payload_ds):
    """Materialized payload Dataset → ObjectRef[dict of numpy arrays],
    built off-driver."""
    refs = payload_ds.to_arrow_refs()
    return _build_payload_arrays.remote(refs)


class BroadcastScorer:
    """Actor-pool scorer. The numpy payload is fetched from the object
    store ONCE per actor in __init__ — a ZERO-COPY ray.get (~ms).

    Why an actor pool and not stateless tasks: a ray.get of a large
    broadcast inside a running TASK blocks the worker slot, and the
    raylet responds by spawning replacement workers — at 128 bucket
    tasks that cascades into 100+ worker processes and object-store
    thrash. Bounded actors doing the get at construction keep the
    worker count fixed."""

    def __init__(self, arrs_ref, cfg: LinkageConfig):
        self.arrs = ray.get(arrs_ref)
        self.cfg = cfg

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return _score_kernel(
            batch["node_a"].to_numpy(), batch["node_b"].to_numpy(), self.arrs, self.cfg
        )


def score_pairs_broadcast(pairs_ds, payload, cfg: LinkageConfig, concurrency=(2, 16)):
    """``payload`` may be an Arrow table / pandas frame (arrays built
    here) or an ObjectRef to a prebuilt array dict (payload_arrays_ref
    — the off-driver path link_datasets uses)."""
    ref = payload if isinstance(payload, ray.ObjectRef) else ray.put(payload_arrays(payload))
    # the distinct stage leaves one small block per bucket; coalesce so
    # the scorer runs a handful of chunky tasks, not bucket-count tiny ones
    pairs_ds = pairs_ds.repartition(target_num_rows_per_block=131072)
    return pairs_ds.map_batches(
        BroadcastScorer,
        fn_constructor_args=(ref, cfg),
        batch_format="pandas",
        batch_size=131072,
        concurrency=concurrency,
    )


def score_pairs_join(pairs_ds, payload_ds, cfg: LinkageConfig):
    """Cluster-scale path: hydrate pair ids with (sig, lang, truth) via
    two hash joins (requires DataContext.shuffle_strategy =
    HASH_SHUFFLE), then run the same vectorized kernel."""
    cols = ["node", "truth", "lang", "sig"]
    a_side = payload_ds.select_columns(cols).map_batches(
        lambda t: t.rename_columns(["node_a", "truth_a_", "lang_a", "sig_a"]),
        batch_format="pyarrow",
    )
    b_side = payload_ds.select_columns(cols).map_batches(
        lambda t: t.rename_columns(["node_b", "truth_b_", "lang_b", "sig_b"]),
        batch_format="pyarrow",
    )
    nparts = max(2, cfg.num_buckets // 8)
    hydrated = pairs_ds.join(a_side, join_type="inner", num_partitions=nparts, on=("node_a",)).join(
        b_side, join_type="inner", num_partitions=nparts, on=("node_b",)
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return _score_kernel(np.array([], dtype=np.int64), np.array([], dtype=np.int64),
                                 {"node": np.array([], dtype=np.int64), "truth": np.array([], dtype=np.int64),
                                  "sig": np.zeros((0, 1), dtype=np.uint8), "lang_code": np.array([], dtype=np.int8)}, cfg)
        sig_a = np.frombuffer(b"".join(batch["sig_a"]), dtype=np.uint8).reshape(n, -1)
        sig_b = np.frombuffer(b"".join(batch["sig_b"]), dtype=np.uint8).reshape(n, -1)
        est = (sig_a == sig_b).mean(axis=1) - (1.0 / 256.0)
        keep = est >= cfg.jaccard_threshold
        lang_eq = (batch["lang_a"].to_numpy()[keep] == batch["lang_b"].to_numpy()[keep])
        score = np.minimum(0.55 + 0.35 * np.minimum(est[keep], 1.0) + 0.01 * lang_eq, 1.0)
        return pd.DataFrame(
            {
                "node_a": pd.Series(batch["node_a"].to_numpy()[keep], dtype="int64"),
                "node_b": pd.Series(batch["node_b"].to_numpy()[keep], dtype="int64"),
                "truth_a": pd.Series(batch["truth_a_"].to_numpy()[keep], dtype="int64"),
                "truth_b": pd.Series(batch["truth_b_"].to_numpy()[keep], dtype="int64"),
                "score": pd.Series(np.round(score, 6), dtype="float64"),
            }
        )

    return hydrated.map_batches(score, batch_format="pandas", batch_size=65536)
