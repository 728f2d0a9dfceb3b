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


def score_pairs_broadcast(pairs_ds, payload, cfg: LinkageConfig, concurrency=(2, 8)):
    ref = ray.put(payload_arrays(payload))
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
