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

from .. import rng
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
        band_ds.select_columns(["block_key", "node", "side"]),
        ["block_key"],
        pairs,
        num_buckets=cfg.num_buckets,
    )
    return distinct_rows(raw, ["node_a", "node_b"], num_buckets=cfg.num_buckets)


def payload_arrays(payload: "pa.Table | pd.DataFrame") -> dict[str, np.ndarray]:
    """payload table → plasma-friendly numpy arrays, sorted by node
    (searchsorted lookups in the scorer). Accepts Arrow directly so the
    driver never builds a pandas frame of the whole payload. Lang codes
    are crc32 of the string — equality-stable across shards (the
    sharded build below never coordinates a dictionary)."""
    import zlib

    if isinstance(payload, pa.Table):
        import pyarrow.compute as pc

        node = payload.column("node").to_numpy()
        truth = payload.column("truth").to_numpy()
        enc = pc.dictionary_encode(payload.column("lang").combine_chunks())
        dict_vals = enc.dictionary.to_pylist()
        crc = np.array([zlib.crc32((v or "").encode()) for v in dict_vals] + [-1], dtype=np.int64)
        idx = enc.indices.fill_null(len(dict_vals)).to_numpy(zero_copy_only=False)
        lang_codes = crc[idx]
        from ..bytekernels import binary_matrix

        sig = binary_matrix(payload.column("sig"))
    else:
        node = payload["node"].to_numpy()
        truth = payload["truth"].to_numpy()
        # null lang → -1, matching the Arrow branch's fill_null
        # sentinel: crc32('') == 0 is the EMPTY string's code, and a
        # (null, '') pair must not read lang_eq across one path but
        # not the others (r5 review — make_missing on lang is in the
        # default benchmark specs)
        lang_codes = np.array(
            [
                -1
                if x is None or (isinstance(x, float) and np.isnan(x))
                else zlib.crc32(x.encode())
                for x in payload["lang"]
            ],
            dtype=np.int64,
        )
        sig = (
            np.frombuffer(b"".join(payload["sig"]), dtype=np.uint8).reshape(len(node), -1)
            if len(node)
            else np.zeros((0, 0), np.uint8)  # reshape(0, -1) raises (rule 21)
        )
    order = np.argsort(node)
    return {
        "node": node[order],
        "truth": truth[order],
        "sig": np.ascontiguousarray(sig[order]),
        "lang_code": lang_codes.astype(np.int64)[order],
    }


def _gather(shards: list, nodes: np.ndarray):
    """Payload lookup across shard dicts (shard = node & (n-1); one
    shard ⇒ direct searchsorted)."""
    if len(shards) == 1:
        arr = shards[0]
        ia = np.searchsorted(arr["node"], nodes)
        return arr["truth"][ia], arr["sig"][ia], arr["lang_code"][ia]
    n = len(nodes)
    truth = np.empty(n, np.int64)
    lang = np.empty(n, np.int64)
    sig = None
    shard_of = nodes & (len(shards) - 1)
    for sh, arr in enumerate(shards):
        m = shard_of == sh
        if not m.any():
            continue
        ia = np.searchsorted(arr["node"], nodes[m])
        truth[m] = arr["truth"][ia]
        lang[m] = arr["lang_code"][ia]
        if sig is None:
            sig = np.empty((n, arr["sig"].shape[1]), np.uint8)
        sig[m] = arr["sig"][ia]
    return truth, sig, lang


def _score_kernel(na, nb, shards: list, cfg: LinkageConfig) -> pd.DataFrame:
    if len(na) == 0:
        return pd.DataFrame(
            {
                "node_a": pd.Series([], dtype="int64"),
                "node_b": pd.Series([], dtype="int64"),
                "truth_a": pd.Series([], dtype="int64"),
                "truth_b": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    na = np.asarray(na)
    nb = np.asarray(nb)
    truth_a, sig_a, lang_a = _gather(shards, na)
    truth_b, sig_b, lang_b = _gather(shards, nb)
    est = (sig_a == sig_b).mean(axis=1) - (1.0 / 256.0)
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
    lang_eq = lang_a[keep] == lang_b[keep]
    score = np.minimum(0.55 + 0.35 * np.minimum(est[keep], 1.0) + 0.01 * lang_eq, 1.0)
    return pd.DataFrame(
        {
            "node_a": pd.Series(na[keep], dtype="int64"),
            "node_b": pd.Series(nb[keep], dtype="int64"),
            "truth_a": pd.Series(truth_a[keep], dtype="int64"),
            "truth_b": pd.Series(truth_b[keep], dtype="int64"),
            "score": pd.Series(np.round(score, 6), dtype="float64"),
        }
    )


_INDEX_SHARDS = 16  # band-index build parallelism (shard = block_key & 15)


@ray.remote
def _build_band_index_shard(refs: list, shard: int) -> dict:
    """One sorted (block_key → clean nodes) index shard (rows with
    block_key & (shards-1) == shard). The build is sharded so the sort
    runs as ``_INDEX_SHARDS`` parallel tasks instead of one serial
    task on the N→4N critical path. ~16 B/entry."""
    k_parts, n_parts = [], []
    for t in ray.get(refs):
        if not t.num_rows:  # empty blocks may be schema-less
            continue
        # mask per block and keep only this shard's 1/16th — never
        # concat the full input (16 builders × full-copy was the
        # dominant builder cost)
        k = t.column("block_key").to_numpy()
        m = (k & (_INDEX_SHARDS - 1)) == shard
        k_parts.append(k[m])
        n_parts.append(t.column("node").to_numpy()[m])
    if not k_parts:
        return {"keys": np.zeros(0, np.int64), "nodes": np.zeros(0, np.int64)}
    keys = np.concatenate(k_parts)
    nodes = np.concatenate(n_parts)
    order = np.argsort(keys, kind="stable")
    return {"keys": np.ascontiguousarray(keys[order]), "nodes": np.ascontiguousarray(nodes[order])}


_GUARD_SHIFT = 4  # dirty-count guard samples occurrences at 1/16


@ray.remote
def _guard_sample_shard(tbl: pa.Table, cfg: LinkageConfig):
    """One payload block's contribution to the dirty-count guard: a
    deterministic 1/16 ROW sample (rng on node — a key occurs once per
    row, so row sampling IS occurrence sampling per key), keys folded
    only for the sampled rows, returned as small (key, cnt) arrays."""
    import pyarrow.compute as pc

    from .blocking import folded_block_keys

    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64))
    if tbl.num_rows == 0 or "node" not in tbl.column_names:
        return empty
    tbl = tbl.filter(pc.equal(pc.bit_wise_and(tbl.column("node"), 1), 1))
    if tbl.num_rows == 0:
        return empty
    cut = np.uint64(1 << (64 - _GUARD_SHIFT))
    h = rng.hash_u64(tbl.column("node").to_numpy(), cfg.seed, rng.tag_for("scoring.dirty_guard"))
    sel = h < cut
    if not sel.any():
        return empty
    keys_mat = folded_block_keys(tbl.filter(pa.array(sel)), cfg)
    u, c = np.unique(keys_mat.reshape(-1), return_counts=True)
    return u.astype(np.int64), c.astype(np.int64)


def _combine_hot_keys(parts, cfg: LinkageConfig):
    """Reduce the per-shard guard samples to (sorted hot keys, estimated
    dirty counts) — the c·d cap the shuffle path applies exactly needs a
    global dirty count the streaming probe never sees. A key with true
    count d is estimated at d±25%/√(d/16); keys that stay under
    ``floor`` = max_block_pairs/cap may be missed, but those satisfy
    c·d ≤ cap·floor = max_block_pairs by construction, so only genuinely
    degenerate keys matter — and they are caught w.p. ~1 − e^(−d/16).
    Sample volume on the driver: band_rows/16 × 16 B."""
    keys = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0, np.int64)
    if not len(keys):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    cnts = np.concatenate([p[1] for p in parts])
    order = np.argsort(keys, kind="stable")
    keys, cnts = keys[order], cnts[order]
    new = np.ones(len(keys), dtype=bool)
    new[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(new)
    sums = np.add.reduceat(cnts, starts)
    est = sums << _GUARD_SHIFT
    cap = max(64, int(cfg.max_block_pairs**0.5))
    floor = max(1, cfg.max_block_pairs // cap)
    hot = est >= floor
    return keys[starts][hot], est[hot]


class _FoldProbeStage:
    """Actor stage: fused fold + probe over DIRTY payload rows. Each
    input row computes its own b_count block keys (folded_block_keys)
    and probes the broadcast clean-band index with all of them, so:

    - the dirty side's band rows are never materialized or shuffled;
    - a pair (c, d) can only be generated inside d's batch (a payload
      row carries ALL its bands), so the per-batch packed ``np.unique``
      IS the exact global distinct — no distinct shuffle stage at all,
      at any batch size (determinism rule intact).

    Blocks whose clean side exceeds ``cap`` = √max_block_pairs are
    skipped: a block that big is degenerate boilerplate — its true
    pairs are recovered via their other bands. The shuffle path's full
    len(c)·len(d) cap is additionally enforced against the sampled
    dirty-count estimate in ``hot`` (see _dirty_hot_key_table), so a
    1-clean × N-dirty degenerate key no longer expands unbounded
    (ADVICE r2); skips are logged once per actor so the divergence is
    observable."""

    def __init__(self, shard_refs: list, cfg: LinkageConfig, hot_ref=None):
        self.shards = ray.get(list(shard_refs))
        self.cfg = cfg
        self.cap = max(64, int(cfg.max_block_pairs**0.5))
        self.hot_keys, self.hot_counts = (
            ray.get(hot_ref) if hot_ref is not None else (np.zeros(0, np.int64),) * 2
        )
        self._warned = False

    def _degenerate_mask(self, bk: np.ndarray, tot: np.ndarray) -> np.ndarray:
        """True where the estimated c·d exceeds 2× max_block_pairs.

        The 2× margin makes this a RUNAWAY stop, not the exact cap: a
        block the shuffle path keeps (true c·d ≤ cap) is skipped here
        only if the 1/16-sampled estimate errs 2×, which at the d
        values that can matter (d ≥ cap/c) has negligible probability —
        so the two candidate paths stay byte-identical on everything
        but genuinely degenerate keys (measured: same 1,180,801 pairs
        at 600k pages with the guard on)."""
        if not len(self.hot_keys):
            return np.zeros(len(bk), dtype=bool)
        pos = np.searchsorted(self.hot_keys, bk)
        pos_c = np.minimum(pos, len(self.hot_keys) - 1)
        est_d = np.where(self.hot_keys[pos_c] == bk, self.hot_counts[pos_c], 0)
        deg = tot * est_d > 2 * self.cfg.max_block_pairs
        if deg.any() and not self._warned:
            self._warned = True
            import logging

            logging.getLogger(__name__).warning(
                "fold+probe skipping %d degenerate block probes (est c*d > %d)",
                int(deg.sum()),
                self.cfg.max_block_pairs,
            )
        return deg

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .blocking import folded_block_keys

        if batch.num_rows == 0 or "node" not in batch.column_names:
            return pa.table(
                {"node_a": pa.array([], pa.int64()), "node_b": pa.array([], pa.int64())}
            )
        keys_mat = folded_block_keys(batch, self.cfg)  # (n, b_count)
        b_count = keys_mat.shape[1]
        bk_all = keys_mat.reshape(-1)
        dn_all = np.repeat(batch.column("node").to_numpy(), b_count)
        parts_a, parts_b = [], []
        shard_of = bk_all & (_INDEX_SHARDS - 1)
        for sh in range(_INDEX_SHARDS):
            m = shard_of == sh
            if not m.any():
                continue
            bk, dn = bk_all[m], dn_all[m]
            keys, nodes = self.shards[sh]["keys"], self.shards[sh]["nodes"]
            lo = np.searchsorted(keys, bk, "left")
            hi = np.searchsorted(keys, bk, "right")
            tot = hi - lo
            keep = (tot > 0) & (tot <= self.cap) & ~self._degenerate_mask(bk, tot)
            lo, tot, dn = lo[keep], tot[keep], dn[keep]
            s = int(tot.sum())
            if s == 0:
                continue
            starts = np.concatenate([[0], np.cumsum(tot)[:-1]])
            idxs = np.repeat(lo - starts, tot) + np.arange(s)
            parts_a.append(nodes[idxs])
            parts_b.append(np.repeat(dn, tot))
        if not parts_a:
            return pa.table(
                {"node_a": pa.array([], pa.int64()), "node_b": pa.array([], pa.int64())}
            )
        a = np.concatenate(parts_a)
        b = np.concatenate(parts_b)
        # exact global distinct (see class docstring): lexsort dedup,
        # valid for ANY int64 node ids (duplicate dirty rows carry
        # high-bit row_uids, so packed-int tricks don't apply)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.empty(len(a), dtype=bool)
        keep[0] = True
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[keep], b[keep]
        return pa.table({"node_a": pa.array(a, pa.int64()), "node_b": pa.array(b, pa.int64())})


def candidate_pairs_broadcast(payload_ds, cfg: LinkageConfig):
    """Broadcast-index candidate generation — the single-node / small-
    side fast path: the clean side's band rows become sorted numpy
    index shards in the object store; DIRTY payload rows fold + probe
    them in one fused actor stage. NO shuffle anywhere: the only wide
    operation left in candidate generation is the clean-band emit
    feeding the index builders (the round-1 candidates phase spent
    ~15 s of machinery floor shuffling 10.8M band rows at 600k pages;
    the first round-2 version still shuffled the raw pair stream for
    the global distinct). Above ``cfg.broadcast_index_max_entries``
    clean band rows, callers use ``candidate_pairs`` (the all-shuffle
    cluster path)."""
    import pyarrow.compute as pc

    from .blocking import band_rows_from_payload

    # degenerate-key guard tasks launch FIRST, straight over the
    # materialized payload's arrow refs — they run concurrently with
    # the clean-band materialize + index-shard build below instead of
    # costing a serial Dataset execution (measured: the blocking
    # variant added ~2 s to the candidates phase at 600k pages)
    guard_tasks = [_guard_sample_shard.remote(r, cfg) for r in payload_ds.to_arrow_refs()]
    clean_payload = payload_ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t.column("node"), 1), 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    clean_bands = (
        band_rows_from_payload(clean_payload, cfg)
        .select_columns(["block_key", "node"])
        .materialize()
    )
    refs = clean_bands.to_arrow_refs()
    shard_refs = [_build_band_index_shard.remote(refs, s) for s in range(_INDEX_SHARDS)]
    dirty_payload = payload_ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t.column("node"), 1), 1)).select(
            ["node", "host", "bsig"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    hot_ref = ray.put(_combine_hot_keys(ray.get(guard_tasks), cfg))
    # Pool sizing (measured at 600k/32cpus): 131072-row batches gave
    # the probe only ~5 units of parallelism (5.5 s); 16384-row
    # batches across a warmed 8+-actor pool read 2.0 s. The MIN pool
    # size scales with the cluster so a 4-cpu run can still place its
    # actors (min=8 would strand the pool waiting for CPUs).
    cpus = int(ray.cluster_resources().get("CPU", 8))
    min_actors = max(2, min(8, cpus // 4))
    pairs = dirty_payload.map_batches(
        _FoldProbeStage,
        fn_constructor_args=(shard_refs, cfg, hot_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16384,
        concurrency=(min_actors, max(min_actors, min(24, cpus))),
    )
    # keep the index shards alive until the lazy pair stream executes
    pairs._rayrl_band_index_refs = shard_refs
    return pairs


_PAYLOAD_SHARDS = 16


@ray.remote
def _build_payload_shard(refs: list, shard: int) -> dict:
    """One node-keyed payload shard (rows with node & (shards-1) ==
    shard), built off-driver. Sharding turns the (possibly GB-scale)
    concat + sort + byte-reshape into ``_PAYLOAD_SHARDS`` parallel
    tasks instead of one serial task on the scoring critical path; the
    driver never touches the bytes."""
    parts = []
    for t in ray.get(refs):
        if not t.num_rows:  # empty blocks may be schema-less
            continue
        nodes = t.column("node").to_numpy()
        mask = (nodes & (_PAYLOAD_SHARDS - 1)) == shard
        parts.append(t.filter(pa.array(mask)))
    if not parts:
        return {
            "node": np.zeros(0, np.int64),
            "truth": np.zeros(0, np.int64),
            "sig": np.zeros((0, 0), np.uint8),
            "lang_code": np.zeros(0, np.int64),
        }
    # concat only this shard's 1/16th (sig/bsig payloads are the bulk)
    return payload_arrays(pa.concat_tables(parts))


def payload_shard_refs(payload_ds) -> list:
    """Materialized payload Dataset → list of ObjectRef[shard dict],
    built off-driver in parallel."""
    refs = payload_ds.to_arrow_refs()
    return [_build_payload_shard.remote(refs, s) for s in range(_PAYLOAD_SHARDS)]


class BroadcastScorer:
    """Actor-pool scorer. The numpy payload is fetched from the object
    store ONCE per actor in __init__ — a ZERO-COPY ray.get (~ms).

    Why an actor pool and not stateless tasks: a ray.get of a large
    broadcast inside a running TASK blocks the worker slot, and the
    raylet responds by spawning replacement workers — at 128 bucket
    tasks that cascades into 100+ worker processes and object-store
    thrash. Bounded actors doing the get at construction keep the
    worker count fixed."""

    def __init__(self, shard_refs: list, cfg: LinkageConfig):
        self.shards = ray.get(list(shard_refs))
        self.cfg = cfg

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return _score_kernel(
            batch["node_a"].to_numpy(), batch["node_b"].to_numpy(), self.shards, self.cfg
        )

    def match_prob(self, batch: pd.DataFrame) -> np.ndarray:
        """Scorer-protocol view (predict.PredictStage): probability per
        pair row. ≥ 0.5 exactly iff the emission decision keeps the
        pair (est ≥ threshold), and equals the emitted ``score`` there;
        below the threshold the est maps monotonically into
        [0, 0.5)."""
        na = batch["node_a"].to_numpy()
        nb = batch["node_b"].to_numpy()
        if len(na) == 0:
            return np.zeros(0)
        _, sig_a, lang_a = _gather(self.shards, na)
        _, sig_b, lang_b = _gather(self.shards, nb)
        est = (sig_a == sig_b).mean(axis=1) - (1.0 / 256.0)
        lang_eq = lang_a == lang_b
        above = np.minimum(0.55 + 0.35 * np.minimum(est, 1.0) + 0.01 * lang_eq, 1.0)
        thr = self.cfg.jaccard_threshold
        below = np.clip(est, 0.0, None) / max(thr, 1e-9) * 0.499
        return np.where(est >= thr, above, below)


def score_pairs_broadcast(pairs_ds, payload, cfg: LinkageConfig, concurrency=(2, 8)):
    """``payload`` may be an Arrow table / pandas frame (arrays built
    here, single shard) or a list of shard ObjectRefs
    (payload_shard_refs — the off-driver path link_datasets uses)."""
    if isinstance(payload, list):
        refs = payload
    else:
        refs = [ray.put(payload_arrays(payload))]
    # no repartition: map_batches bundles the distinct stage's
    # per-bucket blocks up to batch_size itself — an explicit
    # repartition here added a full extra pass over the pair stream
    return pairs_ds.map_batches(
        BroadcastScorer,
        fn_constructor_args=(refs, cfg),
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
