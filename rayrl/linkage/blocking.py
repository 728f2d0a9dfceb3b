"""Blocking: normalized-url-host + MinHash-of-text composite keys.

The reference blocks with a union of six single-key equality self-joins
on fname/lname/dob (/root/reference/benchmarking/utils.R:548-592). For
web pages the equality keys don't survive character noise, so the
blocking key family is LSH: ``bands`` bands of ``rows_per_band``
MinHashes over character 3-shingles of ``text``, each composed with the
normalized url host (the north_star's composite key). A clean/dirty
pair lands in the same block iff one band of their signatures agrees —
probability ≈ 1-(1-j^r)^b, ≈ 1 for the j ≥ 0.8 similarity that survives
our error rates.

Physical layout — the load-bearing scale decision: band rows are
NARROW (bucket:int32, block_key:int64, node:int64, side:int8 = 21
bytes). Texts do NOT ride through the blocking shuffle ×bands; the
scorer fetches payloads separately (broadcast at single-node scale,
hash join at cluster scale — see scoring.py). ``html`` never enters
the linkage stages at all (SURVEY.md §7.5(7))."""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .. import rng
from .stringsim import minhash_signature, minhash_tags


@dataclass(frozen=True)
class LinkageConfig:
    """Two blocking-key families (both composed with the url host):

    - char family: 4-char-shingle MinHash lanes, ``char_bands`` bands ×
      ``char_r`` lanes. r=3 so the j≈0.05 shared-single-token tail of
      same-host random pairs (quadratic in Zipf host size) almost never
      collides (j³), while true pairs (j ≥ 0.7) still hit ≥ 1 band.
    - word family: word-BIGRAM MinHash lanes, ``word_bands`` × ``word_r``.
      A random pair sharing one token shares no consecutive-token
      bigram, so this family adds ~zero random collisions — it exists
      to recover heavily-edited true pairs whose char-jaccard dropped.
    """

    char_bands: int = 5
    char_r: int = 3
    word_bands: int = 4
    word_r: int = 2
    # "oph" = one-permutation MinHash (one hash pass per batch — the
    # 10¹²-row path; ~5× the classic builder throughput, per-lane match
    # probability identical); "kmin" = classic k-permutation MinHash
    # (kept as the statistical reference; equivalence-tested estimator)
    sig_algo: str = "oph"
    num_buckets: int = 64  # shuffle partitions; scale ≈ rows / 500k
    max_block_pairs: int = 20_000  # skip-cap for pathological blocks
    jaccard_threshold: float = 0.42
    jw_threshold: float = 0.90
    seed: int = 0
    # payload rows broadcast to the scorer actors as zero-copy numpy
    # (~150 B/row → ~1.2 GB at the gate, one copy per node); above it
    # signatures attach via hash joins (cluster scale)
    broadcast_payload_max_rows: int = 8_000_000
    # clean-side band rows (n_clean × bands) up to this count are
    # probed via a broadcast sorted index (~16 B/entry) instead of the
    # all-shuffle groupby; above it the cluster-scale shuffle path runs
    broadcast_index_max_entries: int = 50_000_000

    @property
    def n_char_lanes(self) -> int:
        return self.char_bands * self.char_r

    @property
    def n_word_lanes(self) -> int:
        return self.word_bands * self.word_r


def _packed_binary(mat: np.ndarray) -> pa.Array:
    """(n, w) uint8 matrix → Arrow binary array directly on the numpy
    buffer (arithmetic offsets; no per-row Python bytes objects)."""
    n, w = mat.shape
    # int32 Arrow offsets wrap silently at 2^31 bytes — signatures
    # would then mis-compare rather than error (ADVICE r4). Batches
    # this large must be split upstream (or this switches to
    # pa.large_binary). A real raise, not assert: python -O strips
    # asserts and would restore the silent mis-compare.
    if (n + 1) * w >= 2**31:
        raise ValueError(f"_packed_binary overflow: {n} rows × {w} B")
    offs = np.arange(n + 1, dtype=np.int32) * np.int32(w)
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs), pa.py_buffer(mat)]
    )


def _host_of(url: str) -> str:
    # normalized url host; never the path (the path encodes the truth key)
    try:
        return url.split("//", 1)[1].split("/", 1)[0]
    except IndexError:
        return url


class PayloadBuilder:
    """(node, truth, lang, host, sig, bsig) — the scorer's + blocker's
    lookup side, built in ONE pass over the texts (the only stage that
    ever reads them):

    - ``sig``: 128 low bytes of the char-4-shingle MinHash — the
      scorer's est-Jaccard estimator.
    - ``bsig``: uint16 lanes for banding — ``cfg.n_char_lanes`` char
      lanes followed by ``cfg.n_word_lanes`` word-bigram lanes.

    Stateful: hash tags built once per actor."""

    SIG_K = 128

    def __init__(self, side: int, cfg: LinkageConfig):
        self.side = side
        self.cfg = cfg
        self.tags = minhash_tags(self.SIG_K, cfg.seed ^ 0x5161)
        self.wtags = minhash_tags(cfg.n_word_lanes, cfg.seed ^ 0x77AB)

    def _word_lanes(self, t: str) -> np.ndarray:
        toks = t.split(" ")
        if len(toks) < 2:
            codes = np.array([zlib.crc32(t.encode())], dtype=np.uint64)
        else:
            codes = np.fromiter(
                (
                    zlib.crc32((toks[i] + " " + toks[i + 1]).encode())
                    for i in range(len(toks) - 1)
                ),
                dtype=np.uint64,
                count=len(toks) - 1,
            )
        mixed = rng._splitmix64(codes[None, :] ^ self.wtags[:, None])
        return mixed.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .stringsim import (
            batch_shingles,
            kmin_from_shingles,
            minhash_signatures_batch,
            oph_from_shingles,
            word_bigram_minhash,
        )

        cfg = self.cfg
        uids = batch.column("row_uid").to_numpy()
        tcol = batch.column("text").combine_chunks()
        urls = batch.column("url").to_pylist()
        if cfg.sig_algo == "oph":
            # Scorer signature via one-permutation MinHash: ONE hash
            # pass over the whole batch buffer instead of 128 — the
            # est-Jaccard mean over 128 lanes is statistically
            # equivalent (test_oph_estimator_tracks_jaccard). The 15
            # BANDING lanes stay classic k-min: LSH banding needs
            # per-lane collision ≈ j for every pair, and fixed-hash
            # OPH bins violate that on shingle universes with heavy
            # hitters (bin minima become global properties — measured
            # 22× candidate blowup when banding used OPH lanes). Both
            # signatures share one shingle pass; word-bigram lanes are
            # the vectorized segment-polynomial kernel.
            codes, row_of, _n = batch_shingles(tcol)
            mh_sig = oph_from_shingles(codes, row_of, len(tcol), self.SIG_K, cfg.seed ^ 0x5161)
            mh_band = kmin_from_shingles(
                codes, row_of, len(tcol), self.tags[: cfg.n_char_lanes]
            )
            wl_all = (word_bigram_minhash(tcol, self.wtags) & np.uint64(0xFFFF)).astype(
                np.uint16
            )
        else:
            texts = tcol.to_pylist()
            mh_sig = mh_band = minhash_signatures_batch(texts, self.tags)  # (n, 128)
            wl_all = np.zeros((len(texts), cfg.n_word_lanes), np.uint16)
            for i, t in enumerate(texts):
                if t:
                    wl_all[i] = (self._word_lanes(t) & np.uint64(0xFFFF)).astype(np.uint16)
        sig_bytes = (mh_sig & np.uint64(0xFF)).astype(np.uint8)
        char_lanes = (mh_band[:, : cfg.n_char_lanes] & np.uint64(0xFFFF)).astype(np.uint16)
        # empty/null texts carry all-zero sig AND bsig (every kernel
        # above already returns zero rows for them; wl covers bsig)
        bsig_mat = np.ascontiguousarray(
            np.concatenate([char_lanes, wl_all], axis=1)
        ).view(np.uint8)
        sig_arr = _packed_binary(np.ascontiguousarray(sig_bytes))
        bsig_arr = _packed_binary(bsig_mat)
        hosts = np.fromiter(
            (zlib.crc32(_host_of(u).encode()) for u in urls), dtype=np.int64, count=len(urls)
        )
        return pa.table(
            {
                "node": pa.array(uids * 2 + self.side, pa.int64()),
                "truth": batch.column("record_id"),
                "lang": batch.column("lang"),
                "host": pa.array(hosts, pa.int64()),
                "sig": sig_arr,
                "bsig": bsig_arr,
            }
        )


def node_payload(ds, side: int, cfg: LinkageConfig | None = None):
    cfg = cfg or LinkageConfig()
    return ds.select_columns(["row_uid", "record_id", "url", "text", "lang"]).map_batches(
        PayloadBuilder(side, cfg), batch_format="pyarrow", zero_copy_batch=True
    )


def folded_block_keys(batch: pa.Table, cfg: LinkageConfig) -> np.ndarray:
    """(n, b_count) int64 block keys per payload row: each band's lanes
    folded and mixed with the url host — the shared kernel behind both
    the shuffle band-row emit and the fused fold+probe stage."""
    from ..bytekernels import binary_matrix

    b_count = cfg.char_bands + cfg.word_bands
    if batch.num_rows == 0:
        return np.zeros((0, b_count), dtype=np.int64)
    bsig = binary_matrix(batch.column("bsig"), dtype=np.uint16)
    hosts = batch.column("host").to_numpy()
    folds = []
    for b in range(cfg.char_bands):
        lanes = bsig[:, b * cfg.char_r : (b + 1) * cfg.char_r].astype(np.uint64)
        f = lanes[:, 0]
        for c in range(1, cfg.char_r):
            f = f * np.uint64(65537) + lanes[:, c]
        folds.append(f)
    off = cfg.n_char_lanes
    for b in range(cfg.word_bands):
        lanes = bsig[:, off + b * cfg.word_r : off + (b + 1) * cfg.word_r].astype(np.uint64)
        f = lanes[:, 0]
        for c in range(1, cfg.word_r):
            f = f * np.uint64(65537) + lanes[:, c]
        folds.append(f)
    folded = np.stack(folds, axis=1)
    band_ids = np.arange(b_count, dtype=np.int64)
    mixed = rng._splitmix64(
        folded.view(np.uint64)
        ^ (hosts[:, None].view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        ^ (band_ids[None, :].view(np.uint64) * np.uint64(0xBF58476D1CE4E5B9))
    )
    return (mixed >> np.uint64(1)).astype(np.int64)  # int64-positive keys


def band_rows_from_payload(payload_ds, cfg: LinkageConfig):
    """Derive LSH band rows from the payload signatures — texts are
    read and shingled exactly ONCE per record (in PayloadBuilder); the
    band stage is pure integer math over the byte signatures. Per-byte
    match probability is j + (1-j)/256 ≈ j, so the banding math is the
    same as with full-width minhashes; the 1/65536 band-hash birthday
    collisions add a negligible trickle of candidates."""
    b_count = cfg.char_bands + cfg.word_bands

    def emit(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").to_numpy()
        block_key = folded_block_keys(batch, cfg).reshape(-1)
        # band rows carry ONLY what the pair scan reads: the shuffle
        # recomputes its own bucket from block_key, so a precomputed
        # bucket column was ~4 dead bytes per row through the
        # pipeline's one wide shuffle (r5 review)
        rep_nodes = np.repeat(nodes, b_count)
        return pa.table(
            {
                "block_key": pa.array(block_key, pa.int64()),
                "node": pa.array(rep_nodes, pa.int64()),
                "side": pa.array((rep_nodes & 1).astype(np.int8), pa.int8()),
            }
        )

    return payload_ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
