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

Physical layout: block keys are int64 (band id ⊕ band hash ⊕ host
hash, SplitMix-finalized) and every band row carries a ``bucket`` =
block_key % num_buckets. The wide shuffle groups by BUCKET (a bounded
number of heavyweight groups — explicit partitioning), and per-block
work happens in a vectorized pandas groupby inside each bucket; this
avoids Ray-level per-tiny-group dispatch overhead AND gives skewed
blocks a salting point. ``html`` is projected OUT before this stage —
wide binary payloads must not ride through the shuffle (SURVEY.md
§7.5(7)).

Emits ``bands`` rows per record: (bucket, block_key, node, truth, side,
text, lang, ts_us).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import rng
from .stringsim import minhash_signature, minhash_tags


@dataclass(frozen=True)
class LinkageConfig:
    minhash_k: int = 16
    bands: int = 8  # rows_per_band = minhash_k // bands
    num_buckets: int = 64  # shuffle partitions; scale ≈ rows / 500k
    max_block_pairs: int = 20_000  # skip-cap for pathological blocks
    jaccard_threshold: float = 0.42
    jw_threshold: float = 0.90
    seed: int = 0


def _host_of(url: str) -> str:
    # normalized url host; never the path (the path encodes the truth key)
    try:
        return url.split("//", 1)[1].split("/", 1)[0]
    except IndexError:
        return url


class BandEmitter:
    """map_batches stage: rows → band rows. Stateful so hash tags are
    built once per actor."""

    def __init__(self, cfg: LinkageConfig, side: int):
        self.cfg = cfg
        self.side = side  # 0 = clean, 1 = dirty
        self.tags = minhash_tags(cfg.minhash_k, cfg.seed)
        self.rows_per_band = cfg.minhash_k // cfg.bands
        self.host_cache: dict[str, int] = {}

    def _host_hash(self, url: str) -> int:
        h = self.host_cache.get(url)
        if h is None:
            h = zlib.crc32(_host_of(url).encode())
            if len(self.host_cache) < 100_000:
                self.host_cache[url] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        texts = batch.column("text").to_pylist()
        urls = batch.column("url").to_pylist()
        langs = batch.column("lang").to_pylist()
        uids = batch.column("row_uid").to_numpy()
        rids = batch.column("record_id").to_numpy()
        ts = pc.cast(batch.column("warc_ts"), pa.int64()).to_numpy(zero_copy_only=False)

        b_count = cfg.bands
        r = self.rows_per_band
        keep = [i for i in range(n) if texts[i]]
        sigs = np.empty((len(keep), b_count), dtype=np.int64)
        hosts = np.empty(len(keep), dtype=np.int64)
        for k, i in enumerate(keep):
            sig = minhash_signature(texts[i], self.tags)
            # fold each band's rows into one value
            band_vals = sig.reshape(b_count, r)
            folded = band_vals[:, 0]
            for c in range(1, r):
                folded = folded * np.uint64(1000003) ^ band_vals[:, c]
            sigs[k] = (folded >> np.uint64(1)).astype(np.int64)  # keep positive
            hosts[k] = self._host_hash(urls[i])

        # block_key = mix(band_id, band_hash, host); int64 ≥ 0
        band_ids = np.tile(np.arange(b_count, dtype=np.int64), len(keep))
        flat_sig = sigs.reshape(-1)
        flat_host = np.repeat(hosts, b_count)
        mixed = rng._splitmix64(
            flat_sig.view(np.uint64)
            ^ (flat_host.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            ^ (band_ids.view(np.uint64) * np.uint64(0xBF58476D1CE4E5B9))
        )
        block_key = (mixed >> np.uint64(1)).astype(np.int64)
        bucket = (mixed % np.uint64(cfg.num_buckets)).astype(np.int32)

        keep_np = np.array(keep, dtype=np.int64)
        rep = np.repeat(keep_np, b_count)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int32()),
                "block_key": pa.array(block_key, pa.int64()),
                "node": pa.array(uids[rep] * 2 + self.side, pa.int64()),
                "truth": pa.array(rids[rep], pa.int64()),
                "side": pa.array(np.full(len(rep), self.side, dtype=np.int8), pa.int8()),
                "text": pa.array([texts[i] for i in rep], pa.string()),
                "lang": pa.array([langs[i] for i in rep], pa.string()),
                "ts_us": pa.array(ts[rep], pa.int64()),
            }
        )


def band_rows(ds, cfg: LinkageConfig, side: int, **map_kwargs):
    """Project to the narrow columns then emit band rows."""
    cols = ["record_id", "row_uid", "url", "warc_ts", "text", "lang"]
    return ds.select_columns(cols).map_batches(
        BandEmitter(cfg, side), batch_format="pyarrow", zero_copy_batch=True, **map_kwargs
    )
