"""Streaming dedup invariants: keeper count matches the batch path and
is parallelism-independent; exactly one keeper survives per duplicate
group regardless of which arrival wins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from rayrl.streamdedup import stream_dedup_flags, stream_dedup_summary

SF = "/root/testdata/sf0.001"


def test_summary_matches_batch_distinct(ray_session):
    out = stream_dedup_summary(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    assert int(out["n_docs"].iloc[0]) == len(docs)
    assert int(out["n_keepers"].iloc[0]) == docs["text"].nunique()
    assert int(out["n_dups"].iloc[0]) == len(docs) - docs["text"].nunique()


@pytest.mark.parametrize("blocks", [1, 7])
def test_one_keeper_per_group_any_parallelism(ray_session, blocks):
    texts = [f"doc number {i % 40}" for i in range(400)]  # 40 groups of 10
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(400), "text": texts})
    ).repartition(blocks)
    flagged, shards = stream_dedup_flags(ds, n_shards=3)
    df = flagged.to_pandas()
    for s in shards:
        ray.kill(s)
    per_group = df.groupby("text")["is_first"].sum()
    assert (per_group == 1).all()
    assert df["is_first"].sum() == 40


def test_shard_compaction_bounds_live_set(ray_session):
    """The two-tier shard (VERDICT r4 #4): the live set freezes into
    sorted-array tiers at compact_above, correctness is unchanged
    (exact — every distinct fp first exactly once, every re-check a
    dup), and the probe shows the bound held."""
    from rayrl.streamdedup import FingerprintShard

    shard = FingerprintShard.remote(100)
    rng = np.random.default_rng(17)
    fps = np.unique(rng.integers(0, 2**63, size=1200, dtype=np.int64))[:1000].astype(np.uint64)
    assert len(fps) == 1000
    masks = []
    for chunk in np.array_split(fps, 13):  # crosses the 100-entry bound
        masks.append(ray.get(shard.check_and_add.remote(chunk)))
    assert all(m.all() for m in masks)  # all distinct → all first
    # every re-check (any order) is a duplicate
    recheck = ray.get(shard.check_and_add.remote(fps[::-1].copy()))
    assert not recheck.any()
    stats = ray.get(shard.tier_stats.remote())
    assert stats["n_live"] < 100  # live set stayed bounded
    assert stats["n_live"] + stats["n_frozen"] == 1000
    assert stats["n_tiers"] >= 1
    assert ray.get(shard.size.remote()) == 1000
    # mixed call: half new, half seen — per-element mask is exact
    mixed = np.concatenate(
        [fps[:50], rng.integers(0, 2**63, 50, dtype=np.int64).astype(np.uint64)]
    )
    m = ray.get(shard.check_and_add.remote(mixed))
    assert not m[:50].any()
    ray.kill(shard)


def test_shard_tier_merge(ray_session):
    """More than _MAX_FROZEN_TIERS freezes collapse into one merged
    tier without losing entries."""
    from rayrl.streamdedup import FingerprintShard, _MAX_FROZEN_TIERS

    shard = FingerprintShard.remote(10)
    fps = np.arange(1, 201, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    for chunk in np.array_split(fps, 20):
        ray.get(shard.check_and_add.remote(chunk))
    stats = ray.get(shard.tier_stats.remote())
    assert stats["n_tiers"] <= _MAX_FROZEN_TIERS + 1
    assert ray.get(shard.size.remote()) == 200
    assert not ray.get(shard.check_and_add.remote(fps)).any()
    ray.kill(shard)
