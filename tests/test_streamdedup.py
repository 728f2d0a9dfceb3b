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
