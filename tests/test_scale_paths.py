"""Force the cluster-scale code paths at small scale: join-based pair
scoring (no broadcast) and distributed clustering + metrics (no driver
fast path). Results must match the single-node fast paths exactly."""

import pytest

from ray.data.context import DataContext, ShuffleStrategy

from rayrl import pipeline, synth
from rayrl.linkage import LinkageConfig, link_datasets
from rayrl.linkage import pipeline as lpipe

N = 2500


@pytest.fixture(scope="module")
def corpus(ray_session):
    clean = synth.pages_dataset(N, override_num_blocks=2).materialize()
    dirty = pipeline.mess_dataset(clean, pipeline.benchmark_specs(0.10), seed=7).dirty.materialize()
    return clean, dirty


def test_join_scoring_path_matches_broadcast(corpus):
    clean, dirty = corpus
    fast = link_datasets(clean, dirty, LinkageConfig(num_buckets=16))

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE  # joins need it
    try:
        cfg = LinkageConfig(num_buckets=16, broadcast_payload_max_rows=0)
        joined = link_datasets(clean, dirty, cfg)
    finally:
        ctx.shuffle_strategy = prev

    fe = fast["edges"].to_pandas().sort_values(["node_a", "node_b"]).reset_index(drop=True)
    je = joined["edges"].to_pandas().sort_values(["node_a", "node_b"]).reset_index(drop=True)
    assert len(fe) == len(je)
    assert (fe[["node_a", "node_b"]].to_numpy() == je[["node_a", "node_b"]].to_numpy()).all()
    assert joined["metrics"]["f1"] == pytest.approx(fast["metrics"]["f1"], abs=1e-9)


def test_distributed_cluster_and_metrics_match_driver(corpus, monkeypatch):
    clean, dirty = corpus
    fast = link_datasets(clean, dirty, LinkageConfig(num_buckets=16))
    monkeypatch.setattr(lpipe, "DRIVER_LINKAGE_MAX_EDGES", 0)
    dist = link_datasets(clean, dirty, LinkageConfig(num_buckets=16))
    for k in ("tp_pairs", "predicted_pairs", "truth_pairs"):
        assert dist["metrics"][k] == fast["metrics"][k], k
    assert dist["metrics"]["f1"] == pytest.approx(fast["metrics"]["f1"])
    assert dist["metrics"]["f1"] >= 0.99


def test_broadcast_index_candidates_match_shuffle(corpus):
    """The broadcast-index candidate path must produce the same
    candidate set as the all-shuffle path on non-degenerate blocks
    (no caps trip on this fixture)."""
    from rayrl.linkage.blocking import band_rows_from_payload, node_payload
    from rayrl.linkage.scoring import candidate_pairs, candidate_pairs_broadcast

    clean, dirty = corpus
    cfg = LinkageConfig(num_buckets=16)
    payload = node_payload(clean, 0, cfg).union(node_payload(dirty, 1, cfg)).materialize()
    bands = band_rows_from_payload(payload, cfg)
    a = candidate_pairs(bands, cfg).to_pandas().sort_values(["node_a", "node_b"]).reset_index(drop=True)
    b = candidate_pairs_broadcast(payload, cfg).to_pandas().sort_values(["node_a", "node_b"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a[["node_a", "node_b"]].to_numpy() == b[["node_a", "node_b"]].to_numpy()).all()


def test_degenerate_dirty_block_capped_like_shuffle(ray_session):
    """A 1-clean x N-dirty degenerate block (N x max_block_pairs) must
    be skipped by the broadcast fold+probe path just like the shuffle
    path's c*d cap — via the sampled dirty-count guard (ADVICE r2)."""
    import pandas as pd
    import ray.data

    from rayrl import synth
    from rayrl.linkage.blocking import band_rows_from_payload, node_payload
    from rayrl.linkage.scoring import candidate_pairs, candidate_pairs_broadcast

    clean = synth.pages_dataset(300, override_num_blocks=2).materialize()
    cdf = clean.to_pandas()
    # 400 dirty clones of clean row 0 (same text+url => same bands in
    # every band family) + 50 verbatim copies of clean rows 1..50
    boiler = pd.concat([cdf.iloc[[0]]] * 400, ignore_index=True)
    normal = cdf.iloc[1:51].copy()
    dirty = pd.concat([boiler, normal], ignore_index=True)
    dirty["row_uid"] = 1_000_000 + pd.RangeIndex(len(dirty))
    dirty["record_id"] = 2_000_000 + pd.RangeIndex(len(dirty))
    dirty_ds = ray.data.from_pandas(dirty).materialize()

    cfg = LinkageConfig(num_buckets=16, max_block_pairs=100)
    payload = node_payload(clean, 0, cfg).union(node_payload(dirty_ds, 1, cfg)).materialize()
    bands = band_rows_from_payload(payload, cfg)
    a = (
        candidate_pairs(bands, cfg)
        .to_pandas().sort_values(["node_a", "node_b"]).reset_index(drop=True)
    )
    b = (
        candidate_pairs_broadcast(payload, cfg)
        .to_pandas().sort_values(["node_a", "node_b"]).reset_index(drop=True)
    )
    # the boilerplate block's 400 pairs are capped out of BOTH paths
    boiler_nodes = set((1_000_000 + pd.RangeIndex(400)).to_numpy() * 2 + 1)
    assert not set(a["node_b"]) & boiler_nodes
    assert not set(b["node_b"]) & boiler_nodes
    # and the normal 1x1 blocks survive identically
    assert len(a) == len(b)
    assert (a[["node_a", "node_b"]].to_numpy() == b[["node_a", "node_b"]].to_numpy()).all()
    assert len(a) >= 50
