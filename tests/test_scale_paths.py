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
