"""Linkage pipeline tests: clustering correctness, metrics math, and
the end-to-end F1 ≥ 0.99 gate (FIXTURES.md F5.4)."""

import pandas as pd
import pytest

import ray.data

from rayrl import pipeline, synth
from rayrl.linkage import LinkageConfig, cluster_edges, link_datasets, pairwise_f1
from rayrl.linkage.clustering import _propagate_distributed


def _edges_ds(pairs):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "node_a": [a for a, b in pairs],
                "node_b": [b for a, b in pairs],
                "truth_a": [0] * len(pairs),
                "truth_b": [0] * len(pairs),
                "score": [1.0] * len(pairs),
            }
        )
    )


def _labels_map(labels_ds):
    df = labels_ds.to_pandas()
    return dict(zip(df["node"], df["label"]))


def test_cluster_edges_union_find(ray_session):
    # chain 1-2-3, pair 10-11, self-contained 20
    labels = _labels_map(cluster_edges(_edges_ds([(1, 2), (2, 3), (10, 11)])))
    assert labels[1] == labels[2] == labels[3]
    assert labels[10] == labels[11]
    assert labels[1] != labels[10]


def test_cluster_edges_distributed_matches_driver(ray_session):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (50, 51)]
    drv = _labels_map(cluster_edges(_edges_ds(pairs)))
    dist = _labels_map(_propagate_distributed(_edges_ds(pairs).select_columns(["node_a", "node_b"]), 10))
    # same partition into components, same min-label representative
    assert drv == dist


def test_pairwise_f1_math(ray_session):
    # truth: {1,2,3} share truth 100; {4} truth 200
    all_nodes = ray.data.from_pandas(
        pd.DataFrame({"node": [1, 2, 3, 4], "truth": [100, 100, 100, 200]})
    )
    # predicted: cluster {1,2} found, 3 and 4 unclustered
    labels = ray.data.from_pandas(
        pd.DataFrame({"node": [1, 2], "label": [1, 1], "truth": [100, 100]})
    )
    m = pairwise_f1(labels, all_nodes)
    assert m["truth_pairs"] == 3.0 and m["predicted_pairs"] == 1.0 and m["tp_pairs"] == 1.0
    assert m["precision"] == 1.0 and m["recall"] == pytest.approx(1 / 3)


@pytest.mark.parametrize("rate", [0.01, 0.30])
def test_e2e_f1_gate(ray_session, rate):
    N = 2500
    clean = synth.pages_dataset(N, override_num_blocks=2).materialize()
    dirty = pipeline.mess_dataset(clean, pipeline.benchmark_specs(rate), seed=7).dirty.materialize()
    m = link_datasets(clean, dirty, LinkageConfig(num_buckets=16))["metrics"]
    assert m["f1"] >= 0.99, (rate, m)


def test_driver_union_find_random_graphs_match_slow_mirror():
    """The contracting min-label kernel must produce exactly the
    classic union-find's components with min-node labels, on arbitrary
    graph shapes (stars, chains, cycles, dense blobs, singleton edges),
    not just the star-shaped linkage distribution it is tuned for."""
    import numpy as np

    from rayrl.linkage.clustering import _driver_union_find

    def slow_components(a, b):
        parent = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for x, y in zip(a, b):
            rx, ry = find(int(x)), find(int(y))
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        return {int(n): find(int(n)) for n in set(a) | set(b)}

    def check(a, b, tag):
        got = _driver_union_find(pd.DataFrame({"node_a": a, "node_b": b}))
        want = slow_components(a, b)
        got_map = dict(zip(got["node"].astype(int), got["label"].astype(int)))
        assert got_map == want, tag

    rng = np.random.default_rng(42)
    for trial in range(8):
        n_nodes = int(rng.integers(2, 400))
        n_edges = int(rng.integers(1, 1200))
        a = rng.integers(0, n_nodes, n_edges) * int(rng.integers(1, 1000))
        b = rng.integers(0, n_nodes, n_edges) * int(rng.integers(1, 1000))
        check(a, b, trial)

    # high-diameter regime: a 1000-node chain exercises the bounded
    # 3-jump compression + trailing full-compression loop, which the
    # small-diameter random blobs above essentially never reach. Run it
    # forward, reversed (worst case for min-label flow), and shuffled,
    # plus a both-orientations copy (the direction-canonicalizing dedup).
    chain_a = np.arange(0, 999, dtype=np.int64) * 7 + 3
    chain_b = np.arange(1, 1000, dtype=np.int64) * 7 + 3
    check(chain_a, chain_b, "chain-forward")
    check(chain_b[::-1].copy(), chain_a[::-1].copy(), "chain-reversed")
    perm = rng.permutation(len(chain_a))
    check(chain_a[perm], chain_b[perm], "chain-shuffled")
    check(
        np.concatenate([chain_a, chain_b]),
        np.concatenate([chain_b, chain_a]),
        "chain-both-orientations",
    )
