"""Tests for the perturb/add_error flow, convert_cols, twin-value
sharing and the link-resolution ops."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from rayrl import synth
from rayrl.errors.flow import convert_cols, perturb_dataset, share_value_within_groups
from rayrl.errors.injector import LEDGER_COL, extract_ledger
from rayrl.linkage.resolve import (
    auc_score,
    calc_review_pct,
    calc_threshold_for_metric_value,
    find_best_links,
    find_best_links_aggregated,
    links_1to1,
    pair_metrics,
    resolve_linkage,
)


def test_perturb_dataset_fanout_and_assignment(ray_session):
    n = 1000
    clean = synth.pages_dataset(n, override_num_blocks=2)
    out = perturb_dataset(clean, ["indel", "repl", "tpose"], n_dup=2, seed=7).materialize()
    assert out.count() == n * 3  # original + 2 copies
    led = extract_ledger(out).to_pandas()
    # each record's copies carry exactly one error each, of distinct types
    per_rec = led.groupby("record_id")["error"].apply(list)
    multi = [v for v in per_rec if len(v) >= 2]
    assert len(multi) > 0
    for errs in per_rec:
        assert len(errs) <= 2
        assert len(set(errs)) == len(errs)  # without replacement
    # deterministic across batch sizes
    out2 = perturb_dataset(
        synth.pages_dataset(n, override_num_blocks=7), ["indel", "repl", "tpose"], n_dup=2, seed=7
    ).materialize()
    a = out.to_pandas().sort_values("row_uid").reset_index(drop=True)
    b = out2.to_pandas().sort_values("row_uid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a.drop(columns=[LEDGER_COL]), b.drop(columns=[LEDGER_COL]))


def test_convert_cols(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"record_id": [1, 2], "x": [1.5, 2.5]}))
    out = convert_cols(ds, {"x": pa.string()})
    schema = out.schema().base_schema
    assert schema.field("x").type == pa.string()


def test_share_value_within_groups(ray_session):
    df = pd.DataFrame(
        {
            "row_uid": [1, 2, 3, 4, 5],
            "grp": [10, 10, 20, 20, 30],
            "val": ["a", "b", "c", "d", "e"],
        }
    )
    out = share_value_within_groups(ray.data.from_pandas(df), ["grp"], "val").to_pandas()
    got = dict(zip(out["row_uid"], out["val"]))
    assert got[1] == got[2] == "a"  # group min row's value wins
    assert got[3] == got[4] == "c"
    assert got[5] == "e"


@pytest.fixture()
def edges_ds(ray_session):
    df = pd.DataFrame(
        {
            "node_a": [1, 1, 2, 3, 3, 4],
            "node_b": [10, 11, 10, 12, 13, 14],
            "truth_a": [100, 100, 200, 300, 300, 400],
            "truth_b": [100, 150, 200, 300, 310, 400],
            "score": [0.9, 0.55, 0.8, 0.95, 0.90, 0.7],
        }
    )
    return ray.data.from_pandas(df)


def test_links_1to1(edges_ds):
    out = links_1to1(edges_ds).to_pandas()
    # node_a 1 and 3 appear twice; node_b 10 twice → only (4, 14) is 1-1
    assert set(map(tuple, out[["node_a", "node_b"]].to_numpy())) == {(4, 14)}


def test_links_1to1_counts_on_original_edges(ray_session):
    """Counts must come from the full edge set: here (2,b) has a
    unique node_a but node_b 'b' carries two edges, so NOTHING is 1-1.
    A sequential filter (drop a-side dups, then recount b) would wrongly
    keep (2,b)."""
    df = pd.DataFrame(
        {
            "node_a": [1, 1, 2],
            "node_b": [10, 20, 20],
            "truth_a": [0, 0, 0],
            "truth_b": [0, 0, 0],
            "score": [0.9, 0.9, 0.9],
        }
    )
    out = links_1to1(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 0


def test_distributed_clustering_deep_chain(ray_session, monkeypatch):
    """Pointer jumping: a path graph of diameter 128 must converge to
    one component well within max_rounds=10 (one-hop propagation alone
    would need 128 rounds). Default shuffle strategy on purpose —
    HASH_SHUFFLE hangs tiny map_groups (CLAUDE.md rule 3)."""
    from rayrl.linkage import clustering

    n = 129
    df = pd.DataFrame(
        {"node_a": np.arange(n - 1, dtype=np.int64), "node_b": np.arange(1, n, dtype=np.int64)}
    )
    monkeypatch.setattr(clustering, "DRIVER_UNION_FIND_MAX_EDGES", 0)
    labels = clustering.cluster_edges(ray.data.from_pandas(df), max_rounds=10).to_pandas()
    assert len(labels) == n
    assert (labels["label"] == 0).all()  # single component, min-id label


def test_find_best_links_gap(edges_ds):
    out = find_best_links(edges_ds, odds_threshold=0.2).to_pandas()
    kept = set(map(tuple, out[["node_a", "node_b"]].to_numpy()))
    # node 1: gap 0.9-0.55=0.35 > 0.2 → keep (1,10); node 3: gap 0.05 →
    # drop; nodes 2 and 4 have NO runner-up → NA odds → dropped, the
    # reference's silent NA filter (utils.R:457-470; r5 review — the
    # old fillna(-1) kept every singleton)
    assert kept == {(1, 10)}


def test_resolve_linkage_flags(edges_ds):
    resolved = links_1to1(edges_ds)
    out = resolve_linkage(edges_ds, resolved).to_pandas()
    flags = dict(zip(zip(out["node_a"], out["node_b"]), out["match_pred_resolved"]))
    assert flags[(4, 14)] is True or flags[(4, 14)] == True  # noqa: E712
    assert not flags[(1, 10)]


def test_pair_metrics(edges_ds):
    m = pair_metrics(edges_ds)
    assert m["n_pairs"] == 6
    # truths: matches = rows where truth_a == truth_b → 4 of 6
    assert m["precision"] == pytest.approx(4 / 6)
    assert 0 < m["brier"] < 1
    # extended set (calculate_metrics_prob parity)
    for key in ("auc", "gini", "specificity", "npv", "sensitivity", "error", "brier_sqrt"):
        assert key in m, key
    assert m["gini"] == pytest.approx(2 * m["auc"] - 1)
    assert m["sensitivity"] == m["recall"]
    for pct in range(90, 101):
        assert 0.0 <= m[f"review_pct_{pct}"] <= 1.0


def test_auc_known_values():
    assert auc_score(np.array([1, 1, 0, 0]), np.array([0.9, 0.8, 0.3, 0.2])) == 1.0
    assert auc_score(np.array([0, 0, 1, 1]), np.array([0.9, 0.8, 0.3, 0.2])) == 0.0
    assert auc_score(np.array([1, 0]), np.array([0.5, 0.5])) == 0.5
    # one discordant pair of 4: auc = 3/4
    assert auc_score(np.array([1, 0, 1, 0]), np.array([0.9, 0.8, 0.3, 0.2])) == pytest.approx(0.75)


def test_calc_review_pct():
    truth = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1])
    prob = np.array([0.1] * 5 + [0.9] * 5)
    assert calc_review_pct(truth, prob, 1.0, 1.0) == 0.0  # perfectly separated
    truth2 = np.array([0, 0, 1, 0, 1])
    prob2 = np.array([0.1, 0.2, 0.45, 0.6, 0.9])
    # t1 = 0.2 (NPV breaks at 0.45), t2 = 0.9 (PPV breaks at 0.6)
    assert calc_review_pct(truth2, prob2, 1.0, 1.0) == pytest.approx(0.4)


def test_calc_threshold_for_metric_value():
    truth = np.array([0, 0, 1, 0, 1, 1])
    prob = np.array([0.55, 0.60, 0.70, 0.80, 0.90, 0.95])
    # precision by threshold: ≥.55→3/6, ≥.61→3/4, ≥.71→2/3, ≥.81→2/2=1
    t = calc_threshold_for_metric_value(truth, prob, "precision", 1.0)
    assert t is not None and 0.80 < t <= 0.81
    # lowest=False = LARGEST k whose value ≤ target (utils.R:1146-1151):
    # precision ≤ 0.6 last holds on the (0.551, 0.600] grid steps
    t2 = calc_threshold_for_metric_value(truth, prob, "precision", 0.6, lowest=False)
    assert t2 == pytest.approx(0.600)
    # recall is monotone non-increasing in k: lowest k with recall ≥ 1 = grid start
    t3 = calc_threshold_for_metric_value(truth, prob, "recall", 1.0)
    assert t3 == pytest.approx(0.5)
    assert calc_threshold_for_metric_value(truth, prob, "precision", 1.01) is None


def test_calc_threshold_distributed_matches_driver(ray_session):
    """The distributed grid scan must equal the driver scan exactly —
    every metric, both directions, across block layouts."""
    import ray.data

    from rayrl.linkage.resolve import calc_threshold_distributed

    rng = np.random.default_rng(5)
    n = 4000
    truth = rng.random(n) < 0.3
    prob = np.clip(truth * 0.5 + rng.random(n) * 0.6, 0, 1)
    df = pd.DataFrame(
        {
            "truth_a": np.where(truth, 1, np.arange(n) + 2),
            "truth_b": 1,
            "score": prob,
        }
    )
    edges = ray.data.from_pandas(df).repartition(7)
    for metric, value, lowest in [
        ("precision", 0.9, True),
        ("precision", 0.6, False),
        ("recall", 0.5, True),
        ("f1", 0.7, True),
    ]:
        want = calc_threshold_for_metric_value(
            truth.astype(np.int64), prob, metric, value, lowest=lowest
        )
        got = calc_threshold_distributed(edges, metric, value, lowest=lowest)
        assert got == want, (metric, value, lowest, got, want)


def test_find_best_links_aggregated(ray_session):
    df = pd.DataFrame(
        {
            "node_a": [1, 2, 2, 3, 3, 4, 4, 5],
            "node_b": [10, 20, 21, 30, 31, 40, 41, 40],
            "score": [0.9, 0.9, 0.4, 0.80, 0.75, 0.95, 0.2, 0.9],
        }
    )
    out = find_best_links_aggregated(ray.data.from_pandas(df), odds_threshold=0.4).to_pandas()
    got = set(map(tuple, out[["node_a", "node_b"]].to_numpy()))
    # (1,10): both-unique 1to1; (2,20): a-side gap 0.5; (4,40): a-side
    # gap 0.75 and b-side ambiguity unresolved but union stays unique;
    # node 3 gap 0.05 → dropped
    assert got == {(1, 10), (2, 20), (4, 40)}


def test_resolve_linkage_join_path_equivalence(edges_ds):
    """Gate forced to 0 → the bucketed left-join path must produce the
    exact flags of the broadcast key-set path."""
    resolved = links_1to1(edges_ds).materialize()
    broadcast = (
        resolve_linkage(edges_ds, resolved)
        .to_pandas()
        .sort_values(["node_a", "node_b"])
        .reset_index(drop=True)
    )
    joined = (
        resolve_linkage(edges_ds, resolved, driver_max=0)
        .to_pandas()
        .sort_values(["node_a", "node_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        broadcast[["node_a", "node_b", "match_pred_resolved"]],
        joined[["node_a", "node_b", "match_pred_resolved"]],
    )


def test_pair_metrics_gate(edges_ds):
    """Gate forced low → metrics computed on a deterministic hash
    sample; result is flagged and n_pairs still reports the true
    count."""
    m = pair_metrics(edges_ds, driver_max=3)
    assert m["sampled"] is True
    assert m["n_pairs"] == 6
    for key in ("auc", "precision", "brier"):
        assert key in m
    # the full path is unflagged
    assert pair_metrics(edges_ds)["sampled"] is False
