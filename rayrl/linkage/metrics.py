"""Pairwise precision / recall / F1 against generator ground truth —
the reduction of the reference's metric set
(/root/reference/benchmarking/utils.R:997-1047) demanded by the north
rule. Computed entirely as bucketed distributed aggregates
(rayrl.shuffle — per-bucket partial Σ C(n,2) sums); only
``num_buckets`` scalars reach the driver.

Definitions over physical rows (nodes): truth cluster = shared
``record_id`` (clean row, its dirty copy, duplicate copies); predicted
cluster = connected component of match edges. With C(n,2) pair counts:
TP = Σ_{cluster×truth} C(n_ct,2); predicted = Σ_cluster C(n_c,2);
actual = Σ_truth C(n_t,2) over ALL nodes (singletons included — they
only add to the denominator via FN, as they should)."""

from __future__ import annotations

import ray

from ..shuffle import group_sizes_pair_sum

# below this row count a driver-side pandas groupby is both faster and
# exactly equivalent; above it the bucketed distributed path kicks in
DRIVER_METRICS_MAX_ROWS = 5_000_000


@ray.remote
def _truth_pairs_task(shard_refs: list) -> float:
    import numpy as np

    truth = np.concatenate([s["truth"] for s in ray.get(list(shard_refs))])
    return _pairs_local({"truth": truth}, ["truth"])


def truth_pairs_from_shards(shard_refs: list):
    """Σ C(n_truth, 2) over the payload shards, as a Ray task
    (returns the ObjectRef). The truth-pair denominator depends only
    on the node payload — not on candidates, scores, or clusters — so
    the pipeline launches this the moment the payload shards exist and
    the (formerly serial) collect + unique runs concurrently with the
    whole score phase."""
    return _truth_pairs_task.remote(shard_refs)


def _pairs_local(df, keys) -> float:
    import numpy as np

    def col(k):
        c = df[k]
        return c.to_numpy() if hasattr(c, "to_numpy") else np.asarray(c)

    if len(keys) == 1:
        key = col(keys[0])
    else:
        _, i0 = np.unique(col(keys[0]), return_inverse=True)
        u1, i1 = np.unique(col(keys[1]), return_inverse=True)
        key = i0.astype(np.int64) * len(u1) + i1
    _, counts = np.unique(key, return_counts=True)
    c = counts.astype(np.float64)
    return float((c * (c - 1) / 2.0).sum())


def pairwise_f1(labels_with_truth, all_nodes, truth_pairs_ref=None) -> dict:
    """``labels_with_truth``: Dataset (node, label, truth) for clustered
    nodes. ``all_nodes``: Dataset (node, truth) for EVERY physical row
    of both sides. ``truth_pairs_ref``: optional ObjectRef from
    ``truth_pairs_from_shards`` — when the pipeline already overlapped
    the truth-pair denominator with scoring, reuse it instead of
    recomputing over ``all_nodes``."""
    if truth_pairs_ref is not None:
        truth_pairs = float(ray.get(truth_pairs_ref))
    if all_nodes.count() <= DRIVER_METRICS_MAX_ROWS:
        labels_df = labels_with_truth.to_pandas()
        if truth_pairs_ref is None:
            truth_pairs = _pairs_local(all_nodes.to_pandas(), ["truth"])
        cluster_pairs = _pairs_local(labels_df, ["label"])
        tp = _pairs_local(labels_df, ["label", "truth"])
    else:
        if truth_pairs_ref is None:
            truth_pairs = group_sizes_pair_sum(all_nodes, ["truth"])
        cluster_pairs = group_sizes_pair_sum(labels_with_truth, ["label"])
        tp = group_sizes_pair_sum(labels_with_truth, ["label", "truth"])
    precision = tp / cluster_pairs if cluster_pairs else 1.0
    recall = tp / truth_pairs if truth_pairs else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp_pairs": tp,
        "predicted_pairs": cluster_pairs,
        "truth_pairs": truth_pairs,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
