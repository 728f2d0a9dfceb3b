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

from ..shuffle import group_sizes_pair_sum


def pairwise_f1(labels_with_truth, all_nodes) -> dict:
    """``labels_with_truth``: Dataset (node, label, truth) for clustered
    nodes. ``all_nodes``: Dataset (node, truth) for EVERY physical row
    of both sides."""
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
