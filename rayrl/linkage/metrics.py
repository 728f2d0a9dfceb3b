"""Pairwise precision / recall / F1 against generator ground truth —
the reduction of the reference's metric set
(/root/reference/benchmarking/utils.R:997-1047) demanded by the north
rule. Computed entirely as distributed grouped aggregates over the
(small) label table + contingency counts; nothing large reaches the
driver.

Definitions over physical rows (nodes): truth cluster = shared
``record_id`` (clean row, its dirty copy, duplicate copies); predicted
cluster = connected component of match edges. With C(n,2) pair counts:
TP = Σ_{cluster×truth} C(n_ct,2); predicted = Σ_cluster C(n_c,2);
actual = Σ_truth C(n_t,2) over ALL nodes (singletons included — they
only add to the denominator via FN, as they should)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count


def _pairs(counts_ds, col: str) -> float:
    """Σ C(n,2) over a Dataset with a count() column."""

    def c2(batch: pa.Table) -> pa.Table:
        n = batch.column(col).to_numpy().astype("float64")
        return pa.table({"p": pa.array(n * (n - 1) / 2.0)})

    out = counts_ds.map_batches(c2, batch_format="pyarrow").sum("p")
    return float(out or 0.0)


def pairwise_f1(labels_with_truth, all_nodes) -> dict:
    """``labels_with_truth``: Dataset (node, label, truth) for clustered
    nodes. ``all_nodes``: Dataset (node, truth) for EVERY physical row
    of both sides."""
    truth_pairs = _pairs(all_nodes.groupby("truth").aggregate(Count(alias_name="n")), "n")
    cluster_pairs = _pairs(labels_with_truth.groupby("label").aggregate(Count(alias_name="n")), "n")
    tp = _pairs(labels_with_truth.groupby(["label", "truth"]).aggregate(Count(alias_name="n")), "n")
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
