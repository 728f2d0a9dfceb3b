"""1-to-1 link resolution + extended pair metrics — parity with the
reference's post-prediction stages (SURVEY.md §2.3)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import bucketed_group_apply, group_agg


def links_1to1(edges, num_buckets: int = 64):
    """Keep edges whose endpoints each appear exactly once — the
    add_count×2 + filter of /root/reference/benchmarking/utils.R:368-389.
    Fully distributed: two sequential bucketed group filters (keep
    size-1 groups per side). No driver-side endpoint sets — unique
    endpoints are O(edges) in the worst case, so the round-1 collect +
    broadcast would not survive cluster scale."""

    def attach(key, out):
        # counts must come from the ORIGINAL edge set on both sides —
        # filtering one side first would let a multi-linked endpoint
        # sneak through once its rival edges were dropped
        def add(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df[out] = df.groupby(key, sort=False)[key].transform("size")
            return df

        return add

    with_a = bucketed_group_apply(edges, ["node_a"], attach("node_a", "_n_a"), num_buckets)
    with_ab = bucketed_group_apply(with_a, ["node_b"], attach("node_b", "_n_b"), num_buckets)
    return with_ab.filter(expr="_n_a == 1 and _n_b == 1").drop_columns(["_n_a", "_n_b"])


def find_best_links(edges, odds_threshold: float = 0.4, num_buckets: int = 64):
    """Per left-node: keep the top-scored edge iff its score beats the
    runner-up by > ``odds_threshold`` — the sort + p1−p2 gap filter of
    utils.R:457-470, vectorized per bucket."""

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["node_a", "score"], ascending=[True, False])
        g = df.groupby("node_a", sort=False)
        top = g.head(1).set_index("node_a")
        second = g.nth(1)
        if len(second):
            second = second.set_index("node_a")["score"]
            gap = top["score"] - second.reindex(top.index).fillna(-1.0)
        else:
            gap = pd.Series(np.inf, index=top.index)
        keep = top[(gap > odds_threshold) | gap.isna()]
        return keep.reset_index()

    return bucketed_group_apply(edges, ["node_a"], best, num_buckets)


def resolve_linkage(edges, resolved):
    """Flag each edge with whether it survived resolution — the left
    join + match_pred_resolved of utils.R:393-403. ``resolved`` small →
    broadcast key set."""
    import ray

    keys = set(map(tuple, resolved.select_columns(["node_a", "node_b"]).to_pandas().to_numpy()))
    ref = ray.put(keys)

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        batch = batch.copy()
        batch["match_pred_resolved"] = [
            (a, b) in ks for a, b in zip(batch["node_a"], batch["node_b"])
        ]
        return batch

    return edges.map_batches(flag, batch_format="pandas")


def pair_metrics(edges) -> dict:
    """Extended pair-level metric set over scored edges vs truth —
    accuracy / precision / recall / specificity / npv / F1 / Brier /
    confidence, the calculate_metrics(_prob) reduction
    (utils.R:997-1047). Edge rows are predicted-positive pairs; the
    negative universe is candidates that scored < 0.5 (not emitted), so
    the pair-level metrics here are over emitted edges: tp = truth
    match, fp = truth non-match."""
    df = edges.select_columns(["truth_a", "truth_b", "score"]).to_pandas()
    truth = (df["truth_a"] == df["truth_b"]).to_numpy()
    prob = df["score"].to_numpy()
    pred = prob >= 0.5
    tp = int((pred & truth).sum())
    fp = int((pred & ~truth).sum())
    fn = int((~pred & truth).sum())
    tn = int((~pred & ~truth).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return {
        "n_pairs": len(df),
        "accuracy": (tp + tn) / max(len(df), 1),
        "precision": precision,
        "recall": recall,
        "f1": 2 * precision * recall / max(precision + recall, 1e-12),
        "brier": float(np.mean((prob - truth.astype(float)) ** 2)) if len(df) else 0.0,
        "mean_confidence": float(np.mean(np.abs(prob - 0.5) * 2)) if len(df) else 0.0,
    }
