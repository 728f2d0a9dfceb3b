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


def _attach_counts(edges, num_buckets: int = 64):
    """Attach per-endpoint edge counts (_n_a, _n_b) computed on the
    FULL edge set — the add_count_name×2 of utils.R:427-431."""

    def attach(key, out):
        def add(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df[out] = df.groupby(key, sort=False)[key].transform("size")
            return df

        return add

    with_a = bucketed_group_apply(edges, ["node_a"], attach("node_a", "_n_a"), num_buckets)
    return bucketed_group_apply(with_a, ["node_b"], attach("node_b", "_n_b"), num_buckets)


def find_best_links_aggregated(edges, odds_threshold: float = 0.4, num_buckets: int = 64):
    """Two-sided ambiguity resolution — find_best_links_aggregated,
    /root/reference/benchmarking/utils.R:426-455:

    1. edges whose endpoints are both unique → kept outright;
    2. ambiguous edges (either endpoint multi-linked) → per-side gap
       filter (top score must beat the runner-up by > ``odds_threshold``;
       single-edge groups have no runner-up and are dropped, as the
       reference's NA-odds filter does);
    3. union of both sides' winners, deduped, then re-filtered to pairs
       unique on both endpoints;
    4. result = (3) ∪ (1).

    All stages are bucketed shuffles keyed on an endpoint."""
    counted = _attach_counts(edges, num_buckets).materialize()
    one_to_one = counted.map_batches(
        lambda df: df[(df["_n_a"] == 1) & (df["_n_b"] == 1)][["node_a", "node_b"]],
        batch_format="pandas",
    )
    ambiguous = counted.map_batches(
        lambda df: df[(df["_n_a"] > 1) | (df["_n_b"] > 1)][["node_a", "node_b", "score"]],
        batch_format="pandas",
    )

    def best_side(key):
        def best(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values([key, "score"], ascending=[True, False])
            g = df.groupby(key, sort=False)
            sizes = g[key].transform("size")
            df = df[sizes >= 2]  # no runner-up → NA odds → dropped (ref)
            g = df.groupby(key, sort=False)
            top = g.head(1)
            second = g.nth(1)["score"].to_numpy()
            odds = top["score"].to_numpy() - second
            return top[odds > odds_threshold][["node_a", "node_b"]]

        return best

    best_a = bucketed_group_apply(ambiguous, ["node_a"], best_side("node_a"), num_buckets)
    best_b = bucketed_group_apply(ambiguous, ["node_b"], best_side("node_b"), num_buckets)
    from ..shuffle import distinct_rows

    cand = distinct_rows(best_a.union(best_b), ["node_a", "node_b"], num_buckets)
    # re-filter: winners must be unique on BOTH endpoints after the union
    uniq = links_1to1(cand, num_buckets)
    return uniq.union(one_to_one)


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
            gap = top["score"] - second.reindex(top.index)
        else:
            gap = pd.Series(np.nan, index=top.index)
        # a group with no runner-up has NA odds and is DROPPED — the
        # reference's filter silently removes NA rows (utils.R:457-470),
        # exactly like find_best_links_aggregated; the old fillna(-1)
        # kept every singleton instead (r5 review). NaN > t is False.
        keep = top[gap > odds_threshold]
        return keep.reset_index()

    return bucketed_group_apply(edges, ["node_a"], best, num_buckets)


# resolved-link sets are O(nodes); above this the driver broadcast-set
# path would materialize cluster-scale data on one process
DRIVER_RESOLVED_MAX = 2_000_000


def resolve_linkage(edges, resolved, driver_max: int = DRIVER_RESOLVED_MAX):
    """Flag each edge with whether it survived resolution — the left
    join + match_pred_resolved of utils.R:393-403. Size-gated (round-3
    fix, VERDICT r2 #3): below ``driver_max`` resolved rows the key set
    is collected + broadcast (zero shuffle of the edge stream); above
    it the flag is attached via a bucketed LEFT hash join keyed on both
    endpoints — the edges ride one bounded-bucket shuffle and nothing
    is materialized on the driver. Same output (equivalence-tested with
    the gate forced to 0)."""
    import ray

    pairs = resolved.select_columns(["node_a", "node_b"])
    if pairs.count() <= driver_max:
        keys = set(map(tuple, pairs.to_pandas().to_numpy()))
        ref = ray.put(keys)

        def flag(batch: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(ref)
            batch = batch.copy()
            batch["match_pred_resolved"] = [
                (a, b) in ks for a, b in zip(batch["node_a"], batch["node_b"])
            ]
            return batch

        return edges.map_batches(flag, batch_format="pandas")

    from ..shuffle import bucketed_join, distinct_rows

    # float flag column: the left join's miss rows are NaN (an int8
    # would trip the join helper's int-restore on nulls)
    marked = distinct_rows(pairs, ["node_a", "node_b"]).map_batches(
        lambda df: df.assign(_resolved=np.float64(1.0)), batch_format="pandas"
    )
    joined = bucketed_join(edges, marked, ["node_a", "node_b"], how="left")

    def to_flag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["match_pred_resolved"] = batch["_resolved"].notna().to_numpy()
        return batch.drop(columns=["_resolved"])

    return joined.map_batches(to_flag, batch_format="pandas")


def auc_score(truth: np.ndarray, prob: np.ndarray) -> float:
    """ROC AUC via the rank (Mann-Whitney) statistic with average
    ranks for ties — the pROC::auc reduction of utils.R:1032."""
    n_pos = int(truth.sum())
    n_neg = len(truth) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    order = np.argsort(prob, kind="stable")
    ranks = np.empty(len(prob), dtype=np.float64)
    sorted_prob = prob[order]
    ranks_seq = np.arange(1, len(prob) + 1, dtype=np.float64)
    # average ranks over tied prob runs
    _, inv, counts = np.unique(sorted_prob, return_inverse=True, return_counts=True)
    cum = np.concatenate([[0], np.cumsum(counts)])
    avg = (cum[:-1] + 1 + cum[1:]) / 2.0
    ranks[order] = avg[inv]
    del ranks_seq
    r_pos = ranks[truth.astype(bool)].sum()
    return float((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def calc_review_pct(truth: np.ndarray, prob: np.ndarray, ppv: float = 1.0, npv: float = 1.0) -> float:
    """Fraction of pairs needing clerical review: probs strictly
    between t1 (largest ≤0.5 threshold whose ≤-side NPV ≥ ``npv``) and
    t2 (smallest >0.5 threshold whose ≥-side PPV ≥ ``ppv``) —
    calc_review_pct, utils.R:1050-1081. Divergence note: the
    reference's positive-side loop tests mean(actuals == 0) ≥ ppv
    (utils.R:1072-1075), which reads as a typo for the match rate; we
    implement the PPV reading (mean(actuals == 1) ≥ ppv)."""
    if len(prob) == 0:
        return 0.0
    order = np.argsort(prob, kind="stable")
    p = prob[order]
    m = truth[order].astype(np.int64)
    neg_mask = p <= 0.5
    n_neg_side = int(neg_mask.sum())
    # prefix NPV over ascending probs (share of true-unmatch at ≤ p[i])
    cum_tn = np.cumsum(m == 0)
    t1 = None
    if n_neg_side:
        idx = np.arange(n_neg_side)
        # thresholds are VALUES: `match_prob <= t` includes the WHOLE
        # tied run at t (utils.R:1052-1081), so NPV is only evaluated
        # at run-END indices — a partial prefix of a tie run qualified
        # spuriously before (r5 review; scores quantize to ~128
        # distinct values, so tie runs are the norm and the old
        # per-element test was also tie-order/parallelism sensitive)
        run_end = np.concatenate(
            [p[1:n_neg_side] != p[: n_neg_side - 1], [True]]
        )
        cand = idx[run_end]
        ok = cum_tn[cand] / (cand + 1) >= npv
        hits = cand[ok]
        # reference walks candidate thresholds DESCENDING and stops at
        # the first satisfying one → the largest qualifying threshold;
        # if none qualifies the loop falls through to the smallest
        t1 = p[hits[-1]] if len(hits) else p[0]
    else:
        t1 = -np.inf
    pos_mask = p > 0.5
    t2 = None
    if pos_mask.any():
        pos_start = int(np.argmax(pos_mask))
        # suffix PPV over ascending thresholds (share of true-match at ≥ p[i]);
        # `match_prob >= t` includes the whole tied run, so only
        # run-START indices are candidates
        suf_tp = np.cumsum(m[::-1] == 1)[::-1]
        idx = np.arange(pos_start, len(p))
        run_start = np.concatenate([[True], p[pos_start + 1 :] != p[pos_start:-1]])
        cand = idx[run_start]
        ok = suf_tp[cand] / (len(p) - cand) >= ppv
        hits = cand[ok]
        t2 = p[hits[0]] if len(hits) else p[-1]
    else:
        t2 = np.inf
    return float(np.mean((prob > t1) & (prob < t2)))


def calc_threshold_for_metric_value(
    truth: np.ndarray,
    prob: np.ndarray,
    metric: str = "precision",
    value: float = 0.99,
    k_range: "np.ndarray | None" = None,
    lowest: bool = True,
) -> "float | None":
    """Smallest (or largest) decision threshold achieving a target
    metric value — calc_threshold_for_metric_value, utils.R:1121-1160.
    Vectorized over the whole grid: suffix tp/fp counts on the sorted
    probs give every threshold's confusion row at once."""
    if k_range is None:
        k_range = np.round(np.arange(0.5, 1.0005, 0.001), 3)
    order = np.argsort(prob, kind="stable")
    p = prob[order]
    m = truth[order].astype(np.int64)
    n_pos = int(m.sum())
    # for each k: pred_pos = prob >= k → suffix starting at searchsorted
    starts = np.searchsorted(p, k_range, side="left")
    suf_tp = np.concatenate([np.cumsum(m[::-1])[::-1], [0]])
    tp = suf_tp[starts]
    pred_pos = len(p) - starts
    return _grid_metric_select(k_range, tp, pred_pos, n_pos, metric, value, lowest)


def _grid_metric_select(k_range, tp, pred_pos, n_pos, metric, value, lowest):
    """Pick the threshold from per-grid-point confusion counts (shared
    by the driver and distributed scans)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        # zero-prediction grid points are NaN, not precision 1.0: the
        # reference computes tp/(tp+fp) = NaN there and filter() drops
        # the row (utils.R:1121-1160) — treating them as 1.0 returned a
        # vacuous empty-prediction threshold whenever no real
        # threshold reached the target (r5 review)
        if metric == "precision":
            vals = np.where(pred_pos > 0, tp / np.maximum(pred_pos, 1), np.nan)
        elif metric == "recall":
            vals = tp / max(n_pos, 1)
        elif metric == "f1":
            prec = np.where(pred_pos > 0, tp / np.maximum(pred_pos, 1), np.nan)
            rec = tp / max(n_pos, 1)
            vals = np.where(
                np.isnan(prec),
                np.nan,  # np.where's False branch would swallow the NaN
                np.where(
                    prec + rec > 0, 2 * prec * rec / np.maximum(prec + rec, 1e-12), 0.0
                ),
            )
        else:
            raise ValueError(f"unknown metric {metric}")
    if lowest:
        ok = np.nonzero(vals >= value)[0]
        return float(k_range[ok[0]]) if len(ok) else None
    ok = np.nonzero(vals <= value)[0]
    return float(k_range[ok[-1]]) if len(ok) else None


def calc_threshold_distributed(
    edges,
    metric: str = "precision",
    value: float = 0.99,
    k_range: "np.ndarray | None" = None,
    lowest: bool = True,
    num_buckets: int = 16,
) -> "float | None":
    """Distributed EXACT variant of ``calc_threshold_for_metric_value``
    for edge sets too large to collect (VERDICT r2 "missing" #4): the
    threshold grid is fixed, so every batch emits one partial
    (grid_idx, tp, pred_pos, n_pos) count vector — a few hundred ints
    regardless of batch size — and the grid's confusion rows reduce by
    summation. No (truth, prob) row ever reaches the driver; result is
    identical to the driver scan on the same grid (equivalence-tested),
    at any edge count."""
    if k_range is None:
        k_range = np.round(np.arange(0.5, 1.0005, 0.001), 3)
    kr = np.asarray(k_range, dtype=np.float64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        truth = (batch["truth_a"] == batch["truth_b"]).to_numpy()
        prob = batch["score"].to_numpy(dtype=np.float64)
        order = np.argsort(prob, kind="stable")
        p, m = prob[order], truth[order].astype(np.int64)
        starts = np.searchsorted(p, kr, side="left")
        suf_tp = np.concatenate([np.cumsum(m[::-1])[::-1], [0]])
        return pd.DataFrame(
            {
                "k_idx": np.arange(len(kr), dtype=np.int64),
                "tp": suf_tp[starts],
                "pred_pos": len(p) - starts,
                "n_pos": np.full(len(kr), int(m.sum()), dtype=np.int64),
            }
        )

    narrow = edges.select_columns(["truth_a", "truth_b", "score"])
    red = (
        group_agg(
            narrow.map_batches(partial, batch_format="pandas"),
            ["k_idx"],
            {"tp": ("tp", "sum"), "pred_pos": ("pred_pos", "sum"), "n_pos": ("n_pos", "sum")},
            num_buckets=num_buckets,
        )
        .to_pandas()
        .sort_values("k_idx")
    )
    return _grid_metric_select(
        kr,
        red["tp"].to_numpy(),
        red["pred_pos"].to_numpy(),
        int(red["n_pos"].iloc[0]),
        metric,
        value,
        lowest,
    )


# max (truth_a, truth_b, score) rows pulled to the driver for the
# metric reduction; above it a deterministic hash sample of this size
# is used instead (the estimates' s.e. at 5M rows is < 1e-3)
DRIVER_METRICS_MAX = 5_000_000


def pair_metrics(edges, review_grid: bool = True, driver_max: int = DRIVER_METRICS_MAX) -> dict:
    """Extended pair-level metric set over scored edges vs truth — the
    full calculate_metrics_prob reduction (utils.R:997-1047): accuracy,
    auc, gini, precision, sensitivity/recall, specificity, npv, f1,
    error, brier(+sqrt), mean confidence, and the review_pct@{90..100}
    grid. Edge rows are predicted-positive candidates (score ≥
    threshold was applied upstream for emission; here pred = score ≥
    0.5 like the reference).

    Driver reduction over (truth_a, truth_b, score) only, explicitly
    gated (round-3 fix, VERDICT r2 #8): above ``driver_max`` edges a
    deterministic per-row hash gate (rng counter stream on
    node_a — parallelism-independent) thins the collected set to ~the
    gate size and the result carries ``"sampled": True``."""
    narrow = edges.select_columns(["node_a", "truth_a", "truth_b", "score"])
    n_edges = narrow.count()
    sampled = n_edges > driver_max
    if sampled:
        from .. import rng

        p = driver_max / n_edges
        cut = np.uint64(int(p * 2**64))

        def gate(batch: pd.DataFrame) -> pd.DataFrame:
            u = rng.hash_u64(batch["node_a"].to_numpy(), 0, rng.tag_for("pair_metrics.gate"))
            return batch[u < cut]

        narrow = narrow.map_batches(gate, batch_format="pandas")
    df = narrow.select_columns(["truth_a", "truth_b", "score"]).to_pandas()
    truth = (df["truth_a"] == df["truth_b"]).to_numpy()
    prob = df["score"].to_numpy()
    pred = prob >= 0.5
    tp = int((pred & truth).sum())
    fp = int((pred & ~truth).sum())
    fn = int((~pred & truth).sum())
    tn = int((~pred & ~truth).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    specificity = tn / max(tn + fp, 1)
    npv = tn / max(tn + fn, 1)
    auc = auc_score(truth, prob) if len(df) else 0.5
    out = {
        "n_pairs": n_edges,
        "sampled": sampled,
        "accuracy": (tp + tn) / max(len(df), 1),
        "auc": auc,
        "gini": 2 * auc - 1,
        "precision": precision,
        "recall": recall,
        "sensitivity": recall,
        "specificity": specificity,
        "npv": npv,
        "f1": 2 * precision * recall / max(precision + recall, 1e-12),
        "error": (fp + fn) / max(len(df), 1),
        "brier": float(np.mean((prob - truth.astype(float)) ** 2)) if len(df) else 0.0,
        "mean_confidence": float(np.mean(np.abs(prob - 0.5) * 2)) if len(df) else 0.0,
    }
    out["brier_sqrt"] = float(np.sqrt(out["brier"]))
    if review_grid and len(df):
        for pct in range(90, 101):
            out[f"review_pct_{pct}"] = calc_review_pct(truth, prob, pct / 100.0, pct / 100.0)
    return out
