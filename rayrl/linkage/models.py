"""Deterministic rf / svm / nn trainers — caret model parity.

The reference trains three caret models over the 23 ``metric_*``
columns of the labeled pair vectors and scores candidate pairs with
them:

- random forest — ntree=350, mtry tuned over seq(3, 15, 2),
  preProcess medianImpute (standard_n.R:141-165);
- RBF-kernel SVM — svmRadial, sigma/C grid, medianImpute, accuracy-
  selected by cross-validation (standard_n.R:167-180);
- neural net — keras 64→64→1 (relu/relu/sigmoid), standardized
  inputs, binary cross-entropy, best-val checkpoint + reduce-LR
  callbacks (utils.R:916-995 build_model/build_nn).

Re-expressed here as pure-NumPy trainers with the repo's determinism
rule: every random draw (bootstrap rows, per-node feature subsets,
random-Fourier matrices, weight init) comes from ``rayrl.rng`` counter
streams, and all optimization is full-batch in float64 — so a fit is
byte-identical at any parallelism and across reruns.

Scale shape: training runs driver-side over the gated, bounded labeled
sample (``predict.collect_training_frame`` — the reference itself
trains caret models in one R process on a ≤27k-row sample,
standard_n.R:58-99; the labeled product is bounded by
(1+neg_ratio)·|matches| by construction). Scoring is distributed: the
fitted params dict is ``ray.put`` once and each scorer reconstructs in
an actor's ``__init__`` (``predict.PredictStage``), so a 100 TB pair
stream is scored by broadcast weights, never by shipping the model per
batch.

Model substitutions (documented, not hidden):

- the forest is histogram CART (quantile-binned splits, ≤``N_BINS``
  thresholds per feature) — the standard large-scale RF formulation
  (LightGBM/XGBoost-style binning) rather than exact-threshold CART;
  mtry tuning is out-of-bag accuracy instead of caret's CV (Breiman
  2001 recommends OOB precisely to avoid the CV refit loop);
- svmRadial is approximated by random Fourier features (Rahimi &
  Recht, NeurIPS 2007) + a full-batch squared-hinge primal fit +
  Platt (1999) probability calibration — the kernel-approximation
  path a distributed engine needs anyway (exact kernel SVM is O(n²)
  in support vectors);
- the keras BatchNorm/dropout(0.001) layers are dropped: full-batch
  GD over standardized inputs makes BN redundant and a 0.001 dropout
  is noise — determinism wins.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

import ray

from .. import rng
from .features import METRIC_COLUMNS
from .predict import TRAIN_DRIVER_MAX, collect_training_frame, predict_links_raw

logger = logging.getLogger(__name__)

# quantile bins per feature for histogram CART splits
N_BINS = 32
# rng-counter spacing so (tree, node, draw) streams never collide
_TREE_STRIDE = 1 << 40
_NODE_STRIDE = 1 << 20


def raw_matrix(df: pd.DataFrame, cols: list[str]) -> np.ndarray:
    """(n, p) float64 design matrix with NaN PRESERVED (unlike
    ``predict.feature_matrix``) so medianImpute sees real holes."""
    return np.column_stack(
        [df[c].to_numpy().astype(np.float64, copy=False) for c in cols]
    )


def _median_impute(X: np.ndarray, med: np.ndarray) -> np.ndarray:
    """caret preProcess('medianImpute') analogue: NaN → training-column
    median."""
    mask = np.isnan(X)
    if mask.any():
        X = np.where(mask, np.broadcast_to(med, X.shape), X)
    return X


def _labels01(df: pd.DataFrame, label: str) -> np.ndarray:
    return (df[label].to_numpy() == "match").astype(np.float64)


def _pair_key(df: pd.DataFrame) -> np.ndarray:
    """Canonical int64 pair key for fold/split hashing — the single
    shared definition in ``sampling.pair_key`` (order-independent: a
    pure function of the pair ids)."""
    from .sampling import pair_key

    return pair_key(df)


# --------------------------------------------------------------- forest


def _bin_edges(X: np.ndarray, n_bins: int = N_BINS) -> list[np.ndarray]:
    """Per-feature quantile cut points (deduped). Split semantics:
    code = searchsorted(edges, x, side='right'); 'code <= b' ⟺
    'x < edges[b]' — train and predict both digitize with
    :func:`_digitize`, so the comparison is exact by construction."""
    qs = np.linspace(0.0, 1.0, n_bins + 1)[1:-1]
    return [np.unique(np.quantile(X[:, j], qs)) for j in range(X.shape[1])]


def _digitize(X: np.ndarray, edges: list[np.ndarray]) -> np.ndarray:
    codes = np.empty(X.shape, dtype=np.int64)
    for j, e in enumerate(edges):
        codes[:, j] = np.searchsorted(e, X[:, j], side="right")
    return codes


def _node_feature_subsets(
    node_ids: np.ndarray, p: int, mtry: int, seed: int, tag: int
) -> np.ndarray:
    """(n_nodes, mtry) distinct feature indices per node — a hash
    permutation of range(p) keyed on the node's global counter."""
    counters = node_ids[:, None] * np.int64(p) + np.arange(p, dtype=np.int64)
    scores = rng.hash_u64(counters.ravel(), seed, tag).reshape(len(node_ids), p)
    return np.argsort(scores, axis=1, kind="stable")[:, :mtry]


def _grow_tree(
    codes: np.ndarray,
    y: np.ndarray,
    rows: np.ndarray,
    mtry: int,
    max_depth: int,
    min_leaf: int,
    seed: int,
    tree_tag: int,
) -> dict:
    """Breadth-first histogram CART on pre-binned codes. One composite
    ``np.bincount`` per level computes every (node, feature, bin,
    class) count — the whole level splits in ~10 vectorized ops, no
    per-node Python loop (the LightGBM histogram idea, driver-sized)."""
    n_bins = int(codes.max()) + 1 if len(rows) else 1
    p = codes.shape[1]
    feat = [-2]  # -2 = unresolved; -1 = leaf
    thr = [-1]
    left = [-1]
    right = [-1]
    value = [float(y[rows].mean()) if len(rows) else 0.0]
    importance = np.zeros(p)  # Σ gini decrease per split feature
    #   (randomForest's MeanDecreaseGini — the reference trains with
    #   importance=TRUE, standard_n.R:148)
    node_of = np.zeros(len(rows), dtype=np.int64)  # per bootstrap row
    active = np.array([0], dtype=np.int64)
    r_codes = codes[rows]
    r_y = y[rows].astype(np.int64)
    for depth in range(max_depth):
        if not len(active):
            break
        n_slots = len(active)
        # node-id rng keying packs (tree, node) as tree_tag + id·stride;
        # ids must stay under the stride or streams collide across
        # trees. A real raise, not assert: python -O strips asserts and
        # the failure mode is silent rng reuse, not a crash.
        if len(feat) >= _NODE_STRIDE:
            raise ValueError("tree too large for rng keying")
        slot_of = np.full(len(feat), -1, dtype=np.int64)
        slot_of[active] = np.arange(n_slots)
        # node_of == -1 marks retired (leaf) rows; guard it explicitly —
        # slot_of[-1] would wrap to the newest (always-active) child
        live = (node_of >= 0) & (slot_of[node_of] >= 0)
        slot = slot_of[node_of[live]]
        feats = _node_feature_subsets(
            active * _NODE_STRIDE + tree_tag, p, mtry, seed, rng.tag_for("rf.feats")
        )
        # (n_live, mtry) bin codes of each row under its node's features
        cs = r_codes[np.flatnonzero(live)[:, None], feats[slot]]
        key = (
            (slot[:, None] * mtry + np.arange(mtry)) * (n_bins * 2)
            + cs * 2
            + r_y[live][:, None]
        )
        counts = np.bincount(
            key.ravel(), minlength=n_slots * mtry * n_bins * 2
        ).reshape(n_slots, mtry, n_bins, 2)
        cum = counts.cumsum(axis=2)  # left counts for split 'code <= b'
        tot = cum[:, :, -1, :]  # (slots, mtry, 2)
        ln = cum.sum(-1).astype(np.float64)  # left sizes
        lp = cum[..., 1].astype(np.float64)
        tn = tot.sum(-1).astype(np.float64)[:, :, None]
        tp = tot[..., 1].astype(np.float64)[:, :, None]
        rn = tn - ln
        rp = tp - lp
        with np.errstate(divide="ignore", invalid="ignore"):
            cost = (
                ln
                - (lp**2 + (ln - lp) ** 2) / ln
                + rn
                - (rp**2 + (rn - rp) ** 2) / rn
            )
        invalid = (ln < min_leaf) | (rn < min_leaf)
        cost = np.where(invalid | ~np.isfinite(cost), np.inf, cost)
        flat = cost.reshape(n_slots, -1)
        best = flat.argmin(axis=1)  # deterministic first-min tie-break
        best_cost = flat[np.arange(n_slots), best]
        tot_n = tn[:, 0, 0]
        tot_p = tp[:, 0, 0]
        parent_cost = tot_n - (tot_p**2 + (tot_n - tot_p) ** 2) / np.maximum(tot_n, 1)
        split_ok = np.isfinite(best_cost) & (best_cost < parent_cost - 1e-12)
        bf = best // n_bins  # index into the node's mtry subset
        bb = best % n_bins
        # finalize leaves / create children
        new_active = []
        split_feat = np.full(n_slots, -1, dtype=np.int64)
        split_bin = np.full(n_slots, -1, dtype=np.int64)
        for s in range(n_slots):
            nid = int(active[s])
            if not split_ok[s] or depth == max_depth - 1:
                feat[nid] = -1
                value[nid] = float(tot_p[s] / max(tot_n[s], 1.0))
                continue
            f = int(feats[s, bf[s]])
            feat[nid] = f
            thr[nid] = int(bb[s])
            split_feat[s] = f
            split_bin[s] = int(bb[s])
            importance[f] += float(parent_cost[s] - best_cost[s])
            for child in (len(feat), len(feat) + 1):
                new_active.append(child)
            left[nid] = len(feat)
            right[nid] = len(feat) + 1
            frac = float(tot_p[s] / max(tot_n[s], 1.0))
            feat.extend([-2, -2])
            thr.extend([-1, -1])
            left.extend([-1, -1])
            right.extend([-1, -1])
            value.extend([frac, frac])
        # route live rows into children (or retire them into leaves)
        did_split = split_feat[slot] >= 0
        live_idx = np.flatnonzero(live)
        row_codes = r_codes[live_idx, split_feat[slot].clip(0)]
        go_left = row_codes <= split_bin[slot]
        nids = node_of[live_idx]
        child = np.where(
            go_left,
            np.asarray(left, dtype=np.int64)[nids],
            np.asarray(right, dtype=np.int64)[nids],
        )
        node_of[live_idx] = np.where(did_split, child, -1)
        active = np.array(new_active, dtype=np.int64)
    # anything still unresolved (hit the loop end) becomes a leaf
    feat_a = np.asarray(feat, dtype=np.int64)
    feat_a[feat_a == -2] = -1
    return {
        "feat": feat_a,
        "thr": np.asarray(thr, dtype=np.int64),
        "left": np.asarray(left, dtype=np.int64),
        "right": np.asarray(right, dtype=np.int64),
        "value": np.asarray(value, dtype=np.float64),
        "importance": importance,
    }


def _flatten_forest(trees: list[dict]) -> dict:
    offs = np.zeros(len(trees), dtype=np.int64)
    for i in range(1, len(trees)):
        offs[i] = offs[i - 1] + len(trees[i - 1]["feat"])
    return {
        "roots": offs,
        "feat": np.concatenate([t["feat"] for t in trees]),
        "thr": np.concatenate([t["thr"] for t in trees]),
        "left": np.concatenate(
            [t["left"] + o for t, o in zip(trees, offs)]
        ),
        "right": np.concatenate(
            [t["right"] + o for t, o in zip(trees, offs)]
        ),
        "value": np.concatenate([t["value"] for t in trees]),
    }


def _forest_prob(flat: dict, codes: np.ndarray, max_depth: int) -> np.ndarray:
    """Vectorized traversal: every (row, tree) walks one level per
    iteration — max_depth gathers total, no per-row Python."""
    n = len(codes)
    if n == 0:
        return np.zeros(0)
    cur = np.broadcast_to(flat["roots"], (n, len(flat["roots"]))).copy()
    rows = np.arange(n)[:, None]
    for _ in range(max_depth + 1):
        f = flat["feat"][cur]
        inner = f >= 0
        if not inner.any():
            break
        code = codes[rows, np.where(inner, f, 0)]
        nxt = np.where(code <= flat["thr"][cur], flat["left"][cur], flat["right"][cur])
        cur = np.where(inner, nxt, cur)
    return flat["value"][cur].mean(axis=1)


def _oob_accuracy(
    trees: list[dict],
    boot_rows: list[np.ndarray],
    codes: np.ndarray,
    y: np.ndarray,
    max_depth: int,
) -> float:
    """Out-of-bag vote accuracy — caret's CV-accuracy stand-in for the
    mtry grid (Breiman 2001 §3.1)."""
    n = len(y)
    ssum = np.zeros(n)
    scnt = np.zeros(n)
    for t, rows in zip(trees, boot_rows):
        oob = np.ones(n, dtype=bool)
        oob[rows] = False
        if not oob.any():
            continue
        p = _forest_prob(_flatten_forest([t]), codes[oob], max_depth)
        ssum[oob] += p
        scnt[oob] += 1
    seen = scnt > 0
    if not seen.any():
        return 0.0
    pred = (ssum[seen] / scnt[seen]) >= 0.5
    return float((pred == (y[seen] >= 0.5)).mean())


def fit_random_forest(
    vectors_ds,
    cols: "list[str] | None" = None,
    label: str = "match",
    ntree: int = 350,
    mtry: "int | None" = None,
    mtry_grid: "tuple[int, ...] | None" = (3, 5, 7, 9, 11, 13, 15),
    tune_trees: int = 48,
    max_depth: int = 14,
    min_leaf: int = 2,
    driver_max: int = TRAIN_DRIVER_MAX,
    seed: int = 31,
) -> dict:
    """Deterministic histogram random forest over labeled vectors —
    caret ``method='rf', ntree=350, tuneGrid mtry seq(3,15,2),
    preProcess medianImpute`` parity (standard_n.R:141-165).

    Bootstrap rows and per-node feature subsets come from rng counter
    streams keyed (seed, tree, node); the training frame is collected
    in canonical (node_a, node_b) order — the whole fit is a pure
    function of (data, seed). ``mtry_grid`` is selected by OOB
    accuracy with ``tune_trees`` trees per candidate, then the final
    ``ntree`` forest trains at the winner. Pass ``mtry`` to skip
    tuning."""
    cols = list(cols or METRIC_COLUMNS)
    df = collect_training_frame(vectors_ds, cols, label, driver_max, seed)
    X = raw_matrix(df, cols)
    med = np.nan_to_num(np.nanmedian(X, axis=0))
    X = _median_impute(X, med)
    y = _labels01(df, label)
    edges = _bin_edges(X)
    codes = _digitize(X, edges)
    n, p = X.shape

    def build(n_trees: int, m: int, tag: str) -> tuple[list[dict], list[np.ndarray]]:
        trees, boots = [], []
        base = rng.tag_for(tag)
        for t in range(n_trees):
            counters = np.arange(n, dtype=np.int64) + np.int64(t) * _TREE_STRIDE
            rows = rng.randint(counters, n, seed, base)
            trees.append(
                _grow_tree(
                    codes, y, rows, m, max_depth, min_leaf, seed,
                    tree_tag=t * _TREE_STRIDE,
                )
            )
            boots.append(rows)
        return trees, boots

    tune: list[tuple[int, float]] = []
    if mtry is None:
        grid = [m for m in (mtry_grid or ()) if m <= p]
        if not grid:  # grid empty or entirely above p: sqrt(p) fallback
            grid = [max(1, int(np.sqrt(p)))]
        best_acc = -1.0
        mtry = grid[0]
        for m in grid:
            trees, boots = build(tune_trees, m, f"rf.tune.{m}")
            acc = _oob_accuracy(trees, boots, codes, y, max_depth)
            tune.append((m, acc))
            if acc > best_acc + 1e-12:  # ties keep the smaller mtry
                best_acc, mtry = acc, m
    trees, _ = build(ntree, mtry, "rf.final")
    flat = _flatten_forest(trees)
    # MeanDecreaseGini, normalized to sum 1 (caret rf importance=TRUE)
    imp = np.sum([t["importance"] for t in trees], axis=0)
    if imp.sum() > 0:
        imp = imp / imp.sum()
    return {
        "importance": {c: round(float(v), 6) for c, v in zip(cols, imp)},
        "cols": cols,
        "medians": med,
        "edges": edges,
        "max_depth": max_depth,
        "mtry": mtry,
        "ntree": ntree,
        "tune": tune,
        "n_train": n,
        **flat,
    }


class ForestScorer:
    """Actor-side forest scorer: params arrive as one broadcast
    ObjectRef, batches are digitized with the training bin edges and
    walked level-parallel (``predict.PredictStage`` protocol)."""

    def __init__(self, params):
        if isinstance(params, ray.ObjectRef):
            params = ray.get(params)
        self.p = params

    def match_prob(self, batch: pd.DataFrame) -> np.ndarray:
        X = _median_impute(raw_matrix(batch, self.p["cols"]), self.p["medians"])
        codes = _digitize(X, self.p["edges"])
        return _forest_prob(self.p, codes, self.p["max_depth"])


# ----------------------------------------------------------------- svm


def _standardize_fit(X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mean = np.nanmean(X, axis=0)
    std = np.nanstd(X, axis=0, ddof=1)
    std[~np.isfinite(std) | (std == 0)] = 1.0
    return np.nan_to_num(mean), std


def _rff_map(Xs: np.ndarray, W: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.sqrt(2.0 / W.shape[0]) * np.cos(Xs @ W.T + b)


def _fit_sq_hinge(
    Z: np.ndarray, y_pm: np.ndarray, C: float, iters: int, lr: float = 0.5
) -> tuple[np.ndarray, float]:
    """Full-batch primal squared-hinge SVM: λ/2|w|² + mean(max(0,
    1−y·f)²), λ = 1/(C·n) — deterministic, no row-order dependence."""
    n, d = Z.shape
    lam = 1.0 / (C * n)
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        f = Z @ w + b
        m = 1.0 - y_pm * f
        act = m > 0
        g = np.where(act, -2.0 * y_pm * m, 0.0)
        w -= lr * (Z.T @ g / n + lam * w)
        b -= lr * float(g.mean())
    return w, b


def _platt(f: np.ndarray, y: np.ndarray, iters: int = 200, lr: float = 0.5) -> tuple[float, float]:
    """Platt (1999) sigmoid calibration p = σ(a·f + b), full-batch."""
    a, b = 1.0, 0.0
    n = len(f)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(a * f + b)))
        g = p - y
        a -= lr * float(g @ f) / n
        b -= lr * float(g.mean())
    return a, b


def fit_svm_rff(
    vectors_ds,
    cols: "list[str] | None" = None,
    label: str = "match",
    n_features: int = 512,
    sigma_grid: tuple = (0.03546, 0.46773, 0.9),
    c_grid: tuple = (0.1, 0.5, 1.0, 10.0),
    cv_folds: int = 5,
    iters: int = 300,
    kernel: str = "rbf",
    driver_max: int = TRAIN_DRIVER_MAX,
    seed: int = 37,
) -> dict:
    """Deterministic RBF-SVM via random Fourier features — caret
    ``svmRadial`` parity (standard_n.R:167-180: sigma seq(0.03546,
    0.9, length.out=3) × C {0.1, 0.5, 1, 10}, medianImpute, accuracy-
    selected CV; kernlab scales inputs by default, mirrored here).

    RFF (Rahimi & Recht 2007): w ~ N(0, 2σI) approximates
    k(x,y)=exp(−σ|x−y|²); W/b come from rng counter streams so the
    feature map is reproducible anywhere. Model selection is
    deterministic k-fold CV with folds assigned by pair-key hash
    (order-independent); the winning (σ, C) trains on all rows and is
    Platt-calibrated to a probability.

    ``kernel='linear'`` skips the Fourier map and trains the hinge on
    the standardized features directly — caret ``svmLinear`` parity
    (paper_flow_uniform_sample.Rmd:272-284, default C grid)."""
    cols = list(cols or METRIC_COLUMNS)
    df = collect_training_frame(vectors_ds, cols, label, driver_max, seed)
    X = raw_matrix(df, cols)
    med = np.nan_to_num(np.nanmedian(X, axis=0))
    X = _median_impute(X, med)
    mean, std = _standardize_fit(X)
    Xs = (X - mean) / std
    y = _labels01(df, label)
    y_pm = 2.0 * y - 1.0
    n, p = Xs.shape
    fold = (rng.hash_u64(_pair_key(df), seed, rng.tag_for("svm.fold")) % cv_folds).astype(
        np.int64
    )

    def rff_params(sigma: float) -> tuple[np.ndarray, np.ndarray]:
        d = n_features
        counters = np.arange(d * p, dtype=np.int64)
        W = rng.normal(counters, seed, rng.tag_for("svm.W")).reshape(d, p) * np.sqrt(
            2.0 * sigma
        )
        b = rng.uniform(np.arange(d, dtype=np.int64), seed, rng.tag_for("svm.b")) * (
            2.0 * np.pi
        )
        return W, b

    if kernel == "linear":
        sigma_grid = (None,)  # one grid axis: C only

    def feature_map(sigma):
        if sigma is None:
            return None, None, Xs
        W, b_r = rff_params(sigma)
        return W, b_r, _rff_map(Xs, W, b_r)

    cv: list[tuple[float, float, float]] = []
    best = (-1.0, sigma_grid[0], c_grid[0])
    # a single (sigma, C) candidate needs no CV to be "selected" —
    # skipping it saves cv_folds redundant full hinge fits
    run_cv = len(sigma_grid) * len(c_grid) > 1
    for sigma in (sigma_grid if run_cv else ()):
        W, b_r, Z = feature_map(sigma)
        for C in c_grid:
            accs = []
            for k in range(cv_folds):
                tr = fold != k
                te = ~tr
                if not te.any() or len(np.unique(y[tr])) < 2:
                    continue
                w, b = _fit_sq_hinge(Z[tr], y_pm[tr], C, iters)
                accs.append(float(((Z[te] @ w + b >= 0) == (y[te] >= 0.5)).mean()))
            acc = float(np.mean(accs)) if accs else 0.0
            cv.append((sigma, C, acc))
            if acc > best[0] + 1e-12:  # ties keep grid order, like caret
                best = (acc, sigma, C)
    _, sigma, C = best
    W, b_r, Z = feature_map(sigma)
    w, b = _fit_sq_hinge(Z, y_pm, C, iters)
    a_pl, b_pl = _platt(Z @ w + b, y)
    return {
        "kernel": kernel,
        "cols": cols,
        "medians": med,
        "mean": mean,
        "std": std,
        "W": W,
        "b_rff": b_r,
        "w": w,
        "b": b,
        "platt_a": a_pl,
        "platt_b": b_pl,
        "sigma": sigma,
        "C": C,
        "cv": cv,
        "n_train": n,
    }


class RFFSVMScorer:
    """Actor-side RFF-SVM scorer (broadcast params, Platt prob)."""

    def __init__(self, params):
        if isinstance(params, ray.ObjectRef):
            params = ray.get(params)
        self.p = params

    def match_prob(self, batch: pd.DataFrame) -> np.ndarray:
        p = self.p
        X = _median_impute(raw_matrix(batch, p["cols"]), p["medians"])
        Xs = (X - p["mean"]) / p["std"]
        Z = _rff_map(Xs, p["W"], p["b_rff"]) if p["W"] is not None else Xs
        f = Z @ p["w"] + p["b"]
        return 1.0 / (1.0 + np.exp(-(p["platt_a"] * f + p["platt_b"])))


# ----------------------------------------------------------------- mlp


def _he_init(shape: tuple[int, int], seed: int, tag_name: str) -> np.ndarray:
    fan_in = shape[0]
    counters = np.arange(shape[0] * shape[1], dtype=np.int64)
    return (
        rng.normal(counters, seed, rng.tag_for(tag_name)).reshape(shape)
        * np.sqrt(2.0 / fan_in)
    )


def fit_mlp(
    vectors_ds,
    cols: "list[str] | None" = None,
    label: str = "match",
    hidden: tuple[int, int] = (64, 64),
    epochs: int = 300,
    lr: float = 1e-2,
    val_frac: float = 0.2,
    plateau_patience: int = 10,
    plateau_factor: float = 0.8,
    driver_max: int = TRAIN_DRIVER_MAX,
    seed: int = 41,
) -> dict:
    """Deterministic 64→64→1 MLP — keras build_model/build_nn parity
    (utils.R:916-995): standardized inputs (mean/sd with na.rm, then
    missing→0 AFTER scaling, i.e. mean-impute — fill_na_0 semantics),
    relu/relu/sigmoid, binary cross-entropy, 20% validation split,
    best-validation-accuracy weights kept (save_best_only) and
    reduce-LR-on-plateau (factor 0.8, patience 10).

    Differences from keras, all in determinism's favor: full-batch
    Adam instead of minibatch RMSprop (no shuffle order), He init from
    rng counter streams, validation rows chosen by pair-key hash, and
    the BatchNorm/dropout(0.001) layers dropped (see module
    docstring)."""
    cols = list(cols or METRIC_COLUMNS)
    df = collect_training_frame(vectors_ds, cols, label, driver_max, seed)
    X = raw_matrix(df, cols)
    mean, std = _standardize_fit(X)
    Xs = np.nan_to_num((X - mean) / std)  # fill_na_0 after scaling
    y = _labels01(df, label)
    n, p = Xs.shape
    val = (
        rng.uniform(_pair_key(df), seed, rng.tag_for("mlp.val")) < val_frac
    )
    if val.all() or not val.any():
        val = np.zeros(n, dtype=bool)
    h1, h2 = hidden
    W1 = _he_init((p, h1), seed, "mlp.W1")
    b1 = np.zeros(h1)
    W2 = _he_init((h1, h2), seed, "mlp.W2")
    b2 = np.zeros(h2)
    W3 = _he_init((h2, 1), seed, "mlp.W3")
    b3 = np.zeros(1)
    params = [W1, b1, W2, b2, W3, b3]
    m_t = [np.zeros_like(w) for w in params]
    v_t = [np.zeros_like(w) for w in params]
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    Xtr, ytr = Xs[~val], y[~val]
    Xva, yva = Xs[val], y[val]
    best_acc, best_loss, best_params, since = -1.0, np.inf, [w.copy() for w in params], 0
    cur_lr = lr

    def forward(A0, ps):
        w1, c1, w2, c2, w3, c3 = ps
        Z1 = A0 @ w1 + c1
        A1 = np.maximum(Z1, 0)
        Z2 = A1 @ w2 + c2
        A2 = np.maximum(Z2, 0)
        out = 1.0 / (1.0 + np.exp(-(A2 @ w3 + c3)))
        return Z1, A1, Z2, A2, out[:, 0]

    for step in range(1, epochs + 1):
        Z1, A1, Z2, A2, out = forward(Xtr, params)
        g_out = (out - ytr)[:, None] / max(len(ytr), 1)  # BCE + sigmoid
        gW3 = A2.T @ g_out
        gb3 = g_out.sum(0)
        dA2 = (g_out @ params[4].T) * (Z2 > 0)
        gW2 = A1.T @ dA2
        gb2 = dA2.sum(0)
        dA1 = (dA2 @ params[2].T) * (Z1 > 0)
        gW1 = Xtr.T @ dA1
        gb1 = dA1.sum(0)
        grads = [gW1, gb1, gW2, gb2, gW3, gb3]
        for i, g in enumerate(grads):
            m_t[i] = beta1 * m_t[i] + (1 - beta1) * g
            v_t[i] = beta2 * v_t[i] + (1 - beta2) * g * g
            mh = m_t[i] / (1 - beta1**step)
            vh = v_t[i] / (1 - beta2**step)
            params[i] = params[i] - cur_lr * mh / (np.sqrt(vh) + eps)
        if len(yva):
            pv = forward(Xva, params)[4]
            acc = float(((pv >= 0.5) == (yva >= 0.5)).mean())
            loss = float(
                -np.mean(
                    yva * np.log(np.clip(pv, 1e-12, 1))
                    + (1 - yva) * np.log(np.clip(1 - pv, 1e-12, 1))
                )
            )
        else:
            pv = forward(Xtr, params)[4]
            acc = float(((pv >= 0.5) == (ytr >= 0.5)).mean())
            loss = float(np.mean((pv - ytr) ** 2))
        if acc > best_acc + 1e-12 or (acc >= best_acc - 1e-12 and loss < best_loss - 1e-12):
            best_acc, best_loss = max(acc, best_acc), loss
            best_params = [w.copy() for w in params]
            since = 0
        else:
            since += 1
            if since >= plateau_patience:  # reduce_lr_on_plateau
                cur_lr *= plateau_factor
                since = 0
    W1, b1, W2, b2, W3, b3 = best_params
    return {
        "cols": cols,
        "mean": mean,
        "std": std,
        "W1": W1,
        "b1": b1,
        "W2": W2,
        "b2": b2,
        "W3": W3,
        "b3": b3,
        "val_acc": best_acc,
        "n_train": n,
    }


class MLPScorer:
    """Actor-side MLP scorer (broadcast params, keras-parity forward)."""

    def __init__(self, params):
        if isinstance(params, ray.ObjectRef):
            params = ray.get(params)
        self.p = params

    def match_prob(self, batch: pd.DataFrame) -> np.ndarray:
        p = self.p
        X = raw_matrix(batch, p["cols"])
        A0 = np.nan_to_num((X - p["mean"]) / p["std"])
        A1 = np.maximum(A0 @ p["W1"] + p["b1"], 0)
        A2 = np.maximum(A1 @ p["W2"] + p["b2"], 0)
        return (1.0 / (1.0 + np.exp(-(A2 @ p["W3"] + p["b3"]))))[:, 0]


# ----------------------------------------------------- convenience API

def fit_svm_linear(vectors_ds, **kw):
    """caret ``svmLinear`` (paper_flow_uniform_sample.Rmd:272-284):
    the hinge fit on standardized features, default C, no sigma axis."""
    kw.setdefault("c_grid", (1.0,))
    return fit_svm_rff(vectors_ds, kernel="linear", **kw)


_SCORERS = {
    "rf": (fit_random_forest, ForestScorer),
    "svm": (fit_svm_rff, RFFSVMScorer),
    "svm_linear": (fit_svm_linear, RFFSVMScorer),
    "nn": (fit_mlp, MLPScorer),
}


def predict_links_model(vectors_ds, model: str, params: "dict | None" = None, **fit_kw):
    """Fit (if needed) + broadcast + distributed predict for one of
    {'rf', 'svm', 'svm_linear', 'nn'} — the caret-model counterpart of
    ``predict.predict_links_logistic`` and the same scale shape
    (bounded driver fit, broadcast actor-pool scoring)."""
    fit, scorer_cls = _SCORERS[model]
    vectors_ds = vectors_ds.materialize()
    if params is None:
        params = fit(vectors_ds, **fit_kw)
    ref = ray.put(params)
    return predict_links_raw(vectors_ds, scorer_cls, (ref,))


def _fast_kwargs(fast: bool) -> dict[str, dict]:
    kw: dict[str, dict] = {"logistic": {}, "rf": {}, "svm": {}, "svm_linear": {}, "nn": {}}
    if fast:
        kw["rf"] = {"ntree": 96, "mtry": 5}
        # sigma: the reference grid's low end — kernlab's sigest-style
        # scale for ~23 standardized dims (0.47/0.9 collapse the kernel
        # there; the full default grid CV-selects 0.03546 on its own)
        kw["svm"] = {"sigma_grid": (0.03546,), "c_grid": (1.0,), "cv_folds": 3}
        kw["svm_linear"] = {"cv_folds": 3}
        kw["nn"] = {"epochs": 150}
    return kw


def _score_metrics(pred_ds) -> dict:
    from .resolve import auc_score

    df = pred_ds.select_columns(["match", "match_prob", "match_pred"]).to_pandas()
    truth = (df["match"] == "match").to_numpy()
    pred = df["match_pred"].to_numpy().astype(bool)
    tp = int((pred & truth).sum())
    fp = int((pred & ~truth).sum())
    fn = int((~pred & truth).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return {
        "n_pairs": len(df),
        "accuracy": round(float((pred == truth).mean()), 6),
        "auc": round(auc_score(truth, df["match_prob"].to_numpy()), 6),
        "f1": round(2 * prec * rec / max(prec + rec, 1e-12), 6),
    }


def learning_curve(
    vectors_ds,
    model_names: tuple = ("logistic", "rf", "svm", "nn"),
    train_sizes: tuple = (250, 500, 1000),
    test_n: int = 500,
    fast: bool = True,
    seed: int = 133,
) -> pd.DataFrame:
    """Train-size sweep against a FIXED test set — the reference's
    benchmarking grid (standard_n.R:58-99: seed-133 fixed test split,
    train truncated to each size; :92 sweeps 1,000–25,000 step 3,000;
    Rmd:215-292 reports the metric grid per model × size).

    The split rides ``sampling.train_test_split``'s hash-rank
    machinery, so (a) every size's train set is a PREFIX of the next
    (smallest hashes first — the sweep isolates size, not resampling
    noise) and (b) the sweep is deterministic at any parallelism.
    One row per (model, train_n): accuracy / auc / f1 on the shared
    held-out test set."""
    from .predict import LinearScorer, fit_logistic
    from .sampling import fixed_test_splits

    vectors_ds = vectors_ds.materialize()
    kw = _fast_kwargs(fast)
    fits: dict[str, tuple] = {
        "logistic": (fit_logistic, LinearScorer),
        **_SCORERS,
    }
    split = fixed_test_splits(vectors_ds, test_n, train_sizes, seed)
    test = split["test"]
    rows = []
    for train in split["trains"]:
        train = train.materialize()  # one size held at a time
        n_train = train.count()
        for name in model_names:
            fit, scorer_cls = fits[name]
            params = fit(train, **kw[name])
            ref = ray.put(params)
            m = _score_metrics(predict_links_raw(test, scorer_cls, (ref,)))
            rows.append({"model": name, "train_n": n_train, **m})
    return (
        pd.DataFrame(rows)
        .sort_values(["model", "train_n"])
        .reset_index(drop=True)
    )


def model_zoo_report(vectors_ds, fast: bool = False) -> pd.DataFrame:
    """Train the caret-parity models (rf, svmRadial, svmLinear, nn) +
    the logistic baseline on the labeled vectors and score them — one
    row per model with the reference's headline metrics
    (confusionMatrix / AUC, standard_n.R:155-159). ``fast`` shrinks
    the rf/svm grids for benchmark loops."""
    from .predict import predict_links_logistic

    vectors_ds = vectors_ds.materialize()
    kw = _fast_kwargs(fast)
    preds = {"logistic": predict_links_logistic(vectors_ds)}
    for name in ("rf", "svm", "svm_linear", "nn"):
        preds[name] = predict_links_model(vectors_ds, name, **kw[name])
    rows = [{"model": name, **_score_metrics(ds)} for name, ds in preds.items()]
    return pd.DataFrame(rows).sort_values("model").reset_index(drop=True)
