"""Pluggable pair-scoring — ``predict_links_raw`` parity.

The reference scores feature-vector pair rows with a trained caret
model and augments them with (match_prob, conf, match_pred)
(/root/reference/benchmarking/utils.R:352-366: conf = |p − .5|·2,
match_pred = p ≥ .5, preds left-joined back onto the vectors). Here
the model is a pluggable :class:`Scorer`: any object with a
``match_prob(batch: pd.DataFrame) -> np.ndarray`` method, constructed
ONCE per actor inside the ``map_batches`` pool (weights arrive as
``ray.put`` ObjectRefs and are fetched zero-copy in ``__init__``).

Instances provided:

- :class:`LinearScorer` — logistic model over the 23 ``metric_*``
  columns; weights come from :func:`fit_logistic` (deterministic
  full-batch gradient descent on the labeled vectors — the rf/svm/nn
  training of the reference is out of scope per SURVEY §2.3, but this
  proves the plug point with a real trained model).
- :class:`RuleScorer` — hand-set monotone rule over the same columns
  (no training), the drop-in default.
- ``scoring.BroadcastScorer`` also satisfies the protocol (its
  ``match_prob`` maps signature est-Jaccard to a calibrated prob) so
  the production signature path can ride the same ``PredictStage``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from .features import METRIC_COLUMNS


def feature_matrix(batch: pd.DataFrame, cols: list[str]) -> np.ndarray:
    """(n, len(cols)) float64 design matrix from metric columns (bools
    cast; NaN → 0, the reference's na.action=na.pass analogue)."""
    X = np.column_stack(
        [batch[c].to_numpy().astype(np.float64, copy=False) for c in cols]
    )
    return np.nan_to_num(X, copy=False)


class LinearScorer:
    """Logistic scorer: p = sigmoid((x − μ)/σ · w + b) over ``cols``.

    ``params`` is the dict :func:`fit_logistic` returns, or an
    ObjectRef of it (resolved here, once per actor)."""

    def __init__(self, params):
        if isinstance(params, ray.ObjectRef):
            params = ray.get(params)
        self.cols = list(params["cols"])
        self.mean = np.asarray(params["mean"], dtype=np.float64)
        self.std = np.asarray(params["std"], dtype=np.float64)
        self.w = np.asarray(params["w"], dtype=np.float64)
        self.b = float(params["b"])

    def match_prob(self, batch: pd.DataFrame) -> np.ndarray:
        X = (feature_matrix(batch, self.cols) - self.mean) / self.std
        z = X @ self.w + self.b
        return 1.0 / (1.0 + np.exp(-z))


class RuleScorer:
    """Untrained monotone rule over the name/date metrics — the
    hand-set fallback when no labeled vectors exist. Lower edit/JW
    distance and matching soundex ⇒ higher prob; the constants put an
    all-agree pair at ~0.98 and an all-disagree pair at ~0.02."""

    def __init__(self):
        pass

    def match_prob(self, batch: pd.DataFrame) -> np.ndarray:
        fdl = batch["metric_fname_dl"].to_numpy().astype(np.float64)
        ldl = batch["metric_lname_dl"].to_numpy().astype(np.float64)
        fjw = batch["metric_fname_jw"].to_numpy().astype(np.float64)
        ljw = batch["metric_lname_jw"].to_numpy().astype(np.float64)
        fsx = batch["metric_fname_soundex"].to_numpy().astype(np.float64)
        lsx = batch["metric_lname_soundex"].to_numpy().astype(np.float64)
        ts = batch["metric_ts_dist"].to_numpy().astype(np.float64)
        z = (
            4.0
            - 1.2 * np.minimum(fdl, 3)
            - 1.2 * np.minimum(ldl, 3)
            - 3.0 * fjw
            - 3.0 * ljw
            - 0.8 * fsx
            - 0.8 * lsx
            - 0.4 * np.minimum(ts, 4)
        )
        return 1.0 / (1.0 + np.exp(-z))


# driver-side training-set cap: the labeled sample is bounded by design
# ((1+neg_ratio)·|matches|), but guard direct calls on huge inputs
TRAIN_DRIVER_MAX = 2_000_000


def collect_training_frame(
    vectors_ds,
    cols: list[str],
    label: str = "match",
    driver_max: int = TRAIN_DRIVER_MAX,
    seed: int = 23,
) -> pd.DataFrame:
    """Gated, order-independent training collect shared by every
    trainer (logistic here; rf/svm/nn in ``models.py``).

    Above ``driver_max`` rows a deterministic hash sample (rng counter
    stream keyed on the pair ids — order-independent) thins the set;
    the result is sorted by (node_a, node_b) so downstream full-batch
    fits see one canonical row order at any parallelism. The reference
    itself trains caret models driver-side on a ≤27k-row sample
    (standard_n.R:58-99) — the bound is the parity, not a shortcut."""
    from .. import rng

    narrow = vectors_ds.select_columns(["node_a", "node_b", label, *cols])
    n_rows = narrow.count()
    if n_rows > driver_max:
        p = driver_max / n_rows
        cut = np.uint64(int(p * 2**64))

        def gate(batch: pd.DataFrame) -> pd.DataFrame:
            h = rng.hash_u64(
                batch["node_a"].to_numpy() * 2654435761 + batch["node_b"].to_numpy(),
                seed,
                rng.tag_for("fit_logistic.gate"),
            )
            return batch[h < cut]

        narrow = narrow.map_batches(gate, batch_format="pandas")
    return narrow.to_pandas().sort_values(["node_a", "node_b"]).reset_index(drop=True)


def fit_logistic(
    vectors_ds,
    cols: "list[str] | None" = None,
    label: str = "match",
    iters: int = 200,
    lr: float = 0.3,
    l2: float = 1e-3,
    driver_max: int = TRAIN_DRIVER_MAX,
    seed: int = 23,
) -> dict:
    """Deterministic logistic fit over labeled feature vectors →
    params dict for :class:`LinearScorer`.

    Full-batch gradient descent in float64 — no data-order dependence,
    so the fit is identical at any parallelism (the repo's determinism
    rule). The collect is gated via :func:`collect_training_frame`."""
    cols = list(cols or METRIC_COLUMNS)
    df = collect_training_frame(vectors_ds, cols, label, driver_max, seed)
    y = (df[label].to_numpy() == "match").astype(np.float64)
    X = feature_matrix(df, cols)
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    std[std == 0] = 1.0
    Xs = (X - mean) / std
    n = len(y)
    w = np.zeros(len(cols))
    b = float(np.log(max(y.mean(), 1e-6) / max(1 - y.mean(), 1e-6)))
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        g = p - y
        w -= lr * (Xs.T @ g / n + l2 * w)
        b -= lr * float(g.mean())
    return {"cols": cols, "mean": mean, "std": std, "w": w, "b": b, "n_train": n}


class PredictStage:
    """Actor stage: construct the scorer once (``__init__``), augment
    each batch with (match_prob, conf, match_pred) per utils.R:352-366.
    All input columns ride through — the reference's left_join back
    onto df_pair_vector."""

    def __init__(self, scorer_cls, scorer_args=()):
        self.scorer = scorer_cls(*scorer_args)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        if len(batch):
            p = np.clip(self.scorer.match_prob(batch), 0.0, 1.0)
        else:
            p = np.zeros(0)
        out["match_prob"] = np.round(p, 6)
        out["conf"] = np.round(np.abs(p - 0.5) * 2.0, 6)
        out["match_pred"] = (p >= 0.5).astype(np.int64)
        return out


def predict_links_raw(vectors_ds, scorer_cls, scorer_args=(), concurrency=(1, 8)):
    """Feature-vector Dataset → same rows + (match_prob, conf,
    match_pred). ``scorer_args`` may carry ObjectRefs (broadcast
    weights) — they are resolved once per actor, never per batch."""
    return vectors_ds.map_batches(
        PredictStage,
        fn_constructor_args=(scorer_cls, scorer_args),
        batch_format="pandas",
        batch_size=65536,
        concurrency=concurrency,
    )


def predict_links_logistic(vectors_ds, params: "dict | None" = None, **fit_kw):
    """Convenience: fit (if needed) + broadcast + predict. The vector
    Dataset is materialized ONCE up front — fit (count + collect) and
    predict would otherwise each re-execute the whole upstream
    feature pipeline (measured: 94 s → 38 s at the sf0.01 fixture);
    the labeled product is bounded by (1+neg_ratio)·|matches| by
    construction, so the materialization is small."""
    vectors_ds = vectors_ds.materialize()
    if params is None:
        params = fit_logistic(vectors_ds, **fit_kw)
    ref = ray.put(params)
    return predict_links_raw(vectors_ds, LinearScorer, (ref,))
