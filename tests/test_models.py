"""Deterministic caret-parity model trainers (rf/svm/nn,
standard_n.R:141-184, utils.R:916-995) over the labeled pair vectors."""

import numpy as np
import pandas as pd
import pytest

from rayrl import pipeline, rng, synth
from rayrl.errors.injector import strip_ledger
from rayrl.linkage.blocking import LinkageConfig
from rayrl.linkage.features import METRIC_COLUMNS, feature_vectors
from rayrl.linkage import models
from rayrl.linkage.models import (
    fit_mlp,
    fit_random_forest,
    fit_svm_rff,
    model_zoo_report,
    predict_links_model,
)

N = 2500


@pytest.fixture(scope="module")
def vectors(ray_session):
    clean = synth.pages_dataset(N, override_num_blocks=2).materialize()
    dirty = strip_ledger(
        pipeline.mess_dataset(clean, pipeline.benchmark_specs(0.10), seed=7).combined
    ).materialize()
    return feature_vectors(clean, dirty, LinkageConfig(num_buckets=16), seed=3).materialize()


def _acc(df: pd.DataFrame) -> float:
    truth = (df["match"] == "match").astype(int)
    return float((df["match_pred"] == truth).mean())


def test_model_zoo_accuracy_gates(vectors):
    """All four models (logistic baseline + rf/svm/nn) separate the
    labeled vectors — the reference's confusionMatrix gate."""
    rep = model_zoo_report(vectors, fast=True)
    assert set(rep["model"]) == {"logistic", "rf", "svm", "svm_linear", "nn"}
    by = rep.set_index("model")
    assert (by["accuracy"] >= 0.97).all(), by.to_dict()
    assert (by["auc"] >= 0.99).all(), by.to_dict()
    assert (by["f1"] >= 0.9).all(), by.to_dict()


def test_rf_fit_deterministic_and_scoring_parallelism_independent(vectors):
    params = fit_random_forest(vectors, ntree=64, mtry=5)
    again = fit_random_forest(vectors.repartition(7), ntree=64, mtry=5)
    # the fit is a pure function of (data, seed) — identical arrays
    for k in ("feat", "thr", "left", "right", "value", "roots", "medians"):
        np.testing.assert_array_equal(params[k], again[k])
    a = predict_links_model(vectors, "rf", params=params).to_pandas()
    b = predict_links_model(vectors.repartition(7), "rf", params=params).to_pandas()
    key = ["node_a", "node_b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    assert _acc(a) >= 0.97


def test_rf_oob_mtry_tuning_selects_from_grid(vectors):
    params = fit_random_forest(
        vectors, ntree=48, mtry_grid=(3, 9), tune_trees=16
    )
    assert params["mtry"] in (3, 9)
    assert [m for m, _ in params["tune"]] == [3, 9]
    assert all(0.0 <= a <= 1.0 for _, a in params["tune"])
    # MeanDecreaseGini (caret importance=TRUE): normalized, and the
    # name-edit metrics — the strongest linkage signal — rank high
    imp = params["importance"]
    assert abs(sum(imp.values()) - 1.0) < 1e-6
    top8 = sorted(imp, key=imp.get, reverse=True)[:8]
    assert {"metric_fname_dl", "metric_lname_dl", "metric_fname_jw", "metric_lname_jw"} & set(top8)


def test_svm_cv_grid_and_platt_probability(vectors):
    params = fit_svm_rff(
        vectors, sigma_grid=(0.03546, 0.9), c_grid=(0.5, 10.0), cv_folds=3
    )
    assert params["sigma"] in (0.03546, 0.9) and params["C"] in (0.5, 10.0)
    assert len(params["cv"]) == 4  # full grid evaluated
    got = predict_links_model(vectors, "svm", params=params).to_pandas()
    assert _acc(got) >= 0.97
    assert got["match_prob"].between(0, 1).all()


def test_mlp_best_val_checkpoint_and_accuracy(vectors):
    params = fit_mlp(vectors, epochs=150)
    assert params["val_acc"] >= 0.95
    got = predict_links_model(vectors, "nn", params=params).to_pandas()
    assert _acc(got) >= 0.97
    again = fit_mlp(vectors.repartition(5), epochs=150)
    np.testing.assert_array_equal(params["W1"], again["W1"])
    np.testing.assert_array_equal(params["W3"], again["W3"])


def test_median_impute_handles_nan_batches(vectors):
    """Scoring a batch with NaN metrics must stay finite (caret
    medianImpute / na.pass parity)."""
    params = fit_random_forest(vectors, ntree=32, mtry=5)
    df = vectors.to_pandas().head(64).copy()
    df.loc[df.index[::3], METRIC_COLUMNS[0]] = np.nan
    df.loc[df.index[::5], METRIC_COLUMNS[7]] = np.nan
    for cls, fit in (
        (models.ForestScorer, params),
        (models.RFFSVMScorer, fit_svm_rff(vectors, sigma_grid=(0.5,), c_grid=(1.0,), cv_folds=2)),
        (models.MLPScorer, fit_mlp(vectors, epochs=30)),
    ):
        prob = cls(fit).match_prob(df)
        assert np.isfinite(prob).all()
        assert ((prob >= 0) & (prob <= 1)).all()


def test_learning_curve_fixed_test_and_nested_prefix(vectors):
    """standard_n.R sweep parity: one row per (model, train_n), shared
    fixed test set, train sets nested by hash-prefix construction."""
    from rayrl.linkage.models import learning_curve
    from rayrl.linkage.sampling import train_test_split

    rep = learning_curve(
        vectors, model_names=("logistic", "rf"), train_sizes=(200, 600),
        test_n=300, fast=True,
    )
    assert len(rep) == 4  # 2 models × 2 sizes
    assert set(rep["model"]) == {"logistic", "rf"}
    assert sorted(rep["train_n"].unique()) == [200, 600]
    assert (rep["n_pairs"] == rep["n_pairs"].iloc[0]).all()  # fixed test
    assert (rep["accuracy"] >= 0.9).all(), rep.to_dict()
    # nested prefixes: the 200-row train set ⊂ the 800-row train set
    key = ["node_a", "node_b"]
    small = train_test_split(vectors, test_n=300, train_n=200)["train"].to_pandas()
    big = train_test_split(vectors, test_n=300, train_n=600)["train"].to_pandas()
    s = set(map(tuple, small[key].to_numpy()))
    b = set(map(tuple, big[key].to_numpy()))
    assert s <= b and len(s) == 200 and len(b) == 600


def test_fits_survive_single_class_training(ray_session):
    """Degenerate labeled set (zero matches — e.g. a pathological
    blocking run): every trainer must fit without error and emit
    finite probabilities ≤ 0.5-ish (no crash, no NaN)."""
    import ray

    n = 300
    ids = np.arange(n)
    df = pd.DataFrame({"node_a": ids, "node_b": ids + 10_000, "match": "unmatch"})
    for j, c in enumerate(METRIC_COLUMNS):
        df[c] = rng.uniform(ids, 9, rng.tag_for(c)) - 0.5
    ds = ray.data.from_pandas(df)
    for name, kw in (
        ("rf", {"ntree": 16, "mtry": 5}),
        ("svm", {"sigma_grid": (0.05,), "c_grid": (1.0,), "cv_folds": 2}),
        ("nn", {"epochs": 20}),
    ):
        got = predict_links_model(ds, name, **kw).to_pandas()
        assert np.isfinite(got["match_prob"]).all(), name
        assert (got["match_pred"] == 0).all(), name


def test_histogram_cart_learns_nonlinear_split():
    """Unit-level: the forest separates an interaction (XOR) no linear
    model can — proof the tree growth is real, not a thresholded
    linear rule."""
    n = 1200
    ids = np.arange(n, dtype=np.int64)
    x1 = rng.uniform(ids, 1, rng.tag_for("xor.a")) - 0.5
    x2 = rng.uniform(ids, 1, rng.tag_for("xor.b")) - 0.5
    y = ((x1 > 0) ^ (x2 > 0)).astype(np.float64)
    X = np.column_stack([x1, x2])
    edges = models._bin_edges(X)
    codes = models._digitize(X, edges)
    trees = [
        models._grow_tree(
            codes, y,
            rng.randint(ids + np.int64(t) * models._TREE_STRIDE, n, 3, rng.tag_for("xor.boot")),
            mtry=2, max_depth=8, min_leaf=2, seed=3, tree_tag=t * models._TREE_STRIDE,
        )
        for t in range(24)
    ]
    prob = models._forest_prob(models._flatten_forest(trees), codes, 8)
    assert (((prob >= 0.5) == (y >= 0.5)).mean()) >= 0.97
