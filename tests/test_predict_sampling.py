"""Pluggable scorer (predict_links_raw, utils.R:352-366) + stratified
train/test sampling (sample_strat, paper_flow_dob_latest.Rmd:161-172;
fixed-test split, standard_n.R:58-99)."""

import numpy as np
import pandas as pd
import pytest

from rayrl import pipeline, synth
from rayrl.errors.injector import strip_ledger
from rayrl.linkage.blocking import LinkageConfig
from rayrl.linkage.features import METRIC_COLUMNS, feature_vectors
from rayrl.linkage.predict import (
    LinearScorer,
    RuleScorer,
    fit_logistic,
    predict_links_logistic,
    predict_links_raw,
)
from rayrl.linkage.sampling import sample_strat, train_test_split

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


def test_predict_links_logistic_columns_and_accuracy(vectors):
    got = predict_links_logistic(vectors).to_pandas()
    assert {"match_prob", "conf", "match_pred"} <= set(got.columns)
    # all input columns ride through (the reference's left_join)
    assert {"node_a", "node_b", "match", *METRIC_COLUMNS} <= set(got.columns)
    # conf and pred are pure functions of prob (utils.R:361-363)
    np.testing.assert_allclose(
        got["conf"], np.round(np.abs(got["match_prob"] - 0.5) * 2, 6), atol=2e-6
    )
    assert (got["match_pred"] == (got["match_prob"] >= 0.5).astype(int)).all()
    # a trained logistic over the 23 metrics separates the labeled set
    assert _acc(got) >= 0.97


def test_swapping_scorers_changes_probs_not_the_gate(vectors):
    params = fit_logistic(vectors)
    trained = predict_links_raw(vectors, LinearScorer, (params,)).to_pandas()
    rule = predict_links_raw(vectors, RuleScorer).to_pandas()
    key = ["node_a", "node_b"]
    t = trained.sort_values(key).reset_index(drop=True)
    r = rule.sort_values(key).reset_index(drop=True)
    # same pairs, different probabilities — the plug point is real
    assert (t[key] == r[key]).all().all()
    assert not np.allclose(t["match_prob"], r["match_prob"])
    # but both clear the accuracy gate
    assert _acc(t) >= 0.97
    assert _acc(r) >= 0.90


def test_predict_deterministic_across_parallelism(vectors):
    params = fit_logistic(vectors)
    a = predict_links_raw(vectors, LinearScorer, (params,)).to_pandas()
    b = predict_links_raw(
        vectors.repartition(7), LinearScorer, (params,)
    ).to_pandas()
    key = ["node_a", "node_b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_fit_logistic_gate_determinism(vectors):
    """The training-collect hash gate must be order-independent."""
    full = fit_logistic(vectors)
    gated = fit_logistic(vectors.repartition(5), driver_max=max(1, full["n_train"] // 2))
    assert gated["n_train"] < full["n_train"]
    regated = fit_logistic(vectors, driver_max=max(1, full["n_train"] // 2))
    np.testing.assert_allclose(gated["w"], regated["w"])


# ------------------------------------------------------------ sampling


def test_sample_strat_counts_and_partition(vectors):
    n_all = vectors.count()
    res = sample_strat(vectors, n=400, match_frac=0.2)
    train = res["train"].to_pandas()
    test = res["test"].to_pandas()
    assert len(train) == 400
    assert (train["match"] == "match").sum() == 80
    assert (train["match"] == "unmatch").sum() == 320
    assert len(train) + len(test) == n_all
    # disjoint on pair key
    key = set(map(tuple, train[["node_a", "node_b"]].to_numpy()))
    assert not key & set(map(tuple, test[["node_a", "node_b"]].to_numpy()))


def test_sample_strat_deterministic_across_parallelism(vectors):
    a = sample_strat(vectors, n=300)["train"].to_pandas()
    b = sample_strat(vectors.repartition(9), n=300)["train"].to_pandas()
    key = ["node_a", "node_b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_sample_strat_small_stratum_takes_all(vectors):
    """Targets above the stratum size must clamp, not fail."""
    n_match = vectors.to_pandas()["match"].eq("match").sum()
    res = sample_strat(vectors, n=int(n_match) * 10, match_frac=0.5)
    train = res["train"].to_pandas()
    assert (train["match"] == "match").sum() == n_match


def test_train_test_split_counts_and_truncation(vectors):
    n_all = vectors.count()
    res = train_test_split(vectors, test_n=150)
    assert res["test"].count() == 150
    assert res["train"].count() == n_all - 150
    trunc = train_test_split(vectors, test_n=150, train_n=200)
    test_df = trunc["test"].to_pandas()
    train_df = trunc["train"].to_pandas()
    assert len(test_df) == 150
    assert len(train_df) == 200
    key = set(map(tuple, test_df[["node_a", "node_b"]].to_numpy()))
    assert not key & set(map(tuple, train_df[["node_a", "node_b"]].to_numpy()))
    assert "_all" not in test_df.columns
