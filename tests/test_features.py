"""Feature-vector + labeled-pair product tests (the reference's ML
deliverables: generate_pairs, add_feature_vector — utils.R:502-645,
189-311) plus the string-metric kernels behind them."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from rayrl import pipeline, synth
from rayrl.errors.injector import strip_ledger
from rayrl.linkage.blocking import LinkageConfig
from rayrl.linkage.features import (
    HAMMING_FIELDS,
    METRIC_COLUMNS,
    extract_major_token,
    feature_vectors,
    hamming_fields,
    hydrate_pairs,
    labeled_pairs,
    pair_fields,
    pairs_to_vectors,
    token_freq_z,
    vectors_to_pairs,
)
from rayrl.linkage.stringsim import damerau_levenshtein, soundex, soundex_dist

N = 2500


# ---------------------------------------------------- string kernels

def test_damerau_levenshtein_known_values():
    assert damerau_levenshtein("", "abc") == 3
    assert damerau_levenshtein("abc", "abc") == 0
    assert damerau_levenshtein("ab", "ba") == 1  # adjacent transposition
    # FULL dl (transposition with intervening edit) vs restricted OSA:
    assert damerau_levenshtein("CA", "ABC") == 2  # OSA would give 3
    assert damerau_levenshtein("kitten", "sitting") == 3
    assert damerau_levenshtein("abcdef", "abcfed") == 2


def test_soundex_known_codes():
    # classic reference vectors
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"  # h transparent
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"
    assert soundex("Honeyman") == "H555"
    assert soundex_dist("Robert", "Rupert") == 0.0
    assert soundex_dist("Robert", "Smith") == 1.0
    assert soundex("") == ""


def test_extract_major_token():
    assert extract_major_token(["hello world", "ab cdefg hi", "ab", ""]) == [
        "hello",  # first token ≥ 3 chars
        "cdefg",  # first too short → longest
        "ab",
        "",
    ]


# ------------------------------------------------------- pair fields

@pytest.fixture(scope="module")
def corpus(ray_session):
    clean = synth.pages_dataset(N, override_num_blocks=2).materialize()
    dirty = strip_ledger(
        pipeline.mess_dataset(clean, pipeline.benchmark_specs(0.10), seed=7).combined
    ).materialize()
    return clean, dirty


def test_pair_fields_shape(corpus):
    clean, _ = corpus
    f = pair_fields(clean, 0).to_pandas()
    assert len(f) == N
    assert (f["node"] % 2 == 0).all()
    assert (f["year"] >= 2010).all() and (f["year"] <= 2016).all()
    assert (f["fname"].str.len() > 0).all()
    # date string round-trips the date parts
    parts = f["date_s"].str.split("-", expand=True).astype(int)
    assert (parts[0] == f["year"]).all() and (parts[2] == f["day"]).all()


def test_token_freq_z_matches_weighted_scale(corpus):
    clean, _ = corpus
    f = pair_fields(clean, 0)
    zmap = token_freq_z(f, "fname")
    fdf = f.to_pandas()
    counts = fdf["fname"].value_counts()
    x = fdf["fname"].map(counts).to_numpy(dtype=float)  # row-level count vector
    expect_mean, expect_sd = x.mean(), x.std(ddof=1)
    got = fdf["fname"].map(zmap).to_numpy()
    np.testing.assert_allclose(got, (x - expect_mean) / expect_sd, atol=1e-5)


# -------------------------------------------- labeled pairs + vectors

@pytest.fixture(scope="module")
def labeled(corpus):
    clean, dirty = corpus
    return labeled_pairs(clean, dirty, LinkageConfig(num_buckets=16), seed=3)


def test_labeled_pairs_negative_ratio(labeled):
    df = labeled["labeled"].to_pandas()
    n_pos = int((df["match"] == "match").sum())
    n_neg = int((df["match"] == "unmatch").sum())
    assert n_pos > 0
    assert labeled["n_matches"] == n_pos
    # negatives = 4× matches when candidates suffice, fewer otherwise
    assert n_neg <= 4 * n_pos
    assert n_neg >= 2 * n_pos, (n_neg, n_pos)
    # positives are truth matches, negatives are not
    assert (df.loc[df["match"] == "match", "truth_a"] == df.loc[df["match"] == "match", "truth_b"]).all()
    assert (df.loc[df["match"] == "unmatch", "truth_a"] != df.loc[df["match"] == "unmatch", "truth_b"]).all()


def test_labeled_pairs_negatives_are_hard(labeled):
    """Negatives must be picked by criteria desc — every kept negative's
    thresh_criteria ≥ every dropped candidate's would require the full
    set; check the cheap proxy: mean criteria of kept negatives > 0."""
    df = labeled["labeled"].to_pandas()
    neg = df[df["match"] == "unmatch"]
    assert neg["thresh_criteria"].mean() > 0.2


def test_feature_vectors_width_and_determinism(corpus):
    clean, dirty = corpus
    fv = feature_vectors(clean, dirty, LinkageConfig(num_buckets=16), seed=3).to_pandas()
    metric_cols = [c for c in fv.columns if c.startswith("metric_")]
    assert sorted(metric_cols) == sorted(METRIC_COLUMNS)
    assert len(METRIC_COLUMNS) == 23
    assert set(fv["match"]) == {"match", "unmatch"}
    # per-metric sanity
    assert (fv["metric_fname_jw"] >= 0).all() and (fv["metric_fname_jw"] <= 1).all()
    assert (fv["metric_fname_soundex"].isin([0.0, 1.0])).all()
    pos = fv[fv["match"] == "match"]
    neg = fv[fv["match"] == "unmatch"]
    # matches must look closer than hard negatives on the name metrics
    assert pos["metric_fname_dl"].mean() < neg["metric_fname_dl"].mean()
    # determinism across runs
    fv2 = feature_vectors(clean, dirty, LinkageConfig(num_buckets=16), seed=3).to_pandas()
    a = fv.sort_values(["node_a", "node_b"]).reset_index(drop=True)
    b = fv2.sort_values(["node_a", "node_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_hamming_fields_weighted(labeled):
    hp = labeled["labeled"]
    out = hamming_fields(hp, weights=[2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]).to_pandas()
    assert {"node_a", "node_b", "hamming_score"} <= set(out.columns)
    assert (out["hamming_score"] >= 0).all()
    assert (out["hamming_score"] <= 9.0).all()  # Σ weights = 9
    df = hp.to_pandas()
    row = df.iloc[0]
    expect = 2.0 * (row["fname_a"] == row["fname_b"]) + sum(
        float(row[f"{f}_a"] == row[f"{f}_b"]) for f in HAMMING_FIELDS[1:]
    )
    got = out[(out["node_a"] == row["node_a"]) & (out["node_b"] == row["node_b"])]["hamming_score"].iloc[0]
    assert got == pytest.approx(expect)


def test_pair_pivots_roundtrip(labeled):
    wide = labeled["labeled"].limit(50)
    long = vectors_to_pairs(wide)
    ldf = long.to_pandas()
    assert set(ldf["side"]) == {0, 1}
    assert len(ldf) == 100
    back = pairs_to_vectors(long, num_buckets=4).to_pandas()
    assert len(back) == 50
    wdf = wide.to_pandas()
    key = ["pair_na", "pair_nb"]
    merged = back.sort_values(key).reset_index(drop=True)
    # fields survive the round trip (column subset: fname both sides)
    orig = wdf.sort_values(["node_a", "node_b"]).reset_index(drop=True)
    assert (merged["pair_na"].to_numpy() == orig["node_a"].to_numpy()).all()
    assert (merged["fname_a"].to_numpy() == orig["fname_a"].to_numpy()).all()
    assert (merged["lname_b"].to_numpy() == orig["lname_b"].to_numpy()).all()


def test_pair_pivots_high_bit_node_ids(ray_session):
    """Node ids with DUP/TWIN offset bits (60-61) must survive the
    pivot exactly — the former (node_a<<31)+node_b packing wrapped for
    these (ADVICE r2)."""
    import ray.data

    hi = 1 << 60
    wide = pd.DataFrame(
        {
            "node_a": [hi + 2, hi + 2, 4],
            "node_b": [hi + 3, 5, hi + 3],
            "fname_a": ["ann", "amy", "al"],
            "fname_b": ["bob", "ben", "bea"],
        }
    )
    back = pairs_to_vectors(vectors_to_pairs(ray.data.from_pandas(wide))).to_pandas()
    assert len(back) == 3
    merged = back.sort_values(["pair_na", "pair_nb"]).reset_index(drop=True)
    orig = wide.sort_values(["node_a", "node_b"]).reset_index(drop=True)
    assert (merged["pair_na"].to_numpy() == orig["node_a"].to_numpy()).all()
    assert (merged["pair_nb"].to_numpy() == orig["node_b"].to_numpy()).all()
    assert (merged["fname_a"].to_numpy() == orig["fname_a"].to_numpy()).all()
    assert (merged["fname_b"].to_numpy() == orig["fname_b"].to_numpy()).all()
