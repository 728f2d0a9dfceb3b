"""Round-3 second-batch operators: PII scan, repetition filters,
per-source caps, decontamination — the semantics the sf-fixture
oracles can't exercise (planted PII, planted contamination, combiner
equivalence across block layouts, scale-path equivalence)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from rayrl.decontam import contaminated_docs
from rayrl.stats import CAP_K, SAMPLE_MOD, SAMPLE_MUL, SAMPLE_PRIME, cap_per_group
from rayrl.text import PiiScanner, RepetitionScorer

SF_DIR = "/root/testdata/sf0.01"


# ------------------------------------------------------------- PII

def test_pii_scanner_planted():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "mail me at jo.doe+x@ex-ample.co.uk or admin@host.org now",
                    "server 10.0.255.3 and 192.168.1.12 both up",
                    "call 555-123-4567 or 555.987.6543",
                    "clean text, no identifiers here",
                ],
                pa.string(),
            ),
        }
    )
    out = PiiScanner()(batch).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_email"] == 2 and out.loc[1, "n_ipv4"] == 0
    assert out.loc[2, "n_ipv4"] == 2 and out.loc[2, "n_phone"] == 0
    assert out.loc[3, "n_phone"] == 2
    assert (out.loc[4, ["n_email", "n_ipv4", "n_phone"]] == 0).all()
    assert out.loc[1, "text_redacted"] == "mail me at [EMAIL] or [EMAIL] now"
    assert out.loc[2, "text_redacted"] == "server [IPV4] and [IPV4] both up"
    assert out.loc[3, "text_redacted"] == "call [PHONE] or [PHONE]"
    assert out.loc[4, "text_redacted"] == "clean text, no identifiers here"


def test_pii_scanner_ip_claims_dotted_quads_before_phone():
    # 4-octet dotted quad must be tagged IPV4, not partially eaten by
    # the phone pattern (redaction order: email -> ipv4 -> phone)
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["quad 123.456.789.012 stays one token"], pa.string()),
        }
    )
    out = PiiScanner()(batch).to_pandas()
    assert out.loc[0, "text_redacted"] == "quad [IPV4] stays one token"


# ------------------------------------------------------ repetition

def test_repetition_scorer_planted():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "spam line\nspam line\nspam line\nreal line",
                    "aa aa aa aa bb",  # top word 4/5, dup words 1 - 2/5
                    "",
                ],
                pa.string(),
            ),
        }
    )
    out = RepetitionScorer()(batch).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_lines"] == 4 and out.loc[1, "n_uniq_lines"] == 2
    assert out.loc[1, "dup_line_frac"] == pytest.approx(0.5)
    assert out.loc[2, "top_word_frac"] == pytest.approx(0.8)
    assert out.loc[2, "dup_word_frac"] == pytest.approx(1 - 2 / 5)
    assert out.loc[3, "n_toks"] == 0 and out.loc[3, "dup_line_frac"] == 0.0


# -------------------------------------------------- per-source cap

def test_cap_per_group_matches_global_ranking_any_layout(ray_session):
    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64) * 13 + 7,
            "source": [f"s{int(x)}" for x in rng.integers(0, 37, n)],
        }
    )
    hr = (df["doc_id"].to_numpy() % SAMPLE_MOD) * SAMPLE_MUL % SAMPLE_PRIME
    ref = df.assign(hrank=hr).sort_values(["source", "hrank", "doc_id"])
    rank = ref.groupby("source", sort=False).cumcount()
    ref = ref[rank < CAP_K].assign(rk=(rank[rank < CAP_K] + 1)).drop(columns="hrank")
    ref = ref.sort_values(["source", "rk"]).reset_index(drop=True)

    for nblocks in (1, 16):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = (
            cap_per_group(ds)
            .to_pandas()
            .sort_values(["source", "rk"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "source", "rk"]], ref[["doc_id", "source", "rk"]],
            check_dtype=False,
        )


# -------------------------------------------------- decontamination

def test_contaminated_docs_paths_agree(ray_session):
    broad = contaminated_docs(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    joined = (
        contaminated_docs(SF_DIR, broadcast_gate=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(broad) > 0  # the fixture plants real 8-gram overlap
    pd.testing.assert_frame_equal(broad, joined, check_dtype=False)


def test_segment_revenue_paths_agree(ray_session):
    from rayrl.relational import segment_revenue_3way

    broad = segment_revenue_3way(SF_DIR).sort_values("c_mktsegment").reset_index(drop=True)
    joined = (
        segment_revenue_3way(SF_DIR, broadcast_gate=0)
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    assert len(broad) == 5
    pd.testing.assert_frame_equal(broad, joined, check_dtype=False)


def test_customer_order_stats_paths_agree(ray_session):
    from rayrl.relational import customer_order_stats

    broad = customer_order_stats(SF_DIR).to_pandas().sort_values("c_custkey").reset_index(drop=True)
    joined = (
        customer_order_stats(SF_DIR, broadcast_gate=0)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    assert len(broad) > 0
    pd.testing.assert_frame_equal(broad, joined, check_dtype=False)


def test_fused_scorer_matches_individual_stages(ray_session):
    from rayrl.text import (
        FusedDocScorer,
        LangId,
        PiiScanner,
        QualityScorer,
        RepetitionScorer,
    )

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the quick brown fox and the lazy dog in the sun",
                    "mail admin@host.org from 10.0.0.1\nsame line\nsame line",
                    "",
                ],
                pa.string(),
            ),
        }
    )
    fused = FusedDocScorer(redact=True)(batch).to_pandas()
    assert fused["lang_pred"].tolist() == LangId()(batch).to_pandas()["lang_pred"].tolist()
    q = QualityScorer()(batch).to_pandas()
    for c in ("quality", "stop_ratio", "repetition"):
        assert fused[c].tolist() == q[c].tolist()
    r = RepetitionScorer()(batch).to_pandas()
    for c in ("dup_line_frac", "top_word_frac", "dup_word_frac"):
        assert fused[c].tolist() == r[c].tolist()
    p = PiiScanner()(batch).to_pandas()
    for c in ("n_email", "n_ipv4", "n_phone", "text_redacted"):
        assert fused[c].tolist() == p[c].tolist()


def test_score_corpus_stage_resumes(ray_session, tmp_path):
    import ray.data as rd

    from rayrl.checkpoint import Run
    from rayrl.text import score_corpus_ds

    out = str(tmp_path / "score_run")
    params = {"sf_dir": SF_DIR, "redact": False}

    def build():
        return score_corpus_ds(
            rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        )

    run = Run(out)
    first = run.stage("scores", params, build).to_pandas()
    assert run.manifest("scores")["complete"]

    calls = []

    def build_traced():
        calls.append(1)
        return build()

    second = Run(out).stage("scores", params, build_traced).to_pandas()
    assert not calls  # cache hit: build never ran
    pd.testing.assert_frame_equal(
        first.sort_values("doc_id").reset_index(drop=True),
        second.sort_values("doc_id").reset_index(drop=True),
    )


def test_props_value_agg_keeps_null_group(ray_session):
    from rayrl.jsonops import props_value_agg

    ds = ray.data.from_items(
        [
            {"props": '{"k": 1}', "value": 1.0},
            {"props": "not json", "value": 2.0},
            {"props": None, "value": 3.0},
            {"props": '{"k": 1}', "value": 4.0},
        ]
    )
    out = props_value_agg(ds).to_pandas().sort_values("k").reset_index(drop=True)
    assert len(out) == 2  # the NULL group survives the shuffle
    good = out[out["k"].notna()].iloc[0]
    assert good["k"] == 1 and good["n_events"] == 2 and good["sum_value"] == 5.0
    bad = out[out["k"].isna()].iloc[0]
    assert bad["n_events"] == 2 and bad["sum_value"] == 5.0


def test_cap_per_group_under_heavy_skew(ray_session):
    # 90% of rows in ONE source: the combiner must keep the shuffle
    # bounded (k per source per block) and the result exact
    n = 20000
    src = np.where(np.arange(n) % 10 == 0, "cold", "hot")
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "source": src})
    hr = (df["doc_id"].to_numpy() % SAMPLE_MOD) * SAMPLE_MUL % SAMPLE_PRIME
    ref = df.assign(hrank=hr).sort_values(["source", "hrank", "doc_id"])
    rank = ref.groupby("source", sort=False).cumcount()
    ref = (
        ref[rank < CAP_K]
        .assign(rk=(rank[rank < CAP_K] + 1))
        .drop(columns="hrank")
        .sort_values(["source", "rk"])
        .reset_index(drop=True)
    )
    ds = ray.data.from_pandas(df).repartition(32)
    got = (
        cap_per_group(ds).to_pandas().sort_values(["source", "rk"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "source", "rk"]], ref[["doc_id", "source", "rk"]], check_dtype=False
    )


# ------------------------------------------- line-boilerplate removal

def _boiler_fixture_dir(tmp_path):
    """Planted multi-line docs: 'SUBSCRIBE NOW TODAY' rides 5 docs
    (boilerplate at K=4); 'only here twice' repeats twice inside ONE
    doc (counts that doc once -> kept); 'hi' is everywhere but under
    min_len -> kept."""
    import pyarrow.parquet as pq

    texts = [
        "alpha body line one\nSUBSCRIBE NOW TODAY\nhi",
        "beta body line\nSUBSCRIBE NOW TODAY\nonly here twice\nonly here twice",
        "gamma content\nSUBSCRIBE NOW TODAY\nhi",
        "delta content\nSUBSCRIBE NOW TODAY",
        "epsilon content\nSUBSCRIBE NOW TODAY\nhi\nhi",
        "zeta clean document body",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["s0", "s1", "s2", "s0", "s1", "s2"], pa.string()),
        }
    )
    d = tmp_path / "boiler_sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_boilerplate_planted_and_paths_agree(tmp_path):
    from rayrl.boilerplate import boilerplate_cleaned

    sf = _boiler_fixture_dir(tmp_path)
    got = (
        boilerplate_cleaned(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # every planted footer is gone; nothing else is
    assert got["n_removed"].tolist() == [1, 1, 1, 1, 1, 0]
    assert not got["text"].str.contains("SUBSCRIBE NOW TODAY").any()
    # in-doc-only repeat survives (per-doc dedup before the count)
    assert "only here twice\nonly here twice" in got.loc[1, "text"]
    # sub-min_len line survives everywhere (footer follows it in the view)
    assert "\nhi\n" in got.loc[0, "text"]
    # unique header kept: every doc still opens with its DOC marker
    assert (got["text"].str.split("\n").str[0] == "DOC " + got["doc_id"].astype(str)).all()

    joined = (
        boilerplate_cleaned(sf, broadcast_gate=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, joined, check_dtype=False)


# ------------------------------------------------- merge/upsert

def test_merge_upsert_paths_and_semantics():
    from rayrl.snapshot import MUT_MOD, NEW_MOD, OLD_MOD, merged_snapshot

    sf = "/root/testdata/sf0.001"
    got = (
        merged_snapshot(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    forced = (
        merged_snapshot(sf, broadcast_gate=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, forced, check_dtype=False)

    ids = got["doc_id"].to_numpy()
    origin = got["origin"].to_numpy()
    in_base, in_delta = ids % OLD_MOD == 0, ids % NEW_MOD != 0
    # delta wins wherever present; base survives only where delta absent
    assert (origin[in_delta] == "delta").all()
    assert (origin[~in_delta] == "base").all()
    assert (in_base | in_delta).all()  # nothing from outside either side
    # the delta re-crawl mutation is the text that survives
    mut = got[(ids % MUT_MOD == 0) & in_delta]
    assert len(mut) and mut["text"].str.endswith(" v2").all()
    non_mut = got[(ids % MUT_MOD != 0) | ~in_delta]
    assert not non_mut["text"].str.endswith(" v2").any()


# ------------------------------------------------- token-budget mix

def test_token_budget_mix_layout_independent_and_exact(ray_session):
    """The local-prefix combiner must equal a single global prefix cut
    at ANY block layout (the kept set is order-defined, not
    count-defined), including the quota-crossing doc."""
    from rayrl.stats import SAMPLE_MOD, SAMPLE_MUL, SAMPLE_PRIME, token_budget_mix_ds

    rs = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64) * 7 + 3,
            "lang": rs.choice(["en", "de", "zh"], n),
            # 100× length spread so the crossing doc matters
            "n_chars": rs.randint(10, 1000, n).astype(np.int64),
        }
    )
    quotas = {"en": 5_000, "de": 2_000, "zh": 800}

    ref = df.assign(hrank=(df["doc_id"] % SAMPLE_MOD) * SAMPLE_MUL % SAMPLE_PRIME)
    ref = ref.sort_values(["lang", "hrank", "doc_id"], kind="mergesort")
    cum = ref.groupby("lang", sort=False)["n_chars"].cumsum()
    keep = (cum - ref["n_chars"]) < ref["lang"].map(quotas)
    expect = (
        ref[keep]
        .assign(cum_chars=cum[keep].astype(np.int64))[["doc_id", "lang", "cum_chars"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(expect) < n  # every quota binds

    for nblocks in (1, 7, 64):
        ds = ray.data.from_pandas(
            [d for _, d in df.groupby(np.arange(n) % nblocks, sort=False)]
        )
        got = (
            token_budget_mix_ds(ds, quotas)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)


# ------------------------------------------------- paragraph dedup

def _para_fixture_dir(tmp_path):
    """Planted multi-paragraph docs: 'THE COPIED PARAGRAPH BODY' rides
    docs 0/2/4 (kept only in doc 0); 'twin paragraph inside one doc'
    appears twice inside doc 1 (second copy dropped — keep-first is
    global, not per-doc); 'hey' is everywhere but under min_len →
    always kept."""
    import pyarrow.parquet as pq

    texts = [
        "alpha opening\n\nTHE COPIED PARAGRAPH BODY\n\nhey",
        "twin paragraph inside one doc\n\ntwin paragraph inside one doc",
        "gamma opening\n\nTHE COPIED PARAGRAPH BODY",
        "delta unique body paragraph\n\nhey",
        "hey\n\nTHE COPIED PARAGRAPH BODY\n\nepsilon closing",
        "zeta clean document body",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["s0", "s1", "s2", "s0", "s1", "s2"], pa.string()),
        }
    )
    d = tmp_path / "para_sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_paragraph_dedup_keep_first_and_paths_agree(tmp_path, ray_session):
    from rayrl.paradedup import paragraph_deduped

    sf = _para_fixture_dir(tmp_path)
    got = (
        paragraph_deduped(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # every doc survives (unique DOC header paragraph is always kept)
    assert got["doc_id"].tolist() == [0, 1, 2, 3, 4, 5]
    assert (
        got["text"].str.split("\n\n").str[0] == "DOC " + got["doc_id"].astype(str)
    ).all()
    # copied paragraph kept exactly once, in the FIRST doc (doc 0)
    hits = got["text"].str.count("THE COPIED PARAGRAPH BODY")
    assert hits.tolist() == [1, 0, 0, 0, 0, 0]
    # in-doc second copy dropped too (global keep-first)
    assert got.loc[1, "text"].count("twin paragraph inside one doc") == 1
    # trailer kept once per source, in that source's first doc
    trail = got["text"].str.count("SHARED TRAILER ")
    assert trail.tolist() == [1, 1, 1, 0, 0, 0]
    # sub-min_len paragraph always kept
    assert got["text"].str.split("\n\n").apply(lambda p: p.count("hey")).tolist() == [
        1, 0, 0, 1, 1, 0,
    ]
    # n_removed accounts for every dropped paragraph
    assert got["n_removed"].tolist() == [0, 1, 1, 1, 2, 1]

    joined = (
        paragraph_deduped(sf, broadcast_gate=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, joined, check_dtype=False)


# ------------------------------------------------- duplicated spans

def test_duplicated_spans_planted_and_paths_agree(tmp_path, ray_session):
    """Docs sharing a long copied paragraph score high dup_span_frac;
    unique docs score 0; broadcast and join paths agree."""
    import pyarrow.parquet as pq

    from rayrl.text import duplicated_spans

    rng = np.random.default_rng(3)
    uniq = lambda n: " ".join(
        "".join(rng.choice(list("abcdefghijklmnop"), size=7)) for _ in range(n)
    )
    shared = "this exact syndicated paragraph is copied verbatim across mirrors " * 4
    texts = [
        shared + uniq(2),          # mostly copied
        uniq(2) + " " + shared,    # mostly copied
        uniq(40),                  # unique
        uniq(40),                  # unique
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    got = (
        duplicated_spans(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == 4 and (got["n_fps"] > 0).all()
    assert got.loc[0, "dup_span_frac"] > 0.5
    assert got.loc[1, "dup_span_frac"] > 0.5
    assert got.loc[2, "dup_span_frac"] == 0.0
    assert got.loc[3, "dup_span_frac"] == 0.0

    joined = (
        duplicated_spans(str(d), broadcast_gate=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, joined, check_dtype=False)


# ------------------------------------------------- jsonl round-trip

def test_jsonl_export_roundtrip(ray_session, tmp_path):
    """documents → partitioned JSONL shards → read back: row-identical;
    multiple shards, never one giant file."""
    from rayrl.jsonops import export_jsonl, read_jsonl

    src = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    ).repartition(4)
    out = str(tmp_path / "jsonl")
    mf = export_jsonl(src, out)
    assert mf["n_rows"] == 500 and mf["n_files"] >= 4

    back = (
        read_jsonl(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "text", "lang"]]
    )
    orig = src.to_pandas().sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "text", "lang"]
    ]
    pd.testing.assert_frame_equal(back, orig, check_dtype=False)


def test_duplicated_spans_all_short_docs(ray_session, tmp_path):
    """A corpus of sub-k docs has no fingerprints: empty result, no
    length-mismatch crash in the occ pass."""
    import pyarrow.parquet as pq

    from rayrl.text import duplicated_spans

    t = pa.table(
        {"doc_id": pa.array(range(5), pa.int64()),
         "text": pa.array(["ab", "c", "", "defg", "hi"], pa.string())}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = duplicated_spans(str(d)).to_pandas()
    assert len(got) == 0


# ------------------------------------------- canonical-variant dedup

def test_canonical_documents_planted_variants(ray_session, tmp_path):
    """Case/whitespace variants of the same text collapse to ONE row;
    the winner is the longest original (ties -> lowest doc_id) and
    n_variants counts the absorbed group."""
    import pyarrow.parquet as pq

    from rayrl.text import canonical_documents

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "Hello   World",   # len 13 — wins the len-13 tie by lowest id
                    "hello world",     # len 11
                    "HELLO  WORLD ",   # len 13, loses the tie to doc 1
                    "something else",
                    "Hello   World",   # exact duplicate of doc 1
                ]
            ),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        canonical_documents(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # docs 1,2,3,5 all normalize to "hello world"; longest originals are
    # 1, 3, 5 at len 13 -> lowest doc_id 1 wins, absorbing 4 variants.
    assert list(got["doc_id"]) == [1, 4]
    assert list(got[got["doc_id"] == 1]["n_variants"]) == [4]
    assert list(got[got["doc_id"] == 4]["n_variants"]) == [1]
