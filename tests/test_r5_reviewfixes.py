"""Regression net for the r5 old-module review findings: exact int64
JSON keys, SQL-cast rounding, rerun-safe exports, null-text snapshot
parity, empty-delta upserts, zero-draw anti-joins, and blank-text
token counts."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data


def test_json_extract_keeps_big_int_keys_exact(ray_session):
    """A null-k row in the same batch must not degrade other keys:
    int64-with-null through pandas becomes float64 and 2^60+1 aliases
    to 2^60 (CLAUDE.md rule 14 — the exact failure the review
    reproduced)."""
    from rayrl.jsonops import props_value_agg

    big = 2**60 + 1
    tbl = pa.table(
        {
            "props": pa.array(
                ['{"k": %d}' % big, '{"k": %d}' % (2**60), "not json", '{"k": 7}'],
                pa.string(),
            ),
            "value": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
        }
    )
    got = props_value_agg(ray.data.from_arrow(tbl)).to_pandas()
    by_k = {None if pd.isna(k) else int(k): n for k, n in zip(got["k"], got["n_events"])}
    assert by_k.get(big) == 1 and by_k.get(2**60) == 1  # distinct, not aliased
    assert by_k.get(7) == 1 and by_k.get(None) == 1


def test_json_extract_rounds_like_sql_cast(ray_session):
    """Float fields group under round-half-to-even (DuckDB CAST:
    3.7→4, 2.5→2, 3.5→4), not truncation."""
    from rayrl.jsonops import PROPS_VALUE_BY_K_ORACLE, props_value_agg

    props = ['{"k": 3.7}', '{"k": 2.5}', '{"k": 3.5}', '{"k": -2.5}']
    tbl = pa.table(
        {
            "props": pa.array(props, pa.string()),
            "value": pa.array([1.0] * len(props), pa.float64()),
        }
    )
    got = props_value_agg(ray.data.from_arrow(tbl)).to_pandas()
    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute(PROPS_VALUE_BY_K_ORACLE).df()
    g = got.sort_values("k").reset_index(drop=True)
    w = want.sort_values("k").reset_index(drop=True)
    assert list(g["k"].astype("Int64")) == list(w["k"].astype("Int64"))
    assert list(g["n_events"]) == list(w["n_events"])


def test_export_jsonl_rerun_does_not_duplicate(ray_session, tmp_path):
    """Re-exporting into the same directory must not leave stale
    shards behind (duplicated training rows on read-back)."""
    from rayrl.jsonops import export_jsonl, read_jsonl

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": range(10), "text": ["x"] * 10}))
    out = str(tmp_path / "jl")
    m1 = export_jsonl(ds, out)
    m2 = export_jsonl(ds, out)  # rerun into the same dir
    assert m2["n_rows"] == 10 and m2["n_files"] == m1["n_files"]
    assert read_jsonl(out).count() == 10


def test_snapshot_diff_null_text_matches_oracle(ray_session, tmp_path):
    """NULL texts: unmutated NULL→NULL reads 'unchanged' on BOTH
    engines (IS NOT DISTINCT FROM), NULL→'...v2' mutation reads
    'changed', and NULL never collides with '' (the old empty-slice
    hash called both 'unchanged')."""
    from rayrl.snapshot import SNAPSHOT_DIFF_ORACLE, snapshot_diff

    n = 60
    texts = [None if i % 4 == 0 else ("" if i % 4 == 1 else f"text {i}") for i in range(n)]
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts, pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    got = (
        snapshot_diff(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(SNAPSHOT_DIFF_ORACLE).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_merge_upsert_empty_delta_returns_base(ray_session):
    """A zero-change incremental crawl (schemaless-empty delta) must
    return base tagged 'base', not raise (CLAUDE.md rule 21)."""
    from rayrl.snapshot import merge_upsert

    base = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    )
    empty = base.filter(lambda r: False).materialize()
    assert empty.schema() is None  # precondition
    out = merge_upsert(base, empty).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [1, 2, 3]
    assert (out["origin"] == "base").all()


def test_customers_anti_join_zero_finished_orders(ray_session, tmp_path):
    """No 'F' orders → the filtered key set is schemaless-empty; the
    anti-join must return EVERY customer instead of raising."""
    from rayrl.relational import customers_without_finished_orders

    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 2], pa.int64()),
                "o_orderkey": pa.array([10, 20], pa.int64()),
                "o_orderstatus": pa.array(["O", "P"], pa.string()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_name": pa.array(["x", "y", "z"], pa.string()),
                "c_acctbal": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        ),
        tmp_path / "customer.parquet",
    )
    got = customers_without_finished_orders(str(tmp_path)).to_pandas()
    assert sorted(got["c_custkey"]) == [1, 2, 3]


def test_token_frequencies_counts_empty_texts_like_sql(ray_session, tmp_path):
    """'' texts count one '' token (string_split('', ' ') → ['']);
    NULL texts count nothing — engine and DuckDB twin agree on a
    blank-heavy corpus."""
    from rayrl.relational import ORACLES, token_frequencies

    texts = ["a b", "", "", None, "a", " "]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = token_frequencies(str(tmp_path)).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(ORACLES["token_frequencies"]).df().reset_index(drop=True)
    # '' appears from the two empty docs + the ' ' doc's two sides
    assert int(got.loc[got["token"] == "", "n"].iloc[0]) == 4
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_token_stages_survive_null_texts(ray_session, tmp_path):
    """NULL-text docs contribute zero tokens instead of crashing
    np.repeat with an INT64_MIN length (the split_tokens contract) —
    across tf-idf, bigrams, surprisal, bm25 and vocab stats."""
    texts = ["alpha beta", None, "alpha", None, "beta gamma delta"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s1", "s1", "s2", "s2", "s1"], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    sf = str(tmp_path)
    from rayrl.stats import lang_top_terms, source_vocab_stats
    from rayrl.tfidf import bigram_counts, doc_surprisal, tfidf_top_terms

    tf = tfidf_top_terms(sf).to_pandas()
    assert set(tf["doc_id"]) == {0, 2, 4}  # null docs emit no terms
    assert doc_surprisal(sf).to_pandas()["doc_id"].tolist() == [0, 2, 4]
    bc = bigram_counts(sf, min_count=1)
    bc = bc if isinstance(bc, pd.DataFrame) else bc.to_pandas()
    assert bc["n"].sum() == 3  # 1 + 2 bigrams
    lt = lang_top_terms(sf, k=10)
    lt = lt if isinstance(lt, pd.DataFrame) else lt.to_pandas()
    assert int(lt["n"].sum()) == 6  # six non-null tokens total
    sv = source_vocab_stats(sf)
    sv = (sv if isinstance(sv, pd.DataFrame) else sv.to_pandas()).set_index("source")
    assert int(sv.loc["s1", "n_tokens"]) == 5 and int(sv.loc["s2", "n_tokens"]) == 1


def test_leakage_split_null_text_matches_oracle(ray_session, tmp_path):
    """NULL texts form their OWN dedup group (nullsafe fingerprint +
    IS NOT DISTINCT FROM join): engine and oracle agree row-for-row on
    a corpus mixing NULL, '' and real texts."""
    import duckdb as ddb

    from rayrl.stats import LEAKAGE_SAFE_SPLITS_ORACLE, leakage_safe_splits

    texts = [None, "", "alpha", None, "", "beta"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = (
        leakage_safe_splits(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = ddb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (
        con.execute(LEAKAGE_SAFE_SPLITS_ORACLE).df().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # NULL docs co-locate with each other, not with the '' docs
    m = got.set_index("doc_id")["split"]
    assert m[0] == m[3] and m[1] == m[4]


def test_bloom_semi_join_empty_build_side(ray_session):
    """An empty build side yields a typed empty result (rule 21), not
    a TypeError from Dataset.aggregate returning None."""
    from rayrl.bloom import bloom_semi_join

    big = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]}))
    build = ray.data.from_pandas(pd.DataFrame({"bk": pd.Series([], dtype="int64")}))
    out = bloom_semi_join(big, build, "k", "bk")
    assert out.count() == 0 and "v" in out.schema().names


def test_url_canonicalize_single_scheme_strip():
    """A chained scheme strips exactly ONE prefix, like the oracle's
    CASE — 'https://http://x' canonicalizes to 'http://x', not 'x'."""
    from rayrl.urlops import canonicalize_urls

    got = canonicalize_urls(
        pa.array(["https://http://evil.example/x", "https://www.ok.example/a/"], pa.string())
    ).to_pylist()
    assert got == ["http://evil.example/x", "ok.example/a"]


def test_source_vocab_jaccard_single_source(ray_session, tmp_path):
    """One source → zero pairs: typed-empty frame, not a schemaless
    KeyError (rule 21)."""
    from rayrl.stats import source_vocab_jaccard

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b", "b c"], pa.string()),
                "source": pa.array(["only", "only"], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = source_vocab_jaccard(str(tmp_path))
    assert len(out) == 0 and list(out.columns) == ["src_a", "src_b", "jaccard"]


def test_kmeans_fit_fewer_vectors_than_k(ray_session):
    """n < k fits with k_eff = n centroids instead of crashing the
    shape assert; semantic_dedup on an empty shard returns a typed
    empty (rule 21)."""
    from rayrl.kmeans import kmeans_fit, semantic_dedup_ds

    rows = pd.DataFrame(
        {
            "vec_id": pd.Series(range(5), dtype="int64"),
            "embedding": [list(np.eye(4)[i % 4] + 0.01 * i) for i in range(5)],
        }
    )
    c = kmeans_fit(ray.data.from_pandas(rows), k=8)
    assert c.shape == (5, 4)
    out = semantic_dedup_ds(ray.data.from_pandas(rows), k=8).to_pandas()
    assert len(out) == 5 and (out["rep"] == out["vec_id"]).all()  # all distinct

    empty = ray.data.from_pandas(rows).filter(lambda r: False).materialize()
    z = semantic_dedup_ds(empty, k=8)
    assert z.count() == 0 and "rep" in z.schema().names


def test_minhash_bands_must_divide_signature():
    """bands > k (r=0 → one global bucket) and non-divisible k must be
    hard errors, not a silent recall collapse."""
    from rayrl.dedup import _MinHashBands

    with pytest.raises(ValueError, match="divide"):
        _MinHashBands(k=8, bands=16, seed=0)
    with pytest.raises(ValueError, match="divide"):
        _MinHashBands(k=10, bands=4, seed=0)
    _MinHashBands(k=8, bands=4, seed=0)  # valid


def test_ann_topk_excludes_self_on_tiny_corpus(ray_session, tmp_path):
    """Corpus with n <= k: the query itself must not appear in its own
    top-k (the oracle's vec_id <> qid), and a zero-norm embedding must
    not NaN-poison the similarities."""
    import pyarrow.parquet as pq2

    from rayrl.ann import ann_topk

    vecs = [list(np.eye(4)[i % 4] + 0.1 * i) for i in range(6)]
    vecs[5] = [0.0, 0.0, 0.0, 0.0]  # zero-norm hygiene case
    pq2.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(6), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float64())),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = ann_topk(str(tmp_path), k=10, n_queries=2).to_pandas()
    for q in (0, 1):
        mine = out[out["query_id"] == q]
        assert q not in set(mine["vec_id"])  # self excluded
        assert len(mine) == 5  # all others, ranked


def test_checkpoint_combined_rerun_does_not_double(ray_session, tmp_path):
    """write_parquet APPENDS uuid-named files: a rerun into the same
    checkpoint dir must not double the data or the manifest count."""
    from rayrl import pipeline, synth

    clean = synth.pages_dataset(300)
    out = pipeline.mess_dataset(clean, pipeline.benchmark_specs(0.10), seed=7)
    p = str(tmp_path / "ck")
    m1 = pipeline.checkpoint_combined(out, p)
    m2 = pipeline.checkpoint_combined(out, p)  # rerun, same dir
    assert m2["rows"] == m1["rows"]
    assert pipeline.read_checkpoint(p).count() == m1["rows"]


def test_calc_review_pct_value_level_thresholds():
    """Thresholds are VALUES: NPV/PPV qualification must include the
    whole tied run (utils.R:1052-1081) — the review's repro reads
    0.667, not the per-element 0.333."""
    from rayrl.linkage.resolve import calc_review_pct

    truth = np.array([0, 0, 1, 1, 0, 1])
    prob = np.array([0.1, 0.2, 0.2, 0.8, 0.8, 0.9])
    assert abs(calc_review_pct(truth, prob, ppv=1.0, npv=1.0) - 2 / 3) < 1e-12
    # order invariance under permutation (tie-order independence)
    rng_ = np.random.default_rng(3)
    perm = rng_.permutation(len(prob))
    assert abs(calc_review_pct(truth[perm], prob[perm], 1.0, 1.0) - 2 / 3) < 1e-12


def test_threshold_grid_rejects_vacuous_precision():
    """When no real threshold reaches the target, the selector returns
    None — zero-prediction grid points are NaN (the reference drops
    them), not precision 1.0."""
    from rayrl.linkage.resolve import calc_threshold_for_metric_value

    truth = np.array([0, 0, 0, 0])
    prob = np.array([0.6, 0.7, 0.8, 0.9])  # every prediction is wrong
    got = calc_threshold_for_metric_value(truth, prob, "precision", 0.99)
    assert got is None


def test_pair_fields_null_warc_ts(ray_session):
    """A make_missing spec on warc_ts (the reference's dob-missing
    analogue) must produce sentinel date features, not ArrowTypeError
    or INT64_MIN garbage."""
    from rayrl.linkage.features import pair_fields

    tbl = pa.table(
        {
            "row_uid": pa.array([1, 2], pa.int64()),
            "record_id": pa.array([1, 2], pa.int64()),
            "url": pa.array(["https://a.example/x", "https://b.example/y"], pa.string()),
            "warc_ts": pa.array(
                [pd.Timestamp("2016-03-01").to_pydatetime(), None],
                pa.timestamp("us"),
            ),
            "text": pa.array(["alice smith", "bob jones"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    out = pair_fields(ray.data.from_arrow(tbl), side=0).to_pandas().sort_values("node")
    good, missing = out.iloc[0], out.iloc[1]
    assert good["date_s"] == "2016-03-01" and good["year"] == 2016
    assert missing["date_s"] == "" and missing["year"] == -1
    assert missing["month"] == -1 and missing["day"] == -1
    assert missing["age_days"] == -(10**6)


def test_payload_arrays_lang_null_paths_agree():
    """The pandas branch must give NULL lang the same -1 sentinel as
    the Arrow branch — crc32('') == 0 is the EMPTY string's code."""
    from rayrl.linkage.scoring import payload_arrays

    sig = [bytes(range(8)), bytes(range(8))]
    arrow = pa.table(
        {
            "node": pa.array([2, 4], pa.int64()),
            "truth": pa.array([1, 2], pa.int64()),
            "lang": pa.array([None, ""], pa.string()),
            "sig": pa.array(sig, pa.binary()),
        }
    )
    pdf = pd.DataFrame({"node": [2, 4], "truth": [1, 2], "lang": [None, ""], "sig": sig})
    a = payload_arrays(arrow)
    p = payload_arrays(pdf)
    assert list(a["lang_code"]) == list(p["lang_code"])
    assert a["lang_code"][0] == -1 and a["lang_code"][1] == 0
    # empty frame: typed-empty, not a reshape crash
    empty = payload_arrays(pdf.iloc[0:0])
    assert len(empty["node"]) == 0


def test_same_named_specs_draw_independent_gates():
    """Two same-named specs on the same column must select
    INDEPENDENT row sets: with name-only rng tags every ocr-repl hit
    was a keyboard-repl hit (fully correlated gates, union coverage
    collapsed — r5 review). Requires some rows hit by the second spec
    alone."""
    from rayrl.errors.base import REGISTRY, BatchCtx, ErrorSpec

    n = 20000
    tbl = pa.table(
        {
            "row_uid": pa.array(range(n), pa.int64()),
            "record_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["hello world"] * n, pa.string()),
        }
    )
    ctx = BatchCtx(tbl, seed=7, active_cols=("text",))
    kb = REGISTRY["repl"](
        ErrorSpec("repl", 0.11, ("text",), {"style": "keyboard"}), 7, spec_idx=0
    )
    ocr = REGISTRY["repl"](
        ErrorSpec("repl", 0.05, ("text",), {"style": "ocr"}), 7, spec_idx=1
    )
    eligible = np.ones(n, dtype=bool)
    a = set(kb.gate(ctx, "text", eligible).tolist())
    b = set(ocr.gate(ctx, "text", eligible).tolist())
    assert len(b - a) > 0.02 * n  # ocr-only rows exist (was 0 before)
    # overlap ≈ independent product, not containment
    assert len(a & b) < 0.5 * len(b)


def test_packing_degenerate_corpora(ray_session, tmp_path):
    """Empty corpus: typed-empty assignments and packs, no schemaless
    KeyError; tiny corpus (< budget tokens, no interior packs): the
    boundary-piece leg alone carries the output (rule 21)."""
    from rayrl.packing import pack_assignments, packed_texts

    for name, texts in (("empty", []), ("tiny", ["a b c", "d e"])):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            d / "documents.parquet",
        )
        a_ds = pack_assignments(str(d))
        p_ds = packed_texts(str(d))
        a, p = a_ds.to_pandas(), p_ds.to_pandas()
        if name == "empty":
            assert len(a) == 0 and len(p) == 0
            # typed at the Dataset level (Ray's to_pandas drops cols
            # on 0-row frames; downstream Dataset ops see the schema)
            assert "pack_id" in a_ds.schema().names
            assert "text" in p_ds.schema().names
        else:
            assert len(a) == 2 and set(a["pack_id"]) == {0}
            assert len(p) == 1 and p["text"].iloc[0] == "a b c d e"


def test_rag_degenerate_corpora(ray_session, tmp_path):
    """Short docs (no second chunk) and non-zero-based ids: empty
    results, not np.stack crashes; single-doc corpora never emit a
    same-document 'negative'."""
    from rayrl.rag import contrastive_pairs, rag_topk

    short = tmp_path / "short"
    short.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),  # non-zero-based
                "text": pa.array(["only a few tokens here"], pa.string()),
            }
        ),
        short / "documents.parquet",
    )
    assert len(rag_topk(str(short), n_queries=3)) == 0
    assert len(contrastive_pairs(str(short))) == 0

    single_long = tmp_path / "single_long"
    single_long.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array([" ".join(f"w{i}" for i in range(200))], pa.string()),
            }
        ),
        single_long / "documents.parquet",
    )
    cp = contrastive_pairs(str(single_long))
    assert len(cp) == 0  # no cross-document negative exists


def test_streamdedup_replay_token_is_idempotent(ray_session):
    """A retried shard call with the same token must return the
    ORIGINAL mask (first occurrences preserved), not all-False."""
    import ray as _ray

    from rayrl.streamdedup import FingerprintShard

    shard = FingerprintShard.remote()
    fps = np.array([11, 22, 11, 33], np.uint64)
    m1 = _ray.get(shard.check_and_add.remote(fps, 777))
    m2 = _ray.get(shard.check_and_add.remote(fps, 777))  # retry replay
    assert list(m1) == [True, True, False, True]
    assert list(m2) == list(m1)
    # a DIFFERENT batch with the same content is new work, not a replay
    m3 = _ray.get(shard.check_and_add.remote(fps, 778))
    assert list(m3) == [False, False, False, False]


def test_text_stages_null_corpus_matches_oracles(ray_session, tmp_path):
    """canonical_documents, c4_filtered, chunk_documents and
    token_counts on a NULL/''-mixed corpus: engine == DuckDB twin
    (batch-7 review: NULL merged with '', unary ~ crashed, spurious
    chunk rows, NULL bpe/chars columns)."""
    from rayrl.text import TEXT_ORACLES, c4_filtered, canonical_documents, chunk_documents, token_counts

    texts = [
        None,
        "",
        "Alpha  beta",
        "alpha beta",
        None,
        "lorem ipsum " * 30,
        "x { y",
        " ".join(f"word{i}" for i in range(80)),  # passes the C4 gate
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    sf = str(tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )

    def df_of(r):
        return r if isinstance(r, pd.DataFrame) else r.to_pandas()

    for fn, key in (
        (canonical_documents, "canonical_documents"),
        (c4_filtered, "c4_filtered"),
        (chunk_documents, "chunk_documents"),
        (token_counts, "token_counts"),
    ):
        got = df_of(fn(sf))
        want = con.execute(TEXT_ORACLES[key]).df()
        assert len(got) == len(want), key
        assert len(want) > 0, f"{key}: vacuous fixture"
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), key
        g = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
        w = want[cols].sort_values(cols).reset_index(drop=True).astype(str)
        assert g.equals(w), f"{key}:\n{g}\nvs\n{w}"
    # the two NULL docs formed ONE canonical group, '' its own
    cd = df_of(canonical_documents(sf)).set_index("doc_id")["n_variants"]
    assert cd[0] == 2 and cd[1] == 1  # min-id winners: 0 (nulls), 1 ('')
