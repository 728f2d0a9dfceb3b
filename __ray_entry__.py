"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in rayrl) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship record-linkage benchmark on a deterministic
  pages fixture sized from /root/testdata/sf0.001 — inject errors at
  10%, block/score/cluster, return the pairwise metrics row.
- ``queries()``: one callable per implemented operator (SURVEY.md §2);
  each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB equivalents for the SQL-expressible ops.
  ER/linkage/LSH ops are intentionally absent (non-SQL semantics) →
  driver records rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
import pyarrow.parquet as pq


def _n_pages(sf_dir: str) -> int:
    """Deterministic fixture size per scale: lineitem rows // 3
    (sf0.001 → 2k, sf0.01 → 20k, sf0.1 → 200k pages)."""
    return max(2000, pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows // 3)


def _clean_pages(sf_dir: str):
    from rayrl import synth

    return synth.pages_dataset(_n_pages(sf_dir))


# Single-entry cache like _LINKAGE_CACHE below: er_dirty_pages,
# er_ledger and er_error_rate are ADJACENT in the driver window and
# each used to rebuild the full synth + injection pipeline from
# scratch (r5 review). The cached combined is materialized once; the
# dirty/ledger views derive from it without re-running injection.
_DIRTY_CACHE: list = []


def _dirty_combined(sf_dir: str, rate: float = 0.10):
    from rayrl import pipeline

    key = (sf_dir, rate)
    if _DIRTY_CACHE and _DIRTY_CACHE[0][0] == key:
        return _DIRTY_CACHE[0][1]
    out = pipeline.mess_dataset(
        _clean_pages(sf_dir), pipeline.benchmark_specs(rate), seed=7
    )
    out = pipeline.DirtyOutput(combined=out.combined.materialize())
    _DIRTY_CACHE[:] = [(key, out)]
    return out


def er_dirty_pages(sf_dir: str):
    """Dirty copy of the pages fixture at 10% error rate."""
    return _dirty_combined(sf_dir).dirty


def er_ledger(sf_dir: str):
    """Ground-truth error ledger for the same run."""
    return _dirty_combined(sf_dir).ledger


def er_error_rate(sf_dir: str):
    """Realized distinct-id error rate (calc_perc_id_err analogue)."""
    from rayrl import pipeline

    n = _n_pages(sf_dir)
    rate = pipeline.calc_perc_id_err(_dirty_combined(sf_dir).ledger, n)
    return pd.DataFrame({"n_rows": [n], "distinct_err_rate": [round(rate, 4)]})


def er_linkage_metrics(sf_dir: str):
    """End-to-end blocking → scoring → clustering → pairwise F1 at 10%
    error (the north-rule headline)."""
    from rayrl.linkage import LinkageConfig, link_datasets

    clean = _clean_pages(sf_dir).materialize()
    dirty = _dirty_combined(sf_dir).dirty.materialize()
    m = link_datasets(clean, dirty, LinkageConfig())["metrics"]
    return pd.DataFrame([{k: round(float(v), 6) for k, v in m.items()}])


# Single-entry cache (sf_dir, result): four er_* queries consume the
# same ~25 s linkage build in one driver process (VERDICT r3 #2). One
# entry only — a second sf_dir evicts the first, so the object-store
# pins are bounded no matter how many scales one process queries.
_LINKAGE_CACHE: list = []
_LINKAGE_BUILDS: list = []  # sf_dirs built, for the cache test


def _small_linkage(sf_dir: str):
    from rayrl import pipeline, synth
    from rayrl.linkage import LinkageConfig, link_datasets

    if _LINKAGE_CACHE and _LINKAGE_CACHE[0][0] == sf_dir:
        return _LINKAGE_CACHE[0][1]
    _LINKAGE_BUILDS.append(sf_dir)
    n = max(2000, _n_pages(sf_dir) // 4)
    clean = synth.pages_dataset(n).materialize()
    dirty = pipeline.mess_dataset(clean, pipeline.benchmark_specs(0.10), seed=7).dirty.materialize()
    res = link_datasets(clean, dirty, LinkageConfig())
    _LINKAGE_CACHE[:] = [(sf_dir, res)]
    return res


def er_pair_metrics(sf_dir: str):
    """Extended pair metric set over scored edges (accuracy, precision,
    recall, F1, Brier — calculate_metrics reduction, utils.R:997-1047)."""
    from rayrl.linkage.resolve import pair_metrics

    res = _small_linkage(sf_dir)
    return pd.DataFrame([{k: round(float(v), 6) for k, v in pair_metrics(res["edges"]).items()}])


def er_best_links(sf_dir: str):
    """Gap-based best-link resolution over match edges
    (find_best_links, utils.R:457-470)."""
    from rayrl.linkage.resolve import find_best_links

    res = _small_linkage(sf_dir)
    return find_best_links(res["edges"], odds_threshold=0.1)


def er_links_1to1(sf_dir: str):
    """Strict 1-to-1 links (links_1to1, utils.R:368-389)."""
    from rayrl.linkage.resolve import links_1to1

    res = _small_linkage(sf_dir)
    return links_1to1(res["edges"])


def er_labeled_pairs(sf_dir: str):
    """Labeled pair set with hard negatives (generate_pairs,
    utils.R:502-645): truth matches ∖ exact dups + top-4×|matches|
    threshold-scored negatives from equality+LSH blocks."""
    from rayrl import pipeline, synth
    from rayrl.errors.injector import strip_ledger
    from rayrl.linkage.blocking import LinkageConfig
    from rayrl.linkage.features import labeled_pairs

    n = max(2000, _n_pages(sf_dir) // 4)
    clean = synth.pages_dataset(n).materialize()
    dirty = strip_ledger(
        pipeline.mess_dataset(clean, pipeline.benchmark_specs(0.10), seed=7).combined
    ).materialize()
    return labeled_pairs(clean, dirty, LinkageConfig(), seed=3)["labeled"]


def er_feature_vectors(sf_dir: str):
    """23-metric feature vectors + match label over the labeled pair
    set (add_feature_vector, utils.R:189-311)."""
    return _feature_vectors(sf_dir)


_VECTOR_CACHE: list = []  # single (sf_dir, vecs) entry — bounded pin


def _feature_vectors(sf_dir: str):
    """Labeled 23-metric vectors for the er_* queries. Cached
    MATERIALIZED, single entry (ADVICE r3: an unbounded per-sf_dir
    dict pins object-store memory for the driver's lifetime; the
    common case is one sf_dir per process, so latest-wins): four
    queries (labeled_pairs, feature_vectors, predict_links,
    sample_strat) consume the same ~25 s build — the cache saves
    three rebuilds (the product is bounded by
    (1+neg_ratio)·|matches|, small)."""
    if _VECTOR_CACHE and _VECTOR_CACHE[0][0] == sf_dir:
        return _VECTOR_CACHE[0][1]
    from rayrl import pipeline, synth
    from rayrl.errors.injector import strip_ledger
    from rayrl.linkage.blocking import LinkageConfig
    from rayrl.linkage.features import feature_vectors

    n = max(2000, _n_pages(sf_dir) // 4)
    clean = synth.pages_dataset(n).materialize()
    dirty = strip_ledger(
        pipeline.mess_dataset(clean, pipeline.benchmark_specs(0.10), seed=7).combined
    ).materialize()
    vecs = feature_vectors(clean, dirty, LinkageConfig(), seed=3).materialize()
    _VECTOR_CACHE[:] = [(sf_dir, vecs)]
    return vecs


def er_predict_links(sf_dir: str):
    """Pluggable model scoring over the 23-metric feature vectors
    (predict_links_raw, utils.R:352-366): deterministic logistic fit +
    actor-pool prediction → (match_prob, conf, match_pred)."""
    from rayrl.linkage.predict import predict_links_logistic

    preds = predict_links_logistic(_feature_vectors(sf_dir))
    return preds.select_columns(
        ["node_a", "node_b", "match", "match_prob", "conf", "match_pred"]
    )


def er_model_zoo(sf_dir: str):
    """Caret-model-parity zoo (standard_n.R:141-184, utils.R:916-995):
    deterministic rf / RFF-svm (radial + linear) / mlp + the logistic
    baseline trained on
    the labeled vectors, each scored distributed — one metrics row per
    model (accuracy / auc / f1, the reference's confusionMatrix gate).
    Non-SQL semantics (model training), rows-only by design; the
    per-model accuracy gates live in tests/test_models.py."""
    from rayrl.linkage.models import model_zoo_report

    return model_zoo_report(_feature_vectors(sf_dir), fast=True)


def er_learning_curve(sf_dir: str):
    """Train-size sweep vs a fixed test set — the reference's
    benchmarking grid (standard_n.R:58-99/:92, Rmd:215-292): one
    metrics row per (model, train_n) over the labeled vectors. Nested
    hash-prefix train sets isolate size from resampling noise.
    Rows-only (model training — non-SQL); gates in tests/test_models."""
    from rayrl.linkage.models import learning_curve

    return learning_curve(
        _feature_vectors(sf_dir),
        model_names=("logistic", "rf"),
        train_sizes=(250, 1000),
        test_n=400,
        fast=True,
    )


def er_sample_strat(sf_dir: str):
    """Stratified train sample over the labeled feature vectors
    (sample_strat, paper_flow_dob_latest.Rmd:161-172): 1:4
    match:unmatch, deterministic at any parallelism."""
    from rayrl.linkage.sampling import sample_strat

    res = sample_strat(_feature_vectors(sf_dir), n=500, match_frac=0.2)
    return res["train"].select_columns(["node_a", "node_b", "match"])


def er_best_links_agg(sf_dir: str):
    """Two-sided aggregated link resolution (find_best_links_aggregated,
    utils.R:426-455) over the scored match edges."""
    from rayrl.linkage.resolve import find_best_links_aggregated

    res = _small_linkage(sf_dir)
    return find_best_links_aggregated(res["edges"], odds_threshold=0.1)


def er_hamming_fields(sf_dir: str):
    """Weighted field-equality score per labeled pair
    (calculate_hamming_fields, utils.R:789-810)."""
    from rayrl import pipeline, synth
    from rayrl.errors.injector import strip_ledger
    from rayrl.linkage.blocking import LinkageConfig
    from rayrl.linkage.features import hamming_fields, labeled_pairs

    n = max(2000, _n_pages(sf_dir) // 8)
    clean = synth.pages_dataset(n).materialize()
    dirty = strip_ledger(
        pipeline.mess_dataset(clean, pipeline.benchmark_specs(0.10), seed=7).combined
    ).materialize()
    lp = labeled_pairs(clean, dirty, LinkageConfig(), seed=3)
    return hamming_fields(lp["labeled"])


def er_perturb_flow(sf_dir: str):
    """The per-row error-assignment flow (perturb_data + add_error,
    R/duplicate_add_errors.R:24-99): 2 corrupted copies per record."""
    from rayrl import synth
    from rayrl.errors.flow import perturb_dataset
    from rayrl.errors.injector import strip_ledger

    n = max(2000, _n_pages(sf_dir) // 10)
    clean = synth.pages_dataset(n)
    return strip_ledger(perturb_dataset(clean, ["indel", "repl", "tpose"], n_dup=2, seed=7))


def multimodal_features(sf_dir: str):
    """Byte-level media features over the pages html payload (decode
    stubbed — see rayrl.multimodal)."""
    from rayrl.multimodal import media_features

    return media_features(_clean_pages(sf_dir).select_columns(["record_id", "html"]))


def media_phash_near_dups(sf_dir: str):
    """Near-duplicate media pairs by perceptual dHash over the dirty
    pages' html payloads. Injected duplicate copies share their
    source's record_id (reference add_duplicates semantics) and the
    kernel drops same-id pairs, so the emitted pairs are cross-page
    near-dups (similar byte prefixes); decode is the documented fake,
    the fingerprint + pigeonhole shuffle plumbing is real."""
    from rayrl.multimodal import media_phash_near_dups as phash

    ds = er_dirty_pages(sf_dir).select_columns(["record_id", "html"])
    return phash(ds)


def host_stats(sf_dir: str):
    """Per-host crawl stats over the pages fixture (url host parsed
    with one Arrow split kernel; host-sized reduces)."""
    from rayrl.stats import host_stats_ds

    return host_stats_ds(_clean_pages(sf_dir).select_columns(["url", "text", "lang"]))


def multimodal_frames(sf_dir: str):
    """Video-style frame sampling over the pages html payload: every
    n-th fixed-size chunk as its own (media_id, frame_index,
    frame_bytes) row — the row-fanout layout of a real frame sampler."""
    import pyarrow.compute as pc

    from rayrl.multimodal import frame_sample

    ds = _clean_pages(sf_dir).select_columns(["record_id", "html"])
    ds = ds.map_batches(
        lambda t: t.rename_columns(["media_id", "payload"]), batch_format="pyarrow"
    ).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("payload"),
            "payload",
            pc.cast(t.column("payload"), "binary"),
        ),
        batch_format="pyarrow",
    )
    # frame_bytes is opaque binary; count frames per media for a
    # compact, hashable driver result
    frames = frame_sample(ds, every_n=4)
    return frames.groupby("media_id").count().map_batches(
        lambda t: t.rename_columns(["media_id", "n_frames"]), batch_format="pyarrow"
    )


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    return er_linkage_metrics("/root/testdata/sf0.001")


# The driver's per-round correctness pass verifies exactly the FIRST
# ~50 keys of queries() in insertion order. Round-5 curation (VERDICT
# r4 #1/#2): the new SQL-checkable flagship invariant first, then four
# er_* representatives (rows-only, clean in r01-r04; the other ten
# er_* rotate behind the window to free slots), then the 19
# oracle-backed queries that have never had a driver ★pass (with this
# window every oracle-backed query is ★-verified cumulatively:
# 71 in r3+r4 + 19 + er_invariant_check = 91/91), then ★r3 rows for
# re-verification (oldest stars first).
_WINDOW_FIRST = [
    # --- flagship: the ledger⇔data invariant, hash-checked in SQL ---
    "er_invariant_check",
    # --- er_* representatives (rows-only; r01-r04 history clean) ---
    "er_linkage_metrics",
    "er_ledger",
    "er_error_rate",
    "er_perturb_flow",
    # --- r5: caret-model parity zoo (rows-only — model training) ---
    "er_model_zoo",
    # --- oracle-backed, never driver-★-verified (r5 rotation) ---
    "ann_lsh_exact",
    "blocklist_clean_docs",
    "c4_filtered",
    "corpus_splits",
    "customer_order_list",
    "doc_bigram_surprisal",
    "duplicated_spans_exact",
    "kmeans_assign_exact",
    "leakage_safe_splits",
    "merged_snapshot",
    "normalized_order_prices",
    "packed_texts",
    "ranked_orders",
    "revenue_cube",
    "source_dup_matrix",
    "stream_dedup_summary",
    "surprisal_weighted_sample",
    "url_canonical_dedup",
    "user_event_type_pivot",
    # --- ★r3 rows, oldest verification — re-confirm with spare slots ---
    "segment_revenue_3way",
    "links_1to1_orders",
    "best_event_per_user",
    "pricing_summary",
    "top_orders",
    "customer_order_stats",
    "customers_without_finished_orders",
    "one_to_one_orders",
    "token_frequencies",
    "exact_dedup_documents",
    "events_hourly",
    "lang_profile",
    "token_counts",
    "char_class_counts",
    "quality_scores",
    "lang_id",
    "repetition_scores",
    "pii_scan",
    "normalized_documents",
    "canonical_documents",
    "chunk_documents",
    "soft_dedup_weights",
    "ngram_jaccard_exact",
    "ann_topk",
    "label_centroids",
]

# Immediately after the 50-key window: the remaining ★r3 rows, then
# (via the oracle-backed loop in queries()) every ★r4 row — all are
# pytest-oracle-verified each run regardless (test_entry_oracles).
_WINDOW_NEXT = [
    "embedding_norms",
    "embedding_outliers",
    "last_touch_attribution",
    "error_click_window",
    "top_orders_per_customer",
    "order_price_quantiles",
    "order_price_mad",
    "docs_above_p90_length",
]


def _all_queries() -> dict[str, Callable[[str], Any]]:
    from rayrl.ann import ANN_QUERIES
    from rayrl.bloom import BLOOM_QUERIES
    from rayrl.dedup import DEDUP_QUERIES
    from rayrl.quantiles import QUANTILE_QUERIES
    from rayrl.relational import QUERIES as REL_QUERIES
    from rayrl.packing import PACKING_QUERIES
    from rayrl.sketches import SKETCH_QUERIES
    from rayrl.stats import STATS_QUERIES
    from rayrl.temporal import TEMPORAL_QUERIES
    from rayrl.text import TEXT_QUERIES
    from rayrl.tfidf import TFIDF_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    out.update(REL_QUERIES)
    out.update(TEXT_QUERIES)
    out.update(DEDUP_QUERIES)
    out.update(ANN_QUERIES)
    out.update(TEMPORAL_QUERIES)
    out.update(QUANTILE_QUERIES)
    out.update(SKETCH_QUERIES)
    out.update(STATS_QUERIES)
    out.update(PACKING_QUERIES)
    out.update(TFIDF_QUERIES)
    out.update(BLOOM_QUERIES)
    from rayrl.analytics import ANALYTICS_QUERIES
    from rayrl.corpuspipe import CORPUS_PIPE_QUERIES
    from rayrl.decontam import DECONTAM_QUERIES
    from rayrl.jsonops import JSON_QUERIES
    from rayrl.snapshot import SNAPSHOT_QUERIES
    from rayrl.windows import WINDOW_QUERIES

    out.update(ANALYTICS_QUERIES)
    out.update(SNAPSHOT_QUERIES)
    out.update(CORPUS_PIPE_QUERIES)
    out.update(WINDOW_QUERIES)
    out.update(JSON_QUERIES)
    out.update(DECONTAM_QUERIES)
    from rayrl.boilerplate import BOILERPLATE_QUERIES
    from rayrl.paradedup import PARA_DEDUP_QUERIES
    from rayrl.bpe import BPE_QUERIES
    from rayrl.rag import RAG_QUERIES
    from rayrl.kmeans import KMEANS_QUERIES
    from rayrl.mlfilter import MLFILTER_QUERIES
    from rayrl.streamdedup import STREAM_DEDUP_QUERIES

    out.update(BOILERPLATE_QUERIES)
    out.update(PARA_DEDUP_QUERIES)
    out.update(BPE_QUERIES)
    out.update(RAG_QUERIES)
    out.update(KMEANS_QUERIES)
    out.update(MLFILTER_QUERIES)
    out.update(STREAM_DEDUP_QUERIES)
    from rayrl.invariant import INVARIANT_QUERIES
    from rayrl.urlops import URL_QUERIES

    out.update(INVARIANT_QUERIES)
    out.update(URL_QUERIES)
    from rayrl.linkage.features import major_tokens

    out.update(
        {
            "major_tokens": major_tokens,
            "er_labeled_pairs": er_labeled_pairs,
            "er_feature_vectors": er_feature_vectors,
            "er_predict_links": er_predict_links,
            "er_model_zoo": er_model_zoo,
            "er_learning_curve": er_learning_curve,
            "er_sample_strat": er_sample_strat,
            "er_best_links_agg": er_best_links_agg,
            "er_hamming_fields": er_hamming_fields,
            "er_dirty_pages": er_dirty_pages,
            "er_ledger": er_ledger,
            "er_error_rate": er_error_rate,
            "er_linkage_metrics": er_linkage_metrics,
            "er_pair_metrics": er_pair_metrics,
            "er_best_links": er_best_links,
            "er_links_1to1": er_links_1to1,
            "er_perturb_flow": er_perturb_flow,
            "multimodal_features": multimodal_features,
            "multimodal_frames": multimodal_frames,
            "media_phash_near_dups": media_phash_near_dups,
            "host_stats": host_stats,
        }
    )
    # folded intermediates (VERDICT r3 #1): each is a byproduct of a
    # registered query and added only noise to the driver's budget —
    # doc_fingerprints feeds winnow_fingerprints, pq_codes feeds
    # ann_pq_topk; both stay importable and pytest-covered.
    out.pop("doc_fingerprints", None)
    out.pop("pq_codes", None)
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    all_q = _all_queries()
    oracle_keys = set(oracle_sql())
    out: dict[str, Callable[[str], Any]] = {}
    for k in _WINDOW_FIRST:
        out[k] = all_q[k]  # KeyError here = the window list drifted
    for k in _WINDOW_NEXT:
        out[k] = all_q[k]
    for k in all_q:  # remaining oracle-backed (the r03-★ rows)
        if k not in out and k in oracle_keys:
            out[k] = all_q[k]
    for k in all_q:  # no-oracle tail
        if k not in out:
            out[k] = all_q[k]
    return out


def oracle_sql() -> dict[str, str]:
    from rayrl.ann import (
        ANN_IVF_EXACT_ORACLE,
        ANN_TOPK_ORACLE,
        EMBEDDING_COSINE_PAIRS_ORACLE,
        EMBEDDING_NORMS_ORACLE,
        EMBEDDING_OUTLIERS_ORACLE,
        LABEL_CENTROIDS_ORACLE,
    )
    from rayrl.bloom import BLOOM_ORACLES
    from rayrl.dedup import (
        MARKER_HAMMING_ORACLE,
        NGRAM_DUP_CLUSTERS_ORACLE,
        NGRAM_DUP_KEEPERS_ORACLE,
        NGRAM_JACCARD_EXACT_ORACLE,
        SOFT_DEDUP_ORACLE,
    )
    from rayrl.quantiles import QUANTILE_ORACLES
    from rayrl.relational import ORACLES as REL_ORACLES
    from rayrl.packing import PACKING_ORACLES
    from rayrl.sketches import SKETCH_ORACLES
    from rayrl.stats import STATS_ORACLES
    from rayrl.temporal import TEMPORAL_ORACLES
    from rayrl.text import TEXT_ORACLES
    from rayrl.tfidf import TFIDF_ORACLES

    from rayrl.linkage.features import MAJOR_TOKENS_ORACLE

    out: dict[str, str] = {}
    out.update(REL_ORACLES)
    out.update(TEXT_ORACLES)
    out.update(TEMPORAL_ORACLES)
    out.update(QUANTILE_ORACLES)
    out.update(SKETCH_ORACLES)
    out.update(STATS_ORACLES)
    out.update(PACKING_ORACLES)
    out.update(TFIDF_ORACLES)
    out.update(BLOOM_ORACLES)
    from rayrl.analytics import ANALYTICS_ORACLES
    from rayrl.corpuspipe import CORPUS_PIPE_ORACLES
    from rayrl.decontam import DECONTAM_ORACLES
    from rayrl.jsonops import JSON_ORACLES
    from rayrl.snapshot import SNAPSHOT_ORACLES
    from rayrl.windows import WINDOW_ORACLES

    out.update(ANALYTICS_ORACLES)
    out.update(SNAPSHOT_ORACLES)
    out.update(CORPUS_PIPE_ORACLES)
    out.update(WINDOW_ORACLES)
    out.update(JSON_ORACLES)
    out.update(DECONTAM_ORACLES)
    from rayrl.boilerplate import BOILERPLATE_ORACLES
    from rayrl.paradedup import PARA_DEDUP_ORACLES

    out.update(BOILERPLATE_ORACLES)
    out.update(PARA_DEDUP_ORACLES)
    out["ann_topk"] = ANN_TOPK_ORACLE
    out["label_centroids"] = LABEL_CENTROIDS_ORACLE
    out["embedding_norms"] = EMBEDDING_NORMS_ORACLE
    out["embedding_outliers"] = EMBEDDING_OUTLIERS_ORACLE
    out["major_tokens"] = MAJOR_TOKENS_ORACLE
    out["ngram_jaccard_exact"] = NGRAM_JACCARD_EXACT_ORACLE
    out["soft_dedup_weights"] = SOFT_DEDUP_ORACLE
    # round-4 exact-oracle twins (previously no-oracle families)
    out["ngram_dup_clusters"] = NGRAM_DUP_CLUSTERS_ORACLE
    out["ngram_dup_keepers"] = NGRAM_DUP_KEEPERS_ORACLE
    out["ann_ivf_exact"] = ANN_IVF_EXACT_ORACLE
    out["embedding_cosine_pairs_exact"] = EMBEDDING_COSINE_PAIRS_ORACLE
    out["marker_hamming_pairs"] = MARKER_HAMMING_ORACLE
    # second r4 twin wave (registered BEHIND the 50-key driver window —
    # they rotate in next round; pytest verifies them this round):
    # the LSH probe kernel (degenerate single bucket == brute force),
    # the k-means assignment kernel (fixed SQL-expressible centroids),
    # and the streaming-dedup summary counts (order-independent).
    from rayrl.ann import ANN_LSH_EXACT_ORACLE
    from rayrl.kmeans import KMEANS_ASSIGN_ORACLE
    from rayrl.streamdedup import STREAM_DEDUP_ORACLE

    out["ann_lsh_exact"] = ANN_LSH_EXACT_ORACLE
    out["kmeans_assign_exact"] = KMEANS_ASSIGN_ORACLE
    out["stream_dedup_summary"] = STREAM_DEDUP_ORACLE
    # round-5: the flagship ledger⇔data invariant — the Ray query
    # exports (clean, dirty, ledger) to Parquet and this DuckDB twin
    # recomputes the same all-integer summary from the files (the
    # query runs before its oracle in both the driver and pytest)
    from rayrl.invariant import INVARIANT_ORACLES

    out.update(INVARIANT_ORACLES)
    # round-5: canonical-url dedup — same export-twin pattern as the
    # invariant (the query writes its alias fixture to /tmp; the SQL
    # recomputes the keep-latest winner from the files)
    from rayrl.urlops import URL_ORACLES

    out.update(URL_ORACLES)
    return out
