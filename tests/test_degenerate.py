"""Degenerate-input robustness: empty partitions, zero-error inputs,
single-row and empty corpora. At 100 TB some shard WILL be empty or
trivial — every flagship stage must pass these shapes through rather
than crash on an empty numpy reduce or a schemaless empty Dataset."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrl import dedup, synth, text
from rayrl.linkage import LinkageConfig, link_datasets


def _empty_like(ds):
    """Same schema, zero rows (an all-empty-partitions Dataset)."""
    return ds.map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")


DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def _write_docs(tmp_path, rows: dict) -> str:
    t = pa.table(
        {
            "doc_id": pa.array(rows.get("doc_id", []), pa.int64()),
            "text": pa.array(rows.get("text", []), pa.string()),
            "lang": pa.array(rows.get("lang", []), pa.string()),
            "source": pa.array(rows.get("source", []), pa.string()),
            "n_chars": pa.array(rows.get("n_chars", []), pa.int64()),
        },
        schema=DOC_SCHEMA,
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


@pytest.fixture(scope="module")
def empty_corpus(tmp_path_factory):
    return _write_docs(tmp_path_factory.mktemp("empty"), {})


@pytest.fixture(scope="module")
def single_doc_corpus(tmp_path_factory):
    return _write_docs(
        tmp_path_factory.mktemp("single"),
        {
            "doc_id": [7],
            "text": ["the quick brown fox jumps over the lazy dog"],
            "lang": ["en"],
            "source": ["web"],
            "n_chars": [43],
        },
    )


@pytest.fixture(scope="module")
def blank_text_corpus(tmp_path_factory):
    """Rows exist but every text is empty/whitespace — the shape a
    boilerplate-stripping stage upstream can legally produce."""
    return _write_docs(
        tmp_path_factory.mktemp("blank"),
        {
            "doc_id": [1, 2, 3],
            "text": ["", " ", ""],
            "lang": ["en", "en", "de"],
            "source": ["web", "web", "news"],
            "n_chars": [0, 1, 0],
        },
    )


def test_linkage_empty_dirty_side(ray_session):
    """An all-clean run (zero dirty rows) must produce zero predicted
    pairs and not crash on the empty (schemaless) edge frame. With no
    dirty twins every truth id is unique, so truth_pairs == 0 and the
    run is vacuously perfect (nothing to find, nothing found -> the
    0/0 convention is precision = recall = f1 = 1)."""
    clean = synth.pages_dataset(200, override_num_blocks=2).materialize()
    dirty = _empty_like(clean).materialize()
    assert dirty.count() == 0
    res = link_datasets(clean, dirty, LinkageConfig(num_buckets=4))
    m = res["metrics"]
    assert m["predicted_pairs"] == 0.0 and m["tp_pairs"] == 0.0
    assert m["truth_pairs"] == 0.0
    assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["f1"] == 1.0


def test_linkage_zero_error_identity(ray_session):
    """dirty == clean byte-identical (the 0% end of the error-rate
    axis): blocking must pair every record with its twin and F1 must
    be exactly 1.0."""
    clean = synth.pages_dataset(300, override_num_blocks=2).materialize()
    m = link_datasets(clean, clean, LinkageConfig(num_buckets=4))["metrics"]
    assert m["f1"] == 1.0, m


@pytest.mark.parametrize(
    "op",
    [
        lambda p: dedup.dedup_exact(p),
        lambda p: dedup.dedup_minhash(p, threshold=0.8),
        lambda p: dedup.near_dedup_keepers(p, threshold=0.8),
        lambda p: dedup.simhash_near_pairs(p),
        lambda p: dedup.ngram_dup_clusters(p),
        lambda p: text.quality_scores(p),
        lambda p: text.canonical_documents(p),
        lambda p: text.repetition_scores(p),
    ],
    ids=[
        "dedup_exact",
        "dedup_minhash",
        "near_dedup_keepers",
        "simhash_near_pairs",
        "ngram_dup_clusters",
        "quality_scores",
        "canonical_documents",
        "repetition_scores",
    ],
)
def test_ops_on_empty_corpus(ray_session, empty_corpus, op):
    out = op(empty_corpus)
    n = out.count() if hasattr(out, "count") else len(out)
    assert n == 0


def test_dedup_on_single_doc(ray_session, single_doc_corpus):
    ex = dedup.dedup_exact(single_doc_corpus).to_pandas()
    assert len(ex) == 1 and ex["n_copies"].iloc[0] == 1 and ex["keeper"].iloc[0] == 7
    # one doc can never near-dup-cluster
    assert dedup.dedup_minhash(single_doc_corpus, threshold=0.8).count() == 0
    assert dedup.near_dedup_keepers(single_doc_corpus, threshold=0.8).count() == 0


def test_dedup_on_blank_texts(ray_session, blank_text_corpus):
    """Empty strings must neither crash the shingle kernels nor be
    near-dup-clustered together (no shingles -> no bands -> no pairs);
    exact dedup still groups byte-identical empties."""
    ex = dedup.dedup_exact(blank_text_corpus).to_pandas()
    assert len(ex) == 2  # "" (x2) and " "
    dups = ex[ex["n_copies"] > 1]
    assert len(dups) == 1 and dups["keeper"].iloc[0] == 1
    assert dedup.dedup_minhash(blank_text_corpus, threshold=0.8).count() == 0
    assert dedup.near_dedup_keepers(blank_text_corpus, threshold=0.8).count() == 0
