"""Property tests: the vectorized byte kernels must match the
reference Python/regex semantics exactly (these back ★-checked
oracle queries — output must stay byte-identical)."""

import re

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rayrl.bytekernels import (
    char_class_counts,
    content_hash64,
    string_view,
    token_count_kernels,
)

# re.ASCII: \s = [ \t\n\r\f\v], matching the DuckDB (RE2) oracle
# semantics the kernels implement — Python's default unicode \s also
# matches \x1c-\x1f, \xa0,  … which the oracle does not.
BPE = re.compile(r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]", re.ASCII)

TRICKY = [
    "",
    " ",
    "a",
    "hello world",
    "a  b",
    "123 abc-def!",
    "über straße",  # multi-byte chars
    "日本語 text",
    "tab\there\nnewline",
    "x" * 5000,
    "9",
    "-",
    "café au lait 42",
]


def _expected_token_counts(texts):
    n_tok = [len(t.split(" ")) if t else 0 for t in texts]
    n_bpe = [len(BPE.findall(t)) if t else 0 for t in texts]
    n_chars = [len(t) if t else 0 for t in texts]
    return n_tok, n_bpe, n_chars


def _expected_char_classes(texts):
    digits = [len(re.findall(r"[0-9]", t or "")) for t in texts]
    spaces = [(t or "").count(" ") for t in texts]
    alphas = [len(re.findall(r"[a-zA-Z]", t or "")) for t in texts]
    return digits, spaces, alphas


@pytest.mark.parametrize("texts", [TRICKY])
def test_token_kernels_tricky(texts):
    col = pa.array(texts, pa.string())
    k = token_count_kernels(col)
    e_tok, e_bpe, e_chars = _expected_token_counts(texts)
    assert list(k["n_tokens"]) == e_tok
    assert list(k["n_bpe_tokens"]) == e_bpe
    assert list(k["n_chars"]) == e_chars


@pytest.mark.parametrize("texts", [TRICKY])
def test_char_class_kernels_tricky(texts):
    col = pa.array(texts, pa.string())
    k = char_class_counts(col)
    e_d, e_s, e_a = _expected_char_classes(texts)
    assert list(k["n_digits"]) == e_d
    assert list(k["n_spaces"]) == e_s
    assert list(k["n_alpha"]) == e_a


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=50), max_size=20))
def test_kernels_property(texts):
    col = pa.array(texts, pa.string())
    k = token_count_kernels(col)
    e_tok, e_bpe, e_chars = _expected_token_counts(texts)
    assert list(k["n_tokens"]) == e_tok
    assert list(k["n_bpe_tokens"]) == e_bpe
    assert list(k["n_chars"]) == e_chars
    c = char_class_counts(col)
    e_d, e_s, e_a = _expected_char_classes(texts)
    assert list(c["n_digits"]) == e_d
    assert list(c["n_spaces"]) == e_s
    assert list(c["n_alpha"]) == e_a


def test_content_hash_deterministic_and_distinct():
    texts = ["abc", "abd", "abc", "", "abc "]
    h1 = content_hash64(pa.array(texts, pa.string()))
    h2 = content_hash64(pa.array(texts, pa.string()))
    assert (h1 == h2).all()
    assert h1[0] == h1[2]
    assert h1[0] != h1[1] and h1[0] != h1[4]
    assert (h1 >= 0).all()  # int64-positive (parquet/duckdb safe)


def test_string_view_handles_nulls_and_slices():
    col = pa.array(["aa", None, "bb", ""], pa.string())
    data, offsets = string_view(col)
    assert len(offsets) == 5
    k = token_count_kernels(col)
    assert list(k["n_tokens"]) == [1, 0, 1, 0]
    # sliced array (non-zero offset)
    sl = col.slice(1, 3)
    k2 = token_count_kernels(sl)
    assert list(k2["n_tokens"]) == [0, 1, 0]


def test_content_hash_matches_on_chunked():
    a = pa.chunked_array([["x", "yy"], ["zzz"]])
    b = pa.array(["x", "yy", "zzz"])
    assert list(content_hash64(a)) == list(content_hash64(b))


def test_langid_vectorized_matches_classify():
    """The byte-pair-table kernel must reproduce the scalar classify()
    on real fixture text plus the edge shapes (empty, null, non-ascii,
    boundary bigrams)."""
    import pyarrow.parquet as pq

    from rayrl.text import LangId

    texts = (
        pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    texts += [
        "",
        None,
        "the then there rather",
        "schen durch einem geben",
        "les des ouvertures",
        "中文网页内容测试中文网页",
        "a",
        "th",
        "x" * 3,
        "mixé café déjà vu theatre",
        "1234 5678 !!",
    ]
    stage = LangId()
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    got = stage(batch).column("lang_pred").to_pylist()
    want = [stage.classify(t) for t in texts]
    assert got == want
