"""BPE trainer/encoder (rayrl.bpe): the classic hand-computable
example, any-parallelism determinism, and the corpus query shape."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rayrl.bpe import (
    END,
    BpeEncoder,
    encode_word,
    train_bpe_from_counts,
    train_bpe,
)


def test_classic_merge_order():
    """Sennrich's example: {low:5, lower:2, newest:6, widest:3}.
    First merges must assemble 'est</w>' (6+3=9 dominates), then
    'low' (5+2=7)."""
    counts = pd.DataFrame(
        {"word": ["low", "lower", "newest", "widest"], "n": [5, 2, 6, 3]}
    )
    merges = train_bpe_from_counts(counts, n_merges=5)
    assert merges[0] == ("e", "s")       # 9 occurrences
    assert merges[1] == ("es", "t")      # 9
    assert merges[2] == ("est", END)     # 9
    assert merges[3] == ("l", "o")       # 7
    assert merges[4] == ("lo", "w")      # 7
    ranks = {m: i for i, m in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est" + END]
    assert encode_word("lowest", ranks) == ["low", "est" + END]


def test_train_bpe_layout_independent(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(2)
    words = ["alpha", "alphabet", "beta", "betamax", "gamma"]
    texts = [" ".join(rng.choice(words, size=12)) for _ in range(60)]
    for blocks, d in ((1, "a"), (8, "b")):
        p = tmp_path / d
        p.mkdir()
        t = pa.table({"doc_id": pa.array(range(60), pa.int64()), "text": texts})
        pq.write_table(t, p / "documents.parquet")
    m1 = train_bpe(str(tmp_path / "a"), n_merges=10)
    m8 = train_bpe(str(tmp_path / "b"), n_merges=10)
    assert m1 == m8 and len(m1) == 10


def test_bpe_token_counts_query(ray_session):
    from rayrl.bpe import bpe_token_counts

    out = bpe_token_counts("/root/testdata/sf0.001", n_merges=12).to_pandas()
    assert len(out) == 500
    # merging only ever shrinks: pieces ≤ chars+1 per word, and the
    # end sentinel means pieces ≥ words
    assert (out["n_bpe_pieces"] >= out["n_words"]).all()
