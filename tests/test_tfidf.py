"""The two tfidf plans (fused broadcast-vocabulary vs bucketed-join
fallback) must be row-identical — the fallback is the >20M-vocab scale
path and nothing else exercises it. Oracle parity of the default plan
rides tests/test_entry_oracles.py."""

import pandas as pd

from rayrl.tfidf import tfidf_top_terms

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_fused_equals_join_fallback(ray_session):
    fused = _canon(tfidf_top_terms(SF).to_pandas())
    joined = _canon(tfidf_top_terms(SF, broadcast_vocab_max=0).to_pandas())
    assert len(fused) > 0
    pd.testing.assert_frame_equal(fused, joined)


def test_doc_surprisal_paths_agree(ray_session):
    from rayrl.tfidf import doc_surprisal

    sf = "/root/testdata/sf0.01"
    broad = doc_surprisal(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    joined = (
        doc_surprisal(sf, broadcast_gate=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(broad) == 500 and (broad["surprisal"] > 0).all()
    pd.testing.assert_frame_equal(broad, joined, check_dtype=False)


def test_inverted_index_cap_merge_layout_independent(ray_session):
    """The per-batch postings combiner (keep ≤cap smallest doc_ids per
    term locally, merge + re-cap in the reduce) must equal the global
    cap at ANY block layout, and pdf must count UNCAPPED distinct docs."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayrl.tfidf import inverted_index_ds

    rng = np.random.default_rng(7)
    docs = [
        " ".join(rng.choice(["alpha", "beta", "gamma", "delta"], size=6))
        for _ in range(40)
    ]
    tbl = pa.table({"doc_id": pa.array(range(40), pa.int64()), "text": docs})

    def brute(min_df, cap):
        post = {}
        for i, t in enumerate(docs):
            for term in set(t.split(" ")):
                post.setdefault(term, []).append(i)
        rows = [
            (t, len(ids), ",".join(map(str, sorted(ids)[:cap])))
            for t, ids in post.items()
            if len(ids) >= min_df
        ]
        return sorted(rows)

    expect = brute(min_df=3, cap=5)
    for blocks in (1, 8):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = inverted_index_ds(ds, min_df=3, cap=5).to_pandas()
        rows = sorted(zip(got["term"], got["df"], got["postings"]))
        assert rows == expect, blocks


def test_dsir_paths_agree(ray_session):
    """Broadcast-fused vs join-fallback DSIR weights must be identical,
    target-slice docs must score higher on average than the rest, and
    every doc gets a weight."""
    from rayrl.tfidf import dsir_logratio

    sf = "/root/testdata/sf0.01"
    broad = dsir_logratio(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    joined = (
        dsir_logratio(sf, broadcast_gate=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(broad) == 500
    pd.testing.assert_frame_equal(broad, joined, check_dtype=False)

    import pyarrow.parquet as pq

    langs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    m = broad.merge(langs, on="doc_id")
    assert m[m["lang"] == "en"]["logratio"].mean() > m[m["lang"] != "en"]["logratio"].mean()


def test_bigram_surprisal_paths_agree(ray_session):
    from rayrl.tfidf import doc_bigram_surprisal

    sf = "/root/testdata/sf0.01"
    broad = (
        doc_bigram_surprisal(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    joined = (
        doc_bigram_surprisal(sf, broadcast_gate=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(broad) == 500 and (broad["surprisal"] > 0).all()
    pd.testing.assert_frame_equal(broad, joined, check_dtype=False)


def test_curriculum_buckets_ntile_rule(ray_session):
    """With k=7 over 500 docs (500 = 7*71 + 3) the first 3 tiles take
    72 rows and the rest 71 (SQL NTILE), and buckets are monotone in
    (surprisal, doc_id) order."""
    import numpy as np

    from rayrl.tfidf import curriculum_buckets, doc_surprisal

    got = curriculum_buckets(SF, k=7).to_pandas()
    sizes = got.groupby("bucket").size().sort_index()
    assert list(sizes) == [72, 72, 72, 71, 71, 71, 71]
    s = doc_surprisal(SF).to_pandas()
    merged = got.merge(s[["doc_id", "surprisal"]], on="doc_id")
    merged = merged.sort_values(["surprisal", "doc_id"]).reset_index(drop=True)
    assert (np.diff(merged["bucket"].to_numpy()) >= 0).all()
