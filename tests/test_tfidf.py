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
