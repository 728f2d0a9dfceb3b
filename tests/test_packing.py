"""Packing invariants: the boundary-piece merge path (narrow id
ranges force packs to straddle ranges) must produce the identical pack
set as the near-single-range default. Oracle parity of both queries
rides tests/test_entry_oracles.py."""

import pandas as pd

from rayrl.packing import packed_texts

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_boundary_merge_equals_wide_ranges(ray_session):
    wide = _canon(packed_texts(SF).to_pandas())
    narrow = _canon(packed_texts(SF, range_bits=4).to_pandas())  # 16-id ranges
    assert len(wide) > 0
    pd.testing.assert_frame_equal(wide, narrow)


def test_tiny_budget_matches_pandas_window(ray_session):
    """budget far below the per-doc token count: pack ids skip, many
    packs straddle ranges — the degenerate shapes. Expected values
    recomputed independently with a pandas window."""
    from rayrl.packing import pack_assignments

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    toks = docs["text"].str.split(" ").str.len()
    expected = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "n_tokens": toks.astype("int64"),
            "pack_id": ((toks.cumsum() - toks) // 64).astype("int64"),
        }
    )
    got = pack_assignments(SF, budget=64, range_bits=4).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(expected), check_dtype=False)

    # packed_texts under the same degenerate shape: every doc id
    # present exactly once, text round-trips by token count
    packs = packed_texts(SF, budget=64, range_bits=4).to_pandas()
    assert packs["n_docs"].sum() == len(docs)
    assert packs["n_tokens"].sum() == int(toks.sum())
    joined_tokens = packs["text"].str.split(" ").str.len().sum()
    assert joined_tokens == int(toks.sum())  # " ".join adds n-1 separators per pack

