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
