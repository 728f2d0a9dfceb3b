"""Canonical-url dedup: kernel vectors, winner semantics, oracle
parity, and layout independence."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from rayrl.urlops import (
    URL_CANONICAL_DEDUP_ORACLE,
    _winner,
    canonicalize_urls,
    url_canonical_dedup,
)

SF = "/root/testdata/sf0.001"


def test_canonicalize_known_vectors():
    raw = [
        "https://sitea.example/e1/p2",
        "HTTP://WWW.SiteA.EXAMPLE/e1/p2",
        "http://sitea.example/e1/p2///",
        "https://www.sitea.example/e1/p2#frag",
        "sitea.example/e1/p2/",          # no scheme at all
        "https://siteb.example/x#a#b",   # fragment containing '#'
        "https://wwwx.example/p",        # 'www' not followed by '.'
    ]
    got = canonicalize_urls(pa.array(raw, pa.string())).to_pylist()
    assert got[:5] == ["sitea.example/e1/p2"] * 5
    assert got[5] == "siteb.example/x"
    assert got[6] == "wwwx.example/p"
    # chunked input path
    chunked = pa.chunked_array([raw[:3], raw[3:]])
    assert canonicalize_urls(chunked).to_pylist() == got


def test_winner_tiebreak_and_associativity():
    rows = pd.DataFrame(
        {
            "canonical_url": ["a", "a", "a", "b"],
            "kept_record_id": [9, 3, 7, 1],
            "kept_ts_us": [100, 200, 200, 50],
            "n_aliases": [1, 1, 1, 1],
        }
    )
    w = _winner(rows).sort_values("canonical_url").reset_index(drop=True)
    # ts=200 tie between ids 3 and 7 → smaller id wins
    assert w.loc[0, "kept_record_id"] == 3 and w.loc[0, "n_aliases"] == 3
    assert w.loc[1, "kept_record_id"] == 1
    # associativity: merging partial winners = one-shot winner
    part = pd.concat([_winner(rows.iloc[:2]), _winner(rows.iloc[2:])])
    pd.testing.assert_frame_equal(
        _winner(part).sort_values("canonical_url").reset_index(drop=True), w
    )


def _mirror_from_export() -> pd.DataFrame:
    """Pandas mirror over the exported variant files (independent of
    both the engine and the DuckDB twin)."""
    from rayrl.urlops import EXPORT_DIR

    import pyarrow.dataset as pads

    t = pads.dataset(f"{EXPORT_DIR}/variants").to_table()
    df = pd.DataFrame(
        {
            "canonical_url": canonicalize_urls(t.column("url")).to_pylist(),
            "kept_record_id": t.column("record_id").to_pylist(),
            "kept_ts_us": t.column("warc_ts").cast(pa.int64()).to_pylist(),
            "n_aliases": 1,
        }
    )
    return _winner(df)


def test_url_canonical_dedup_e2e(ray_session):
    got = (
        url_canonical_dedup(SF)
        .to_pandas()
        .sort_values("canonical_url")
        .reset_index(drop=True)
    )
    # every canonical url exactly once; alias mass conserved: sf0.001
    # sizes the fixture at the 2000-page floor, 3 aliases per page,
    # and page urls are unique — so every group collapses 3 → 1
    assert got["canonical_url"].is_unique
    assert len(got) == 2000
    assert (got["n_aliases"] == 3).all()

    mirror = _mirror_from_export().sort_values("canonical_url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, mirror, check_dtype=False)

    # DuckDB twin over the same export
    odf = (
        duckdb.sql(URL_CANONICAL_DEDUP_ORACLE)
        .df()
        .sort_values("canonical_url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, odf[got.columns], check_dtype=False)


def test_url_dedup_layout_independent(ray_session):
    """Re-running with a different block layout must give identical
    rows (associative winner merge + counter rng)."""
    import rayrl.synth as synth
    from rayrl.shuffle import bucketed_group_apply
    from rayrl.urlops import _alias_batch, _canon_slim

    def run(blocks: int) -> pd.DataFrame:
        v = synth.pages_dataset(500, override_num_blocks=blocks).map_batches(
            _alias_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        p = v.map_batches(
            _canon_slim, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(_winner, batch_format="pandas")
        return (
            bucketed_group_apply(p, ["canonical_url"], _winner, num_buckets=8)
            .to_pandas()
            .sort_values("canonical_url")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(2), run(17), check_dtype=False)
