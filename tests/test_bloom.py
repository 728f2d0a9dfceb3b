"""Bloom semi-join properties: no false negatives, calibrated false
positives, OR-merge associativity. Oracle parity of the query rides
tests/test_entry_oracles.py."""

import numpy as np
import pyarrow as pa

from rayrl.bloom import BLOOM_BITS, BLOOM_K, bloom_build_agg, bloom_contains


def test_no_false_negatives_and_low_fp():
    agg = bloom_build_agg("x")
    keys = np.arange(0, 50_000, dtype=np.int64) * 7 + 3
    bits = agg.accumulate_block(agg.init(None), pa.table({"x": keys}))
    assert bloom_contains(bits, keys, BLOOM_BITS, BLOOM_K).all()
    probe = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    assert bloom_contains(bits, probe, BLOOM_BITS, BLOOM_K).mean() < 0.005


def test_merge_equals_single_pass():
    agg = bloom_build_agg("x")
    keys = np.arange(0, 20_000, dtype=np.int64)
    whole = agg.accumulate_block(agg.init(None), pa.table({"x": keys}))
    merged = agg.init(None)
    for lo in range(0, 20_000, 3_000):
        part = agg.accumulate_block(agg.init(None), pa.table({"x": keys[lo : lo + 3_000]}))
        merged = agg.merge(merged, part)
    assert np.array_equal(whole, merged)
