"""Bucketed shuffle-helper regressions (rayrl.shuffle)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rayrl.shuffle import bucketed_join


def test_join_preserves_large_int_payload_columns(ray_session):
    """Regression: null-padding the union schema turned int64 non-key
    columns float64 inside the bucket frames, silently rounding values
    above 2^53 (63-bit hash payloads came back as DIFFERENT ints and a
    chained join on them matched nothing). Zero-padding keeps them
    exact."""
    big = np.array([2**62 + 1, 2**62 + 3, -(2**62) - 7], dtype=np.int64)
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "h": pa.array(big, pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "c": pa.array([10, 20, 30], pa.int64())})
    )
    j1 = bucketed_join(left, right, ["k"])
    out = j1.to_pandas().sort_values("k").reset_index(drop=True)
    assert out["h"].tolist() == big.tolist()  # bit-exact through the join

    # and a chained join keyed on the large-int column still matches
    counts = ray.data.from_arrow(
        pa.table({"h": pa.array(big, pa.int64()), "n": pa.array([1, 1, 1], pa.int64())})
    )
    j2 = bucketed_join(j1, counts, ["h"])
    assert j2.count() == 3


def test_host_stats_counts(ray_session):
    """host_stats: exact per-host page counts / chars / distinct langs
    vs a pandas groupby, at two block layouts."""
    import pyarrow as pa

    from rayrl.stats import host_stats_ds

    urls = [f"https://h{i % 3}.example/p{i}" for i in range(60)]
    langs = ["en", "de", "en", "fr"] * 15
    texts = [f"text {'x' * (i % 7)}" for i in range(60)]
    tbl = pa.table({"url": urls, "text": texts, "lang": langs})
    exp = (
        pd.DataFrame({"host": [f"h{i % 3}.example" for i in range(60)],
                      "chars": [len(t) for t in texts], "lang": langs})
        .groupby("host")
        .agg(n_pages=("chars", "size"), total_chars=("chars", "sum"),
             n_langs=("lang", "nunique"))
        .reset_index()
    )
    for blocks in (1, 8):
        got = (
            host_stats_ds(ray.data.from_arrow(tbl).repartition(blocks))
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["host", "n_pages", "total_chars", "n_langs"]],
            exp[["host", "n_pages", "total_chars", "n_langs"]],
            check_dtype=False,
        )


# ---------------------------------------- property tests (hypothesis)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_key = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.integers(min_value=0, max_value=5),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lkeys=st.lists(_key, min_size=0, max_size=30),
    rkeys=st.lists(_key, min_size=0, max_size=30),
)
def test_bucketed_join_matches_pandas_merge(ray_session, lkeys, rkeys):
    """bucketed_join(inner) over arbitrary int64 keys (including ±2^62
    magnitudes and heavy duplicates) row-multiset-equals pandas merge."""
    left = pd.DataFrame(
        {"k": pd.Series(lkeys, dtype="int64"),
         "lv": pd.Series(range(len(lkeys)), dtype="int64")}
    )
    right = pd.DataFrame(
        {"k": pd.Series(rkeys, dtype="int64"),
         "rv": pd.Series(range(len(rkeys)), dtype="int64")}
    )
    expect = left.merge(right, on="k").sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    got = bucketed_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), ["k"], num_buckets=4
    ).to_pandas()
    if expect.empty:
        assert got.empty  # empty joins may come back schemaless
        return
    got = got.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "lv", "rv"]], expect[["k", "lv", "rv"]], check_dtype=False
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.one_of(st.text(alphabet="abcd", max_size=3), st.just("")),
        min_size=1,
        max_size=40,
    )
)
def test_group_agg_matches_pandas_groupby(ray_session, keys):
    """group_agg sum/size over arbitrary small string keys equals a
    pandas groupby (bucket hashing must neither drop nor merge keys)."""
    from rayrl.shuffle import group_agg

    df = pd.DataFrame({"k": keys, "v": np.arange(len(keys), dtype=np.int64)})
    expect = (
        df.groupby("k", as_index=False)
        .agg(s=("v", "sum"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    got = (
        group_agg(ray.data.from_pandas(df), ["k"], {"s": ("v", "sum"), "n": ("v", "size")},
                  num_buckets=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "s", "n"]], expect[["k", "s", "n"]], check_dtype=False
    )


def test_bucketed_join_schemaless_sides(ray_session):
    """Rule-21 short-circuits: an all-filtered (schemaless) side must
    yield a typed empty for inner joins, and RAISE for non-inner joins
    on EITHER side — a left join can't synthesize left∪right columns
    from a side with no schema (r5 review: the schemaless-left case
    used to silently return right-only columns)."""
    import pytest

    from rayrl.shuffle import bucketed_join

    full = ray.data.from_pandas(
        pd.DataFrame({"k": pd.Series([1, 2], dtype="int64"), "v": [10, 20]})
    )
    empty = (
        ray.data.from_pandas(pd.DataFrame({"k": pd.Series([1], dtype="int64"), "w": [5]}))
        .filter(lambda r: False)
        .materialize()
    )
    assert empty.schema() is None  # precondition: Ray dropped the schema

    got = bucketed_join(empty, full, ["k"])  # inner: typed empty
    assert got.count() == 0 and "v" in got.schema().names
    got = bucketed_join(full, empty, ["k"])
    assert got.count() == 0 and "v" in got.schema().names

    with pytest.raises(ValueError, match="schemaless-empty"):
        bucketed_join(empty, full, ["k"], how="left")
    with pytest.raises(ValueError, match="schemaless-empty"):
        bucketed_join(full, empty, ["k"], how="left")
    # BOTH sides schemaless must also raise for non-inner joins (r5
    # review: this case used to slip past the one-side raises)
    with pytest.raises(ValueError, match="schemaless-empty"):
        bucketed_join(empty, empty, ["k"], how="left")
