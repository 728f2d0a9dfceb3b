"""Unit tests for the temporal operators and the exact distributed
quantile (oracle parity at sf0.01 is covered by test_entry_oracles)."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data

from rayrl.quantiles import distributed_quantiles


def _expected(vals, q):
    """quantile_cont semantics: r = q*(n-1), (1-frac)*lo + frac*hi."""
    s = np.sort(np.asarray(vals, dtype=np.float64))
    r = q * (len(s) - 1)
    lo, hi = math.floor(r), math.ceil(r)
    frac = r - lo
    return round((1 - frac) * s[lo] + frac * s[hi], 4)


@pytest.fixture()
def grouped_ds(ray_session):
    rng = np.random.default_rng(7)
    frames = []
    frames.append(pd.DataFrame({"g": "a", "x": rng.normal(100.0, 25.0, 5000)}))
    frames.append(pd.DataFrame({"g": "b", "x": np.full(777, 42.5)}))  # all-duplicate
    frames.append(pd.DataFrame({"g": "c", "x": [3.0, -1.5]}))  # two values
    frames.append(pd.DataFrame({"g": "d", "x": [9.25]}))  # singleton
    df = pd.concat(frames, ignore_index=True)
    return df, ray.data.from_pandas(df).repartition(8)


def test_quantiles_match_reference(grouped_ds):
    df, ds = grouped_ds
    out = distributed_quantiles(ds, "x", ["g"], qs=(0.25, 0.5, 0.75))
    for _, row in out.iterrows():
        want = _expected(df[df["g"] == row["g"]]["x"], row["q"])
        assert row["value"] == pytest.approx(want, abs=1e-4), (row["g"], row["q"])


def test_quantiles_forced_multipass(grouped_ds):
    """Tiny gate + coarse bins force several histogram refinement
    passes; the result must stay exact."""
    df, ds = grouped_ds
    out = distributed_quantiles(ds, "x", ["g"], qs=(0.1, 0.9), bins=8, collect_gate=4)
    for _, row in out.iterrows():
        want = _expected(df[df["g"] == row["g"]]["x"], row["q"])
        assert row["value"] == pytest.approx(want, abs=1e-4), (row["g"], row["q"])


def test_quantiles_negative_and_parallelism_independent(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"g": "n", "x": rng.normal(-50.0, 10.0, 3000)})
    a = distributed_quantiles(ray.data.from_pandas(df).repartition(2), "x", ["g"])
    b = distributed_quantiles(ray.data.from_pandas(df).repartition(13), "x", ["g"])
    pd.testing.assert_frame_equal(
        a.sort_values(["g", "q"]).reset_index(drop=True),
        b.sort_values(["g", "q"]).reset_index(drop=True),
    )
    for _, row in a.iterrows():
        assert row["value"] == pytest.approx(_expected(df["x"], row["q"]), abs=1e-4)
