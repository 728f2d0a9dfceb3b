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


def test_quantiles_exclude_nulls_like_sql(ray_session):
    """NULL/NaN values must not inflate the rank base: quantile_cont
    ignores NULLs, and the old row Count() pushed the q=0.75 rank past
    the available order statistics (IndexError) — r5 review."""
    rng = np.random.default_rng(5)
    vals = rng.normal(100, 10, 300)
    df = pd.DataFrame(
        {
            "g": ["a"] * 450,
            "v": np.concatenate([vals, np.full(150, np.nan)]),
        }
    )
    got = distributed_quantiles(ray.data.from_pandas(df).repartition(4), "v", ["g"])
    clean = np.sort(vals)
    for q in (0.25, 0.5, 0.75):
        r = q * (len(clean) - 1)
        lo, hi = math.floor(r), math.ceil(r)
        want = (1 - (r - lo)) * clean[lo] + (r - lo) * clean[hi]
        assert abs(float(got.loc[got["q"] == q, "value"].iloc[0]) - round(want, 4)) < 1e-9


def test_quantiles_heavy_hitter_resolves_without_driver_collect(ray_session, monkeypatch):
    """A value repeated far beyond the collect gate must resolve by
    width collapse, never by shipping its rows to the driver (the old
    `hi - lo < bins` gate collected ALL matching rows — r5 review).
    The monkeypatch asserts every collect honors the gate."""
    from rayrl import quantiles as qmod

    orig = qmod._collect_resolve
    gate = 64

    def guarded(ds, value_col, group_cols, targets):
        for tg in targets.values():
            assert tg.count <= gate, f"collect of {tg.count} rows breaches the gate"
        return orig(ds, value_col, group_cols, targets)

    monkeypatch.setattr(qmod, "_collect_resolve", guarded)
    # 5000 copies of the median value + unique tails
    df = pd.DataFrame(
        {
            "g": ["a"] * 7000,
            "v": np.concatenate(
                [np.full(5000, 42.5), np.arange(1000), 1000 + np.arange(1000.0)]
            ),
        }
    )
    got = distributed_quantiles(
        ray.data.from_pandas(df).repartition(4), "v", ["g"], collect_gate=gate
    )
    assert float(got.loc[got["q"] == 0.5, "value"].iloc[0]) == 42.5
