"""Exact distributed quantiles by iterative histogram refinement.

The scale problem: an exact quantile needs order statistics, and a
distributed sort of the whole column to find two elements is absurd at
100 TB. The classic fix (and the one here): binary-search the VALUE
domain with histogram passes. Each pass is a cheap vectorized
map_batches scan emitting bounded (target, bin, count) partials; the
driver narrows each target's interval to the bin containing its rank
and repeats until the surviving candidate count fits a small gate,
then one filter pass collects just those candidates and `np.partition`
resolves the exact element. No shuffle ever carries data rows — only
histogram partials (≤ targets × bins ints per pass).

Exactness trick: values are mapped monotonically to uint64 via the
IEEE-754 bit flip (sign bit xor for positives, full complement for
negatives), so interval membership and bin splitting are exact integer
arithmetic — none of the float-boundary double-count bugs equal-width
float binning invites. NaNs are excluded at the first scan (same as
SQL aggregates). Guaranteed termination: the integer range shrinks
``bins``-fold per pass (≤ 6 passes for the full 64-bit domain), and a
single repeated value collapses the range to width 0, which resolves
directly.

Interpolation matches DuckDB ``quantile_cont``: rank r = q·(n−1),
v = (1−frac)·v_floor + frac·v_ceil (verified bit-order of operations).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

import ray.data

from .shuffle import group_agg

BINS = 4096
COLLECT_GATE = 2048


def _f2u(x: np.ndarray) -> np.ndarray:
    """Monotone IEEE-754 double → uint64 (NaN-free input)."""
    b = np.ascontiguousarray(x, dtype=np.float64).view(np.int64)
    return np.where(b >= 0, b + np.int64(-(2**63)), ~b).view(np.uint64)


def _u2f(u: int) -> float:
    """Inverse of _f2u for one point — resolves a width-0 interval
    directly (no data collect needed: the interval IS the value)."""
    uu = np.uint64(u)
    b = (
        np.int64(uu - np.uint64(2**63))
        if u >= 2**63
        else np.array([~uu], dtype=np.uint64).view(np.int64)[0]
    )
    return float(np.array([b], dtype=np.int64).view(np.float64)[0])


@dataclass
class _Target:
    group: tuple
    rank: int  # remaining rank within the current interval
    lo: int = 0  # inclusive, uint64 domain
    hi: int = 2**64 - 1  # inclusive
    count: int | None = None  # values currently inside [lo, hi]
    done: bool = False
    value: float | None = None  # resolved order statistic


def _group_key(df: pd.DataFrame, group_cols: list[str]) -> pd.Series:
    return pd.Series(list(zip(*(df[c] for c in group_cols))), index=df.index)


def distributed_quantiles(
    ds: "ray.data.Dataset",
    value_col: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    bins: int = BINS,
    collect_gate: int = COLLECT_GATE,
):
    """Exact per-group quantiles of ``value_col``. Group cardinality is
    assumed bounded (each group adds 2·len(qs) targets to the broadcast
    state); the DATA per group is unbounded — that is what the
    histogram refinement handles. Returns a pandas DataFrame with
    ``group_cols + [q, value]`` (value rounded to 4 to absorb the final
    interpolation's last-ulp indeterminacy vs other engines)."""
    ds = ds.materialize()  # scanned once per refinement pass

    # Pass A: per-group counts of COUNTABLE values — the same
    # NaN/null-excluding convention every later scan uses. A plain row
    # Count() would include null/NaN rows, inflating n: the q=0.75 rank
    # then points past the available order statistics (IndexError in
    # the reduce) and disagrees with quantile_cont, which ignores NULLs
    # (r5 review).
    def _n_countable(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[value_col].to_numpy(dtype=np.float64)
        out = df.loc[~np.isnan(vals), group_cols].copy()
        out["n"] = 1
        return out.groupby(group_cols, sort=False, as_index=False).agg(n=("n", "sum"))

    counts = group_agg(
        ds.map_batches(_n_countable, batch_format="pandas"),
        group_cols,
        {"n": ("n", "sum")},
    ).to_pandas()

    targets: dict[int, _Target] = {}
    plan: list[tuple[tuple, float, int, int, float]] = []  # group, q, tid_lo, tid_hi, frac
    for _, row in counts.iterrows():
        g = tuple(row[c] for c in group_cols)
        n = int(row["n"])
        if n == 0:
            continue
        for q in qs:
            r = q * (n - 1)
            lo_r, hi_r = math.floor(r), math.ceil(r)
            ids = []
            for rk in (lo_r, hi_r):
                tid = len(targets)
                # dedupe identical (group, rank) targets
                match = [
                    t for t, tg in targets.items() if tg.group == g and tg.rank == rk
                ]
                if match:
                    ids.append(match[0])
                else:
                    targets[tid] = _Target(group=g, rank=rk, count=n)
                    ids.append(tid)
            plan.append((g, q, ids[0], ids[1], r - lo_r))

    # an all-duplicate group only converges by width collapse: the
    # interval shrinks log2(bins) bits per pass, so budget 64 bits + 2
    max_passes = math.ceil(64 / math.log2(bins)) + 2
    for _ in range(max_passes):
        active = {t: tg for t, tg in targets.items() if not tg.done}
        if not active:
            break
        # width-0 intervals ARE their value — resolve with no collect.
        # (A narrow-but-heavy interval keeps refining instead: the old
        # `hi - lo < bins` collect gate pulled every matching row to
        # the driver, unbounded for a value repeated 10⁸ times — r5
        # review. One more histogram pass at width < bins collapses it
        # to width 0 for free.)
        for tg in active.values():
            if tg.lo == tg.hi:
                tg.value = _u2f(tg.lo)
                tg.done = True
        # bounded direct-resolve: only intervals whose COUNT fits the
        # gate ever ship rows to the driver
        narrow = {
            t: tg for t, tg in active.items()
            if not tg.done and tg.count <= collect_gate
        }
        if narrow:
            _collect_resolve(ds, value_col, group_cols, narrow)
        active = {t: tg for t, tg in targets.items() if not tg.done}
        if not active:
            break
        _histogram_narrow(ds, value_col, group_cols, active, bins)
    else:  # pragma: no cover - 4096-fold shrink per pass always lands
        raise RuntimeError("quantile refinement failed to converge")

    out_rows = []
    for g, q, tl, th, frac in plan:
        vlo, vhi = targets[tl].value, targets[th].value
        v = (1 - frac) * vlo + frac * vhi
        out_rows.append({**dict(zip(group_cols, g)), "q": q, "value": round(v, 4)})
    return pd.DataFrame(out_rows)


def _scan_state(targets: dict[int, _Target], group_cols: list[str]):
    """Broadcastable per-group target table for the scan closures."""
    by_group: dict[tuple, list[tuple[int, int, int]]] = {}
    for t, tg in targets.items():
        by_group.setdefault(tg.group, []).append((t, tg.lo, tg.hi))
    return by_group


def _histogram_narrow(ds, value_col, group_cols, targets, bins):
    by_group = _scan_state(targets, group_cols)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        tids, bs, cs = [], [], []
        for g, grp in df.groupby(_group_key(df, group_cols), sort=False):
            tlist = by_group.get(g)
            if not tlist:
                continue
            vals = grp[value_col].to_numpy(dtype=np.float64)
            u = _f2u(vals[~np.isnan(vals)])
            for t, lo, hi in tlist:
                m = (u >= np.uint64(lo)) & (u <= np.uint64(hi))
                if not m.any():
                    continue
                width = (hi - lo) // bins + 1
                idx = ((u[m] - np.uint64(lo)) // np.uint64(width)).astype(np.int64)
                cnt = np.bincount(idx, minlength=bins)
                nz = np.flatnonzero(cnt)
                tids.append(np.full(len(nz), t, dtype=np.int64))
                bs.append(nz.astype(np.int64))
                cs.append(cnt[nz].astype(np.int64))
        if not tids:
            return pd.DataFrame({"t": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"t": np.concatenate(tids), "b": np.concatenate(bs), "c": np.concatenate(cs)}
        )

    partials = ds.map_batches(hist, batch_format="pandas")
    reduced = group_agg(partials, ["t", "b"], {"c": ("c", "sum")}).to_pandas()
    for t, sub in reduced.groupby("t"):
        tg = targets[int(t)]
        sub = sub.sort_values("b")
        cum = sub["c"].cumsum().to_numpy()
        pos = int(np.searchsorted(cum, tg.rank + 1))
        b = int(sub["b"].iloc[pos])
        before = int(cum[pos - 1]) if pos > 0 else 0
        width = (tg.hi - tg.lo) // bins + 1
        new_lo = tg.lo + b * width
        tg.hi = min(tg.hi, new_lo + width - 1)
        tg.lo = new_lo
        tg.rank -= before
        tg.count = int(sub["c"].iloc[pos])


def _collect_resolve(ds, value_col, group_cols, targets):
    by_group = _scan_state(targets, group_cols)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        ts, vs = [], []
        for g, grp in df.groupby(_group_key(df, group_cols), sort=False):
            tlist = by_group.get(g)
            if not tlist:
                continue
            vals = grp[value_col].to_numpy(dtype=np.float64)
            vals = vals[~np.isnan(vals)]
            u = _f2u(vals)
            for t, lo, hi in tlist:
                m = (u >= np.uint64(lo)) & (u <= np.uint64(hi))
                if m.any():
                    ts.append(np.full(int(m.sum()), t, dtype=np.int64))
                    vs.append(vals[m])
        if not ts:
            return pd.DataFrame({"t": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="float64")})
        return pd.DataFrame({"t": np.concatenate(ts), "v": np.concatenate(vs)})

    got = ds.map_batches(pick, batch_format="pandas").to_pandas()
    for t, sub in got.groupby("t"):
        tg = targets[int(t)]
        vals = sub["v"].to_numpy()
        tg.value = float(np.partition(vals, tg.rank)[tg.rank])
        tg.done = True


# ----------------------------------------------------------- queries

def order_price_quantiles(sf_dir: str):
    """Exact o_totalprice quartiles per o_orderpriority (the
    distributed-quantile operator's driver query)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    return distributed_quantiles(ds, "o_totalprice", ["o_orderpriority"])


ORDER_QUANTILES_ORACLE = """
    WITH t AS (
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.25) AS q25,
               quantile_cont(o_totalprice, 0.50) AS q50,
               quantile_cont(o_totalprice, 0.75) AS q75
        FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, 0.25 AS q, round(q25, 4) AS value FROM t
    UNION ALL
    SELECT o_orderpriority, 0.50 AS q, round(q50, 4) AS value FROM t
    UNION ALL
    SELECT o_orderpriority, 0.75 AS q, round(q75, 4) AS value FROM t
"""

def order_price_mad(sf_dir: str):
    """Median absolute deviation per group — the robust-statistics
    two-phase composition: phase 1 finds each group's exact median
    (histogram refinement, no sort), the medians broadcast into a
    stateless |x − m| transform, and phase 2 runs the SAME refinement
    over the deviations. Nothing but histogram partials ever reaches
    the driver — MAD at 100 TB costs two quantile scans."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).materialize()

    med = distributed_quantiles(ds, "o_totalprice", ["o_orderpriority"], qs=(0.5,))
    med_map = dict(zip(med["o_orderpriority"], med["value"]))
    import ray as _ray

    ref = _ray.put(med_map)

    def dev(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(ref)
        med_col = df["o_orderpriority"].map(m).to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"],
                "adev": np.abs(df["o_totalprice"].to_numpy(dtype=np.float64) - med_col),
            }
        )

    devs = ds.map_batches(dev, batch_format="pandas")
    mad = distributed_quantiles(devs, "adev", ["o_orderpriority"], qs=(0.5,))
    out = mad.rename(columns={"value": "mad"})[["o_orderpriority", "mad"]]
    out["median"] = out["o_orderpriority"].map(med_map)
    return out[["o_orderpriority", "median", "mad"]]


ORDER_MAD_ORACLE = """
    WITH med AS (
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 4) AS m
        FROM orders GROUP BY 1
    )
    SELECT o.o_orderpriority, med.m AS median,
           round(quantile_cont(abs(o.o_totalprice - med.m), 0.5), 4) AS mad
    FROM orders o JOIN med ON o.o_orderpriority = med.o_orderpriority
    GROUP BY o.o_orderpriority, med.m
"""

P90 = 0.9


def docs_above_p90_length(sf_dir: str, q: float = P90):
    """Quantile-gated corpus filter — the statistical length/quality
    cut every training pipeline runs (keep docs above the corpus p90
    length). The gate pattern: ONE distributed statistic (histogram
    refinement, no sort, no driver rows beyond histogram partials)
    broadcasts as a scalar into a stateless streaming filter — the
    corpus itself never shuffles."""
    import pyarrow as pa

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "g", pa.array(np.zeros(batch.num_rows, np.int8))
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    qdf = distributed_quantiles(tagged, "n_chars", ["g"], qs=(q,))
    thr = float(qdf["value"].iloc[0])

    def filt(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(v > thr))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


DOCS_P90_ORACLE = f"""
    SELECT doc_id, n_chars FROM documents
    WHERE n_chars > (SELECT round(quantile_cont(n_chars, {P90}), 4) FROM documents)
"""

QUANTILE_QUERIES = {
    "order_price_quantiles": order_price_quantiles,
    "order_price_mad": order_price_mad,
    "docs_above_p90_length": docs_above_p90_length,
}
QUANTILE_ORACLES = {
    "order_price_quantiles": ORDER_QUANTILES_ORACLE,
    "order_price_mad": ORDER_MAD_ORACLE,
    "docs_above_p90_length": DOCS_P90_ORACLE,
}
