"""Bucketed shuffle helpers.

Ray Data's ``groupby(keys).aggregate(...)`` / ``map_groups`` pay
per-GROUP dispatch overhead — pathological when the key cardinality is
unbounded (millions of 2-row groups). The scalable pattern (and the one
this engine uses for every unbounded-cardinality shuffle): hash the key
into a BOUNDED number of buckets, shuffle by bucket, and do the real
per-key work with a vectorized pandas groupby inside each bucket. One
Ray group = one heavyweight vectorized task; skew is capped by bucket
count and salt-able by raising it.

NULL-key contract: rows with a null key are DROPPED by the in-bucket
pandas groupby (dropna default) — correct for joins (SQL null never
equals null) but NOT for GROUP BY, where SQL keeps a NULL group. Ops
whose key can legitimately be null must encode it as an out-of-domain
sentinel before the shuffle and decode after (see
jsonops.props_value_agg).
"""

from __future__ import annotations

import zlib
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _bucket_of(batch: pa.Table, keys: list[str], num_buckets: int) -> np.ndarray:
    """Stable per-row bucket from the key columns (process-independent:
    splitmix on ints, crc32 on strings)."""
    from . import rng

    acc = np.zeros(batch.num_rows, dtype=np.uint64)
    for key in keys:
        col = batch.column(key)
        if pa.types.is_integer(col.type):
            vals = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from .bytekernels import content_hash64

            vals = content_hash64(col).view(np.uint64)  # C-speed crc pair
        else:
            vals = np.array(
                [zlib.crc32(str(v).encode()) for v in col.to_pylist()], dtype=np.uint64
            )
        acc = rng._splitmix64(acc * np.uint64(0x9E3779B97F4A7C15) ^ vals)
    return (acc % np.uint64(num_buckets)).astype(np.int32)


def bucketed_group_apply(
    ds: "ray.data.Dataset",
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """groupby-by-bucket → ``fn`` on each bucket's pandas frame.
    ``fn`` sees ALL rows of every key that hashes into the bucket (keys
    never straddle buckets) and is expected to do its own per-key
    vectorized groupby. The ``_bucket`` column is gone by the time
    ``fn``'s output is returned."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("_bucket", pa.array(_bucket_of(batch, keys, num_buckets)))

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        return fn(group.drop(columns=["_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(apply, batch_format="pandas")
    )


def distinct_rows(ds, keys: list[str], num_buckets: int = 64):
    """Global DISTINCT on ``keys`` (first row per key wins)."""
    return bucketed_group_apply(
        ds, keys, lambda df: df.drop_duplicates(subset=keys), num_buckets
    )


def group_agg(ds, keys: list[str], agg: dict[str, tuple[str, str]], num_buckets: int = 64):
    """Grouped aggregate with unbounded key cardinality.
    ``agg``: output_col → (input_col, pandas agg name), e.g.
    {"n": ("x", "size"), "total": ("x", "sum")}."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        named = {out: pd.NamedAgg(column=src, aggfunc=how) for out, (src, how) in agg.items()}
        return df.groupby(keys, sort=False, as_index=False).agg(**named)

    return bucketed_group_apply(ds, keys, run, num_buckets)


def group_sizes_pair_sum(ds, keys: list[str], num_buckets: int = 64) -> float:
    """Σ over groups of C(n,2) — computed as per-bucket partial sums so
    only ``num_buckets`` scalars reach the final reduction (the metric
    kernel for pairwise P/R/F1)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df.groupby(keys, sort=False).size().to_numpy().astype("float64")
        return pd.DataFrame({"p": [float((n * (n - 1) / 2.0).sum())]})

    out = bucketed_group_apply(ds, keys, partial, num_buckets).sum("p")
    return float(out or 0.0)


def bucketed_join(
    left,
    right,
    keys: list[str],
    num_buckets: int = 64,
    how: str = "inner",
):
    """Hash join on shared key column names via the bucketed machinery
    (no DataContext shuffle-strategy dependency, unlike Dataset.join).
    Both sides are padded to a common schema, tagged, bucketed by key,
    and pandas-merged inside each bucket — each side's rows ride the
    shuffle exactly once. Output columns = left columns + right's
    non-key columns; overlapping non-key names must be renamed by the
    caller first. If one side is schemaless-empty (rule 21), the inner
    join short-circuits to a typed empty carrying only the OTHER
    side's columns (logged); non-inner joins raise — pass a typed
    empty table when the full schema matters."""
    def _types(schema) -> dict:
        out = {}
        for name, typ in zip(schema.names, schema.types):
            if isinstance(typ, pa.DataType):
                out[name] = typ
            else:  # pandas-block schema: numpy dtype, or object (unknown)
                try:
                    out[name] = pa.from_numpy_dtype(typ)
                except (pa.ArrowNotImplementedError, TypeError):
                    out[name] = pa.null()  # Arrow promotes null→actual on concat
        return out

    lschema = left.schema()
    rschema = right.schema()
    if lschema is None or rschema is None:
        # a schemaless side is an EMPTY relation (Ray Data drops the
        # schema when every block vanished). The inner join is exactly
        # empty; emit a TYPED empty table carrying every column we can
        # still name so downstream count()/to_pandas paths keep working.
        # The schemaless side's columns are UNKNOWABLE here, so the
        # typed empty carries only the known side's — selecting a
        # missing-side column downstream KeyErrors. Warn loudly (r5
        # review); callers needing the full inner schema in the empty
        # case must pass a typed empty table instead.
        missing_side = (
            "both" if lschema is None and rschema is None
            else ("left" if lschema is None else "right")
        )
        if how != "inner":
            # non-inner output schema is left ∪ right; a schemaless side
            # makes it unknowable — a right-only (or left-only) result
            # would KeyError downstream at the first select. Raise on
            # ANY schemaless side, including both-empty (r5 review: the
            # both-None case used to bypass this and return a schemaless
            # Dataset whose first column access KeyErrors downstream).
            raise ValueError(
                f"bucketed_join: {missing_side} side is schemaless-empty; "
                f"a {how} join cannot synthesize its columns — pass a "
                "typed empty table instead (pa.table with the schema)"
            )
        if lschema is None and rschema is None:
            return left
        known = rschema if lschema is None else lschema
        import logging

        logging.getLogger(__name__).warning(
            "bucketed_join: %s side is schemaless-empty — the typed "
            "empty result carries only the other side's columns "
            "(%s); pass a typed empty table if downstream selects "
            "the %s side's columns",
            missing_side,
            list(known.names),
            missing_side,
        )
        known_types = {}
        for name, typ in zip(known.names, known.types):
            known_types[name] = typ if isinstance(typ, pa.DataType) else pa.null()
        return ray.data.from_arrow(
            pa.table({c: pa.array([], type=t) for c, t in known_types.items()})
        )
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    l_only = [c for c in lcols if c not in keys]
    r_only = [c for c in rcols if c not in keys]
    overlap = set(l_only) & set(r_only)
    if overlap:
        raise ValueError(f"rename overlapping non-key columns first: {sorted(overlap)}")
    all_types = {**_types(lschema), **{c: t for c, t in _types(rschema).items() if c in r_only}}
    int_cols = [c for c, t in all_types.items() if pa.types.is_integer(t)]

    def pad(side_tag):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {}
            for c, t in all_types.items():
                if c in batch.column_names:
                    cols[c] = batch.column(c)
                elif pa.types.is_integer(t):
                    # zero-pad, NOT null-pad: an int64 column with nulls
                    # turns float64 in the in-bucket pandas frame and
                    # silently loses precision above 2^53 (63-bit hash
                    # payloads round to DIFFERENT ints on the way back).
                    # Padded values are never read — the merge filters
                    # by _side before touching either side's columns.
                    cols[c] = pa.array(np.zeros(batch.num_rows, dtype=np.int64), t)
                else:
                    cols[c] = pa.nulls(batch.num_rows, t)
            cols["_side"] = pa.array(np.full(batch.num_rows, side_tag, dtype=np.int8))
            return pa.table(cols)

        return fn

    both = left.map_batches(pad(0), batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(pad(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0][[*keys, *l_only]]
        r = df[df["_side"] == 1][[*keys, *r_only]]
        out = l.merge(r, on=keys, how=how)
        # the null-padded union turns int columns float in pandas —
        # restore (inner-join outputs carry no nulls in these columns)
        for c in int_cols:
            if c in out.columns and out[c].dtype != "int64":
                out[c] = out[c].astype("int64")
        return out

    return bucketed_group_apply(both, keys, merge, num_buckets)


def distinct_count(ds, keys: list[str], num_buckets: int = 64) -> int:
    """COUNT(DISTINCT keys) via per-bucket partial nunique sums."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(len(df.drop_duplicates(subset=keys)))]})

    out = bucketed_group_apply(ds, keys, partial, num_buckets).sum("n")
    return int(out or 0)
