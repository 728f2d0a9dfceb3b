"""Analytic reshaping operators: global ranking, pivot-to-wide, and
per-group z-score normalization — the feature-engineering shapes
between raw tables and model-ready matrices.

Scale notes per op:

- ``ranked_orders`` — global ``row_number() OVER (ORDER BY ...)``
  without any driver materialization of rows: ONE range-partition
  sort (Ray Data's distributed sort, the only all-to-all), then a
  per-block metadata pass (first key + row count, O(blocks) rows to
  the driver) whose exclusive prefix sum is broadcast back and added
  to each block's local arange. The two block-level passes use
  ``batch_size=None`` so both see identical (whole-block) batching —
  the composite first-row key identifies a block because blocks
  partition a total order on unique (value, id) tuples.
- ``user_event_type_pivot`` — long→wide over a BOUNDED category set
  (the pivot columns must be enumerable up front; unbounded pivots
  are a different op). Counts pivot inside the per-batch partial, so
  the shuffle carries one row per (user × batch), ints only.
- ``normalized_order_prices`` — two-phase: bounded-cardinality moment
  aggregate (native groupby, 48-byte states), driver finalizes
  mean/std per group, broadcast dict, then a stateless vectorized
  transform pass. The data rows ride NO shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .shuffle import bucketed_group_apply, group_agg

EVENT_TYPES = ("click", "view", "purchase", "error")


# ------------------------------------------------------ global rank

def global_row_number(ds, keys: list, descending: list, out_col: str = "rank"):
    """Generic ``row_number() OVER (ORDER BY keys)`` with no driver
    materialization of data rows. Requires the key tuple to be UNIQUE
    per row (give it a tie-break id column) — blocks of the sorted
    dataset then partition a total order, so a block is identified by
    its first row's key tuple.

    Scale shape: ONE range-partition sort (the inherent all-to-all of
    any global ordering), then a per-block metadata pass (first key +
    row count, O(blocks) rows to the driver) whose exclusive prefix
    sum broadcasts back and adds to each block's local arange. Both
    block-level passes use ``batch_size=None`` so they see identical
    whole-block batching."""
    ds = ds.sort(keys, descending=descending).materialize()
    kcols = [f"k{i}" for i in range(len(keys))]

    def block_meta(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({c: [] for c in kcols} | {"n": []})
        row = {c: [t.column(k)[0].as_py()] for c, k in zip(kcols, keys)}
        row["n"] = [t.num_rows]
        return pd.DataFrame(row)

    meta = ds.map_batches(block_meta, batch_format="pyarrow", batch_size=None).to_pandas()
    if len(meta):
        meta = meta.sort_values(kcols, ascending=[not d for d in descending])
        offs = np.concatenate([[0], np.cumsum(meta["n"].to_numpy())[:-1]])
        table = {
            tuple(r): int(o)
            for r, o in zip(meta[kcols].itertuples(index=False, name=None), offs)
        }
    else:
        table = {}
    ref = ray.put(table)

    def rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        off = ray.get(ref)[tuple(t.column(k)[0].as_py() for k in keys)]
        return t.append_column(
            out_col,
            pa.array(off + 1 + np.arange(t.num_rows, dtype=np.int64), pa.int64()),
        )

    return ds.map_batches(rank, batch_format="pyarrow", batch_size=None)


def ranked_orders(sf_dir: str):
    """Global revenue rank per order (row_number over totalprice DESC,
    orderkey ASC tie-break)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return global_row_number(
        ds, ["o_totalprice", "o_orderkey"], descending=[True, False]
    )


RANKED_ORDERS_ORACLE = """
    SELECT o_orderkey, o_totalprice,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS rank
    FROM orders
"""


# ------------------------------------------------------------ pivot

def user_event_type_pivot(sf_dir: str):
    """Long→wide: per-user event counts by type + purchase revenue."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ct = (
            pd.crosstab(df["user_id"], df["event_type"])
            .reindex(columns=list(EVENT_TYPES), fill_value=0)
            .add_prefix("n_")
        )
        pv = df.loc[df["event_type"] == "purchase"].groupby("user_id")["value"].sum()
        ct["purchase_value"] = pv.reindex(ct.index, fill_value=0.0)
        return ct.reset_index()

    red = group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        {f"n_{et}": (f"n_{et}", "sum") for et in EVENT_TYPES}
        | {"purchase_value": ("purchase_value", "sum")},
        num_buckets=16,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for et in EVENT_TYPES:
            df[f"n_{et}"] = df[f"n_{et}"].astype("int64")
        df["purchase_value"] = np.round(df["purchase_value"], 2)
        return df

    return red.map_batches(finish, batch_format="pandas")


USER_PIVOT_ORACLE = """
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
           round(COALESCE(sum(value) FILTER (WHERE event_type = 'purchase'), 0.0), 2)
               AS purchase_value
    FROM events GROUP BY user_id
"""


# ------------------------------------------------- z-score normalize

def normalized_order_prices(sf_dir: str):
    """Per-priority z-score of o_totalprice (the per-group feature
    standardization pass; sample stddev)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def moments(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.groupby("o_orderpriority", sort=False, as_index=False).agg(
            n=("o_totalprice", "size"),
            s=("o_totalprice", "sum"),
            ss=("o_totalprice", lambda x: float((x.to_numpy() ** 2).sum())),
        )

    m = (
        group_agg(
            ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
            ["o_orderpriority"],
            {"n": ("n", "sum"), "s": ("s", "sum"), "ss": ("ss", "sum")},
            num_buckets=4,
        ).to_pandas()  # ≤ |priorities| rows
    )
    stats = {}
    for _, r in m.iterrows():
        n, s, ss = float(r["n"]), float(r["s"]), float(r["ss"])
        mean = s / n
        var = (ss - s * s / n) / (n - 1) if n > 1 else float("nan")
        stats[r["o_orderpriority"]] = (mean, float(np.sqrt(var)))
    ref = ray.put(stats)

    def transform(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        pr = batch.column("o_orderpriority").to_pylist()
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        mean = np.array([st[p][0] for p in pr])
        std = np.array([st[p][1] for p in pr])
        z = np.round((v - mean) / std, 6)
        return batch.append_column("z_price", pa.array(z, pa.float64()))

    return ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True)


NORMALIZED_PRICES_ORACLE = """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           round((o_totalprice - avg(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 6) AS z_price
    FROM orders WINDOW w AS (PARTITION BY o_orderpriority)
"""


# ------------------------------------------------ grouped string agg

def customer_order_list(sf_dir: str):
    """LISTAGG / collect_list: per customer, the comma-joined ordered
    order-key list — the feature-store "events as one string/array"
    shape. One bucketed shuffle on the group key; the join itself is
    per-group Python (inherent: the output IS a per-group string), but
    each group is touched exactly once and the shuffle carries two int
    columns."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderkey"], kind="mergesort")
        g = df.groupby("o_custkey", sort=False)["o_orderkey"]
        out = g.agg(lambda s: ",".join(map(str, s))).reset_index()
        out.columns = ["o_custkey", "order_keys"]
        out["n_orders"] = g.size().to_numpy().astype(np.int64)
        return out

    return bucketed_group_apply(ds, ["o_custkey"], agg)


CUSTOMER_ORDER_LIST_ORACLE = """
    SELECT o_custkey,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
               AS order_keys,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
"""


ANALYTICS_QUERIES = {
    "ranked_orders": ranked_orders,
    "user_event_type_pivot": user_event_type_pivot,
    "normalized_order_prices": normalized_order_prices,
    "customer_order_list": customer_order_list,
}
ANALYTICS_ORACLES = {
    "ranked_orders": RANKED_ORDERS_ORACLE,
    "user_event_type_pivot": USER_PIVOT_ORACLE,
    "normalized_order_prices": NORMALIZED_PRICES_ORACLE,
    "customer_order_list": CUSTOMER_ORDER_LIST_ORACLE,
}
