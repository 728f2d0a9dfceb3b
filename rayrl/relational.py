"""Relational operator suite over the driver test tables — each op is
the Ray-Data-first re-expression of a reference linkage-pipeline
relational pattern (SURVEY.md §2.3), exercised against DuckDB oracles
by ``__ray_entry__``.

Design rules applied throughout:
- column pruning at the read (``columns=[...]``),
- pre-aggregation inside map_batches before any groupby shuffle,
- broadcast (ray.put) small sides instead of shuffle joins,
- float aggregate columns rounded (2-4 dp) so Ray and DuckDB hash equal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def pricing_summary(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate over lineitem — the grouped
    frequency/count pattern of preprocess_data
    (/root/reference/benchmarking/utils.R:55-77, 407-424)."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def pre(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("disc_price", disc_price)

    out = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
    )

    def rounder(batch: pa.Table) -> pa.Table:
        for col, nd in (("sum_qty", 2), ("sum_base_price", 2), ("sum_disc_price", 2), ("avg_qty", 4)):
            ix = batch.schema.get_field_index(col)
            batch = batch.set_column(ix, col, pc.round(batch[col], ndigits=nd))
        return batch

    return out.map_batches(rounder, batch_format="pyarrow")


def top_orders(sf_dir: str, k: int = 10):
    """Global top-k by totalprice — the hard-negative top-k sort+slice
    (utils.R:620-628). Deterministic tie-break on o_orderkey."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def customer_order_stats(sf_dir: str, broadcast_gate: int | None = None):
    """orders aggregated per customer then hydrated with customer attrs
    via a BROADCAST map-side join (the attach_dbs_to_ids hydration,
    utils.R:152-162, with the small side ray.put once — never a
    shuffle join). The broadcast is GATED (segment_revenue_3way's
    shape, VERDICT r3 #5): customers grow linearly with SF, so above
    ``broadcast_gate`` rows the hydration falls back to one bucketed
    hash join instead of shipping the whole dimension to every actor.
    Both paths are equivalence-tested (test_relational)."""
    if broadcast_gate is None:
        broadcast_gate = CUSTOMER_BROADCAST_GATE
    agg = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_spent"))
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["total_spent"] = df["total_spent"].round(2)
        return df[["c_custkey", "c_name", "c_mktsegment", "n_orders", "total_spent"]]

    if cust.count() <= broadcast_gate:
        cust_ref = ray.put(cust.to_pandas().set_index("c_custkey"))

        def hydrate(batch: pd.DataFrame) -> pd.DataFrame:
            side = ray.get(cust_ref)
            joined = batch.join(side, on="o_custkey", how="inner")
            return finish(joined.rename(columns={"o_custkey": "c_custkey"}))

        return agg.map_batches(hydrate, batch_format="pandas")

    from .shuffle import bucketed_join

    joined = bucketed_join(
        agg.map_batches(
            lambda d: d.rename(columns={"o_custkey": "c_custkey"}), batch_format="pandas"
        ),
        cust,
        ["c_custkey"],
    )
    return joined.map_batches(finish, batch_format="pandas")


def customers_without_finished_orders(sf_dir: str):
    """Anti-join via broadcast key set (the label-exclusion anti-joins,
    utils.R:535-541, 588-590): customers with no order in status F.
    The key set is collected from a filtered, projected read (row-group
    predicate pushdown + column pruning) and broadcast once as a sorted
    numpy array (zero-copy per actor). Driver-collect bound: distinct
    customer keys — ≤ |customer| ≈ 150k·SF rows × 8 B (TPC-H shape), so
    ~1.2 GB even at SF=1000; a corpus without that bound would need the
    bucketed-join anti-join fallback (resolve_linkage's gated shape)."""
    finished = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
        .filter(expr="o_orderstatus == 'F'")
        .materialize()
    )
    # zero-draw guard (CLAUDE.md rule 21): with no finished orders the
    # filtered Dataset is SCHEMALESS and unique() would raise; the
    # anti-join's correct answer is then "every customer"
    keys = (
        np.unique(np.asarray(finished.unique("o_custkey")))
        if finished.count()
        else np.array([], np.int64)
    )
    keys_ref = ray.put(keys)

    def anti(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        vals = batch.column("c_custkey").to_numpy()
        pos = np.minimum(np.searchsorted(ks, vals), max(len(ks) - 1, 0))
        hit = (ks[pos] == vals) if len(ks) else np.zeros(len(vals), dtype=bool)
        return batch.filter(pa.array(~hit))

    return _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]).map_batches(
        anti, batch_format="pyarrow"
    )


def one_to_one_orders(sf_dir: str):
    """Customers with exactly one order — the links_1to1 count filter
    (utils.R:368-389) / extract_one_to_one (utils.R:322-328)."""
    agg = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n"), Min("o_orderkey", alias_name="o_orderkey"))
    )
    return agg.filter(expr="n == 1").select_columns(["o_custkey", "o_orderkey"])


def token_frequencies(sf_dir: str, k: int = 50):
    """Token counts over documents.text with per-batch pre-aggregation
    before the groupby — the add_count_name frequency features
    (utils.R:407-424) and the partial-aggregate pattern for wide
    shuffles. Tie-break: count desc, token asc."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        # NULL texts contribute nothing (SQL: string_split(NULL) →
        # NULL, unnest yields no row) but EMPTY texts count one ''
        # token, exactly like the oracle's string_split('', ' ') → ['']
        # — and like the engine's own interior splits ('a  b' →
        # ['a', '', 'b']), which already count '' (r5 review: the old
        # length>0 filter silently diverged on blank-text corpora)
        col = batch.column("text").combine_chunks().drop_null()
        toks = pc.list_flatten(pc.split_pattern(col, " "))
        g = pd.Series(np.ones(len(toks), dtype=np.int64)).groupby(
            toks.to_pandas(), sort=False
        ).sum()
        return pa.table(
            {"token": pa.array(g.index.to_numpy(), pa.string()),
             "n": pa.array(g.to_numpy(), pa.int64())}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    return out.sort(["n", "token"], descending=[True, False]).limit(k)


def exact_dedup_documents(sf_dir: str):
    """Exact dedup: keeper = min doc_id per identical text (the input
    dedup at exta/workflow.R:21-22; training-data exact dedup).

    ORACLE-PARITY variant: groups by the full ``text`` column so DuckDB
    can check it — the text rides the shuffle as the key. The SCALE
    path is ``rayrl.dedup.dedup_exact``, which shuffles only a 64-bit
    content fingerprint."""
    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .groupby("text")
        .aggregate(Min("doc_id", alias_name="keeper"), Count(alias_name="n_copies"))
    )


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate on the events stream table: per
    (user_id, hour): count + value sum (batch windowing per the events
    guidance; reference has no streaming — SURVEY.md §2.4)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def pre(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table(
            {"user_id": batch["user_id"], "hour": hour, "value": batch["value"]}
        )

    out = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="value_sum"))
    )

    def rounder(batch: pa.Table) -> pa.Table:
        ix = batch.schema.get_field_index("value_sum")
        return batch.set_column(ix, "value_sum", pc.round(batch["value_sum"], ndigits=2))

    return out.map_batches(rounder, batch_format="pyarrow")


def lang_profile(sf_dir: str):
    """Per-language corpus profile (grouped aggregate + mean)."""
    out = (
        _read(sf_dir, "documents", columns=["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars"),
                   Max("n_chars", alias_name="max_chars"))
    )

    def rounder(batch: pa.Table) -> pa.Table:
        ix = batch.schema.get_field_index("avg_chars")
        return batch.set_column(ix, "avg_chars", pc.round(batch["avg_chars"], ndigits=4))

    return out.map_batches(rounder, batch_format="pyarrow")


def best_event_per_user(sf_dir: str, gap: float = 5.0):
    """Per user: the top event by value, kept only when it beats the
    runner-up by > ``gap`` — the find_best_links odds filter
    (utils.R:457-470) re-expressed over the events table so a SQL
    oracle can check it. Deliberate divergence from the linkage
    operator: a user with a SINGLE event is kept here (v2 IS NULL in
    the oracle) — every user should surface a best event — whereas
    find_best_links drops NA-odds groups like the reference. Bucketed
    per-user groupby; tie-break on event_id."""
    from .shuffle import bucketed_group_apply

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "value"])

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "value", "event_id"], ascending=[True, False, True])
        g = df.groupby("user_id", sort=False)
        top = g.head(1).set_index("user_id")
        second = g.nth(1)
        if len(second):
            sec = second.set_index("user_id")["value"].reindex(top.index)
        else:
            sec = pd.Series(np.nan, index=top.index)
        keep = top[sec.isna() | (top["value"] - sec > gap)]
        out = keep.reset_index()[["user_id", "event_id", "value"]].copy()
        out["value"] = out["value"].round(2)
        return out

    return bucketed_group_apply(ds, ["user_id"], best)


def links_1to1_orders(sf_dir: str):
    """The links_1to1 operator (utils.R:368-389) over a DERIVED edge
    table so a SQL window oracle can value-check it: edges = sparse
    order sample (o_orderkey % 31 == 0) keyed (o_custkey, o_orderkey %
    4999), score = max totalprice; keep edges whose endpoints are both
    unique. Exercises the production bucketed count-attach path."""
    import numpy as np

    from .linkage.resolve import links_1to1
    from .shuffle import group_agg

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy()
        keep = (ok % 31) == 0
        return pa.table(
            {
                "node_a": pa.array(batch.column("o_custkey").to_numpy()[keep].astype(np.int64)),
                "node_b": pa.array((ok[keep] % 4999).astype(np.int64)),
                "score": pa.array(batch.column("o_totalprice").to_numpy()[keep]),
            }
        )

    edges = group_agg(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["node_a", "node_b"],
        {"score": ("score", "max")},
    )
    out = links_1to1(edges)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": batch["node_a"].astype("int64"),
                "slot": batch["node_b"].astype("int64"),
                "score": batch["score"].round(2),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


CUSTOMER_BROADCAST_GATE = 5_000_000


def segment_revenue_3way(sf_dir: str, broadcast_gate: int = CUSTOMER_BROADCAST_GATE):
    """Three-table join (customer ⋈ orders ⋈ lineitem → revenue per
    market segment) — the multi-way join plan pattern: the BIG⋈BIG
    side (lineitem⋈orders) pre-aggregates lineitem per orderkey inside
    the scan (60k rows → ≤ n_orders partial rows) before ONE bucketed
    hash join; the sublinear side (customer) broadcasts as an id→
    segment lookup fused into the post-join pass (CLAUDE.md rule 12),
    with a bucketed-join fallback above a size gate; the final grain
    is bounded (|segments|), so a 16-bucket reduce finishes."""
    from .shuffle import bucketed_join, group_agg

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.groupby("l_orderkey", sort=False, as_index=False).agg(
            rev=("rev", "sum"), n_items=("rev", "size")
        ).rename(columns={"l_orderkey": "o_orderkey"})

    li_agg = group_agg(
        li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey"],
        {"rev": ("rev", "sum"), "n_items": ("n_items", "sum")},
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = bucketed_join(li_agg, orders, ["o_orderkey"])

    def cust_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", sort=False, as_index=False).agg(
            rev=("rev", "sum"), n_items=("n_items", "sum")
        )

    per_cust = joined.map_batches(cust_partial, batch_format="pandas")

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    n_cust = cust.count()
    if n_cust <= broadcast_gate:
        cdf = cust.to_pandas()  # gated: |customer| is sublinear in lineitem
        lookup = ray.put(dict(zip(cdf["c_custkey"], cdf["c_mktsegment"])))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            lk = ray.get(lookup)
            df = df.copy()
            df["c_mktsegment"] = df["o_custkey"].map(lk)
            return df.dropna(subset=["c_mktsegment"])  # inner-join parity

        seg_rows = per_cust.map_batches(attach, batch_format="pandas")
    else:  # unbounded-customer fallback: one more bucketed hash join
        seg_rows = bucketed_join(
            per_cust.map_batches(
                lambda d: d.rename(columns={"o_custkey": "c_custkey"}),
                batch_format="pandas",
            ),
            cust,
            ["c_custkey"],
        )

    red = group_agg(
        seg_rows,
        ["c_mktsegment"],
        {"rev": ("rev", "sum"), "n_items": ("n_items", "sum")},
        num_buckets=4,
    ).to_pandas()  # ≤ |segments| rows
    red["revenue"] = red["rev"].round(2)
    red["n_items"] = red["n_items"].astype("int64")
    return red[["c_mktsegment", "revenue", "n_items"]]


SEGMENT_REVENUE_ORACLE = """
    SELECT c_mktsegment,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_mktsegment
"""


ORACLES = {
    "segment_revenue_3way": SEGMENT_REVENUE_ORACLE,
    "links_1to1_orders": """
        WITH e AS (SELECT o_custkey, o_orderkey % 4999 AS slot,
                          round(max(o_totalprice), 2) AS score
                   FROM orders WHERE o_orderkey % 31 = 0 GROUP BY 1, 2),
             c AS (SELECT *, count(*) OVER (PARTITION BY o_custkey) AS n_a,
                          count(*) OVER (PARTITION BY slot) AS n_b
                   FROM e)
        SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
               CAST(slot AS BIGINT) AS slot, score
        FROM c WHERE n_a = 1 AND n_b = 1
    """,
    "best_event_per_user": """
        WITH r AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id ASC) AS rn
            FROM events
        ), t AS (
            SELECT user_id,
                   max(CASE WHEN rn = 1 THEN value END) AS v1,
                   max(CASE WHEN rn = 2 THEN value END) AS v2,
                   max(CASE WHEN rn = 1 THEN event_id END) AS best_event
            FROM r GROUP BY user_id
        )
        SELECT user_id, CAST(best_event AS BIGINT) AS event_id,
               round(v1, 2) AS value
        FROM t WHERE v2 IS NULL OR v1 - v2 > 5.0
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "top_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "customer_order_stats": """
        SELECT c.c_custkey, c.c_name, c.c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o.o_totalprice), 2) AS total_spent
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    """,
    "customers_without_finished_orders": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "one_to_one_orders": """
        SELECT o_custkey, CAST(min(o_orderkey) AS BIGINT) AS o_orderkey
        FROM orders GROUP BY o_custkey HAVING count(*) = 1
    """,
    "token_frequencies": """
        SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token ASC LIMIT 50
    """,
    "exact_dedup_documents": """
        SELECT text, CAST(min(doc_id) AS BIGINT) AS keeper,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY text
    """,
    "events_hourly": """
        SELECT user_id, date_trunc('hour', ts) AS hour,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS value_sum
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
    "lang_profile": """
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(n_chars), 4) AS avg_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM documents GROUP BY lang
    """,
}

QUERIES = {
    "segment_revenue_3way": segment_revenue_3way,
    "links_1to1_orders": links_1to1_orders,
    "best_event_per_user": best_event_per_user,
    "pricing_summary": pricing_summary,
    "top_orders": top_orders,
    "customer_order_stats": customer_order_stats,
    "customers_without_finished_orders": customers_without_finished_orders,
    "one_to_one_orders": one_to_one_orders,
    "token_frequencies": token_frequencies,
    "exact_dedup_documents": exact_dedup_documents,
    "events_hourly": events_hourly,
    "lang_profile": lang_profile,
}
