"""Temporal / windowed operators over the events stream — the
training-data-pipeline shapes Ray Data has no built-in for: gap
sessionization, as-of join (last-touch attribution), range-join window
counts, and per-group top-k.

All four ride the bucketed-shuffle pattern (`rayrl.shuffle`): hash the
entity key into a bounded number of buckets, shuffle ONCE, and do the
per-key work as a vectorized numpy/pandas kernel inside each bucket.
A key never straddles buckets, so every windowed computation is exact;
skew is capped by bucket count. Timestamps travel as int64 epoch
micros (cast once at the read), so nothing downstream pays timezone or
object-dtype costs.

Reference parity: the reference engine has no temporal operators —
these extend SURVEY.md §2's inventory per the driver brief (windowed
aggregate / as-of join / range join as custom operators, each with a
DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .shuffle import bucketed_group_apply

SESSION_GAP_S = 4 * 3600
WINDOW_S = 600
TOUCH_TYPES = ("click", "view")


def _events_micros(sf_dir: str, columns: list[str]):
    """events with ``ts`` replaced by int64 epoch-micros ``tsu``."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)

    def cast(batch: pa.Table) -> pa.Table:
        ix = batch.schema.get_field_index("ts")
        tsu = pc.cast(batch.column("ts"), pa.int64())
        return batch.set_column(ix, "tsu", tsu)

    return ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------ sessionization

def sessionize_events(sf_dir: str, gap_s: int = SESSION_GAP_S):
    """Gap-based sessionization: per user, a new session starts when
    the gap to the previous event exceeds ``gap_s``. One bucketed
    shuffle on user_id; inside each bucket the session assignment is a
    single sort + diff + cumsum (no per-user loop), and the per-session
    aggregate is one vectorized pandas groupby."""
    gap_us = int(gap_s) * 1_000_000
    ds = _events_micros(sf_dir, ["user_id", "ts", "value", "event_id"])

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "tsu", "event_id"], kind="mergesort")
        user = df["user_id"].to_numpy()
        tsu = df["tsu"].to_numpy()
        new_user = np.empty(len(df), dtype=bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        brk = np.empty(len(df), dtype=np.int64)
        brk[0] = 0
        brk[1:] = (~new_user[1:] & (tsu[1:] - tsu[:-1] > gap_us)).astype(np.int64)
        # per-user cumulative break count = session index (0-based)
        cum = np.cumsum(brk)
        # reset at each user boundary: subtract the cumsum value at the
        # user's first row
        first_ix = np.flatnonzero(new_user)
        base = np.repeat(cum[first_ix], np.diff(np.append(first_ix, len(df))))
        df = df.assign(session_idx=cum - base)
        out = df.groupby(["user_id", "session_idx"], sort=False, as_index=False).agg(
            n_events=("event_id", "size"),
            session_start=("tsu", "min"),
            session_end=("tsu", "max"),
            sum_value=("value", "sum"),
        )
        out["sum_value"] = out["sum_value"].round(2)
        return out

    return bucketed_group_apply(ds, ["user_id"], sessions)


SESSIONIZE_ORACLE = f"""
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS tsu, value, event_id FROM events
    ), w AS (
        SELECT user_id, tsu, value, event_id,
               CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id
                                              ORDER BY tsu, event_id)
                         > {SESSION_GAP_S * 1_000_000}
                    THEN 1 ELSE 0 END AS brk
        FROM o
    ), s AS (
        SELECT user_id, tsu, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM w
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           min(tsu) AS session_start, max(tsu) AS session_end,
           round(sum(value), 2) AS sum_value
    FROM s GROUP BY user_id, session_idx
"""


# ------------------------------------------- as-of join (last touch)

def last_touch_attribution(sf_dir: str):
    """As-of join within the events stream: each purchase joined to the
    latest strictly-earlier click/view by the same user (classic
    last-touch attribution). Both sides come out of ONE read and ONE
    bucketed shuffle on user_id; inside each bucket `pd.merge_asof`
    (backward, strict) does the vectorized per-user as-of scan.
    Inner semantics: purchases with no prior touch are dropped, so all
    output columns stay non-null int64 (hash-stable vs the oracle).

    Tie-break: equal (user, ts) touch pairs are resolved toward the
    larger event_id (touches sorted by (tsu, touch_event); merge_asof
    keeps the last candidate). Exact-duplicate micros timestamps per
    user do not occur in the fixture.
    """
    ds = _events_micros(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["event_type"] == "purchase"][["event_id", "user_id", "tsu"]]
        t = df[df["event_type"].isin(TOUCH_TYPES)][["event_id", "user_id", "tsu", "event_type"]]
        t = t.rename(columns={"event_id": "touch_event", "event_type": "touch_type"})
        t = t.assign(touch_ts=t["tsu"]).sort_values(["tsu", "touch_event"], kind="mergesort")
        p = p.sort_values(["tsu", "event_id"], kind="mergesort")
        out = pd.merge_asof(
            p, t, on="tsu", by="user_id",
            direction="backward", allow_exact_matches=False,
        )
        out = out.dropna(subset=["touch_event"])
        out["touch_event"] = out["touch_event"].astype("int64")
        out["touch_ts"] = out["touch_ts"].astype("int64")
        return out[["event_id", "user_id", "tsu", "touch_event", "touch_type", "touch_ts"]]

    return bucketed_group_apply(ds, ["user_id"], asof)


LAST_TOUCH_ORACLE = """
    WITH p AS (
        SELECT event_id, user_id, epoch_us(ts) AS tsu
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT event_id AS touch_event, event_type AS touch_type,
               user_id, epoch_us(ts) AS touch_ts
        FROM events WHERE event_type IN ('click', 'view')
    )
    SELECT p.event_id, p.user_id, p.tsu,
           c.touch_event, c.touch_type, c.touch_ts
    FROM p ASOF JOIN c
      ON p.user_id = c.user_id AND p.tsu > c.touch_ts
"""


# ------------------------------------------- range join window counts

def error_click_window(sf_dir: str, window_s: int = WINDOW_S):
    """Range join: for each 'error' event, the number of same-user
    'click' events in the trailing window (tsu - window, tsu]. One
    bucketed shuffle; inside each bucket the window count is two
    vectorized searchsorted calls over a composite (dense user code,
    relative time) key — no per-user loop. Falls back to a per-user
    loop only if the composite key cannot fit an int64 (never at
    month-scale spans; documented bound)."""
    window_us = int(window_s) * 1_000_000
    ds = _events_micros(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["event_type"] == "error"]
        c = df[df["event_type"] == "click"]
        out = e[["event_id", "user_id", "tsu"]].copy()
        if len(e) == 0:
            out["n_clicks"] = pd.Series([], dtype="int64")
            return out
        if len(c) == 0:
            out["n_clicks"] = np.int64(0)
            return out
        codes, _ = pd.factorize(
            pd.concat([e["user_id"], c["user_id"]], ignore_index=True), sort=False
        )
        e_code, c_code = codes[: len(e)], codes[len(e):]
        t0 = int(df["tsu"].min())
        e_rel = e["tsu"].to_numpy() - t0 + window_us
        c_rel = c["tsu"].to_numpy() - t0 + window_us
        span = int(max(e_rel.max(), c_rel.max())) + 2
        if int(codes.max() + 1) * span < 2**62:
            scale = np.int64(span)
            ckey = np.sort(c_code.astype(np.int64) * scale + c_rel)
            hi = np.searchsorted(ckey, e_code.astype(np.int64) * scale + e_rel, side="right")
            lo = np.searchsorted(
                ckey, e_code.astype(np.int64) * scale + e_rel - window_us, side="right"
            )
            out["n_clicks"] = (hi - lo).astype(np.int64)
        else:  # pragma: no cover - month-scale spans never overflow
            c_sorted = c.sort_values(["user_id", "tsu"])
            counts = []
            for uid, t in zip(e["user_id"].to_numpy(), e["tsu"].to_numpy()):
                ct = c_sorted[c_sorted["user_id"] == uid]["tsu"].to_numpy()
                counts.append(
                    int(
                        np.searchsorted(ct, t, "right")
                        - np.searchsorted(ct, t - window_us, "right")
                    )
                )
            out["n_clicks"] = np.asarray(counts, dtype=np.int64)
        return out

    return bucketed_group_apply(ds, ["user_id"], windows)


ERROR_CLICK_ORACLE = f"""
    WITH e AS (
        SELECT event_id, user_id, epoch_us(ts) AS tsu
        FROM events WHERE event_type = 'error'
    ), c AS (
        SELECT user_id, epoch_us(ts) AS tsu FROM events
        WHERE event_type = 'click'
    )
    SELECT e.event_id, e.user_id, e.tsu,
           CAST(count(c.tsu) AS BIGINT) AS n_clicks
    FROM e LEFT JOIN c
      ON e.user_id = c.user_id
     AND c.tsu > e.tsu - {WINDOW_S * 1_000_000} AND c.tsu <= e.tsu
    GROUP BY e.event_id, e.user_id, e.tsu
"""


# ------------------------------------------------- per-group top-k

def top_orders_per_customer(sf_dir: str, k: int = 3):
    """Top-k rows per group (top-3 orders per customer by totalprice).
    Bucketed shuffle on the group key; inside each bucket one sort +
    groupby-cumcount mask — the distributed equivalent of
    row_number() OVER (PARTITION BY ...) <= k."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        rank = df.groupby("o_custkey", sort=False).cumcount()
        out = df[rank < k].copy()
        out["rk"] = (rank[rank < k] + 1).astype(np.int64)
        return out

    return bucketed_group_apply(ds, ["o_custkey"], topk)


TOP_PER_CUSTOMER_ORACLE = """
    WITH r AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3
"""


# ------------------------------------------------------ ordered funnel

FUNNEL_STEPS = ("view", "click", "purchase")


def event_funnel(sf_dir: str, steps: tuple[str, ...] = FUNNEL_STEPS):
    """Ordered conversion funnel: n_users who reached each step, where
    step i counts only events STRICTLY AFTER the user's step-(i−1)
    completion time (the classic product-analytics funnel, not a mere
    per-type distinct count). Output: (step, n_users).

    Scale shape: users hash into buckets and never straddle them, so
    the whole per-user cascade is a chain of vectorized merges + one
    groupby-min per step inside each bucket; each bucket emits
    len(steps) count rows and one bounded group-sum finishes. Events
    ride the shuffle once as (user_id, tsu, event_type)."""
    ds = _events_micros(sf_dir, ["user_id", "ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        reached = None  # user_id -> completion time of previous step
        counts = []
        for step in steps:
            rows = df.loc[df["event_type"] == step, ["user_id", "tsu"]]
            if reached is not None:
                rows = rows.merge(reached, on="user_id")
                rows = rows[rows["tsu"] > rows["t_prev"]].drop(columns="t_prev")
            reached = (
                rows.groupby("user_id", sort=False)["tsu"]
                .min()
                .rename("t_prev")
                .reset_index()
            )
            counts.append(len(reached))
        return pd.DataFrame(
            {"step": list(steps), "n_users": np.array(counts, np.int64)}
        )

    partials = bucketed_group_apply(ds, ["user_id"], partial)
    from .shuffle import group_agg

    return group_agg(partials, ["step"], {"n_users": ("n_users", "sum")}, num_buckets=4)


EVENT_FUNNEL_ORACLE = f"""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t GROUP BY e.user_id
    )
    SELECT '{FUNNEL_STEPS[0]}' AS step, CAST(count(*) AS BIGINT) AS n_users FROM s1
    UNION ALL
    SELECT '{FUNNEL_STEPS[1]}', CAST(count(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT '{FUNNEL_STEPS[2]}', CAST(count(*) AS BIGINT) FROM s3
"""


TEMPORAL_QUERIES = {
    "sessionized_events": sessionize_events,
    "event_funnel": event_funnel,
    "last_touch_attribution": last_touch_attribution,
    "error_click_window": error_click_window,
    "top_orders_per_customer": top_orders_per_customer,
}

TEMPORAL_ORACLES = {
    "sessionized_events": SESSIONIZE_ORACLE,
    "event_funnel": EVENT_FUNNEL_ORACLE,
    "last_touch_attribution": LAST_TOUCH_ORACLE,
    "error_click_window": ERROR_CLICK_ORACLE,
    "top_orders_per_customer": TOP_PER_CUSTOMER_ORACLE,
}
