"""SQL-window-function operators over the events stream: per-key
row_number, lag-delta, sliding mean, and running sum — the analytics
shapes `ROW_NUMBER() / LAG() / AVG() OVER (PARTITION BY ... ROWS
BETWEEN ...)` express, re-built as ONE bucketed shuffle on the
partition key plus a fully vectorized numpy kernel per bucket (the
`rayrl.shuffle` pattern: a key never straddles buckets, so every
window is exact; skew is capped by bucket count, and only the four
needed columns ride the shuffle).

Float parity with the DuckDB oracle: each windowed float is computed
with the SAME association order SQL's frame accumulation uses
(frame-start → current row; running sum = cumsum), then rounded to 6
decimals to absorb any engine's last-ulp segment-tree variance.

Reference parity: the reference engine has no window functions — this
extends SURVEY.md §2's inventory per the driver brief (windowed
aggregate family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .shuffle import bucketed_group_apply
from .temporal import _events_micros


def user_event_windows(sf_dir: str):
    """Per-user event windows ordered by (ts, event_id): 1-based
    ``rn`` = row_number, ``ntile4`` = NTILE(4) (SQL's exact uneven-tile
    distribution rule), ``delta_prev`` = value − lag(value) (0.0 for
    the first row, COALESCE parity), ``movavg3`` = mean over the
    trailing 3-row frame, ``running_sum`` = unbounded-preceding sum."""
    ds = _events_micros(sf_dir, ["user_id", "event_id", "ts", "value"])
    n_tiles = 4

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "tsu", "event_id"], kind="mergesort")
        user = df["user_id"].to_numpy()
        v = df["value"].to_numpy(dtype=np.float64)
        n = len(df)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        first_ix = np.flatnonzero(new_user)
        counts = np.diff(np.append(first_ix, n))
        # 0-based position within the user partition
        pos = np.arange(n, dtype=np.int64) - np.repeat(first_ix, counts)

        lag1 = np.empty(n)
        lag1[1:] = v[:-1]
        lag1[0] = 0.0
        delta = np.where(pos >= 1, v - lag1, 0.0)

        lag2 = np.empty(n)
        lag2[2:] = v[:-2]
        lag2[:2] = 0.0
        # frame-order association: ((v[i-2] + v[i-1]) + v[i]) / count
        s3 = (lag2 + lag1) + v
        s2 = lag1 + v
        movavg3 = np.where(pos >= 2, s3 / 3.0, np.where(pos == 1, s2 / 2.0, v))

        cs = np.cumsum(v)
        base = np.repeat(cs[first_ix] - v[first_ix], counts)
        running = cs - base

        # NTILE(n): the first (cnt % n) tiles hold ceil(cnt/n) rows
        # (exact SQL distribution rule)
        cnt = np.repeat(counts, counts)
        big = cnt % n_tiles
        small_sz = cnt // n_tiles
        boundary = big * (small_sz + 1)
        in_big = pos < boundary
        tile = np.where(
            in_big,
            pos // np.maximum(small_sz + 1, 1),
            big + (pos - boundary) // np.maximum(small_sz, 1),
        ) + 1

        return pd.DataFrame(
            {
                "user_id": user,
                "event_id": df["event_id"].to_numpy(),
                "tsu": df["tsu"].to_numpy(),
                "rn": pos + 1,
                "ntile4": tile.astype(np.int64),
                "delta_prev": np.round(delta, 6),
                "movavg3": np.round(movavg3, 6),
                "running_sum": np.round(running, 6),
            }
        )

    return bucketed_group_apply(ds, ["user_id"], win)


USER_EVENT_WINDOWS_ORACLE = """
    WITH o AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
    )
    SELECT user_id, event_id, tsu,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(ntile(4) OVER w AS BIGINT) AS ntile4,
           round(COALESCE(value - lag(value) OVER w, 0.0), 6) AS delta_prev,
           round(AVG(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS movavg3,
           round(SUM(value) OVER (w ROWS UNBOUNDED PRECEDING), 6) AS running_sum
    FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
"""


WINDOW_QUERIES = {"user_event_windows": user_event_windows}
WINDOW_ORACLES = {"user_event_windows": USER_EVENT_WINDOWS_ORACLE}
