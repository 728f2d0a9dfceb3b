"""Date error injectors on timestamp columns — the reference's dob ops
re-targeted at ``warc_ts`` (/root/reference/R/7_dob_errors.R). The
time-of-day component rides along unchanged; errors rewrite y/m/d.

The reference's dead ``date_transpose(token="month")`` branch
(R/7:139-151, calls an undefined function) and the ``valid_days``
arg-order bug (R/7:234 vs 259-269) are NOT replicated — we implement the
intended calendar-valid semantics (SURVEY.md §7.5(8))."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .base import BatchCtx, ErrorOp, register

_DAYS_IN_MONTH = np.array([0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


def days_in_month(month: np.ndarray, year: np.ndarray) -> np.ndarray:
    """valid_days table (R/7:259-269) with leap handling."""
    d = _DAYS_IN_MONTH[month]
    leap = ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)
    return np.where((month == 2) & leap, 29, d)


def _decompose(ts: np.ndarray):
    di = pd.DatetimeIndex(ts)
    tod = ts - ts.astype("datetime64[D]").astype("datetime64[us]")
    return di.year.values, di.month.values, di.day.values, tod


def _recompose(year, month, day, tod) -> np.ndarray:
    base = pd.to_datetime(pd.DataFrame({"year": year, "month": month, "day": day})).values
    return base.astype("datetime64[us]") + tod


class _DateOp(ErrorOp):
    """Shared select → rewrite-y/m/d → mutate machinery."""

    def rewrite(self, ctx: BatchCtx, idx, y, m, d):  # returns new (y, m, d) for idx rows
        raise NotImplementedError

    def eligible(self, ctx: BatchCtx, y, m, d, notnan) -> np.ndarray:
        return notnan

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        for col in self.spec.cols:
            ts = ctx.cols[col]
            notnan = ~np.isnat(ts)
            safe = np.where(notnan, ts, np.datetime64("2000-01-01", "us"))
            y, m, d, tod = _decompose(safe)
            idx = self.gate(ctx, col, self.eligible(ctx, y, m, d, notnan))
            if len(idx) == 0:
                continue
            ny, nm, nd = self.rewrite(ctx, idx, y[idx].copy(), m[idx].copy(), d[idx].copy())
            new_ts = _recompose(ny, nm, nd, tod[idx])
            ctx.mutate(col, idx, list(new_ts), self.name, seq)


@register
class DateSwap(_DateOp):
    """Swap day↔month; eligible iff day < 13 and month ≠ day (R/7:53)."""

    name = "date_swap"

    def eligible(self, ctx, y, m, d, notnan):
        return notnan & (d < 13) & (m != d)

    def rewrite(self, ctx, idx, y, m, d):
        return y, d, m


@register
class DateTranspose(_DateOp):
    """token="year": transpose the last two year digits (digits must
    differ, R/7:97-99). token="day": transpose the zero-padded day's
    digits where the result is calendar-valid and different — the intent
    of the whitelist at R/7:155-161."""

    name = "date_transpose"

    @staticmethod
    def _swap2(v: np.ndarray) -> np.ndarray:
        return (v % 10) * 10 + v // 10

    def eligible(self, ctx, y, m, d, notnan):
        token = self.spec.kwargs.get("token", "year")
        if token == "year":
            return notnan & ((y % 10) != ((y // 10) % 10))
        swapped = self._swap2(d)
        return notnan & (swapped != d) & (swapped >= 1) & (swapped <= days_in_month(m, y))

    def rewrite(self, ctx, idx, y, m, d):
        token = self.spec.kwargs.get("token", "year")
        if token == "year":
            return (y // 100) * 100 + self._swap2(y % 100), m, d
        return y, m, self._swap2(d)


@register
class DateReplace(_DateOp):
    """token="year": digit-replace in the 2-digit year suffix
    (R/7:209-222). token="month": random month valid for the day
    (valid_months, R/7:223-229,271-281). token="day": random
    calendar-valid day ≠ old (intended valid_days semantics,
    R/7:230-244)."""

    name = "date_replace"

    def eligible(self, ctx, y, m, d, notnan):
        token = self.spec.kwargs.get("token", "year")
        if token == "month":
            # need another month where this day is valid
            return notnan & np.ones(len(y), dtype=bool)
        return notnan

    def rewrite(self, ctx, idx, y, m, d):
        token = self.spec.kwargs.get("token", "year")
        if token == "year":
            which = self.draw_int(ctx, idx, 2, "which")  # tens or ones digit
            newdig = self.draw_int(ctx, idx, 9, "dig")
            ones = y % 10
            tens = (y // 10) % 10
            # replace with a different digit: shift by 1..9 mod 10
            n_ones = (ones + 1 + newdig) % 10
            n_tens = (tens + 1 + newdig) % 10
            ny = np.where(which == 0, (y // 10) * 10 + n_ones, (y // 100) * 100 + n_tens * 10 + ones)
            return ny, m, d
        if token == "month":
            new_m = m.copy()
            r = self.draw_u64(ctx, idx, "month")
            # per-row month-length table without array churn: 12
            # scalars from a static table + one leap test (r5 review:
            # the old listcomp built 24 single-element arrays per row)
            base_dim = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
            for k in range(len(idx)):
                yk = int(y[k])
                leap = yk % 4 == 0 and (yk % 100 != 0 or yk % 400 == 0)
                valid = [
                    mm
                    for mm in range(1, 13)
                    if mm != m[k]
                    and d[k] <= (29 if (mm == 2 and leap) else base_dim[mm - 1])
                ]
                new_m[k] = valid[int(r[k] % np.uint64(len(valid)))]
            return y, new_m, d
        # day
        new_d = d.copy()
        r = self.draw_u64(ctx, idx, "day")
        dim = days_in_month(m, y)
        for k in range(len(idx)):
            nd = 1 + int(r[k] % np.uint64(dim[k] - 1))
            if nd >= d[k]:
                nd += 1  # skip the old day → uniform over valid days ≠ old
            new_d[k] = nd
        return y, m, new_d
