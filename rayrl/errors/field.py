"""Field-level error injectors: abbreviate, ch1↔ch2, make_missing,
swap_fields (/root/reference/R/4_abbreviations.R, R/5_swaps.R)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .base import BatchCtx, ErrorOp, ErrorSpec, nonnull_nonempty, register


@register
class FirstLetterAbbreviate(ErrorOp):
    """Truncate the value to its first character (R/4:10-12).
    Property: ``after == before[0]``."""

    name = "first_letter_abbreviate"

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        for col in self.spec.cols:
            eligible = nonnull_nonempty(ctx, col)
            # a 1-char value would be a no-op; require len > 1
            arr = ctx.cols[col]
            eligible &= np.fromiter(
                (isinstance(v, str) and len(v) > 1 for v in arr), dtype=bool, count=ctx.n
            )
            idx = self.gate(ctx, col, eligible)
            if len(idx) == 0:
                continue
            ctx.mutate(col, idx, [arr[i][0] for i in idx], self.name, seq)


@register
class Ch1ToCh2(ErrorOp):
    """Replace ch1 with ch2 where it appears between alphanumerics — the
    rebus pattern ALNUM ch1 ALNUM at R/4:54-57; ``all`` flag selects
    replace-all vs first occurrence (R/4:64-80). kwargs: ch1, ch2, all."""

    name = "ch1_to_ch2"

    def __init__(self, spec: ErrorSpec, seed: int, asset_seed: int = 42, spec_idx: int = 0):
        super().__init__(spec, seed, asset_seed, spec_idx)
        self.ch1 = spec.kwargs.get("ch1", " ")
        self.ch2 = spec.kwargs.get("ch2", "-")
        self.all = bool(spec.kwargs.get("all", False))
        # compile once per actor (R's rebus: ALNUM %R% ch1 %R% ALNUM)
        self.pat = re.compile(r"(?<=[0-9A-Za-z])" + re.escape(self.ch1) + r"(?=[0-9A-Za-z])")

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        for col in self.spec.cols:
            arr = ctx.cols[col]
            eligible = np.fromiter(
                (v is not None and isinstance(v, str) and self.pat.search(v) is not None for v in arr),
                dtype=bool,
                count=ctx.n,
            )
            idx = self.gate(ctx, col, eligible)
            if len(idx) == 0:
                continue
            count = 0 if self.all else 1
            ctx.mutate(
                col, idx, [self.pat.sub(self.ch2, arr[i], count=count) for i in idx], self.name, seq
            )


@register
class BlanksToHyphens(Ch1ToCh2):
    """Thin wrapper: ch1_to_ch2(" ", "-") (R/4:29-31)."""

    name = "blanks_to_hyphens"

    def __init__(self, spec: ErrorSpec, seed: int, asset_seed: int = 42, spec_idx: int = 0):
        spec = ErrorSpec(spec.error, spec.amount, spec.cols, {**spec.kwargs, "ch1": " ", "ch2": "-"})
        super().__init__(spec, seed, asset_seed, spec_idx)


@register
class HyphensToBlanks(Ch1ToCh2):
    """Thin wrapper: ch1_to_ch2("-", " ") (R/4:33-35)."""

    name = "hyphens_to_blanks"

    def __init__(self, spec: ErrorSpec, seed: int, asset_seed: int = 42, spec_idx: int = 0):
        spec = ErrorSpec(spec.error, spec.amount, spec.cols, {**spec.kwargs, "ch1": "-", "ch2": " "})
        super().__init__(spec, seed, asset_seed, spec_idx)


@register
class MakeMissing(ErrorOp):
    """Null the field out; the candidate pool EXCLUDES rows already
    erred on that field in this chain (the anti-join vs the ledger at
    R/4:110-118). Property: after is null ∧ (id, field) not previously
    in the ledger."""

    name = "make_missing"

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        for col in self.spec.cols:
            arr = ctx.cols[col]
            # pd.isna, not `is None`: datetime64 columns carry NaT
            # scalars that are never None, so already-null timestamps
            # stayed eligible, got "nulled" again, and were ledgered as
            # errors that changed nothing — skewing calibrate_rate's
            # realized-rate estimate (r5 review)
            not_null = np.fromiter(
                (not pd.isna(v) for v in arr), dtype=bool, count=ctx.n
            )
            eligible = not_null & ~ctx.erred_mask(col)
            idx = self.gate(ctx, col, eligible)
            if len(idx) == 0:
                continue
            ctx.mutate(col, idx, [None] * len(idx), self.name, seq)


@register
class SwapFields(ErrorOp):
    """Swap the values of a column pair on sampled rows; ledger field is
    "col1, col2" (R/5_swaps.R:1-31). cols must have even length — the
    reference takes a flat list of pairs."""

    name = "swap_fields"

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        cols = self.spec.cols
        assert len(cols) % 2 == 0, "swap_fields needs pairs of columns"
        for c1, c2 in zip(cols[::2], cols[1::2]):
            a1, a2 = ctx.cols[c1], ctx.cols[c2]
            eligible = np.fromiter(
                (
                    v1 is not None and v2 is not None and v1 != v2
                    for v1, v2 in zip(a1, a2)
                ),
                dtype=bool,
                count=ctx.n,
            )
            idx = self.gate(ctx, c1, eligible)
            if len(idx) == 0:
                continue
            field = f"{c1}, {c2}"
            m1, m2 = ctx.erred_mask(c1), ctx.erred_mask(c2)
            for i in idx:
                i = int(i)
                v1, v2 = a1[i], a2[i]
                a1[i], a2[i] = v2, v1
                ctx.ledger.append(
                    (i, int(ctx.record_ids[i]), field, self.name, f"{v1}|{v2}", f"{v2}|{v1}", seq)
                )
                m1[i] = True
                m2[i] = True
                ctx.erred_any[i] = True
