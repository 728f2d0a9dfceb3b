"""Edit-distance error injectors: indel / repl / tpose
(/root/reference/R/2_edit_distance_errors.R).

Charsets: the reference dispatches on an S3 ``"number"`` class so
digit-strings draw from 0:9 instead of letters (R/2:58-60,154-157); here
a ``charset`` kwarg selects ``letters`` / ``digits`` / ``auto``
(per-value: digits iff the value is all digits). ``repl`` additionally
supports the north_star confusion tables (``table``: ``uniform`` /
``keyboard`` / ``ocr`` / ``phonetic``) held in op state.
"""

from __future__ import annotations

import numpy as np

from .. import assets
from .base import BatchCtx, ErrorOp, ErrorSpec, nonnull_nonempty, register


def _charset_for(value: str, mode: str) -> str:
    if mode == "digits":
        return assets.DIGITS
    if mode == "letters":
        return assets.LETTERS
    return assets.DIGITS if value.isdigit() else assets.LETTERS


@register
class Indel(ErrorOp):
    """Insert OR delete one random char at a random position — the coin
    flip at R/2:66; candidates are non-empty strings (R/2:17-19).
    Property: ``abs(len(after) - len(before)) == 1``."""

    name = "indel"

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        mode = self.spec.kwargs.get("charset", "auto")
        for col in self.spec.cols:
            eligible = nonnull_nonempty(ctx, col)
            idx = self.gate(ctx, col, eligible)
            if len(idx) == 0:
                continue
            arr = ctx.cols[col]
            coin = self.draw_u64(ctx, idx, f"coin:{col}") % np.uint64(2)
            r_pos = self.draw_u64(ctx, idx, f"pos:{col}")
            r_chr = self.draw_u64(ctx, idx, f"chr:{col}")
            new_vals = []
            for k, i in enumerate(idx):
                s = arr[i]
                if coin[k] == 0 or len(s) == 1:  # insert (never delete to empty)
                    cs = _charset_for(s, mode)
                    pos = int(r_pos[k] % np.uint64(len(s) + 1))
                    ch = cs[int(r_chr[k] % np.uint64(len(cs)))]
                    new_vals.append(s[:pos] + ch + s[pos:])
                else:  # delete
                    pos = int(r_pos[k] % np.uint64(len(s)))
                    new_vals.append(s[:pos] + s[pos + 1 :])
            ctx.mutate(col, idx, new_vals, self.name, seq)


@register
class Repl(ErrorOp):
    """Replace one random char with a *different* char (the resample
    loop at R/2:173-175 guarantees new ≠ old). ``table`` kwarg switches
    the replacement source to a confusion table (keyboard-adjacency /
    OCR / phonetic — north_star extension)."""

    name = "repl"

    def __init__(self, spec: ErrorSpec, seed: int, asset_seed: int = 42, spec_idx: int = 0):
        super().__init__(spec, seed, asset_seed, spec_idx)
        self.table = assets.CHARSETS.get(spec.kwargs.get("table", "uniform"))

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        mode = self.spec.kwargs.get("charset", "auto")
        for col in self.spec.cols:
            eligible = nonnull_nonempty(ctx, col)
            idx = self.gate(ctx, col, eligible)
            if len(idx) == 0:
                continue
            arr = ctx.cols[col]
            r_pos = self.draw_u64(ctx, idx, f"pos:{col}")
            r_chr = self.draw_u64(ctx, idx, f"chr:{col}")
            new_vals = []
            for k, i in enumerate(idx):
                s = arr[i]
                pos = int(r_pos[k] % np.uint64(len(s)))
                old = s[pos]
                cands = None
                if self.table is not None:
                    cands = self.table.get(old)
                if not cands:
                    cands = _charset_for(s, mode).replace(old, "")
                ch = cands[int(r_chr[k] % np.uint64(len(cands)))]
                if ch == old:  # confusion tables may map to multi-char; never no-op
                    ch = assets.LETTERS.replace(old, "")[int(r_chr[k] % np.uint64(25))]
                new_vals.append(s[:pos] + ch + s[pos + 1 :])
            ctx.mutate(col, idx, new_vals, self.name, seq)


@register
class Tpose(ErrorOp):
    """Swap two adjacent *differing* chars (R/2:247-263); eligibility =
    value has at least one adjacent differing pair (R/2:190-191).
    Property: same character multiset, exactly one adjacent swap."""

    name = "tpose"

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        for col in self.spec.cols:
            arr = ctx.cols[col]
            eligible = np.fromiter(
                (
                    v is not None
                    and isinstance(v, str)
                    and any(v[p] != v[p + 1] for p in range(len(v) - 1))
                    for v in arr
                ),
                dtype=bool,
                count=ctx.n,
            )
            idx = self.gate(ctx, col, eligible)
            if len(idx) == 0:
                continue
            r_pos = self.draw_u64(ctx, idx, f"pos:{col}")
            new_vals = []
            for k, i in enumerate(idx):
                s = arr[i]
                positions = [p for p in range(len(s) - 1) if s[p] != s[p + 1]]
                p = positions[int(r_pos[k] % np.uint64(len(positions)))]
                new_vals.append(s[:p] + s[p + 1] + s[p] + s[p + 2 :])
            ctx.mutate(col, idx, new_vals, self.name, seq)
