"""Lookup-backed injectors: nickname substitution, name suffix, married
name change (/root/reference/R/3_nicknames_errors.R,
R/6_file_based_errors.R:1-37).

The reference inner-joins the target column against ~14k-row lookup
tables (R/3:15-17). That small side is held as a plain dict in op state
(loaded once per actor, SURVEY.md §7.4) — a broadcast map-side lookup,
no distributed join.

Values here may be multi-token strings (web-page ``text``); the ops act
on a randomly chosen *token* with a lookup hit, which degenerates to the
reference's whole-value semantics for single-token values.
"""

from __future__ import annotations

import numpy as np

from .. import assets
from .base import BatchCtx, ErrorOp, ErrorSpec, register


class _TokenLookupOp(ErrorOp):
    """Shared machinery: find tokens present in the lookup, substitute
    one with a random alternate (group_by + sample_n(1) at R/3:18-20)."""

    def __init__(self, spec: ErrorSpec, seed: int, asset_seed: int = 42, spec_idx: int = 0):
        super().__init__(spec, seed, asset_seed, spec_idx)
        self.lookup = assets.nicknames(asset_seed)

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        for col in self.spec.cols:
            arr = ctx.cols[col]
            hits: list[list[int]] = []
            eligible = np.zeros(ctx.n, dtype=bool)
            toks_per_row: list[list[str] | None] = [None] * ctx.n
            for i in range(ctx.n):
                v = arr[i]
                if v is None or not isinstance(v, str):
                    hits.append([])
                    continue
                toks = v.split(" ")
                hit = [t for t, tok in enumerate(toks) if tok in self.lookup]
                hits.append(hit)
                if hit:
                    eligible[i] = True
                    toks_per_row[i] = toks
            idx = self.gate(ctx, col, eligible)
            if len(idx) == 0:
                continue
            r_tok = self.draw_u64(ctx, idx, f"tok:{col}")
            r_alt = self.draw_u64(ctx, idx, f"alt:{col}")
            new_vals = []
            for k, i in enumerate(idx):
                toks = list(toks_per_row[i])
                t = hits[i][int(r_tok[k] % np.uint64(len(hits[i])))]
                alts = self.lookup[toks[t]]
                toks[t] = alts[int(r_alt[k] % np.uint64(len(alts)))]
                new_vals.append(" ".join(toks))
            ctx.mutate(col, idx, new_vals, self.name, seq)


@register
class RealToNicknames(_TokenLookupOp):
    """names_lookup[lookup_type=="to_nick"] substitution (R/3:1-52)."""

    name = "real_to_nicknames"


@register
class NickToRealnames(_TokenLookupOp):
    """names_lookup[lookup_type=="to_proper"] substitution (R/3:55-106).
    The symmetric synthetic lookup serves both directions."""

    name = "nick_to_realnames"


@register
class InvertRealAndNicknames(_TokenLookupOp):
    """Symmetric nick_real_lookup key→lookup substitution (R/3:109-159)."""

    name = "invert_real_and_nicknames"


@register
class AddNameSuffix(ErrorOp):
    """Append a weighted suffix from (jr,iii,ii,sr,iv,i,v) w=(300,40,40,
    40,10,10,10) (R/3:225-226,241-244). Property: after == before + " "
    + suffix."""

    name = "add_name_suffix"

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        for col in self.spec.cols:
            arr = ctx.cols[col]
            eligible = np.fromiter(
                (v is not None and isinstance(v, str) and len(v) > 0 for v in arr),
                dtype=bool,
                count=ctx.n,
            )
            idx = self.gate(ctx, col, eligible)
            if len(idx) == 0:
                continue
            u = self.draw_uniform(ctx, idx, f"suffix:{col}")
            pick = np.searchsorted(assets.SUFFIX_CUM, u, side="right").clip(0, len(assets.SUFFIXES) - 1)
            ctx.mutate(
                col, idx, [arr[i] + " " + assets.SUFFIXES[int(p)] for i, p in zip(idx, pick)], self.name, seq
            )


@register
class MarriedNameChange(ErrorOp):
    """Replace the last token with a random draw from the surname vocab,
    gated (like the reference's female-rows filter, R/6:7-10) on the
    last token's recorded sex being "f" when ``sex_gate`` is set."""

    name = "married_name_change"

    def __init__(self, spec: ErrorSpec, seed: int, asset_seed: int = 42, spec_idx: int = 0):
        super().__init__(spec, seed, asset_seed, spec_idx)
        self.vocab, _ = assets.vocab(asset_seed)
        self.sex_of = assets.sex_of(asset_seed) if spec.kwargs.get("sex_gate", True) else None

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        for col in self.spec.cols:
            arr = ctx.cols[col]
            eligible = np.zeros(ctx.n, dtype=bool)
            for i in range(ctx.n):
                v = arr[i]
                if v is None or not isinstance(v, str) or not v:
                    continue
                last = v.rsplit(" ", 1)[-1]
                if self.sex_of is None or self.sex_of.get(last) == "f":
                    eligible[i] = True
            idx = self.gate(ctx, col, eligible)
            if len(idx) == 0:
                continue
            r = self.draw_u64(ctx, idx, f"name:{col}")
            new_vals, kept_idx = [], []
            nv = len(self.vocab)
            for k, i in enumerate(idx):
                parts = arr[i].rsplit(" ", 1)
                newname = self.vocab[int(r[k] % np.uint64(nv))]
                if newname == parts[-1]:
                    # the draw landed on the CURRENT surname: advance
                    # one slot (deterministic redraw) — a before==after
                    # "change" would still be ledgered and counted
                    # toward the realized error rate (r5 review; the
                    # reference's new≠old contract, like Repl's)
                    newname = self.vocab[int((r[k] + np.uint64(1)) % np.uint64(nv))]
                    if newname == parts[-1]:
                        continue  # single-entry vocab: nothing to change
                parts[-1] = newname
                new_vals.append(" ".join(parts))
                kept_idx.append(i)
            if kept_idx:
                ctx.mutate(col, kept_idx, new_vals, self.name, seq)
