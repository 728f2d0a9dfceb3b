"""Row-emitting injectors: add_duplicates and twins_generate
(/root/reference/R/6_file_based_errors.R:39-74,129-191)."""

from __future__ import annotations

import numpy as np

from .. import assets
from ..schema import DUP_UID_OFFSET, TWIN_UID_OFFSET
from .base import BatchCtx, ErrorOp, ErrorSpec, nonnull_nonempty, register


@register
class AddDuplicates(ErrorOp):
    """Re-append the PRISTINE original row of already-erred records
    (sampled from the ledger's ids, R/6:44-51; pristine re-append at
    R/6:53-56). Ledger entry error="duplicate". Must run after the
    value-rewriting specs in the chain (mess_data.df_pairs runs it last,
    R/1_error.R:120-122).

    The per-row gate draws Bernoulli(amount) over erred rows — expected
    count amount × n_erred vs the reference's amount × n; the
    calibration loop absorbs the difference."""

    name = "add_duplicates"

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        idx = self.gate(ctx, "__dup__", ctx.erred_any)
        for i in idx:
            i = int(i)
            ctx.dup_rows.append(i)
            ctx.ledger.append((i, int(ctx.record_ids[i]), "", "duplicate", "", "", seq))


@register
class TwinsGenerate(ErrorOp):
    """Emit a twin row: copy of the record with one token replaced by a
    same-length same-initial token from the name index (R/6:138-150) and
    id mangled to int("123" + id + "789") (R/6:167). The twin is a NEW
    entity (distinct record_id) — it stresses linkage precision."""

    name = "twins_generate"

    def __init__(self, spec: ErrorSpec, seed: int, asset_seed: int = 42, spec_idx: int = 0):
        super().__init__(spec, seed, asset_seed, spec_idx)
        self.index = assets.twins_index(asset_seed)

    @staticmethod
    def mangle(record_id: int) -> int:
        return int(f"123{record_id}789")

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        col = self.spec.cols[0]
        eligible = nonnull_nonempty(ctx, col)
        idx = self.gate(ctx, col, eligible)
        if len(idx) == 0:
            return
        r_tok = self.draw_u64(ctx, idx, "tok")
        r_name = self.draw_u64(ctx, idx, "name")
        for k, i in enumerate(idx):
            i = int(i)
            toks = ctx.cols[col][i].split(" ")
            t = int(r_tok[k] % np.uint64(len(toks)))
            cand = self.index.get((len(toks[t]), toks[t][:1] or ""), [])
            cand = [c for c in cand if c != toks[t]]
            if not cand:
                continue
            newtok = cand[int(r_name[k] % np.uint64(len(cand)))]
            new_toks = list(toks)
            new_toks[t] = newtok
            rid = int(ctx.record_ids[i])
            twin_id = self.mangle(rid)
            row = {name: ctx.batch.column(name)[i].as_py() for name in ctx.batch.column_names}
            # current (post-error) values for the active columns
            for name, arr in ctx.cols.items():
                v = arr[i]
                row[name] = v.item() if isinstance(v, np.datetime64) else v
            row[col] = " ".join(new_toks)
            row["record_id"] = twin_id
            row["row_uid"] = TWIN_UID_OFFSET + int(ctx.row_uids[i])
            if "url" in row and isinstance(row["url"], str):
                row["url"] = row["url"].rsplit("/", 1)[0] + f"/p{twin_id}"
            ctx.twin_rows.append(row)
            ctx.ledger.append((i, rid, col, "twin", ctx.cols[col][i], " ".join(new_toks), seq))


def dup_uid(row_uid: int) -> int:
    return DUP_UID_OFFSET + int(row_uid)
