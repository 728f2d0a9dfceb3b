"""The alternative per-row error-assignment flow of the reference
(/root/reference/R/duplicate_add_errors.R, driven by exta/workflow.R):

- ``perturb_dataset`` ≙ perturb_data (R/duplicate_add_errors.R:24-46):
  emit ``n_dup`` copies of every row, each copy assigned one error type
  drawn WITHOUT replacement per source row.
- the reference then applies ``add_error`` row-by-row on single-row
  data frames (R/duplicate_add_errors.R:48-99, an O(n) Python-level
  loop); here the per-copy error application collapses into the
  standard vectorized injector machinery — each error type is applied
  to the subset of copies assigned to it via the same ErrorOp classes,
  in one map_batches pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import rng
from .base import REGISTRY, BatchCtx, ErrorSpec
from .injector import LEDGER_COL, LEDGER_ITEM


class PerturbFlow:
    """map_batches stage: each input row → ``n_dup`` corrupted copies
    (+ optionally the original). Deterministic: copy k of record r gets
    the error type at position k of a hash-derived permutation of
    ``err_types`` (the reference's sample-without-replacement,
    R/duplicate_add_errors.R:36-40)."""

    def __init__(
        self,
        err_types: list[str],
        n_dup: int,
        seed: int = 7,
        asset_seed: int = 42,
        col: str = "text",
        keep_original: bool = True,
    ):
        assert n_dup <= len(err_types), "n_dup draws err_types without replacement"
        self.err_types = list(err_types)
        self.n_dup = n_dup
        self.seed = seed
        self.col = col
        self.keep_original = keep_original
        # one always-fire op instance per error type; spec_idx keys the
        # rng streams apart (same rule as the Injector chain)
        self.ops = {
            name: REGISTRY[name](ErrorSpec(name, 1.0, (col,)), seed, asset_seed, spec_idx=ix)
            for ix, name in enumerate(err_types)
        }

    def _assignment(self, record_ids: np.ndarray, k: int) -> np.ndarray:
        """err-type index for copy k of each record: position k of a
        per-record hash permutation (draw-without-replacement)."""
        n_types = len(self.err_types)
        # per-record permutation via sort of per-(record, type) hashes
        keys = np.stack(
            [
                rng.hash_u64(record_ids, self.seed, rng.tag_for(f"perturb:{t}"))
                for t in range(n_types)
            ],
            axis=1,
        )
        return np.argsort(keys, axis=1)[:, k]

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        empty_ledger = pa.array([[]] * batch.num_rows, type=pa.list_(LEDGER_ITEM))
        if self.keep_original:
            parts.append(batch.append_column(LEDGER_COL, empty_ledger))
        rids = batch.column("record_id").to_numpy()
        uids = batch.column("row_uid").to_numpy()
        for k in range(self.n_dup):
            assign = self._assignment(rids, k)
            copy = batch.set_column(
                batch.schema.get_field_index("row_uid"),
                "row_uid",
                pa.array(uids + (k + 1) * (1 << 50), pa.int64()),
            )
            ctx = BatchCtx(copy, self.seed, (self.col,))
            for t_ix, name in enumerate(self.err_types):
                op = self.ops[name]
                # restrict the op's gate to the rows assigned this type
                mask = assign == t_ix
                orig_gate = op.gate
                op.gate = lambda c, col, eligible, _m=mask, _g=orig_gate: np.nonzero(
                    _m & eligible
                )[0]
                try:
                    op.apply(ctx, seq=k)
                finally:
                    op.gate = orig_gate
            parts.append(_assemble_simple(ctx))
        return pa.concat_tables(parts)


def _assemble_simple(ctx: BatchCtx) -> pa.Table:
    from .injector import ledger_list_column, writeback_columns

    out = writeback_columns(ctx.batch, ctx.cols)
    return out.append_column(LEDGER_COL, ledger_list_column(ctx.ledger, ctx.n))


def perturb_dataset(ds, err_types: list[str], n_dup: int, seed: int = 7, col: str = "text"):
    """Dataset-level perturb_data + add_error equivalent."""
    return ds.map_batches(
        PerturbFlow(err_types, n_dup, seed=seed, col=col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def convert_cols(ds, type_map: dict[str, pa.DataType]):
    """``convert_cols`` equivalent (/root/reference/R/1_error.R:130-134):
    cast named columns to the given Arrow types."""

    def cast(batch: pa.Table) -> pa.Table:
        fields = [
            pa.field(f.name, type_map.get(f.name, f.type)) for f in batch.schema
        ]
        return batch.cast(pa.schema(fields))

    return ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)


def share_value_within_groups(ds, group_keys: list[str], value_col: str, num_buckets: int = 64):
    """``make_twins`` (dup-flow) core semantics
    (/root/reference/R/duplicate_add_errors.R:101-128; twin_id flow
    benchmarking/utils.R:663-697): rows in the same group get the SAME
    value for ``value_col`` (the group's minimum row's value), via the
    bucketed groupby pattern."""
    import pandas as pd

    from ..shuffle import bucketed_group_apply

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("row_uid").reset_index(drop=True)
        # POSITIONAL first (iloc[0]) with dropna=False: pandas'
        # transform('first') skips null leaders (sharing the next
        # non-null value instead of the min row's) and NaNs out rows
        # whose group KEY is null, destroying their value (r5 review)
        df[value_col] = df.groupby(group_keys, sort=False, dropna=False)[
            value_col
        ].transform(lambda s: s.iloc[0])
        return df

    return bucketed_group_apply(ds, group_keys, assign, num_buckets)
