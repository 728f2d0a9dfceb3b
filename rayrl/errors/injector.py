"""The Injector — ONE stateful map_batches stage that applies the whole
error-spec chain per Arrow batch and emits (dirty rows + per-row ledger
entries).

This is the Ray-native re-expression of ``mess_data.data.frame``
(/root/reference/R/1_error.R:48-109): the reference loops spec rows over
the whole in-memory table; here the chain runs inside a single actor
pass per batch so the sequential ledger dependencies stay row-local
(SURVEY.md §7.5(2)) and lookup assets load once per actor.

Usage::

    inj = Injector(specs, seed=7)
    combined = pages.map_batches(inj, batch_format="pyarrow",
                                 concurrency=(2, 8), batch_size=8192)
    dirty  = strip_ledger(combined)
    ledger = extract_ledger(combined)

The combined dataset carries a ``_ledger`` list<struct> column; writing
it to Parquet once and deriving both views from the checkpoint avoids
re-running injection (injection is deterministic, so re-execution is
merely wasteful, never wrong)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import DUP_UID_OFFSET, LEDGER
from .base import REGISTRY, BatchCtx, ErrorSpec

LEDGER_ITEM = pa.struct(
    [
        ("record_id", pa.int64()),
        ("field", pa.string()),
        ("error", pa.string()),
        ("before", pa.string()),
        ("after", pa.string()),
        ("seq", pa.int64()),
    ]
)
LEDGER_COL = "_ledger"


def writeback_columns(batch: pa.Table, cols: "dict[str, 'np.ndarray']") -> pa.Table:
    """Replace mutated columns in ``batch`` (timestamps via the numpy
    datetime64 fast path, everything else through the object array) —
    shared by Injector._assemble and flow._assemble_simple (r5 review:
    they were copy-paste twins)."""
    out = batch
    for name, arr in cols.items():
        ix = out.schema.get_field_index(name)
        if isinstance(arr.dtype, np.dtype) and arr.dtype.kind == "M":
            col = pa.array(arr, type=pa.timestamp("us"))
        else:
            col = pa.array(list(arr), type=batch.schema.field(name).type)
        out = out.set_column(ix, name, col)
    return out


def ledger_list_column(ledger, n: int) -> pa.Array:
    """Per-row list<LEDGER_ITEM> column from the flat ledger tuples."""
    per_row: list[list[dict]] = [[] for _ in range(n)]
    for row_ix, rid, field, error, before, after, seq in ledger:
        per_row[row_ix].append(
            {"record_id": rid, "field": field, "error": error,
             "before": before, "after": after, "seq": seq}
        )
    return pa.array(per_row, type=pa.list_(LEDGER_ITEM))


class Injector:
    """Callable class for ``map_batches`` actor pools — ops and their
    lookup assets are built once per actor in ``__init__``."""

    def __init__(self, specs: list[ErrorSpec], seed: int = 42, asset_seed: int = 42):
        self.seed = seed
        self.specs = list(specs)
        self.ops = [
            REGISTRY[s.error](s, seed, asset_seed, spec_idx=ix)
            for ix, s in enumerate(self.specs)
        ]
        active: list[str] = []
        for s in self.specs:
            for c in s.cols:
                if c not in active and not c.startswith("__"):
                    active.append(c)
        self.active = tuple(active)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ctx = BatchCtx(batch, self.seed, self.active)
        for seq, op in enumerate(self.ops):
            op.apply(ctx, seq)
        return self._assemble(ctx)

    def _assemble(self, ctx: BatchCtx) -> pa.Table:
        batch = ctx.batch
        # dirty originals: replace the mutated columns, keep the rest zero-copy
        dirty = writeback_columns(batch, ctx.cols)
        dirty = dirty.append_column(LEDGER_COL, ledger_list_column(ctx.ledger, ctx.n))

        parts = [dirty]
        if ctx.dup_rows:
            dup = batch.take(pa.array(ctx.dup_rows, pa.int64()))
            uid_ix = dup.schema.get_field_index("row_uid")
            new_uids = pa.array([DUP_UID_OFFSET + int(u) for u in dup.column("row_uid").to_pylist()], pa.int64())
            dup = dup.set_column(uid_ix, "row_uid", new_uids)
            dup = dup.append_column(LEDGER_COL, pa.array([[]] * dup.num_rows, type=pa.list_(LEDGER_ITEM)))
            parts.append(dup.select(dirty.column_names))
        if ctx.twin_rows:
            twins = pa.Table.from_pylist(ctx.twin_rows, schema=batch.schema)
            twins = twins.append_column(LEDGER_COL, pa.array([[]] * twins.num_rows, type=pa.list_(LEDGER_ITEM)))
            parts.append(twins.select(dirty.column_names))
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)


def _flatten_ledger(batch: pa.Table) -> pa.Table:
    col = batch.column(LEDGER_COL)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    return pa.table(
        {f.name: flat.field(f.name) for f in LEDGER_ITEM},
        schema=LEDGER,
    )


def extract_ledger(ds):
    """Combined injector output → ledger Dataset (LEDGER schema)."""
    return ds.map_batches(_flatten_ledger, batch_format="pyarrow", zero_copy_batch=True)


def strip_ledger(ds):
    """Combined injector output → dirty pages Dataset."""
    return ds.drop_columns([LEDGER_COL])
