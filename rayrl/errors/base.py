"""Error-op protocol, spec, per-batch context and registry.

The reference dispatches error functions by NAME from a 4-column config
table (error, amount, col_names, arguments), preferring user-defined
same-named functions (/root/reference/R/1_error.R:48-109) — that is its
UDF surface. Here the same surface is a registry ``REGISTRY[name] ->
ErrorOp subclass`` with a ``@register`` decorator; specs carry kwargs as
a dict (JSON in config files) instead of parsed R code.

Budget semantics: the reference samples exactly ``ceiling(amount * n)``
rows per (error, column-list) and splits the budget evenly across the
target columns (R/1_error.R:78-80, R/2_edit_distance_errors.R:6-8).
The Ray-native equivalent is a per-row deterministic Bernoulli gate with
p = amount / n_cols keyed on (seed, record_id, stage, column) — same
expected per-field error rate, zero shuffle, identical at any
parallelism (SURVEY.md §7.5(1)). Realized-rate calibration, the
reference's actual contract (utils.R:712-728), lives in
``rayrl.pipeline.calibrate_rate``.

Performance notes: only the columns actually targeted by the spec chain
are materialized as mutable numpy arrays; everything else (notably the
wide ``html`` binary column) stays in the zero-copy Arrow batch. The
immutable input batch doubles as the pristine copy that
``add_duplicates`` re-appends (R/6_file_based_errors.R:53-56).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

import numpy as np
import pyarrow as pa

from .. import rng


@dataclass(frozen=True)
class ErrorSpec:
    """One row of the error config table (error_table.csv shape)."""

    error: str
    amount: float  # fraction of rows to hit (reference: amount<1 ⇒ rate)
    cols: tuple[str, ...]
    kwargs: dict[str, Any] = dc_field(default_factory=dict)

    def col_rate(self) -> float:
        """Per-column rate — the even split of R/2_edit_distance_errors.R:6-8."""
        return self.amount / max(1, len(self.cols))


# internal ledger tuple: (row_index, record_id, field, error, before, after, seq)
LedgerRow = tuple[int, int, str, str, str | None, str | None, int]


class BatchCtx:
    """Mutable per-batch state for one injector pass.

    Sequential-ledger dependencies in the reference (make_missing
    excludes already-erred (id, field) pairs R/4_abbreviations.R:110-118;
    add_duplicates samples erred ids R/6_file_based_errors.R:44-51) are
    row-local once the whole spec chain runs in ONE pass per batch —
    tracked here via ``erred_fields`` / ``erred_any`` (SURVEY.md §7.5(2)).
    """

    def __init__(self, batch: pa.Table, seed: int, active_cols: tuple[str, ...]):
        self.seed = seed
        self.batch = batch  # immutable → doubles as the pristine copy
        self.n = batch.num_rows
        self.cols: dict[str, np.ndarray] = {}
        for name in active_cols:
            if name not in batch.column_names:
                # a spec CSV targeting a column the table lacks used to
                # skip here and die later with a bare KeyError inside a
                # task (r5 review) — fail with the actual problem
                raise ValueError(
                    f"error spec targets unknown column {name!r}; batch has "
                    f"{sorted(batch.column_names)}"
                )
            col = batch.column(name)
            if pa.types.is_timestamp(col.type):
                self.cols[name] = col.to_numpy(zero_copy_only=False).astype("datetime64[us]")
            else:
                self.cols[name] = np.asarray(col.to_pylist(), dtype=object)
        self.record_ids = batch.column("record_id").to_numpy().astype(np.int64)
        self.row_uids = batch.column("row_uid").to_numpy().astype(np.int64)
        self.erred_fields: dict[str, np.ndarray] = {}
        self.erred_any = np.zeros(self.n, dtype=bool)
        self.ledger: list[LedgerRow] = []
        self.dup_rows: list[int] = []  # row indices whose pristine copy gets re-appended
        self.twin_rows: list[dict[str, Any]] = []  # fully-built extra rows

    # -- helpers used by every op --

    def erred_mask(self, col: str) -> np.ndarray:
        if col not in self.erred_fields:
            self.erred_fields[col] = np.zeros(self.n, dtype=bool)
        return self.erred_fields[col]

    @staticmethod
    def _as_str(v: Any) -> str | None:
        if v is None:
            return None
        if isinstance(v, np.datetime64):
            if np.isnat(v):
                return None
            return np.datetime_as_string(v, unit="us")
        return str(v)

    def mutate(self, col: str, idx: np.ndarray | list[int], new_values: list, error: str, seq: int) -> None:
        """Apply mutations + append the ledger rows (update_error_record,
        R/1_error.R:30-36)."""
        arr = self.cols[col]
        mask = self.erred_mask(col)
        for i, nv in zip(idx, new_values):
            i = int(i)
            before = self._as_str(arr[i])
            arr[i] = nv
            self.ledger.append((i, int(self.record_ids[i]), col, error, before, self._as_str(nv), seq))
            mask[i] = True
            self.erred_any[i] = True


class ErrorOp:
    """Base class. Subclasses set ``name`` and implement ``apply``.

    ``seed`` drives the random draws; ``asset_seed`` selects the lookup
    assets (vocabulary / nickname tables) and must match the seed the
    input data's vocabulary was generated with."""

    name: str = ""

    def __init__(self, spec: ErrorSpec, seed: int, asset_seed: int = 42, spec_idx: int = 0):
        self.spec = spec
        self.seed = seed
        self.asset_seed = asset_seed
        # spec_idx keys every rng stream: two same-named specs on the
        # same column (keyboard + ocr repl; the three date_replace
        # tokens) must draw INDEPENDENT gates and positions — with
        # name-only tags their Bernoulli gates were fully correlated
        # (verified: every ocr hit was a keyboard hit, union coverage
        # 15.4% → 11%) and stacked errors reused the same character
        # position (r5 review).
        self.spec_idx = spec_idx

    def gate(self, ctx: BatchCtx, col: str, eligible: np.ndarray) -> np.ndarray:
        """Per-row Bernoulli(col_rate) ∧ eligible → selected indices."""
        tag = rng.tag_for(f"gate:{self.spec_idx}:{self.name}:{col}")
        hit = rng.bernoulli(ctx.record_ids, self.spec.col_rate(), self.seed, tag)
        return np.nonzero(hit & eligible)[0]

    def draw_u64(self, ctx: BatchCtx, idx: np.ndarray, purpose: str) -> np.ndarray:
        return rng.hash_u64(
            ctx.record_ids[idx], self.seed, rng.tag_for(f"{self.spec_idx}:{self.name}:{purpose}")
        )

    def draw_int(self, ctx: BatchCtx, idx: np.ndarray, n, purpose: str) -> np.ndarray:
        return rng.randint(
            ctx.record_ids[idx], n, self.seed, rng.tag_for(f"{self.spec_idx}:{self.name}:{purpose}")
        )

    def draw_uniform(self, ctx: BatchCtx, idx: np.ndarray, purpose: str) -> np.ndarray:
        return rng.uniform(
            ctx.record_ids[idx], self.seed, rng.tag_for(f"{self.spec_idx}:{self.name}:{purpose}")
        )

    def apply(self, ctx: BatchCtx, seq: int) -> None:
        raise NotImplementedError


REGISTRY: dict[str, type[ErrorOp]] = {}


def register(cls: type[ErrorOp]) -> type[ErrorOp]:
    assert cls.name, f"{cls} needs a name"
    REGISTRY[cls.name] = cls
    return cls


def nonnull_nonempty(ctx: BatchCtx, col: str) -> np.ndarray:
    """Default candidate filter: non-null, non-empty strings
    (R/2_edit_distance_errors.R:17-19)."""
    arr = ctx.cols[col]
    return np.fromiter(
        (v is not None and isinstance(v, str) and len(v) > 0 for v in arr), dtype=bool, count=len(arr)
    )
