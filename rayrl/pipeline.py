"""Error-generation pipeline: config → Dataset chain, rate measurement,
calibration loop, and per-stage Parquet checkpoints.

Reference flow being re-expressed (SURVEY.md §3.1):
``generate_error`` (/root/reference/benchmarking/utils.R:712-768) runs
the spec chain with a rate multiplier, measures the realized distinct-id
error fraction against the ledger (``calc_perc_id_err``,
utils.R:648-661) and escalates the multiplier until the target is hit.
Here the chain is one lazy ``map_batches`` pass and the measurement is a
distributed aggregate over the (small) ledger.
"""

from __future__ import annotations

import csv
import json
import os
import shutil
from dataclasses import dataclass
from typing import Any

import pyarrow.parquet as pq

import ray
import ray.data

from .errors import ErrorSpec, Injector, extract_ledger, strip_ledger


def load_specs(path: str) -> list[ErrorSpec]:
    """Parse an error config table — the 4-column CSV shape of the
    reference (error, amount, col_names, arguments;
    benchmarking/error_table.csv:1) with JSON kwargs instead of R code."""
    specs = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            kwargs = json.loads(row.get("arguments") or "{}")
            cols = tuple(c.strip() for c in row["col_names"].split(",") if c.strip())
            amount = float(row["amount"])
            if amount >= 1:
                # the reference's amount >= 1 means "N ROWS"
                # (R/1_error.R:78-80); this engine's gate is a RATE and
                # would silently clamp to 100%-corruption (r5 review) —
                # convert counts to a rate (count / table rows) first
                raise ValueError(
                    f"spec {row['error']!r}: amount {amount} >= 1 — this engine "
                    "takes a RATE (<1); the reference's count semantics must be "
                    "converted to count/n_rows before loading"
                )
            specs.append(ErrorSpec(row["error"], amount, cols, kwargs))
    return specs


def scale_specs(specs: list[ErrorSpec], mult: float) -> list[ErrorSpec]:
    """generate_error_mult's amount scaling (utils.R:699-709)."""
    return [ErrorSpec(s.error, min(1.0, s.amount * mult), s.cols, s.kwargs) for s in specs]


def benchmark_specs(rate: float = 0.1) -> list[ErrorSpec]:
    """The flagship spec chain — the reference's benchmark error
    distribution (benchmarking/error_table.csv:2-21) re-targeted at the
    pages columns (FIXTURES.md F2). ``rate`` scales the whole chain;
    per-op amounts sum to ≈ the intended distinct-record error rate
    (records double-hit make the realized rate slightly lower; the
    calibration loop closes the gap)."""
    u = rate / 0.92  # ≈ correction for multi-hit overlap at the default mix
    return [
        ErrorSpec("indel", 0.16 * u, ("text",)),
        ErrorSpec("repl", 0.11 * u, ("text",), {"table": "keyboard"}),
        ErrorSpec("repl", 0.05 * u, ("text",), {"table": "ocr"}),
        ErrorSpec("tpose", 0.11 * u, ("text",)),
        ErrorSpec("real_to_nicknames", 0.07 * u, ("text",)),
        ErrorSpec("nick_to_realnames", 0.04 * u, ("text",)),
        ErrorSpec("add_name_suffix", 0.04 * u, ("text",)),
        ErrorSpec("married_name_change", 0.04 * u, ("text",)),
        ErrorSpec("blanks_to_hyphens", 0.04 * u, ("text",)),
        ErrorSpec("hyphens_to_blanks", 0.02 * u, ("text",)),
        ErrorSpec("first_letter_abbreviate", 0.04 * u, ("lang",)),
        ErrorSpec("make_missing", 0.05 * u, ("lang",)),
        ErrorSpec("date_swap", 0.06 * u, ("warc_ts",)),
        ErrorSpec("date_transpose", 0.04 * u, ("warc_ts",), {"token": "year"}),
        ErrorSpec("date_transpose", 0.02 * u, ("warc_ts",), {"token": "day"}),
        ErrorSpec("date_replace", 0.03 * u, ("warc_ts",), {"token": "year"}),
        ErrorSpec("date_replace", 0.02 * u, ("warc_ts",), {"token": "month"}),
        ErrorSpec("date_replace", 0.03 * u, ("warc_ts",), {"token": "day"}),
        ErrorSpec("twins_generate", 0.01 * u, ("text",)),
        ErrorSpec("add_duplicates", 0.10, ("__dup__",)),
    ]


@dataclass
class DirtyOutput:
    """Generator API result — the df_pairs analogue (R/1_error.R:23-25):
    clean stays untouched, dirty + ledger derive from one injector pass."""

    combined: "ray.data.Dataset"  # dirty rows + _ledger column

    @property
    def dirty(self) -> "ray.data.Dataset":
        return strip_ledger(self.combined)

    @property
    def ledger(self) -> "ray.data.Dataset":
        return extract_ledger(self.combined)


def mess_dataset(
    clean: "ray.data.Dataset",
    specs: list[ErrorSpec],
    seed: int = 7,
    asset_seed: int = 42,
    batch_size: int = 4096,
    concurrency=None,
) -> DirtyOutput:
    """``mess_data`` equivalent (R/1_error.R:48-109): the whole spec
    chain as ONE stateful map_batches stage (actor pool when
    ``concurrency`` is set, else stateless tasks reusing the same
    callable)."""
    inj = Injector(specs, seed=seed, asset_seed=asset_seed)
    kwargs: dict[str, Any] = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    combined = clean.map_batches(inj, **kwargs)
    return DirtyOutput(combined)


def calc_perc_id_err(ledger: "ray.data.Dataset", n_rows: int) -> float:
    """Distinct erred ids / nrow (utils.R:648-661) — a bucketed
    distributed unique-count over the ledger (≪ data)."""
    from .shuffle import distinct_count

    distinct = distinct_count(ledger.select_columns(["record_id"]), ["record_id"])
    return distinct / max(1, n_rows)


def calibrate_rate(
    clean: "ray.data.Dataset",
    base_specs: list[ErrorSpec],
    e_target: float,
    seed: int = 7,
    asset_seed: int = 42,
    err_mult_inc: float = 0.25,
    max_iter: int = 8,
    sample_rows: int = 20000,
) -> tuple[list[ErrorSpec], float]:
    """The closed calibration loop of ``generate_error``
    (utils.R:712-768): escalate the multiplier until the realized
    distinct-id rate ≥ e_target. Measured on a bounded sample (the
    per-row Bernoulli gates make the sample rate an unbiased estimate of
    the full-data rate), so calibration cost is O(sample), not O(data)."""
    sample = clean.limit(sample_rows).materialize()
    n = sample.count()
    mult = 1.0
    for _ in range(max_iter):
        specs = scale_specs(base_specs, mult)
        out = mess_dataset(sample, specs, seed=seed, asset_seed=asset_seed)
        realized = calc_perc_id_err(out.ledger, n)
        if realized >= e_target:
            return specs, realized
        mult += err_mult_inc
    return specs, realized


def checkpoint_combined(out: DirtyOutput, path: str) -> dict:
    """Write the combined (dirty + ledger) output once; later stages
    re-read the two views from Parquet instead of re-running injection.
    Returns the manifest (also written to ``path/_MANIFEST.json``) —
    the reference's file-existence resume pattern
    (benchmarking/standard_n.R:12-40), Parquet-native."""
    # clean first: Ray's write_parquet APPENDS uuid-named files, so a
    # rerun (or a crash-retry that left partial files without a
    # manifest) would double the data and the manifest row count (r5
    # review). The manifest is only written after a complete write, so
    # removing a manifest-less directory never loses a valid checkpoint.
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    out.combined.write_parquet(path)
    n = sum(pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path) if f.endswith(".parquet"))
    manifest = {"rows": n, "complete": True}
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def read_checkpoint(path: str) -> "ray.data.Dataset | None":
    mf = os.path.join(path, "_MANIFEST.json")
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        if not json.load(f).get("complete"):
            return None
    return ray.data.read_parquet(path)
