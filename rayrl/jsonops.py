"""Semi-structured (JSON) column extraction — the event-props /
metadata-sidecar shape: a string column carrying a JSON object whose
fields the pipeline needs as typed columns. Parsing is inherently
per-record (there is no Arrow kernel for arbitrary JSON), so it runs
as an actor-pool stage with the stdlib parser and a strict-then-null
contract (malformed rows yield NULL, mirroring SQL ``json_extract``),
and everything downstream of the parse is columnar again.

Scale notes: the parse stage is embarrassingly parallel (stateless per
row, autoscaling pool); the aggregate that follows pre-reduces per
batch before ONE bounded-key groupby-free bucketed reduce — the JSON
strings themselves never ride a shuffle.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .shuffle import group_agg

NULL_K = -(2**62) - 1  # sentinel for the NULL group through the shuffle


class JsonExtract:
    """Extract one integer field from a JSON-string column."""

    def __init__(self, col: str = "props", field: str = "k"):
        self.col, self.field = col, field

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = []
        for s in batch.column(self.col).to_pylist():
            try:
                v = json.loads(s).get(self.field) if s else None
            except (ValueError, AttributeError):
                v = None
            # round() not int(): SQL CAST(double AS BIGINT) rounds
            # half-to-even (DuckDB: 2.5→2, 3.5→4, 3.7→4) — truncation
            # would group k=3.7 under 3 while the oracle groups it
            # under 4 (r5 review, verified against DuckDB)
            vals.append(round(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None)
        out = batch.drop_columns([self.col])
        return out.append_column(self.field, pa.array(vals, pa.int64()))


def props_value_by_k(sf_dir: str):
    """Parse events.props JSON, extract integer field ``k``, aggregate
    value by it: the parse → typed-column → grouped-metric chain.
    The partial aggregate runs inside the same batch pass that parsed
    (JSON never shuffles); one bucketed int-keyed reduce finishes."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["props", "value"])
    return props_value_agg(ds)


def props_value_agg(ds: "ray.data.Dataset"):
    """The parse + aggregate kernel over any (props, value) dataset."""
    parsed = ds.map_batches(
        JsonExtract, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 16)
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        # malformed rows carry k = NULL; a null key would silently drop
        # out of the bucketed shuffle, so it rides as a sentinel and is
        # decoded after the reduce (SQL GROUP BY keeps the NULL group).
        # The sentinel fill happens at the ARROW level: an int64 column
        # with nulls through to_pandas() becomes float64 and silently
        # rounds keys above 2^53 (CLAUDE.md rule 14 — r5 review,
        # verified: 2^60+1 aliased to 2^60)
        df = pd.DataFrame(
            {
                "k": pc.fill_null(batch.column("k"), NULL_K)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "value": batch.column("value").to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("k", sort=False, as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )

    red = group_agg(
        parsed.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["k"],
        {"n_events": ("n_events", "sum"), "sum_value": ("sum_value", "sum")},
        num_buckets=16,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["k"] = df["k"].astype("Int64").replace(NULL_K, pd.NA)
        df["n_events"] = df["n_events"].astype("int64")
        df["sum_value"] = np.round(df["sum_value"], 2)
        return df

    return red.map_batches(finish, batch_format="pandas")


PROPS_VALUE_BY_K_ORACLE = """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1
"""

def export_jsonl(ds: "ray.data.Dataset", out_dir: str) -> dict:
    """Write a corpus as partitioned JSONL shards (the LLM-training
    interchange format — one JSON object per line, one file per block,
    never one giant file, so a failed export reruns per shard and a
    trainer streams shards independently). Returns a manifest
    {n_rows, n_files}. The directory is cleared first: Ray names
    shards uniquely per execution, so a rerun into a stale directory
    would overcount n_files and read_jsonl would yield duplicated
    training rows (r5 review)."""
    import os
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    ds = ds.materialize()
    ds.write_json(out_dir)
    files = [f for f in os.listdir(out_dir) if f.endswith(".json")]
    return {"n_rows": ds.count(), "n_files": len(files)}


def read_jsonl(path: str) -> "ray.data.Dataset":
    """Read a JSONL shard directory back as a Dataset (Arrow-native
    line-JSON reader; schema inferred per shard, unified on read)."""
    return ray.data.read_json(path)


JSON_QUERIES = {"props_value_by_k": props_value_by_k}
JSON_ORACLES = {"props_value_by_k": PROPS_VALUE_BY_K_ORACLE}
