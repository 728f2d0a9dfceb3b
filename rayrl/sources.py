"""Extension-dispatched source reads — ``read_data`` parity.

The reference's ``read_data`` (benchmarking/utils.R:331-343) sniffs the
file extension and routes to read_csv / read_rds. Here the same
dispatch routes to the matching ``ray.data`` reader so every pipeline
in this engine can start from CSV/TSV/JSONL drops as well as Parquet:

- ``.parquet`` (or a directory of them) → ``read_parquet`` with
  ``columns=`` pushed into the read (row-group/column pruning — the
  100 TB rule: never lift columns a 2-column transform won't touch);
- ``.csv`` / ``.tsv`` → ``read_csv`` (Arrow CSV reader; tab delimiter
  inferred from the extension), column pruning applied as a
  ``select_columns`` immediately after the scan (Arrow's CSV reader
  still parses whole rows — convert hot feeds to Parquet for real
  pruning; the dispatch keeps ingest working either way);
- ``.json`` / ``.jsonl`` → ``read_json`` (newline-delimited), same
  post-scan pruning.

Directories dispatch by their CONTENTS (r5 review: a directory of CSV
drops used to be routed blindly to read_parquet and die on an opaque
Arrow magic-bytes error): the members' data extensions are collected
(skipping dot/underscore metadata files), a single consistent kind
routes the whole directory to its reader, and empty or mixed
directories raise this function's own clear ValueError.

The RDS branch has no Ray/Arrow equivalent (R's serialization format);
this engine's checkpoint reader (``rayrl.checkpoint`` — Parquet +
manifest) is the counterpart, matching SURVEY §2.1's mapping.
"""

from __future__ import annotations

import os

import ray.data

_KNOWN_EXTS = (
    ".parquet",
    ".csv.gz",
    ".tsv.gz",
    ".csv",
    ".tsv",
    ".jsonl.gz",
    ".json.gz",
    ".jsonl",
    ".json",
    ".txt.gz",
    ".txt",
)


def _dir_member_ext(path: str) -> str:
    """The single data extension a directory's members share (walked
    recursively — hive partition layouts nest); dot/underscore-prefixed
    metadata files (_metadata, .crc, _SUCCESS) are skipped. Raises with
    a clear message on an empty or mixed-kind directory."""
    kinds: set[str] = set()
    for _root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith((".", "_")):
                continue
            fl = f.lower()
            for e in _KNOWN_EXTS:
                if fl.endswith(e):
                    kinds.add(e)
                    break
    if not kinds:
        raise ValueError(
            f"read_any: directory {path!r} has no recognized data files "
            "(parquet/csv/tsv/json[l]/txt)"
        )
    if len(kinds) > 1:
        raise ValueError(
            f"read_any: directory {path!r} mixes {sorted(kinds)} — "
            "point at one format (or one subdirectory) at a time"
        )
    return kinds.pop()


def read_any(path: str, columns: "list[str] | None" = None, **kw):
    """Read ``path`` into a Dataset by extension dispatch. ``columns``
    prunes at the scan for Parquet and right after it otherwise;
    unknown extensions raise rather than guess. Directories dispatch on
    the extension their member files share."""
    # suffix of the BASENAME — a '.tsv' in a directory component must
    # not flip a .csv file to tab parsing; for directories, the members
    # decide
    low = _dir_member_ext(path) if os.path.isdir(path) else os.path.basename(path).lower()
    if low.endswith(".parquet"):
        return ray.data.read_parquet(path, columns=columns, **kw)
    if low.endswith((".csv", ".tsv", ".csv.gz", ".tsv.gz")):
        if low.endswith((".tsv", ".tsv.gz")):
            from pyarrow import csv as pacsv

            kw.setdefault("parse_options", pacsv.ParseOptions(delimiter="\t"))
        ds = ray.data.read_csv(path, **kw)
    elif low.endswith((".json", ".jsonl", ".json.gz", ".jsonl.gz")):
        ds = ray.data.read_json(path, **kw)
    elif low.endswith((".txt", ".txt.gz")):
        # raw corpus drop: one row per line under the documents-table
        # "text" column name so downstream text stages apply unchanged
        ds = ray.data.read_text(path, **kw)
    else:
        raise ValueError(
            f"read_any: no reader for {path!r} (parquet/csv/tsv/json[l]/txt)"
        )
    return ds.select_columns(columns) if columns else ds
