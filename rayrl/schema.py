"""Arrow schemas for the engine's logical tables (SURVEY.md §1.3).

The reference's tables are untyped tibbles; here every logical table has
a declared ``pyarrow.Schema``. The primary input is the Common-Crawl
style ``pages`` table from BASELINE.json ``input_hint``.
"""

from __future__ import annotations

import pyarrow as pa

# Row-uid offsets: rows appended by row-emitting error ops get uids in
# disjoint ranges so every physical row has a unique int64 node id while
# `record_id` stays the ground-truth entity key (the analogue of the
# reference's hidden `voter_reg_num`, benchmarking/utils.R:521-530).
DUP_UID_OFFSET = 1 << 60  # add_duplicates copies
TWIN_UID_OFFSET = 1 << 61  # twin rows (also get a fresh record_id)

PAGES = pa.schema(
    [
        ("record_id", pa.int64()),  # stable per-row key (derives the url)
        ("row_uid", pa.int64()),  # unique physical-row id (== record_id for originals)
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Sibling ground-truth table, never fed to the linkage pipeline.
TRUTH = pa.schema(
    [
        ("record_id", pa.int64()),
        ("url", pa.string()),
        ("entity_id", pa.int64()),
    ]
)

# Arrow port of the reference's error_record attribute
# (/root/reference/R/1_error.R:30-36; ts sequence utils.R:730-732).
LEDGER = pa.schema(
    [
        ("record_id", pa.int64()),
        ("field", pa.string()),
        ("error", pa.string()),
        ("before", pa.string()),
        ("after", pa.string()),
        ("seq", pa.int64()),  # spec-chain stage index (stage order = ledger order)
    ]
)

# Match edges emitted by the in-block pairwise scorer.
EDGES = pa.schema(
    [
        ("node_a", pa.int64()),
        ("node_b", pa.int64()),
        ("truth_a", pa.int64()),
        ("truth_b", pa.int64()),
        ("score", pa.float64()),
    ]
)


def node_id(row_uid: int, side_is_dirty: bool) -> int:
    """Encode (side, row_uid) into one int64 node id."""
    return int(row_uid) * 2 + (1 if side_is_dirty else 0)
