"""Line-level boilerplate removal — the CCNet/RefinedWeb corpus stage:
a line that repeats (byte-exact) across >= K distinct documents is
boilerplate (nav bars, cookie banners, copyright footers) and is
dropped from every document; each document's surviving lines are
re-joined in order. Reference parity note: this is an added
LLM-corpus operator (no rlErrorGeneratoR counterpart), following the
line-dedup stage of CCNet (Wenzek et al., 2020).

The synthetic documents table is single-line, so the op runs over a
deterministic LINED VIEW both engines construct identically (the
snapshot_diff idiom): ``'DOC ' || doc_id || \\n || text || \\n ||
'COPYRIGHT NOTICE ' || source``. The per-source footer is genuine
cross-doc boilerplate (removed everywhere); the header is per-doc
unique (never removed, so no document vanishes); the middle line is
removed only where the same full text repeats across >= K docs.

Scale shape (100 TB): document text rides NO shuffle on the default
path. Pass 1 reduces each doc to per-doc-unique candidate-line
hashes, pre-counted per batch, and a bucketed int-only group-sum
finds lines with >= K distinct docs. That boilerplate hash set is
sublinear in the corpus (it is a subset of the distinct-line
vocabulary — CLAUDE.md rule 12), so it broadcasts once via
``ray.put`` below a gate and pass 2 filters lines batch-side with a
``searchsorted`` probe. Above the gate, the fallback keeps the set
distributed: an int-only bucketed semi-join yields (doc_id, ord)
removal rows and docs meet them in ONE bucketed shuffle keyed on
doc_id (the only time text moves). Both paths are equivalence-tested
with the gate forced to 0 (test_newops).

Hash note: the engine compares 64-bit line hashes where the oracle
compares line strings — a collision removes a wrong line at
~n_lines²/2⁶⁴; negligible and the usual documented trade
(decontam.py, snapshot.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .bytekernels import content_hash64
from .shuffle import bucketed_group_apply, bucketed_join, group_agg

K_DOCS = 4
MIN_LINE_LEN = 8
BROADCAST_GATE = 2_000_000  # max boilerplate hashes to ship as one array


def _lined(batch: pa.Table) -> pa.Table:
    """The deterministic lined view (matches the oracle's `lined` CTE)."""
    text2 = pc.binary_join_element_wise(
        "DOC ",
        pc.cast(batch.column("doc_id"), pa.string()),
        "\n",
        batch.column("text"),
        "\nCOPYRIGHT NOTICE ",
        batch.column("source"),
        "",
    )
    return pa.table({"doc_id": batch.column("doc_id"), "text": text2})


def _split_lines(batch: pa.Table):
    """Flat line array + per-doc offsets for a lined batch.
    Vectorized: one Arrow split_pattern + list_flatten, no Python rows."""
    split = pc.split_pattern(batch.column("text"), "\n")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(split)
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    return flat, lens, starts


def _line_rows(ds: "ray.data.Dataset", min_len: int) -> "ray.data.Dataset":
    """(doc_id, ord, h) int64 stream of candidate lines (len >= min_len),
    de-duplicated per doc so a line repeated inside one document still
    counts that document once."""

    def emit(batch: pa.Table) -> pa.Table:
        batch = _lined(batch)
        flat, lens, _ = _split_lines(batch)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids = np.repeat(doc_ids, lens)
        ords = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        cand = pc.binary_length(flat).to_numpy(zero_copy_only=False) >= min_len
        h = content_hash64(flat.filter(pa.array(cand)))
        ids, ords = ids[cand], ords[cand]
        # per-doc dedup: first ord of each (doc, hash) survives
        order = np.lexsort((ords, h, ids))
        ids, ords, h = ids[order], ords[order], h[order]
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = (ids[1:] != ids[:-1]) | (h[1:] != h[:-1])
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "ord": pa.array(ords[keep], pa.int64()),
                "h": pa.array(h[keep], pa.int64()),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def _boiler_hashes(lines: "ray.data.Dataset", k_docs: int) -> "ray.data.Dataset":
    """(h) rows for every line hash seen in >= k_docs distinct docs.
    Counts are pre-aggregated inside each batch (ints only) before the
    ONE bucketed group-sum, so the shuffle carries one row per distinct
    hash per batch, not per occurrence."""

    def partial(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())})

    counts = group_agg(
        lines.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["h"],
        {"c": ("c", "sum")},
    )

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["c"] >= k_docs, ["h"]]

    return counts.map_batches(thresh, batch_format="pandas")


def boilerplate_cleaned(
    sf_dir: str,
    k_docs: int = K_DOCS,
    min_len: int = MIN_LINE_LEN,
    broadcast_gate: int = BROADCAST_GATE,
):
    """(doc_id, text, n_removed): every doc of the lined view with its
    boilerplate lines (>= k_docs distinct docs, len >= min_len) removed
    and the rest re-joined with \\n in original order."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    lines = _line_rows(docs, min_len).materialize()  # narrow ints; scanned once more below
    # materialized: count() + the broadcast iter / fallback join each
    # consume it — unmaterialized, the distinct-line count shuffle ran
    # twice per call (r5 review; the double-scan barrier rule)
    boiler = _boiler_hashes(lines, k_docs).materialize()
    n_boiler = boiler.count()

    if n_boiler <= broadcast_gate:
        parts = [
            b.column("h").to_numpy() for b in boiler.iter_batches(batch_format="pyarrow")
        ]
        arr = np.sort(np.concatenate(parts)) if parts else np.array([], np.int64)
        ref = ray.put(arr)

        def clean(batch: pa.Table) -> pa.Table:
            batch = _lined(batch)
            flat, lens, starts = _split_lines(batch)
            bad_set = ray.get(ref)
            nlen = pc.binary_length(flat).to_numpy(zero_copy_only=False)
            cand = nlen >= min_len
            bad = np.zeros(len(nlen), dtype=bool)
            if len(bad_set) and cand.any():
                h = content_hash64(flat.filter(pa.array(cand)))
                pos = np.searchsorted(bad_set, h)
                pos_c = np.minimum(pos, len(bad_set) - 1)
                bad[cand] = bad_set[pos_c] == h
            # vectorized reassembly: kept lines become a list column
            # re-sliced at per-doc offsets, joined by one Arrow kernel
            keep = ~bad
            kept_per_doc = (
                np.add.reduceat(keep, starts) if len(starts) else np.array([], np.int64)
            ).astype(np.int64)
            kept_per_doc[lens == 0] = 0  # reduceat reads past empty slices
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            kept_flat = flat.filter(pa.array(keep))
            offsets = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
            joined = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(offsets), kept_flat), "\n"
            )
            out = pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "text": joined,
                    "n_removed": pa.array(lens - kept_per_doc, pa.int64()),
                }
            )
            # fully-boilerplate docs drop out (oracle parity)
            return out.filter(pa.array(kept_per_doc > 0))

        return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)

    # unbounded-boilerplate fallback: the hash set stays distributed.
    # Every line occurrence (not per-doc-deduped) must be matched, so a
    # fresh occurrence stream joins the boiler set int-only, and docs
    # meet their removal (doc_id, ord) rows in ONE text shuffle.
    def occurrences(batch: pa.Table) -> pa.Table:
        batch = _lined(batch)
        flat, lens, _ = _split_lines(batch)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids = np.repeat(doc_ids, lens)
        ords = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        cand = pc.binary_length(flat).to_numpy(zero_copy_only=False) >= min_len
        h = content_hash64(flat.filter(pa.array(cand)))
        return pa.table(
            {
                "doc_id": pa.array(ids[cand], pa.int64()),
                "ord": pa.array(ords[cand], pa.int64()),
                "h": pa.array(h, pa.int64()),
            }
        )

    occ = docs.map_batches(occurrences, batch_format="pyarrow", zero_copy_batch=True)
    removed = bucketed_join(occ, boiler, ["h"]).select_columns(["doc_id", "ord"])

    def pad_docs(batch: pa.Table) -> pa.Table:
        batch = _lined(batch)
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                # -1 sentinel, NOT null: a null-padded int64 through the
                # in-bucket pandas frame turns float64 (CLAUDE.md rule
                # 14); the doc side's ord is never read — same contract
                # as bucketed_join's zero-pad
                "ord": pa.array(np.full(n, -1, np.int64)),
                "side": pa.array(np.zeros(n, np.int8)),
            }
        )

    def pad_removed(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.nulls(n, pa.string()),
                "ord": batch.column("ord"),
                "side": pa.array(np.ones(n, np.int8)),
            }
        )

    both = docs.map_batches(pad_docs, batch_format="pyarrow", zero_copy_batch=True).union(
        removed.map_batches(pad_removed, batch_format="pyarrow", zero_copy_batch=True)
    )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["side"] == 0]
        r = df[df["side"] == 1]
        rm: dict[int, set] = {
            int(k): set(v) for k, v in r.groupby("doc_id")["ord"].apply(set).items()
        }
        out_ids, out_text, out_rm = [], [], []
        for did, text in zip(d["doc_id"].to_numpy(), d["text"]):
            parts = text.split("\n")
            drop = rm.get(int(did), ())
            kept = [p for i, p in enumerate(parts) if i not in drop]
            if not kept:
                continue
            out_ids.append(int(did))
            out_text.append("\n".join(kept))
            out_rm.append(len(parts) - len(kept))
        return pd.DataFrame(
            {"doc_id": out_ids, "text": out_text, "n_removed": np.array(out_rm, np.int64)}
        )

    return bucketed_group_apply(both, ["doc_id"], assemble)


BOILERPLATE_ORACLE = f"""
    WITH lined AS (
        SELECT doc_id,
               'DOC ' || CAST(doc_id AS VARCHAR) || chr(10) || text ||
               chr(10) || 'COPYRIGHT NOTICE ' || source AS text
        FROM documents
    ), lines AS (
        SELECT doc_id,
               unnest(string_split(text, chr(10))) AS line,
               unnest(generate_series(1, len(string_split(text, chr(10))))) AS ord
        FROM lined
    ), boiler AS (
        SELECT line FROM lines WHERE length(line) >= {MIN_LINE_LEN}
        GROUP BY line HAVING count(DISTINCT doc_id) >= {K_DOCS}
    ), kept AS (
        SELECT doc_id, line, ord FROM lines
        WHERE line NOT IN (SELECT line FROM boiler)
    ), totals AS (
        SELECT doc_id, count(*) AS total FROM lines GROUP BY doc_id
    )
    SELECT k.doc_id,
           string_agg(k.line, chr(10) ORDER BY k.ord) AS text,
           CAST(t.total - count(*) AS BIGINT) AS n_removed
    FROM kept k JOIN totals t USING (doc_id)
    GROUP BY k.doc_id, t.total
"""

BOILERPLATE_QUERIES = {"boilerplate_cleaned": boilerplate_cleaned}
BOILERPLATE_ORACLES = {"boilerplate_cleaned": BOILERPLATE_ORACLE}
