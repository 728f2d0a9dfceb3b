"""Paragraph-level exact deduplication, global keep-first — the C4 /
"Deduplicating Training Data Makes Language Models Better" (Lee et
al., 2022) corpus stage: a paragraph that repeats byte-exactly
anywhere in the corpus survives only at its FIRST occurrence (ordered
by (doc_id, ord)); every later copy is removed from its document and
the survivors are re-joined in order. Differs from line-level
boilerplate removal (`boilerplate.py`, drop-everywhere above a count
threshold): here exactly one copy is kept, and the unit is the
paragraph. Reference parity note: added LLM-corpus operator, no
rlErrorGeneratoR counterpart.

The synthetic documents table is single-paragraph, so the op runs
over a deterministic PARAGRAPH VIEW both engines construct
identically (the boilerplate.py idiom): ``'DOC ' || doc_id ||
\\n\\n || text || \\n\\n || 'SHARED TRAILER ' || source``. The
header paragraph is per-doc unique (every doc survives); the text
paragraph is kept only in the first doc carrying that exact text
(the table plants exact duplicates); the trailer is kept once per
source, in the globally-first doc of that source.

Scale shape (100 TB): document text rides NO shuffle on the default
path. Pass 1 reduces the corpus to an int-only (doc_id, ord, h)
occurrence stream with a per-batch combiner emitting one (h, local
min key, local count) row per distinct hash per batch; ONE bucketed
group-agg yields the global winner key per hash and keeps only
hashes with >= 2 occurrences — the DUPLICATED-paragraph set, which
is sublinear in the corpus (unique paragraphs never enter it, the
same argument as boilerplate's hash set / CLAUDE.md rule 12). Below
a gate that winner table broadcasts once via ``ray.put`` (two
parallel sorted arrays) and pass 2 drops losers batch-side with a
``searchsorted`` probe; above it, the occurrence stream meets the
winners in an int-only bucketed join and docs meet their removal
(doc_id, ord) rows in ONE text shuffle keyed on doc_id. Both paths
are equivalence-tested with the gate forced to 0 (test_newops).

Hash note: 64-bit paragraph hashes stand in for the strings the
oracle compares — a collision removes a wrong paragraph at
~n_paras²/2⁶⁴; negligible and the usual documented trade
(boilerplate.py, decontam.py, snapshot.py).

Keep-first key: (doc_id, ord) packed as doc_id·2²⁰ + ord so a single
int64 min is the lexicographic argmin (ord < 2²⁰ asserted; doc ids
bounded by 2⁴³ — pack before shuffle, ints only).
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

MIN_PARA_LEN = 12  # shorter paragraphs are always kept (headers exempt)
ORD_BITS = 20
BROADCAST_GATE = 2_000_000  # max duplicated-paragraph winner rows to ship
SEP = "\n\n"


def _para_view(batch: pa.Table) -> pa.Table:
    """The deterministic paragraph view (matches the oracle's CTE)."""
    text2 = pc.binary_join_element_wise(
        "DOC ",
        pc.cast(batch.column("doc_id"), pa.string()),
        SEP,
        batch.column("text"),
        SEP,
        "SHARED TRAILER ",
        batch.column("source"),
        "",
    )
    return pa.table({"doc_id": batch.column("doc_id"), "text": text2})


def _split_paras(batch: pa.Table):
    """Flat paragraph array + per-doc lengths/starts (one Arrow
    split_pattern + list_flatten, no Python rows)."""
    split = pc.split_pattern(batch.column("text"), SEP)
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(split)
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    return flat, lens, starts


def _occurrence_cols(batch: pa.Table, min_len: int):
    """(ids, ords, h, flat, lens, starts, cand) for one batch — every
    candidate paragraph occurrence, NOT per-doc-deduped (a later copy
    inside the same doc is a loser too)."""
    batch = _para_view(batch)
    flat, lens, starts = _split_paras(batch)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    ids = np.repeat(doc_ids, lens)
    ords = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    # CHARACTER length, not byte length: the oracle gates on SQL
    # length(para), and a multibyte paragraph near the boundary would
    # otherwise be a candidate on one side only (r5 review)
    cand = pc.utf8_length(flat).to_numpy(zero_copy_only=False) >= min_len
    h = content_hash64(flat.filter(pa.array(cand)))
    return ids, ords, h, flat, lens, starts, cand


def _pack_key(ids: np.ndarray, ords: np.ndarray) -> np.ndarray:
    assert ords.max(initial=0) < (1 << ORD_BITS), "ord overflows the packed key"
    return ids * (1 << ORD_BITS) + ords


def _dup_winners(docs: "ray.data.Dataset", min_len: int) -> "ray.data.Dataset":
    """(h, winkey) for every paragraph hash with >= 2 occurrences:
    winkey = min packed (doc_id, ord). Per-batch combiner first — one
    (h, local min, local count) row per distinct hash per batch — so
    the ONE bucketed group-agg shuffles ints sublinear in occurrences."""

    def partial(batch: pa.Table) -> pa.Table:
        ids, ords, h, *_rest, cand = _occurrence_cols(batch, min_len)
        key = _pack_key(ids[cand], ords[cand])
        order = np.argsort(h, kind="stable")
        h, key = h[order], key[order]
        first = np.ones(len(h), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        idx = np.flatnonzero(first)
        mins = np.minimum.reduceat(key, idx) if len(idx) else key[:0]
        counts = np.diff(np.append(idx, len(h)))
        return pa.table(
            {
                "h": pa.array(h[first], pa.int64()),
                "mn": pa.array(mins, pa.int64()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    agg = group_agg(
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["h"],
        {"winkey": ("mn", "min"), "c": ("c", "sum")},
    )

    def dups_only(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["c"] >= 2, ["h", "winkey"]]

    return agg.map_batches(dups_only, batch_format="pandas")


def paragraph_deduped(
    sf_dir: str,
    min_len: int = MIN_PARA_LEN,
    broadcast_gate: int = BROADCAST_GATE,
):
    """(doc_id, text, n_removed): every doc of the paragraph view with
    later copies of corpus-duplicated paragraphs removed (first
    occurrence by (doc_id, ord) kept) and survivors re-joined with
    \\n\\n in original order."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    # materialized: winners is consumed by count() AND the broadcast /
    # join path below — unmaterialized, the whole pass-1 corpus scan
    # would execute twice (r5 review; same rule as dedup_minhash's
    # narrow-stream barriers)
    winners = _dup_winners(docs, min_len).materialize()
    n_dup = winners.count()

    if n_dup <= broadcast_gate:
        hs, ws = [], []
        for b in winners.iter_batches(batch_format="pyarrow"):
            hs.append(b.column("h").to_numpy())
            ws.append(b.column("winkey").to_numpy())
        if hs:
            h_all = np.concatenate(hs)
            w_all = np.concatenate(ws)
            order = np.argsort(h_all)
            ref = ray.put((h_all[order], w_all[order]))
        else:
            ref = ray.put((np.array([], np.int64), np.array([], np.int64)))

        def clean(batch: pa.Table) -> pa.Table:
            ids, ords, h, flat, lens, starts, cand = _occurrence_cols(batch, min_len)
            dup_h, dup_w = ray.get(ref)
            drop = np.zeros(len(ids), dtype=bool)
            if len(dup_h) and cand.any():
                pos = np.searchsorted(dup_h, h)
                pos_c = np.minimum(pos, len(dup_h) - 1)
                hit = dup_h[pos_c] == h
                key = _pack_key(ids[cand], ords[cand])
                drop[cand] = hit & (key != dup_w[pos_c])
            keep = ~drop
            kept_per_doc = (
                np.add.reduceat(keep, starts) if len(starts) else np.array([], np.int64)
            ).astype(np.int64)
            kept_per_doc[lens == 0] = 0  # reduceat reads past empty slices
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            kept_flat = flat.filter(pa.array(keep))
            offsets = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
            joined = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(offsets), kept_flat), SEP
            )
            out = pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "text": joined,
                    "n_removed": pa.array(lens - kept_per_doc, pa.int64()),
                }
            )
            return out.filter(pa.array(kept_per_doc > 0))

        return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)

    # unbounded-duplication fallback: the winner table stays distributed.
    def occurrences(batch: pa.Table) -> pa.Table:
        ids, ords, h, *_rest, cand = _occurrence_cols(batch, min_len)
        return pa.table(
            {
                "doc_id": pa.array(ids[cand], pa.int64()),
                "ord": pa.array(ords[cand], pa.int64()),
                "h": pa.array(h, pa.int64()),
            }
        )

    occ = docs.map_batches(occurrences, batch_format="pyarrow", zero_copy_batch=True)
    joined = bucketed_join(occ, winners, ["h"])

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        key = _pack_key(
            df["doc_id"].to_numpy().astype(np.int64),
            df["ord"].to_numpy().astype(np.int64),
        )
        return df.loc[key != df["winkey"].to_numpy(), ["doc_id", "ord"]]

    removed = joined.map_batches(losers, batch_format="pandas")

    def pad_docs(batch: pa.Table) -> pa.Table:
        batch = _para_view(batch)
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                "ord": pa.array(np.full(n, -1, np.int64)),
                "side": pa.array(np.zeros(n, np.int8)),
            }
        )

    def pad_removed(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array([""] * n, pa.string()),
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
            parts = text.split(SEP)
            drop = rm.get(int(did), ())
            kept = [p for i, p in enumerate(parts) if i not in drop]
            if not kept:
                continue
            out_ids.append(int(did))
            out_text.append(SEP.join(kept))
            out_rm.append(len(parts) - len(kept))
        return pd.DataFrame(
            {"doc_id": out_ids, "text": out_text, "n_removed": np.array(out_rm, np.int64)}
        )

    return bucketed_group_apply(both, ["doc_id"], assemble)


PARA_DEDUP_ORACLE = f"""
    WITH pview AS (
        SELECT doc_id,
               'DOC ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text ||
               chr(10) || chr(10) || 'SHARED TRAILER ' || source AS text
        FROM documents
    ), paras AS (
        SELECT doc_id,
               unnest(string_split(text, chr(10) || chr(10))) AS para,
               unnest(generate_series(1, len(string_split(text, chr(10) || chr(10)))))
                   AS ord1
        FROM pview
    ), winners AS (
        SELECT para, min(doc_id * {1 << ORD_BITS} + (ord1 - 1)) AS winkey
        FROM paras WHERE length(para) >= {MIN_PARA_LEN}
        GROUP BY para HAVING count(*) >= 2
    ), kept AS (
        SELECT p.doc_id, p.para, p.ord1 FROM paras p
        LEFT JOIN winners w ON p.para = w.para
        WHERE w.para IS NULL
           OR p.doc_id * {1 << ORD_BITS} + (p.ord1 - 1) = w.winkey
    ), totals AS (
        SELECT doc_id, count(*) AS total FROM paras GROUP BY doc_id
    )
    SELECT k.doc_id,
           string_agg(k.para, chr(10) || chr(10) ORDER BY k.ord1) AS text,
           CAST(t.total - count(*) AS BIGINT) AS n_removed
    FROM kept k JOIN totals t USING (doc_id)
    GROUP BY k.doc_id, t.total
"""

PARA_DEDUP_QUERIES = {"paragraph_deduped": paragraph_deduped}
PARA_DEDUP_ORACLES = {"paragraph_deduped": PARA_DEDUP_ORACLE}
