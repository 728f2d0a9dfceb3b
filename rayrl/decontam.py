"""Benchmark decontamination: flag corpus documents that share any
word n-gram with a held-out benchmark/eval set — the train/test
overlap scrub every LLM training pipeline runs before training (PaLM
and GPT-3 style n-gram overlap checks; n=8 words here, the PaLM
choice).

Scale shape (the whole point at 100 TB): documents NEVER ride a
shuffle. Each side is reduced to a narrow (doc_id, gram_hash) int64
stream — tokens are hashed C-speed (`bytekernels.content_hash64`) and
the n-gram hash is a vectorized polynomial combine over the flat
token-hash array with doc-boundary masking, deduplicated per doc
in-batch (docs are whole within the stage that read them, CLAUDE.md
rule 13). The benchmark side's distinct gram set is then either

- BROADCAST (the default below a gate): one sorted uint64 array via
  `ray.put`, probed per batch with `searchsorted` — zero shuffle, the
  right plan while the eval set is sublinear in the corpus
  (CLAUDE.md rule 12); or
- JOINED (above the gate): a bucketed hash semi-join on gram_hash,
  ints only — the unbounded-eval-set fallback.

Both paths are equivalence-tested (`test_text_ops`). Hash note: the
engine compares 63-bit gram hashes where the oracle compares gram
strings; a collision would add a false contamination hit at
~n_grams²/2⁶³ probability — negligible below ~10¹⁸ grams and
acceptable for a scrub whose cost asymmetry favors recall anyway.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .bytekernels import content_hash64
from .shuffle import bucketed_join, distinct_rows, group_agg

N_GRAM = 8
BENCH_MOD = 29  # doc_id % 29 == 0 -> the held-out benchmark set
BROADCAST_GATE = 5_000_000  # max benchmark grams to ship as one array
_P = np.uint64(0x100000001B3)  # FNV prime, the repo's rolling-hash base
_WORD = re.compile(r"[a-z]+")


def _gram_stream(ds: "ray.data.Dataset", n: int) -> "ray.data.Dataset":
    """(doc_id, gram) int64 stream: per-doc-unique hashes of all word
    n-grams. Tokenization mirrors the oracle ([a-z]+ on lower); the
    numeric work (token hashing, polynomial combine, per-doc dedup) is
    vectorized over the batch's flat token array."""

    def emit(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks_per_doc = [
            _WORD.findall((t or "").lower()) for t in batch.column("text").to_pylist()
        ]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        flat: list[str] = [t for toks in toks_per_doc for t in toks]
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "gram": pa.array([], pa.int64())}
        )
        if not flat:
            return empty
        h = content_hash64(pa.array(flat, pa.string())).astype(np.uint64)
        # g[i] = sum_j h[i+j] * P^(n-1-j)  (uint64 wraparound), i = gram start
        L = len(h)
        if L < n:
            return empty
        g = np.zeros(L - n + 1, dtype=np.uint64)
        for j in range(n):
            g = g * _P + h[j : L - n + 1 + j]
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        n_grams = np.maximum(lens - n + 1, 0)
        # flat indices of each doc's valid gram starts
        idx = np.repeat(starts, n_grams) + (
            np.arange(int(n_grams.sum())) - np.repeat(np.cumsum(n_grams) - n_grams, n_grams)
        )
        ids = np.repeat(doc_ids, n_grams)
        grams = (g[idx] >> np.uint64(1)).astype(np.int64)  # 63-bit, int64-safe
        # per-doc dedup: sort (doc, gram) and drop adjacent repeats
        order = np.lexsort((grams, ids))
        ids, grams = ids[order], grams[order]
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = (ids[1:] != ids[:-1]) | (grams[1:] != grams[:-1])
        return pa.table(
            {"doc_id": pa.array(ids[keep], pa.int64()), "gram": pa.array(grams[keep], pa.int64())}
        )

    return ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def contaminated_docs(
    sf_dir: str,
    n: int = N_GRAM,
    bench_mod: int = BENCH_MOD,
    broadcast_gate: int = BROADCAST_GATE,
):
    """(doc_id, n_shared) for every non-benchmark doc sharing ≥1 word
    n-gram with the benchmark subset (doc_id % bench_mod == 0);
    n_shared = how many of the doc's distinct grams are contaminated."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    grams = _gram_stream(docs, n).materialize()  # narrow ints; scanned twice

    def _mod_filter(want_bench: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = ids % bench_mod == 0
            return t.filter(pa.array(m if want_bench else ~m))

        return fn

    bench = grams.map_batches(
        _mod_filter(True), batch_format="pyarrow", zero_copy_batch=True
    )
    n_bench = bench.count()
    if n_bench <= broadcast_gate:
        # distinct-ify driver-side: n_bench is gated, grams are 8 bytes
        parts = [b.column("gram").to_numpy() for b in bench.iter_batches(batch_format="pyarrow")]
        bench_arr = np.unique(np.concatenate(parts)) if parts else np.array([], np.int64)
        ref = ray.put(bench_arr)

        def probe(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            g = batch.column("gram").to_numpy(zero_copy_only=False)
            arr = ray.get(ref)
            keep = ids % bench_mod != 0
            pos = np.searchsorted(arr, g[keep])
            hit = (pos < len(arr)) & (arr[np.minimum(pos, len(arr) - 1)] == g[keep]) if len(arr) else np.zeros(keep.sum(), bool)
            hid = ids[keep][hit]
            if len(hid) == 0:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()), "n_shared": pa.array([], pa.int64())}
                )
            u, c = np.unique(hid, return_counts=True)
            return pa.table(
                {"doc_id": pa.array(u, pa.int64()), "n_shared": pa.array(c, pa.int64())}
            )

        partial = grams.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        # a doc's grams are emitted within one batch (per-doc dedup already
        # global), but re-batching between materialize and probe can split a
        # doc across batches — reduce to be safe
        return group_agg(partial, ["doc_id"], {"n_shared": ("n_shared", "sum")})

    # unbounded-benchmark fallback: bucketed int semi-join
    bench_grams = distinct_rows(
        bench.map_batches(
            lambda t: t.select(["gram"]), batch_format="pyarrow", zero_copy_batch=True
        ),
        ["gram"],
    )
    probe_side = grams.map_batches(
        _mod_filter(False), batch_format="pyarrow", zero_copy_batch=True
    )
    hits = bucketed_join(probe_side, bench_grams, ["gram"])
    return group_agg(hits, ["doc_id"], {"n_shared": ("gram", "size")})


CONTAMINATED_DOCS_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
        FROM documents
    ), p AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {N_GRAM - 1})) AS i
        FROM t
    ), g AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+{N_GRAM - 1}], ' ') AS gram
        FROM p
    ), bench AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MOD} = 0
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM g JOIN bench USING (gram)
    WHERE doc_id % {BENCH_MOD} != 0
    GROUP BY doc_id
"""

DECONTAM_QUERIES = {"contaminated_docs": contaminated_docs}
DECONTAM_ORACLES = {"contaminated_docs": CONTAMINATED_DOCS_ORACLE}
