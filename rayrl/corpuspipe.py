"""The flagship training-data composite: quality-filter → exact dedup
→ sequence packing, as ONE streaming pipeline — the end-to-end shape a
user of this engine runs over a raw crawl to get model-ready packs.

Plan (and why it scales):

1. ONE read of the corpus computes everything the later stages need —
   quality score, dup-word fraction, single-space token count, and the
   63-bit content fingerprint — and applies the filter thresholds in
   the same pass. Texts are read once and never re-enter the object
   store: everything downstream is (doc_id, n_tokens, fp) int rows.
2. Exact dedup = min-doc_id keeper per fingerprint: one bucketed
   int-keyed reduce (the oracle groups by the text itself; identical
   up to a ~2⁻⁶³ collision, the engine's standard trade).
3. Packing = the `packing.pack_assignments_ds` distributed prefix sum
   over the surviving docs (range sums → driver prefix over one row
   per id-range → local scans).

The DuckDB oracle reproduces all three stages in SQL (the quality
expression is the term-for-term mirror used by ★quality_scores), so
the whole composite is value-hash checked end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

QUALITY_MIN = 0.60
DUP_WORD_MAX = 0.62
PIPE_BUDGET = 2048
PIPE_RANGE_BITS = 12


def corpus_pipeline(
    sf_dir: str,
    quality_min: float = QUALITY_MIN,
    dup_word_max: float = DUP_WORD_MAX,
    budget: int = PIPE_BUDGET,
    range_bits: int = PIPE_RANGE_BITS,
):
    """(doc_id, n_tokens, pack_id) for every kept, deduplicated doc."""
    from .bytekernels import content_hash64, token_count_kernels
    from .packing import pack_assignments_ds
    from .shuffle import group_agg
    from .text import QualityScorer

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class ScoreFilter:
        """Quality + dup-word filter with ONE tokenization per doc —
        the two metric families share the token multiset, so running
        QualityScorer and RepetitionScorer separately would tokenize
        every doc twice (measured: ~1.4× the whole stage). Arithmetic
        mirrors those scorers (and the oracle) term-for-term."""

        def __init__(self):
            import re

            self.word = re.compile(r"[a-z]+")
            self.stopwords = QualityScorer.STOPWORDS

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = np.zeros(batch.num_rows, dtype=bool)
            for i, t in enumerate(batch.column("text").to_pylist()):
                toks = self.word.findall((t or "").lower())
                n = len(toks)
                if n == 0:
                    keep[i] = 0.0 >= quality_min and 0.0 <= dup_word_max
                    continue
                counts: dict[str, int] = {}
                stop_cnt = 0
                for tok in toks:
                    counts[tok] = counts.get(tok, 0) + 1
                    if tok in self.stopwords:
                        stop_cnt += 1
                stop = stop_cnt / n
                uniq = len(counts) / n
                q = 0.4 * min(1.0, n / 20.0) + 0.3 * min(1.0, stop * 5) + 0.3 * uniq
                keep[i] = (q >= quality_min) and ((1 - uniq) <= dup_word_max)
            kept = batch.filter(pa.array(keep))
            k = token_count_kernels(kept.column("text"))
            ids = kept.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "n_tokens": pa.array(k["n_tokens"].astype(np.int64)),
                    "fp": pa.array(content_hash64(kept.column("text")), pa.int64()),
                }
            )

    survivors = docs.map_batches(
        ScoreFilter, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 16)
    )

    # exact dedup: min-doc_id keeper per fingerprint (n_tokens is
    # constant within a fingerprint group, so min is a safe carrier)
    keepers = group_agg(
        survivors,
        ["fp"],
        {"doc_id": ("doc_id", "min"), "n_tokens": ("n_tokens", "min")},
    )

    def add_range(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(
                    batch.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "range_key": pa.array(ids >> range_bits),
            }
        )

    narrow = keepers.map_batches(add_range, batch_format="pyarrow", zero_copy_batch=True)
    return pack_assignments_ds(narrow, budget)


CORPUS_PIPELINE_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z]+') AS toks
        FROM documents
    ), m AS (
        SELECT doc_id, text, len(toks) AS n,
               len(list_filter(toks, x -> x IN
                   ('the','a','and','of','to','in','is','for','on','with'))) AS stop_cnt,
               len(list_distinct(toks)) AS uniq_cnt
        FROM t
    ), scored AS (
        SELECT doc_id, text,
               CASE WHEN n = 0 THEN 0.0
                    ELSE 0.4 * least(1.0, n / 20.0)
                         + 0.3 * least(1.0, (stop_cnt / CAST(n AS DOUBLE)) * 5)
                         + 0.3 * (uniq_cnt / CAST(n AS DOUBLE)) END AS quality,
               CASE WHEN n = 0 THEN 0.0
                    ELSE 1 - uniq_cnt / CAST(n AS DOUBLE) END AS dup_word_frac
        FROM m
    ), kept AS (
        SELECT doc_id, text FROM scored
        WHERE quality >= {QUALITY_MIN} AND dup_word_frac <= {DUP_WORD_MAX}
    ), ded AS (
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM kept
        ) WHERE rn = 1
    ), tok AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM ded
    )
    SELECT doc_id, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER
                    (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) / {PIPE_BUDGET}.0) AS BIGINT) AS pack_id
    FROM tok
"""

CORPUS_PIPE_QUERIES = {"corpus_pipeline": corpus_pipeline}
CORPUS_PIPE_ORACLES = {"corpus_pipeline": CORPUS_PIPELINE_ORACLE}
