"""BPE tokenizer training + encoding — the tokenizer-construction
stage of an LLM data pipeline (Sennrich et al. 2016 byte-pair
encoding, the word-dictionary formulation every production trainer
uses).

Reference parity: an added LLM-corpus operator (no rlErrorGeneratoR
counterpart); no SQL oracle (iterative merge learning) — rows-only
driver check, pytest verifies the classic hand-computable example and
determinism at any parallelism.

Scale shape: BPE trains on the WORD-FREQUENCY DICTIONARY, not the
token stream — and the word vocabulary is Heaps-sublinear in the
corpus, so ONE distributed word-count pass (per-batch distinct
partials → one vocabulary-sized reduce) feeds a driver-side merge loop
that never touches a document again. That driver loop is bounded by
``max_word_vocab`` (the trainer truncates to the most frequent words,
exactly what sentencepiece/HF tokenizers do at web scale — rare-word
tails don't move merge counts). Encoding is an actor-pool pass with a
per-actor word→encoding memo (vocabulary-bounded), so each distinct
word is encoded once per actor however many times it occurs.

Determinism: merge ties break by (pair count desc, pair lexicographic
asc); the word-count reduce is exact integer arithmetic, so the
learned merge list is identical at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .shuffle import group_agg

N_MERGES = 24
MAX_WORD_VOCAB = 5_000_000
END = "\x01"  # end-of-word sentinel symbol (never occurs in text)


def word_counts(sf_dir: str) -> "ray.data.Dataset":
    """(word, n) corpus word frequencies — per-batch distinct partials,
    one vocabulary-sized reduce."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        split = pc.split_pattern(batch.column("text").combine_chunks(), " ")
        t = pc.list_flatten(split).to_pandas()
        return t.value_counts(sort=False).rename_axis("word").reset_index(name="n")

    return group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["word"],
        {"n": ("n", "sum")},
    )


def train_bpe_from_counts(
    counts: pd.DataFrame, n_merges: int = N_MERGES
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, n) frame. Ties break
    by count desc then pair lexicographic asc (deterministic)."""
    words = {
        tuple(w) + (END,): int(n)
        for w, n in zip(counts["word"], counts["n"])
        if isinstance(w, str) and w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple, int] = {}
        for sym, n in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + n
        words = nxt
    return merges


def train_bpe(
    sf_dir: str, n_merges: int = N_MERGES, max_word_vocab: int = MAX_WORD_VOCAB
) -> list[tuple[str, str]]:
    """One distributed word-count pass → driver merge loop. The word
    dictionary collects to the driver truncated to the
    ``max_word_vocab`` most frequent words (count desc, word asc) —
    the sentencepiece-style training bound."""
    wc = word_counts(sf_dir)

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "word"], ascending=[False, True]).head(
            max_word_vocab
        )

    cand = wc.map_batches(local_top, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["n", "word"], ascending=[False, True]).head(max_word_vocab)
    return train_bpe_from_counts(cand, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges in rank order (lowest rank first) — the standard
    BPE inference loop."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BpeEncoder:
    """Actor-pool stage: merges table loaded once per actor; per-actor
    word→len memo so each DISTINCT word pays the merge loop once."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref)
        self._ranks = {tuple(m): i for i, m in enumerate(merges)}
        self._memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc.split_pattern(batch.column("text").combine_chunks(), " ")
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(split).to_pylist()
        memo, ranks = self._memo, self._ranks
        n_pieces = np.zeros(len(flat), dtype=np.int64)
        for i, w in enumerate(flat):
            c = memo.get(w)
            if c is None:
                c = len(encode_word(w, ranks))
                memo[w] = c
            n_pieces[i] = c
        cs = np.concatenate([[0], np.cumsum(n_pieces)])
        ends = np.cumsum(lens)
        per_doc = cs[ends] - cs[ends - lens]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_words": pa.array(lens),
                "n_bpe_pieces": pa.array(per_doc, pa.int64()),
            }
        )


def bpe_token_counts(sf_dir: str, n_merges: int = N_MERGES):
    """(doc_id, n_words, n_bpe_pieces): train BPE on the corpus's own
    word dictionary, then encode every document — the
    "tokenizer-fit-then-tokenize" pipeline in one call."""
    merges = train_bpe(sf_dir, n_merges)
    ref = ray.put(merges)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


BPE_QUERIES = {"bpe_token_counts": bpe_token_counts}
