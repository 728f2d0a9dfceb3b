"""TF-IDF top terms per document — the keyword-extraction /
relevance-weighting stage of a text corpus pipeline, built to the
minimum-shuffle plan:

- **tf needs no shuffle at all**: a document lives in one row, so the
  per-(doc, term) counts fall out of each batch locally.
- **df pre-aggregates before its shuffle**: each batch emits one
  (term, partial_df) row per distinct term it saw, so the term-keyed
  reduce moves a vocabulary-sized stream, not a token-sized one.
- **the df lookup broadcasts, it does not join**: vocabulary is
  sublinear in the corpus (Heaps' law), so the (term → df) map rides
  one ``ray.put`` and the weighting + per-doc top-k fuse into the SAME
  batch pass that computed tf — zero token-level rows ever shuffle.
  Measured at 500k docs / 32 cpus: 90.2 s (join plan, two ~10⁸-row
  exchanges) → see BASELINE.md for the fused number.
- Above ``broadcast_vocab_max`` the plan falls back to the bucketed
  tf⋈df hash join + doc_id regroup (still narrow rows only), the
  unbounded-vocabulary path.

Single-space tokenization matches the token_counts / SQL-oracle
semantics (the oracle is the window-function formulation)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .bytekernels import split_tokens

TOP_K = 3


def _flat_token_hashes(batch: pa.Table):
    """(per-doc token lens, flat 64-bit token hashes) — the shared
    tokenize-and-hash prelude of doc_surprisal and dsir_logratio (r5
    review: the two copies had to be kept in sync by hand)."""
    from .bytekernels import content_hash64

    split, lens = split_tokens(batch.column("text"))
    return lens, content_hash64(pc.list_flatten(split))


def _tf_rows(sf_dir: str):
    """(doc_id, term, tf) without a shuffle: explode + count per batch."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tf(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        split, lens = split_tokens(batch.column("text"))
        terms = pc.list_flatten(split).to_pandas()
        df = pd.DataFrame({"doc_id": np.repeat(ids, lens), "term": terms})
        out = df.groupby(["doc_id", "term"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "tf"})

    return ds.map_batches(tf, batch_format="pyarrow", zero_copy_batch=True)


BROADCAST_VOCAB_MAX = 20_000_000  # (term, df) pairs; ~1-2 GB broadcast


def _topk_frame(g: pd.DataFrame, n_docs: int, k: int) -> pd.DataFrame:
    """Weight + per-doc top-k over a frame of (doc_id, term, tf, df)
    rows in which every doc is complete."""
    g = g.copy()
    g["_w"] = g["tf"].to_numpy() * np.log(n_docs / g["df"].to_numpy())
    g = g.sort_values(["doc_id", "_w", "term"], ascending=[True, False, True])
    g = g.groupby("doc_id", sort=False).head(k)
    g["tfidf"] = g["_w"].round(6)
    return g[["doc_id", "term", "tf", "df", "tfidf"]]


class _FusedTfidfStage:
    """Actor-pool stage: the (term → df) map deserializes ONCE per
    actor in ``__init__`` (a string-indexed Series is not zero-copy —
    per-batch ``ray.get`` in a task would pay it every batch); each
    batch then computes tf, the df lookup and the per-doc top-k
    locally (a doc is one input row, so its tf rows are batch-local)."""

    def __init__(self, df_ref, n_docs: int, k: int):
        self._dfmap = ray.get(df_ref)
        self._n_docs = n_docs
        self._k = k

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        split, lens = split_tokens(batch.column("text"))
        terms = pc.list_flatten(split).to_pandas()
        g = (
            pd.DataFrame({"doc_id": np.repeat(ids, lens), "term": terms})
            .groupby(["doc_id", "term"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        g["df"] = g["term"].map(self._dfmap).to_numpy()
        return _topk_frame(g, self._n_docs, self._k)


def tfidf_top_terms(
    sf_dir: str, k: int = TOP_K, broadcast_vocab_max: int = BROADCAST_VOCAB_MAX
):
    """Top-k terms per doc by tf·ln(N/df), ties broken by term asc."""
    from .shuffle import bucketed_group_apply, bucketed_join, group_agg

    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()

    # df: one partial row per (batch, term) going in, so the term
    # reduce is vocabulary-sized
    def partial_df(batch: pa.Table) -> pd.DataFrame:
        t = batch.column("term").to_pandas()
        return t.value_counts(sort=False).rename_axis("term").reset_index(name="df")

    tf_for_df = _tf_rows(sf_dir)
    df_tbl = group_agg(
        tf_for_df.map_batches(partial_df, batch_format="pyarrow", zero_copy_batch=True),
        ["term"],
        {"df": ("df", "sum")},
        num_buckets=32,
    ).materialize()  # vocabulary-sized

    if df_tbl.count() <= broadcast_vocab_max:
        # fused path: broadcast (term → df) once; tf, the df lookup and
        # the per-doc top-k all happen inside the tokenizing batch pass
        # (a doc lives in one row, so its tf rows are batch-local) —
        # nothing token-level ever shuffles.
        dfp = df_tbl.to_pandas()
        df_ref = ray.put(pd.Series(dfp["df"].to_numpy(), index=dfp["term"].to_numpy()))

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return docs.map_batches(
            _FusedTfidfStage,
            fn_constructor_args=(df_ref, n_docs, k),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 16),
        )

    # unbounded-vocabulary fallback: bucketed tf⋈df + doc regroup
    tf = _tf_rows(sf_dir)
    joined = bucketed_join(tf, df_tbl, ["term"], num_buckets=32)
    return bucketed_group_apply(
        joined, ["doc_id"], lambda g: _topk_frame(g, n_docs, k), num_buckets=32
    )


TFIDF_TOP_TERMS_ORACLE = f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 tf.tf * ln((SELECT n FROM n) * 1.0 / df.df) AS w,
                 row_number() OVER (PARTITION BY tf.doc_id
                     ORDER BY tf.tf * ln((SELECT n FROM n) * 1.0 / df.df) DESC,
                              tf.term ASC) AS rk
          FROM tf JOIN df USING (term))
    SELECT doc_id, term, tf, df, round(w, 6) AS tfidf
    FROM s WHERE rk <= {TOP_K}
"""


BIGRAM_MIN_COUNT = 10


def bigram_counts(sf_dir: str, min_count: int = BIGRAM_MIN_COUNT):
    """Corpus-wide adjacent-token-pair counts above a threshold — the
    vocabulary-building pass of a BPE/WordPiece-style tokenizer (which
    merges the most frequent adjacent pair each round) and the raw
    material for PMI collocation scores.

    Scale shape: bigrams never leave their batch as occurrences — each
    batch emits one (t1, t2, partial n) row per DISTINCT pair it saw
    (the tfidf df-emit shape), so the single bucketed reduce moves a
    bigram-vocabulary-sized stream (Heaps-sublinear), not a
    token-sized one; the threshold then prunes inside the reduce."""
    from .shuffle import group_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        split, lens = split_tokens(batch.column("text"))
        flat = pc.list_flatten(split).to_pandas().to_numpy()
        n_bi = np.maximum(lens - 1, 0)
        if not n_bi.sum():
            # TYPED empty: bare [] columns materialize float64 and the
            # bucketed shuffle cannot unify double with the string
            # blocks other batches emit (r5 review)
            return pd.DataFrame(
                {
                    "t1": pd.Series([], dtype=object),
                    "t2": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        idx = np.repeat(starts, n_bi) + (
            np.arange(int(n_bi.sum())) - np.repeat(np.cumsum(n_bi) - n_bi, n_bi)
        )
        pairs = pd.DataFrame({"t1": flat[idx], "t2": flat[idx + 1]})
        out = pairs.groupby(["t1", "t2"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "n"})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = group_agg(partials, ["t1", "t2"], {"n": ("n", "sum")})

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n"] >= min_count]

    return counts.map_batches(thresh, batch_format="pandas")


BIGRAM_COUNTS_ORACLE = f"""
    WITH t AS (
        SELECT string_split(text, ' ') AS toks FROM documents
    ), p AS (
        SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t
    )
    SELECT toks[i] AS t1, toks[i + 1] AS t2, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY t1, t2 HAVING count(*) >= {BIGRAM_MIN_COUNT}
"""

SURPRISAL_BROADCAST_MAX = 20_000_000  # (hash, count) pairs ≈ 16 B each


def doc_surprisal(sf_dir: str, broadcast_gate: int = SURPRISAL_BROADCAST_MAX):
    """(doc_id, n_toks, surprisal): per-document average negative log
    probability under the corpus's own unigram model — the CCNet-style
    perplexity filter (documents whose tokens are globally rare score
    high; template/boilerplate text scores low).

    Scale shape: the unigram model is the vocabulary (Heaps-sublinear,
    CLAUDE.md rule 12), so below the gate the (token-hash → count)
    arrays broadcast once via ``ray.put`` and scoring fuses into the
    SAME pass that tokenizes — per-doc log-prob sums fall out of one
    ``np.add.reduceat`` over the batch's flat token array; no token
    row ever shuffles. Above the gate, (doc_id, hash) occurrence rows
    meet the count stream in a bucketed int join and one more bucketed
    reduce re-groups per doc — ints only, two narrow shuffles. Paths
    are equivalence-tested with the gate forced to 0.

    Hash note: tokens are compared as 64-bit hashes where the oracle
    compares strings — a collision merges two tokens' counts at
    ~vocab²/2⁶⁴ probability (the decontam.py trade)."""
    from .bytekernels import content_hash64
    from .shuffle import bucketed_join, group_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    _flat_hashes = _flat_token_hashes

    def freq_partial(batch: pa.Table) -> pd.DataFrame:
        _, h = _flat_hashes(batch)
        u, c = np.unique(h, return_counts=True)
        return pd.DataFrame({"h": u, "n": c.astype(np.int64)})

    freq = group_agg(
        ds.map_batches(freq_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["h"],
        {"n": ("n", "sum")},
    ).materialize()
    total = float(freq.sum("n"))
    n_vocab = freq.count()

    if n_vocab <= broadcast_gate:
        parts = [
            (b.column("h").to_numpy(), b.column("n").to_numpy())
            for b in freq.iter_batches(batch_format="pyarrow")
        ]
        hs = np.concatenate([p[0] for p in parts]) if parts else np.array([], np.int64)
        ns = np.concatenate([p[1] for p in parts]) if parts else np.array([], np.int64)
        order = np.argsort(hs)
        ref = ray.put((hs[order], np.log(ns[order].astype(np.float64) / total)))

        def score(batch: pa.Table) -> pa.Table:
            lens, h = _flat_hashes(batch)
            vocab_h, vocab_lp = ray.get(ref)
            lp = vocab_lp[np.searchsorted(vocab_h, h)]  # every token is in-vocab
            starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
            sums = np.where(
                lens > 0,
                np.add.reduceat(lp, starts) if len(lp) else 0.0,
                0.0,
            )
            with np.errstate(invalid="ignore"):
                sup = np.round(-sums / np.maximum(lens, 1), 4)
            out = pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_toks": pa.array(lens, pa.int64()),
                    "surprisal": pa.array(sup, pa.float64()),
                }
            )
            # zero-token (NULL-text) docs have no surprisal: the SQL
            # twin's token join and the unbounded fallback both omit
            # them — so must the broadcast path
            return out.filter(pa.array(lens > 0)) if (lens == 0).any() else out

        return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    # unbounded-vocabulary fallback: int-only join + per-doc reduce
    def occ(batch: pa.Table) -> pa.Table:
        lens, h = _flat_hashes(batch)
        ids = np.repeat(
            batch.column("doc_id").to_numpy(zero_copy_only=False), lens
        )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "h": pa.array(h, pa.int64())}
        )

    joined = bucketed_join(
        ds.map_batches(occ, batch_format="pyarrow", zero_copy_batch=True), freq, ["h"]
    )

    def add_lp(df: pd.DataFrame) -> pd.DataFrame:
        df["lp"] = np.log(df["n"].to_numpy(np.float64) / total)
        return df[["doc_id", "lp"]]

    per_doc = group_agg(
        joined.map_batches(add_lp, batch_format="pandas"),
        ["doc_id"],
        {"s": ("lp", "sum"), "n_toks": ("lp", "size")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_toks": df["n_toks"].astype(np.int64),
                "surprisal": np.round(-df["s"].to_numpy() / df["n_toks"].to_numpy(), 4),
            }
        )

    return per_doc.map_batches(finish, batch_format="pandas")


DOC_SURPRISAL_ORACLE = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), freq AS (
        SELECT term, count(*) AS n FROM tok GROUP BY term
    ), tot AS (
        SELECT CAST(count(*) AS DOUBLE) AS t FROM tok
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_toks,
           round(-avg(ln(freq.n / tot.t)), 4) AS surprisal
    FROM tok JOIN freq USING (term), tot
    GROUP BY doc_id
"""

# ------------------------------------ curriculum difficulty buckets

CURRICULUM_K = 10


def curriculum_buckets(sf_dir: str, k: int = CURRICULUM_K):
    """(doc_id, bucket): equal-size difficulty tiers for curriculum
    training — NTILE(k) over (surprisal ASC, doc_id) with SQL's exact
    tile rule (the first n%k tiles get one extra row), so easy
    template-like text lands in bucket 1 and the rarest-token docs in
    bucket k, reproducibly on any engine.

    Scale shape: surprisal scores stream from `doc_surprisal` (no token
    shuffle) into `analytics.global_row_number` (ONE id-only
    range-partition sort + O(blocks) prefix offsets); the tile formula
    is then a stateless per-row map of the rank — nothing else moves."""
    from .analytics import global_row_number

    ranked = global_row_number(
        doc_surprisal(sf_dir).select_columns(["doc_id", "surprisal"]),
        ["surprisal", "doc_id"],
        descending=[False, False],
        out_col="rk",
    )
    n = ranked.count()
    q, r0 = divmod(n, k)

    def tile(batch: pd.DataFrame) -> pd.DataFrame:
        r = batch["rk"].to_numpy(np.int64) - 1  # 0-based rank
        big = r0 * (q + 1)  # rows living in the (q+1)-sized tiles
        with np.errstate(divide="ignore"):
            bucket = np.where(
                r < big,
                r // max(q + 1, 1),
                r0 + (np.maximum(r - big, 0) // max(q, 1)),
            )
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(np.int64), "bucket": bucket + 1}
        )

    return ranked.map_batches(tile, batch_format="pandas")


CURRICULUM_BUCKETS_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), freq AS (
        SELECT term, count(*) AS n FROM tok GROUP BY term
    ), tot AS (
        SELECT CAST(count(*) AS DOUBLE) AS t FROM tok
    ), s AS (
        SELECT doc_id, round(-avg(ln(freq.n / tot.t)), 4) AS surprisal
        FROM tok JOIN freq USING (term), tot
        GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(ntile({CURRICULUM_K}) OVER (ORDER BY surprisal, doc_id) AS BIGINT)
               AS bucket
    FROM s
"""


# --------------------------- perplexity-weighted corpus resampling

SURPRISAL_SAMPLE_K = 50


def surprisal_weighted_sample(sf_dir: str, k: int = SURPRISAL_SAMPLE_K) -> pd.DataFrame:
    """CCNet-style perplexity-weighted corpus subsample: documents are
    drawn WITHOUT replacement with probability proportional to their
    unigram surprisal (rare/foreign-looking text oversampled, template
    text undersampled) via Efraimidis–Spirakis keys ln(u)/w, where u
    is the SQL-reproducible per-doc uniform of `stats.sampled_documents`
    and w the `doc_surprisal` score — the whole draw is reproducible by
    any engine, end to end through the model.

    Scale shape: composes two already-scale-safe stages — the
    surprisal pass (vocab broadcast, no token shuffle) feeds a
    stateless key computation + LOCAL mergeable top-k per batch, so
    the driver merges ≤ k·n_blocks id rows and nothing shuffles."""
    from .stats import SAMPLE_PRIME, sample_rank

    ds = doc_surprisal(sf_dir)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        h = sample_rank(ids)
        u = (h + 1.0) / (SAMPLE_PRIME + 1.0)  # in (0, 1]
        w = np.maximum(batch["surprisal"].to_numpy(np.float64), 1e-4)
        batch = batch.copy()
        batch["sample_key"] = np.round(np.log(u) / w, 10)
        batch = batch.sort_values(["sample_key", "doc_id"], ascending=[False, True])
        return batch.head(k)

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = cand.sort_values(["sample_key", "doc_id"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def _surprisal_sample_oracle() -> str:
    from .stats import SAMPLE_MOD, SAMPLE_MUL, SAMPLE_PRIME

    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), freq AS (
        SELECT term, count(*) AS n FROM tok GROUP BY term
    ), tot AS (
        SELECT CAST(count(*) AS DOUBLE) AS t FROM tok
    ), s AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_toks,
               round(-avg(ln(freq.n / tot.t)), 4) AS surprisal
        FROM tok JOIN freq USING (term), tot
        GROUP BY doc_id
    )
    SELECT doc_id, n_toks, surprisal,
           round(ln((((doc_id % {SAMPLE_MOD}) * {SAMPLE_MUL}) % {SAMPLE_PRIME} + 1.0)
                    / ({SAMPLE_PRIME} + 1.0))
                 / greatest(surprisal, 0.0001), 10) AS sample_key
    FROM s
    ORDER BY sample_key DESC, doc_id ASC LIMIT {SURPRISAL_SAMPLE_K}
    """


SURPRISAL_SAMPLE_ORACLE = _surprisal_sample_oracle()


DSIR_TARGET_LANG = "en"


def dsir_logratio(
    sf_dir: str,
    target_lang: str = DSIR_TARGET_LANG,
    broadcast_gate: int = SURPRISAL_BROADCAST_MAX,
):
    """(doc_id, n_toks, logratio): DSIR-style importance weight per
    document — the mean per-token log-ratio of an add-one-smoothed
    hashed-unigram model of the TARGET slice (docs with
    ``lang == target_lang``) over the same model of the RAW corpus
    (Data Selection via Importance Resampling; docs that look like the
    target domain score high and survive the resample).

    Scale shape (the doc_surprisal twin): ONE tokenize pass emits
    per-batch (hash, target_n, raw_n) partials, so the single count
    reduce moves a vocabulary-sized stream; the (hash → logratio)
    arrays broadcast below the gate and scoring fuses into the pass
    that re-tokenizes — no token row ever shuffles. Above the gate the
    int-only occurrence⋈vocab join + per-doc reduce takes over
    (equivalence-tested with the gate forced to 0). Hash-collision
    trade as doc_surprisal."""
    from .bytekernels import content_hash64
    from .shuffle import bucketed_join, group_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    _flat = _flat_token_hashes

    def freq_partial(batch: pa.Table) -> pd.DataFrame:
        lens, h = _flat(batch)
        is_t = np.repeat(
            batch.column("lang").to_numpy(zero_copy_only=False) == target_lang, lens
        )
        g = pd.DataFrame({"h": h, "nt": is_t.astype(np.int64)})
        out = g.groupby("h", sort=False).agg(nt=("nt", "sum"), nr=("nt", "size"))
        return out.reset_index()

    freq = group_agg(
        ds.map_batches(freq_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["h"],
        {"nt": ("nt", "sum"), "nr": ("nr", "sum")},
    ).materialize()
    n_vocab = freq.count()
    tot_t = float(freq.sum("nt"))
    tot_r = float(freq.sum("nr"))
    denom_t, denom_r = tot_t + n_vocab, tot_r + n_vocab

    def _lr(nt: np.ndarray, nr: np.ndarray) -> np.ndarray:
        return np.log((nt + 1.0) / denom_t) - np.log((nr + 1.0) / denom_r)

    if n_vocab <= broadcast_gate:
        parts = [
            (
                b.column("h").to_numpy(),
                b.column("nt").to_numpy(),
                b.column("nr").to_numpy(),
            )
            for b in freq.iter_batches(batch_format="pyarrow")
        ]
        hs = np.concatenate([p[0] for p in parts]) if parts else np.array([], np.int64)
        nt = np.concatenate([p[1] for p in parts]) if parts else np.array([], np.int64)
        nr = np.concatenate([p[2] for p in parts]) if parts else np.array([], np.int64)
        order = np.argsort(hs)
        ref = ray.put((hs[order], _lr(nt[order].astype(np.float64), nr[order].astype(np.float64))))

        def score(batch: pa.Table) -> pa.Table:
            lens, h = _flat(batch)
            vocab_h, vocab_lr = ray.get(ref)
            lr = vocab_lr[np.searchsorted(vocab_h, h)]  # every token is in-vocab
            starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
            sums = np.where(
                lens > 0, np.add.reduceat(lr, starts) if len(lr) else 0.0, 0.0
            )
            with np.errstate(invalid="ignore"):
                mean_lr = np.round(sums / np.maximum(lens, 1), 4)
            out = pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_toks": pa.array(lens, pa.int64()),
                    "logratio": pa.array(mean_lr, pa.float64()),
                }
            )
            # zero-token (NULL-text) docs: omitted, matching the token
            # join of the SQL twin and the unbounded fallback
            return out.filter(pa.array(lens > 0)) if (lens == 0).any() else out

        return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    # unbounded-vocabulary fallback: int-only join + per-doc reduce
    def occ(batch: pa.Table) -> pa.Table:
        lens, h = _flat(batch)
        ids = np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), lens)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "h": pa.array(h, pa.int64())}
        )

    joined = bucketed_join(
        ds.map_batches(occ, batch_format="pyarrow", zero_copy_batch=True), freq, ["h"]
    )

    def add_lr(df: pd.DataFrame) -> pd.DataFrame:
        df["lr"] = _lr(
            df["nt"].to_numpy(np.float64), df["nr"].to_numpy(np.float64)
        )
        return df[["doc_id", "lr"]]

    per_doc = group_agg(
        joined.map_batches(add_lr, batch_format="pandas"),
        ["doc_id"],
        {"s": ("lr", "sum"), "n_toks": ("lr", "size")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_toks": df["n_toks"].astype(np.int64),
                "logratio": np.round(df["s"].to_numpy() / df["n_toks"].to_numpy(), 4),
            }
        )

    return per_doc.map_batches(finish, batch_format="pandas")


DSIR_LOGRATIO_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), freq AS (
        SELECT term,
               count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS nt,
               count(*) AS nr
        FROM tok GROUP BY term
    ), c AS (
        SELECT CAST(count(*) AS DOUBLE) AS v,
               CAST(sum(nt) AS DOUBLE) AS tt,
               CAST(sum(nr) AS DOUBLE) AS tr
        FROM freq
    )
    SELECT tok.doc_id,
           CAST(count(*) AS BIGINT) AS n_toks,
           round(avg(ln((freq.nt + 1.0) / (c.tt + c.v))
                     - ln((freq.nr + 1.0) / (c.tr + c.v))), 4) AS logratio
    FROM tok JOIN freq USING (term), c
    GROUP BY tok.doc_id
"""


def doc_bigram_surprisal(
    sf_dir: str, broadcast_gate: int = SURPRISAL_BROADCAST_MAX
):
    """(doc_id, n_bigrams, surprisal): mean −ln p(w₂|w₁) per document
    under the corpus's own add-one-smoothed bigram model — the
    next-order CCNet-style perplexity filter (doc_surprisal is the
    unigram version): p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V) with c(w₁·)
    the count of w₁ in bigram-left position and V the unigram
    vocabulary size. Docs with <2 tokens have no bigrams and are
    omitted (both engines).

    Scale shape: ONE tokenize pass emits per-batch distinct
    (kind, hash, n) partials for all three model tables (bigram
    counts, left-unigram counts, unigram vocab), so the single count
    reduce moves a bigram-vocabulary-sized int stream. Below the gate
    the two (hash → count) arrays broadcast and scoring fuses into the
    re-tokenize pass; above it, (doc_id, h12, h1) occurrence rows take
    two bucketed int joins + a per-doc reduce (path-equivalence-tested
    with the gate forced to 0). Hash-collision trade as doc_surprisal."""
    from .bytekernels import content_hash64
    from .rng import _splitmix64
    from .shuffle import bucketed_join, group_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    PHI = np.uint64(0x9E3779B97F4A7C15)

    def _bigrams(batch: pa.Table):
        """per-doc bigram streams: (n_bigrams per doc, h1 flat, h12 flat)."""
        split, lens = split_tokens(batch.column("text"))
        h = content_hash64(pc.list_flatten(split)).view(np.uint64)
        n_bi = np.maximum(lens - 1, 0)
        if not n_bi.sum():
            e = np.array([], np.uint64)
            return n_bi, e, e, h
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        idx = np.repeat(starts, n_bi) + (
            np.arange(int(n_bi.sum())) - np.repeat(np.cumsum(n_bi) - n_bi, n_bi)
        )
        h1 = h[idx]
        h12 = _splitmix64(h1 * PHI ^ h[idx + 1])
        return n_bi, h1, h12, h

    K_LEFT, K_BI, K_UNI = 0, 1, 2

    def freq_partial(batch: pa.Table) -> pd.DataFrame:
        _, h1, h12, h = _bigrams(batch)
        out = []
        for kind, arr in ((K_LEFT, h1), (K_BI, h12), (K_UNI, h)):
            u, c = np.unique(arr, return_counts=True)
            out.append(
                pd.DataFrame(
                    {"kind": np.full(len(u), kind, np.int8),
                     "h": u.view(np.int64), "n": c.astype(np.int64)}
                )
            )
        return pd.concat(out, ignore_index=True)

    freq = group_agg(
        ds.map_batches(freq_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["kind", "h"],
        {"n": ("n", "sum")},
    ).materialize()

    def _split_kind(want: int):
        hs, ns = [], []
        for b in freq.iter_batches(batch_format="pyarrow"):
            k = b.column("kind").to_numpy(zero_copy_only=False)
            m = k == want
            hs.append(b.column("h").to_numpy(zero_copy_only=False)[m])
            ns.append(b.column("n").to_numpy(zero_copy_only=False)[m])
        h = np.concatenate(hs) if hs else np.array([], np.int64)
        n = np.concatenate(ns) if ns else np.array([], np.int64)
        order = np.argsort(h)
        return h[order], n[order]

    n_bigram_vocab = int(
        freq.map_batches(
            lambda b: pa.table(
                {"c": pa.array([int((b.column("kind").to_numpy(zero_copy_only=False) == K_BI).sum())], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("c")
    )

    if n_bigram_vocab <= broadcast_gate:
        bh, bn = _split_kind(K_BI)
        lh, ln_ = _split_kind(K_LEFT)
        uh, _un = _split_kind(K_UNI)
        V = float(len(uh))
        ref = ray.put((bh, bn.astype(np.float64), lh, ln_.astype(np.float64), V))

        def score(batch: pa.Table) -> pa.Table:
            bh_, bn_, lh_, ln2, V_ = ray.get(ref)
            n_bi, h1, h12, _ = _bigrams(batch)
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            keep = n_bi > 0
            if not keep.any():
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "n_bigrams": pa.array([], pa.int64()),
                     "surprisal": pa.array([], pa.float64())}
                )
            c12 = bn_[np.searchsorted(bh_, h12.view(np.int64))]
            c1 = ln2[np.searchsorted(lh_, h1.view(np.int64))]
            lp = np.log((c12 + 1.0) / (c1 + V_))
            cs = np.concatenate([[0.0], np.cumsum(lp)])
            ends = np.cumsum(n_bi)
            sums = cs[ends] - cs[ends - n_bi]
            sup = np.round(-sums[keep] / n_bi[keep], 4)
            return pa.table(
                {
                    "doc_id": pa.array(ids[keep], pa.int64()),
                    "n_bigrams": pa.array(n_bi[keep], pa.int64()),
                    "surprisal": pa.array(sup, pa.float64()),
                }
            )

        return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    # unbounded fallback: (doc_id, h12, h1) occurrence rows, two int
    # joins against the kind-sliced counts, one per-doc reduce
    uh, _un = _split_kind(K_UNI)
    V = float(len(uh))

    def kind_tbl(want: int):
        def f(b: pa.Table) -> pa.Table:
            k = b.column("kind").to_numpy(zero_copy_only=False)
            m = k == want
            return pa.table(
                {
                    "h": pa.array(b.column("h").to_numpy(zero_copy_only=False)[m]),
                    "n": pa.array(b.column("n").to_numpy(zero_copy_only=False)[m]),
                }
            )

        return freq.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    def occ(batch: pa.Table) -> pa.Table:
        n_bi, h1, h12, _ = _bigrams(batch)
        ids = np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), n_bi)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "h12": pa.array(h12.view(np.int64)),
                "h1": pa.array(h1.view(np.int64)),
            }
        )

    occ_ds = ds.map_batches(occ, batch_format="pyarrow", zero_copy_batch=True)
    j1 = bucketed_join(
        occ_ds,
        kind_tbl(K_BI).map_batches(
            lambda b: b.rename_columns(["h12", "c12"]), batch_format="pyarrow"
        ),
        ["h12"],
    )
    j2 = bucketed_join(
        j1,
        kind_tbl(K_LEFT).map_batches(
            lambda b: b.rename_columns(["h1", "c1"]), batch_format="pyarrow"
        ),
        ["h1"],
    )

    def add_lp(df: pd.DataFrame) -> pd.DataFrame:
        lp = np.log(
            (df["c12"].to_numpy(np.float64) + 1.0)
            / (df["c1"].to_numpy(np.float64) + V)
        )
        g = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "lp": lp})
        return g.groupby("doc_id", sort=False, as_index=False).agg(
            s=("lp", "sum"), n=("lp", "size")
        )

    per_doc = group_agg(
        j2.map_batches(add_lp, batch_format="pandas"),
        ["doc_id"],
        {"s": ("s", "sum"), "n_bigrams": ("n", "sum")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_bigrams": df["n_bigrams"].astype(np.int64),
                "surprisal": np.round(
                    -df["s"].to_numpy() / df["n_bigrams"].to_numpy(), 4
                ),
            }
        )

    return per_doc.map_batches(finish, batch_format="pandas")


DOC_BIGRAM_SURPRISAL_ORACLE = """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), p AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 1)) AS i FROM t)
    ), bc AS (
        SELECT w1, w2, count(*) AS c12 FROM p GROUP BY 1, 2
    ), lc AS (
        SELECT w1, count(*) AS c1 FROM p GROUP BY 1
    ), v AS (
        SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    )
    SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-avg(ln((bc.c12 + 1.0) / (lc.c1 + v.v))), 4) AS surprisal
    FROM p JOIN bc USING (w1, w2) JOIN lc USING (w1), v
    GROUP BY p.doc_id
"""


INDEX_MIN_DF = 10
INDEX_POSTINGS_CAP = 16


def inverted_index(
    sf_dir: str, min_df: int = INDEX_MIN_DF, cap: int = INDEX_POSTINGS_CAP
):
    """(term, df, postings): a capped inverted index over the corpus —
    term → document frequency + the first ``cap`` doc_ids (ascending,
    comma-joined), the retrieval/grep-index build of a corpus pipeline.

    Scale shape: a doc lives in one row, so its distinct terms are
    batch-local; each batch emits ONE combined row per distinct term it
    saw — (term, partial_df, ≤cap smallest doc_ids) — a per-batch
    COMBINER, so the single bucketed shuffle moves a vocabulary-sized
    stream (the tfidf df-emit shape) with at most ``cap`` ids riding
    each row, never the token stream. Head terms ("the") fan into one
    group with ≤ cap·n_blocks ids — bounded, and min-of-mins is
    mergeable so local-then-global capping equals the global cap. The
    ``min_df`` prune happens in the reduce where df is exact."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return inverted_index_ds(ds, min_df=min_df, cap=cap)


def inverted_index_ds(ds, min_df: int = INDEX_MIN_DF, cap: int = INDEX_POSTINGS_CAP):
    """The index kernel over any (doc_id, text) dataset (see
    :func:`inverted_index`)."""
    from .shuffle import bucketed_group_apply

    def partial(batch: pa.Table) -> pd.DataFrame:
        # int-hash lexsort dedup+cap (a pandas string sort over the
        # token stream lost ~2× to this); term strings only reappear
        # for the vocabulary-sized output rows. A same-batch 63-bit
        # hash collision would merge two terms' rows under one
        # representative string — ~vocab²/2⁶³, the decontam.py trade.
        from .bytekernels import content_hash64

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        split, lens = split_tokens(batch.column("text"))
        flat = pc.list_flatten(split)
        h = content_hash64(flat)
        docids = np.repeat(ids, lens)
        if not len(h):
            return pd.DataFrame(
                {"term": pd.Series([], dtype=object),
                 "pdf": pd.Series([], dtype=np.int64),
                 "postings": pd.Series([], dtype=object)}
            )
        order = np.lexsort((docids, h))
        hs, ds_ = h[order], docids[order]
        keep = np.ones(len(hs), dtype=bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        hs, ds_, oidx = hs[keep], ds_[keep], order[keep]
        new = np.ones(len(hs), dtype=bool)
        new[1:] = hs[1:] != hs[:-1]
        starts = np.nonzero(new)[0]
        seg_id = np.cumsum(new) - 1
        pdf = np.diff(np.append(starts, len(hs)))
        rank = np.arange(len(hs)) - starts[seg_id]
        capm = rank < cap
        terms = flat.take(pa.array(oidx[starts])).to_pandas().to_numpy()
        cds = ds_[capm].astype("U")
        cseg = seg_id[capm]
        bounds = np.searchsorted(cseg, np.arange(len(starts) + 1))
        postings = [
            ",".join(cds[bounds[i] : bounds[i + 1]]) for i in range(len(starts))
        ]
        return pd.DataFrame(
            {"term": terms, "pdf": pdf.astype(np.int64), "postings": postings}
        )

    rows = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("term", sort=False).agg(
            df=("pdf", "sum"), postings=("postings", ",".join)
        )
        agg = agg[agg["df"] >= min_df]
        merged = [
            ",".join(map(str, np.sort(np.array(p.split(","), dtype=np.int64))[:cap]))
            for p in agg["postings"]
        ]
        return pd.DataFrame(
            {
                "term": agg.index.to_numpy(),
                "df": agg["df"].to_numpy().astype(np.int64),
                "postings": merged,
            }
        )

    return bucketed_group_apply(rows, ["term"], finish)


INVERTED_INDEX_ORACLE = f"""
    WITH tok0 AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tok AS (
        SELECT DISTINCT doc_id, term FROM tok0
    ), df AS (
        SELECT term, count(*) AS df FROM tok GROUP BY term
        HAVING count(*) >= {INDEX_MIN_DF}
    ), r AS (
        SELECT tok.term, tok.doc_id,
               row_number() OVER (PARTITION BY tok.term ORDER BY tok.doc_id) AS rk
        FROM tok JOIN df USING (term)
    )
    SELECT df.term, CAST(df.df AS BIGINT) AS df,
           string_agg(CAST(r.doc_id AS VARCHAR), ',' ORDER BY r.doc_id) AS postings
    FROM r JOIN df USING (term)
    WHERE r.rk <= {INDEX_POSTINGS_CAP}
    GROUP BY df.term, df.df
"""


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20
BM25_QUERY_TERMS = 2


def bm25_topk(sf_dir: str, n_query_terms: int = BM25_QUERY_TERMS, k_top: int = BM25_TOP):
    """Okapi BM25 retrieval: score every document against a
    deterministic query (the ``n_query_terms`` highest-df terms, ties
    by term asc — data-derived so both engines build the same query)
    and return the ``k_top`` best (score desc, doc_id asc). The
    ranking stage of a retrieval/RAG pipeline over the corpus.

    Scale shape: pass 1 tokenizes once and emits per-batch distinct
    (term, partial-df) rows → one vocabulary-sized reduce; the query
    terms + their df, N and the corpus average doc length broadcast as
    scalars. Pass 2 re-tokenizes, computes per-doc tf of the query
    terms + doc length locally, scores, and keeps its LOCAL top-k
    (mergeable), so the driver merges ≤ k·n_blocks rows."""
    from .shuffle import group_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        split, lens = split_tokens(batch.column("text"))
        terms = pc.list_flatten(split).to_pandas()
        occ = pd.DataFrame(
            {"doc_id": np.repeat(ids, lens), "term": terms}
        ).drop_duplicates()
        out = occ.groupby("term", sort=False).size().rename("df").reset_index()
        out["dl"] = 0  # filler; total length rides the is_len=1 row
        out["is_len"] = 0
        # corpus length rides the SAME reduce but in its own key
        # namespace (is_len=1): a corpus token can never collide with
        # it (ADVICE r3 — the former '\x00len' sentinel shared the
        # term keyspace)
        tot = pd.DataFrame({"term": [""], "df": [0], "dl": [int(lens.sum())], "is_len": [1]})
        return pd.concat([out, tot], ignore_index=True)

    red = group_agg(
        ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["term", "is_len"],
        {"df": ("df", "sum"), "dl": ("dl", "sum")},
    )

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["df", "term"], ascending=[False, True])
        return pd.concat(
            [df[df["is_len"] == 0].head(n_query_terms), df[df["is_len"] == 1]],
            ignore_index=True,
        ).drop_duplicates()

    cand = red.map_batches(local_top, batch_format="pandas").to_pandas()
    total_len = float(cand.loc[cand["is_len"] == 1, "dl"].sum())
    cand = cand[cand["is_len"] == 0].sort_values(
        ["df", "term"], ascending=[False, True]
    )
    qterms = cand["term"].to_numpy()[:n_query_terms]
    qdf = cand["df"].to_numpy()[:n_query_terms].astype(np.float64)
    avgdl = total_len / max(1, n_docs)
    idf = np.log((n_docs - qdf + 0.5) / (qdf + 0.5) + 1.0)
    ref = ray.put((qterms, idf, avgdl))

    def score(batch: pa.Table) -> pd.DataFrame:
        qt, idf_, adl = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        split, lens = split_tokens(batch.column("text"))
        flat = pc.list_flatten(split)
        doc_idx = np.repeat(np.arange(len(ids)), lens)
        s = np.zeros(len(ids), dtype=np.float64)
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * lens / adl)
        for ti, t in enumerate(qt):
            hit = pc.equal(flat, str(t)).to_numpy(zero_copy_only=False)
            tf = np.bincount(doc_idx[hit], minlength=len(ids)).astype(np.float64)
            s += np.where(
                tf > 0, idf_[ti] * tf * (BM25_K1 + 1.0) / (tf + norm), 0.0
            )
        s = np.round(s, 4)
        order = np.lexsort((ids, -s))[:k_top]
        order = order[s[order] > 0]
        return pd.DataFrame({"doc_id": ids[order], "score": s[order]})

    cand2 = ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # ≤ k_top × n_blocks rows
    out = cand2.sort_values(["score", "doc_id"], ascending=[False, True]).head(k_top)
    return out.reset_index(drop=True)


BM25_TOPK_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), len AS (
        SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY 1
    ), a AS (
        SELECT avg(dl) AS adl FROM len
    ), nn AS (
        SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
    ), df AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tok GROUP BY 1
    ), q AS (
        SELECT term, df FROM df
        ORDER BY df DESC, term ASC LIMIT {BM25_QUERY_TERMS}
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        FROM tok JOIN q USING (term) GROUP BY 1, 2
    ), s AS (
        SELECT tf.doc_id,
               sum(ln((nn.n - q.df + 0.5) / (q.df + 0.5) + 1.0)
                   * tf.tf * ({BM25_K1} + 1.0)
                   / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * len.dl / a.adl))) AS score
        FROM tf JOIN q USING (term) JOIN len USING (doc_id), a, nn
        GROUP BY 1
    )
    SELECT doc_id, round(score, 4) AS score FROM s
    WHERE round(score, 4) > 0
    ORDER BY round(score, 4) DESC, doc_id ASC LIMIT {BM25_TOP}
"""


TFIDF_QUERIES = {
    "tfidf_top_terms": tfidf_top_terms,
    "bigram_counts": bigram_counts,
    "doc_surprisal": doc_surprisal,
    "surprisal_weighted_sample": surprisal_weighted_sample,
    "curriculum_buckets": curriculum_buckets,
    "inverted_index": inverted_index,
    "dsir_logratio": dsir_logratio,
    "doc_bigram_surprisal": doc_bigram_surprisal,
    "bm25_topk": bm25_topk,
}
TFIDF_ORACLES = {
    "dsir_logratio": DSIR_LOGRATIO_ORACLE,
    "doc_bigram_surprisal": DOC_BIGRAM_SURPRISAL_ORACLE,
    "bm25_topk": BM25_TOPK_ORACLE,
    "tfidf_top_terms": TFIDF_TOP_TERMS_ORACLE,
    "bigram_counts": BIGRAM_COUNTS_ORACLE,
    "doc_surprisal": DOC_SURPRISAL_ORACLE,
    "surprisal_weighted_sample": SURPRISAL_SAMPLE_ORACLE,
    "curriculum_buckets": CURRICULUM_BUCKETS_ORACLE,
    "inverted_index": INVERTED_INDEX_ORACLE,
}
