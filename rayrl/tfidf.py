"""TF-IDF top terms per document — the keyword-extraction /
relevance-weighting stage of a text corpus pipeline, built to the
minimum-shuffle plan:

- **tf needs no shuffle at all**: a document lives in one row, so the
  per-(doc, term) counts fall out of each batch locally.
- **df pre-aggregates before its shuffle**: each batch emits one
  (term, partial_df) row per distinct term it saw, so the term-keyed
  reduce moves a vocabulary-sized stream, not a token-sized one.
- tf⋈df is a bucketed hash join on term (ints + terms only), and the
  top-k cut regroups by doc_id — two narrow shuffles end to end;
  the text column never leaves the read stage.

Single-space tokenization matches the token_counts / SQL-oracle
semantics (the oracle is the window-function formulation)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TOP_K = 3


def _tf_rows(sf_dir: str):
    """(doc_id, term, tf) without a shuffle: explode + count per batch."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tf(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc.split_pattern(batch.column("text").combine_chunks(), " ")
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        terms = pc.list_flatten(split).to_pandas()
        df = pd.DataFrame({"doc_id": np.repeat(ids, lens), "term": terms})
        out = df.groupby(["doc_id", "term"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "tf"})

    return ds.map_batches(tf, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_top_terms(sf_dir: str, k: int = TOP_K):
    """Top-k terms per doc by tf·ln(N/df), ties broken by term asc."""
    from .shuffle import bucketed_group_apply, bucketed_join, group_agg

    tf = _tf_rows(sf_dir).materialize()  # (doc_id, term, tf) ints+terms, reused twice
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()

    # df: one partial row per (batch, term) going in, so the term
    # reduce is vocabulary-sized
    def partial_df(batch: pa.Table) -> pd.DataFrame:
        t = batch.column("term").to_pandas()
        out = t.value_counts(sort=False).rename_axis("term").reset_index(name="df")
        return out

    df_tbl = group_agg(
        tf.map_batches(partial_df, batch_format="pyarrow", zero_copy_batch=True),
        ["term"],
        {"df": ("df", "sum")},
        num_buckets=32,
    )

    joined = bucketed_join(tf, df_tbl, ["term"], num_buckets=32)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["_w"] = g["tf"].to_numpy() * np.log(n_docs / g["df"].to_numpy())
        g = g.sort_values(["doc_id", "_w", "term"], ascending=[True, False, True])
        g = g.groupby("doc_id", sort=False).head(k)
        g["tfidf"] = g["_w"].round(6)
        return g[["doc_id", "term", "tf", "df", "tfidf"]]

    return bucketed_group_apply(joined, ["doc_id"], topk, num_buckets=32)


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


TFIDF_QUERIES = {"tfidf_top_terms": tfidf_top_terms}
TFIDF_ORACLES = {"tfidf_top_terms": TFIDF_TOP_TERMS_ORACLE}
