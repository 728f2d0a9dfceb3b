"""Statistical aggregates the reference lacks but a corpus-scale
pipeline needs (SURVEY §2.4 gap list): two-column moment aggregates
(correlation / covariance) as a native mergeable Ray Data
``AggregateFn``, a multi-grain ROLLUP computed in ONE shuffle by
emitting every grain from the per-batch partial, and a deterministic
multiplicative-hash row sample whose gate is pure BIGINT arithmetic so
DuckDB reproduces it bit-for-bit (the cross-system determinism check
``rng.py`` gives us engine-side).

All three are oracle-backed (`stats_*` entries in __ray_entry__).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .bytekernels import split_tokens
from ray.data.aggregate import AggregateFn

# ------------------------------------------------- corr / covar agg

def corr_covar_agg(xcol: str, ycol: str) -> AggregateFn:
    """Pearson correlation + sample covariance of two numeric columns
    as one mergeable aggregate. State is six float64 moments
    (n, Σx, Σy, Σx², Σy², Σxy): blocks accumulate vectorized, states
    merge by addition, finalize does the algebra — the textbook
    mergeable-moment shape (48 bytes per block cross the wire, like
    the HLL sibling in sketches.py)."""

    def init(_key):
        return np.zeros(6, dtype=np.float64)

    def accumulate_block(state, block):
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        x = tbl.column(xcol).to_numpy(zero_copy_only=False).astype(np.float64)
        y = tbl.column(ycol).to_numpy(zero_copy_only=False).astype(np.float64)
        return state + np.array(
            [len(x), x.sum(), y.sum(), (x * x).sum(), (y * y).sum(), (x * y).sum()]
        )

    def merge(a, b):
        return a + b

    def finalize(s):
        n, sx, sy, sxx, syy, sxy = s
        if n < 2:
            return {"corr": float("nan"), "covar_samp": float("nan"), "n": int(n)}
        cov = (sxy - sx * sy / n) / (n - 1)
        vx = (sxx - sx * sx / n) / (n - 1)
        vy = (syy - sy * sy / n) / (n - 1)
        corr = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else float("nan")
        return {"corr": float(corr), "covar_samp": float(cov), "n": int(n)}

    return AggregateFn(
        init=init,
        merge=merge,
        name="corr_covar",
        accumulate_block=accumulate_block,
        finalize=finalize,
    )


def price_qty_corr(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag correlation / covariance between quantity and
    extended price. Bounded key cardinality (3), so the native grouped
    aggregate is the right shape (the bucketed helpers in shuffle.py
    are for unbounded keys, CLAUDE.md rule 1)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    rows = ds.groupby("l_returnflag").aggregate(
        corr_covar_agg("l_quantity", "l_extendedprice")
    ).take_all()  # ≤ |returnflag| = 3 rows
    out = pd.DataFrame(
        {
            "l_returnflag": [r["l_returnflag"] for r in rows],
            "corr_qty_price": [round(r["corr_covar"]["corr"], 6) for r in rows],
            "covar_qty_price": [round(r["corr_covar"]["covar_samp"], 3) for r in rows],
            "n": [int(r["corr_covar"]["n"]) for r in rows],
        }
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


PRICE_QTY_CORR_ORACLE = """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 3) AS covar_qty_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------- rollup

def revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus) over orders in
    ONE shuffle: the per-batch partial emits all three grains
    ((a,b), (a,ALL), (ALL,ALL)) as ordinary keyed rows, so a single
    bucketed reduce finishes every grain — no per-grain re-scan, no
    second aggregation pass, and the 3× key-row inflation is ints +
    short strings only (never payload; CLAUDE.md rule 2).

    NULL keys are sentinel-encoded to 'NULL' before grouping (the
    shuffle.py null-key contract; ADVICE r3): pandas groupby(dropna)
    would silently drop null-key rows from EVERY grain including the
    grand total. The oracle mirrors it with GROUPING()-disambiguated
    coalesce. Assumed (documented) collision bound: no data value
    equals the literal 'ALL'/'NULL' sentinels."""
    from .shuffle import group_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df.fillna({"o_orderpriority": "NULL", "o_orderstatus": "NULL"})
        g = (
            df.groupby(["o_orderpriority", "o_orderstatus"], sort=False, as_index=False)
            .agg(revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))
        )
        mid = g.assign(o_orderstatus="ALL")
        top = g.assign(o_orderpriority="ALL", o_orderstatus="ALL")
        return pd.concat([g, mid, top], ignore_index=True)

    red = group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderpriority", "o_orderstatus"],
        {"revenue": ("revenue", "sum"), "n_orders": ("n_orders", "sum")},
        num_buckets=16,
    ).to_pandas()  # ≤ |priority|×|status| + |priority| + 1 rows
    red["revenue"] = red["revenue"].round(2)
    red["n_orders"] = red["n_orders"].astype("int64")
    red = red.rename(columns={"o_orderpriority": "priority", "o_orderstatus": "status"})
    return red[["priority", "status", "revenue", "n_orders"]]


REVENUE_ROLLUP_ORACLE = """
    SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE coalesce(o_orderpriority, 'NULL') END AS priority,
           CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                ELSE coalesce(o_orderstatus, 'NULL') END AS status,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def revenue_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(o_orderpriority, o_orderstatus): all FOUR grains
    — (a,b), (a,ALL), (ALL,b), (ALL,ALL) — emitted by the per-batch
    partial, so one bucketed reduce finishes the whole lattice (the
    rollup's single-shuffle shape with one more grain row; key rows
    only, never payload). NULL keys sentinel-encode to 'NULL' before
    grouping (see revenue_rollup)."""
    from .shuffle import group_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df.fillna({"o_orderpriority": "NULL", "o_orderstatus": "NULL"})
        g = (
            df.groupby(["o_orderpriority", "o_orderstatus"], sort=False, as_index=False)
            .agg(revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))
        )
        by_pri = g.assign(o_orderstatus="ALL")
        by_sta = g.assign(o_orderpriority="ALL")
        top = g.assign(o_orderpriority="ALL", o_orderstatus="ALL")
        return pd.concat([g, by_pri, by_sta, top], ignore_index=True)

    red = group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderpriority", "o_orderstatus"],
        {"revenue": ("revenue", "sum"), "n_orders": ("n_orders", "sum")},
        num_buckets=16,
    ).to_pandas()
    red["revenue"] = red["revenue"].round(2)
    red["n_orders"] = red["n_orders"].astype("int64")
    red = red.rename(columns={"o_orderpriority": "priority", "o_orderstatus": "status"})
    return red[["priority", "status", "revenue", "n_orders"]]


REVENUE_CUBE_ORACLE = """
    SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE coalesce(o_orderpriority, 'NULL') END AS priority,
           CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                ELSE coalesce(o_orderstatus, 'NULL') END AS status,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


# ------------------------------------------- deterministic sample

SAMPLE_MOD = 2147483647  # 2^31-1: keeps the product < 2^63 for any int64 id
SAMPLE_MUL = 2654435761  # Knuth multiplicative constant
SAMPLE_PRIME = 1000000007


def sample_rank(ids: np.ndarray) -> np.ndarray:
    """The engine's ONE multiplicative-hash rank: (id mod 2^31-1) · K
    mod p, BIGINT-safe (product < 2^63), bit-identical in numpy int64
    and ANSI SQL — the single definition every sampling / shuffle /
    mixing op derives from (r5 review: the formula was hand-copied at
    8+ sites; one drifted constant silently breaks the cross-engine
    reproducibility contract)."""
    return (np.asarray(ids).astype(np.int64) % SAMPLE_MOD) * SAMPLE_MUL % SAMPLE_PRIME


def hash_sample_mask(ids: np.ndarray, pct: int) -> np.ndarray:
    """Deterministic keep-mask over integer ids: pure BIGINT-safe
    arithmetic ((id mod 2^31-1) · K mod p mod 100 < pct), identical in
    numpy int64 and ANSI-SQL BIGINT — so the sample an engine takes is
    reproducible by any other engine, which is what makes sampled
    pipelines auditable."""
    return sample_rank(ids) % 100 < pct


def sampled_documents(sf_dir: str, pct: int = 10) -> ray.data.Dataset:
    """~pct% deterministic document sample (doc_id-keyed multiplicative
    hash): the corpus-subsetting primitive for eval splits and pilot
    runs. Text column is pruned at the read — the sample gate needs
    only ids + cheap metadata."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"]
    )

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(hash_sample_mask(ids, pct)))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


SAMPLED_DOCUMENTS_ORACLE = f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE ((doc_id % {SAMPLE_MOD}) * {SAMPLE_MUL}) % {SAMPLE_PRIME} % 100 < 10
"""


# --------------------------------- deterministic train/val/test split

SPLIT_TRAIN_PCT = 96  # h < 96 → train
SPLIT_VAL_PCT = 98  # 96 ≤ h < 98 → val; the rest → test


def corpus_splits(sf_dir: str):
    """Deterministic train/val/test corpus split (96/2/2 on the same
    BIGINT-safe multiplicative doc_id hash as `sampled_documents`, so
    any engine reproduces the assignment) with a per-split audit row:
    doc count, char volume, distinct languages. ONE read pass emits
    per-batch (split, lang)-keyed partials (≤ 3·|langs| rows per
    batch), one narrow shuffle reduces them, and the finish runs on
    the reduced table — bounded by 3·|langs| rows at any corpus
    scale."""
    from .shuffle import group_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    labels = np.array(["train", "val", "test"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = sample_rank(ids) % 100
        split = labels[(h >= SPLIT_TRAIN_PCT).astype(np.int8) + (h >= SPLIT_VAL_PCT)]
        df = pd.DataFrame(
            {
                "split": split,
                "lang": batch.column("lang").to_pandas(),
                "chars": batch.column("n_chars").to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby(["split", "lang"], sort=False, as_index=False).agg(
            n=("chars", "size"), chars=("chars", "sum")
        )

    pairs = group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["split", "lang"],
        {"n": ("n", "sum"), "chars": ("chars", "sum")},
    ).to_pandas()  # ≤ 3·|langs| rows — bounded, driver-safe
    out = pairs.groupby("split", sort=False, as_index=False).agg(
        n_docs=("n", "sum"), total_chars=("chars", "sum"), n_langs=("lang", "size")
    )
    return out


CORPUS_SPLITS_ORACLE = f"""
    WITH s AS (
        SELECT CASE WHEN h < {SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN h < {SPLIT_VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split,
               lang, n_chars
        FROM (
            SELECT ((doc_id % {SAMPLE_MOD}) * {SAMPLE_MUL})
                       % {SAMPLE_PRIME} % 100 AS h,
                   lang, n_chars
            FROM documents
        )
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM s GROUP BY split
"""


# ------------------------------ duplicate-aware (leakage-safe) split

# re-keyed duplicate block for the leakage fixture: every 5th doc is
# appended again under doc_id + SHIFT (disjoint from real ids, and
# (id + SHIFT) % SAMPLE_MOD stays BIGINT-safe)
LEAK_DUP_SHIFT = 1_000_000
LEAK_DUP_MOD = 5


def leakage_safe_splits(sf_dir: str):
    """(doc_id, split): train/val/test assignment where every copy of a
    duplicated text lands in the SAME split — the test-set leakage
    guard `corpus_splits` lacks (a doc whose exact copy sits in train
    silently inflates eval). The split verdict hangs off the text
    GROUP, not the row: group by content, take the group's min doc_id
    as representative, derive the split from the representative with
    the same BIGINT-safe multiplicative hash as `corpus_splits`, and
    join the verdict back to every member — duplicates inherit one
    verdict, unique docs keep the uniform 96/2/2 marginal. The corpus
    under test is documents ∪ a re-keyed copy of every 5th doc (the
    driver table has no exact duplicates at small sf — the fixture
    union makes the co-location property REAL in the oracle check,
    not vacuous).

    Scale shape: texts hash to 64-bit fingerprints in the read pass
    (C-speed crc pair over the zero-copy Arrow byte view) and NEVER
    shuffle; per-batch (fp, min id) partials feed one distinct-text-
    sized bucketed min reduce; verdicts ride ONE int-only bucketed
    join back to the (doc_id, fp) stream. Oracle parity: the SQL twin
    groups by the text VALUE while the engine groups by crc64(text) —
    identical partitions up to hash collisions (CLAUDE.md rule 17,
    P ≤ C(n_distinct,2)·2⁻⁶⁴)."""
    from .bytekernels import content_hash64_nullsafe
    from .shuffle import bucketed_join, group_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fp_rows(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = content_hash64_nullsafe(batch.column("text"))
        dup = ids % LEAK_DUP_MOD == 0
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([ids, ids[dup] + LEAK_DUP_SHIFT]),
                "fp": np.concatenate([h, h[dup]]),
            }
        )

    fps = ds.map_batches(
        fp_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # int-only, consumed twice (reduce + probe join)

    # per-batch combiner before the shuffle: one (fp, min id) partial
    # per distinct fp per batch
    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("fp", sort=False, as_index=False).agg(rep=("doc_id", "min"))

    reps = group_agg(
        fps.map_batches(partial_min, batch_format="pandas"),
        ["fp"],
        {"rep": ("rep", "min")},
    )

    labels = np.array(["train", "val", "test"])

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        rep = df["rep"].to_numpy(np.int64)
        h = sample_rank(rep) % 100
        split = labels[(h >= SPLIT_TRAIN_PCT).astype(np.int8) + (h >= SPLIT_VAL_PCT)]
        return pd.DataFrame({"fp": df["fp"].to_numpy(np.int64), "split": split})

    verdicts = reps.map_batches(verdict, batch_format="pandas")
    return bucketed_join(fps, verdicts, ["fp"]).map_batches(
        lambda df: df[["doc_id", "split"]], batch_format="pandas"
    )


LEAKAGE_SAFE_SPLITS_ORACLE = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {LEAK_DUP_SHIFT}, text FROM documents
        WHERE doc_id % {LEAK_DUP_MOD} = 0
    ),
    lab AS (
        SELECT text,
               CASE WHEN h < {SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN h < {SPLIT_VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT text, ((rep % {SAMPLE_MOD}) * {SAMPLE_MUL})
                             % {SAMPLE_PRIME} % 100 AS h
            FROM (SELECT text, min(doc_id) AS rep FROM corpus GROUP BY text)
        )
    )
    SELECT c.doc_id, l.split
    FROM corpus c JOIN lab l ON c.text IS NOT DISTINCT FROM l.text
"""


# ------------------------------------ cross-source duplication matrix

def source_dup_matrix(sf_dir: str):
    """(source_a, source_b, n_dup_pairs): how many exact-duplicate doc
    PAIRS each source pair shares — the standard input for
    source-mixing and dedup-policy decisions (a source whose content is
    mostly mirrored elsewhere should be down-weighted or dropped before
    training). Within-source rows (a == b) count C(c, 2) internal dup
    pairs; cross rows count c_a·c_b. The corpus under test is
    documents ∪ a 'mirror' source re-keying every 5th doc (and every
    10th doc TWICE, so the within-source branch is exercised) — the
    driver table has no exact duplicates at small sf.

    Scale shape: texts hash to 64-bit fingerprints in the read pass and
    never shuffle; (fp, source) count partials ride ONE bucketed
    shuffle (distinct (text, source)-sized); the per-fp pairing is an
    in-bucket self-merge whose group width is bounded by the number of
    SOURCES (small by construction), and the output is the ≤ S²-row
    matrix. Oracle parity: engine groups by crc64(text), the SQL twin
    by the text value (CLAUDE.md rule 17; collision bound
    C(n_distinct,2)·2⁻⁶⁴)."""
    from .bytekernels import content_hash64_nullsafe
    from .shuffle import bucketed_group_apply, group_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def fp_rows(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch.column("source").to_pandas().to_numpy()
        h = content_hash64_nullsafe(batch.column("text"))
        m5 = ids % LEAK_DUP_MOD == 0
        m10 = ids % (2 * LEAK_DUP_MOD) == 0
        return pd.DataFrame(
            {
                "fp": np.concatenate([h, h[m5], h[m10]]),
                "source": np.concatenate(
                    [src, np.repeat("mirror", m5.sum()), np.repeat("mirror", m10.sum())]
                ),
            }
        )

    counts = group_agg(
        ds.map_batches(fp_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["fp", "source"],
        {"c": ("source", "size")},
    )

    def pair_up(df: pd.DataFrame) -> pd.DataFrame:
        # per-fp cross products; group width ≤ #sources, so the
        # self-merge is bounded per fp
        m = df.merge(df, on="fp", suffixes=("_a", "_b"))
        m = m[m["source_a"] <= m["source_b"]]
        same = m["source_a"] == m["source_b"]
        ca, cb = m["c_a"].to_numpy(np.int64), m["c_b"].to_numpy(np.int64)
        n = np.where(same, ca * (ca - 1) // 2, ca * cb)
        out = pd.DataFrame(
            {"source_a": m["source_a"], "source_b": m["source_b"], "n": n}
        )
        out = out[out["n"] > 0]
        return out.groupby(["source_a", "source_b"], sort=False, as_index=False).agg(
            n=("n", "sum")
        )

    matrix = group_agg(
        bucketed_group_apply(counts, ["fp"], pair_up, num_buckets=64),
        ["source_a", "source_b"],
        {"n_dup_pairs": ("n", "sum")},
    )
    return matrix


SOURCE_DUP_MATRIX_ORACLE = f"""
    WITH corpus AS (
        SELECT source, text FROM documents
        UNION ALL
        SELECT 'mirror', text FROM documents WHERE doc_id % {LEAK_DUP_MOD} = 0
        UNION ALL
        SELECT 'mirror', text FROM documents WHERE doc_id % {2 * LEAK_DUP_MOD} = 0
    ),
    g AS (SELECT text, source, count(*) AS c FROM corpus GROUP BY text, source)
    SELECT source_a, source_b, CAST(sum(n) AS BIGINT) AS n_dup_pairs
    FROM (
        SELECT a.source AS source_a, b.source AS source_b,
               CASE WHEN a.source = b.source THEN a.c * (a.c - 1) / 2
                    ELSE a.c * b.c END AS n
        FROM g a JOIN g b ON a.text IS NOT DISTINCT FROM b.text AND a.source <= b.source
    )
    WHERE n > 0
    GROUP BY source_a, source_b
"""


# --------------------------------------- deterministic global shuffle

def shuffled_documents(sf_dir: str):
    """(doc_id, shuffle_pos): a deterministic GLOBAL shuffle of the
    corpus — the training-export ordering primitive (an LLM epoch
    needs the whole corpus in a fixed pseudo-random order, and a
    resumed export must reproduce positions exactly). Position =
    row_number over (multiplicative hash of doc_id, doc_id), the same
    SQL-reproducible hash as `sampled_documents`, so any engine can
    verify or regenerate the permutation.

    Scale shape: ids only ride the ONE range-partition sort any global
    ordering inherently needs (text stays at rest until an export join
    hydrates it shard-by-shard); the rank attach is the O(blocks)
    prefix-sum pattern of `analytics.global_row_number` — no driver
    data rows. Hash collisions are fine: the doc_id tie-break makes
    the order total and identical on both sides."""
    from .analytics import global_row_number

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = sample_rank(ids)
        return batch.append_column("shuffle_key", pa.array(h, pa.int64()))

    keyed = ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
    ranked = global_row_number(
        keyed, ["shuffle_key", "doc_id"], descending=[False, False],
        out_col="shuffle_pos",
    )
    return ranked.select_columns(["doc_id", "shuffle_pos"])


SHUFFLED_DOCUMENTS_ORACLE = f"""
    SELECT doc_id,
           CAST(row_number() OVER (
                ORDER BY ((doc_id % {SAMPLE_MOD}) * {SAMPLE_MUL}) % {SAMPLE_PRIME},
                         doc_id) AS BIGINT) AS shuffle_pos
    FROM documents
"""


# ------------------------------------------- per-source document cap

CAP_K = 10


def source_capped_documents(sf_dir: str, k: int = CAP_K):
    """Per-domain document cap (the Common-Crawl "at most k docs per
    host" subsetting rule): keep the k docs per source with the
    smallest deterministic hash rank — a fair per-domain sample that
    any engine can reproduce (rank = the `hash_sample_mask`
    multiplicative hash, ties broken by doc_id).

    Scale shape: a hot domain with billions of docs must not funnel
    through one shuffle group, so a per-batch COMBINER keeps only the
    local top-k per source first (≤ k·|sources-in-block| rows leave
    each block, ids only), and the bucketed per-source finish ranks
    the survivors exactly — top-k is mergeable, so local-then-global
    equals global (equivalence-tested against a pandas global ranking
    across block layouts in test_newops)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return cap_per_group(ds, k)


def cap_per_group(ds, k: int = CAP_K):
    """The cap kernel over any (doc_id, source) dataset (see
    source_capped_documents)."""
    from .shuffle import bucketed_group_apply

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        df = df.assign(hrank=sample_rank(ids))
        df = df.sort_values(["source", "hrank", "doc_id"], kind="mergesort")
        return df[df.groupby("source", sort=False).cumcount() < k]

    partial = ds.map_batches(local_topk, batch_format="pandas")

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "hrank", "doc_id"], kind="mergesort")
        rank = df.groupby("source", sort=False).cumcount()
        out = df[rank < k][["doc_id", "source"]].copy()
        out["rk"] = (rank[rank < k] + 1).astype(np.int64)
        return out

    return bucketed_group_apply(partial, ["source"], final_topk)


SOURCE_CAP_ORACLE = f"""
    WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY ((doc_id % {SAMPLE_MOD}) * {SAMPLE_MUL}) % {SAMPLE_PRIME},
                            doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= {CAP_K}
"""


MIX_BUDGET = 200
MIX_FRACS = {"en": 0.50, "de": 0.20, "fr": 0.15, "es": 0.10, "zh": 0.05}


def mixed_corpus(
    sf_dir: str, budget: int = MIX_BUDGET, fracs: "dict[str, float] | None" = None
) -> "ray.data.Dataset":
    """Data-mixing: draw a fixed-budget corpus whose language
    composition matches target fractions (the "50% English, 20%
    German, …" training-mix stage), each language's share chosen by
    the deterministic multiplicative-hash rank (ties by doc_id) so any
    engine reproduces the mix exactly.

    Scale shape: `cap_per_group`'s combiner with per-group quotas — a
    per-batch local top-k per language bounds what leaves each block
    (ids only), and the bucketed per-language finish ranks survivors
    exactly (top-k is mergeable)."""
    from .shuffle import bucketed_group_apply

    fracs = MIX_FRACS if fracs is None else fracs
    quotas = {lang: int(round(f * budget)) for lang, f in fracs.items()}
    kmax = max(quotas.values())
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def _ranked(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        df = df.assign(hrank=sample_rank(ids))
        return df.sort_values(["lang", "hrank", "doc_id"], kind="mergesort")

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = _ranked(df)
        return df[df.groupby("lang", sort=False).cumcount() < kmax]

    partial = ds.map_batches(local_topk, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = _ranked(df)
        rank = df.groupby("lang", sort=False).cumcount()
        quota = df["lang"].map(quotas).fillna(0).to_numpy()
        keep = rank.to_numpy() < quota
        out = df[keep][["doc_id", "lang"]].copy()
        out["rk"] = (rank[keep] + 1).astype(np.int64)
        return out

    return bucketed_group_apply(partial, ["lang"], finish)


def _mix_oracle() -> str:
    values = ", ".join(
        f"('{lang}', {int(round(f * MIX_BUDGET))})" for lang, f in MIX_FRACS.items()
    )
    return f"""
    WITH q(lang, quota) AS (VALUES {values}),
    r AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ((doc_id % {SAMPLE_MOD}) * {SAMPLE_MUL}) % {SAMPLE_PRIME},
                            doc_id) AS rk
        FROM documents
    )
    SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk
    FROM r JOIN q USING (lang) WHERE r.rk <= q.quota
    """


MIXED_CORPUS_ORACLE = _mix_oracle()


# ------------------------------------------- token-budget data mixing

TOKEN_QUOTAS = {"en": 30_000, "de": 12_000, "fr": 9_000, "es": 6_000, "zh": 3_000}


def token_budget_mix(
    sf_dir: str, quotas: "dict[str, int] | None" = None
) -> "ray.data.Dataset":
    """Token-budget data mixing — the realistic training-mix unit:
    each language gets an absolute TOKEN budget (n_chars as the
    deterministic token proxy the oracle shares) and docs are taken in
    multiplicative-hash-rank order while the budget lasts, INCLUDING
    the doc that crosses it (standard take-until-exhausted). Differs
    from `mixed_corpus` (doc-count quotas): corpus mixes are specified
    in tokens, and doc length varies 100×.

    Scale shape: the prefix-sum cut is not top-k, but it prunes the
    same way — a doc kept globally has global cum_before < quota, and
    the batch-local prefix (same rank order restricted to the batch, a
    subset) is ≤ the global one, so the per-batch combiner keeps docs
    with LOCAL cum_before < quota: a safe superset bounded by
    quota/min_doc_len rows per language per block (ids + lengths only
    leave the block). The bucketed per-language finish computes the
    exact global prefix over survivors. Combiner-vs-global equivalence
    is layout-tested in test_newops."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return token_budget_mix_ds(ds, quotas)


def token_budget_mix_ds(ds, quotas: "dict[str, int] | None" = None):
    """The budget-cut kernel over any (doc_id, lang, n_chars) dataset
    (see token_budget_mix)."""
    from .shuffle import bucketed_group_apply

    quotas = TOKEN_QUOTAS if quotas is None else quotas

    def _ranked(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        df = df.assign(hrank=sample_rank(ids))
        return df.sort_values(["lang", "hrank", "doc_id"], kind="mergesort")

    def local_prefix(df: pd.DataFrame) -> pd.DataFrame:
        df = _ranked(df)
        n = df["n_chars"].to_numpy().astype(np.int64)
        cum = df.assign(n=n).groupby("lang", sort=False)["n"].cumsum().to_numpy()
        quota = df["lang"].map(quotas).fillna(0).to_numpy()
        return df[(cum - n) < quota]

    partial = ds.map_batches(local_prefix, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = _ranked(df)
        n = df["n_chars"].to_numpy().astype(np.int64)
        cum = df.assign(n=n).groupby("lang", sort=False)["n"].cumsum().to_numpy()
        quota = df["lang"].map(quotas).fillna(0).to_numpy()
        keep = (cum - n) < quota
        out = df[keep][["doc_id", "lang"]].copy()
        out["cum_chars"] = cum[keep].astype(np.int64)
        return out

    return bucketed_group_apply(partial, ["lang"], finish)


def _token_mix_oracle() -> str:
    values = ", ".join(f"('{lang}', {q})" for lang, q in TOKEN_QUOTAS.items())
    return f"""
    WITH q(lang, quota) AS (VALUES {values}),
    r AS (
        SELECT doc_id, lang, n_chars,
               ((doc_id % {SAMPLE_MOD}) * {SAMPLE_MUL}) % {SAMPLE_PRIME} AS hrank
        FROM documents
    ), c AS (
        SELECT doc_id, lang, n_chars,
               SUM(n_chars) OVER (
                   PARTITION BY lang ORDER BY hrank, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM r
    )
    SELECT c.doc_id, c.lang, CAST(c.cum AS BIGINT) AS cum_chars
    FROM c JOIN q USING (lang) WHERE c.cum - c.n_chars < q.quota
    """


TOKEN_BUDGET_MIX_ORACLE = _token_mix_oracle()


# ----------------------------------------- per-language top-k terms

LANG_TOP_K = 20


def lang_top_terms(sf_dir: str, k: int = LANG_TOP_K) -> pd.DataFrame:
    """Per-language top-k terms by corpus frequency (rank ties → term
    ASC): the per-slice vocabulary report a multilingual corpus QA
    dashboard starts from (grouped heavy hitters, exact).

    Scale shape: one tokenize pass emits per-batch (lang, term, n)
    partials (Arrow split kernel + np.repeat of the lang column — no
    Python per token), the single reduce moves a langs×vocabulary
    stream (Heaps-sublinear, CLAUDE.md rule 12); top-k per language is
    mergeable AFTER the counts are global, so a per-batch local top-k
    over the reduced stream leaves ≤ k·|langs| rows per block for the
    driver merge."""
    from .shuffle import group_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        split, lens = split_tokens(batch.column("text"))
        terms = pc.list_flatten(split).to_pandas()
        langs = np.repeat(batch.column("lang").to_numpy(zero_copy_only=False), lens)
        df = pd.DataFrame({"lang": langs, "term": terms})
        g = df.groupby(["lang", "term"], sort=False, as_index=False).size()
        return g.rename(columns={"size": "n"})

    counts = group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "term"],
        {"n": ("n", "sum")},
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "n", "term"], ascending=[True, False, True])
        return df.groupby("lang", sort=False, as_index=False).head(k)

    cand = counts.map_batches(local_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["lang", "n", "term"], ascending=[True, False, True])
    out = cand.groupby("lang", sort=False, as_index=False).head(k).copy()
    out["rk"] = out.groupby("lang").cumcount().to_numpy() + 1
    out["n"] = out["n"].astype(np.int64)
    return out[["lang", "rk", "term", "n"]].reset_index(drop=True)


LANG_TOP_TERMS_ORACLE = f"""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ), c AS (
        SELECT lang, term, count(*) AS n FROM tok GROUP BY 1, 2
    ), r AS (
        SELECT lang, term, n,
               row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rk
        FROM c
    )
    SELECT lang, CAST(rk AS BIGINT) AS rk, term, CAST(n AS BIGINT) AS n
    FROM r WHERE rk <= {LANG_TOP_K}
"""


# ------------------------------------------- data-quality validation

_QR_COLUMNS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]
_QR_NUMERIC = {"o_orderkey", "o_custkey", "o_totalprice"}


def table_quality_report(sf_dir: str):
    """Per-column data-validation report over the orders table (the
    Deequ / expectations shape a pipeline runs before trusting an
    ingest): for every column its row count, null count, and — for
    numeric columns — min/max. One long-format row per column, so the
    report is a fixed tiny table whatever the input width.

    Scale shape: ONE streaming pass; each batch emits one ≤|columns|-row
    partial (counts + local extrema), the reduce is a columns-sized
    group_agg — data rows never shuffle and the driver never sees
    them. Adding a new check = adding a column to the partial."""
    from .shuffle import group_agg

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=_QR_COLUMNS)

    def partial(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for c in _QR_COLUMNS:
            col = batch.column(c)
            n = len(col)
            nulls = col.null_count
            if c in _QR_NUMERIC and n - nulls > 0:
                mn = float(pc.min(col).as_py())
                mx = float(pc.max(col).as_py())
            else:
                mn = mx = np.nan
            rows.append((c, n, nulls, mn, mx))
        return pd.DataFrame(
            rows, columns=["col_name", "n_rows", "n_null", "min_val", "max_val"]
        )

    return group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["col_name"],
        {
            "n_rows": ("n_rows", "sum"),
            "n_null": ("n_null", "sum"),
            "min_val": ("min_val", "min"),
            "max_val": ("max_val", "max"),
        },
    )


def _quality_report_oracle() -> str:
    parts = []
    for c in _QR_COLUMNS:
        if c in _QR_NUMERIC:
            mn, mx = f"CAST(min({c}) AS DOUBLE)", f"CAST(max({c}) AS DOUBLE)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
            f"{mn} AS min_val, {mx} AS max_val FROM orders"
        )
    return " UNION ALL ".join(parts)


QUALITY_REPORT_ORACLE = _quality_report_oracle()


ES_SAMPLE_K = 50


def weighted_sampled_documents(sf_dir: str, k: int = ES_SAMPLE_K) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    each doc gets key = ln(u)/w with u a deterministic per-doc uniform
    and w = n_chars; the k largest keys are a weight-proportional
    sample — the length-weighted corpus subset an LLM data mix uses.
    u comes from the same BIGINT-safe multiplicative hash as
    `sampled_documents`, so ANY engine reproduces the exact sample
    (the auditability property, extended from uniform to weighted).

    Scale shape: stateless key computation per batch + LOCAL top-k
    (mergeable) — the driver merges ≤ k·n_blocks candidate rows; no
    shuffle at all."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"]
    )

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ids = df["doc_id"].to_numpy().astype(np.int64)
        h = sample_rank(ids)
        u = (h + 1.0) / (SAMPLE_PRIME + 1.0)  # in (0, 1]
        w = df["n_chars"].to_numpy().astype(np.float64)
        df["sample_key"] = np.round(np.log(u) / np.maximum(w, 1.0), 10)
        df = df.sort_values(["sample_key", "doc_id"], ascending=[False, True])
        return df.head(k)

    cand = ds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # ≤ k × n_blocks rows
    out = cand.sort_values(["sample_key", "doc_id"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


WEIGHTED_SAMPLE_ORACLE = f"""
    SELECT doc_id, lang, source, n_chars,
           round(ln((((doc_id % {SAMPLE_MOD}) * {SAMPLE_MUL}) % {SAMPLE_PRIME} + 1.0)
                    / ({SAMPLE_PRIME} + 1.0))
                 / greatest(n_chars, 1), 10) AS sample_key
    FROM documents
    ORDER BY sample_key DESC, doc_id ASC LIMIT {ES_SAMPLE_K}
"""


# -------------------------------------- distribution divergence (QA)

def host_stats_ds(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-host crawl statistics over a (url, text, lang) pages table:
    page count, total extracted-text bytes, distinct languages — the
    "what did we crawl from each domain" QA table that feeds per-host
    capping and domain blocklists.

    Scale shape: the host is parsed from the url with ONE Arrow
    split kernel (no Python per row); each batch emits host-keyed
    partials — (host, n, chars) sums plus DISTINCT (host, lang) pairs
    — so both reduces move host-vocabulary-sized streams, and the
    final host⋈host join is between two already-tiny tables."""
    from .shuffle import bucketed_join, group_agg

    def partial(batch: pa.Table) -> pd.DataFrame:
        host = pc.list_element(
            pc.split_pattern(batch.column("url").combine_chunks(), "/"), 2
        ).to_pandas()
        chars = pc.utf8_length(batch.column("text").combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        df = pd.DataFrame({"host": host, "chars": chars.astype(np.int64)})
        return df.groupby("host", sort=False, as_index=False).agg(
            n=("chars", "size"), chars=("chars", "sum")
        )

    def lang_partial(batch: pa.Table) -> pd.DataFrame:
        host = pc.list_element(
            pc.split_pattern(batch.column("url").combine_chunks(), "/"), 2
        ).to_pandas()
        df = pd.DataFrame({"host": host, "lang": batch.column("lang").to_pandas()})
        return df.drop_duplicates()

    sums = group_agg(
        pages.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
        {"n_pages": ("n", "sum"), "total_chars": ("chars", "sum")},
    )
    lang_pairs = group_agg(
        pages.map_batches(lang_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["host", "lang"],
        {"c": ("lang", "size")},  # ≥1 per distinct pair after the batch dedup
    )

    # lang_pairs rows are globally DISTINCT (host, lang), so a
    # host-keyed size IS the distinct-language count (a plain
    # map_batches count here could split a host's rows at batch
    # boundaries — CLAUDE.md rule 13)
    langs = group_agg(lang_pairs, ["host"], {"n_langs": ("c", "size")})
    return bucketed_join(sums, langs, ["host"])


def source_lang_divergence(sf_dir: str):
    """Per-source KL divergence of the language distribution vs the
    whole corpus — the data-QA op that flags domains whose language
    mix drifts from the corpus (crawl contamination, mislabeled
    feeds). Counts reduce per (source, lang) in one bucketed shuffle;
    the global lang vector (bounded: |langs|) broadcasts; the
    per-source KL is a vectorized kernel inside a second bucketed
    pass — sources never collect to the driver."""
    from .shuffle import bucketed_group_apply, group_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.groupby(["source", "lang"], sort=False, as_index=False).agg(
            n=("lang", "size")
        )

    counts = group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "lang"],
        {"n": ("n", "sum")},
        num_buckets=16,
    ).materialize()  # narrow (source, lang, n) rows, scanned twice

    glob = group_agg(counts, ["lang"], {"n": ("n", "sum")}, num_buckets=4).to_pandas()
    n_total = float(glob["n"].sum())
    q_map = {l: float(n) / n_total for l, n in zip(glob["lang"], glob["n"])}
    ref = ray.put(q_map)

    def kl(df: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(ref)
        ns = df.groupby("source", sort=False)["n"].transform("sum").to_numpy(dtype=np.float64)
        p = df["n"].to_numpy(dtype=np.float64) / ns
        qv = df["lang"].map(q).to_numpy(dtype=np.float64)
        term = p * np.log(p / qv)
        out = pd.DataFrame({"source": df["source"], "term": term, "n": df["n"]})
        res = out.groupby("source", sort=False, as_index=False).agg(
            kl_lang=("term", "sum"), n_docs=("n", "sum")
        )
        res["kl_lang"] = np.round(res["kl_lang"], 6)
        res["n_docs"] = res["n_docs"].astype("int64")
        return res

    return bucketed_group_apply(counts, ["source"], kl)


SOURCE_LANG_DIVERGENCE_ORACLE = """
    WITH c AS (
        SELECT source, lang, CAST(count(*) AS DOUBLE) AS n
        FROM documents GROUP BY 1, 2
    ), s AS (
        SELECT source, sum(n) AS ns FROM c GROUP BY 1
    ), t AS (
        SELECT lang, sum(n) AS ng, sum(sum(n)) OVER () AS nt FROM c GROUP BY 1
    )
    SELECT c.source,
           round(sum((c.n / s.ns) * ln((c.n / s.ns) / (t.ng / t.nt))), 6) AS kl_lang,
           CAST(sum(c.n) AS BIGINT) AS n_docs
    FROM c JOIN s ON c.source = s.source JOIN t ON c.lang = t.lang
    GROUP BY c.source
"""


# -------------------------------------- per-source vocabulary stats


def _distinct_source_terms(sf_dir: str):
    """DISTINCT (source, term) stream: per-batch dedup first (docs are
    whole in the read batch), then one bucketed global distinct — the
    shuffle moves a vocabulary×sources-sized stream, not tokens."""
    from .shuffle import distinct_rows

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def emit(batch: pa.Table) -> pd.DataFrame:
        split, lens = split_tokens(batch.column("text"))
        src = batch.column("source").to_pandas().to_numpy()
        df = pd.DataFrame(
            {"source": np.repeat(src, lens), "term": pc.list_flatten(split).to_pandas()}
        )
        return df.drop_duplicates()

    return distinct_rows(
        ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "term"],
    )


def source_vocab_stats(sf_dir: str) -> pd.DataFrame:
    """(source, n_tokens, n_distinct, ttr): corpus vocabulary richness
    per source (type–token ratio — the data-QA signal for template-
    generated / low-diversity sources). Token totals reduce as one
    int partial per (batch, source); distinct counts ride the shared
    distinct-(source, term) stream. Result is |sources| rows."""
    from .shuffle import group_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def totals(batch: pa.Table) -> pd.DataFrame:
        split, lens = split_tokens(batch.column("text"))
        df = pd.DataFrame({"source": batch.column("source").to_pandas(), "n": lens})
        return df.groupby("source", sort=False, as_index=False)["n"].sum()

    tot = group_agg(
        ds.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        {"n_tokens": ("n", "sum")},
        num_buckets=8,
    ).to_pandas()  # ≤ |sources| rows

    def dcount(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", sort=False, as_index=False).size()

    dis = (
        group_agg(
            _distinct_source_terms(sf_dir).map_batches(dcount, batch_format="pandas"),
            ["source"],
            {"n_distinct": ("size", "sum")},
            num_buckets=8,
        ).to_pandas()  # ≤ |sources| rows
    )
    out = tot.merge(dis, on="source")
    out["ttr"] = (out["n_distinct"] / out["n_tokens"]).round(6)
    return out


SOURCE_VOCAB_STATS_ORACLE = """
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT term) AS BIGINT) AS n_distinct,
           round(count(DISTINCT term) / CAST(count(*) AS DOUBLE), 6) AS ttr
    FROM tok GROUP BY source
"""


def source_vocab_jaccard(sf_dir: str) -> pd.DataFrame:
    """(src_a, src_b, jaccard): vocabulary overlap between every source
    pair — the cross-source contamination/diversity QA matrix. Per
    TERM the source set is bounded (≤ |sources|), so pair emission is
    a batch-local self-merge inside the term-bucketed shuffle; only
    (src_a, src_b, partial count) int rows reduce. Per-source vocab
    sizes are the |sources|-row frame from the same distinct stream."""
    from .shuffle import bucketed_group_apply, group_agg

    v = _distinct_source_terms(sf_dir).materialize()  # scanned twice

    def sizes(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", sort=False, as_index=False).size()

    nsz = group_agg(
        v.map_batches(sizes, batch_format="pandas"),
        ["source"],
        {"n": ("size", "sum")},
        num_buckets=8,
    ).to_pandas()  # ≤ |sources| rows
    size_of = dict(zip(nsz["source"], nsz["n"]))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="term")
        m = m[m["source_x"] < m["source_y"]]
        out = m.groupby(["source_x", "source_y"], sort=False, as_index=False).size()
        return out.rename(columns={"source_x": "src_a", "source_y": "src_b", "size": "i"})

    inter_ds = group_agg(
        bucketed_group_apply(v, ["term"], pair_partial),
        ["src_a", "src_b"],
        {"i": ("i", "sum")},
        num_buckets=8,
    )
    # zero-draw guard (CLAUDE.md rule 21): a single-source corpus has
    # no pairs at all — every pair_partial is empty, the reduce comes
    # back SCHEMALESS, and the column access below would KeyError
    if inter_ds.schema() is None or inter_ds.count() == 0:
        return pd.DataFrame(
            {
                "src_a": pd.Series([], dtype=object),
                "src_b": pd.Series([], dtype=object),
                "jaccard": pd.Series([], dtype=np.float64),
            }
        )
    inter = inter_ds.to_pandas()  # ≤ C(|sources|, 2) rows
    na = inter["src_a"].map(size_of).to_numpy(dtype=np.float64)
    nb = inter["src_b"].map(size_of).to_numpy(dtype=np.float64)
    i = inter["i"].to_numpy(dtype=np.float64)
    inter["jaccard"] = np.round(i / (na + nb - i), 6)
    return inter.drop(columns="i")


SOURCE_VOCAB_JACCARD_ORACLE = """
    WITH v AS (
        SELECT DISTINCT source, term FROM (
            SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
        )
    ), sizes AS (
        SELECT source, count(*) AS n FROM v GROUP BY source
    ), inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS i
        FROM v a JOIN v b ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           round(i / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
"""


STATS_QUERIES = {
    "source_vocab_stats": source_vocab_stats,
    "source_vocab_jaccard": source_vocab_jaccard,
    "price_qty_corr": price_qty_corr,
    "revenue_rollup": revenue_rollup,
    "revenue_cube": revenue_cube,
    "sampled_documents": sampled_documents,
    "shuffled_documents": shuffled_documents,
    "corpus_splits": corpus_splits,
    "leakage_safe_splits": leakage_safe_splits,
    "source_dup_matrix": source_dup_matrix,
    "table_quality_report": table_quality_report,
    "lang_top_terms": lang_top_terms,
    "weighted_sampled_documents": weighted_sampled_documents,
    "mixed_corpus": mixed_corpus,
    "token_budget_mix": token_budget_mix,
    "source_capped_documents": source_capped_documents,
    "source_lang_divergence": source_lang_divergence,
}
STATS_ORACLES = {
    "source_vocab_stats": SOURCE_VOCAB_STATS_ORACLE,
    "source_vocab_jaccard": SOURCE_VOCAB_JACCARD_ORACLE,
    "source_lang_divergence": SOURCE_LANG_DIVERGENCE_ORACLE,
    "price_qty_corr": PRICE_QTY_CORR_ORACLE,
    "revenue_rollup": REVENUE_ROLLUP_ORACLE,
    "revenue_cube": REVENUE_CUBE_ORACLE,
    "sampled_documents": SAMPLED_DOCUMENTS_ORACLE,
    "shuffled_documents": SHUFFLED_DOCUMENTS_ORACLE,
    "corpus_splits": CORPUS_SPLITS_ORACLE,
    "leakage_safe_splits": LEAKAGE_SAFE_SPLITS_ORACLE,
    "source_dup_matrix": SOURCE_DUP_MATRIX_ORACLE,
    "table_quality_report": QUALITY_REPORT_ORACLE,
    "lang_top_terms": LANG_TOP_TERMS_ORACLE,
    "weighted_sampled_documents": WEIGHTED_SAMPLE_ORACLE,
    "mixed_corpus": MIXED_CORPUS_ORACLE,
    "token_budget_mix": TOKEN_BUDGET_MIX_ORACLE,
    "source_capped_documents": SOURCE_CAP_ORACLE,
}
