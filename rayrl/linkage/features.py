"""Pair-level feature products — the reference's two ML deliverables,
re-expressed for the pages schema:

- **Labeled pair set with hard negatives** (``generate_pairs``,
  /root/reference/benchmarking/utils.R:502-645): truth matches minus
  exact duplicates, plus the top 4×|matches| hardest non-match
  candidates by a cheap-similarity threshold score.
- **23-wide feature vectors** (``add_feature_vector``,
  utils.R:189-311; ``summarise_all_string_metrics``, utils.R:180-187):
  per-pair dl / jw / soundex string metrics, date decomposition +
  swap indicators, z-scaled token frequencies, and categorical combo
  indicators — 23 ``metric_*`` columns + a ``match`` label.

Schema mapping (voter fields → Common-Crawl pages, per SURVEY.md §2.3):
fname/lname → major/last token of ``text``; dob → ``warc_ts`` date;
gender → ``lang``; race → url host; voter_reg_num (truth) →
``record_id``.

Scale shape: the only wide operations are the linkage blocker's
banded shuffle (reused as-is), bucketed hash joins to hydrate pair
fields (rayrl.shuffle.bucketed_join — each side rides a shuffle once),
and a sort+limit for the hard-negative top-k. Token frequency tables
are vocabulary-bounded → broadcast small side (ray.put), as the
reference's add_count_name is a whole-table count."""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .. import rng
from ..shuffle import bucketed_join, group_agg
from .blocking import LinkageConfig, band_rows_from_payload, node_payload
from .scoring import candidate_pairs
from .stringsim import damerau_levenshtein, jaro_winkler, levenshtein_banded, soundex


# ------------------------------------------------------ token helpers

def extract_major_token(texts) -> list[str]:
    """First token if ≥ 3 chars, else the longest token (ties → first)
    — utils.R:17-30. The reference samples among tied longest tokens;
    we take the first for the repo's any-parallelism determinism rule
    (SURVEY.md §7.5)."""
    out = []
    for t in texts:
        if not t:
            out.append("")
            continue
        toks = t.split(" ")
        if len(toks[0]) >= 3:
            out.append(toks[0])
        else:
            out.append(max(toks, key=len))
    return out


def _host_of(url: str) -> str:
    try:
        return url.split("//", 1)[1].split("/", 1)[0]
    except IndexError:
        return url


# ------------------------------------------------------- pair fields

def pair_fields(ds, side: int):
    """Per-record comparison fields: (node, truth, fname, lname,
    date_s, year, month, day, age_days, lang, host). One pass over the
    texts; node = row_uid*2+side (the linkage node id)."""

    def build(batch: pa.Table) -> pa.Table:
        uids = batch.column("row_uid").to_numpy()
        texts = batch.column("text").to_pylist()
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").cast(pa.timestamp("us")).to_pandas()
        fnames = extract_major_token(texts)
        lnames = [t.split(" ")[-1] if t else "" for t in texts]
        snapshot = pd.Timestamp("2017-01-01") if side == 0 else pd.Timestamp("2017-06-30")
        # NaT-safe date features (r5 review: a make_missing spec on
        # warc_ts — the reference's dob-missing analogue — made
        # strftime raise ArrowTypeError and year/age cast NaN to
        # INT64_MIN). Sentinels: '' / -1 / -10^6, none of which a real
        # 20xx capture can produce; two missing dates compare equal to
        # each other (deterministic, documented) rather than R's NA.
        valid = ts.notna()
        age_days = (snapshot - ts).dt.days
        return pa.table(
            {
                "node": pa.array(uids * 2 + side, pa.int64()),
                "truth": batch.column("record_id"),
                "fname": pa.array(fnames, pa.string()),
                "lname": pa.array(lnames, pa.string()),
                "date_s": pa.array(
                    ts.dt.strftime("%Y-%m-%d").where(valid, "").tolist(), pa.string()
                ),
                "year": pa.array(
                    ts.dt.year.where(valid, -1).astype(np.int64), pa.int64()
                ),
                "month": pa.array(
                    ts.dt.month.where(valid, -1).astype(np.int64), pa.int64()
                ),
                "day": pa.array(ts.dt.day.where(valid, -1).astype(np.int64), pa.int64()),
                "age_days": pa.array(
                    age_days.where(valid, -(10**6)).astype(np.int64), pa.int64()
                ),
                "lang": batch.column("lang"),
                "host": pa.array([_host_of(u) for u in urls], pa.string()),
            }
        )

    return ds.select_columns(["row_uid", "record_id", "url", "warc_ts", "text", "lang"]).map_batches(
        build, batch_format="pyarrow", zero_copy_batch=True
    )


def token_freq_z(fields_ds, col: str) -> dict[str, float]:
    """z-scaled per-token frequency map for ``col`` — add_count_name +
    scale() (utils.R:407-424, 192-213). The grouped count is a bounded-
    cardinality aggregate (token vocabulary); the z-score statistics
    are row-weighted exactly like R's scale() over the record-level
    count column: each token contributes its count n_t for each of its
    n_t rows."""
    freq = group_agg(fields_ds.select_columns([col]), [col], {"n": (col, "size")}).to_pandas()
    n = freq["n"].to_numpy().astype(np.float64)
    total = n.sum()
    if total <= 1:
        return {t: 0.0 for t in freq[col]}
    mean = (n * n).sum() / total
    var = (n * (n - mean) ** 2).sum() / (total - 1)
    sd = np.sqrt(var) if var > 0 else 1.0
    z = (n - mean) / sd
    return dict(zip(freq[col], z))


def attach_freq_z(fields_ds, side_tag: str):
    """Attach ffreq/lfreq z-scores via broadcast lookup (the small-side
    join rule: the token→z map is vocabulary-bounded)."""
    fmap = ray.put(token_freq_z(fields_ds, "fname"))
    lmap = ray.put(token_freq_z(fields_ds, "lname"))

    def add(batch: pd.DataFrame) -> pd.DataFrame:
        fm, lm = ray.get(fmap), ray.get(lmap)
        batch = batch.copy()
        batch["ffreq_z"] = batch["fname"].map(fm).fillna(0.0).round(6)
        batch["lfreq_z"] = batch["lname"].map(lm).fillna(0.0).round(6)
        return batch

    return fields_ds.map_batches(add, batch_format="pandas")


def major_tokens(sf_dir: str):
    """Oracle-checked extract_major_token + z-scaled frequency over the
    documents table (utils.R:17-30 + add_count_name/scale,
    utils.R:407-424): (doc_id, major_token, tok_freq, tok_freq_z)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def extract(batch: pa.Table) -> pa.Table:
        toks = extract_major_token(batch.column("text").to_pylist())
        return pa.table({"doc_id": batch["doc_id"], "major_token": pa.array(toks, pa.string())})

    toks_ds = ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
    freq = group_agg(toks_ds.select_columns(["major_token"]), ["major_token"],
                     {"n": ("major_token", "size")}).to_pandas()
    n = freq["n"].to_numpy().astype(np.float64)
    total = n.sum()
    mean = (n * n).sum() / total
    var = (n * (n - mean) ** 2).sum() / (total - 1) if total > 1 else 1.0
    sd = np.sqrt(var) if var > 0 else 1.0
    fmap = ray.put(dict(zip(freq["major_token"], zip(n.astype(np.int64), np.round((n - mean) / sd, 6)))))

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(fmap)
        pairs = batch["major_token"].map(m)
        batch = batch.copy()
        batch["tok_freq"] = pairs.map(lambda p: p[0]).astype("int64")
        batch["tok_freq_z"] = pairs.map(lambda p: p[1])
        return batch

    return toks_ds.map_batches(attach, batch_format="pandas")


MAJOR_TOKENS_ORACLE = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         m AS (SELECT doc_id,
                      CASE WHEN length(ts[1]) >= 3 THEN ts[1]
                           ELSE list_filter(ts, x -> length(x) =
                                list_aggregate(list_transform(ts, y -> length(y)), 'max'))[1]
                      END AS major_token
               FROM t),
         f AS (SELECT m.*, count(*) OVER (PARTITION BY major_token) AS tok_freq FROM m),
         s AS (SELECT avg(tok_freq) AS mu, stddev_samp(tok_freq) AS sd FROM f)
    SELECT doc_id, major_token, CAST(tok_freq AS BIGINT) AS tok_freq,
           round((tok_freq - s.mu) / s.sd, 6) AS tok_freq_z
    FROM f, s
"""


# ------------------------------------------------- labeled pair set

def _keyed(fields_ds, suffix: str):
    """Rename a pair-fields table for one join side."""
    cols = ["node", "truth", "fname", "lname", "date_s", "year", "month", "day",
            "age_days", "lang", "host", "ffreq_z", "lfreq_z"]
    renamed = [f"node_{suffix}"] + [f"{c}_{suffix}" for c in cols[1:]]

    def ren(t: pa.Table) -> pa.Table:
        return t.select(cols).rename_columns(renamed)

    return fields_ds.map_batches(ren, batch_format="pyarrow")


def hydrate_pairs(pairs_ds, fields_a, fields_b, num_buckets: int = 64):
    """(node_a, node_b, ...) + two pair-fields tables → fully hydrated
    pair rows via two bucketed hash joins."""
    h = bucketed_join(pairs_ds, _keyed(fields_a, "a"), ["node_a"], num_buckets)
    return bucketed_join(h, _keyed(fields_b, "b"), ["node_b"], num_buckets)


def _cheap_features(batch: pd.DataFrame) -> pd.DataFrame:
    """The candidate-block similarity features of utils.R:594-617:
    jw(fname), lv(lname), d/m/y equality + day↔month swap, then the
    threshold criteria + weight."""
    out = batch.copy()
    fj = np.fromiter(
        (1.0 - jaro_winkler(a or "", b or "") for a, b in zip(batch["fname_a"], batch["fname_b"])),
        dtype=np.float64, count=len(batch),
    )
    # banded fast path, exact on clamp: the reference's lname metric is
    # the RAW lv distance (utils.R:596/614) — clamping at k+1=5 made
    # thresh_weight's (1 - lv) term read -4 for any ≥5-edit pair (r5
    # review). Distances ≤ 4 (nearly every candidate pair) stay on the
    # O(n·k) band; only clamped ones pay the full O(nm) recompute.
    def _lv_exact(a: str, b: str) -> int:
        d = levenshtein_banded(a, b, 4)
        if d <= 4:
            return d
        return levenshtein_banded(a, b, max(len(a), len(b)))

    lj = np.fromiter(
        (_lv_exact(a or "", b or "") for a, b in zip(batch["lname_a"], batch["lname_b"])),
        dtype=np.float64, count=len(batch),
    )
    day_match = (batch["day_a"] == batch["day_b"]).to_numpy()
    month_match = (batch["month_a"] == batch["month_b"]).to_numpy()
    year_match = (batch["year_a"] == batch["year_b"]).to_numpy()
    swap_match = (
        (batch["day_a"] == batch["month_b"]) & (batch["day_b"] == batch["month_a"])
    ).to_numpy()
    date_votes = (
        day_match.astype(int) + month_match.astype(int) + swap_match.astype(int) + year_match.astype(int)
    )
    out["fname_jw"] = np.round(fj, 6)
    out["lname_lv"] = lj
    out["thresh_criteria"] = (
        (fj < 0.15).astype(int) + (lj < 0.15).astype(int) + (date_votes >= 2).astype(int)
    )
    out["thresh_weight"] = np.round((1.0 - fj) + (1.0 - lj) + date_votes / 3.0, 6)
    return out


_EQ_BLOCK_KEYS = ("fname", "lname", "date_s")


def _equality_band_rows(fields_ds, cfg: LinkageConfig):
    """Single-key equality block rows over the pair fields — the
    reference's six equality self-joins (utils.R:548-592) expressed as
    band rows consumable by ``candidate_pairs`` (one block family per
    key; pathological blocks are skip-capped there like any block)."""

    def emit(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").to_numpy()
        n = len(nodes)
        keys, out_nodes = [], []
        for fam, col in enumerate(_EQ_BLOCK_KEYS):
            vals = batch.column(col).to_pylist()
            h = np.fromiter(
                (zlib.crc32(f"{fam}|{v}".encode()) for v in vals), dtype=np.uint64, count=n
            )
            mixed = rng._splitmix64(h ^ np.uint64(0xEB1F_55AA + fam))
            keys.append((mixed >> np.uint64(1)).astype(np.int64))
            out_nodes.append(nodes)
        block_key = np.concatenate(keys)
        node = np.concatenate(out_nodes)
        # no bucket column: the shuffle derives its own (r5 review)
        return pa.table(
            {
                "block_key": pa.array(block_key, pa.int64()),
                "node": pa.array(node, pa.int64()),
                "side": pa.array((node & 1).astype(np.int8), pa.int8()),
            }
        )

    return fields_ds.select_columns(["node", *_EQ_BLOCK_KEYS]).map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True
    )


def labeled_pairs(clean, dirty, cfg: LinkageConfig | None = None, neg_ratio: int = 4, seed: int = 0):
    """generate_pairs, pages edition (utils.R:502-645):

    1. truth matches = clean×dirty on ``record_id`` (the voter_reg_num
       inner join) — a bucketed hash join;
    2. exact matches = truth pairs whose (text fingerprint, warc_ts,
       lang) all agree (the all-fields inner join) — dropped from the
       labeled set, like the reference's anti_join;
    3. candidates = the linkage blocker's LSH candidate pairs with
       truth-equal pairs removed (the reference's 6 equality blocks +
       anti-joins);
    4. cheap similarity features + threshold score on candidates;
    5. hard negatives = top ``neg_ratio``×|matches| candidates by
       (thresh_criteria desc, deterministic shuffle key) — sort+limit;
    6. labeled set = matches ∪ negatives, deterministically shuffled.

    Returns dict with ``labeled`` (hydrated pair rows + ``match`` +
    thresh columns), ``fields_a``/``fields_b`` (for downstream feature
    vectors) and counts."""
    cfg = cfg or LinkageConfig()

    fields_a = attach_freq_z(pair_fields(clean, 0), "a").materialize()
    fields_b = attach_freq_z(pair_fields(dirty, 1), "b").materialize()

    # (1) truth matches via record_id join; carry text fingerprints for
    # the exactness test — texts themselves never leave the first pass
    from ..bytekernels import content_hash64

    def keys_of(side):
        def f(batch: pa.Table) -> pa.Table:
            uids = batch.column("row_uid").to_numpy()
            fp = content_hash64(batch.column("text"))
            sfx = "a" if side == 0 else "b"
            return pa.table(
                {
                    "record_id": batch.column("record_id"),
                    f"node_{sfx}": pa.array(uids * 2 + side, pa.int64()),
                    f"fp_{sfx}": pa.array(fp, pa.int64()),
                    f"ts_{sfx}": batch.column("warc_ts"),
                    f"lang_{sfx}": batch.column("lang"),
                }
            )

        return f

    ka = clean.select_columns(["record_id", "row_uid", "text", "warc_ts", "lang"]).map_batches(
        keys_of(0), batch_format="pyarrow", zero_copy_batch=True
    )
    kb = dirty.select_columns(["record_id", "row_uid", "text", "warc_ts", "lang"]).map_batches(
        keys_of(1), batch_format="pyarrow", zero_copy_batch=True
    )
    truth_pairs = bucketed_join(ka, kb, ["record_id"], cfg.num_buckets)

    def split_exact(batch: pd.DataFrame) -> pd.DataFrame:
        exact = (
            (batch["fp_a"] == batch["fp_b"])
            & (batch["ts_a"] == batch["ts_b"])
            & (batch["lang_a"] == batch["lang_b"])
        )
        out = batch[["node_a", "node_b"]].copy()
        out["exact"] = exact.to_numpy()
        return out

    matches = truth_pairs.map_batches(split_exact, batch_format="pandas")
    matches_unexact = matches.map_batches(
        lambda df: df[~df["exact"]].drop(columns=["exact"]), batch_format="pandas"
    ).materialize()
    n_matches = matches_unexact.count()

    # (3) candidate pool = the reference's single-key equality blocks
    # (fname, lname, date — utils.R:548-592) ∪ the production LSH
    # blocker's pairs; truth-equal pairs removed afterwards. The
    # equality blocks supply the NEAR-MISS non-matches (same token,
    # different record) that LSH deliberately avoids.
    payload = node_payload(clean, 0, cfg).union(node_payload(dirty, 1, cfg))
    lsh_bands = band_rows_from_payload(payload, cfg)
    eq_bands = _equality_band_rows(fields_a, cfg).union(_equality_band_rows(fields_b, cfg))
    cands = candidate_pairs(lsh_bands.union(eq_bands), cfg)
    hydrated = hydrate_pairs(cands, fields_a, fields_b, cfg.num_buckets)
    nonmatch = hydrated.map_batches(
        lambda df: df[df["truth_a"] != df["truth_b"]], batch_format="pandas"
    )

    # (4)+(5) threshold features → deterministic shuffle → top-k negatives
    scored = nonmatch.map_batches(_cheap_features, batch_format="pandas")

    def shuffle_key(batch: pd.DataFrame) -> pd.DataFrame:
        from .sampling import pair_key  # THE shared pair-key definition

        batch = batch.copy()
        h = rng.hash_u64(pair_key(batch), seed, rng.tag_for("pairs.shuffle"))
        batch["_shuf"] = (h >> np.uint64(1)).astype(np.int64)
        return batch

    negatives = (
        scored.map_batches(shuffle_key, batch_format="pandas")
        .sort(["thresh_criteria", "_shuf"], descending=[True, False])
        .limit(neg_ratio * n_matches)
        .drop_columns(["_shuf"])
    )

    # (6) labeled set = matches ∪ negatives (hydrated + cheap features
    # on both so schemas align), shuffled deterministically
    pos = (
        hydrate_pairs(matches_unexact, fields_a, fields_b, cfg.num_buckets)
        .map_batches(_cheap_features, batch_format="pandas")
        .map_batches(lambda df: df.assign(match="match"), batch_format="pandas")
    )
    neg = negatives.map_batches(lambda df: df.assign(match="unmatch"), batch_format="pandas")
    labeled = (
        pos.union(neg)
        .map_batches(shuffle_key, batch_format="pandas")
        .sort("_shuf")
        .drop_columns(["_shuf"])
    )
    return {
        "labeled": labeled,
        "fields_a": fields_a,
        "fields_b": fields_b,
        "n_matches": n_matches,
    }


# ------------------------------------------------- 23-metric vectors

METRIC_COLUMNS = [
    "metric_ts_dist", "metric_year_dist", "metric_month_dist", "metric_day_dist",
    "metric_dm_swaps", "metric_age_a", "metric_age_b",
    "metric_fname_dl", "metric_fname_jw", "metric_fname_soundex",
    "metric_ffreq_a", "metric_ffreq_b",
    "metric_lname_dl", "metric_lname_jw", "metric_lname_soundex",
    "metric_lfreq_a", "metric_lfreq_b",
    "metric_name_swaps", "metric_lang_en", "metric_lang_es",
    "metric_host_same", "metric_host_top2", "metric_potential_move",
]


class FeatureVectorStage:
    """map_batches stage computing the 23 ``metric_*`` columns over
    hydrated pair rows (utils.R:189-311 semantics, pages mapping in the
    module docstring). Date metrics are dl-distances on decimal string
    forms exactly like the reference's stringdist-on-numbers; string
    metrics run per pair on the short name tokens.

    ``top_hosts``: the two most frequent hosts (the ww/bb analogue of
    metric_race_code_ww_bb) — broadcast, computed once."""

    def __init__(self, top_hosts: tuple[str, str]):
        self.top_hosts = set(top_hosts)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        out = batch.copy()

        def per_pair(fn, ca, cb):
            return np.fromiter(
                (fn(a or "", b or "") for a, b in zip(batch[ca], batch[cb])),
                dtype=np.float64, count=n,
            )

        dl = damerau_levenshtein
        out["metric_ts_dist"] = per_pair(dl, "date_s_a", "date_s_b")
        for part in ("year", "month", "day"):
            va = batch[f"{part}_a"].astype(str)
            vb = batch[f"{part}_b"].astype(str)
            out[f"metric_{part}_dist"] = np.fromiter(
                (dl(a, b) for a, b in zip(va, vb)), dtype=np.float64, count=n
            )
        out["metric_dm_swaps"] = (
            (batch["day_a"] == batch["month_b"]) & (batch["day_b"] == batch["month_a"])
        ).astype(bool)
        out["metric_age_a"] = np.round(batch["age_days_a"].to_numpy() / 365.0, 6)
        out["metric_age_b"] = np.round(batch["age_days_b"].to_numpy() / 365.0, 6)

        for name in ("fname", "lname"):
            out[f"metric_{name}_dl"] = per_pair(dl, f"{name}_a", f"{name}_b")
            out[f"metric_{name}_jw"] = np.round(
                1.0 - per_pair(jaro_winkler, f"{name}_a", f"{name}_b"), 6
            )
            out[f"metric_{name}_soundex"] = per_pair(
                lambda a, b: 0.0 if soundex(a) == soundex(b) else 1.0, f"{name}_a", f"{name}_b"
            )
        out["metric_ffreq_a"] = batch["ffreq_z_a"]
        out["metric_ffreq_b"] = batch["ffreq_z_b"]
        out["metric_lfreq_a"] = batch["lfreq_z_a"]
        out["metric_lfreq_b"] = batch["lfreq_z_b"]
        out["metric_name_swaps"] = (
            (batch["lname_a"] == batch["fname_b"]) & (batch["lname_b"] == batch["fname_a"])
        ).astype(bool)
        # lang combo counts (gender ff/mm analogue)
        out["metric_lang_en"] = (
            (batch["lang_a"] == "en").astype(int) + (batch["lang_b"] == "en").astype(int)
        )
        out["metric_lang_es"] = (
            (batch["lang_a"] == "es").astype(int) + (batch["lang_b"] == "es").astype(int)
        )
        out["metric_host_same"] = (batch["host_a"] == batch["host_b"]).astype(bool)
        out["metric_host_top2"] = (
            batch["host_a"].isin(self.top_hosts) & batch["host_b"].isin(self.top_hosts)
        ).astype(bool)
        # potential_marriage analogue: lnames differ, either record ≥ 3
        # years old, either side english
        out["metric_potential_move"] = (
            (batch["lname_a"] != batch["lname_b"])
            & ((batch["age_days_a"] >= 3 * 365) | (batch["age_days_b"] >= 3 * 365))
            & ((batch["lang_a"] == "en") | (batch["lang_b"] == "en"))
        ).astype(bool)
        keep = ["node_a", "node_b", *METRIC_COLUMNS]
        if "match" in out.columns:
            keep.append("match")
        return out[keep]


def top2_hosts(fields_ds) -> tuple[str, str]:
    freq = group_agg(fields_ds.select_columns(["host"]), ["host"], {"n": ("host", "size")}).to_pandas()
    freq = freq.sort_values(["n", "host"], ascending=[False, True])
    hosts = freq["host"].tolist()
    if not hosts:  # zero-row fields table (rule 21): no host to rank
        return ("", "")
    return (hosts[0], hosts[1] if len(hosts) > 1 else hosts[0])


def feature_vectors(clean, dirty, cfg: LinkageConfig | None = None, seed: int = 0):
    """End-to-end: labeled pairs → 23-metric feature vectors + match
    label (the add_feature_vector deliverable)."""
    lp = labeled_pairs(clean, dirty, cfg, seed=seed)
    stage = FeatureVectorStage(top2_hosts(lp["fields_a"]))
    return lp["labeled"].map_batches(stage, batch_format="pandas")


# ------------------------------------------- hamming + pair pivots

HAMMING_FIELDS = ["fname", "lname", "date_s", "year", "month", "day", "lang", "host"]


def hamming_fields(hydrated_pairs, weights: "list[float] | None" = None):
    """Weighted field-equality score per pair over the 8 comparison
    fields (calculate_hamming_fields, utils.R:789-810 — there a scalar
    over one pair; here vectorized per row)."""
    w = np.asarray(weights if weights is not None else [1.0] * len(HAMMING_FIELDS), dtype=np.float64)
    if len(w) != len(HAMMING_FIELDS):
        raise ValueError(f"need {len(HAMMING_FIELDS)} weights")

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(len(batch), dtype=np.float64)
        for i, f in enumerate(HAMMING_FIELDS):
            acc += w[i] * (batch[f"{f}_a"] == batch[f"{f}_b"]).to_numpy().astype(np.float64)
        out = batch[["node_a", "node_b"]].copy()
        out["hamming_score"] = np.round(acc, 6)
        return out

    return hydrated_pairs.map_batches(score, batch_format="pandas")


def vectors_to_pairs(wide_ds, field_cols: "list[str] | None" = None):
    """Wide pair rows (col_a / col_b) → long per-side rows, 2 per pair
    (vectors_to_pairs, utils.R:81-116). Pure map_batches — each wide
    row emits its two sides. When no ``pair_id`` column exists, the
    exact pair key rides as the shared columns (``pair_na``,
    ``pair_nb``): node ids carry high DUP/TWIN offset bits (bits
    60-61), so NO int64 packing of two ids is collision-free — a
    single-column pair_id here is a display/sort key only (rng hash of
    both ids), never the group key."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        if "pair_id" not in batch.columns:
            na = batch["node_a"].to_numpy().astype(np.int64)
            nb = batch["node_b"].to_numpy().astype(np.int64)
            batch["pair_na"] = na
            batch["pair_nb"] = nb
            batch["pair_id"] = (
                rng.hash_u64(na * 2654435761 + nb, 0, rng.tag_for("pairs.pair_id"))
                >> np.uint64(1)
            ).astype(np.int64)
        a_cols = [c for c in batch.columns if c.endswith("_a")]
        b_cols = [c for c in batch.columns if c.endswith("_b")]
        shared = [c for c in batch.columns if not c.endswith(("_a", "_b"))]
        fa = batch[shared + a_cols].rename(columns={c: c[:-2] for c in a_cols})
        fb = batch[shared + b_cols].rename(columns={c: c[:-2] for c in b_cols})
        fa = fa.assign(side=0)
        fb = fb.assign(side=1)
        return pd.concat([fa, fb], ignore_index=True).sort_values(["pair_id", "side"])

    return wide_ds.map_batches(explode, batch_format="pandas")


def pairs_to_vectors(long_ds, num_buckets: int = 64):
    """Long per-side rows → wide pair rows (pairs_to_vectors,
    utils.R:119-150): bucketed groupby on the pair key, slice side 0/1
    into _a/_b columns. The key is (``pair_na``, ``pair_nb``) when
    vectors_to_pairs synthesized it (exact — the hashed single-column
    pair_id is not collision-free over high-bit node ids); a
    caller-provided ``pair_id`` alone is trusted as unique."""
    from ..shuffle import bucketed_group_apply

    schema = long_ds.schema()
    if schema is None:  # zero pairs upstream: schemaless empty in, empty out
        return long_ds
    keys = (
        ["pair_na", "pair_nb"]
        if {"pair_na", "pair_nb"} <= set(schema.names)
        else ["pair_id"]
    )

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([*keys, "side"])
        a = df[df["side"] == 0].drop(columns=["side"])
        b = df[df["side"] == 1].drop(columns=["side"])
        val_cols = [c for c in df.columns if c not in ("pair_id", "side", *keys)]
        a = a.rename(columns={c: f"{c}_a" for c in val_cols})
        b = b.rename(columns={c: f"{c}_b" for c in val_cols})
        if "pair_id" not in keys:
            b = b.drop(columns=["pair_id"])
        return a.merge(b, on=keys, how="inner")

    return bucketed_group_apply(long_ds, keys, widen, num_buckets)
