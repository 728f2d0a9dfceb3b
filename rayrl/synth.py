"""Deterministic Common-Crawl-style ``pages`` fixture generator
(FIXTURES.md F1; shape = BASELINE.json input_hint).

Every value is a pure function of (seed, row index), so the generated
table is identical at any parallelism / batching. Generation itself is
a Ray Data pipeline (``ray.data.range(n).map_batches(...)``) so fixture
creation streams at scale too.

Ground truth: ``entity_id`` groups rows into clusters of size 1-5 via a
closed-form composition trick (no global scan); ``record_id`` == row
index is the per-record truth key (the analogue of the reference's
hidden ``voter_reg_num``, /root/reference/benchmarking/utils.R:521-530).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from . import assets, rng
from .schema import PAGES

N_HOSTS = 499

# Compositions of 5 → cluster sizes 1..5 (FIXTURES.md F1 truth rule).
_PATTERNS = [
    [5],
    [4, 1],
    [3, 2],
    [2, 2, 1],
    [2, 1, 1, 1],
    [1, 1, 1, 1, 1],
    [3, 1, 1],
]
# part index for each offset 0..4 under each pattern
_PART_OF = np.array(
    [[next(p for p in range(len(pat)) if sum(pat[: p + 1]) > r) for r in range(5)] for pat in _PATTERNS],
    dtype=np.int64,
)


def entity_ids(indices: np.ndarray, seed: int = 42) -> np.ndarray:
    """Closed-form row→entity mapping with cluster sizes 1-5."""
    block = indices // 5
    offset = indices % 5
    pat = rng.randint(block, len(_PATTERNS), seed, rng.tag_for("entity.pattern"))
    part = _PART_OF[pat, offset]
    return block * 5 + part


def _zipf_host(indices: np.ndarray, seed: int) -> np.ndarray:
    """Zipfian host index so blocking keys are skewed (FIXTURES.md F1)."""
    u = rng.uniform(indices, seed, rng.tag_for("url.host"))
    # inverse-CDF of a truncated zipf(s=1.1) over N_HOSTS, precomputed
    ranks = np.arange(1, N_HOSTS + 1, dtype=np.float64)
    w = 1.0 / ranks**1.1
    cdf = np.cumsum(w) / w.sum()
    return np.searchsorted(cdf, u, side="right").clip(0, N_HOSTS - 1)


def make_pages_batch(indices: np.ndarray, seed: int = 42) -> pa.Table:
    """Build one Arrow batch of pages rows for the given row indices."""
    indices = np.asarray(indices, dtype=np.int64)
    n = len(indices)
    toks, _ = assets.vocab(seed)
    vocab_n = len(toks)

    ent = entity_ids(indices, seed)
    host = _zipf_host(indices, seed)

    # --- text: 3 entity-boilerplate tokens + 2..9 row tokens ---
    n_row_toks = 2 + rng.randint(indices, 8, seed, rng.tag_for("text.ntoks"))
    boil_ix = np.stack(
        [rng.randint(ent, vocab_n, seed, rng.tag_for(f"text.boil{j}")) for j in range(3)], axis=1
    )
    max_toks = 9
    row_ix = np.stack(
        [rng.randint(indices, vocab_n, seed, rng.tag_for(f"text.tok{j}")) for j in range(max_toks)], axis=1
    )
    hyphen_mask = rng.bernoulli(indices, 0.10, seed, rng.tag_for("text.hyphen"))
    digit_mask = rng.bernoulli(indices, 0.10, seed, rng.tag_for("text.digit"))
    digit_val = rng.randint(indices, 10_000_000, seed, rng.tag_for("text.digitval"))

    texts = []
    for i in range(n):
        parts = [toks[boil_ix[i, 0]], toks[boil_ix[i, 1]], toks[boil_ix[i, 2]]]
        k = int(n_row_toks[i])
        parts.extend(toks[row_ix[i, j]] for j in range(k))
        if hyphen_mask[i]:
            parts[3] = parts[3] + "-" + toks[row_ix[i, (k - 1)]]
        if digit_mask[i]:
            parts.append(str(int(digit_val[i])))
        texts.append(" ".join(parts))

    # --- warc_ts: 2010-2016, ≥50% of days < 13 (date_swap eligibility,
    # R/7_dob_errors.R:53) ---
    year = 2010 + rng.randint(indices, 7, seed, rng.tag_for("ts.year"))
    month = 1 + rng.randint(indices, 12, seed, rng.tag_for("ts.month"))
    low_day = rng.bernoulli(indices, 0.55, seed, rng.tag_for("ts.lowday"))
    day = np.where(
        low_day,
        1 + rng.randint(indices, 12, seed, rng.tag_for("ts.day1")),
        13 + rng.randint(indices, 15, seed, rng.tag_for("ts.day2")),
    )
    secs = rng.randint(indices, 86400, seed, rng.tag_for("ts.secs"))
    ts = pd.to_datetime(
        pd.DataFrame({"year": year, "month": month, "day": day})
    ).values.astype("datetime64[us]") + secs.astype("timedelta64[s]")

    # --- lang: 85/5/5/5 en/de/fr/es ---
    lu = rng.uniform(indices, seed, rng.tag_for("lang"))
    lang = np.select([lu < 0.85, lu < 0.90, lu < 0.95], ["en", "de", "fr"], default="es")

    urls = [f"https://site{host[i]}.example/e{ent[i]}/p{indices[i]}" for i in range(n)]
    html = [b"<html>" + t.encode("utf-8") + b"</html>" for t in texts]

    return pa.table(
        {
            "record_id": pa.array(indices, pa.int64()),
            "row_uid": pa.array(indices, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
        },
        schema=PAGES,
    )


def pages_dataset(n: int, seed: int = 42, override_num_blocks: int | None = None) -> "ray.data.Dataset":
    """Streaming fixture generator: ``range(n)`` → pages rows."""

    def build(batch: pa.Table) -> pa.Table:
        return make_pages_batch(batch["id"].to_numpy(), seed)

    if override_num_blocks is None:
        # row construction is Python-loop-bound → keep blocks small
        # enough that every core gets work
        override_num_blocks = max(8, min(512, n // 4096))
    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)


def truth_table(n: int, seed: int = 42) -> pa.Table:
    """Sibling ground-truth table (never fed to the pipeline)."""
    indices = np.arange(n, dtype=np.int64)
    ent = entity_ids(indices, seed)
    host = _zipf_host(indices, seed)
    urls = [f"https://site{host[i]}.example/e{ent[i]}/p{i}" for i in range(n)]
    return pa.table(
        {
            "record_id": pa.array(indices, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "entity_id": pa.array(ent, pa.int64()),
        }
    )
