"""Mergeable sketches as Ray Data aggregates.

The reference has no approximate aggregates (SURVEY §2.4); a 100-TB
corpus needs them — COUNT(DISTINCT) over trillions of tokens cannot
shuffle every token. The sketch rides Ray Data's native
``AggregateFn`` contract: per-block vectorized accumulation, an
associative register merge, one tiny state per block — the canonical
mergeable-sketch shape (nothing but 2^p bytes ever crosses the wire).

``approx_distinct_tokens`` (HyperLogLog, Flajolet et al. 2007) is the
scale path; ``distinct_tokens_exact`` is its DuckDB-oracle-checked
exact twin (bucketed distinct — fine at fixture scale, the thing HLL
replaces at corpus scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import AggregateFn

HLL_P = 14  # 2^14 registers → ~0.81% standard error


def _token_hashes(texts: pa.ChunkedArray) -> np.ndarray:
    """uint64 hash per whitespace token of every row (single-space
    split, matching the token_counts / SQL oracle semantics)."""
    from .bytekernels import content_hash64
    from .rng import _splitmix64

    flat = pa.compute.split_pattern(texts.combine_chunks(), " ")
    tokens = pa.compute.list_flatten(flat)
    if len(tokens) == 0:
        return np.zeros(0, np.uint64)
    return _splitmix64(content_hash64(tokens).view(np.uint64))


def _hll_accumulate(regs: np.ndarray, h: np.ndarray, p: int) -> np.ndarray:
    """Elementwise-max fold of token hashes into 2^p rank registers."""
    if not len(h):
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1 (capped)
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    # bit_length via log2 on the float mantissa is unsafe near 2^64;
    # use a 4-bit-nibble scan: positions of the highest set bit
    r = rest[nz]
    lead = np.zeros(len(r), dtype=np.uint8)
    shift = np.uint64(32)
    cur = r.copy()
    while shift >= 1:
        hi = cur >> shift
        is_lo = hi == 0
        lead[is_lo] += np.uint8(shift)
        cur = np.where(is_lo, cur, hi)
        if shift == 1:
            break
        shift >>= np.uint64(1)
    rank[nz] = np.minimum(lead + 1, 64 - p + 1).astype(np.uint8)
    out = regs.copy()
    np.maximum.at(out, idx, rank)
    return out


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small n
    return float(est)


def hll_distinct_agg(column: str, p: int = HLL_P, name: str = "approx_distinct") -> AggregateFn:
    """A mergeable HyperLogLog distinct-count over a string column's
    whitespace tokens, as a native Ray Data ``AggregateFn``: blocks
    accumulate vectorized, states merge by register max, only 2^p
    bytes per block ever move."""

    def init(_key):
        return np.zeros(2**p, dtype=np.uint8)

    def accumulate_block(regs, block):
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        return _hll_accumulate(regs, _token_hashes(tbl.column(column)), p)

    def merge(a, b):
        return np.maximum(a, b)

    def finalize(regs):
        return _hll_estimate(regs)

    return AggregateFn(
        init=init,
        merge=merge,
        name=name,
        accumulate_block=accumulate_block,
        finalize=finalize,
    )


# ---------------------------------------------- quantile log-sketch

QSKETCH_BITS = 16  # 2^16 bins = 512 KiB state; 4 mantissa bits ≈ 3% rel. err


def _u2f(u: np.ndarray) -> np.ndarray:
    """Inverse of quantiles._f2u (monotone uint64 → float64)."""
    u = u.astype(np.uint64)
    top = u >= np.uint64(2**63)
    bu = np.where(top, u - np.uint64(2**63), ~u)
    return bu.view(np.float64)


def quantile_sketch_agg(
    column: str, qs: tuple, p_bits: int = QSKETCH_BITS, name: str = "approx_quantiles"
) -> AggregateFn:
    """One-pass mergeable quantile sketch (DDSketch-flavored): values
    bin by the top ``p_bits`` of their monotone uint64 image — sign +
    exponent + 4 mantissa bits — so bins are relative-width (~2^-4)
    across the entire double range with no prior knowledge of the data.
    Blocks accumulate via one bincount, states merge by addition,
    finalize walks the cumulative histogram and answers each q with the
    bin midpoint (≤ ~3% relative error). The exact twin is
    quantiles.distributed_quantiles (multi-pass refinement); this is
    what replaces it when one streaming pass over 100 TB is all you
    get."""
    n_bins = 2**p_bits
    shift = np.uint64(64 - p_bits)

    def init(_key):
        return np.zeros(n_bins, dtype=np.int64)

    def accumulate_block(counts, block):
        from .quantiles import _f2u

        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        v = tbl.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
        if not len(v):
            return counts
        idx = (_f2u(v) >> shift).astype(np.int64)
        return counts + np.bincount(idx, minlength=n_bins)

    def merge(a, b):
        return a + b

    def finalize(counts):
        n = int(counts.sum())
        if n == 0:
            return {f"q{q}": float("nan") for q in qs}
        cum = np.cumsum(counts)
        out = {}
        for q in qs:
            rank = int(q * (n - 1))  # "lower" order statistic, like the exact twin
            b = int(np.searchsorted(cum, rank + 1))
            lo = _u2f(np.array([b], dtype=np.uint64) << shift)[0]
            hi = _u2f((np.array([b + 1], dtype=np.uint64) << shift) - np.uint64(1))[0]
            out[f"q{q}"] = float((lo + hi) / 2.0)
        return out

    return AggregateFn(
        init=init,
        merge=merge,
        name=name,
        accumulate_block=accumulate_block,
        finalize=finalize,
    )


# ----------------------------------------------------------- queries

def approx_distinct_tokens(sf_dir: str):
    """Approximate distinct whitespace-token count over documents.text
    (HLL p=14, ~0.8% s.e.) — the 100-TB path for what
    ``distinct_tokens_exact`` computes exactly."""
    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = ds.aggregate(hll_distinct_agg("text"))
    return pd.DataFrame({"approx_distinct": [round(float(out["approx_distinct"]), 1)]})


def distinct_tokens_exact(sf_dir: str):
    """Exact distinct whitespace-token count (bucketed distinct over
    exploded tokens — the shape HLL replaces at corpus scale)."""
    import pandas as pd

    from .shuffle import distinct_count

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode(batch: pa.Table) -> pa.Table:
        toks = pa.compute.list_flatten(
            pa.compute.split_pattern(batch.column("text").combine_chunks(), " ")
        )
        return pa.table({"token": toks})

    tokens = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return pd.DataFrame({"n_distinct": [int(distinct_count(tokens, ["token"]))]})


DISTINCT_TOKENS_ORACLE = """
    SELECT CAST(count(DISTINCT t) AS BIGINT) AS n_distinct
    FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
"""


def approx_order_price_quantiles(sf_dir: str):
    """One-pass approximate o_totalprice quartiles per priority (the
    log-sketch twin of the exact ★order_price_quantiles; tested within
    3% relative of the exact values)."""
    import pandas as pd

    qs = (0.25, 0.50, 0.75)
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    rows = ds.groupby("o_orderpriority").aggregate(
        quantile_sketch_agg("o_totalprice", qs)
    ).take_all()  # ≤ |priority| rows
    out = []
    for r in rows:
        for q in qs:
            out.append(
                {
                    "o_orderpriority": r["o_orderpriority"],
                    "q": q,
                    "value": round(r["approx_quantiles"][f"q{q}"], 4),
                }
            )
    return pd.DataFrame(out)


MG_K = 64  # Misra-Gries summary capacity


def _mg_compress(counts: dict, k: int) -> dict:
    """Keep ≤ k entries by subtracting the (k+1)-th largest count from
    all (ties at the threshold drop to 0 and vanish)."""
    if len(counts) <= k:
        return counts
    thresh = sorted(counts.values())[-(k + 1)]
    return {t: c - thresh for t, c in counts.items() if c > thresh}


def misra_gries_agg(column: str, k: int = MG_K, name: str = "heavy_hitters") -> AggregateFn:
    """Heavy-hitter tokens (Misra-Gries summary, mergeable per Agarwal
    et al. 2012): one pass, ≤ k (token, count) pairs per block state —
    the bounded-memory path for "top tokens" when the vocabulary is
    too large to shuffle (`token_frequencies` is the exact twin).

    Guarantee (layout-independent, verified in test_sketches): every
    token with true frequency > n_total/(k+1) survives any block
    layout / merge order, and for each stored token
    ``est ≤ true ≤ est + err`` with err = (n_total − Σest)/(k+1).
    The stored ESTIMATES themselves may differ between layouts — the
    summary's contract is the bound, not the point value."""

    def init(_key):
        return ({}, 0)  # (token -> residual count, total token count)

    def accumulate_block(state, block):
        counts, total = state
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        import collections

        c = collections.Counter()
        for t in tbl.column(column).to_pylist():
            if t:
                c.update(t.split(" "))
        merged = dict(counts)
        for t, n in c.items():
            merged[t] = merged.get(t, 0) + n
        return (_mg_compress(merged, k), total + sum(c.values()))

    def merge(a, b):
        merged = dict(a[0])
        for t, n in b[0].items():
            merged[t] = merged.get(t, 0) + n
        return (_mg_compress(merged, k), a[1] + b[1])

    def finalize(state):
        counts, total = state
        err = (total - sum(counts.values())) / (k + 1)
        return {"counts": counts, "n_total": total, "err": err}

    return AggregateFn(
        init=init,
        merge=merge,
        name=name,
        accumulate_block=accumulate_block,
        finalize=finalize,
    )


def heavy_hitter_tokens(sf_dir: str, k: int = MG_K, top: int = 20):
    """Approximate top tokens over documents.text via the Misra-Gries
    aggregate (exact ★twin: token_frequencies). Output: the `top`
    stored tokens by estimate (desc, token asc tie-break) with the
    per-run error bound attached."""
    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = ds.aggregate(misra_gries_agg("text", k))["heavy_hitters"]
    rows = sorted(out["counts"].items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return pd.DataFrame(
        {
            "token": [t for t, _ in rows],
            "est_count": [int(c) for _, c in rows],
            "err_bound": [round(out["err"], 2)] * len(rows),
        }
    )


SKETCH_QUERIES = {
    "distinct_tokens_exact": distinct_tokens_exact,
    "approx_distinct_tokens": approx_distinct_tokens,
    "approx_order_price_quantiles": approx_order_price_quantiles,
    "heavy_hitter_tokens": heavy_hitter_tokens,
}
SKETCH_ORACLES = {"distinct_tokens_exact": DISTINCT_TOKENS_ORACLE}
