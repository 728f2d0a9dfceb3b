"""In-block pairwise scoring → match edges.

Replaces the reference's materialize-all-candidate-pairs +
add_feature_vector flow (/root/reference/benchmarking/utils.R:502-645,
189-311): pairs are generated AND scored inside each block and only
above-threshold edges are emitted — the candidate pair set is never
materialized (SURVEY.md §7.5(5)).

Execution shape: ONE Ray groupby on ``bucket`` (bounded heavyweight
groups, see blocking.py), then a vectorized pandas groupby over
``block_key`` inside each bucket. Edge dedup across bands is a second,
narrow groupby on (node_a, node_b) — the reference's ``distinct()`` on
candidate pairs (utils.R:587,592).

Feature set per pair (the surviving web-page analogues of the 23
metric_* columns, utils.R:189-311): char-3-shingle Jaccard,
Jaro-Winkler on text, lang equality. The decision rule is a
deterministic threshold scorer (stand-in for the reference's rf/svm
models — SURVEY.md §2.3 last row); swap in a model by replacing
``_match_score``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Max

from .blocking import LinkageConfig
from .stringsim import char_shingles, jaccard, jaro_winkler

_EMPTY = pd.DataFrame(
    {
        "node_a": pd.Series([], dtype="int64"),
        "node_b": pd.Series([], dtype="int64"),
        "truth_a": pd.Series([], dtype="int64"),
        "truth_b": pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="float64"),
    }
)


def _match_score(jac: float, jw: float, lang_eq: bool, cfg: LinkageConfig) -> float:
    """Deterministic scorer in [0,1]; ≥ 0.5 ⇒ match edge."""
    if jac >= cfg.jaccard_threshold or jw >= cfg.jw_threshold:
        base = 0.55 + 0.35 * max(jac, jw - 0.5)
    else:
        base = 0.45 * max(jac / max(cfg.jaccard_threshold, 1e-9), jw / cfg.jw_threshold)
        base = min(base, 0.49)
    if lang_eq:
        base = min(1.0, base + 0.01)
    return base


def score_bucket(group: pd.DataFrame, cfg: LinkageConfig) -> pd.DataFrame:
    """One bucket: iterate its blocks (pandas groupby — C-level group
    split), generate clean×dirty pairs per block, score, threshold.
    A (node_a, node_b) pair seen in an earlier block of the same bucket
    is skipped locally; cross-bucket repeats die in the dedup groupby."""
    out_a: list[int] = []
    out_b: list[int] = []
    out_ta: list[int] = []
    out_tb: list[int] = []
    out_s: list[float] = []
    seen: set[tuple[int, int]] = set()
    shingle_cache: dict[int, set] = {}

    nodes = group["node"].to_numpy()
    truths = group["truth"].to_numpy()
    sides = group["side"].to_numpy()
    texts = group["text"].to_numpy()
    langs = group["lang"].to_numpy()

    for _, idx in group.groupby("block_key", sort=False).indices.items():
        s = sides[idx]
        c_ix = idx[s == 0]
        d_ix = idx[s == 1]
        n_pairs = len(c_ix) * len(d_ix)
        if n_pairs == 0 or n_pairs > cfg.max_block_pairs:
            # pathological block (boilerplate collision): skip — pairs
            # will be found via their other bands
            continue
        for i in c_ix:
            na = int(nodes[i])
            sh_a = shingle_cache.get(na)
            if sh_a is None:
                sh_a = shingle_cache[na] = char_shingles(texts[i])
            for j in d_ix:
                nb = int(nodes[j])
                key = (na, nb)
                if key in seen:
                    continue
                seen.add(key)
                sh_b = shingle_cache.get(nb)
                if sh_b is None:
                    sh_b = shingle_cache[nb] = char_shingles(texts[j])
                jac = jaccard(sh_a, sh_b)
                if jac < cfg.jaccard_threshold * 0.5:
                    continue  # cheap reject before the O(n·m) JW
                jw = jaro_winkler(texts[i], texts[j]) if jac < 0.999 else 1.0
                sc = _match_score(jac, jw, langs[i] == langs[j], cfg)
                if sc >= 0.5:
                    out_a.append(na)
                    out_b.append(nb)
                    out_ta.append(int(truths[i]))
                    out_tb.append(int(truths[j]))
                    out_s.append(sc)
    if not out_a:
        return _EMPTY
    return pd.DataFrame(
        {
            "node_a": np.array(out_a, dtype=np.int64),
            "node_b": np.array(out_b, dtype=np.int64),
            "truth_a": np.array(out_ta, dtype=np.int64),
            "truth_b": np.array(out_tb, dtype=np.int64),
            "score": np.array(out_s, dtype=np.float64),
        }
    )


def score_blocks(band_ds, cfg: LinkageConfig):
    """bucket-grouped scoring → cross-band edge dedup.

    The dedup is a bucketed DISTINCT (rayrl.shuffle), not a Ray
    ``groupby(...).aggregate`` — edge keys have unbounded cardinality
    (one group per pair) and per-group dispatch would dominate the whole
    pipeline. Scores are deterministic functions of the pair, so any
    duplicate row is identical and drop-first semantics are exact."""
    from ..shuffle import distinct_rows

    edges = band_ds.groupby("bucket").map_groups(
        lambda g: score_bucket(g, cfg), batch_format="pandas"
    )
    return distinct_rows(edges, ["node_a", "node_b"], num_buckets=cfg.num_buckets)
