"""Deterministic train/test sampling over labeled feature vectors.

Reference semantics:

- ``sample_strat`` (benchmarking/paper_flow_dob_latest.Rmd:161-172):
  n-row training sample with m = ceil(n/5) rows from the "match"
  stratum and u = n − m from "unmatch"; the rest of the frame is the
  test set.
- fixed-test split (benchmarking/standard_n.R:58-99): a fixed-size
  test sample, the remainder (optionally truncated to ``train_n``)
  as train.

The reference draws with ``sample()`` under ``set.seed``; the
distributed analogue replaces the permutation with the repo's
deterministic counter-stream hash (rng.hash_u64 keyed on the pair
ids), so membership is a pure function of the row key — identical at
any parallelism, no global sort, no driver materialization of the
data. Selecting "the n_s smallest hashes per stratum" is exact via a
two-pass shape: a per-batch partial top-k (each block returns ≤ n_s
hash values per stratum) → tiny driver merge → per-stratum cutoff
broadcast into a filter pass. 64-bit hashes over distinct pair keys
make ties vanishingly unlikely; the cutoff pass counts exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import rng

_TAG = rng.tag_for("sampling.strat")


def pair_key(batch: pd.DataFrame) -> np.ndarray:
    """Canonical int64 key of a labeled pair row — THE formula every
    order-independent pair mechanism keys on (sampling membership
    here; fold/validation splits in ``models.py``). One definition so
    the mechanisms cannot drift apart."""
    return (
        batch["node_a"].to_numpy().astype(np.int64) * 2654435761
        + batch["node_b"].to_numpy().astype(np.int64)
    )


def _row_hash(batch: pd.DataFrame, seed: int) -> np.ndarray:
    return rng.hash_u64(pair_key(batch), seed, _TAG)


def _stratum_cutoffs(ds, targets: dict[str, int], label: str, seed: int) -> dict[str, int]:
    """Per-stratum hash cutoff h* such that |{rows: h ≤ h*}| == target
    (or all rows if the stratum is smaller than its target)."""

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        h = _row_hash(batch, seed)
        lab = batch[label].to_numpy()
        out_l, out_h = [], []
        for s, k in targets.items():
            hs = h[lab == s]
            if len(hs) > k:
                hs = np.partition(hs, k - 1)[:k] if k > 0 else hs[:0]
            out_l.append(np.full(len(hs), s, dtype=object))
            out_h.append(hs.astype(np.int64))  # u64 bits in an i64 column
        return pd.DataFrame(
            {
                "stratum": np.concatenate(out_l) if out_l else np.array([], dtype=object),
                "h": np.concatenate(out_h) if out_h else np.array([], dtype=np.int64),
            }
        )

    parts = ds.select_columns(["node_a", "node_b", label]).map_batches(
        partial_topk, batch_format="pandas"
    ).to_pandas()
    cutoffs: dict[str, int] = {}
    for s, k in targets.items():
        hs = np.sort(parts.loc[parts["stratum"] == s, "h"].to_numpy().astype(np.uint64))
        if k <= 0 or len(hs) == 0:
            cutoffs[s] = -1  # empty selection
        elif len(hs) <= k:
            cutoffs[s] = (1 << 64) - 1  # whole stratum (u64 max)
        else:
            cutoffs[s] = int(hs[k - 1])  # u64 value as a Python int
    return cutoffs


def _split_by_cutoff(ds, cutoffs: dict[str, int], label: str, seed: int):
    """(selected, rest) Datasets by per-stratum hash cutoff — two lazy
    filter passes, nothing materialized."""

    def keep(selected: bool):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return batch
            h = _row_hash(batch, seed)  # uint64
            lab = batch[label].to_numpy()
            valid = np.array([cutoffs.get(s, -1) >= 0 for s in lab], dtype=bool)
            cut = np.array(
                [max(cutoffs.get(s, -1), 0) for s in lab], dtype=np.uint64
            )
            m = valid & (h <= cut)
            return batch[m if selected else ~m]

        return fn

    return (
        ds.map_batches(keep(True), batch_format="pandas"),
        ds.map_batches(keep(False), batch_format="pandas"),
    )


def sample_strat(
    vectors_ds,
    n: int = 2000,
    match_frac: float = 0.2,
    label: str = "match",
    seed: int = 23,
):
    """Stratified train/test split of a labeled pair Dataset.

    Returns ``{"train": Dataset, "test": Dataset, "targets": dict}``
    where train has ceil(n·match_frac) "match" rows and the rest
    "unmatch" (capped at stratum size), and test is everything else —
    the Rmd's sample_strat + test_indices."""
    m = int(np.ceil(n * match_frac))
    targets = {"match": m, "unmatch": n - m}
    # materialize once: the cutoff scan and the split would otherwise
    # each re-execute the upstream feature pipeline (the labeled
    # product is bounded by (1+neg_ratio)·|matches| by construction)
    vectors_ds = vectors_ds.materialize()
    cutoffs = _stratum_cutoffs(vectors_ds, targets, label, seed)
    train, test = _split_by_cutoff(vectors_ds, cutoffs, label, seed)
    return {"train": train, "test": test, "targets": targets}


# the constant-label stratum both fixed-test splitters ride on
_CONST = "_all"


def _test_rest_split(vectors_ds, test_n: int, seed: int):
    """Shared core of the fixed-test splitters: tag a constant stratum,
    cut the ``test_n`` smallest hashes, return (test, rest) still
    carrying the tag column (callers drop it)."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[_CONST] = _CONST
        return batch

    tagged = vectors_ds.map_batches(tag, batch_format="pandas")
    test_cut = _stratum_cutoffs(tagged, {_CONST: test_n}, _CONST, seed)
    return _split_by_cutoff(tagged, test_cut, _CONST, seed)


def _train_subset(rest, train_n: int, seed: int):
    """The ``train_n`` smallest remaining hashes (seed+1 stream) — the
    nested-prefix truncation both splitters share."""
    cut = _stratum_cutoffs(rest, {_CONST: train_n}, _CONST, seed + 1)
    train, _ = _split_by_cutoff(rest, cut, _CONST, seed + 1)
    return train


def train_test_split(
    vectors_ds,
    test_n: int = 2000,
    train_n: "int | None" = None,
    label: str = "match",
    seed: int = 133,
):
    """Fixed-size test sample; remainder as train, optionally truncated
    to the ``train_n`` next-smallest hashes (standard_n.R:58-99's
    test_indices / train_indices[1:train_n])."""
    test, rest = _test_rest_split(vectors_ds, test_n, seed)
    drop = lambda ds: ds.drop_columns([_CONST])  # noqa: E731
    if train_n is None:
        return {"test": drop(test), "train": drop(rest)}
    return {"test": drop(test), "train": drop(_train_subset(rest, train_n, seed))}


def fixed_test_splits(
    vectors_ds,
    test_n: int,
    train_sizes: tuple,
    seed: int = 133,
):
    """:func:`train_test_split` semantics for a SWEEP of train sizes —
    the SAME core helpers, so per-size results equal per-size
    ``train_test_split`` calls by construction (each train set a hash
    prefix of the next; asserted in
    test_learning_curve_fixed_test_and_nested_prefix) — minus
    ``len(train_sizes) − 1`` redundant full-dataset scans: the test
    split is computed once and the remainder materialized once.

    Returns ``{"test": materialized Dataset, "trains": [LAZY Dataset
    per size]}`` — trains are cheap filters over the materialized
    remainder, left lazy so a long sweep holds one train's rows at a
    time, not the whole grid's."""
    test, rest = _test_rest_split(vectors_ds, test_n, seed)
    test = test.drop_columns([_CONST]).materialize()
    rest = rest.materialize()
    trains = [
        _train_subset(rest, n, seed).drop_columns([_CONST]) for n in train_sizes
    ]
    return {"test": test, "trains": trains}
