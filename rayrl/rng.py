"""Counter-based deterministic RNG.

The reference uses R's single global RNG stream (set.seed at
/root/reference/benchmarking/paper_flow_dob_latest.Rmd:58,
utils.R:1300), which cannot be reproduced under partitioning. Here
every random draw is a pure function ``hash(seed, record_id, stream
tag)`` so results are byte-identical at any parallelism — the
load-bearing design change called out in SURVEY.md §4 (Determinism row).

All functions are vectorized over an int64 ``record_id`` array via the
SplitMix64 finalizer (public-domain constant set, Steele et al. 2014).
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_INV_2_64 = 1.0 / 2.0**64


def tag_for(name: str) -> np.uint64:
    """Stable 64-bit tag for a named stream (stage name, op, column)."""
    digest = hashlib.blake2b(name.encode("utf-8"), digest_size=8).digest()
    return _U64(int.from_bytes(digest, "little"))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _GOLDEN).astype(_U64)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def hash_u64(record_ids: np.ndarray, seed: int, tag: np.uint64 | int = 0) -> np.ndarray:
    """Deterministic uint64 per record id for stream (seed, tag)."""
    ids = np.asarray(record_ids).astype(np.int64).view(_U64)
    mask = 0xFFFFFFFFFFFFFFFF
    const = _U64(((seed & mask) * 0x9E3779B97F4A7C15 ^ (int(tag) * 0xBF58476D1CE4E5B9)) & mask)
    return _splitmix64(ids ^ const)


def uniform(record_ids: np.ndarray, seed: int, tag: np.uint64 | int = 0) -> np.ndarray:
    """Uniform [0, 1) float64 per record id."""
    return hash_u64(record_ids, seed, tag) * _INV_2_64


def bernoulli(record_ids: np.ndarray, p: float, seed: int, tag: np.uint64 | int = 0) -> np.ndarray:
    """Per-row Bernoulli(p) gate — the Ray-native replacement for the
    reference's global sample-exactly-k row selection
    (/root/reference/R/1_error.R:78-80); see SURVEY.md §7.5(1)."""
    if p <= 0:
        return np.zeros(len(np.asarray(record_ids)), dtype=bool)
    if p >= 1:
        return np.ones(len(np.asarray(record_ids)), dtype=bool)
    return uniform(record_ids, seed, tag) < p


def randint(record_ids: np.ndarray, n: np.ndarray | int, seed: int, tag: np.uint64 | int = 0) -> np.ndarray:
    """Deterministic integer in [0, n) per record id. ``n`` may be an
    array (per-row modulus, e.g. string lengths)."""
    n_arr = np.maximum(np.asarray(n, dtype=np.uint64), _U64(1))
    return (hash_u64(record_ids, seed, tag) % n_arr).astype(np.int64)


def _normal_from_u(u1: np.ndarray, u2: np.ndarray) -> np.ndarray:
    """Box–Muller kernel. u1 is clamped below 1.0: hash values within
    1024 of 2^64 round UP to exactly 1.0 in float64, and log1p(-1.0) is
    -inf — one such draw (~6e-17/draw, but 2^64-scale corpora roll those
    dice) would turn a whole RFF matrix / weight init into NaNs with no
    exception. The clamp moves only those pathological draws."""
    u1 = np.minimum(u1, 1.0 - 2.0**-53)
    return np.sqrt(-2.0 * np.log1p(-u1)) * np.cos(2.0 * np.pi * u2)


def normal(record_ids: np.ndarray, seed: int, tag: np.uint64 | int = 0) -> np.ndarray:
    """Deterministic standard-normal draw per record id (Box–Muller
    over two derived uniform streams). Used for model-weight init and
    random-feature matrices (models.py) so trained weights are
    byte-identical at any parallelism."""
    u1 = uniform(record_ids, seed, tag)
    u2 = uniform(record_ids, seed, int(tag) + 1)
    return _normal_from_u(u1, u2)
