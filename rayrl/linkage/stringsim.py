"""String-similarity kernels for pairwise scoring.

Ports of the reference's stringdist metrics (Jaro-Winkler and
Damerau-Levenshtein via the stringdist package,
/root/reference/benchmarking/utils.R:180-187; max-length normalization
at utils.R:168-174) in pure Python/numpy (no third-party string libs in
the sandbox). The Levenshtein is banded with an early-exit cutoff so
per-pair cost is O(len · k), not O(len²) — pairs more than ``k`` edits
apart only ever need "> k" as an answer.
"""

from __future__ import annotations

import numpy as np

from .. import rng


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Standard Jaro-Winkler similarity in [0, 1]."""
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * n1
    flags2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(n2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    j = 0
    for i in range(n1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    jaro = (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0
    # winkler prefix boost (standard cap of 4)
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def levenshtein_banded(s1: str, s2: str, k: int) -> int:
    """Levenshtein distance, or k+1 if the distance exceeds ``k``."""
    n1, n2 = len(s1), len(s2)
    if abs(n1 - n2) > k:
        return k + 1
    if n1 == 0:
        return n2
    if n2 == 0:
        return n1
    if n1 > n2:  # keep the band centered
        s1, s2, n1, n2 = s2, s1, n2, n1
    prev = list(range(n2 + 1))
    for i in range(1, n1 + 1):
        lo = max(1, i - k)
        hi = min(n2, i + k)
        cur = [k + 1] * (n2 + 1)
        cur[0] = i if i <= k else k + 1
        c1 = s1[i - 1]
        for j in range(lo, hi + 1):
            cost = 0 if c1 == s2[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[lo : hi + 1]) > k:
            return k + 1
        prev = cur
    return min(prev[n2], k + 1)


def lev_norm(s1: str, s2: str, k: int = 16) -> float:
    """Banded distance normalized by max length (utils.R:168-174);
    saturates at (k+1)/maxlen when the cutoff trips."""
    m = max(len(s1), len(s2))
    if m == 0:
        return 0.0
    return levenshtein_banded(s1, s2, k) / m


def damerau_levenshtein(s1: str, s2: str) -> int:
    """FULL Damerau-Levenshtein (transpositions may have intervening
    edits — the Lowrance-Wagner recurrence), matching R stringdist's
    method="dl" (/root/reference/benchmarking/utils.R:183), not the
    restricted OSA variant: dl("CA","ABC") == 2, osa == 3."""
    n1, n2 = len(s1), len(s2)
    if n1 == 0:
        return n2
    if n2 == 0:
        return n1
    inf = n1 + n2
    score = [[inf] * (n2 + 2) for _ in range(n1 + 2)]
    for i in range(n1 + 1):
        score[i + 1][1] = i
    for j in range(n2 + 1):
        score[1][j + 1] = j
    last_row: dict[str, int] = {}
    for i in range(1, n1 + 1):
        last_col = 0
        for j in range(1, n2 + 1):
            i1 = last_row.get(s2[j - 1], 0)
            j1 = last_col
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                last_col = j
            else:
                cost = 1
            score[i + 1][j + 1] = min(
                score[i][j] + cost,  # substitute
                score[i + 1][j] + 1,  # insert
                score[i][j + 1] + 1,  # delete
                score[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),  # transpose
            )
        last_row[s1[i - 1]] = i
    return score[n1 + 1][n2 + 1]


_SOUNDEX_MAP = {}
for _group, _d in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"), ("L", "4"), ("MN", "5"), ("R", "6")):
    for _c in _group:
        _SOUNDEX_MAP[_c] = _d


def soundex(s: str) -> str:
    """American Soundex code (letter + 3 digits) — the phonetic key
    behind stringdist's method="soundex" distance (utils.R:183; the
    distance is 0 iff codes are equal, else 1). h/w are transparent
    (do not separate equal codes); vowels separate."""
    letters = [c for c in s.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    code = letters[0]
    prev = _SOUNDEX_MAP.get(letters[0], "")
    for c in letters[1:]:
        if c in "HW":
            continue
        d = _SOUNDEX_MAP.get(c)
        if d is None:  # vowel or Y: resets adjacency
            prev = ""
            continue
        if d != prev:
            code += d
            prev = d
    return (code + "000")[:4]


def soundex_dist(s1: str, s2: str) -> float:
    return 0.0 if soundex(s1) == soundex(s2) else 1.0


def char_shingles(s: str, n: int = 3) -> set:
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# --- MinHash over character 4-shingles (blocking key family) ---
# Width 4 (not 3): the synthetic web text draws from a compact
# syllabic vocabulary, so 3-gram sets of unrelated rows overlap ~0.02
# mean / 0.09 p99 — enough to flood 2-row LSH bands under Zipf-skewed
# hosts. At width 4 random-pair jaccard drops ~5×; true pairs (few
# character edits) barely move.

_SHINGLE_N = 4


def shingle_codes(s: str) -> np.ndarray:
    """Rolling 4-gram integer codes of the utf-8 bytes (vectorized)."""
    b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < _SHINGLE_N:
        b = np.pad(b, (0, _SHINGLE_N - len(b)), constant_values=1)
    return (
        (b[:-3] << np.uint64(24))
        | (b[1:-2] << np.uint64(16))
        | (b[2:-1] << np.uint64(8))
        | b[3:]
    )


def minhash_signature(s: str, tags: np.ndarray) -> np.ndarray:
    """k-permutation MinHash: for each hash tag, min over shingles of
    splitmix64(code ^ tag). ``tags`` shape (k,) uint64."""
    codes = np.unique(shingle_codes(s))
    mixed = rng._splitmix64(codes[None, :] ^ tags[:, None])
    return mixed.min(axis=1)


def minhash_signatures_batch(texts: list[str], tags: np.ndarray) -> np.ndarray:
    """Batch MinHash: one (n, k) signature matrix for a whole batch —
    per-tag segment-mins over the concatenated shingle codes
    (``np.minimum.reduceat``), ~5× the per-row throughput. Empty/None
    texts get an all-zero signature. Identical values to
    ``minhash_signature`` per row (min is dedup-invariant)."""
    n = len(texts)
    out = np.zeros((n, len(tags)), dtype=np.uint64)
    codes_list = []
    rows = []
    for i, t in enumerate(texts):
        if t:
            codes_list.append(shingle_codes(t))
            rows.append(i)
    if not rows:
        return out
    lens = np.fromiter((len(c) for c in codes_list), dtype=np.int64, count=len(codes_list))
    allcodes = np.concatenate(codes_list)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    sub = np.empty((len(rows), len(tags)), dtype=np.uint64)
    for j in range(len(tags)):
        mixed = rng._splitmix64(allcodes ^ tags[j])
        sub[:, j] = np.minimum.reduceat(mixed, starts)
    out[np.array(rows)] = sub
    return out


def minhash_tags(k: int, seed: int = 0) -> np.ndarray:
    return rng.hash_u64(np.arange(k, dtype=np.int64), seed, rng.tag_for("minhash"))


_OPH_DENS_C = np.uint64(0xBF58476D1CE4E5B9)  # odd mixer for densify offsets

# position-independent segment polynomial hash: H(bytes[s:e]) =
# (pre[e] - pre[s]) · P⁻ˢ where pre[i] = Σ_{j<i} b_j·Pʲ (mod 2⁶⁴).
# P odd → P is invertible mod 2⁶⁴, so one prefix pass + one gather
# hashes EVERY variable-length segment of a batch buffer — no Python
# per token (the crc32-per-bigram loop this replaces was the payload
# builder's second-largest term).
_POLY_P = np.uint64(0x100000001B3)
_POLY_PINV = np.uint64(pow(0x100000001B3, -1, 2**64))
_POLY_B = 4096  # block size: P^i = powb[i % B] · heads[i // B]
_pow_cache: dict = {}


def _poly_blocks() -> tuple[np.ndarray, np.ndarray]:
    """Cached 4096-entry (P^i, P^-i) block tables. Full-length power
    arrays would pin 8× the batch text bytes per worker FOREVER (the
    cache outlives batches); the two-level scheme P^i =
    powb[i mod B]·(P^B)^(i div B) needs only these blocks plus a
    per-call heads array of len/4096 entries."""
    if "powb" not in _pow_cache:
        powb = np.empty(_POLY_B + 1, np.uint64)
        powb[0] = 1
        powb[1:] = _POLY_P
        np.multiply.accumulate(powb, out=powb)
        pinvb = np.empty(_POLY_B + 1, np.uint64)
        pinvb[0] = 1
        pinvb[1:] = _POLY_PINV
        np.multiply.accumulate(pinvb, out=pinvb)
        _pow_cache.update(powb=powb, pinvb=pinvb)
    return _pow_cache["powb"], _pow_cache["pinvb"]


def _poly_heads(n_blocks: int, step: np.uint64) -> np.ndarray:
    """(step)^j for j in [0, n_blocks) — built per call (tiny)."""
    heads = np.empty(max(n_blocks, 1), np.uint64)
    heads[0] = 1
    heads[1:] = step
    np.multiply.accumulate(heads, out=heads)
    return heads


def word_bigram_minhash(col, tags: np.ndarray) -> np.ndarray:
    """(n, len(tags)) k-min MinHash over word-BIGRAM codes, fully
    vectorized over the batch: tokens = single-space splits (empty
    tokens from doubled/trailing spaces included, mirroring
    ``str.split(' ')``), token code = segment polynomial hash (above),
    bigram code = splitmix(code_a·ODD ^ code_b). Rows with < 2 tokens
    hash their whole text as one code; empty/null rows return zeros."""
    import pyarrow as pa

    from ..bytekernels import string_view

    if isinstance(col, list):
        col = pa.array([t if t is not None else "" for t in col], pa.string())
    data, offsets = string_view(col)
    # ``data`` is the PARENT buffer (string_view is zero-copy): a
    # sliced/offset Arrow array carries bytes outside
    # [offsets[0], offsets[-1]) whose spaces would map to row -1 / n
    # (ADVICE r4), and the prefix-hash cumsum below would pay
    # O(parent) for an O(slice) input (r5 review). Compact to the
    # slice window once — a view, no copy — so everything downstream
    # is O(slice) and the positions line up by construction.
    if len(offsets) and (offsets[0] != 0 or offsets[-1] != len(data)):
        data = data[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
    n = len(offsets) - 1
    out = np.zeros((n, len(tags)), dtype=np.uint64)
    if n == 0 or len(data) == 0:
        return out
    powb, pinvb = _poly_blocks()
    L = len(data)
    nb = (L + _POLY_B - 1) // _POLY_B
    heads = _poly_heads(nb, powb[_POLY_B])
    scaled = np.zeros(nb * _POLY_B, np.uint64)
    scaled[:L] = data
    sc2 = scaled.reshape(nb, _POLY_B)
    sc2 *= powb[None, :_POLY_B]
    sc2 *= heads[:, None]
    pre = np.empty(L + 1, np.uint64)
    pre[0] = 0
    np.cumsum(scaled[:L], out=pre[1:])

    _POLY_SHIFT = _POLY_B.bit_length() - 1  # log2(_POLY_B); keeps the
    # shift coupled to the modulus below (ADVICE r4: a hardcoded 12
    # silently breaks if _POLY_B changes)

    def PINV(pos: np.ndarray) -> np.ndarray:
        inv_heads = _poly_heads(nb, pinvb[_POLY_B])
        return pinvb[pos & (_POLY_B - 1)] * inv_heads[pos >> _POLY_SHIFT]

    # slice-window compaction above guarantees offsets[0] == 0 and
    # offsets[-1] == len(data): every space found here is in-row
    sp = np.flatnonzero(data == 32)
    # global token order: starts = row starts ∪ (space+1), ends =
    # spaces ∪ row ends; at position ties a previous row's trailing
    # token precedes the next row's first (lexsort flags)
    starts = np.concatenate([offsets[:-1], sp + 1])
    s_flag = np.concatenate([np.ones(n, np.int8), np.zeros(len(sp), np.int8)])
    s_ord = np.lexsort((s_flag, starts))
    starts = starts[s_ord]
    ends = np.concatenate([sp, offsets[1:]])
    e_flag = np.concatenate([np.ones(len(sp), np.int8), np.zeros(n, np.int8)])
    e_ord = np.lexsort((e_flag, ends))
    ends = ends[e_ord]

    n_sp_row = np.bincount(
        np.searchsorted(offsets, sp, side="right") - 1, minlength=n
    )
    n_tok = 1 + n_sp_row
    row_of_tok = np.repeat(np.arange(n, dtype=np.int64), n_tok)

    seg = (pre[ends] - pre[starts]) * PINV(starts)
    tok_len = (ends - starts).astype(np.uint64)
    tc = rng._splitmix64(seg ^ tok_len * _OPH_DENS_C)

    pairable = row_of_tok[1:] == row_of_tok[:-1]
    bg = rng._splitmix64(tc[:-1] * _OPH_DENS_C ^ tc[1:])[pairable]
    bg_row = row_of_tok[:-1][pairable]
    # rows with a single token fall back to their whole-text code
    single = np.flatnonzero(n_tok == 1)
    tok_start_of_row = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    codes = np.concatenate([bg, tc[tok_start_of_row[single]]])
    rows = np.concatenate([bg_row, single])
    order = np.argsort(rows, kind="stable")
    codes, rows = codes[order], rows[order]

    seg_starts = np.flatnonzero(np.concatenate([[True], rows[1:] != rows[:-1]]))
    urows = rows[seg_starts]
    sub = np.empty((len(urows), len(tags)), dtype=np.uint64)
    for j, t in enumerate(tags):
        mixed = rng._splitmix64(codes ^ t)
        sub[:, j] = np.minimum.reduceat(mixed, seg_starts)
    out[urows] = sub
    out[offsets[1:] == offsets[:-1]] = 0  # empty/null rows
    return out


def oph_signatures_batch(col, k: int, seed: int = 0) -> np.ndarray:
    """One-permutation MinHash (Li/Owen/Zhang 2012) with rotational
    densification (Shrivastava 2017): ONE splitmix pass buckets every
    shingle code into one of ``k`` bins by its top bits and the
    per-(row, bin) min falls out of one sort + segment-min —
    O(shingles + n·k) per batch versus classic k-min's O(shingles·k).
    At 10¹²-document scale this is the difference between the payload
    stage being hash-bound or not; per-lane match probability is ≈ the
    Jaccard similarity exactly as with k independent permutations, so
    banding/est-Jaccard math downstream is unchanged.

    Empty bins copy the circularly-next filled bin's value plus
    j·ODD_C (j = circular distance), so two rows densifying the same
    bin from different distances cannot spuriously agree. Rows with no
    shingles (empty/null text) return all-zero signatures — the same
    convention as ``minhash_signatures_batch``.

    ``col`` is a pyarrow string array/chunked array (zero-copy byte
    view; the 4-byte shingle windows are computed over the whole batch
    buffer in one vectorized pass) or a list of Python strings.
    ``k`` must be a power of two ≤ 65536."""
    codes, row_of, n = batch_shingles(col)
    return oph_from_shingles(codes, row_of, n, k, seed)


def batch_shingles(col) -> tuple[np.ndarray, np.ndarray, int]:
    """Whole-batch shingle extraction: (codes, row_of, n_rows) with
    ``row_of`` sorted ascending — ONE vectorized pass over the batch
    buffer instead of a per-doc Python loop. Per-row code multisets
    are exactly ``shingle_codes(text)`` (same short-row padding), so
    any min-based signature built on them equals the per-row path."""
    import pyarrow as pa

    from ..bytekernels import string_view

    if isinstance(col, list):
        col = pa.array([t if t is not None else "" for t in col], pa.string())
    data, offsets = string_view(col)
    # ``data`` is the PARENT buffer: compact a sliced/offset view to its
    # window once so the uint64 widening and the full-buffer shingle
    # pass below cost O(slice), not O(parent) (r5 review — same fix as
    # word_bigram_minhash; positions stay consistent by construction)
    if len(offsets) and (offsets[0] != 0 or offsets[-1] != len(data)):
        data = data[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
    n = len(offsets) - 1
    if n == 0 or len(data) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64), n
    lens = offsets[1:] - offsets[:-1]

    # full-buffer 4-byte windows; valid per-row windows = offsets[i] ..
    # offsets[i+1]-4 (rows shorter than the window pad with 1s below)
    b = data.astype(np.uint64)
    if len(b) >= _SHINGLE_N:
        codes_all = (
            (b[:-3] << np.uint64(24))
            | (b[1:-2] << np.uint64(16))
            | (b[2:-1] << np.uint64(8))
            | b[3:]
        )
    else:
        codes_all = np.zeros(0, np.uint64)
    counts = np.maximum(lens - (_SHINGLE_N - 1), 0)
    short = np.flatnonzero((lens > 0) & (lens < _SHINGLE_N))
    total = int(counts.sum())
    row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    starts_rep = np.repeat(offsets[:-1], counts)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    idx = np.arange(total, dtype=np.int64) - np.repeat(cum, counts) + starts_rep
    codes = codes_all[idx]
    if len(short):
        pads = []
        for i in short:
            seg = np.pad(
                data[offsets[i] : offsets[i + 1]].astype(np.uint64),
                (0, _SHINGLE_N - int(lens[i])),
                constant_values=1,
            )
            pads.append(
                (seg[0] << np.uint64(24))
                | (seg[1] << np.uint64(16))
                | (seg[2] << np.uint64(8))
                | seg[3]
            )
        codes = np.concatenate([codes, np.array(pads, dtype=np.uint64)])
        row_of = np.concatenate([row_of, short.astype(np.int64)])
        order = np.argsort(row_of, kind="stable")
        codes, row_of = codes[order], row_of[order]
    return codes, row_of, n


def kmin_from_shingles(
    codes: np.ndarray, row_of: np.ndarray, n: int, tags: np.ndarray
) -> np.ndarray:
    """Classic k-min MinHash from a shared ``batch_shingles`` pass —
    byte-identical to ``minhash_signatures_batch`` (min over the raw
    per-row code multiset) without re-extracting shingles."""
    out = np.zeros((n, len(tags)), dtype=np.uint64)
    if not len(codes):
        return out
    seg = np.flatnonzero(np.concatenate([[True], row_of[1:] != row_of[:-1]]))
    urows = row_of[seg]
    sub = np.empty((len(urows), len(tags)), dtype=np.uint64)
    for j in range(len(tags)):
        mixed = rng._splitmix64(codes ^ tags[j])
        sub[:, j] = np.minimum.reduceat(mixed, seg)
    out[urows] = sub
    return out


def oph_from_shingles(
    codes: np.ndarray, row_of: np.ndarray, n: int, k: int, seed: int = 0
) -> np.ndarray:
    """OPH core over a shared ``batch_shingles`` pass (see
    ``oph_signatures_batch``)."""
    assert k & (k - 1) == 0 and k <= 65536
    shift = np.uint64(64 - int(k).bit_length() + 1)
    tag = rng.hash_u64(np.arange(1, dtype=np.int64), seed, rng.tag_for("oph"))[0]
    out = np.zeros((n, k), dtype=np.uint64)
    if not len(codes):
        return out
    h = rng._splitmix64(codes ^ tag)
    bins = (h >> shift).astype(np.int64)
    key = row_of * k + bins
    order = np.argsort(key, kind="stable")
    sk, sv = key[order], h[order]
    seg = np.flatnonzero(np.concatenate([[True], sk[1:] != sk[:-1]]))
    mins = np.minimum.reduceat(sv, seg)
    ukeys = sk[seg]

    EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)
    M = np.full((n, k), EMPTY, dtype=np.uint64)
    M[ukeys // k, ukeys % k] = mins

    filled = M != EMPTY
    has_any = filled.any(axis=1)
    # circular next-filled-bin index via a doubled suffix-min scan
    bpos = np.arange(k, dtype=np.int64)
    BIG = np.int64(4 * k)
    base = np.where(filled, bpos[None, :], BIG)
    D = np.concatenate([base, np.where(filled, bpos[None, :] + k, BIG)], axis=1)
    nxt = np.minimum.accumulate(D[:, ::-1], axis=1)[:, ::-1][:, :k]
    rows_ok = np.flatnonzero(has_any)
    if len(rows_ok):
        nx = nxt[rows_ok]
        j = (nx - bpos[None, :]).astype(np.uint64)
        src = nx % k
        vals = M[rows_ok[:, None], src] + j * _OPH_DENS_C
        out[rows_ok] = vals
    return out


def minhash_bytes(s: str, tags: np.ndarray) -> np.ndarray:
    """Byte-packed k-wide MinHash signature (lowest byte of each
    minhash). est-Jaccard(a, b) = mean(bytes equal) − 1/256 collision
    bias; with k=128 the estimator std is ≈ sqrt(j(1-j)/128) ≤ 0.045 —
    tight enough to decide matches outside a narrow gray zone without
    touching the texts."""
    return (minhash_signature(s, tags) & np.uint64(0xFF)).astype(np.uint8)


def char_shingles4(s: str) -> set:
    return char_shingles(s, _SHINGLE_N)
