"""Vectorized byte-level kernels over Arrow string columns.

An Arrow string column already IS the concatenated utf-8 byte stream
plus an offsets vector — these kernels work on that zero-copy view, so
per-row cost is a numpy mask / cumsum, never a Python loop over
characters (the round-1 per-byte FNV loop ran at ~MB/s/core; these run
at memory bandwidth). Hashing uses zlib.crc32 (C speed) — content
hashes only need determinism + 64-bit collision resistance, not a
specific hash family.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def split_tokens(col: "pa.ChunkedArray | pa.Array") -> "tuple[pa.Array, np.ndarray]":
    """Whitespace split with SQL NULL semantics: a NULL text yields
    ZERO tokens — lens 0 and nothing in the flat stream — exactly like
    ``unnest(string_split(NULL, ' '))``. Without the fill, a null
    slot's length reads NaN, ``astype(int64)`` turns it INT64_MIN, and
    ``np.repeat(ids, lens)`` crashes the whole stage on the first
    null-text doc (r5 review — this hit every token stage in
    tfidf/stats). ``pc.list_flatten`` skips null list slots, so
    ``np.repeat(x, lens)`` stays aligned with the flat token stream by
    construction. Returns (split_list_array, lens int64 ndarray)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    split = pc.split_pattern(col, " ")
    lens = (
        pc.fill_null(pc.list_value_length(split), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return split, lens


def string_view(col: "pa.ChunkedArray | pa.Array") -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data_bytes, offsets) view of a utf-8 string column.
    ``offsets`` has len(col)+1 int64 entries indexing into ``data``.
    Null entries span zero bytes (same as empty strings)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offsets = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    buf = col.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.zeros(0, np.uint8)
    return data, offsets


def binary_matrix(col, dtype=np.uint8) -> np.ndarray:
    """Equal-width binary column → (n_rows, width) matrix on the raw
    Arrow data buffer (zero-copy slice — no Python object per row).
    Every value must have the same byte length; ``dtype`` reinterprets
    the row bytes (e.g. np.uint16 lanes)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, 0), dtype=dtype)
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offsets = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ]
    raw = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    mat = raw[offsets[0] : offsets[-1]].reshape(len(col), -1)
    return mat if dtype is np.uint8 else mat.view(dtype)


def content_hash64(col) -> np.ndarray:
    """Deterministic positive-int64 content hash per row: crc32 of the
    row bytes packed with crc32 of the *reversed* row bytes into 63
    bits. The two passes are structurally independent — CRC is affine
    in the message, so a forward collision needs m1^m2 to be a
    polynomial multiple, and the reversed pass needs rev(m1^m2) to be
    one too; a reseeded CRC would NOT add bits (the seed term cancels
    for equal lengths). The whole buffer is reversed once (vectorized);
    each crc is C-speed over a memoryview slice — no Python byte loops.
    """
    data, offsets = string_view(col)
    mv = memoryview(data)
    rmv = memoryview(data[::-1].copy())
    total = len(data)
    n = len(offsets) - 1
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        s, e = offsets[i], offsets[i + 1]
        c1 = zlib.crc32(mv[s:e])
        c2 = zlib.crc32(rmv[total - e : total - s])
        out[i] = ((c1 << 32) | c2) >> 1
    return out


def content_hash64_nullsafe(col) -> np.ndarray:
    """``content_hash64`` with SQL NULL semantics: a NULL slot hashes
    to its OWN group, distinct from ``''`` and from every real text.
    ``string_view`` sees a null slot as a zero-byte span, so the plain
    hash silently merges NULL-text and empty-text docs — diverging
    from a SQL twin that keeps them as separate groups (r5 review).
    Collision bound: a real text equal to the two-control-byte
    sentinel (negligible; document per CLAUDE.md rule 17)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "\x01\x00")
    return content_hash64(col)


def _per_row_counts(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a byte mask via cumulative sum + offset gather
    (robust to empty rows, unlike add.reduceat)."""
    cs = np.zeros(len(mask) + 1, dtype=np.int64)
    np.cumsum(mask, out=cs[1:])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def char_class_counts(col) -> dict[str, np.ndarray]:
    """Per-row counts of ASCII digits / spaces / letters — byte-level,
    so semantics match the SQL regexes [0-9], ' ', [a-zA-Z] exactly
    (utf-8 continuation bytes can never alias an ASCII class)."""
    data, offsets = string_view(col)
    digit = (data >= 48) & (data <= 57)
    space = data == 32
    lower = data | 0x20
    alpha = (lower >= 97) & (lower <= 122) & (data < 128)
    return {
        "n_digits": _per_row_counts(digit, offsets),
        "n_spaces": _per_row_counts(space, offsets),
        "n_alpha": _per_row_counts(alpha, offsets),
    }


def token_count_kernels(col) -> dict[str, np.ndarray]:
    """Per-row token/char counts matching the round-1 Python semantics:

    - ``n_tokens``  = spaces + 1 for non-empty text; 0 for empty/null
      (deliberately NOT Python's len("".split(" ")) == 1 — the SQL
      twin carries the matching CASE)
    - ``n_bpe_tokens`` = len(findall([a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]))
      with ASCII ``\\s`` ([ \\t\\n\\r\\f\\v]) — the DuckDB/RE2 oracle
      semantics, not Python's unicode ``\\s``
    - ``n_chars``   = unicode char count (bytes − continuation bytes)
    """
    data, offsets = string_view(col)
    nbytes = offsets[1:] - offsets[:-1]
    space = data == 32
    n_spaces = _per_row_counts(space, offsets)
    n_tokens = np.where(nbytes > 0, n_spaces + 1, 0)

    continuation = (data & 0xC0) == 0x80
    n_chars = nbytes - _per_row_counts(continuation, offsets)

    digit = (data >= 48) & (data <= 57)
    lower = data | 0x20
    alpha = (lower >= 97) & (lower <= 122) & (data < 128)
    # \s = space, \t..\r (9-13)
    ws = space | ((data >= 9) & (data <= 13))
    # a non-ASCII *char* matches [^a-zA-Z0-9\s] once → count lead bytes only
    other = ~alpha & ~digit & ~ws & ~continuation
    # alpha-run starts: alpha byte not preceded by an alpha byte — with
    # run breaks forced at row boundaries
    prev_alpha = np.empty_like(alpha)
    if len(alpha):
        prev_alpha[0] = False
        prev_alpha[1:] = alpha[:-1]
    run_start = alpha & ~prev_alpha
    row_starts = offsets[:-1][offsets[:-1] < len(data)]
    run_start[row_starts] = alpha[row_starts]
    n_bpe = (
        _per_row_counts(run_start, offsets)
        + _per_row_counts(digit, offsets)
        + _per_row_counts(other, offsets)
    )
    return {"n_tokens": n_tokens, "n_bpe_tokens": n_bpe, "n_chars": n_chars}
