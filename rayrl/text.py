"""Text-analysis stages for large-scale training-data pipelines:
language ID, quality scoring, token counting, fingerprinting. All are
stateless-or-actor ``map_batches`` stages over the ``documents`` table
(or any table with a text column)."""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

import ray.data


def _read_docs(sf_dir: str, columns):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_counts(sf_dir: str):
    """Per-doc token/char counts. ``n_tokens`` = single-space split
    (SQL-oracle-compatible); ``n_bpe_tokens`` = a BPE-ish regex token
    count (word pieces + digits + punctuation singles). Vectorized
    byte-level over the Arrow string buffers (rayrl.bytekernels)."""
    from .bytekernels import token_count_kernels

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        k = token_count_kernels(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(k["n_tokens"], pa.int64()),
                "n_bpe_tokens": pa.array(k["n_bpe_tokens"], pa.int64()),
                "n_chars": pa.array(k["n_chars"], pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def char_class_counts(sf_dir: str):
    """Integer character-class counts per doc (digits / spaces /
    alpha) — the SQL-safe core of quality scoring. Byte-level masks
    over the Arrow buffers, matching the oracle regexes exactly."""
    from .bytekernels import char_class_counts as _ccc

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        k = _ccc(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_digits": pa.array(k["n_digits"], pa.int64()),
                "n_spaces": pa.array(k["n_spaces"], pa.int64()),
                "n_alpha": pa.array(k["n_alpha"], pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


class QualityScorer:
    """Actor-pool stage: heuristic quality score per doc (length,
    stopword ratio, repetition) — the web-pipeline quality-filter
    shape (stopword set + compiled regex built once per actor).

    Outputs are UNROUNDED doubles whose arithmetic mirrors the DuckDB
    oracle expression term-for-term (same division, same left-assoc
    additions), so the two engines produce bit-identical values —
    rounding would reintroduce half-even-vs-half-away divergence."""

    STOPWORDS = {"the", "a", "and", "of", "to", "in", "is", "for", "on", "with"}

    def __init__(self):
        self.word = re.compile(r"[a-z]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        scores, stop_ratios, rep_ratios = [], [], []
        for t in texts:
            toks = self.word.findall((t or "").lower())
            n = len(toks)
            if n == 0:
                scores.append(0.0)
                stop_ratios.append(0.0)
                rep_ratios.append(1.0)
                continue
            stop = sum(tok in self.STOPWORDS for tok in toks) / n
            uniq = len(set(toks)) / n
            score = 0.4 * min(1.0, n / 20.0) + 0.3 * min(1.0, stop * 5) + 0.3 * uniq
            scores.append(score)
            stop_ratios.append(stop)
            rep_ratios.append(1 - uniq)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "quality": pa.array(scores, pa.float64()),
                "stop_ratio": pa.array(stop_ratios, pa.float64()),
                "repetition": pa.array(rep_ratios, pa.float64()),
            }
        )


def quality_scores(sf_dir: str):
    # autoscaling actor pool (1..16): sizes itself to the cluster
    # instead of the round-1 hardcoded concurrency=2
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 16)
    )


class LangId:
    """Actor-pool stage: n-gram-profile language ID heuristic. Profiles
    (top character bigrams per language) are built once per actor from
    small seed text — a stand-in for a fasttext-style model load.

    The batch path is fully vectorized (round-3 fix, VERDICT r2 #4):
    one byte-pair weight-table gather over the zero-copy Arrow buffer
    per language + a cumsum row-sum — no per-character Python. The
    scalar ``classify`` is kept as the reference implementation the
    parity test checks the kernel against. Only [a-z][a-z] byte pairs
    can score (non-ascii bigrams all carry weight 0 in the profiles, so
    byte-pair == char-bigram semantics here)."""

    PROFILES = {
        "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
        "de": ["en", "er", "ch", "de", "ei", "nd", "te", "in", "ie", "ge"],
        "fr": ["es", "le", "de", "en", "on", "re", "nt", "ou", "ai", "ur"],
        "es": ["de", "en", "el", "la", "os", "es", "ar", "ue", "ra", "as"],
        "zh": [],  # non-latin → fallback bucket
    }

    def __init__(self):
        import numpy as np

        self.weights = {
            lang: {bg: len(prof) - i for i, bg in enumerate(prof)}
            for lang, prof in self.PROFILES.items()
        }
        # (n_langs, 26*26+1) uint8 weight table on byte-pair codes; the
        # last entry is the invalid-pair sentinel (weight 0)
        self.W = np.zeros((len(self.PROFILES), 26 * 26 + 1), dtype=np.uint8)
        for li, prof in enumerate(self.PROFILES.values()):
            for i, bg in enumerate(prof):
                self.W[li, (ord(bg[0]) - 97) * 26 + (ord(bg[1]) - 97)] = len(prof) - i
        self.langs = np.array(list(self.PROFILES.keys()), dtype="U3")

    def classify(self, text: str) -> str:
        t = (text or "").lower()
        if not t:
            return "und"
        non_ascii = sum(ord(c) > 127 for c in t)
        if non_ascii / max(1, len(t)) > 0.3:
            return "zh"
        bigrams: dict[str, int] = {}
        for i in range(len(t) - 1):
            bg = t[i : i + 2]
            if bg.isalpha():
                bigrams[bg] = bigrams.get(bg, 0) + 1
        best, best_score = "und", 0
        for lang, w in self.weights.items():
            score = sum(cnt * w.get(bg, 0) for bg, cnt in bigrams.items())
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from .bytekernels import _per_row_counts, string_view

        col = pc.utf8_lower(batch.column("text").combine_chunks())
        data, offsets = string_view(col)
        n = len(offsets) - 1
        nbytes = offsets[1:] - offsets[:-1]
        continuation = (data & 0xC0) == 0x80
        n_chars = nbytes - _per_row_counts(continuation, offsets)
        non_ascii = _per_row_counts(data >= 0xC0, offsets)  # multi-byte lead = 1 char
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(data) >= 2:
            # alpha iff (byte - 97) wraps to <= 25 — one uint8 pass
            x = data - np.uint8(97)
            va = x <= 25
            valid = va[:-1] & va[1:]
            brk = offsets[1:-1] - 1  # pairs straddling a row boundary
            brk = brk[(brk >= 0) & (brk < len(valid))]
            valid[brk] = False
            codes = x[:-1].astype(np.uint16) * 26 + x[1:]
            codes[~valid] = 26 * 26  # sentinel → weight 0
            o = np.minimum(offsets, len(valid))  # pair p spans bytes (p, p+1)
            cs = np.zeros(len(valid) + 1, dtype=np.int64)
            for li in range(len(self.langs)):
                np.cumsum(self.W[li][codes], out=cs[1:])
                scores[:, li] = cs[o[1:]] - cs[o[:-1]]
        best_idx = np.argmax(scores, axis=1)  # first max = dict order, like classify
        best_val = scores[np.arange(n), best_idx]
        preds = np.where(best_val > 0, self.langs[best_idx], "und")
        ratio = non_ascii / np.maximum(1, n_chars)
        preds = np.where(ratio > 0.3, "zh", preds)
        preds = np.where(n_chars == 0, "und", preds)
        return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(preds.tolist(), pa.string())})


def lang_id(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 16)
    )


def doc_fingerprints(sf_dir: str):
    """Deterministic 64-bit content fingerprint per document —
    content-addressable id for exact dedup at scale. C-speed crc pair
    over the zero-copy Arrow byte view (rayrl.bytekernels)."""
    from .bytekernels import content_hash64

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        h = content_hash64(batch.column("text"))
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(h, pa.int64())})

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


WINNOW_K = 8  # k-gram length (bytes)
WINNOW_W = 16  # winnowing window (k-grams)


def winnow_doc(data: "object", k: int = WINNOW_K, w: int = WINNOW_W):
    """Winnowed fingerprints of one byte string (Schleimer et al.,
    SIGMOD'03 robust winnowing): rolling polynomial hash per k-gram,
    then the rightmost-minimum hash of each window of w consecutive
    k-grams, deduplicated by position. Guarantee: any shared substring
    of length ≥ w+k−1 between two docs yields a shared fingerprint.
    Vectorized within the doc: the k-gram hashes are k shift-multiply
    passes and the window minimum is a prefix/suffix block min (no
    per-position Python)."""
    import numpy as np

    b = np.frombuffer(data if isinstance(data, bytes) else str(data).encode(), dtype=np.uint8)
    if len(b) < k:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    n = len(b) - k + 1
    P = np.uint64(0x100000001B3)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * P + b[j : j + n]
    h = (h ^ (h >> np.uint64(31))) * np.uint64(0x9E3779B97F4A7C15)
    if n <= w:
        pos = int(n - 1 - np.argmin(h[::-1]))  # rightmost min
        return np.array([pos], np.int64), h[pos : pos + 1].view(np.int64)
    m = n - w + 1  # number of windows
    # rightmost window minimum via reversed prefix/suffix block mins
    r = h[::-1]
    nb = (len(r) + w - 1) // w
    pad = np.full(nb * w, np.iinfo(np.uint64).max, dtype=np.uint64)
    pad[: len(r)] = r
    blocks = pad.reshape(nb, w)
    pre = np.minimum.accumulate(blocks, axis=1).reshape(-1)
    suf = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].reshape(-1)
    idx = np.arange(m)
    rev_start = len(r) - w - idx  # window [rev_start, rev_start+w) in r
    wmin = np.minimum(suf[rev_start], pre[rev_start + w - 1])
    # rightmost occurrence in the original = first occurrence in r
    first = np.zeros(m, dtype=np.int64)
    # find position of wmin in the window: scan via argmax of equality
    # on the reversed array using a strided view (w is small)
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(r, w)[rev_start]
    first = np.argmax(win == wmin[:, None], axis=1)
    pos = len(h) - 1 - (rev_start + first)
    keep = np.ones(m, dtype=bool)
    keep[1:] = pos[1:] != pos[:-1]
    pos = pos[keep]
    return pos.astype(np.int64), h[pos].view(np.int64)


def winnow_batch(col, k: int = WINNOW_K, w: int = WINNOW_W):
    """Batch-vectorized winnowing over an Arrow string column: ONE set
    of numpy passes fingerprints every document in the batch at once
    (k shift-multiply passes over the concatenated bytes, then w
    gather/min passes over all windows of all docs together), instead
    of ~15 small numpy calls per document — the per-doc overhead was
    ~1 ms/doc at 500k docs (winnow_doc loop). Docs whose k-gram count
    is ≤ w (or shorter than k) fall back to the scalar
    :func:`winnow_doc`, which stays the reference implementation the
    parity test checks this kernel against.

    Returns (row_idx, pos, fp) int64 arrays, rows in batch order,
    positions ascending within a row — byte-identical to calling
    winnow_doc per row."""
    import numpy as np

    from .bytekernels import string_view

    data, offsets = string_view(col)
    n_rows = len(offsets) - 1
    nbytes = (offsets[1:] - offsets[:-1]).astype(np.int64)
    ngrams = np.maximum(nbytes - k + 1, 0)
    big = ngrams > w  # vectorized path
    out_row, out_pos, out_fp = [], [], []

    if big.any():
        # --- k-gram hashes for every position of every big doc
        starts = offsets[:-1].astype(np.int64)
        g_cnt = np.where(big, ngrams, 0)
        g_doc = np.repeat(np.arange(n_rows, dtype=np.int64), g_cnt)
        g_local = np.arange(int(g_cnt.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(g_cnt) - g_cnt, g_cnt
        )
        g_byte = starts[g_doc] + g_local
        P = np.uint64(0x100000001B3)
        h = np.zeros(len(g_byte), dtype=np.uint64)
        for j in range(k):
            h = h * P + data[g_byte + j]
        h = (h ^ (h >> np.uint64(31))) * np.uint64(0x9E3779B97F4A7C15)

        # --- all windows of all big docs: rightmost window minimum
        m_cnt = np.where(big, ngrams - w + 1, 0)
        w_doc = np.repeat(np.arange(n_rows, dtype=np.int64), m_cnt)
        w_local = np.arange(int(m_cnt.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(m_cnt) - m_cnt, m_cnt
        )
        hstart = np.concatenate([[0], np.cumsum(g_cnt)])[:-1]
        ws = hstart[w_doc] + w_local  # window start in hash space
        wmin = h[ws].copy()
        for j in range(1, w):
            np.minimum(wmin, h[ws + j], out=wmin)
        bj = np.zeros(len(ws), dtype=np.int64)
        for j in range(1, w):
            np.copyto(bj, j, where=h[ws + j] == wmin)  # rightmost match
        pos_flat = w_local + bj  # k-gram index within the doc
        # dedup consecutive repeats per doc (first window always kept)
        keep = np.ones(len(ws), dtype=bool)
        if len(ws) > 1:
            same_doc = w_doc[1:] == w_doc[:-1]
            keep[1:] = ~(same_doc & (pos_flat[1:] == pos_flat[:-1]))
        out_row.append(w_doc[keep])
        out_pos.append(pos_flat[keep])
        out_fp.append(h[hstart[w_doc[keep]] + pos_flat[keep]].view(np.int64))

    # --- scalar fallback for short docs
    for i in np.nonzero(~big & (nbytes >= k))[0]:
        p, f = winnow_doc(bytes(data[offsets[i] : offsets[i + 1]]), k, w)
        out_row.append(np.full(len(p), i, dtype=np.int64))
        out_pos.append(p)
        out_fp.append(f)

    if not out_row:
        e = np.zeros(0, np.int64)
        return e, e.copy(), e.copy()
    row = np.concatenate(out_row)
    pos = np.concatenate(out_pos)
    fp = np.concatenate(out_fp)
    order = np.lexsort((pos, row))  # batch order, positions ascending
    return row[order], pos[order], fp[order]


def winnow_fingerprints(sf_dir: str, k: int = WINNOW_K, w: int = WINNOW_W):
    """Rolling-hash document fingerprints (winnowing) — the
    plagiarism/near-dup fingerprint set per doc, exploded to
    (doc_id, pos, fp) rows. Per-doc vectorized kernel inside a
    stateless map_batches; output is a narrow int table (the shape a
    fingerprint-index join would consume)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        row, pos, f = winnow_batch(batch.column("text").combine_chunks(), k, w)
        return pa.table(
            {
                "doc_id": pa.array(ids[row], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "fp": pa.array(f, pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


DUPSPAN_BROADCAST_MAX = 50_000_000  # dup fp count; int64 array broadcast


def duplicated_spans(
    sf_dir: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    broadcast_gate: int = DUPSPAN_BROADCAST_MAX,
    emit_counts: bool = False,
):
    """(doc_id, n_fps, dup_span_frac): per-document cross-document
    substring-duplication signal — the fraction of a doc's winnowed
    fingerprints that also occur in at least one OTHER document. The
    distributed stand-in for Lee et al. 2022's exact-substring dedup
    ("Deduplicating Training Data Makes Language Models Better"): a
    shared fingerprint certifies a shared substring of length ≥ w+k−1
    bytes, so docs dominated by copied spans (mirrors, syndication,
    quote farms) score near 1 and are dropped or trimmed upstream of
    training.

    Scale shape: the text is winnowed exactly ONCE — the per-doc
    DISTINCT (doc_id, fp, in-doc-repeat) occurrence stream (ints,
    ~17 B/row) materializes and every later stage reads it, not the
    text. Counts reduce from per-batch partials over that stream
    (fingerprint-vocabulary-sized); the dup-fp set (seen in ≥2 docs or
    twice in one) broadcasts as ONE sorted int64 array below the gate
    — above it, a bucketed int join attaches the flags instead
    (path-equivalence-tested, gate forced to 0) — and a final narrow
    doc-keyed reduce assembles per-doc fractions (one row per
    (block, doc) goes in, so it moves ≈doc-count rows). Docs shorter
    than k bytes have no fingerprints and are omitted."""
    import numpy as np

    from .shuffle import bucketed_join, group_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def occ(batch: pa.Table) -> pa.Table:
        """ONE winnow pass → per-doc distinct (doc_id, fp, rep) rows
        (batched kernel; the per-doc distinct falls out of one lexsort
        over (row, fp))."""
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        row, _pos, f = winnow_batch(batch.column("text").combine_chunks(), k, w)
        if not len(row):  # every doc sub-k: no fingerprints
            e = pa.array([], pa.int64())
            return pa.table({"doc_id": e, "fp": e, "rep": pa.array([], pa.int8())})
        order = np.lexsort((f, row))
        row, f = row[order], f[order]
        first = np.ones(len(row), dtype=bool)
        first[1:] = (row[1:] != row[:-1]) | (f[1:] != f[:-1])
        # rep: a (row, fp) run longer than 1 → in-doc repeat
        run_end = np.append(np.nonzero(first)[0][1:], len(row))
        run_len = np.diff(np.concatenate([[0], run_end]))
        return pa.table(
            {
                "doc_id": pa.array(ids[row[first]], pa.int64()),
                "fp": pa.array(f[first], pa.int64()),
                "rep": pa.array((run_len > 1).astype(np.int8), pa.int8()),
            }
        )

    occ_ds = ds.map_batches(
        occ, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def freq_partial(batch: pa.Table) -> pa.Table:
        f = batch.column("fp").to_numpy(zero_copy_only=False)
        r = batch.column("rep").to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(f, return_inverse=True)
        nd = np.bincount(inv, minlength=len(u)).astype(np.int64)
        nrep = np.bincount(inv, weights=r, minlength=len(u)).astype(np.int64)
        return pa.table({"fp": pa.array(u), "nd": pa.array(nd), "rep": pa.array(nrep)})

    freq = group_agg(
        occ_ds.map_batches(freq_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"],
        {"nd": ("nd", "sum"), "rep": ("rep", "sum")},
    ).materialize()

    def _is_dup(nd: np.ndarray, rep: np.ndarray) -> np.ndarray:
        return (nd >= 2) | (rep >= 1)

    # count of dup fps is ≤ vocab; broadcast the sorted dup array
    def dup_only(b: "pa.Table") -> pa.Table:
        nd = b.column("nd").to_numpy(zero_copy_only=False)
        rep = b.column("rep").to_numpy(zero_copy_only=False)
        return b.select(["fp"]).filter(pa.array(_is_dup(nd, rep)))

    # materialized: count() gates the plan and iter_batches/join then
    # consume it — unmaterialized, the dup filter over the freq table
    # ran twice (r5 review; the double-scan barrier rule)
    dup_tbl = freq.map_batches(
        dup_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if dup_tbl.count() <= broadcast_gate:
        parts = [
            b.column("fp").to_numpy()
            for b in dup_tbl.iter_batches(batch_format="pyarrow")
        ]
        dup = np.sort(np.concatenate(parts)) if parts else np.array([], np.int64)
        ref = ray.put(dup)

        def flag_broadcast(batch: pa.Table) -> pd.DataFrame:
            # membership covers in-doc repeats too: a fp repeated
            # inside a doc has global rep ≥ 1 and is in dup_arr.
            # COMBINER: emit per-(block, doc) partial sums, not one row
            # per occurrence — the doc reduce moves ≈doc-count rows.
            dup_arr = ray.get(ref)
            f = batch.column("fp").to_numpy(zero_copy_only=False)
            d = batch.column("doc_id").to_numpy(zero_copy_only=False)
            hit = (
                np.searchsorted(dup_arr, f, side="right")
                - np.searchsorted(dup_arr, f, side="left")
            ).astype(np.int64)
            u, inv = np.unique(d, return_inverse=True)
            return pd.DataFrame(
                {
                    "doc_id": u,
                    "hits": np.bincount(inv, weights=hit).astype(np.int64),
                    "n": np.bincount(inv).astype(np.int64),
                }
            )

        flagged = occ_ds.map_batches(
            flag_broadcast, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        # drop occ's per-doc rep flag first: freq's global "rep" is the
        # one the dup rule needs (and the names would collide)
        joined = bucketed_join(occ_ds.drop_columns(["rep"]), freq, ["fp"])

        def flag_join(df: pd.DataFrame) -> pd.DataFrame:
            is_dup = _is_dup(
                df["nd"].to_numpy(np.int64), df["rep"].to_numpy(np.int64)
            ).astype(np.int64)
            g = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "hits": is_dup})
            out = g.groupby("doc_id", sort=False, as_index=False).agg(
                hits=("hits", "sum"), n=("hits", "size")
            )
            return out

        flagged = joined.map_batches(flag_join, batch_format="pandas")

    per_doc = group_agg(
        flagged,
        ["doc_id"],
        {"hits": ("hits", "sum"), "n_fps": ("n", "sum")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nf = df["n_fps"].to_numpy(np.int64)
        if emit_counts:  # int-only surface for the exact-oracle twin
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "n_fps": nf,
                    "n_dup_fps": df["hits"].to_numpy(np.int64),
                }
            )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_fps": nf,
                "dup_span_frac": np.round(
                    df["hits"].to_numpy(np.float64) / np.maximum(nf, 1), 4
                ),
            }
        )

    return per_doc.map_batches(finish, batch_format="pandas")


def duplicated_spans_exact(sf_dir: str, k: int = WINNOW_K):
    """Exact-oracle twin of :func:`duplicated_spans` (round 4): with
    window ``w=1`` robust winnowing selects EVERY k-gram position (the
    rightmost minimum of a 1-element window is that element), so the
    per-doc distinct-fingerprint stream is exactly the doc's distinct
    byte k-grams and DuckDB can reproduce the whole pipeline by
    enumerating substrings — verifying the occurrence emit, the
    fingerprint-frequency reduce, the dup rule (seen in ≥2 docs or ≥2×
    in one doc), and the per-doc assembly. The engine groups by the
    64-bit rolling hash of the gram while the oracle groups by the
    gram VALUE — identical partitions up to hash collisions
    (CLAUDE.md rule 17; P ≈ grams²/2⁶⁴ at test scale). Output is
    int-only (doc_id, n_fps, n_dup_fps): no float hash-compare
    surface. The documents fixture is ASCII (asserted by the oracle's
    byte/char equivalence: substr positions == byte positions).
    Production configs stay ``duplicated_spans`` (w=16, winnowed
    sample); this twin's per-position stream is test-scale evidence
    for the shared kernel, not a scale path."""
    return duplicated_spans(sf_dir, k=k, w=1, emit_counts=True)


DUPLICATED_SPANS_EXACT_ORACLE = f"""
    WITH pos AS (
        SELECT doc_id, text,
               unnest(range(1, length(text) - {WINNOW_K - 2})) AS i
        FROM documents
    ),
    occ AS (
        SELECT doc_id, substr(text, CAST(i AS INT), {WINNOW_K}) AS g,
               CASE WHEN count(*) > 1 THEN 1 ELSE 0 END AS rep
        FROM pos GROUP BY doc_id, g
    ),
    freq AS (
        SELECT g, count(*) AS nd, sum(rep) AS srep FROM occ GROUP BY g
    )
    SELECT o.doc_id,
           CAST(count(*) AS BIGINT) AS n_fps,
           CAST(sum(CASE WHEN f.nd >= 2 OR f.srep >= 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_fps
    FROM occ o JOIN freq f ON o.g = f.g
    GROUP BY o.doc_id
"""


CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def chunk_documents(
    sf_dir: str, chunk_tokens: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP
):
    """(doc_id, chunk_id, n_tokens, chunk): overlapping token-window
    chunks — the RAG / embedding-pipeline splitter (every doc becomes
    ⌈n/stride⌉ windows of ``chunk_tokens`` tokens advancing by
    stride = chunk_tokens − overlap, last window ragged).

    Scale shape: fully Arrow-vectorized, zero Python per row — chunks
    are emitted BY ORDINAL: iteration j slices window j from every doc
    that has one (`pc.list_slice` + `pc.binary_join`), so the loop runs
    max-chunks-per-doc times (tiny), not rows times. Single-space join
    of a single-space split is the identity, so chunk texts are exact
    substrings. Stateless map_batches; no shuffle."""
    stride = chunk_tokens - overlap
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from .bytekernels import split_tokens

        # null-safe split: a NULL doc has ZERO tokens and emits NO
        # chunks — the old all-ones j=0 mask let the NaN length through
        # and emitted a spurious (chunk_id=0, NULL, NULL) row the
        # oracle's generate_series never produces (r5 review). Real
        # docs always have lens ≥ 1 ('' splits to ['']), so the
        # uniform `lens > start` gate changes nothing for them.
        split, lens = split_tokens(batch.column("text"))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        out = []
        j = 0
        while True:
            start = j * stride
            mask = lens > start
            if not mask.any():
                break
            sel = pa.array(np.nonzero(mask)[0])
            sliced = pc.list_slice(split.take(sel), start, start + chunk_tokens)
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids[mask]),
                        "chunk_id": pa.array(
                            np.full(int(mask.sum()), j, dtype=np.int64)
                        ),
                        "n_tokens": pc.list_value_length(sliced).cast(pa.int64()),
                        "chunk": pc.binary_join(sliced, " "),
                    }
                )
            )
            j += 1
        return pa.concat_tables(out) if out else pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)


def _chunk_oracle() -> str:
    s = CHUNK_TOKENS - CHUNK_OVERLAP
    return f"""
    WITH t AS (
        -- NULL docs chunk to NOTHING (engine: zero tokens, no
        -- windows); without the guard, greatest(NULL-1, 0) = 0 emits
        -- a spurious all-NULL chunk-0 row
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL
    ), c AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, greatest(len(toks) - 1, 0), {s})) AS start
        FROM t
    )
    SELECT doc_id,
           CAST(start / {s} AS BIGINT) AS chunk_id,
           CAST(least(start + {CHUNK_TOKENS}, len(toks)) - start AS BIGINT) AS n_tokens,
           array_to_string(toks[start + 1 : least(start + {CHUNK_TOKENS}, len(toks))], ' ') AS chunk
    FROM c
    """


CHUNK_DOCUMENTS_ORACLE = _chunk_oracle()


class RepetitionScorer:
    """Actor-pool stage: Gopher-style repetition filters per doc (Rae
    et al. 2021 §A1.1 shapes): duplicate-line fraction, duplicate-word
    fraction, and top-word mass fraction — the signals that drop
    boilerplate / spam pages from a web corpus. Regex compiled once
    per actor; every ratio mirrors the DuckDB oracle's expression
    term-for-term (same divisions, same CASE fallbacks) so the
    unrounded doubles compare exactly."""

    def __init__(self):
        self.word = re.compile(r"[a-z]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_lines, n_uniq_lines, dup_line = [], [], []
        top_word, dup_word, n_toks_out = [], [], []
        for t in batch.column("text").to_pylist():
            t = t or ""
            lines = [x for x in t.split("\n") if len(x) > 0]
            nl, nul = len(lines), len(set(lines))
            n_lines.append(nl)
            n_uniq_lines.append(nul)
            dup_line.append(0.0 if nl == 0 else 1 - nul / nl)
            toks = self.word.findall(t.lower())
            n = len(toks)
            n_toks_out.append(n)
            if n == 0:
                top_word.append(0.0)
                dup_word.append(0.0)
                continue
            counts: dict[str, int] = {}
            for tok in toks:
                counts[tok] = counts.get(tok, 0) + 1
            top_word.append(max(counts.values()) / n)
            dup_word.append(1 - len(counts) / n)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_uniq_lines": pa.array(n_uniq_lines, pa.int64()),
                "dup_line_frac": pa.array(dup_line, pa.float64()),
                "n_toks": pa.array(n_toks_out, pa.int64()),
                "top_word_frac": pa.array(top_word, pa.float64()),
                "dup_word_frac": pa.array(dup_word, pa.float64()),
            }
        )


def repetition_scores(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        RepetitionScorer, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 16)
    )


# PII patterns: RE2-compatible subset (no lookaround, no backrefs) so
# Python `re` and DuckDB produce identical non-overlapping match sets.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    ("phone", r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"),
)


class PiiScanner:
    """Actor-pool stage: PII detection + redaction per doc — the
    compliance pass every web-scale training corpus runs. Counts each
    pattern on the ORIGINAL text (independent, mirroring the oracle's
    per-pattern regexp_extract_all), then redacts in the fixed order
    email → ipv4 → phone (ipv4 before phone so dotted quads are
    claimed by the more specific tag). Patterns compiled once per
    actor. The benchmark corpus is digit-free word soup, so the
    sf-fixture result is the all-clean row set — the planted-PII
    pytest (`test_text_ops`) is where the semantics are exercised."""

    def __init__(self):
        self.pats = [(name, re.compile(p)) for name, p in PII_PATTERNS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: dict[str, list[int]] = {name: [] for name, _ in self.pats}
        redacted = []
        for t in batch.column("text").to_pylist():
            t = t or ""
            r = t
            for name, pat in self.pats:
                counts[name].append(len(pat.findall(t)))
                r = pat.sub(f"[{name.upper()}]", r)
            redacted.append(r)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_email": pa.array(counts["email"], pa.int64()),
                "n_ipv4": pa.array(counts["ipv4"], pa.int64()),
                "n_phone": pa.array(counts["phone"], pa.int64()),
                "text_redacted": pa.array(redacted, pa.string()),
            }
        )


class FusedDocScorer:
    """One actor pass producing the full per-doc scorecard — language
    ID, quality, repetition, PII counts, token/char counts (and the
    redacted text when ``redact=True``). Fusing matters at corpus
    scale: the texts are read ONCE and never re-enter the object
    store between metrics; each sub-scorer's compiled state is built
    once per actor. This is the stage behind the ``score-corpus``
    CLI's filtering scorecard."""

    def __init__(self, redact: bool = False):
        self.lang = LangId()
        self.quality = QualityScorer()
        self.repetition = RepetitionScorer()
        self.pii = PiiScanner()
        self.redact = redact

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .bytekernels import token_count_kernels

        cols: dict = {"doc_id": batch["doc_id"]}
        k = token_count_kernels(batch.column("text"))
        cols["n_tokens"] = pa.array(k["n_tokens"], pa.int64())
        cols["n_chars"] = pa.array(k["n_chars"], pa.int64())
        cols["lang_pred"] = self.lang(batch).column("lang_pred")
        qt = self.quality(batch)
        for c in ("quality", "stop_ratio", "repetition"):
            cols[c] = qt.column(c)
        rt = self.repetition(batch)
        for c in ("dup_line_frac", "top_word_frac", "dup_word_frac"):
            cols[c] = rt.column(c)
        pt = self.pii(batch)
        for c in ("n_email", "n_ipv4", "n_phone"):
            cols[c] = pt.column(c)
        if self.redact:
            cols["text_redacted"] = pt.column("text_redacted")
        return pa.table(cols)


def score_corpus_ds(ds: "ray.data.Dataset", redact: bool = False):
    """The fused scorecard over any (doc_id, text) dataset."""
    return ds.map_batches(
        FusedDocScorer,
        fn_constructor_kwargs={"redact": redact},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 16),
    )


def _normalize_text(col):
    """lowercase → collapse space runs → trim — the ONE normalization
    expression; `normalized_documents` and `canonical_documents` (and
    their SQL oracle mirrors) must stay in lockstep, so both call this
    (r5 review: two inline copies risked drifting). utf8_trim(" ")
    matches SQL trim() — spaces only, not \\n/\\t."""
    import pyarrow.compute as pc

    return pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(col), pattern=" +", replacement=" "),
        characters=" ",
    )


def normalized_documents(sf_dir: str):
    """Text normalization entirely in Arrow compute kernels — zero
    Python per row: lowercase, collapse whitespace runs, trim. The
    cheapest stage class in the engine (memory-bandwidth bound over
    the zero-copy string buffers); placed before hashing/dedup stages
    so byte-identicalness means semantic identicalness."""
    import pyarrow.compute as pc

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t = _normalize_text(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_norm": t,
                "n_chars_norm": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def canonical_documents(sf_dir: str):
    """(doc_id, n_variants): canonical-variant selection — exact dedup
    AFTER normalization (the C4-style "case/whitespace variants are
    the same document" rule), keeping per group the variant with the
    longest ORIGINAL text (richest formatting), ties → lowest doc_id.
    n_variants counts the docs each canonical row absorbed.

    Scale shape: the group key is `content_hash64` of the normalized
    text (the oracle partitions by md5 of the same string — identical
    partitions up to 63-bit collisions, the decontam.py trade), so
    texts never shuffle. Winner-by-(len DESC, id ASC) packs into ONE
    monotone int64 (len·2³³ − (id+1), asserting id < 2³³), making the
    argmax a plain mergeable max: a per-batch combiner emits one
    (hash, max-pack, count) row per local group and a single
    vocabulary-sized group_agg finishes exactly."""
    import numpy as np
    import pyarrow.compute as pc

    from .bytekernels import content_hash64_nullsafe
    from .shuffle import group_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        t = _normalize_text(batch.column("text"))
        # nullsafe: the plain hash merges NULL texts with '' while the
        # oracle's md5(NULL) partitions them separately (r5 review);
        # len0 for a NULL doc fills 0, so the group winner is still the
        # min doc_id — exactly the oracle's NULLS-tied order
        h = content_hash64_nullsafe(t)
        len0 = (
            pc.fill_null(pc.utf8_length(batch.column("text")), 0)
            .to_numpy(zero_copy_only=False)
        )
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        assert ids.max(initial=0) < 2**33, "doc_id exceeds the pack bound"
        pack = len0.astype(np.int64) * 2**33 - (ids + 1)
        df = pd.DataFrame({"h": h, "best": pack})
        g = df.groupby("h", sort=False, as_index=False).agg(
            best=("best", "max"), cnt=("best", "size")
        )
        return g

    agg = group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["h"],
        {"best": ("best", "max"), "n_variants": ("cnt", "sum")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        best = df["best"].to_numpy(np.int64)
        len0 = (best >> 33) + 1
        return pd.DataFrame(
            {
                "doc_id": len0 * 2**33 - best - 1,
                "n_variants": df["n_variants"].to_numpy(np.int64),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


CANONICAL_DOCUMENTS_ORACLE = """
    WITH n AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS k,
               length(text) AS len0
        FROM documents
    ), w AS (
        SELECT doc_id,
               row_number() OVER (PARTITION BY k ORDER BY len0 DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY k) AS n_variants
        FROM n
    )
    SELECT doc_id, CAST(n_variants AS BIGINT) AS n_variants FROM w WHERE rn = 1
"""


def pii_scan(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        PiiScanner, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 16)
    )


# ------------------------- C4 heuristic document filter (Raffel 2020)

C4_MIN_TOKENS = 30
C4_MIN_CHARS = 150


def c4_filtered(sf_dir: str):
    """C4-style heuristic document filter (Raffel et al. 2020 §2.2):
    keep docs with ≥C4_MIN_TOKENS whitespace tokens and ≥C4_MIN_CHARS
    chars, no code brace '{', and no 'lorem ipsum' placeholder. One
    stateless vectorized pass — token/char counts from the byte
    kernels, substring tests as Arrow RE2 kernels — emitting only
    (doc_id, n_tokens, n_chars): the text never leaves the stage, so
    at corpus scale the op streams and nothing shuffles."""
    import pyarrow.compute as pc

    from .bytekernels import token_count_kernels

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def gate(batch: pa.Table) -> pa.Table:
        text = batch.column("text").combine_chunks()
        k = token_count_kernels(text)
        # fill_null(False) before the numpy hop: match_substring(NULL)
        # is null, its object-array to_numpy holds None, and unary ~
        # raises TypeError (r5 review). A NULL doc is dropped — exactly
        # the oracle's NULL LIKE semantics (and its n_tokens is 0
        # anyway, below the gate).
        no_brace = pc.fill_null(
            pc.invert(pc.match_substring(text, "{")), False
        ).to_numpy(zero_copy_only=False)
        no_lorem = pc.fill_null(
            pc.invert(pc.match_substring(pc.utf8_lower(text), "lorem ipsum")), False
        ).to_numpy(zero_copy_only=False)
        keep = (
            (k["n_tokens"] >= C4_MIN_TOKENS)
            & (k["n_chars"] >= C4_MIN_CHARS)
            & no_brace
            & no_lorem
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(k["n_tokens"], pa.int64()),
                "n_chars": pa.array(k["n_chars"], pa.int64()),
            }
        ).filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


C4_FILTERED_ORACLE = f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    WHERE len(string_split(text, ' ')) >= {C4_MIN_TOKENS}
      AND length(text) >= {C4_MIN_CHARS}
      AND text NOT LIKE '%{{%'
      AND lower(text) NOT LIKE '%lorem ipsum%'
"""


# ----------------------------- word-boundary blocklist scrub (C4 §2.2)

BLOCKLIST_WORDS = ("spark", "vector")


def blocklist_clean_docs(sf_dir: str):
    """Blocklist scrub: drop any document containing a blocklisted
    WORD (word-boundary match, not substring) — the C4 "bad words"
    filter shape. The whole blocklist compiles into one RE2
    alternation evaluated as a single Arrow kernel call per batch
    (RE2 alternations stay linear-time, so a real multi-thousand-word
    list costs one automaton, not one pass per word). Emits only
    surviving (doc_id, lang): text is pruned from the output."""
    import pyarrow.compute as pc

    pattern = r"\b(" + "|".join(BLOCKLIST_WORDS) + r")\b"
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def gate(batch: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(
            pc.utf8_lower(batch.column("text").combine_chunks()), pattern
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang": batch.column("lang")}
        ).filter(pc.invert(hit))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


BLOCKLIST_CLEAN_ORACLE = (
    "SELECT doc_id, lang FROM documents "
    "WHERE NOT regexp_matches(lower(text), '\\b("
    + "|".join(BLOCKLIST_WORDS)
    + ")\\b')"
)


TEXT_QUERIES = {
    "token_counts": token_counts,
    "char_class_counts": char_class_counts,
    "quality_scores": quality_scores,
    "lang_id": lang_id,
    "doc_fingerprints": doc_fingerprints,
    "winnow_fingerprints": winnow_fingerprints,
    "repetition_scores": repetition_scores,
    "pii_scan": pii_scan,
    "normalized_documents": normalized_documents,
    "canonical_documents": canonical_documents,
    "duplicated_spans": duplicated_spans,
    "duplicated_spans_exact": duplicated_spans_exact,
    "chunk_documents": chunk_documents,
    "c4_filtered": c4_filtered,
    "blocklist_clean_docs": blocklist_clean_docs,
}

def _lang_id_oracle() -> str:
    """SQL mirror of LangId: weights VALUES generated from the SAME
    PROFILES the actors load, char-bigram explode + weighted argmax
    with the profile-order tie-break, the non-ascii ratio override and
    the empty/und fallbacks. Validated bigram-equivalence note: a
    valid [a-z][a-z] char pair is byte-adjacent in UTF-8, so the
    engine's byte-pair kernel and this char-level SQL score the same
    multiset."""
    rows = []
    for ord_, (lang, prof) in enumerate(LangId.PROFILES.items()):
        for i, bg in enumerate(prof):
            rows.append(f"('{lang}', {ord_}, '{bg}', {len(prof) - i})")
    values = ", ".join(rows)
    return f"""
    WITH d AS (
        SELECT doc_id, lower(text) AS t FROM documents
    ), met AS (
        SELECT doc_id, length(t) AS n_chars,
               length(t) - length(regexp_replace(t, '[^\\x00-\\x7F]', '', 'g')) AS non_ascii
        FROM d
    ), pos AS (
        SELECT doc_id, t, unnest(generate_series(1, length(t) - 1)) AS i FROM d
    ), valid AS (
        SELECT doc_id, substr(t, i, 2) AS bg, count(*) AS n
        FROM pos WHERE regexp_matches(substr(t, i, 2), '^[a-z]{{2}}$')
        GROUP BY 1, 2
    ), w(lang, ord, bg, wt) AS (
        VALUES {values}
    ), sc AS (
        SELECT v.doc_id, w.lang, w.ord, sum(v.n * w.wt) AS score
        FROM valid v JOIN w ON v.bg = w.bg GROUP BY 1, 2, 3
    ), best AS (
        SELECT doc_id, lang, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, ord ASC) AS rn
        FROM sc
    ), pick AS (
        SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred
        FROM best WHERE rn = 1
    )
    SELECT met.doc_id,
           CASE WHEN met.n_chars = 0 THEN 'und'
                WHEN CAST(met.non_ascii AS DOUBLE) / greatest(1, met.n_chars) > 0.3
                    THEN 'zh'
                ELSE coalesce(pick.lang_pred, 'und') END AS lang_pred
    FROM met LEFT JOIN pick ON met.doc_id = pick.doc_id
    """


TEXT_ORACLES = {
    "chunk_documents": CHUNK_DOCUMENTS_ORACLE,
    "c4_filtered": C4_FILTERED_ORACLE,
    "blocklist_clean_docs": BLOCKLIST_CLEAN_ORACLE,
    "duplicated_spans_exact": DUPLICATED_SPANS_EXACT_ORACLE,
    "lang_id": _lang_id_oracle(),
    "token_counts": r"""
        SELECT doc_id,
               -- empty/NULL text counts ZERO tokens (the engine
               -- kernel's contract; bare string_split('') is [''])
               CAST(CASE WHEN text IS NULL OR text = '' THEN 0
                         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_tokens,
               -- NULL text: 0 on every column, like the engine's
               -- zero-byte view (bare SQL would read NULL — r5 review)
               CAST(coalesce(len(regexp_extract_all(text, '[a-zA-Z]+'))
                    + length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                    + length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')), 0) AS BIGINT) AS n_bpe_tokens,
               CAST(coalesce(length(text), 0) AS BIGINT) AS n_chars
        FROM documents
    """,
    "char_class_counts": """
        SELECT doc_id,
               CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
               CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha
        FROM documents
    """,
    # term-for-term mirror of QualityScorer.__call__ — identical IEEE
    # expression order makes the unrounded doubles bit-equal
    "quality_scores": """
        WITH t AS (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
            FROM documents
        ), m AS (
            SELECT doc_id, len(toks) AS n,
                   len(list_filter(toks, x -> x IN
                       ('the','a','and','of','to','in','is','for','on','with'))) AS stop_cnt,
                   len(list_distinct(toks)) AS uniq_cnt
            FROM t
        )
        SELECT doc_id,
               CASE WHEN n = 0 THEN 0.0
                    ELSE 0.4 * least(1.0, n / 20.0)
                         + 0.3 * least(1.0, (stop_cnt / CAST(n AS DOUBLE)) * 5)
                         + 0.3 * (uniq_cnt / CAST(n AS DOUBLE)) END AS quality,
               CASE WHEN n = 0 THEN 0.0
                    ELSE stop_cnt / CAST(n AS DOUBLE) END AS stop_ratio,
               CASE WHEN n = 0 THEN 1.0
                    ELSE 1 - uniq_cnt / CAST(n AS DOUBLE) END AS repetition
        FROM m
    """,
    # term-for-term mirror of RepetitionScorer (same divisions / CASEs)
    "repetition_scores": """
        WITH t AS (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks,
                   list_filter(string_split(text, chr(10)), x -> length(x) > 0) AS lines
            FROM documents
        ), w AS (
            SELECT doc_id AS wid, unnest(toks) AS tok FROM t
        ), c AS (
            SELECT wid, tok, count(*) AS cnt FROM w GROUP BY 1, 2
        ), top AS (
            SELECT wid, max(cnt) AS top_cnt, CAST(sum(cnt) AS BIGINT) AS n,
                   count(*) AS n_uniq
            FROM c GROUP BY 1
        )
        SELECT t.doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(list_distinct(lines)) AS BIGINT) AS n_uniq_lines,
               CASE WHEN len(lines) = 0 THEN 0.0
                    ELSE 1 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE)
               END AS dup_line_frac,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_toks,
               CASE WHEN COALESCE(n, 0) = 0 THEN 0.0
                    ELSE top_cnt / CAST(n AS DOUBLE) END AS top_word_frac,
               CASE WHEN COALESCE(n, 0) = 0 THEN 0.0
                    ELSE 1 - n_uniq / CAST(n AS DOUBLE) END AS dup_word_frac
        FROM t LEFT JOIN top ON t.doc_id = top.wid
    """,
    "pii_scan": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{PII_PATTERNS[0][1]}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(text, '{PII_PATTERNS[1][1]}')) AS BIGINT) AS n_ipv4,
               CAST(len(regexp_extract_all(text, '{PII_PATTERNS[2][1]}')) AS BIGINT) AS n_phone,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{PII_PATTERNS[0][1]}', '[EMAIL]', 'g'),
                   '{PII_PATTERNS[1][1]}', '[IPV4]', 'g'),
                   '{PII_PATTERNS[2][1]}', '[PHONE]', 'g') AS text_redacted
        FROM documents
    """,
    "normalized_documents": """
        SELECT doc_id,
               trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS text_norm,
               CAST(length(trim(regexp_replace(lower(text), ' +', ' ', 'g')))
                    AS BIGINT) AS n_chars_norm
        FROM documents
    """,
    "canonical_documents": CANONICAL_DOCUMENTS_ORACLE,
}
