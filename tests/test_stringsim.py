import numpy as np

from rayrl.linkage import stringsim as ss


def test_jaro_winkler_known_values():
    assert ss.jaro_winkler("martha", "marhta") > 0.95
    assert ss.jaro_winkler("abc", "abc") == 1.0
    assert ss.jaro_winkler("abc", "xyz") == 0.0
    assert ss.jaro_winkler("", "abc") == 0.0
    d = ss.jaro_winkler("dixon", "dicksonx")
    assert 0.76 < d < 0.82  # canonical ≈ 0.8133 jw / 0.767 jaro


def test_levenshtein_banded():
    assert ss.levenshtein_banded("kitten", "sitting", 5) == 3
    assert ss.levenshtein_banded("abc", "abc", 2) == 0
    assert ss.levenshtein_banded("abc", "abcdefgh", 3) == 4  # > k → k+1
    assert ss.levenshtein_banded("", "abc", 5) == 3


def test_jaccard_shingles():
    a = ss.char_shingles("hello world")
    b = ss.char_shingles("hello world")
    assert ss.jaccard(a, b) == 1.0
    c = ss.char_shingles("hello worldx")
    assert 0.8 < ss.jaccard(a, c) < 1.0
    assert ss.jaccard(set(), set()) == 1.0
    assert ss.jaccard(a, set()) == 0.0


def test_minhash_similarity_monotone():
    tags = ss.minhash_tags(32)
    s1 = ss.minhash_signature("the quick brown fox jumps over the lazy dog", tags)
    s2 = ss.minhash_signature("the quick brown fox jumps over the lazy dot", tags)
    s3 = ss.minhash_signature("completely different text with no overlap at all", tags)
    near = (s1 == s2).mean()
    far = (s1 == s3).mean()
    assert near > 0.6 > far
    again = ss.minhash_signature("the quick brown fox jumps over the lazy dog", tags)
    assert np.array_equal(s1, again)


def test_oph_edge_rows_and_column_parity():
    """Empty/null rows give all-zero signatures; sub-window rows pad to
    one shingle; list input, pa column, and sliced-column views all
    produce identical signatures (zero-copy offset handling)."""
    import pyarrow as pa

    texts = ["", "ab", "abcd", "hello world this is a test " * 5, None]
    sig = ss.oph_signatures_batch(texts, 128, seed=0x5161)
    assert sig.shape == (5, 128)
    assert (sig[0] == 0).all() and (sig[4] == 0).all()
    assert (sig[1] != 0).any() and (sig[2] != 0).any()
    col = pa.array([t or "" for t in texts])
    assert np.array_equal(sig, ss.oph_signatures_batch(col, 128, 0x5161))
    assert np.array_equal(
        ss.oph_signatures_batch(col.slice(2, 2), 128, 0x5161), sig[2:4]
    )


def test_oph_estimator_tracks_jaccard():
    """Byte-lane est-Jaccard from OPH signatures must track the true
    shingle Jaccard about as tightly as classic k-min (k=128 → std
    ≈ 0.04; densification costs a little, gate at 0.06)."""
    import random

    random.seed(1)
    words = ["key", "agg", "row", "scan", "slow", "fast", "table", "value"]

    def noisy(t, rate):
        chars = list(t)
        for i in range(len(chars)):
            if random.random() < rate:
                chars[i] = random.choice("abcdefghijklmnop")
        return "".join(chars)

    errs = []
    for _ in range(50):
        t1 = " ".join(random.choice(words) for _ in range(60))
        t2 = noisy(t1, random.choice([0.01, 0.05, 0.12]))
        a = set(np.unique(ss.shingle_codes(t1)))
        b = set(np.unique(ss.shingle_codes(t2)))
        true_j = len(a & b) / len(a | b)
        op = ss.oph_signatures_batch([t1, t2], 128, 0x5161) & np.uint64(0xFF)
        errs.append((op[0] == op[1]).mean() - 1 / 256 - true_j)
    assert abs(np.mean(errs)) < 0.02
    assert np.std(errs) < 0.06


def test_oph_densified_lanes_disagree_for_disjoint_texts():
    """Two shingle-disjoint texts must not spuriously agree on
    densified (empty-bin) lanes — the j·C offset rule."""
    op = ss.oph_signatures_batch(["abcdefgh", "zyxwvuts"], 128, 0x5161)
    frac_equal = (op[0] == op[1]).mean()
    assert frac_equal < 0.05


def test_word_bigram_minhash_matches_slow_mirror():
    """The vectorized segment-polynomial word-bigram kernel must equal
    a per-token Python mirror on edge rows: empty, single-token,
    doubled/leading/trailing spaces (str.split(' ') semantics)."""
    import warnings

    from rayrl import rng as _rng
    from rayrl.linkage.stringsim import _OPH_DENS_C, _POLY_P

    tags = ss.minhash_tags(8, 0x77AB)
    texts = ["hello world foo", "single", "", "a  b", " lead", "trail ",
             "one two three four five"]
    got = ss.word_bigram_minhash(texts, tags)

    def tok_hash(tok):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # intentional u64 wraparound
            acc = np.uint64(0)
            for j, byt in enumerate(tok.encode()):
                acc = acc + np.uint64(byt) * (_POLY_P ** np.uint64(j))
            x = acc ^ np.uint64(len(tok.encode())) * _OPH_DENS_C
        return _rng._splitmix64(np.array([x], np.uint64))[0]

    def slow_row(t):
        if not t:
            return np.zeros(len(tags), np.uint64)
        tcs = [tok_hash(x) for x in t.split(" ")]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            if len(tcs) < 2:
                codes = np.array([tcs[0]], np.uint64)
            else:
                codes = _rng._splitmix64(
                    np.array(
                        [tcs[i] * _OPH_DENS_C ^ tcs[i + 1] for i in range(len(tcs) - 1)],
                        np.uint64,
                    )
                )
        return np.array(
            [np.min(_rng._splitmix64(codes ^ tg)) for tg in tags], np.uint64
        )

    want = np.stack([slow_row(t) for t in texts])
    assert np.array_equal(got, want)


def test_word_bigram_minhash_sliced_offset_array():
    """A sliced/offset Arrow array must hash identically to the same
    rows in a compact array (ADVICE r4: the space scan runs over the
    PARENT buffer, so spaces outside the slice used to map to row
    -1/n and crash or corrupt)."""
    import pyarrow as pa

    tags = ss.minhash_tags(8, 0x77AB)
    texts = ["aa bb cc", "dd ee", "ff gg hh ii", "jj", "kk ll"]
    parent = pa.array(texts, pa.string())
    sliced = parent.slice(1, 3)
    got = ss.word_bigram_minhash(sliced, tags)
    want = ss.word_bigram_minhash(texts[1:4], tags)
    assert np.array_equal(got, want)


def test_kmin_from_shingles_equals_per_row_batch():
    """The shared batch_shingles → kmin_from_shingles path must be
    byte-identical to minhash_signatures_batch on edge rows (empty,
    <4-byte, None) — the regression guard the r4 ADVICE asked for."""
    tags = ss.minhash_tags(16, 0x1234)
    texts = ["hello world text", "", "ab", None, "x", "the quick brown fox",
             "aaa", "abcd", "nearly the same text here"]
    codes, row_of, n = ss.batch_shingles(texts)
    got = ss.kmin_from_shingles(codes, row_of, n, tags)
    want = ss.minhash_signatures_batch(texts, tags)
    assert np.array_equal(got, want)
    # sliced/offset Arrow input: the slice-window compaction must hash
    # identically to the compacted equivalent (and in O(slice))
    import pyarrow as pa

    parent = pa.array([t if t is not None else "" for t in texts], pa.string())
    c2, r2, n2 = ss.batch_shingles(parent.slice(2, 5))
    c3, r3, n3 = ss.batch_shingles([texts[i] or "" for i in range(2, 7)])
    assert n2 == n3 and np.array_equal(c2, c3) and np.array_equal(r2, r3)
