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
