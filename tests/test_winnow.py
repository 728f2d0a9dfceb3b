"""Winnowing fingerprint kernel tests (pure function — no Ray)."""

import numpy as np

from rayrl.text import WINNOW_K, WINNOW_W, winnow_doc


def _brute(b: bytes, k: int, w: int):
    """Naive reference: rolling hash + rightmost-min per window."""
    arr = np.frombuffer(b, dtype=np.uint8)
    if len(arr) < k:
        return [], []
    n = len(arr) - k + 1
    P = np.uint64(0x100000001B3)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * P + arr[j : j + n]
    h = (h ^ (h >> np.uint64(31))) * np.uint64(0x9E3779B97F4A7C15)
    pos_out = []
    for i in range(max(1, n - w + 1)):
        win = h[i : i + w]
        m = win.min()
        # rightmost occurrence of the min
        p = i + int(len(win) - 1 - np.argmin(win[::-1]))
        assert h[p] == m
        if not pos_out or pos_out[-1] != p:
            pos_out.append(p)
    return pos_out, [int(h[p].view(np.int64) if isinstance(h[p], np.ndarray) else np.int64(h[p].astype(np.int64))) for p in pos_out]


def test_winnow_matches_bruteforce():
    rng = np.random.default_rng(3)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        b = bytes(rng.integers(97, 123, n, dtype=np.uint8))
        pos, fps = winnow_doc(b)
        bpos, _ = _brute(b, WINNOW_K, WINNOW_W)
        assert list(pos) == bpos, (trial, n)


def test_winnow_guarantee_shared_substring():
    """Any shared substring of length >= w+k-1 must yield a shared
    fingerprint VALUE (the winnowing guarantee), regardless of where
    it sits in each document."""
    rng = np.random.default_rng(11)
    shared = bytes(rng.integers(97, 123, WINNOW_W + WINNOW_K - 1, dtype=np.uint8))
    for trial in range(10):
        pre_a = bytes(rng.integers(97, 123, int(rng.integers(0, 200)), dtype=np.uint8))
        pre_b = bytes(rng.integers(97, 123, int(rng.integers(0, 200)), dtype=np.uint8))
        _, fa = winnow_doc(pre_a + shared)
        _, fb = winnow_doc(pre_b + shared)
        assert set(fa.tolist()) & set(fb.tolist()), trial


def test_winnow_edges():
    assert len(winnow_doc(b"")[0]) == 0
    assert len(winnow_doc(b"abc")[0]) == 0  # shorter than k
    p, f = winnow_doc(b"a" * 100)  # all-identical hashes
    assert len(p) >= 1 and len(set(f.tolist())) == 1


def test_winnow_batch_parity_random_lengths():
    """winnow_batch == winnow_doc per row, byte-identical, across the
    full length spectrum (sub-k, n<=w fallback, vectorized path)."""
    import numpy as np
    import pyarrow as pa

    from rayrl.text import WINNOW_K, WINNOW_W, winnow_batch, winnow_doc

    rng = np.random.default_rng(17)
    texts = []
    for n in [0, 3, WINNOW_K - 1, WINNOW_K, WINNOW_K + WINNOW_W - 1,
              WINNOW_K + WINNOW_W, 40, 123, 400, 1500]:
        texts.append("".join(rng.choice(list("abcdefgh "), size=n)))
    # planted repeats to exercise dedup + in-doc repetition
    texts.append("same same same same same same same same")
    col = pa.array(texts, pa.string())
    row, pos, fp = winnow_batch(col)
    for i, t in enumerate(texts):
        p_ref, f_ref = winnow_doc(t.encode())
        m = row == i
        assert pos[m].tolist() == p_ref.tolist(), (i, len(t))
        assert fp[m].tolist() == f_ref.tolist(), (i, len(t))
