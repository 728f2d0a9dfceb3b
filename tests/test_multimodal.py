"""Multimodal plumbing tests — real Arrow binary handling, stubbed
decode (rayrl.multimodal)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from rayrl import synth
from rayrl.multimodal import MediaFeatures, decode_image, frame_sample, media_features


def _media_ds(n=200):
    pages = synth.make_pages_batch(np.arange(n))
    tbl = pa.table(
        {
            "media_id": pages.column("record_id"),
            "payload": pages.column("html"),
            "media_type": pa.array(["image"] * n, pa.string()),
            "width": pa.array([8] * n, pa.int32()),
            "height": pa.array([8] * n, pa.int32()),
        }
    )
    return ray.data.from_arrow(tbl)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", fake=False)
    thumb = decode_image(b"abcdefgh" * 8, fake=True)
    assert thumb.shape == (8, 8) and thumb.dtype == np.uint8


def test_media_features(ray_session):
    ds = _media_ds(200)
    out = media_features(ds, batch_size=64, concurrency=2).to_pandas()
    assert len(out) == 200
    assert (out["n_bytes"] > 0).all()
    assert ((out["byte_entropy"] >= 0) & (out["byte_entropy"] <= 8)).all()
    # entropy of ascii html payloads is positive and < 8 bits
    assert out["byte_entropy"].mean() > 1


def test_frame_sample_layout(ray_session):
    ds = _media_ds(50)
    frames = frame_sample(ds, every_n=2).to_pandas()
    assert (frames["frame_index"] % 2 == 0).all()
    assert frames["frame_bytes"].map(len).max() <= 64
    # every media id contributes ≥ 1 frame
    assert frames["media_id"].nunique() == 50


def test_media_features_deterministic(ray_session):
    ds = _media_ds(100)
    a = media_features(ds, batch_size=32).to_pandas().sort_values("media_id").reset_index(drop=True)
    b = media_features(ds, batch_size=100).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)


def test_dhash56_and_phash_near_dups(ray_session):
    """dHash: identical payloads → hamming 0 pair; a 1-byte tweak in
    the thumbnail window → small-hamming pair; random payloads stay
    unpaired at max_hamming=4."""
    from rayrl.multimodal import dhash56, media_phash_near_dups

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=200, dtype=np.uint8).tobytes()
    tweaked = bytearray(base)
    tweaked[10] ^= 0xFF  # flips a couple of adjacent-diff bits
    payloads = [base, base, bytes(tweaked)] + [
        rng.integers(0, 256, size=200, dtype=np.uint8).tobytes() for _ in range(40)
    ]
    tbl = pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    # kernel sanity: hash is a pure function of the first 64 bytes
    from rayrl.multimodal import decode_image

    t = np.stack([decode_image(p, fake=True) for p in payloads[:3]])
    h = dhash56(t)
    assert h[0] == h[1] and h[0] != h[2]

    pairs = (
        media_phash_near_dups(ray.data.from_arrow(tbl), max_hamming=4)
        .to_pandas()
        .sort_values(["media_a", "media_b"])
        .reset_index(drop=True)
    )
    lookup = {(a, b): d for a, b, d in pairs.itertuples(index=False)}
    assert lookup.get((0, 1)) == 0
    assert (0, 2) in lookup and 1 <= lookup[(0, 2)] <= 4
    # no random payload pairs with the planted trio
    assert not any(a > 2 or b > 2 for a, b in lookup if (a, b) not in [(0, 1), (0, 2), (1, 2)])


def test_decode_image_pil_dispatch(monkeypatch):
    """decode_image routes to the real decoder when PIL is present
    (dispatch verified with a monkeypatched decoder — PIL itself is
    absent in the sandbox) and raises without it unless fake=True."""
    import pytest

    from rayrl import multimodal as mm

    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...", fake=False)
    # fake path unaffected by PIL availability
    assert mm.decode_image(b"abc", fake=True).shape == (8, 8)

    calls = []

    def fake_pil_decode(payload):
        calls.append(payload)
        return np.full((8, 8), 7, np.uint8)

    monkeypatch.setattr(mm, "_HAVE_PIL", True)
    monkeypatch.setattr(mm, "_pil_decode", fake_pil_decode)
    out = mm.decode_image(b"\x89PNGpayload", fake=False)
    assert calls == [b"\x89PNGpayload"]
    assert out.shape == (8, 8) and out.dtype == np.uint8
