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


def test_decode_stub_raises_without_fake(monkeypatch):
    from rayrl import multimodal as mm

    monkeypatch.setattr(mm, "_HAVE_PIL", False)  # force the no-PIL path
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"abc", fake=False)
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


# ---------------------------------------------- native NumPy decoders


def _ppm(w, h, rgb_fn) -> bytes:
    """Binary P6 with a comment line, pixels from rgb_fn(x, y)."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px.extend(rgb_fn(x, y))
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + bytes(px)


def _pgm(w, h, g_fn) -> bytes:
    px = bytes(g_fn(x, y) for y in range(h) for x in range(w))
    return b"P5 %d %d 255\n" % (w, h) + px


def _bmp24(w, h, rgb_fn, top_down=False) -> bytes:
    """Uncompressed 24-bit BMP, bottom-up unless top_down."""
    stride = (w * 3 + 3) & ~3
    rows = []
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        row = bytearray()
        for x in range(w):
            r, g, b = rgb_fn(x, y)
            row.extend((b, g, r))  # BGR on disk
        row.extend(b"\0" * (stride - len(row)))
        rows.append(bytes(row))
    raster = b"".join(rows)
    import struct

    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    return header + dib + raster


def test_native_decode_solid_and_luma():
    """PPM/PGM/BMP payloads decode to real pixels in-sandbox: solid
    colors land on their ITU-R 601 luma everywhere."""
    # luma constants are PIL's fixed-point formula ((19595R+38470G+
    # 7471B+0x8000)>>16) — the native luma stage matches PIL bit-for-bit
    red = decode_image(_ppm(16, 12, lambda x, y: (255, 0, 0)))
    assert red.shape == (8, 8) and (red == 76).all()
    gray = decode_image(_pgm(5, 9, lambda x, y: 133))
    assert (gray == 133).all()
    green = decode_image(_bmp24(10, 10, lambda x, y: (0, 255, 0)))
    assert (green == 150).all()


def test_native_decode_orientation_and_downsample():
    """Top half white / bottom black must decode with the bright rows
    on top for BOTH bottom-up and top-down BMPs (and PPM), proving the
    row-order handling; box-filter pooling averages odd sizes."""

    def half(x, y):  # y counts from the top of the image
        return (255, 255, 255) if y < 6 else (0, 0, 0)

    for payload in (
        _ppm(12, 12, half),
        _bmp24(12, 12, half, top_down=False),
        _bmp24(12, 12, half, top_down=True),
    ):
        t = decode_image(payload)
        assert (t[:3] == 255).all() and (t[-3:] == 0).all()
    # box pooling: 16×16 with one white pixel averages its 2×2 cell
    t = decode_image(_pgm(16, 16, lambda x, y: 255 if (x, y) == (0, 0) else 0))
    assert t[0, 0] == 63  # 255 / 4, floor
    assert t[1:, 1:].max() == 0


def test_native_decode_phash_e2e(ray_session):
    """End-to-end real-decode path: identical PPMs pair at hamming 0,
    a shifted gradient pairs near, solid noise images stay unpaired."""
    from rayrl.multimodal import media_phash_near_dups

    def grad(x, y):
        v = min(255, 16 * x)
        return (v, v, v)

    def grad2(x, y):
        v = min(255, 16 * x + 8)
        return (v, v, v)

    payloads = [_ppm(16, 16, grad), _ppm(16, 16, grad), _ppm(16, 16, grad2)] + [
        _ppm(16, 16, lambda x, y, i=i: ((x * 37 + y * 91 + i * 53) % 256,) * 3)
        for i in range(20)
    ]
    tbl = pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    pairs = media_phash_near_dups(
        ray.data.from_arrow(tbl), max_hamming=4, fake_decode=False
    ).to_pandas()
    lookup = {(a, b): d for a, b, d in pairs.itertuples(index=False)}
    assert lookup.get((0, 1)) == 0
    assert (0, 2) in lookup  # same monotone gradient rows → tiny hamming


def test_real_decode_stage_survives_corrupt_payload(ray_session):
    """One corrupt payload in a real-decode pipeline must NOT kill the
    map_batches task: the row falls back to the byte-tile fingerprint
    and every row still comes out (per-row fallback contract)."""
    from rayrl.multimodal import media_features, media_phash_near_dups

    payloads = [_ppm(8, 8, lambda x, y: (x * 30, y * 30, 0)) for _ in range(6)]
    payloads[3] = b"P6\n16 16\n255\n\x00\x01"  # truncated raster
    payloads[4] = b"not an image at all"
    tbl = pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    feats = media_features(ds, fake_decode=False).to_pandas()
    assert len(feats) == 6 and np.isfinite(feats["thumb_mean"]).all()
    pairs = media_phash_near_dups(ds, max_hamming=0, fake_decode=False).to_pandas()
    # the four identical clean PPMs still pair among themselves
    clean = {0, 1, 2, 5}
    got = {(a, b) for a, b, _ in pairs.itertuples(index=False)}
    assert {(a, b) for a in clean for b in clean if a < b} <= got


def test_native_decode_crlf_and_padded_separators():
    """CRLF-writing encoders put TWO whitespace bytes between maxval
    and the raster; the spec says one. The decoder must anchor the
    raster correctly in both cases — a one-byte shift silently corrupts
    every luma (wrong dHash → false near-dup pairs), the exact failure
    the r5 review reproduced."""
    from rayrl import multimodal as mm

    px = bytes((x * 16 + y) % 256 for y in range(8) for x in range(8))
    lf = b"P5 8 8 255\n" + px
    crlf = b"P5 8 8 255\r\n" + px
    want = mm._decode_pnm(lf)
    assert want is not None and want[0, 0] == px[0]
    np.testing.assert_array_equal(mm._decode_pnm(crlf), want)
    # P6 CRLF too (3 channels exercise the offset at a different width)
    rgb = bytes((x * 7 + y * 3 + c) % 256 for y in range(6) for x in range(6) for c in range(3))
    np.testing.assert_array_equal(
        mm._decode_pnm(b"P6 6 6 255\r\n" + rgb), mm._decode_pnm(b"P6 6 6 255\n" + rgb)
    )
    # trailing bytes after the raster: the end-anchored read must NOT
    # engage (separator check fails) — spec one-byte offset still wins
    trailing = b"P5 8 8 255\n" + px + b"JUNK"
    np.testing.assert_array_equal(mm._decode_pnm(trailing), want)
    # CRLF separator AND trailing bytes: neither end-anchoring nor the
    # spec one-byte offset is right — the "\r\n" rule must engage
    crlf_trailing = b"P5 8 8 255\r\n" + px + b"JUNK"
    np.testing.assert_array_equal(mm._decode_pnm(crlf_trailing), want)
    # the r5 review's repro: spec-conformant one-byte separator, first
    # pixel whitespace-valued (0x20), trailing newline — end-anchoring
    # would skip the real first pixel and absorb the trailing byte
    ws_px = bytes([32, 10, 200, 50])
    ws_first = b"P5 2 2 255\n" + ws_px + b"\n"
    got = mm._decode_pnm(ws_first)
    np.testing.assert_array_equal(got, mm._decode_pnm(b"P5 2 2 255\n" + ws_px))


def test_native_decode_rejects_malformed_payloads():
    """Malformed near-miss payloads must fall through to the PIL/error
    path (return-None contract), never crash the decode stage, and
    low-maxval PNMs rescale to full range instead of decoding near-
    black."""
    from rayrl import multimodal as mm

    # P6 magic but non-numeric header token → not ours
    assert mm._decode_pnm(b"P6 panel report about pixels") is None
    # truncated raster (header promises 16x16 RGB, body is 10 bytes)
    assert mm._decode_pnm(b"P6\n16 16\n255\n" + b"\0" * 10) is None
    # maxval 15 PGM: value 15 == white, not near-black
    t = decode_image(_pgm_maxval(6, 6, 15, lambda x, y: 15))
    assert (t == 255).all()
    # BITMAPCOREHEADER (12-byte DIB) → leave to PIL
    import struct

    core = struct.pack("<2sIHHI", b"BM", 26 + 12, 0, 0, 26) + struct.pack(
        "<IHHHH", 12, 4, 4, 1, 24
    )
    assert mm._decode_bmp(core + b"\0" * 64) is None
    # truncated BMP raster
    good = _bmp24(8, 8, lambda x, y: (1, 2, 3))
    assert mm._decode_bmp(good[: 54 + 10]) is None
    # all of the above raise cleanly through decode_image when no PIL
    # decoder exists (with PIL installed they route there instead)
    if not mm._HAVE_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"P6 panel report about pixels")


def _pgm_maxval(w, h, maxval, g_fn) -> bytes:
    px = bytes(g_fn(x, y) for y in range(h) for x in range(w))
    return b"P5 %d %d %d\n" % (w, h, maxval) + px


def test_native_decode_matches_slow_mirror():
    """Property: for arbitrary sizes and pixel grids, the vectorized
    PPM decode equals a naive per-cell Python mirror (luma + box
    mean)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, seed):
        px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
        got = decode_image(payload)
        # slow mirror: PIL's fixed-point luma then mean over each
        # cell's bucket, including the <8 integer upsampling
        lum = (
            px[..., 0].astype(np.uint32) * 19595
            + px[..., 1].astype(np.uint32) * 38470
            + px[..., 2].astype(np.uint32) * 7471
            + 0x8000
        ) >> 16
        if h < 8:
            lum = np.repeat(lum, -(-8 // h), axis=0)
        if w < 8:
            lum = np.repeat(lum, -(-8 // w), axis=1)
        hh, ww = lum.shape
        want = np.zeros((8, 8), np.uint8)
        for r in range(8):
            for c in range(8):
                cell = lum[
                    (r * hh) // 8 : ((r + 1) * hh) // 8,
                    (c * ww) // 8 : ((c + 1) * ww) // 8,
                ]
                want[r, c] = min(255, int(cell.mean()))
        np.testing.assert_array_equal(got, want)

    check()


def test_decode_image_pil_dispatch(monkeypatch):
    """decode_image routes to the real decoder when PIL is present
    (dispatch verified with a monkeypatched decoder — PIL itself is
    absent in the sandbox) and raises without it unless fake=True."""
    import pytest

    from rayrl import multimodal as mm

    monkeypatch.setattr(mm, "_HAVE_PIL", False)  # force the no-PIL path
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


# --- native PNG decode (stdlib zlib + NumPy unfilter) ---


def _png_bytes(arr, ctype, filters, split_idat=False, depth=8, interlace=0):
    """Minimal PNG encoder for tests: per-row filter choice is explicit
    so every unfilter branch (None/Sub/Up/Average/Paeth) is exercised
    against the decoder."""
    import struct
    import zlib

    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    assert nch == {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    lines = []
    prev = np.zeros(w * nch, np.int16)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = arr[y].reshape(-1).astype(np.int16)
        a = np.zeros_like(cur)
        a[nch:] = cur[:-nch]
        c = np.zeros_like(prev)
        c[nch:] = prev[:-nch]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - a
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((a + prev) >> 1)
        else:  # Paeth predicts from the RECONSTRUCTED neighbors
            p = a + prev - c
            pa_, pb_, pc_ = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, prev, c))
            enc = cur - pred
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    body = zlib.compress(b"".join(lines))
    if split_idat:  # decoder must concatenate multiple IDAT chunks
        idat = chunk(b"IDAT", body[: len(body) // 2]) + chunk(b"IDAT", body[len(body) // 2 :])
    else:
        idat = chunk(b"IDAT", body)
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + idat + chunk(b"IEND", b"")


def test_native_png_all_filters_and_color_types():
    from rayrl import multimodal as mm

    h, w = 13, 11
    grid = np.fromfunction(lambda y, x: (x * 37 + y * 91) % 256, (h, w)).astype(np.uint8)
    rgb = np.stack([grid, (grid * 3 + 17) % 256, grid[::-1]], axis=-1).astype(np.uint8)

    # grayscale, every filter type across rows (incl. Average/Paeth)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = mm._decode_png(_png_bytes(grid, 0, filters))
        np.testing.assert_array_equal(got, mm._downsample8(grid))

    # RGB: thumbnail must equal the shared luma+downsample pipeline —
    # i.e. byte-identical to the same pixels arriving as PPM or BMP
    # (the cross-format near-dup contract)
    got = mm._decode_png(_png_bytes(rgb, 2, [0, 4, 2, 1, 3]))
    np.testing.assert_array_equal(got, mm._downsample8(mm._luma(rgb)))
    ppm = _ppm(w, h, lambda x, y: tuple(int(v) for v in rgb[y, x]))
    np.testing.assert_array_equal(got, mm._decode_pnm(ppm))

    # gray+alpha and RGBA: alpha ignored (PIL convert("L") parity)
    ga = np.stack([grid, np.full_like(grid, 200)], axis=-1)
    np.testing.assert_array_equal(
        mm._decode_png(_png_bytes(ga, 4, [1, 2])), mm._downsample8(grid)
    )
    rgba = np.concatenate([rgb, np.full((h, w, 1), 9, np.uint8)], axis=-1)
    np.testing.assert_array_equal(
        mm._decode_png(_png_bytes(rgba, 6, [4])), mm._downsample8(mm._luma(rgb))
    )

    # split IDAT streams concatenate
    np.testing.assert_array_equal(
        mm._decode_png(_png_bytes(grid, 0, [2], split_idat=True)), mm._downsample8(grid)
    )

    # decode_image dispatches natively (no PIL in this sandbox)
    np.testing.assert_array_equal(
        decode_image(_png_bytes(grid, 0, [0])), mm._downsample8(grid)
    )


def test_native_png_rejects_unsupported():
    """Palette / 16-bit / interlaced / truncated / corrupt PNGs return
    None (PIL-or-error fallback), never a wrong thumbnail."""
    import zlib

    from rayrl import multimodal as mm

    # NB: % 256 on a uint8 array NEP-50-promotes to int16 — force the
    # dtype back or tobytes() silently doubles to 2 bytes per pixel
    grid = ((np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256).astype(np.uint8)
    good = _png_bytes(grid, 0, [0])
    assert mm._decode_png(good) is not None
    assert mm._decode_png(_png_bytes(grid, 0, [0], depth=16)) is None
    assert mm._decode_png(_png_bytes(grid, 0, [0], interlace=1)) is None
    # color type 3 (palette) — rebuild the IHDR byte in place
    pal = bytearray(_png_bytes(grid, 0, [0]))
    pal[8 + 8 + 9] = 3  # ctype byte inside IHDR data
    assert mm._decode_png(bytes(pal)) is None
    # truncated IDAT (cut mid-chunk)
    assert mm._decode_png(good[:40]) is None
    import struct

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr8 = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    # zlib garbage in IDAT
    bad = sig + chunk(b"IHDR", ihdr8) + chunk(b"IDAT", b"notzlib") + chunk(b"IEND", b"")
    assert mm._decode_png(bad) is None
    # short scanline stream (inflates clean but is missing rows)
    short = sig + chunk(b"IHDR", ihdr8) + chunk(
        b"IDAT", zlib.compress(b"\x00" + grid[0].tobytes())
    ) + chunk(b"IEND", b"")
    assert mm._decode_png(short) is None
    # invalid filter byte
    ihdr1 = struct.pack(">IIBBBBB", 8, 1, 8, 0, 0, 0, 0)
    evil = sig + chunk(b"IHDR", ihdr1) + chunk(
        b"IDAT", zlib.compress(b"\x09" + grid[0].tobytes())
    ) + chunk(b"IEND", b"")
    assert mm._decode_png(evil) is None
    # deflate bomb: tiny IHDR, IDAT inflating far past the promised
    # raster — the inflate is capped at the IHDR byte count, the extra
    # never allocates, and the promised pixels still decode
    bomb = sig + chunk(b"IHDR", ihdr8) + chunk(
        b"IDAT", zlib.compress(b"".join(b"\x00" + grid[y].tobytes() for y in range(8)) + b"\x00" * (1 << 22))
    ) + chunk(b"IEND", b"")
    np.testing.assert_array_equal(mm._decode_png(bomb), mm._downsample8(grid))
    # absurd IHDR dims refuse before inflating (would claim a >256 MB raster)
    huge = struct.pack(">IIBBBBB", 1 << 17, 1 << 12, 8, 6, 0, 0, 0)
    bombhdr = sig + chunk(b"IHDR", huge) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 64)
    ) + chunk(b"IEND", b"")
    assert mm._decode_png(bombhdr) is None


def test_fallback_tiles_are_content_hashes_not_headers():
    """Real-decode fallback fingerprints must hang off the WHOLE
    payload: two distinct undecodable payloads sharing a 64-byte
    header (same-encoder JPEGs) must NOT alias, while byte-identical
    undecodable payloads still collide exactly (a true exact dup).
    Empty payloads are MISSING, not fallbacks."""
    from rayrl import multimodal as mm

    header = b"\xff\xd8\xff\xe0" + b"JFIF".ljust(60, b"\x00")  # 64 shared bytes
    a = header + b"image-one-body"
    b = header + b"image-two-body"
    ta, sa = mm._decode_or_tile(a, fake=False)
    tb, sb = mm._decode_or_tile(b, fake=False)
    ta2, _ = mm._decode_or_tile(a, fake=False)
    assert sa == sb == mm._ROW_FALLBACK
    assert not np.array_equal(ta, tb)  # shared header must not alias
    assert np.array_equal(ta, ta2)  # deterministic per payload
    tz, sz = mm._decode_or_tile(b"", fake=False)
    assert sz == mm._ROW_MISSING and not tz.any()


def test_fallback_guard_ignores_missing_payloads(ray_session):
    """A shard of >=8 empty/NULL payloads is a legal shape (fetch
    failures), not a misconfiguration: the all-fallback guard must not
    fire, and missing rows carry no fingerprint (dropped from the
    phash output). A batch of >=8 NON-empty undecodable payloads still
    raises."""
    import pytest

    from rayrl import multimodal as mm

    ids = pa.array(range(10), pa.int64())
    empties = pa.table({"media_id": ids, "payload": pa.array([b""] * 10, pa.binary())})
    out = mm.ImagePhash(fake_decode=False)(empties)
    assert out.num_rows == 0  # all missing -> no fingerprints, no raise

    junk = pa.table(
        {
            "media_id": ids,
            "payload": pa.array([b"not-an-image-%d" % i for i in range(10)], pa.binary()),
        }
    )
    with pytest.raises(RuntimeError, match="failed"):
        mm.ImagePhash(fake_decode=False)(junk)


def test_dhash56_matches_per_pixel_mirror():
    """dhash56's vectorized bit packing vs a per-pixel loop over
    hypothesis-random thumbnails."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rayrl.multimodal import dhash56

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(0, 255), min_size=64, max_size=192).filter(lambda v: len(v) % 64 == 0))
    def run(vals):
        thumbs = np.array(vals, np.uint8).reshape(-1, 8, 8)
        got = dhash56(thumbs)
        for t, h in zip(thumbs, got):
            bits = 0
            k = 0
            for r in range(8):
                for c in range(7):
                    bits |= int(t[r, c] < t[r, c + 1]) << k
                    k += 1
            assert bits == int(np.uint64(h))

    run()
