"""Pure-Python media codecs (VERDICT r5 #3): BMP / P6 PPM / PCM16 WAV
decode for real in-sandbox — round-trip byte-for-byte — and the decode
seams (_decode_pixels, _decode_stub) route real payloads through them
while codec formats keep the deterministic fallback."""

from __future__ import annotations

import numpy as np
import pytest

from hugegraph_on_tikv_spark.functions.multimodal import (
    _decode_pixels,
    _decode_stub,
    _rgb_to_gray,
    _sniff_real,
    decode_bmp,
    decode_media,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
)


def _rgb_fixture(h: int, w: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 test image."""
    i = np.arange(h * w * 3, dtype=np.int64).reshape(h, w, 3)
    return ((i * 37 + 11) % 256).astype(np.uint8)


def test_bmp_round_trip_exact():
    for h, w in ((5, 7), (4, 4), (1, 3)):   # 7 exercises row padding
        rgb = _rgb_fixture(h, w)
        back = decode_bmp(encode_bmp(rgb))
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, rgb)


def test_bmp_top_down_variant():
    rgb = _rgb_fixture(3, 5)
    raw = bytearray(encode_bmp(rgb))
    # flip to top-down: negate height, reorder rows
    import struct

    h, w = 3, 5
    struct.pack_into("<i", raw, 22, -h)
    row_bytes = (3 * w + 3) & ~3
    body = bytes(raw[54:])
    rows = [body[i * row_bytes:(i + 1) * row_bytes] for i in range(h)]
    raw[54:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(raw)), rgb)


def test_bmp_rejects_unsupported():
    rgb = _rgb_fixture(2, 2)
    raw = bytearray(encode_bmp(rgb))
    import struct

    struct.pack_into("<H", raw, 28, 8)      # 8-bit palette
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(raw))
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + bytes(raw[2:]))


def test_ppm_round_trip_and_comments():
    rgb = _rgb_fixture(6, 2)
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    # header comments are legal PPM
    with_comment = b"P6\n# a comment\n2 6\n255\n" + rgb.tobytes()
    assert np.array_equal(decode_ppm(with_comment), rgb)


def test_wav_round_trip_mono_and_stereo():
    mono = (np.arange(100, dtype=np.int64) * 321 - 16000).astype(np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and s.shape == (100, 1)
    assert np.array_equal(s[:, 0], mono)

    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (100, 2)
    assert np.array_equal(s2, stereo)


def test_wav_skips_unknown_chunks():
    import struct

    mono = np.array([1, -2, 3], dtype=np.int16)
    raw = encode_wav(mono, 16000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # padded
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    s, rate = decode_wav(spliced)
    assert np.array_equal(s[:, 0], mono)


def test_sniff_rejects_lookalikes():
    # starts with 'BM' but the size field doesn't match -> stub path
    assert not _sniff_real(b"BM" + b"\x01" * 60)
    # 'P6' without whitespace
    assert not _sniff_real(b"P6x123")
    assert not _sniff_real(b"\x00" * 64)
    rgb = _rgb_fixture(2, 2)
    assert _sniff_real(encode_bmp(rgb))
    assert _sniff_real(encode_ppm(rgb))
    assert _sniff_real(encode_wav(np.array([0], dtype=np.int16)))


def test_decode_media_dispatch_and_codec_gate():
    rgb = _rgb_fixture(3, 3)
    kind, arr = decode_media(encode_ppm(rgb))
    assert kind == "image" and np.array_equal(arr, rgb)
    kind, arr = decode_media(encode_wav(np.array([5, 6], dtype=np.int16)))
    assert kind == "audio" and arr.shape == (2, 1)
    with pytest.raises(NotImplementedError):
        decode_media(b"ID3\x04\x00" + b"\x00" * 32)        # MP3 stays gated
    # JPEG now decodes for real — a JFIF prefix with garbage structure is a
    # ValueError (corrupt), not the NotImplementedError codec gate
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


def test_decode_pixels_seam_real_vs_stub():
    rgb = _rgb_fixture(4, 6)
    # real BMP: header dims win, luma is the exact integer formula
    got = _decode_pixels(encode_bmp(rgb), 999, 999)
    assert np.array_equal(got, _rgb_to_gray(rgb))
    # non-media bytes: the tile stub, honoring the metadata dims
    stub = _decode_pixels(b"\x01\x02\x03\x04", 3, 2)
    assert stub.shape == (2, 3)


def test_feature_seam_real_decode():
    rgb = _rgb_fixture(5, 5)
    f_real = _decode_stub(encode_bmp(rgb))
    gray = _rgb_to_gray(rgb).ravel()
    want = np.bincount(gray % 16, minlength=16).astype(np.float32)
    want = want / want.sum()
    assert np.allclose(f_real, want)
    # raw bytes keep the legacy byte-histogram fallback
    f_stub = _decode_stub(b"\x00\x01\x02\x03" * 8)
    assert abs(float(f_stub.sum()) - 1.0) < 1e-6


def test_resize_images_on_real_bmp(spark):
    """End-to-end: a DataFrame carrying a genuine BMP payload flows through
    resize_images' mapInPandas and comes out with real decoded luma."""
    from hugegraph_on_tikv_spark.functions.multimodal import resize_images

    rgb = _rgb_fixture(8, 8)
    rows = [(1, "image", "image/bmp", bytearray(encode_bmp(rgb)), None, None),
            (2, "image", "application/x-fake", bytearray(b"\x07" * 64), 8, 8)]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, payload binary, "
              "width int, height int")
    out = {r["media_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert set(out) == {1, 2}
    gray = _rgb_to_gray(rgb)
    idx = (np.arange(4) * 2).astype(np.int64)
    want = gray[idx][:, idx].tobytes()
    assert bytes(out[1]["payload"]) == want
    assert out[1]["width"] == 4 and out[1]["height"] == 4


def test_image_stats_real_decode(spark):
    from hugegraph_on_tikv_spark.functions.multimodal import image_stats

    rgb = _rgb_fixture(6, 4)
    gray = _rgb_to_gray(rgb).astype(np.int64)
    rows = [(1, bytearray(encode_bmp(rgb))),
            (2, bytearray(encode_ppm(rgb))),
            (3, bytearray(b"\x00" * 100)),        # undecodable: skipped
            (4, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in image_stats(df).collect()}
    assert set(out) == {1, 2}
    for mid in (1, 2):
        r = out[mid]
        assert (r["width"], r["height"], r["n_pixels"]) == (4, 6, 24)
        assert r["sum_luma"] == int(gray.sum())
        assert r["min_luma"] == int(gray.min())
        assert r["max_luma"] == int(gray.max())


def test_audio_frames_real_decode(spark):
    from hugegraph_on_tikv_spark.functions.multimodal import audio_frames

    n = 2500                                     # 2 full + 1 partial frame
    mono = ((np.arange(n) % 7) * 100 - 300).astype(np.int16)
    stereo = np.stack([mono, mono], axis=1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(mono))),
         (2, bytearray(encode_wav(stereo))),     # averages back to mono
         (3, bytearray(b"RIFFxxxxJUNK"))],       # not WAVE: skipped
        "media_id long, payload binary")
    out = audio_frames(df, frame_len=1024).collect()
    by_key = {(r["media_id"], r["frame"]): r for r in out}
    assert {(m, f) for m, f in by_key} == {(1, 0), (1, 1), (1, 2),
                                           (2, 0), (2, 1), (2, 2)}
    assert by_key[(1, 2)]["n_samples"] == 2500 - 2048
    for f in range(3):
        lo, hi = f * 1024, min((f + 1) * 1024, n)
        seg = mono[lo:hi].astype(np.int64)
        want_sum = int(np.abs(seg).sum())
        assert by_key[(1, f)]["sum_abs"] == want_sum
        assert by_key[(2, f)]["sum_abs"] == want_sum  # stereo mean == mono
        assert by_key[(1, f)]["max_abs"] == int(np.abs(seg).max())
        zc = int(np.count_nonzero(np.signbit(seg[1:]) != np.signbit(seg[:-1])))
        assert by_key[(1, f)]["zero_crossings"] == zc


def _sniff_pass_decode_fail_bmp() -> bytes:
    """A payload that PASSES _sniff_real (size field matches) but FAILS
    decode_media: a valid BMP header rewritten to 8 bits-per-pixel, which
    decode_bmp rejects with NotImplementedError (ADVICE r6 medium)."""
    import struct

    raw = bytearray(encode_bmp(_rgb_fixture(2, 2)))
    struct.pack_into("<H", raw, 28, 8)
    assert _sniff_real(bytes(raw))
    with pytest.raises(NotImplementedError):
        decode_media(bytes(raw))
    return bytes(raw)


def _sniff_pass_decode_fail_wav() -> bytes:
    """'RIFF..WAVE' prefix with a garbage chunk table — _sniff_real accepts
    any such prefix, decode_wav raises on the broken structure."""
    bad = b"RIFF" + b"\x10\x00\x00\x00" + b"WAVE" + b"\x01"  # truncated chunk
    assert _sniff_real(bad)
    with pytest.raises((ValueError, NotImplementedError, Exception)):
        decode_media(bad)
    return bad


def test_sniffed_but_undecodable_falls_back_not_crashes(spark):
    """ADVICE r6 (medium): a payload that passes the magic sniff but fails
    decode must degrade per each consumer's documented contract — byte-
    histogram fallback in extract_features, tile stub in resize_images,
    skipped row in image_stats/audio_frames — NEVER fail the whole job."""
    from hugegraph_on_tikv_spark.functions.multimodal import (
        audio_frames, extract_features, image_stats, resize_images)

    bad_bmp = _sniff_pass_decode_fail_bmp()
    bad_wav = _sniff_pass_decode_fail_wav()
    good = encode_bmp(_rgb_fixture(4, 4))

    # unit seams: fallback, not raise
    f = _decode_stub(bad_bmp)
    want = np.frombuffer(bad_bmp, dtype=np.uint8)
    want_hist = np.bincount(want % 16, minlength=16).astype(np.float32)
    assert np.allclose(f, want_hist / want_hist.sum())
    assert _decode_pixels(bad_bmp, 3, 2).shape == (2, 3)   # tile stub dims

    rows = [(1, "image", "image/bmp", bytearray(good), None, None),
            (2, "image", "image/bmp", bytearray(bad_bmp), 4, 4),
            (3, "audio", "audio/wav", bytearray(bad_wav), None, None)]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, payload binary, "
              "width int, height int")

    feats = {r["media_id"] for r in extract_features(
        df.select("media_id", "kind", "payload")).collect()}
    assert feats == {1, 2, 3}                    # every row survives

    resized = {r["media_id"] for r in resize_images(df, 2, 2).collect()}
    assert resized == {1, 2}                     # bad_bmp uses metadata dims

    stats = {r["media_id"] for r in image_stats(df).collect()}
    assert stats == {1}                          # undecodables skipped

    frames = {r["media_id"] for r in audio_frames(df).collect()}
    assert frames == set()                       # bad wav skipped, no crash


def test_resize_skips_sniffed_undecodable_without_dims(spark):
    """A sniffed-real-but-undecodable payload with NO metadata dims can't
    even tile — it is skipped, not crashed on."""
    from hugegraph_on_tikv_spark.functions.multimodal import resize_images

    bad_bmp = _sniff_pass_decode_fail_bmp()
    df = spark.createDataFrame(
        [(9, "image", "image/bmp", bytearray(bad_bmp), None, None)],
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int")
    assert resize_images(df, 2, 2).collect() == []


# -- PNG: the REAL inflate + unfilter path (stdlib zlib) ---------------------

def test_png_round_trip_every_filter():
    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_png, encode_png)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    for filts in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert np.array_equal(decode_png(encode_png(img, filters=filts)), img)


def test_png_grayscale_replicates_channels():
    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_png, encode_png)

    g = (np.arange(35, dtype=np.int64).reshape(7, 5) * 29 % 256).astype(np.uint8)
    out = decode_png(encode_png(g, filters=[4, 3, 2, 1, 0]))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_png_known_external_vector():
    """The widely-published 1x1 RGBA data-URI PNG: IDAT inflates to
    filter=Sub + bytes (0, 255, 0, 127) — i.e. GREEN at half alpha (the
    'black pixel' folklore is wrong; this test pins the true bytes)."""
    import base64

    from hugegraph_on_tikv_spark.functions.multimodal import decode_png

    b = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
        "+M9QDwADhgGAWjR9awAAAABJRU5ErkJggg==")
    arr = decode_png(b)
    assert arr.shape == (1, 1, 3)
    assert arr.reshape(-1).tolist() == [0, 255, 0]  # alpha discarded


def test_png_third_party_files_decode():
    """Conformance against PNGs this sandbox ships but we did not write
    (Spark's mllib sample images / doc screenshots use mixed real-encoder
    filters); palette PNGs must hit the variant guard, not crash."""
    import os

    from hugegraph_on_tikv_spark.functions.multimodal import decode_png

    cases = [
        ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
         "multi-channel/BGRA.png", (100, 100, 3)),
    ]
    seen = 0
    for path, shape in cases:
        if not os.path.exists(path):
            continue
        arr = decode_png(open(path, "rb").read())
        assert arr.shape == shape
        assert arr.dtype == np.uint8
        seen += 1
    if seen == 0:
        pytest.skip("no third-party PNGs present in this environment")


def test_png_variant_guards():
    import struct as _s
    import zlib

    from hugegraph_on_tikv_spark.functions.multimodal import (
        PNG_SIG, _png_chunk, decode_png)

    def png_with_ihdr(w, h, depth, color, interlace):
        ihdr = _s.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
        idat = zlib.compress(b"\x00" * (h * (w + 1)))
        return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))

    with pytest.raises(NotImplementedError):   # palette
        decode_png(png_with_ihdr(2, 2, 8, 3, 0))
    with pytest.raises(NotImplementedError):   # 16-bit
        decode_png(png_with_ihdr(2, 2, 16, 2, 0))
    with pytest.raises(NotImplementedError):   # Adam7
        decode_png(png_with_ihdr(2, 2, 8, 2, 1))
    with pytest.raises(ValueError):            # not a PNG at all
        decode_png(b"nope")
    with pytest.raises(ValueError):            # size mismatch
        bad = png_with_ihdr(5, 5, 8, 2, 0)     # IDAT sized for gray, not RGB
        decode_png(bad)


def test_png_dispatch_and_image_stats(spark):
    from hugegraph_on_tikv_spark.functions.multimodal import (
        _sniff_real, decode_media, encode_png, image_stats)

    img = _rgb_fixture(6, 4)
    p = encode_png(img, filters=[0, 1, 2, 3, 4])
    assert _sniff_real(p)
    kind, arr = decode_media(p)
    assert kind == "image" and np.array_equal(arr, img)

    df = spark.createDataFrame([(1, bytearray(p))],
                               "media_id long, payload binary")
    row = image_stats(df).collect()[0]
    luma = ((299 * img[..., 0].astype(np.int64)
             + 587 * img[..., 1].astype(np.int64)
             + 114 * img[..., 2].astype(np.int64)) // 1000)
    assert row.sum_luma == int(luma.sum())
    assert (row.width, row.height, row.n_pixels) == (4, 6, 24)


# -- GIF: the REAL LZW multi-frame ("video") path ----------------------------

def test_gif_round_trip_multiframe():
    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_gif, encode_gif)

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    frames = [rng.integers(0, 256, (17, 11), dtype=np.uint8)
              for _ in range(3)]
    out = decode_gif(encode_gif(frames, pal))
    assert len(out) == 3
    for idx, rgb in zip(frames, out):
        assert np.array_equal(rgb, pal[idx])


def test_gif_lzw_dictionary_growth_and_reset():
    """A 16k-pixel frame forces the LZW dictionary through every code
    width up to 12 bits (and past 4096 entries on random data)."""
    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_gif, encode_gif)

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    frame = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    out = decode_gif(encode_gif([frame], pal))
    assert np.array_equal(out[0], pal[frame])


def test_gif_third_party_files_decode():
    """Conformance against GIFs this sandbox ships but we did not write —
    idlelib icons include both plain and INTERLACED files."""
    import glob
    import os

    files = sorted(glob.glob(
        "/root/.pyenv/versions/3.11.7/lib/python3.11/idlelib/Icons/*.gif"))
    if not files:
        pytest.skip("no third-party GIFs present")
    from hugegraph_on_tikv_spark.functions.multimodal import decode_gif

    decoded = 0
    for path in files:
        frames = decode_gif(open(path, "rb").read())
        assert frames and frames[0].dtype == np.uint8
        assert frames[0].ndim == 3 and frames[0].shape[2] == 3
        decoded += 1
    assert decoded == len(files)     # interlace included — no guards left


def test_gif_dispatch_and_video_frame_stats(spark):
    from hugegraph_on_tikv_spark.functions.multimodal import (
        _sniff_real, decode_media, encode_gif, video_frame_stats)

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)  # gray pal
    frames = [(np.arange(24, dtype=np.uint8).reshape(4, 6) + 10 * f)
              for f in range(2)]
    g = encode_gif(frames, pal)
    assert _sniff_real(g)
    kind, arr = decode_media(g)
    assert kind == "video" and arr.shape == (2, 4, 6, 3)

    df = spark.createDataFrame([(7, bytearray(g))],
                               "media_id long, payload binary")
    rows = sorted(video_frame_stats(df).collect(), key=lambda r: r.frame)
    assert [r.frame for r in rows] == [0, 1]
    for f, r in zip(frames, rows):
        # gray palette: luma of (v,v,v) is exactly v
        assert r.sum_luma == int(f.astype(np.int64).sum())
        assert (r.width, r.height) == (6, 4)
        assert (r.min_luma, r.max_luma) == (int(f.min()), int(f.max()))


def test_gif_transparency_composites_over_previous_frame():
    from hugegraph_on_tikv_spark.functions.multimodal import decode_gif
    import struct as _s

    from hugegraph_on_tikv_spark.functions.multimodal import _lzw_encode

    # hand-build a 2-frame GIF where frame 2 marks index 1 transparent
    pal = b"\x10\x20\x30" + b"\xAA\xBB\xCC" + b"\x00" * (3 * 2)
    f1 = bytes([0, 0, 0, 0])                  # 2x2 all color 0
    f2 = bytes([1, 0, 1, 0])                  # color0 at odd cells, transp=1
    out = bytearray(b"GIF89a")
    out += _s.pack("<HHBBB", 2, 2, 0x81, 0, 0) + pal
    for data, transp in ((f1, None), (f2, 1)):
        if transp is not None:
            out += _s.pack("<BBBBHB", 0x21, 0xF9, 4, 1, 0, transp) + b"\x00"
        out += _s.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
        lzw = _lzw_encode(data, 2)
        out += bytes([2, len(lzw)]) + lzw + b"\x00"
    out.append(0x3B)
    frames = decode_gif(bytes(out))
    assert len(frames) == 2
    base = np.array([0x10, 0x20, 0x30], dtype=np.uint8)
    assert np.array_equal(frames[0], np.tile(base, (2, 2, 1)))
    # frame 2: transparent cells (index 1) keep frame 1's color
    assert np.array_equal(frames[1], np.tile(base, (2, 2, 1)))


def test_dhash48_pure_properties():
    from hugegraph_on_tikv_spark.functions.multimodal import dhash48

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(32, 40), dtype=np.uint8).astype(np.uint8)
    h = dhash48(img)
    assert 0 <= h < (1 << 48)
    # deterministic
    assert dhash48(img) == h
    # a uniform +10 brightness shift moves every block average by exactly
    # +10, preserving all pairwise orderings -> identical hash
    assert dhash48(np.clip(img, 0, 235) + 10) == dhash48(np.clip(img, 0, 235))
    # a very different image gives a very different hash
    other = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
    assert bin(h ^ dhash48(other)).count("1") > 8


def test_phash_catches_reencoded_duplicate_bytes_miss(spark):
    """The planted cross-container pair: identical pixels as BMP and PNG.
    Byte-level dedup (exact fingerprints AND byte-simhash pairs) must MISS
    it; perceptual dHash must land it at hamming 0."""
    from hugegraph_on_tikv_spark.functions.multimodal import (
        encode_bmp, encode_png, image_near_pairs, media_exact_dup_groups,
        media_near_pairs)

    t = np.arange(11 * 13 * 3, dtype=np.int64)
    base = ((t * 37 + 11) % 256).astype(np.uint8).reshape(11, 13, 3)
    media = spark.createDataFrame(
        [(1, bytearray(encode_bmp(base))),
         (2, bytearray(encode_png(base, filters=[0, 1, 2, 3, 4])))],
        "media_id long, payload binary")
    # byte-level: no exact group, no near pair (disjoint containers)
    assert media_exact_dup_groups(media).count() == 0
    byte_pairs = {(r["media_a"], r["media_b"])
                  for r in media_near_pairs(media, max_hamming=8).collect()}
    assert (1, 2) not in byte_pairs
    # perceptual: hamming 0
    got = {(r["media_a"], r["media_b"]): r["hamming"]
           for r in image_near_pairs(media, max_hamming=6).collect()}
    assert got == {(1, 2): 0}


def test_image_dhash_gif_cross_container(spark):
    """A single-frame GIF whose palette reproduces the BMP's exact pixels
    hashes identically — palette indirection is exact."""
    from hugegraph_on_tikv_spark.functions.multimodal import (
        encode_bmp, encode_gif, image_dhash)

    # image over a 16-color palette so the GIF can encode it exactly
    pal = np.stack([(np.arange(256) * 7 + 1) % 256,
                    (np.arange(256) * 11 + 3) % 256,
                    (np.arange(256) * 13 + 5) % 256], axis=1).astype(np.uint8)
    idx = ((np.arange(9 * 12) * 5 + 2) % 256).astype(np.uint8).reshape(9, 12)
    rgb = pal[idx]
    media = spark.createDataFrame(
        [(1, bytearray(encode_bmp(rgb))),
         (2, bytearray(encode_gif([idx], pal)))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    assert rows[1] == rows[2]
    # and audio / undecodable rows are simply absent
    media2 = spark.createDataFrame(
        [(3, bytearray(b"\x00" * 64))], "media_id long, payload binary")
    assert image_dhash(media2).count() == 0


# -- baseline JPEG: the REAL entropy-coded codec (round 9) -------------------


def _block_mosaic(h: int, w: int, mul: int = 40, add: int = 23,
                  per_row: int = 3) -> np.ndarray:
    """Grayscale image constant on every 8x8 block of the PADDED grid —
    DC-only DCT, so the all-ones-quant JPEG round trip is bit-exact."""
    r, c = np.mgrid[0:h, 0:w]
    return (((r // 8) * per_row + (c // 8)) * mul + add).astype(np.uint8)


def test_jpeg_bit_exact_on_block_constant_mosaics():
    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_jpeg, encode_jpeg)

    ones = np.ones((8, 8), dtype=np.int64)
    for h, w in ((16, 24), (11, 13), (8, 8), (1, 1), (7, 30)):
        gray = _block_mosaic(h, w)
        out = decode_jpeg(encode_jpeg(gray, quant_luma=ones))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, np.repeat(gray[..., None], 3, axis=-1))


def test_jpeg_entropy_coding_is_real():
    """The payload is genuinely entropy-coded: Huffman-compressed mosaics
    beat raw size, byte stuffing appears on 0xFF-producing content, and
    the stream survives a destuff/re-decode."""
    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_jpeg, encode_jpeg)

    y, x = np.mgrid[0:64, 0:64]
    smooth = (128 + 60 * np.sin(x / 10.0) * np.cos(y / 12.0)).astype(np.uint8)
    p = encode_jpeg(smooth)
    assert len(p) < smooth.size // 2          # real compression
    back = decode_jpeg(p)[..., 0].astype(np.float64)
    mse = ((back - smooth.astype(np.float64)) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) > 35.0
    # stuffing: some fixture in this family produces 0xFF entropy bytes
    rng = np.random.RandomState(7)
    seen_stuffed = False
    for _ in range(20):
        img = rng.randint(0, 256, size=(24, 24)).astype(np.uint8)
        q = encode_jpeg(img)
        seen_stuffed |= b"\xff\x00" in q[20:]
        assert decode_jpeg(q).shape == (24, 24, 3)
    assert seen_stuffed


def test_jpeg_color_round_trip_lossy_bounds():
    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_jpeg, encode_jpeg)

    y, x = np.mgrid[0:24, 0:40]
    rgb = np.stack([(y * 4 + 8) % 256, (x * 3 + 50) % 256,
                    ((x + y) * 2 + 100) % 256], axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb))
    assert out.shape == rgb.shape
    mse = ((out.astype(np.float64) - rgb.astype(np.float64)) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) > 28.0
    # deterministic across encodes
    assert encode_jpeg(rgb) == encode_jpeg(rgb)


def test_jpeg_variant_guards_and_fuzz_contract():
    from hugegraph_on_tikv_spark.functions.multimodal import (
        _DECODE_ERRORS, decode_jpeg, encode_jpeg)

    p = encode_jpeg(_block_mosaic(8, 16))
    # progressive SOF2 -> NotImplementedError
    bad = bytearray(p)
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(bad))
    # every truncation / byte corruption fails inside _DECODE_ERRORS
    for n in range(2, len(p), 5):
        try:
            decode_jpeg(p[:n])
        except _DECODE_ERRORS:
            pass
    for i in range(2, len(p), 7):
        q = bytearray(p)
        q[i] ^= 0xFF
        try:
            decode_jpeg(bytes(q))
        except _DECODE_ERRORS:
            pass
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")


def test_jpeg_dispatch_image_stats_formula(spark):
    """decode_media routes JPEG; image_stats over the bit-exact mosaic
    reproduces the generating integer formula (luma of replicated gray g
    is exactly g) — the roster-oracle contract."""
    from hugegraph_on_tikv_spark.functions.multimodal import (
        _sniff_real, decode_media, encode_jpeg, image_stats)

    gray = _block_mosaic(16, 24)
    p = encode_jpeg(gray, quant_luma=np.ones((8, 8), dtype=np.int64))
    assert _sniff_real(p)
    kind, arr = decode_media(p)
    assert kind == "image" and arr.shape == (16, 24, 3)
    media = spark.createDataFrame([(600, bytearray(p))],
                                  "media_id long, payload binary")
    row = image_stats(media).collect()[0]
    g = gray.astype(np.int64)
    assert (row["width"], row["height"]) == (24, 16)
    assert row["sum_luma"] == int(g.sum())
    assert row["min_luma"] == int(g.min())
    assert row["max_luma"] == int(g.max())


def test_jpeg_dhash_cross_container_bytes_miss(spark):
    """A grayscale JPEG of the same pixels as an RGB-replicated BMP: byte
    dedup misses (disjoint containers), perceptual dHash lands hamming 0 —
    the entropy-coded twin of the BMP/PNG planted pair."""
    from hugegraph_on_tikv_spark.functions.multimodal import (
        encode_bmp, encode_jpeg, image_near_pairs, media_exact_dup_groups)

    gray = _block_mosaic(11, 13, mul=60, add=17, per_row=2)
    rgb = np.repeat(gray[..., None], 3, axis=-1)
    media = spark.createDataFrame(
        [(1, bytearray(encode_bmp(rgb))),
         (2, bytearray(encode_jpeg(gray,
                                   quant_luma=np.ones((8, 8), np.int64))))],
        "media_id long, payload binary")
    assert media_exact_dup_groups(media).count() == 0
    got = {(r["media_a"], r["media_b"]): r["hamming"]
           for r in image_near_pairs(media, max_hamming=6).collect()}
    assert got == {(1, 2): 0}


# -- IMA ADPCM: REAL compressed audio (round 9) ------------------------------


def test_adpcm_round_trip_snr_and_ratio():
    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_wav, encode_wav_adpcm)

    t = np.arange(5000)
    sig = (12000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    p = encode_wav_adpcm(sig)
    s, rate = decode_wav(p)
    assert rate == 16000 and s.shape == (5000, 1)
    err = s[:, 0].astype(np.float64) - sig.astype(np.float64)
    snr = 10 * np.log10((sig.astype(np.float64) ** 2).mean()
                        / (err ** 2).mean())
    assert snr > 25.0                          # real ADPCM quality
    assert len(p) < sig.nbytes // 3            # real ~4:1 compression
    assert encode_wav_adpcm(sig) == p          # deterministic
    # odd-length tail exercises the padded final nibble + fact-chunk crop
    s2, _ = decode_wav(encode_wav_adpcm(sig[:2501]))
    assert s2.shape == (2501, 1)


def test_adpcm_state_machine_hand_vector():
    """Encoder/decoder steps computed by hand.  Block header carries
    predictor=1000, index=0 (step=7).  Target 1010: diff=10 >= 7 sets 4
    (rem 3), 3 >= 7>>1=3 sets 2 (rem 0) -> nibble 6, vpdiff = 0+7+3 = 10
    -> predictor exactly 1010, index += table[6] = +6 (step 13).  Target
    900: diff=-110 -> 110>=13 (rem 97), 97>=6 (rem 91), 91>=3 -> nibble
    0xF, vpdiff = 1+13+6+3 = 23 -> predictor 987, index 6+8=14."""
    from hugegraph_on_tikv_spark.functions.multimodal import (
        _ima_step, decode_wav, encode_wav_adpcm)

    assert _ima_step(1000, 0, 0x6) == (1010, 6)
    assert _ima_step(1010, 6, 0xF) == (987, 14)
    assert _ima_step(1000, 0, 0x1) == (1001, 0)  # vpdiff 0+1, index clamps
    sig = np.array([1000, 1010, 900], dtype=np.int16)
    s, _ = decode_wav(encode_wav_adpcm(sig))
    assert s[0, 0] == 1000                     # header carries sample 0
    assert s[1, 0] == 1010                     # exact hit from hand calc
    assert s[2, 0] == 987                      # 1010 - 23


def test_adpcm_dispatch_audio_frames_and_guards(spark):
    from hugegraph_on_tikv_spark.functions.multimodal import (
        _DECODE_ERRORS, _sniff_real, audio_frames, decode_media,
        decode_wav, encode_wav_adpcm)

    sig = ((np.arange(2500) % 7) * 100 - 300).astype(np.int16)
    p = encode_wav_adpcm(sig)
    assert _sniff_real(p)
    kind, arr = decode_media(p)
    assert kind == "audio" and arr.shape == (2500, 1)
    # the Spark stats operator consumes the REAL decoded samples
    media = spark.createDataFrame([(700, bytearray(p))],
                                  "media_id long, payload binary")
    rows = {r["frame"]: r for r in audio_frames(media, 1024).collect()}
    dec = arr[:, 0].astype(np.int64)
    for f in (0, 1, 2):
        fr = dec[f * 1024:(f + 1) * 1024]
        assert rows[f]["sum_abs"] == int(np.abs(fr).sum())
        assert rows[f]["max_abs"] == int(np.abs(fr).max())
    # stereo ADPCM stays gated; corrupt index is a ValueError
    with pytest.raises(ValueError):
        encode_wav_adpcm(np.array([], dtype=np.int16))
    for n in range(2, len(p), 41):
        try:
            decode_wav(p[:n])
        except _DECODE_ERRORS:
            pass


def test_rice_codec_lossless_roundtrip_and_dispatch(spark):
    """Rice/fixed-predictor audio: decode(encode(s)) == s bit-for-bit for
    constant / linear / noisy / negative-heavy signals; smooth signals
    COMPRESS (the codec is real, not a container); the 'RIC1' magic routes
    through decode_media and the Spark stats operator; truncation and
    corruption fail as _DECODE_ERRORS, never wrong data."""
    from hugegraph_on_tikv_spark.functions.multimodal import (
        _DECODE_ERRORS, _sniff_real, audio_frames, decode_media,
        decode_rice, encode_wav_rice)

    j = np.arange(3000, dtype=np.int64)
    signals = {
        "constant": np.full(3000, -123, dtype=np.int64),
        "ramp": (j * 3 - 4000) % 30000 - 15000,
        "smooth": ((j * 11 + 5) % 29) * 90 - 1250,
        "noisy": ((j * j * 7919 + j * 104729) % 65536) - 32768,
        "short": np.array([5]), "two": np.array([7, -9]),
    }
    for name, s in signals.items():
        s16 = s.astype(np.int16)
        enc = encode_wav_rice(s16, block_samples=512)
        dec, rate = decode_rice(enc)
        assert (dec[:, 0] == s16).all(), name
        assert rate == 16_000
    # real compression on the predictable signals
    assert len(encode_wav_rice(signals["constant"].astype(np.int16))) \
        < 3000 * 2 // 4
    assert len(encode_wav_rice(signals["smooth"].astype(np.int16))) \
        < 3000 * 2
    # dispatch + Spark stats over the real decoded samples
    p = encode_wav_rice(signals["smooth"].astype(np.int16))
    assert _sniff_real(p)
    kind, arr = decode_media(p)
    assert kind == "audio" and arr.shape == (3000, 1)
    media = spark.createDataFrame([(800, bytearray(p))],
                                  "media_id long, payload binary")
    rows = {r["frame"]: r for r in audio_frames(media, 1024).collect()}
    dec = arr[:, 0].astype(np.int64)
    for f in (0, 1, 2):
        fr = dec[f * 1024:(f + 1) * 1024]
        assert rows[f]["sum_abs"] == int(np.abs(fr).sum())
    # corruption / truncation surface as gated decode errors
    with pytest.raises(_DECODE_ERRORS):
        encode_wav_rice(np.array([], dtype=np.int16))
    for n in range(4, len(p), 97):
        try:
            decode_rice(p[:n])
        except _DECODE_ERRORS:
            pass
    bad = bytearray(p)
    bad[20] ^= 0xFF
    try:
        got, _ = decode_rice(bytes(bad))
        assert got.shape == (3000, 1)   # validated shape even if bits flip
    except _DECODE_ERRORS:
        pass


def test_rice_spike_in_quiet_large_block_round_trips():
    """ADVICE r9: a single spike dominating a quiet block used to trip the
    fixed 1<<16 unary guard once block_samples >= ~16k (q approaches
    4*block_samples).  The guard is now derived from block_samples (a
    provable invariant), so every valid int16 input encodes."""
    import numpy as np

    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_rice, encode_wav_rice)

    for n in (512, 16_384, 32_768):
        s = np.zeros(n, dtype=np.int16)
        s[n // 2] = 32_767
        s[n // 2 + 1] = -32_768       # worst-case order-1/2 residual swing
        enc = encode_wav_rice(s, block_samples=n)
        got, rate = decode_rice(enc)
        assert rate == 16_000
        np.testing.assert_array_equal(got[:, 0], s)
