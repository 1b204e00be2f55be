"""Adversarial-bytes property tests over the codec dispatch
(VERDICT r10 #7): random byte flips and truncations of valid
container streams must either decode to a shape-consistent result or
raise one of the DOCUMENTED error types the feature kernels catch
(NotImplementedError / ValueError / IndexError / KeyError) — never an
uncaught exception (which would kill a Spark task: at 100 TB every
corrupt file in the corpus is a guaranteed event, and the contract is
"one bad clip never kills the scan"), and never a pathological spin
(the round-11 fuzz pass caught a corrupt TIFF tag count driving a
2^32-iteration IFD value read — 222 s on one file — plus PNG leaking
struct.error / zlib.error past the kernels' catch tuple; both fixed
and pinned here).

Deterministic seeded mutations (no hypothesis dependency needed — the
corpus and RNG are fixed, so a failure is perfectly reproducible)."""

from __future__ import annotations

import random
import zlib
import time

import numpy as np
import pytest

from ssp_spark.operators import multimodal as mm
from ssp_spark.operators.flac import encode_flac
from ssp_spark.operators.webp import encode_webp_lossless

ALLOWED = (NotImplementedError, ValueError, IndexError, KeyError)

# per-call wall budget: these are <=2 KB inputs; a clean decode takes
# microseconds-to-milliseconds, so one full second already means a
# data-sized loop escaped its bounds (the TIFF spin read 222 s)
TIME_BUDGET_S = 5.0


def _tiff_tiled_1bit(bits_img) -> bytes:
    """Minimal valid 1-bit TILED TIFF (the r12 decode path): one
    byte-padded-row tile per 16x16 block, hand-assembled IFD — the
    writer has no 1-bit mode, so the fuzz seed is built here from the
    same layout the hand goldens in test_multimodal.py pin."""
    import struct

    h, w = bits_img.shape
    tw = tl = 16
    ta, td = (w + tw - 1) // tw, (h + tl - 1) // tl
    rowb = (tw + 7) // 8
    tiles = []
    for ty in range(td):
        for tx in range(ta):
            block = np.zeros((tl, tw), dtype=np.uint8)
            sub = bits_img[ty * tl : ty * tl + tl, tx * tw : tx * tw + tw]
            block[: sub.shape[0], : sub.shape[1]] = sub
            tiles.append(np.packbits(block, axis=1)[:, :rowb].tobytes())
    body = b"".join(tiles)
    offs, pos = [], 8
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    entries = [
        (256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, 1, [1]),
        (259, 3, 1, [1]), (262, 3, 1, [1]), (277, 3, 1, [1]),
        (322, 4, 1, [tw]), (323, 4, 1, [tl]),
        (324, 4, len(offs), offs),
        (325, 4, len(tiles), [len(t) for t in tiles]),
    ]
    ifd_off = 8 + len(body)
    out = bytearray(b"II") + struct.pack("<HI", 42, ifd_off) + body
    ents = sorted(entries)
    over_off = ifd_off + 2 + 12 * len(ents) + 4
    over = bytearray()
    out += struct.pack("<H", len(ents))
    for tag, typ, cnt, vals in ents:
        out += struct.pack("<HHI", tag, typ, cnt)
        cell = bytearray()
        for v in vals:
            cell += struct.pack("<" + ("H" if typ == 3 else "I"), v)
        if len(cell) <= 4:
            out += cell + b"\x00" * (4 - len(cell))
        else:
            out += struct.pack("<I", over_off + len(over))
            over += cell
    out += struct.pack("<I", 0)
    return bytes(out + over)


def _corpus() -> dict[str, tuple[bytes, bool]]:
    """{name: (valid_stream, is_audio)} — one real stream per container
    the dispatch supports, built by the module's own writers."""
    rng = np.random.RandomState(3)
    img = np.repeat(
        np.repeat(rng.randint(0, 256, (4, 5, 3)).astype(np.uint8), 8, 0), 8, 1
    )
    gray = img[:, :, 0].copy()
    pal = np.stack([np.arange(128, dtype=np.uint8)] * 3, 1)
    cb = np.zeros((2, 2, 8, 8), dtype=np.int64)
    cb[:, :, 0, 0] = 7
    return {
        "ppm": (b"P6\n40 32\n255\n" + img.tobytes(), False),
        "pgm": (b"P5\n40 32\n255\n" + gray.tobytes(), False),
        "pgm_ascii": (b"P2\n40 32\n255\n" + " ".join(
            str(int(v)) for v in gray.ravel()).encode(), False),
        "pbm": (b"P4\n40 32\n" + np.packbits(
            (gray > 127).astype(np.uint8), axis=1).tobytes(), False),
        "wav_float": (mm.encode_wav(
            (np.arange(100, dtype="<f4") / 100).tobytes(), 3, 1, 8000, 32),
            True),
        "png": (mm.encode_png(img), False),
        "gif": (mm.encode_gif((gray % 128).astype(np.uint8), pal,
                              interlace=True), False),
        "webp": (encode_webp_lossless(img, cache_bits=5), False),
        "qoi": (__import__(
            "ssp_spark.operators.qoi", fromlist=["encode_qoi"]
        ).encode_qoi(img), False),
        "tiff": (mm.encode_tiff(gray), False),
        "tiff_tiled": (mm.encode_tiff(img, tiles=(16, 16),
                                      compression=32773), False),
        "tiff_planar": (mm.encode_tiff(img, planar=2, rows_per_strip=8,
                                       compression=5, predictor=2), False),
        "tiff_tiled_1bit": (_tiff_tiled_1bit(gray > 127), False),
        "bmp_rle8": (mm.encode_bmp8((gray % 128).astype(np.uint8), pal,
                                    rle=True), False),
        "jpeg": (mm.encode_jpeg_gray_coeffs(cb), False),
        "wav_pcm": (mm.encode_wav(
            np.arange(200, dtype="<i2").tobytes(), 1, 1, 8000, 16), True),
        # round-13 corpus growth (VERDICT r12 #5): the three decode
        # paths the matrix had no mutation entry for — raw (non-RLE)
        # 8-bit BMP, indexed PNG, and 24-bit PCM WAV
        "bmp8_raw": (mm.encode_bmp8((gray % 128).astype(np.uint8), pal,
                                    rle=False), False),
        "png_palette": (mm.encode_png_palette(
            (gray % 128).astype(np.uint8), pal), False),
        "wav_pcm24": (mm.encode_wav(
            bytes(x & 0xFF for x in range(300)), 1, 1, 8000, 24), True),
        # second round-13 wave: the remaining dispatch paths with no
        # mutation entry — 4:2:0 chroma JPEG, progressive JPEG, IMA
        # ADPCM WAV, 8-bit PCM WAV, and 16-bit Adam7 PNG
        "jpeg420": (mm.encode_jpeg_ycbcr420_coeffs(
            np.zeros((4, 4, 8, 8), dtype=np.int64) + np.eye(8, dtype=np.int64) * 5,
            cb, cb), False),
        "jpeg_progressive": (mm.encode_jpeg_gray_coeffs_progressive(cb),
                             False),
        "wav_adpcm": (mm.encode_wav(
            (-1000).to_bytes(2, "little", signed=True) + bytes([30, 0])
            + bytes([0x17, 0x80, 0xF3, 0x2A, 0x91, 0x06, 0x5C, 0xE8])
            + (500).to_bytes(2, "little", signed=True) + bytes([62, 0])
            + bytes([0x00, 0xFF, 0x42, 0x13, 0x7A, 0xC5, 0x2E, 0x99]),
            0x11, 1, 8000, 4, block_align=12,
            extra=(17).to_bytes(2, "little")), True),
        "wav_pcm8": (mm.encode_wav(bytes(range(200)), 1, 1, 8000, 8),
                     True),
        "png16_adam7": (mm.encode_png_gray16_adam7(
            (np.arange(40 * 32, dtype=np.uint16) * 97 % 65536)
            .reshape(32, 40)), False),
        "flac": (encode_flac(list(range(50)), sample_rate=8000, bps=16),
                 True),
        # every byte is a valid G.711 code, so the payload is arbitrary
        "wav_g711_mu": (mm.encode_wav(bytes(range(256)), 7, 1, 8000, 8),
                        True),
        "wav_g711_a": (mm.encode_wav(bytes(range(256)), 6, 1, 8000, 8),
                       True),
    }


def _mutate(data: bytes, rnd: random.Random) -> bytes:
    """One seeded corruption of a valid stream. Modes 0-2 are the
    original r11 matrix (flip / truncate / flip+truncate); modes 3-4
    are the r13 additions targeting LENGTH-FIELD DESYNC — insertion
    shifts every downstream offset, splice duplicates a chunk's bytes
    over another region — the corruption class byte flips can't
    produce (a flipped length field still points at real bytes; an
    insertion makes every subsequent length/offset lie)."""
    b = bytearray(data)
    mode = rnd.randrange(5)
    if mode == 0:  # flip 1-4 bytes
        for _ in range(rnd.randrange(1, 5)):
            b[rnd.randrange(len(b))] = rnd.randrange(256)
    elif mode == 1:  # truncate anywhere
        b = b[: rnd.randrange(1, len(b))]
    elif mode == 2:  # flip then truncate
        for _ in range(rnd.randrange(1, 3)):
            b[rnd.randrange(len(b))] = rnd.randrange(256)
        b = b[: rnd.randrange(8, len(b) + 1)]
    elif mode == 3:  # insert 1-8 random bytes at a random position
        at = rnd.randrange(len(b) + 1)
        ins = bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 9)))
        b[at:at] = ins
    else:  # splice: copy a random slice over another position
        n = rnd.randrange(1, min(len(b), 32) + 1)
        src = rnd.randrange(len(b) - n + 1)
        dst = rnd.randrange(len(b) - n + 1)
        b[dst : dst + n] = b[src : src + n]
    return bytes(b)


@pytest.mark.parametrize("name", sorted(_corpus()))
def test_fuzzed_streams_raise_only_documented_errors(name):
    data, is_audio = _corpus()[name]
    decode = mm.decode_audio if is_audio else mm.decode_image
    # zlib.crc32, NOT hash(): str hash is salted per process, so the
    # old seed made failures vanish on re-run (found in r12 when the
    # new bmp_rle8 entry failed in-suite but passed in isolation —
    # the "fully reproducible" claim below was false until this)
    rnd = random.Random(zlib.crc32(name.encode()) & 0xFFFF)
    for trial in range(150):
        b = _mutate(data, rnd)
        t0 = time.monotonic()
        try:
            out = decode(bytes(b))
            if is_audio:
                samples, rate = out
                assert samples.ndim == 2 and rate > 0
            else:
                assert out.ndim == 3 and out.shape[2] == 3
                assert out.dtype == np.uint8
        except ALLOWED:
            pass
        # anything else propagates and fails the test with the trial's
        # seed baked into `name` + loop order — fully reproducible
        assert time.monotonic() - t0 < TIME_BUDGET_S, (
            f"{name} trial {trial}: decode exceeded {TIME_BUDGET_S}s "
            f"on a {len(b)}-byte corrupt stream — unbounded loop"
        )


def test_tiff_huge_tag_count_rejected_fast():
    """The exact round-11 finding, pinned directly: an IFD entry whose
    32-bit count points past EOF must raise ValueError BEFORE
    materializing the value list (the unguarded read spun for 222 s)."""
    gray = np.arange(40 * 32, dtype=np.uint8).reshape(32, 40)
    data = bytearray(mm.encode_tiff(gray))
    ifd = int.from_bytes(data[4:8], "little")
    nent = int.from_bytes(data[ifd:ifd + 2], "little")
    # find the StripByteCounts (279) entry and corrupt its count field
    for i in range(nent):
        e = ifd + 2 + 12 * i
        if int.from_bytes(data[e:e + 2], "little") == 279:
            data[e + 4:e + 8] = (0x40000000).to_bytes(4, "little")
            break
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="beyond end of file"):
        mm.decode_image(bytes(data))
    assert time.monotonic() - t0 < 1.0


def _walker_corpus():
    """Valid seed streams for the FRAME-WALKER surfaces (iter_y4m_frames
    / iter_ppm_frames / iter_gif_frames) — generators, not decode_image,
    so the main corpus harness can't cover them (r12)."""
    rng = np.random.RandomState(3)
    gray = np.repeat(
        np.repeat(rng.randint(0, 256, (4, 5)).astype(np.uint8), 8, 0), 8, 1
    )
    pal = np.stack([np.arange(128, dtype=np.uint8)] * 3, 1)
    w, h = 16, 8
    frame = bytes(w * h) + bytes((w // 2) * (h // 2)) * 2
    y4m = b"YUV4MPEG2 W16 H8 F25:1 C420jpeg\n" + (b"FRAME\n" + frame) * 3
    ppm = (b"P6\n16 8\n255\n" + bytes(16 * 8 * 3)) * 3
    anim = mm.encode_gif_anim(
        [(gray % 128).astype(np.uint8), ((gray + 7) % 128).astype(np.uint8)],
        pal, [5, 7],
    )
    return {
        "y4m": (y4m, mm.iter_y4m_frames),
        "ppm_stream": (ppm, mm.iter_ppm_frames),
        "gif_anim": (anim, mm.iter_gif_frames),
    }


@pytest.mark.parametrize("name", sorted(_walker_corpus()))
def test_fuzzed_frame_walkers_bounded(name):
    """Frame walkers under the same mutation matrix as the decode
    corpus: each walk must terminate, yield a bounded frame count, and
    raise only the documented error types — a corrupt header must never
    walk backward or spin (the Y4M negative-width loop was constructible
    before the r12 guard)."""
    data, walker = _walker_corpus()[name]
    rnd = random.Random(zlib.crc32(name.encode()) & 0xFFFF)
    for trial in range(150):
        b = _mutate(data, rnd)
        t0 = time.monotonic()
        try:
            n = 0
            for _item in walker(b):
                n += 1
                assert n < 10000, f"{name}: unbounded frame walk"
        except ALLOWED:
            pass
        assert time.monotonic() - t0 < TIME_BUDGET_S


def test_wav_zero_channels_raises_valueerror():
    """The r12 G.711 fuzz find, pinned directly: a fmt chunk declaring
    0 channels (or a 0 sample rate) must raise ValueError, not the
    ZeroDivisionError every per-format `len(raw) // channels` used to
    throw (outside the kernels' catch set)."""
    data = bytearray(mm.encode_wav(bytes(range(64)), 7, 1, 8000, 8))
    fmt_at = data.index(b"fmt ") + 8
    for field_off, label in ((2, "channels"), (4, "rate")):
        b = bytearray(data)
        width = 2 if field_off == 2 else 4
        b[fmt_at + field_off : fmt_at + field_off + width] = bytes(width)
        with pytest.raises(ValueError, match="zero channels or sample"):
            mm.decode_audio(bytes(b))


def test_y4m_negative_width_raises():
    """Negative W makes the fixed frame size negative, which would step
    iter_y4m_frames BACKWARD — the constructible infinite loop the r12
    guard closes."""
    bad = b"YUV4MPEG2 W-16 H8 F25:1 C420jpeg\n" + b"FRAME\n" + bytes(64)
    with pytest.raises(ValueError, match="non-positive dimensions"):
        list(mm.iter_y4m_frames(bad))


def test_tiff_huge_dimensions_rejected_before_allocation():
    """The round-12 fuzz find, pinned directly: a corrupt width/height
    tag must raise ValueError BEFORE the tiled/planar paths allocate
    the (h, w, spp) sample grid (the unguarded planar path attempted a
    329 GiB np.zeros — MemoryError is not in the kernels' documented
    catch set, so it would kill a scan task)."""
    gray = np.arange(40 * 32, dtype=np.uint8).reshape(32, 40)
    rgb = np.stack([gray] * 3, axis=2)
    data = bytearray(mm.encode_tiff(rgb, planar=2, rows_per_strip=8))
    ifd = int.from_bytes(data[4:8], "little")
    nent = int.from_bytes(data[ifd:ifd + 2], "little")
    for i in range(nent):
        e = ifd + 2 + 12 * i
        if int.from_bytes(data[e:e + 2], "little") == 256:  # ImageWidth
            data[e + 8:e + 12] = (0xD6000000).to_bytes(4, "little")
            break
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="unreasonable dimensions"):
        mm.decode_image(bytes(data))
    assert time.monotonic() - t0 < 1.0


def test_wav_float_nan_inf_decode_deterministic():
    """Float32 WAV with NaN/+inf/-inf samples: NaN.astype(int16) is
    platform-undefined, so the decoder must map NaN to 0 and let the
    infinities clamp at the int16 rails (r12 fuzz find — corrupt float
    streams decoded to platform-dependent values and warned)."""
    import warnings

    f = np.array([0.5, float("nan"), float("inf"), float("-inf"), -0.5],
                 dtype="<f4")
    data = mm.encode_wav(f.tobytes(), 3, 1, 8000, 32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the old path warned on cast
        samples, rate = mm.decode_audio(data)
    assert rate == 8000
    assert samples[:, 0].tolist() == [16384, 0, 32767, -32768, -16384]


def test_png_struct_and_zlib_errors_surface_as_valueerror():
    """The other round-11 finding: truncated IHDR (struct.error) and
    corrupt IDAT (zlib.error) must surface as ValueError — the type the
    image kernels' catch tuple covers. (r13: un-merged from the NaN
    test above, where an editing slip had left this body appended
    after a stray docstring — both halves always ran, but under one
    name.)"""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    data = mm.encode_png(img)
    # truncated IHDR body: keep signature + IHDR header, cut the body
    ihdr_at = data.index(b"IHDR")
    with pytest.raises(ValueError, match="IHDR"):
        mm.decode_image(data[: ihdr_at + 4 + 5] + b"IEND")
    # corrupt IDAT: flip bytes inside the deflate stream
    idat_at = data.index(b"IDAT")
    b = bytearray(data)
    for k in range(4, 12):
        b[idat_at + k] ^= 0xFF
    with pytest.raises(ValueError):
        mm.decode_image(bytes(b))


def test_fuzzed_deep_jpeg12_stream_bounded():
    """decode_image_deep's 12-bit fork under the same mutation matrix
    as the main corpus (round 13, VERDICT r12 #5: the fork had no fuzz
    entry — decode_image never reaches it). Contract: a mutated 12-bit
    JPEG either decodes to the fork's (h, w) uint16 plane, or raises a
    documented error type, within the time budget."""
    cb = np.zeros((2, 2, 8, 8), dtype=np.int64)
    cb[:, :, 0, 0] = 7
    data = mm.encode_jpeg_gray_coeffs(cb, precision=12)
    assert mm.decode_image_deep(data).dtype == np.uint16  # seed sanity
    rnd = random.Random(zlib.crc32(b"jpeg12_deep") & 0xFFFF)
    for trial in range(150):
        b = _mutate(data, rnd)
        t0 = time.monotonic()
        try:
            out = mm.decode_image_deep(b)
            assert out.ndim == 2 and out.dtype == np.uint16
        except ALLOWED:
            pass
        assert time.monotonic() - t0 < TIME_BUDGET_S, (
            f"jpeg12 trial {trial}: deep decode exceeded "
            f"{TIME_BUDGET_S}s on a {len(b)}-byte corrupt stream"
        )


# ---------------------------------------------------------------------------
# Writer ROUND-TRIP fuzz (round 13, VERDICT r12 #5): the mutation corpus
# above exercises the DECODERS on corrupt bytes; this exercises the
# WRITERS on degenerate-but-valid inputs — random shapes including 1x1 /
# 1xN / Nx1 and constant-color content (single-symbol entropy codes: the
# class of the r12 VP8L degenerate-normal-code writer bug, which a
# sentinel roundtrip found, not fuzz). Every writer here is lossless, so
# the contract is EXACT equality after its own decoder.
# ---------------------------------------------------------------------------

_RT_DIMS = [1, 2, 3, 5, 7, 8, 9, 16, 17]


def _rt_img(rnd, h, w):
    if rnd.randint(3) == 0:  # constant color: degenerate entropy codes
        return np.full((h, w, 3), rnd.randint(256), dtype=np.uint8)
    return rnd.randint(0, 256, (h, w, 3)).astype(np.uint8)


def _rt_indices(rnd, h, w, n):
    if rnd.randint(3) == 0:
        return np.full((h, w), rnd.randint(n), dtype=np.uint8)
    return rnd.randint(0, n, (h, w)).astype(np.uint8)


def _rt_png(rnd):
    h, w = rnd.choice(_RT_DIMS), rnd.choice(_RT_DIMS)
    img = _rt_img(rnd, h, w)
    filters = None if rnd.randint(2) else [int(f) for f in rnd.randint(0, 5, h)]
    assert (mm.decode_image(mm.encode_png(img, filters=filters)) == img).all()


def _rt_png_palette(rnd):
    h, w = rnd.choice(_RT_DIMS), rnd.choice(_RT_DIMS)
    n = int(rnd.choice([1, 2, 5, 128, 256]))
    pal = rnd.randint(0, 256, (n, 3)).astype(np.uint8)
    idx = _rt_indices(rnd, h, w, n)
    filters = None if rnd.randint(2) else [int(f) for f in rnd.randint(0, 5, h)]
    out = mm.decode_image(mm.encode_png_palette(idx, pal, filters=filters))
    assert (out == pal[idx]).all()


def _rt_bmp8(rnd):
    h, w = rnd.choice(_RT_DIMS), rnd.choice(_RT_DIMS)
    n = int(rnd.choice([1, 2, 5, 128, 256]))
    pal = rnd.randint(0, 256, (n, 3)).astype(np.uint8)
    idx = _rt_indices(rnd, h, w, n)
    rle = bool(rnd.randint(2))
    assert (mm.decode_image(mm.encode_bmp8(idx, pal, rle=rle)) == pal[idx]).all()


def _rt_tiff(rnd):
    h, w = rnd.choice(_RT_DIMS), rnd.choice(_RT_DIMS)
    gray = bool(rnd.randint(2))
    img = _rt_img(rnd, h, w)
    src = img[:, :, 0].copy() if gray else img
    comp, pred = [(1, 1), (32773, 1), (5, 1), (5, 2)][rnd.randint(4)]
    kw = dict(byte_order=["little", "big"][rnd.randint(2)],
              compression=comp, predictor=pred)
    layout = rnd.randint(3)
    if layout == 1:
        kw["tiles"] = [(8, 8), (16, 8), (8, 16)][rnd.randint(3)]
    elif layout == 2:
        kw["rows_per_strip"] = int(rnd.choice([1, 2, 3, 8]))
    if not gray and rnd.randint(2):
        kw["planar"] = 2
    out = mm.decode_image(mm.encode_tiff(src, **kw))
    want = np.stack([src] * 3, axis=2) if gray else src
    assert (out == want).all(), kw


def _rt_gif(rnd):
    h, w = rnd.choice(_RT_DIMS), rnd.choice(_RT_DIMS)
    n = int(rnd.choice([1, 2, 5, 128, 256]))
    pal = rnd.randint(0, 256, (n, 3)).astype(np.uint8)
    idx = _rt_indices(rnd, h, w, n)
    inter = bool(rnd.randint(2))
    out = mm.decode_image(mm.encode_gif(idx, pal, interlace=inter))
    assert (out == pal[idx]).all()


def _rt_gif_anim(rnd):
    h, w = rnd.choice(_RT_DIMS), rnd.choice(_RT_DIMS)
    n = int(rnd.choice([2, 5, 128]))
    pal = rnd.randint(0, 256, (n, 3)).astype(np.uint8)
    k = rnd.randint(1, 4)
    frames = [_rt_indices(rnd, h, w, n) for _ in range(k)]
    delays = [int(d) for d in rnd.randint(1, 100, k)]
    got = list(mm.iter_gif_frames(mm.encode_gif_anim(frames, pal, delays)))
    assert len(got) == k
    for f, d, fr in zip(frames, delays, got):
        assert fr["delay_cs"] == d
        assert (fr["indices"] == f).all()


def _rt_webp(rnd):
    h, w = rnd.choice(_RT_DIMS), rnd.choice(_RT_DIMS)
    img = _rt_img(rnd, h, w)
    cb = int(rnd.randint(0, 9))
    from ssp_spark.operators.webp import decode_webp

    assert (decode_webp(encode_webp_lossless(img, cache_bits=cb)) == img).all()


def _rt_qoi(rnd):
    from ssp_spark.operators.qoi import encode_qoi

    h, w = rnd.choice(_RT_DIMS), rnd.choice(_RT_DIMS)
    img = _rt_img(rnd, h, w)
    assert (mm.decode_image(encode_qoi(img)) == img).all()


def _rt_wav_pcm16(rnd):
    ch = rnd.randint(1, 3)
    nf = rnd.randint(1, 120)
    arr = rnd.randint(-32768, 32768, (nf, ch)).astype("<i2")
    samples, rate = mm.decode_audio(
        mm.encode_wav(arr.tobytes(), 1, ch, 8000, 16)
    )
    assert rate == 8000 and (samples == arr).all()


def _rt_flac(rnd):
    from ssp_spark.operators.flac import decode_flac

    n = rnd.randint(1, 100)
    s = [int(v) for v in rnd.randint(-32768, 32768, n)]
    if rnd.randint(3) == 0:
        s = [s[0]] * n  # constant signal: zero residuals
    order = rnd.randint(0, 3)
    kw = dict(fixed_order=order, rice_param=int(rnd.randint(2, 15)))
    if rnd.randint(2):
        kw["blocksize"] = rnd.randint(1, n + 1)
    dec, rate = decode_flac(encode_flac(s, 8000, **kw))
    assert rate == 8000 and dec[:, 0].tolist() == s


def _rt_y4m(rnd):
    w, h = int(rnd.choice([2, 4, 8, 16])), int(rnd.choice([2, 4, 8, 16]))
    k = rnd.randint(1, 4)
    frames = [rnd.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(k)]
    clip = mm.encode_y4m(frames, w, h)
    offs = list(mm.iter_y4m_frames(clip))
    assert [i for _, i in offs] == list(range(k))
    for (off, _i), f in zip(offs, frames):
        y = np.frombuffer(clip, dtype=np.uint8, count=w * h, offset=off)
        assert (y.reshape(h, w) == f).all()


def _rt_png16_adam7(rnd):
    # decode_image's contract for 16-bit gray is the HIGH byte,
    # replicated across RGB (test_multimodal pins the mapping on
    # goldens); the fuzz here exercises the Adam7 pass structure on
    # arbitrary shapes incl. ones with empty passes (1x1, 1xN, Nx1)
    h, w = rnd.choice(_RT_DIMS), rnd.choice(_RT_DIMS)
    img16 = rnd.randint(0, 65536, (h, w)).astype(np.uint16)
    out = mm.decode_image(mm.encode_png_gray16_adam7(img16))
    hi = (img16 >> 8).astype(np.uint8)
    assert out.shape == (h, w, 3)
    assert (out == np.stack([hi] * 3, axis=2)).all()


_RT_WRITERS = {
    "png16_adam7": _rt_png16_adam7,
    "png": _rt_png,
    "png_palette": _rt_png_palette,
    "bmp8": _rt_bmp8,
    "tiff": _rt_tiff,
    "gif": _rt_gif,
    "gif_anim": _rt_gif_anim,
    "webp": _rt_webp,
    "qoi": _rt_qoi,
    "wav_pcm16": _rt_wav_pcm16,
    "flac": _rt_flac,
    "y4m": _rt_y4m,
}


@pytest.mark.parametrize("name", sorted(_RT_WRITERS))
def test_writer_roundtrip_fuzz(name):
    rnd = np.random.RandomState(zlib.crc32(b"rt-" + name.encode()) & 0x7FFFFFFF)
    for trial in range(40):
        t0 = time.monotonic()
        _RT_WRITERS[name](rnd)
        assert time.monotonic() - t0 < TIME_BUDGET_S, (
            f"{name} roundtrip trial {trial} exceeded {TIME_BUDGET_S}s"
        )


def test_flac_zero_sample_rate_raises():
    """The r13 insertion-mode fuzz find, pinned directly: a STREAMINFO
    declaring sample rate 0 (spec-reserved for non-audio) must raise
    ValueError instead of returning (samples, 0) — every consumer of
    the pair divides by rate, so rate=0 is a deferred
    ZeroDivisionError in a feature kernel (the WAV zero-rate class)."""
    from ssp_spark.operators.flac import decode_flac

    data = encode_flac([1, 2, 3, 4], sample_rate=0)
    with pytest.raises(ValueError, match="zero sample rate"):
        decode_flac(data)
    # and through the dispatch feature kernels' entry point
    with pytest.raises(ValueError):
        mm.decode_audio(data)


def test_progressive_jpeg_unknown_scan_component_raises():
    """The r13 splice-mode fuzz find, pinned directly: an SOS whose
    component selector matches no SOF2 component used to raise bare
    StopIteration from next() — outside the kernels' documented catch
    set (and silently iteration-ending under PEP 479 if a decode ever
    runs inside a generator). Must be ValueError."""
    cb = np.zeros((2, 2, 8, 8), dtype=np.int64)
    cb[:, :, 0, 0] = 7
    data = bytearray(mm.encode_jpeg_gray_coeffs_progressive(cb))
    sos = data.index(b"\xff\xda")
    # SOS body: len(2) ns(1) then (component id, tables) pairs
    data[sos + 5] = 0x77  # component id that no SOF2 declares
    with pytest.raises(ValueError, match="unknown component"):
        mm.decode_image(bytes(data))


def test_gif_huge_dimensions_rejected_fast():
    """The r13 deep-sweep find, pinned directly: corrupt 16-bit GIF
    dimensions (screen or frame descriptor) must raise ValueError
    before the LZW expansion / np.pad / screen composite allocate
    gigabytes — a 736-byte corrupt stream decoded for 296 s (memory
    thrash in numpy C ops, uninterruptible) before the guard."""
    gray = np.arange(40 * 32, dtype=np.uint8).reshape(32, 40) % 128
    pal = np.stack([np.arange(128, dtype=np.uint8)] * 3, 1)
    data = bytearray(mm.encode_gif(gray, pal))
    # screen dimensions
    b = bytearray(data)
    b[6:8] = b[8:10] = (0xFFFF).to_bytes(2, "little")
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="unreasonable dimensions"):
        mm.decode_image(bytes(b))
    assert time.monotonic() - t0 < 1.0
    # frame-descriptor dimensions (screen left valid); descriptor sits
    # right after header(13) + 128-entry global color table
    desc = 13 + 3 * 128
    assert data[desc] == 0x2C
    b = bytearray(data)
    b[desc + 5 : desc + 7] = b[desc + 7 : desc + 9] = (0xFFFF).to_bytes(2, "little")
    with pytest.raises(ValueError, match="unreasonable dimensions"):
        mm.decode_image(bytes(b))
    # and through the animation walker, which shares the per-frame LZW
    with pytest.raises(ValueError, match="unreasonable dimensions"):
        list(mm.iter_gif_frames(bytes(b)))


def test_jpeg_dc_category_bounded():
    """The r13 deep-sweep find, pinned by replaying its exact seeded
    trial: a corrupt DHT can define DC symbols up to 255, and
    read_bits(255) grows the python-int DC predictor past int64 —
    OverflowError (outside the kernels' catch set) at the zz[0] store.
    Must raise a documented error type instead."""
    data = _corpus()["jpeg420"][0]
    rnd = random.Random(zlib.crc32(b"deep13-jpeg420"))
    for _ in range(268):
        b = _mutate(data, rnd)
    try:
        mm.decode_image(b)
    except ALLOWED:
        pass  # ValueError("JPEG DC category out of range") expected


def test_wav_float_signaling_nan_decodes_quietly():
    """The r13 deep-sweep find: a SIGNALING-NaN float32 bit pattern
    (0x7F800001) raises the FPU invalid flag on the f32->f64 cast
    itself — a RuntimeWarning the r12 quiet-NaN test could not see.
    The decode must be warning-free and map sNaN to 0 like qNaN."""
    import struct
    import warnings

    raw = struct.pack("<I", 0x7F800001) + struct.pack("<f", 0.5)
    data = mm.encode_wav(raw, 3, 1, 8000, 32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        samples, rate = mm.decode_audio(data)
    assert rate == 8000 and samples[:, 0].tolist() == [0, 16384]


def test_tiff_zero_tile_dimensions_rejected():
    """The final r13 sweep find, pinned directly: a corrupt TileWidth/
    TileLength of 0 divided the tile-grid arithmetic by zero
    (ZeroDivisionError — outside the kernels' catch set); oversized
    tiles would likewise defeat the image-level dimension bound at the
    per-tile allocation. Both must raise the stated ValueError."""
    gray = np.arange(40 * 32, dtype=np.uint8).reshape(32, 40)
    data = bytearray(mm.encode_tiff(gray, tiles=(16, 16)))
    ifd = int.from_bytes(data[4:8], "little")
    nent = int.from_bytes(data[ifd : ifd + 2], "little")
    for want, repl in ((322, 0), (323, 0x04000000)):
        b = bytearray(data)
        for i in range(nent):
            e = ifd + 2 + 12 * i
            if int.from_bytes(b[e : e + 2], "little") == want:
                b[e + 8 : e + 12] = repl.to_bytes(4, "little")
                break
        with pytest.raises(ValueError, match="tile dimensions"):
            mm.decode_image(bytes(b))
