"""Hand-assembled VP8L bitstream goldens + writer roundtrips + the
driver-gate kernel for lossless WebP (ssp_spark.operators.webp).

Every golden below packs a bitstream BY HAND from the public VP8L
grammar (LSB-first bit packing; canonical prefix codes read
MSB-of-code-first) and asserts decoded pixels computed on paper — the
decoder is pinned independently of encode_webp_lossless, so the pair
cannot silently share a wrong path (the same discipline as the GIF /
TIFF / progressive-JPEG goldens)."""

from __future__ import annotations

import numpy as np
import pytest

from ssp_spark.operators.webp import (
    _cache_hash,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)


class B:
    """LSB-first hand bit-packer for building golden streams."""

    def __init__(self):
        self.bits: list[int] = []

    def lsb(self, v: int, n: int) -> "B":
        for i in range(n):
            self.bits.append((v >> i) & 1)
        return self

    def code(self, c: int, n: int) -> "B":
        """Prefix-code bits: MSB of the code first."""
        for i in range(n - 1, -1, -1):
            self.bits.append((c >> i) & 1)
        return self

    def bytes(self) -> bytes:
        out = bytearray()
        for i, bit in enumerate(self.bits):
            if i % 8 == 0:
                out.append(0)
            out[-1] |= bit << (i % 8)
        return bytes(out)


def _header(b: B, w: int, h: int) -> B:
    b.lsb(0x2F, 8).lsb(w - 1, 14).lsb(h - 1, 14).lsb(0, 1).lsb(0, 3)
    return b


def _single(b: B, sym: int) -> B:
    """Simple prefix code, one symbol (zero data bits per read)."""
    b.lsb(1, 1).lsb(0, 1)  # simple, 1 symbol
    if sym < 2:
        b.lsb(0, 1).lsb(sym, 1)
    else:
        b.lsb(1, 1).lsb(sym, 8)
    return b


def _pair(b: B, s0: int, s1: int) -> B:
    """Simple prefix code, two symbols: s0 reads as bit 0, s1 as 1."""
    b.lsb(1, 1).lsb(1, 1)
    if s0 < 2:
        b.lsb(0, 1).lsb(s0, 1)
    else:
        b.lsb(1, 1).lsb(s0, 8)
    b.lsb(s1, 8)
    return b


def _green_two_len1(b: B, sym_a: int, sym_b: int) -> None:
    """Hand-pack a NORMAL green code (280-symbol alphabet) where
    exactly sym_a and sym_b get length 1 (canonical: sym_a -> 0,
    sym_b -> 1 for sym_a < sym_b). Zero spans are written with 17/18
    repeats, so the goldens exercise the repeat machinery too.
    Code-length code {1: len1, 17: len2, 18: len2} — kraft
    1/2 + 1/4 + 1/4 = 1 (complete): 1 -> 0, 17 -> 10, 18 -> 11."""
    assert 0 <= sym_a < sym_b < 280
    b.lsb(0, 1)              # not simple
    b.lsb(5, 4)              # 9 clcs: order 17,18,0,1,2,3,4,5,16
    b.lsb(2, 3)              # len(17)=2
    b.lsb(2, 3)              # len(18)=2
    b.lsb(0, 3)              # len(0)=0
    b.lsb(1, 3)              # len(1)=1
    b.lsb(0, 3).lsb(0, 3).lsb(0, 3).lsb(0, 3).lsb(0, 3)
    b.lsb(0, 1)              # no max_symbol: ops cover all 280 symbols

    def zeros(n: int) -> None:
        # emit n zero lengths via 17 (3..10) / 18 (11..138) repeats
        while n:
            if n < 3:
                raise AssertionError("golden gap too small for repeats")
            if n <= 10:
                b.code(0b10, 2).lsb(n - 3, 3)
                return
            step = min(n, 138)
            if n - step in (1, 2):   # don't strand an un-emittable tail
                step = n - 3
            b.code(0b11, 2).lsb(step - 11, 7)
            n -= step

    if sym_a:
        zeros(sym_a)
    b.code(0, 1)             # sym_a -> length 1
    zeros(sym_b - sym_a - 1)
    b.code(0, 1)             # sym_b -> length 1
    if sym_b < 279:
        zeros(279 - sym_b)


def test_hand_golden_literals_simple_codes():
    """2x1 literals through simple codes: green {42,77} two-symbol,
    r/b/a/distance single-symbol (the zero-bit read path)."""
    b = _header(B(), 2, 1)
    b.lsb(0, 1)  # no transforms
    b.lsb(0, 1)  # no color cache
    b.lsb(0, 1)  # no meta-prefix
    _pair(b, 42, 77)      # green
    _single(b, 10)        # red
    _single(b, 20)        # blue
    _single(b, 255)       # alpha
    _single(b, 0)         # distance
    b.lsb(0, 1)           # pixel 0: green code 0 -> 42 (r/b/a: 0 bits)
    b.lsb(1, 1)           # pixel 1: green code 1 -> 77
    img = decode_vp8l(b.bytes())
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [10, 42, 20]
    assert img[0, 1].tolist() == [10, 77, 20]


def test_hand_golden_color_cache_hit():
    """3x1: literal (a=255,r=0,g=5,b=0), then two cache-index symbols.
    Green alphabet 256+24+2 = 282 with a 1-bit cache; the green code is
    a hand-built NORMAL code using the counted-ops max_symbol field —
    pinning that decoder path too."""
    argb = 0xFF000500
    idx = _cache_hash(argb, 1)
    cache_sym = 280 + idx
    b = _header(B(), 3, 1)
    b.lsb(0, 1)              # no transforms
    b.lsb(1, 1).lsb(1, 4)    # color cache, 1 bit
    b.lsb(0, 1)              # no meta-prefix
    # green normal code, clc {1: len1 -> 0, 17: len2 -> 10, 18: len2 -> 11}
    b.lsb(0, 1)              # not simple
    b.lsb(5, 4)              # 9 clcs
    b.lsb(2, 3)              # len(17)=2
    b.lsb(2, 3)              # len(18)=2
    b.lsb(0, 3)
    b.lsb(1, 3)              # len(1)=1
    b.lsb(0, 3).lsb(0, 3).lsb(0, 3).lsb(0, 3).lsb(0, 3)
    # counted ops: 17-skip, lit, 18-skip, 18-skip, lit = 5 ops
    b.lsb(1, 1)              # use max_symbol
    b.lsb(0, 3)              # length_nbits = 2 + 2*0 = 2
    b.lsb(3, 2)              # max_symbol = 2 + 3 = 5 ops
    b.code(0b10, 2).lsb(2, 3)   # 17: repeat zero 3+2 = 5 (syms 0..4)
    b.code(0, 1)                # sym5 -> length 1
    gap = cache_sym - 6         # zeros between sym5 and cache_sym
    r1, r2 = gap // 2, gap - gap // 2
    assert 11 <= r1 <= 138 and 11 <= r2 <= 138
    b.code(0b11, 2).lsb(r1 - 11, 7)
    b.code(0b11, 2).lsb(r2 - 11, 7)
    b.code(0, 1)                # cache_sym -> length 1
    # (max_symbol exhausted: remaining symbols default to length 0)
    # green canonical: 5 -> 0, cache_sym -> 1
    _single(b, 0)            # red
    _single(b, 0)            # blue
    _single(b, 255)          # alpha
    _single(b, 0)            # distance
    b.code(0, 1)             # pixel 0: literal g=5 (r/b/a zero-bit)
    b.code(1, 1)             # pixel 1: cache hit
    b.code(1, 1)             # pixel 2: cache hit
    img = decode_vp8l(b.bytes())
    assert img.shape == (1, 3, 3)
    assert (img[0] == [0, 5, 0]).all()


def test_hand_golden_lz77_backward_refs():
    """5x1: lit g=100, lit g=101, then a backref length 3 / distance 2
    (long-distance code 122 = distance prefix 13 + 5 extra bits of 25)
    giving the alternating tail; then 6x1: lit + ref len 5 / dist 1
    (code 121 = prefix 13 + extra 24) — the self-overlapping run."""
    # green normal code: {100: len2, 101: len2, 258: len1}
    # (258 = 256 + length-code 2 -> length value 3).
    # clc over cl-values {1, 2} + repeats {17, 18}, all len 2:
    #   1 -> 00, 2 -> 01, 17 -> 10, 18 -> 11 (complete).
    b = _header(B(), 5, 1)
    b.lsb(0, 1).lsb(0, 1).lsb(0, 1)  # no transforms/cache/meta
    b.lsb(0, 1)              # green: not simple
    b.lsb(5, 4)              # 9 clcs
    b.lsb(2, 3)              # len(17)=2
    b.lsb(2, 3)              # len(18)=2
    b.lsb(0, 3)
    b.lsb(2, 3)              # len(1)=2
    b.lsb(2, 3)              # len(2)=2
    b.lsb(0, 3).lsb(0, 3).lsb(0, 3).lsb(0, 3)
    b.lsb(0, 1)              # no max_symbol
    b.code(0b11, 2).lsb(89 - 11, 7)   # 18: 89 zeros (0..88)
    b.code(0b11, 2).lsb(11 - 11, 7)   # 18: 11 zeros (89..99)
    b.code(0b01, 2)                   # sym100 len 2
    b.code(0b01, 2)                   # sym101 len 2
    b.code(0b11, 2).lsb(134 - 11, 7)  # 18: 134 zeros (102..235)
    b.code(0b11, 2).lsb(22 - 11, 7)   # 18: 22 zeros (236..257)
    b.code(0b00, 2)                   # sym258 len 1
    b.code(0b11, 2).lsb(21 - 11, 7)   # 18: 21 zeros (259..279)
    # green canonical: 258 -> 0 (len1); 100 -> 10, 101 -> 11 (len2)
    _single(b, 7)            # red
    _single(b, 9)            # blue
    _single(b, 255)          # alpha
    _single(b, 13)           # distance: always prefix code 13
    b.code(0b10, 2)          # lit green=100
    b.code(0b11, 2)          # lit green=101
    b.code(0b0, 1)           # length symbol 258 -> code 2 -> length 3
    b.lsb(25, 5)             # distance: 96 + 25 + 1 = 122 -> dist 2
    img = decode_vp8l(b.bytes())
    assert img.shape == (1, 5, 3)
    assert img[0, :, 1].tolist() == [100, 101, 100, 101, 100]
    assert (img[0, :, 0] == 7).all() and (img[0, :, 2] == 9).all()

    # --- overlap fill: lit then ref len5 dist1 --------------------
    b = _header(B(), 6, 1)
    b.lsb(0, 1).lsb(0, 1).lsb(0, 1)
    # green {50: len1, 260: len1}; 260 = 256+4 -> length code 4:
    # extra_bits = (4-2)>>1 = 1, offset = (2+(4&1))<<1 = 6?  no:
    # (2 + (4 & 1)) << 1 = 2 << 1 = 4; value = 4 + eb + 1 = 5 at eb=0.
    _green_two_len1(b, 50, 260)
    _single(b, 1)            # red
    _single(b, 2)            # blue
    _single(b, 255)          # alpha
    _single(b, 13)           # distance
    b.code(0, 1)             # lit green=50
    b.code(1, 1)             # length sym 260
    b.lsb(0, 1)              # eb=0 -> length 5
    b.lsb(24, 5)             # distance extra: 96 + 24 + 1 = 121 -> dist 1
    img = decode_vp8l(b.bytes())
    assert img.shape == (1, 6, 3)
    assert (img[0, :, 1] == 50).all()
    assert (img[0, :, 0] == 1).all() and (img[0, :, 2] == 2).all()


def test_hand_golden_meta_prefix_groups():
    """8x1 with 4-pixel meta tiles (mp_bits=2): the entropy image
    selects group 0 (green=100) for the left tile and group 1
    (green=200) for the right tile."""
    b = _header(B(), 8, 1)
    b.lsb(0, 1)              # no transforms
    b.lsb(0, 1)              # no cache
    b.lsb(1, 1)              # meta-prefix present
    b.lsb(0, 3)              # mp_bits = 2 -> tiles of 4 -> 2x1 entropy image
    # --- nested entropy image (2x1, NO meta-prefix field) ---------
    b.lsb(0, 1)              # its own cache bit: off
    _pair(b, 0, 1)           # green {0, 1} (meta index = red<<8|green)
    _single(b, 0)            # red
    _single(b, 0)            # blue
    _single(b, 255)          # alpha
    _single(b, 0)            # distance
    b.lsb(0, 1)              # entropy px0: green 0 -> group 0
    b.lsb(1, 1)              # entropy px1: green 1 -> group 1
    # --- two prefix groups ----------------------------------------
    for g in (100, 200):
        _single(b, g)        # green: single literal
        _single(b, 3)        # red
        _single(b, 4)        # blue
        _single(b, 255)      # alpha
        _single(b, 0)        # distance
    # data: all 8 pixels are zero-bit single-symbol literals
    img = decode_vp8l(b.bytes())
    assert img[0, :4, 1].tolist() == [100] * 4
    assert img[0, 4:, 1].tolist() == [200] * 4
    assert (img[0, :, 0] == 3).all() and (img[0, :, 2] == 4).all()


def test_hand_golden_subtract_green():
    """1x1 literal (r=10, g=20, b=30) under SUBTRACT_GREEN decodes to
    r=30, g=20, b=50 (green added back mod 256)."""
    b = _header(B(), 1, 1)
    b.lsb(1, 1).lsb(2, 2)    # one transform: type 2 SUBTRACT_GREEN
    b.lsb(0, 1)              # no more transforms
    b.lsb(0, 1).lsb(0, 1)    # no cache, no meta
    _single(b, 20)           # green
    _single(b, 10)           # red
    _single(b, 30)           # blue
    _single(b, 255)          # alpha
    _single(b, 0)            # distance
    img = decode_vp8l(b.bytes())
    assert img[0, 0].tolist() == [30, 20, 50]
    # wraparound: r=250, g=20 -> (250+20) % 256 = 14
    b = _header(B(), 1, 1)
    b.lsb(1, 1).lsb(2, 2).lsb(0, 1)
    b.lsb(0, 1).lsb(0, 1)
    _single(b, 20)
    _single(b, 250)
    _single(b, 0)
    _single(b, 255)
    _single(b, 0)
    img = decode_vp8l(b.bytes())
    assert img[0, 0].tolist() == [14, 20, 20]


def test_hand_golden_color_indexing_and_out_of_range():
    """COLOR_INDEXING with a 20-color delta-coded palette (base color
    r=5,g=6,b=7 then +1 red per entry); indices live in the GREEN
    channel; an index >= palette size decodes to transparent black."""
    b = _header(B(), 4, 1)
    b.lsb(1, 1).lsb(3, 2)    # one transform: type 3 COLOR_INDEXING
    b.lsb(19, 8)             # 20 colors
    # --- nested palette image (20x1, delta-coded) -----------------
    b.lsb(0, 1)              # no cache
    _pair(b, 6, 0)           # green: first 6 then zero deltas
    _pair(b, 5, 1)           # red: first 5 then +1 deltas
    _pair(b, 7, 0)           # blue
    _pair(b, 255, 0)         # alpha
    _single(b, 0)            # distance
    b.lsb(0, 1).lsb(0, 1).lsb(0, 1).lsb(0, 1)  # px0: g=6,r=5,b=7,a=255
    for _ in range(19):      # px1..19: deltas g=0,r=1,b=0,a=0
        b.lsb(1, 1).lsb(1, 1).lsb(1, 1).lsb(1, 1)
    b.lsb(0, 1)              # end of transform list
    b.lsb(0, 1).lsb(0, 1)    # main image: no cache, no meta
    # green (indices): {0: len2, 4: len2, 19: len2, 25: len2}
    # clc {2: len2 -> 10, 17: len2 -> 11, 18: len1 -> 0}
    b.lsb(0, 1)              # not simple
    b.lsb(5, 4)              # 9 clcs
    b.lsb(2, 3)              # len(17)=2
    b.lsb(1, 3)              # len(18)=1
    b.lsb(0, 3)
    b.lsb(0, 3)
    b.lsb(2, 3)              # len(2)=2
    b.lsb(0, 3).lsb(0, 3).lsb(0, 3).lsb(0, 3)
    b.lsb(0, 1)              # no max_symbol
    b.code(0b10, 2)                    # sym0 len2
    b.code(0b11, 2).lsb(0, 3)          # 17: 3 zeros (1..3)
    b.code(0b10, 2)                    # sym4 len2
    b.code(0b0, 1).lsb(14 - 11, 7)     # 18: 14 zeros (5..18)
    b.code(0b10, 2)                    # sym19 len2
    b.code(0b11, 2).lsb(5 - 3, 3)      # 17: 5 zeros (20..24)
    b.code(0b10, 2)                    # sym25 len2
    b.code(0b0, 1).lsb(138 - 11, 7)    # 18: 138 zeros (26..163)
    b.code(0b0, 1).lsb(116 - 11, 7)    # 18: 116 zeros (164..279)
    # green canonical: 0 -> 00, 4 -> 01, 19 -> 10, 25 -> 11
    _single(b, 0)            # red (index pixels carry green only)
    _single(b, 0)            # blue
    _single(b, 0)            # alpha
    _single(b, 0)            # distance
    b.code(0b00, 2)          # index 0  -> r=5,  g=6, b=7
    b.code(0b01, 2)          # index 4  -> r=9,  g=6, b=7
    b.code(0b10, 2)          # index 19 -> r=24, g=6, b=7
    b.code(0b11, 2)          # index 25 -> out of range -> 0
    img = decode_vp8l(b.bytes())
    assert img[0, 0].tolist() == [5, 6, 7]
    assert img[0, 1].tolist() == [9, 6, 7]
    assert img[0, 2].tolist() == [24, 6, 7]
    assert img[0, 3].tolist() == [0, 0, 0]


def test_hand_golden_code_length_repeat_16():
    """Code 16 repeats the PREVIOUS NONZERO length: green lengths
    {0..3} = 2 written as one literal + one 16-repeat of 3."""
    b = _header(B(), 4, 1)
    b.lsb(0, 1).lsb(0, 1).lsb(0, 1)
    b.lsb(0, 1)              # green: not simple
    b.lsb(8, 4)              # 12 clcs: 17,18,0,1,2,3,4,5,16,6,7,8
    b.lsb(2, 3)              # len(17)=2
    b.lsb(1, 3)              # len(18)=1
    b.lsb(0, 3).lsb(0, 3)
    b.lsb(3, 3)              # len(2)=3
    b.lsb(0, 3).lsb(0, 3).lsb(0, 3)
    b.lsb(3, 3)              # len(16)=3
    b.lsb(0, 3).lsb(0, 3).lsb(0, 3)
    # clc canonical: 18 -> 0 (1); 17 -> 10 (2); 2 -> 110, 16 -> 111 (3)
    b.lsb(0, 1)              # no max_symbol
    b.code(0b110, 3)             # sym0: len 2
    b.code(0b111, 3).lsb(0, 2)   # 16: repeat previous (2) x3 -> syms 1..3
    b.code(0b0, 1).lsb(127, 7)   # 18: 138 zeros (syms 4..141)
    b.code(0b0, 1).lsb(127, 7)   # 18: 138 zeros (142..279)
    # green canonical: 0 -> 00, 1 -> 01, 2 -> 10, 3 -> 11
    _single(b, 0)
    _single(b, 0)
    _single(b, 255)
    _single(b, 0)
    for i in range(4):
        b.code(i, 2)
    img = decode_vp8l(b.bytes())
    assert img[0, :, 1].tolist() == [0, 1, 2, 3]


def test_container_walk_padding_and_boundaries():
    """Odd-size chunks pad a byte; VP8/VP8X raise the disclosed
    NotImplementedError; junk raises ValueError."""
    img = np.full((2, 2, 3), 9, np.uint8)
    data = encode_webp_lossless(img)
    vp8l_at = data.index(b"VP8L")
    size = int.from_bytes(data[vp8l_at + 4:vp8l_at + 8], "little")
    payload = data[vp8l_at + 8: vp8l_at + 8 + size]
    # wrap with a bogus ODD-size chunk first: the walker must skip it
    # (including its pad byte) and still find VP8L
    chunk = b"XTRA" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    body = b"WEBP" + chunk + b"VP8L" + \
        len(payload).to_bytes(4, "little") + payload
    wrapped = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert (decode_webp(wrapped) == img).all()
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(b"RIFF" + (16).to_bytes(4, "little") + b"WEBP"
                    + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4)
    with pytest.raises(NotImplementedError, match="extended"):
        decode_webp(b"RIFF" + (16).to_bytes(4, "little") + b"WEBP"
                    + b"VP8X" + (4).to_bytes(4, "little") + b"\x00" * 4)
    with pytest.raises(ValueError):
        decode_webp(b"RIFX" + b"\x00" * 20)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF" + (4).to_bytes(4, "little") + b"WEBP")


def test_disclosed_boundaries_raise():
    """Plane codes (distance code <= 120), predictor transform, and
    bundled palettes raise the documented NotImplementedError."""
    # plane-code stream: two lits + ref whose distance prefix is code 1
    # -> value 2 <= 120 -> plane code
    b = _header(B(), 5, 1)
    b.lsb(0, 1).lsb(0, 1).lsb(0, 1)
    _green_two_len1(b, 50, 258)   # lit 50 + length-code 2 (-> 3)
    _single(b, 0)
    _single(b, 0)
    _single(b, 255)
    _single(b, 1)            # distance prefix: code 1 -> value 2 (plane)
    b.code(0, 1)             # lit green=50
    b.code(1, 1)             # length 3
    with pytest.raises(NotImplementedError, match="plane code"):
        decode_vp8l(b.bytes())
    # predictor transform
    b = _header(B(), 2, 2)
    b.lsb(1, 1).lsb(0, 2)    # transform type 0 PREDICTOR
    with pytest.raises(NotImplementedError, match="predictor"):
        decode_vp8l(b.bytes())
    # bundled palette (<= 16 colors)
    b = _header(B(), 2, 2)
    b.lsb(1, 1).lsb(3, 2)    # COLOR_INDEXING
    b.lsb(7, 8)              # 8 colors -> bundling
    with pytest.raises(NotImplementedError, match="bundling"):
        decode_vp8l(b.bytes())


def test_writer_roundtrip_matrix():
    """encode_webp_lossless x decode through the public dispatch, with
    and without a color cache, across shapes and content classes."""
    from ssp_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(11)
    cases = [
        np.full((1, 1, 3), 0, np.uint8),
        np.full((7, 5, 3), 255, np.uint8),
        rng.randint(0, 256, (16, 16, 3)).astype(np.uint8),
        np.repeat(np.repeat(
            rng.randint(0, 256, (4, 4, 3)).astype(np.uint8), 8, 0), 8, 1),
    ]
    for img in cases:
        for cb in (0, 1, 6, 11):
            got = decode_image(encode_webp_lossless(img, cache_bits=cb))
            assert got.shape == img.shape and (got == img).all(), (
                img.shape, cb)


def test_write_prefix_code_single_symbol_ge_256_zero_bits():
    """A code with exactly one used symbol >= 256 cannot take the
    simple-code form (8-bit symbol field), so the writer falls to the
    normal-code path — where the decoder's degenerate single-nonzero
    _PrefixCode consumes ZERO bits per symbol. The writer must return
    length 0 for that symbol (ADVICE r11): a length-1 return would
    desync every bit after the first such op. Roundtrip: write the
    description, write one op + a sentinel, decode both."""
    from ssp_spark.operators.webp import (
        _BitReaderLSB,
        _BitWriterLSB,
        _read_prefix_code,
        _write_prefix_code,
    )

    lengths = [0] * 300
    lengths[280] = 1  # what _build_huffman_lengths gives one symbol
    bw = _BitWriterLSB()
    codes = _write_prefix_code(bw, lengths)
    assert codes == {280: (0, 0)}
    code, ln = codes[280]
    bw.write_code(code, ln)        # the op itself: zero bits
    bw.write(0b1011001, 7)         # sentinel after the op
    br = _BitReaderLSB(bw.flush())
    pc = _read_prefix_code(br, 300)
    assert pc.read(br) == 280      # consumes zero bits
    assert br.read(7) == 0b1011001  # stream still aligned


def test_signature_and_version_checks():
    b = B().lsb(0x2E, 8).lsb(0, 14).lsb(0, 14).lsb(0, 1).lsb(0, 3)
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b.bytes())
    b = B().lsb(0x2F, 8).lsb(0, 14).lsb(0, 14).lsb(0, 1).lsb(1, 3)
    with pytest.raises(ValueError, match="version"):
        decode_vp8l(b.bytes())


def test_webp_roundtrip_stats_kernel(spark):
    """The driver-gate kernel: channel sums and the closed-form
    pos_sum_r replay from the source bytes (same geometry as the GIF
    gate: 4x5 grid, 8x8 tiles, 32x40)."""
    from ssp_spark.operators import multimodal as mm

    rows = [(1, bytearray(bytes(range(40, 60)))),
            (2, bytearray(bytes(range(100, 120))))]
    df = spark.createDataFrame(rows, "doc_id long, px binary")
    out = {r.media_id: r
           for r in mm.webp_roundtrip_stats(df, "doc_id", "px").collect()}
    for mid, base in ((1, 40), (2, 100)):
        vs = list(range(base, base + 20))
        r = out[mid]
        assert (r.width, r.height) == (32, 40)
        assert r.sum_r == 64 * sum(vs)
        assert r.sum_g == 64 * sum(255 - v for v in vs)
        assert r.sum_b == 64 * sum(2 * v for v in vs)
        exp_pos = sum(
            v * (16384 * (i // 4) + 512 * (i % 4) + 7456)
            for i, v in enumerate(vs)
        )
        assert r.pos_sum_r == exp_pos
