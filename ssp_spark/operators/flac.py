"""FLAC decode/encode, pure stdlib + numpy — the lossless audio format
real speech/music corpora actually ship.

Decoder coverage (the full frame-level format as published in the FLAC
format specification): STREAMINFO parse, frame sync + header (block
size / sample rate / channel assignment / sample size codes, UTF-8
coded frame number, CRC-8), subframe types CONSTANT / VERBATIM /
FIXED(0-4) / LPC(1-32), wasted-bits shift, partitioned Rice residuals
(4- and 5-bit parameter variants, raw-bits escape), inter-channel
decorrelation (left/side, right/side, mid/side), and the frame CRC-16.
Multi-frame streams concatenate. Ogg-encapsulated FLAC and non-audio
metadata are out of scope (NotImplementedError / skipped,
respectively) — the same disclosure contract as the image codecs.

The writer (``encode_flac``) emits real single- or multi-frame streams
with FIXED-order subframes and Rice residuals so the driver query and
goldens ride genuine bitstreams; hand-assembled streams in
tests/test_multimodal.py pin decoder paths the writer never touches
(LPC, mid/side, escapes, wasted bits).

Reference behavioral contract: the ssp streams carry single-value
records (reference values/values.go:1-40); an audio clip decoded to a
sample frame is this engine's record-ification of binary media, same
as the image tier.
"""

from __future__ import annotations


class _BitReaderMSB:
    """MSB-first bit reader (FLAC packs bits big-endian-first)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        self.acc = 0
        self.nbits = 0

    def byte_pos(self) -> int:
        return self.pos - (self.nbits // 8)


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the FLAC
    frame-header checksum."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 — the
    FLAC frame footer checksum."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# FIXED predictor coefficients by order (residual + prediction).
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_utf8_number(br: _BitReaderMSB) -> int:
    """The UTF-8-style variable-length frame/sample number."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c >> 6 != 0b10:
            raise ValueError("FLAC: bad UTF-8 continuation in frame number")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _BitReaderMSB, blocksize: int, order: int) -> list[int]:
    """Partitioned Rice residual: 2-bit method (param width 4 or 5),
    4-bit partition order, per-partition parameter with the all-ones
    raw-bits escape; zigzag unfold."""
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    pw = 4 if method == 0 else 5
    esc = (1 << pw) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC: partition count does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = br.read(pw)
        if param == esc:
            raw = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = br.unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(br: _BitReaderMSB, blocksize: int, bps: int) -> list[int]:
    """One channel's subframe: pad bit, 6-bit type, wasted-bits unary,
    then CONSTANT / VERBATIM / FIXED / LPC payload + residual."""
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
    if t == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = [v] * blocksize
    elif t == 1:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(r + pred)
    elif t >= 32:  # LPC order 1-32
        order = t - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = list(warm)
        for r in res:
            acc = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"FLAC: reserved subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes):
    """(samples int32 ndarray [n, channels], sample_rate) for a native
    FLAC stream. Parses STREAMINFO, skips other metadata blocks, then
    decodes every frame: header codes + UTF-8 number + CRC-8 check,
    per-channel subframes (side channels read one extra bit per the
    spec), inter-channel decorrelation, CRC-16 footer check."""
    import numpy as np

    if data[:4] != b"fLaC":
        raise NotImplementedError("not a native FLAC stream")
    pos = 4
    si = None
    while True:
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if btype == 0:
            si = data[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if last:
            break
    if si is None or len(si) < 34:
        raise ValueError("FLAC: missing STREAMINFO")
    raw = int.from_bytes(si[10:18], "big")
    rate_si = raw >> 44
    nch_si = ((raw >> 41) & 0x7) + 1
    bps_si = ((raw >> 36) & 0x1F) + 1
    if rate_si == 0:
        # the spec reserves 0 (non-audio streams); every consumer of
        # (samples, rate) divides by rate, so returning 0 hands callers
        # a deferred ZeroDivisionError — the WAV zero-rate class (r13
        # fuzz find, insertion mode desyncing the STREAMINFO read)
        raise ValueError("FLAC: zero sample rate in STREAMINFO")

    chans_all: list[list[int]] = [[] for _ in range(nch_si)]
    while pos < len(data):
        frame_start = pos
        br = _BitReaderMSB(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        if br.read(1):
            raise ValueError("FLAC: reserved frame bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC: reserved frame bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code 0")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 0:
            rate = rate_si
        elif rate_code in _RATE_CODES:
            rate = _RATE_CODES[rate_code]
        elif rate_code == 12:
            rate = br.read(8) * 1000
        elif rate_code == 13:
            rate = br.read(16)
        elif rate_code == 14:
            rate = br.read(16) * 10
        else:
            raise ValueError("FLAC: invalid sample rate code")
        if bps_code != 0 and bps_code not in _BPS_CODES:
            raise ValueError("FLAC: reserved bits-per-sample code")
        bps = bps_si if bps_code == 0 else _BPS_CODES[bps_code]
        crc_end = br.byte_pos()
        want_crc8 = br.read(8)
        if _crc8(data[frame_start:crc_end]) != want_crc8:
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            subs = [_decode_subframe(br, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            # the SIDE channel carries one extra bit of depth
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, blocksize, bps + 1)
                right = _decode_subframe(br, blocksize, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    subs[0].append((m2 + s) >> 1)
                    subs[1].append((m2 - s) >> 1)
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
        if nch != nch_si:
            raise ValueError("FLAC: frame channel count != STREAMINFO")
        br.align()
        foot = br.byte_pos()
        want_crc16 = int.from_bytes(data[foot : foot + 2], "big")
        if _crc16(data[frame_start:foot]) != want_crc16:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = foot + 2
        for c in range(nch):
            chans_all[c].extend(subs[c])
    n = min(len(c) for c in chans_all)
    return (
        np.array([c[:n] for c in chans_all], dtype=np.int64).T.astype(np.int32),
        rate_si,
    )


class _BitWriterMSB:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _write_utf8_number(bw: _BitWriterMSB, v: int):
    if v < 0x80:
        bw.write(v, 8)
        return
    # multi-byte form, same shape as UTF-8: n bytes carry 5n+1 bits
    nbytes = 2
    while v >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    shift = 6 * (nbytes - 1)
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | (v >> shift)
    bw.write(lead, 8)
    for i in range(nbytes - 2, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def encode_flac(samples, sample_rate: int = 8000, bps: int = 16,
                fixed_order: int = 1, rice_param: int = 10,
                blocksize: int | None = None) -> bytes:
    """Real FLAC writer for the goldens and the driver query: mono
    input -> STREAMINFO (md5 zeroed — VERIFY-level fidelity is the
    decoder's CRC duty) + one frame per ``blocksize`` chunk, each a
    FIXED-order subframe with a single-partition Rice residual at
    ``rice_param``. Integer-exact: encode(decode) round-trips bit
    meanings, not floats."""
    samples = [int(s) for s in samples]
    n = len(samples)
    if blocksize is None:
        blocksize = n
    out = bytearray(b"fLaC")
    si = bytearray()
    si += blocksize.to_bytes(2, "big") * 2
    si += (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
    packed = (sample_rate << 44) | (0 << 41) | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += bytes(16)  # md5 unset (permitted by the spec)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    for fi in range(0, n, blocksize):
        chunk = samples[fi : fi + blocksize]
        bs = len(chunk)
        order = min(fixed_order, len(chunk))
        bw = _BitWriterMSB()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # block size: 16-bit at end
        bw.write(0, 4)  # rate: streaminfo
        bw.write(0, 4)  # mono
        bw.write(0, 3)  # bps: streaminfo
        bw.write(0, 1)
        _write_utf8_number(bw, fi // blocksize)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bytes(bw.out)
        bw.write(_crc8(hdr), 8)
        # subframe: FIXED order
        bw.write(0, 1)
        bw.write(8 + order, 6)
        bw.write(0, 1)  # no wasted bits
        for s in chunk[:order]:
            bw.write(s & ((1 << bps) - 1), bps)
        coefs = _FIXED_COEFS[order]
        bw.write(0, 2)   # 4-bit rice params
        bw.write(0, 4)   # partition order 0
        bw.write(rice_param, 4)
        for i in range(order, bs):
            pred = sum(c * chunk[i - 1 - j] for j, c in enumerate(coefs))
            r = chunk[i] - pred
            z = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag fold
            q, rem = z >> rice_param, z & ((1 << rice_param) - 1)
            bw.write(0, q)
            bw.write(1, 1)
            bw.write(rem, rice_param)
        bw.align()
        frame = bytes(bw.out)
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)
