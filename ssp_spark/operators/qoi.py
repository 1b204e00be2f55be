"""QOI ("Quite OK Image") decode/encode, pure stdlib + numpy — the
one-page public-domain lossless format (qoiformat.org specification,
version 1.0) increasingly used as a fast PNG alternative in asset
pipelines.

Full decoder per the spec: the 14-byte header ("qoif", width/height
u32 BIG-endian, channels 3|4, colorspace 0|1), the six chunk ops —
QOI_OP_RGB (0xFE), QOI_OP_RGBA (0xFF), QOI_OP_INDEX (0b00xxxxxx, the
64-slot running array keyed by (3r + 5g + 7b + 11a) % 64),
QOI_OP_DIFF (0b01, per-channel deltas in [-2, 1] with bias 2,
wraparound), QOI_OP_LUMA (0b10, dg in [-32, 31] bias 32; dr-dg and
db-dg in [-8, 7] bias 8), QOI_OP_RUN (0b11, lengths 1..62 bias -1 —
63/64 are illegal, colliding with the RGB/RGBA tags) — previous pixel
initialized to (0, 0, 0, 255), EVERY decoded pixel inserted into the
index, and the 8-byte end marker (seven 0x00 then 0x01). Alpha is
parsed and dropped at the (h, w, 3) uint8 decode_image contract, same
strip-alpha convention as PNG.

The writer emits real streams exercising every op (index hits, DIFF,
LUMA, runs with the 62 cap, RGB literals); the decoder is pinned
independently by hand-packed byte streams in tests/test_qoi.py with
on-paper expected pixels for each op, the bias edges, the hash slots,
and the run cap.

Reference behavioral contract: same record-ification of binary media
as the other image codecs (the ssp reference has no codecs — this is
the brief's LLM-pipeline extension tier).
"""

from __future__ import annotations


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi(data: bytes):
    """(h, w, 3) uint8 RGB (alpha decoded, then dropped)."""
    import numpy as np

    if len(data) < 22 or data[:4] != b"qoif":
        raise ValueError("not a QOI file")
    w = int.from_bytes(data[4:8], "big")
    h = int.from_bytes(data[8:12], "big")
    channels, colorspace = data[12], data[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError("QOI: bad channels/colorspace field")
    if w == 0 or h == 0 or w * h > (1 << 26):
        raise ValueError("QOI: unreasonable dimensions")
    n = w * h
    px = np.zeros((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    out = 0
    while out < n:
        if pos >= len(data):
            raise ValueError("QOI: stream truncated")
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # QOI_OP_INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 1:  # QOI_OP_DIFF: 2-bit deltas, bias 2
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                b = (b + (byte & 3) - 2) & 0xFF
            elif tag == 2:  # QOI_OP_LUMA
                dg = (byte & 0x3F) - 32
                b2 = data[pos]
                pos += 1
                r = (r + dg + ((b2 >> 4) & 0xF) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (b2 & 0xF) - 8) & 0xFF
            else:  # QOI_OP_RUN: repeat previous pixel 1..62 times
                run = (byte & 0x3F) + 1
                if out + run > n:
                    raise ValueError("QOI: run past end of image")
                px[out : out + run] = (r, g, b, a)
                # qoi.h updates the index after EVERY chunk including
                # OP_RUN; for a stream-leading run this is the only
                # write that seeds slot 53 with the implicit
                # (0, 0, 0, 255) start pixel (idempotent otherwise).
                index[_hash(r, g, b, a)] = (r, g, b, a)
                out += run
                continue
        px[out] = (r, g, b, a)
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out += 1
    if data[pos : pos + 8] != b"\x00" * 7 + b"\x01":
        raise ValueError("QOI: missing end marker")
    return px[:, :3].reshape(h, w, 3).copy()


def encode_qoi(img) -> bytes:
    """(h, w, 3) uint8 RGB -> a REAL QOI stream using every op class:
    runs (capped at 62), index hits, DIFF, LUMA, RGB literals."""
    import numpy as np

    a_img = np.asarray(img, dtype=np.uint8)
    h, w = a_img.shape[0], a_img.shape[1]
    flat = a_img.reshape(-1, 3)
    out = bytearray(b"qoif")
    out += w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([3, 0])
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for i in range(len(flat)):
        r, g, b = int(flat[i, 0]), int(flat[i, 1]), int(flat[i, 2])
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hidx = _hash(r, g, b, 255)
        if index[hidx] == (r, g, b, 255):
            out.append(hidx)
        else:
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                  and -8 <= db - dg <= 7):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes([0xFE, r, g, b])
            index[hidx] = (r, g, b, 255)
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)
