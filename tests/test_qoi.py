"""Hand-packed QOI byte-stream goldens + writer roundtrips
(ssp_spark.operators.qoi). Every golden's expected pixels are computed
on paper from the qoiformat.org spec, pinning the decoder
independently of encode_qoi."""

from __future__ import annotations

import numpy as np
import pytest

from ssp_spark.operators.qoi import _hash, decode_qoi, encode_qoi

END = b"\x00" * 7 + b"\x01"


def _hdr(w: int, h: int, ch: int = 3, cs: int = 0) -> bytes:
    return b"qoif" + w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([ch, cs])


def test_hand_golden_rgb_literal_and_run():
    """RGB literal then RUN of 3 (bias -1): four identical pixels."""
    data = _hdr(4, 1) + bytes([0xFE, 10, 20, 30]) + bytes([0xC0 | 2]) + END
    img = decode_qoi(data)
    assert img.shape == (1, 4, 3)
    assert (img == [10, 20, 30]).all()


def test_hand_golden_diff_bias_edges():
    """DIFF deltas are 2-bit with bias 2: 0b01_00_11_01 after (10,20,30)
    gives (-2, +1, -1) -> (8, 21, 29); wraparound at 0 -> 254."""
    data = _hdr(4, 1) + bytes([0xFE, 10, 20, 30])
    data += bytes([0b01_00_11_01])           # dr=-2 dg=+1 db=-1
    data += bytes([0xFE, 0, 0, 0])           # literal black
    data += bytes([0b01_00_10_10])           # from black: r -2 -> 254
    img = decode_qoi(data + END)
    assert img[0, 1].tolist() == [8, 21, 29]
    assert img[0, 2].tolist() == [0, 0, 0]
    assert img[0, 3].tolist() == [254, 0, 0]


def test_hand_golden_luma():
    """LUMA: dg 6-bit bias 32, dr-dg / db-dg 4-bit bias 8. From
    (100, 100, 100): dg=+10, dr-dg=-8, db-dg=+7 -> (102, 110, 117)."""
    data = _hdr(2, 1) + bytes([0xFE, 100, 100, 100])
    data += bytes([0x80 | (10 + 32), ((-8 + 8) << 4) | (7 + 8)])
    img = decode_qoi(data + END)
    assert img[0, 1].tolist() == [102, 110, 117]


def test_hand_golden_index_hash_slot():
    """INDEX looks up the (3r+5g+7b+11a) % 64 slot: write a color, a
    different color, then recall the first via its computed slot."""
    c1, c2 = (5, 6, 7), (200, 100, 50)
    slot = _hash(*c1, 255)
    data = _hdr(3, 1)
    data += bytes([0xFE, *c1]) + bytes([0xFE, *c2]) + bytes([slot])
    img = decode_qoi(data + END)
    assert img[0, 2].tolist() == list(c1)


def test_hand_golden_rgba_alpha_dropped_but_hashes():
    """RGBA updates alpha (changing the hash slot) even though the
    (h, w, 3) contract drops it: the same RGB with a different alpha
    lands in a DIFFERENT index slot."""
    r, g, b = 9, 9, 9
    s255 = _hash(r, g, b, 255)
    s128 = _hash(r, g, b, 128)
    assert s255 != s128
    data = _hdr(3, 1)
    data += bytes([0xFF, r, g, b, 128])      # alpha 128 -> slot s128
    data += bytes([0xFE, 50, 60, 70])        # unrelated color
    data += bytes([s128])                    # recall via the 128 slot
    img = decode_qoi(data + END)
    assert img[0, 2].tolist() == [9, 9, 9]


def test_hand_golden_initial_previous_pixel():
    """The previous pixel starts at (0,0,0,255): a leading DIFF of
    (+1,+1,+1) decodes to (255,255,255)? No — (0+1-2+2 ...) on paper:
    0b01_11_11_11 is (+1,+1,+1) -> (1, 1, 1)."""
    img = decode_qoi(_hdr(1, 1) + bytes([0b01_11_11_11]) + END)
    assert img[0, 0].tolist() == [1, 1, 1]


def test_hand_golden_stream_leading_run_seeds_index():
    """qoi.h updates the index after EVERY chunk including OP_RUN, so a
    stream-leading RUN seeds slot _hash(0,0,0,255)=53 with the implicit
    start pixel. [RUN(1), INDEX(53), DIFF(+1,+1,+1), INDEX(4)]: the
    INDEX(53) recall must carry alpha=255 (a stale zero entry's alpha=0
    would silently shift every later hash slot — INDEX(4) would then
    miss (1,1,1) and read black)."""
    assert _hash(0, 0, 0, 255) == 53
    assert _hash(1, 1, 1, 255) == 4
    data = _hdr(4, 1)
    data += bytes([0xC0 | 0])                # RUN of 1 -> (0,0,0)
    data += bytes([53])                      # INDEX slot 53
    data += bytes([0b01_11_11_11])           # DIFF (+1,+1,+1) -> (1,1,1)
    data += bytes([4])                       # INDEX slot 4 -> (1,1,1)
    img = decode_qoi(data + END)
    assert img[0].tolist() == [[0, 0, 0], [0, 0, 0], [1, 1, 1], [1, 1, 1]]


def test_error_paths():
    with pytest.raises(ValueError, match="not a QOI"):
        decode_qoi(b"qoix" + b"\x00" * 20)
    with pytest.raises(ValueError, match="truncated"):
        # 2 of 3 pixels, then the stream just ends (long enough to
        # pass the header-length guard)
        decode_qoi(_hdr(3, 1) + bytes([0xFE, 1, 2, 3, 0xFE, 4, 5, 6]))
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(_hdr(1, 1) + bytes([0xFE, 1, 2, 3]) + b"\x00" * 8)
    with pytest.raises(ValueError, match="run past end"):
        decode_qoi(_hdr(2, 1) + bytes([0xFE, 1, 2, 3, 0xC0 | 5]) + END)
    with pytest.raises(ValueError, match="channels"):
        decode_qoi(b"qoif" + (1).to_bytes(4, "big") * 2 + bytes([5, 0]) + END)


def test_writer_roundtrip_matrix():
    from ssp_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(21)
    cases = [
        np.zeros((1, 1, 3), np.uint8),
        np.full((9, 130, 3), 77, np.uint8),            # runs past the 62 cap
        rng.randint(0, 256, (17, 13, 3)).astype(np.uint8),
        (rng.randint(0, 4, (16, 16, 3)) * 64).astype(np.uint8),  # index-heavy
        np.cumsum(rng.randint(0, 2, (8, 64, 3)), axis=1).astype(np.uint8),  # DIFF/LUMA-heavy
    ]
    for img in cases:
        out = decode_image(encode_qoi(img))
        assert out.shape == img.shape and (out == img).all()
