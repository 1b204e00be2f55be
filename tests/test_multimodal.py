"""Multimodal column plumbing: binary payloads + typed metadata through
Arrow-batched mapInPandas (decode itself is stubbed — no codecs in this
environment — but schema, batching, and fan-out shapes are real).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from ssp_spark.operators import multimodal as mm


@pytest.fixture
def media_df(spark):
    rows = [(i, bytes(range(10 + i))) for i in range(8)]
    return spark.createDataFrame(rows, "media_id long, data binary")


def test_attach_media_schema(spark, media_df):
    out = mm.attach_media(media_df, "data", "image", "png")
    meta = out.schema["media_meta"].dataType
    assert [f.name for f in meta.fields] == [
        "media_type", "format", "width", "height", "duration_ms", "uri",
    ]
    r = out.filter(F.col("media_id") == 0).collect()[0]
    assert r.media_meta.media_type == "image" and r.media_meta.format == "png"


def test_extract_features_deterministic(spark, media_df):
    out = mm.extract_features(media_df, "media_id", "data").collect()
    assert len(out) == 8
    by_id = {r.media_id: r for r in out}
    assert by_id[0].n_bytes == 10
    assert by_id[0].content_md5 == hashlib.md5(bytes(range(10))).hexdigest()
    assert len(by_id[0].feature) == 8
    # deterministic: same bytes -> same feature
    out2 = mm.extract_features(media_df, "media_id", "data").collect()
    assert {r.media_id: r.feature for r in out2} == {r.media_id: r.feature for r in out}


def test_extract_features_null_bytes(spark):
    df = spark.createDataFrame([(1, None)], "media_id long, data binary")
    r = mm.extract_features(df, "media_id", "data").collect()[0]
    assert r.n_bytes == 0 and r.content_md5 is None


def test_sample_frames_fan_out(spark):
    df = spark.createDataFrame([(1, bytes(2500)), (2, bytes(999))], "media_id long, data binary")
    out = mm.sample_frames(df, "media_id", "data", every_ms=1000).collect()
    per_id = {}
    for r in out:
        per_id.setdefault(r.media_id, []).append((r.frame_idx, r.offset_ms))
    assert sorted(per_id[1]) == [(0, 0), (1, 1000), (2, 2000)]
    assert sorted(per_id[2]) == [(0, 0)]


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_resize_media_shape_and_edges(spark):
    """resize_media: fixed-size output grid for any input length,
    deterministic nearest-neighbor sampling, empty input -> zero pixels
    (the plumbing contract a real decoder slots into)."""
    from ssp_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, b"abcd"), (2, b""), (3, bytes(range(200)))],
        "media_id long, data binary",
    )
    rows = {r.media_id: r for r in mm.resize_media(df, "media_id", "data", 4, 4).collect()}
    assert all(r.n_pixels == 16 and len(r.pixels) == 16 for r in rows.values())
    # nearest-neighbor on 4 bytes over 16 slots: each byte repeats 4x
    assert bytes(rows[1].pixels) == b"aaaabbbbccccdddd"
    assert bytes(rows[2].pixels) == bytes(16) and rows[2].pix_checksum == 0
    want3 = bytes((i * 200) // 16 for i in range(16))
    assert bytes(rows[3].pixels) == want3
    assert rows[3].pix_checksum == sum(want3)


def _ppm(img):
    return b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]) + img.tobytes()


def _bmp24(px):
    h, w = px.shape[:2]
    rows = []
    for r in range(h - 1, -1, -1):  # bottom-up
        row = px[r][:, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * ((4 - len(row) % 4) % 4))
    body = b"".join(rows)
    off = 54
    return (
        b"BM"
        + (off + len(body)).to_bytes(4, "little")
        + b"\x00" * 4
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + b"\x00" * 20
        + body
    )


def test_decode_image_real_formats():
    """decode_image is a REAL decoder for PPM(P6) and 24-bit BMP: exact
    pixel recovery including PPM comments, BMP bottom-up row order,
    BGR->RGB, and 4-byte row padding (w=3 -> 3 pad bytes/row)."""
    import numpy as np
    import pytest

    from ssp_spark.operators.multimodal import decode_image

    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert (decode_image(_ppm(img)) == img).all()
    ppm_comment = b"P6\n# a comment\n4 2\n255\n" + img.tobytes()
    assert (decode_image(ppm_comment) == img).all()
    px = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_image(_bmp24(px)) == px).all()
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_resize_media_decodes_real_pixels(spark):
    """resize_media on a decodable image resizes ACTUAL pixels (RGB,
    3 bytes/out-pixel, nearest-neighbor src[(i*src)//out]) and falls
    back to byte-sampling for undecodable data — both in one batch."""
    import numpy as np

    from ssp_spark.operators import multimodal as mm

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    rows = [(1, bytearray(_ppm(img))), (2, bytearray(b"not-an-image-stream"))]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = {
        r.media_id: r
        for r in mm.resize_media(df, "media_id", "data", out_w=2, out_h=2).collect()
    }
    # nearest-neighbor 4->2: rows/cols 0 and 2
    want = img[[0, 2]][:, [0, 2]]
    assert bytes(out[1].pixels) == want.tobytes()
    assert out[1].n_pixels == 12 and out[1].pix_checksum == int(want.sum())
    # fallback: 1 byte per out-pixel from the raw stream
    assert out[2].n_pixels == 4


def _wav(samples, rate=8000, channels=1):
    import numpy as np

    raw = np.asarray(samples, dtype="<i2").reshape(-1, channels).tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * 2).to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(raw).to_bytes(4, "little") + raw
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def test_decode_audio_pcm_wav():
    """Real RIFF/WAVE parsing: exact sample recovery, stereo
    interleave, chunk walking; compressed formats refused."""
    import numpy as np
    import pytest

    from ssp_spark.operators.multimodal import decode_audio

    mono = [0, 1000, -1000, 32767, -32768]
    s, rate = decode_audio(_wav(mono))
    assert rate == 8000 and s[:, 0].tolist() == mono
    stereo = [1, 2, 3, 4, 5, 6]  # L R L R L R
    s2, _ = decode_audio(_wav(stereo, channels=2))
    assert s2.tolist() == [[1, 2], [3, 4], [5, 6]]
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03....mp3-ish")


def test_audio_features_real_and_null_passthrough(spark):
    """A 1-second 8kHz square wave: duration 1000 ms, RMS = amplitude,
    ZCR 50% (sign flip every other sample boundary at 4kHz tone... the
    constructed wave flips every 2 samples -> 499937..500000 ppm band
    checked exactly); undecodable bytes yield NULL features."""
    from ssp_spark.operators import multimodal as mm

    amp = 10000
    wave = ([amp, amp, -amp, -amp] * 2000)[:8000]  # flips every 2 samples
    rows = [(1, bytearray(_wav(wave))), (2, bytearray(b"mp3-junk"))]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = {r.media_id: r for r in mm.audio_features(df, "media_id", "data").collect()}
    r1 = out[1]
    assert (r1.sample_rate, r1.duration_ms, r1.rms) == (8000, 1000, amp)
    # 3999 crossings over 7999 boundaries -> 499937 ppm exactly
    assert r1.zcr_ppm == (3999 * 1_000_000) // 7999
    assert out[2].sample_rate is None and out[2].rms is None


def test_sample_ppm_stream_frames_real(spark):
    """Real frame walking over a concatenated-PPM stream: exact byte
    offsets (header + pixel lengths), every_n sampling, fps timestamps;
    non-PPM rows contribute zero frames."""
    import numpy as np

    from ssp_spark.operators import multimodal as mm

    f1 = _ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    f2 = _ppm(np.ones((2, 2, 3), dtype=np.uint8))
    stream = f1 + f2 + f1 + f2 + f1  # 5 frames
    rows = [(1, bytearray(stream)), (2, bytearray(b"not a stream"))]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = sorted(
        (r.frame_idx, r.offset_bytes, r.offset_ms, r.width, r.height)
        for r in mm.sample_ppm_stream_frames(
            df, "media_id", "data", every_n=2, fps=25
        ).collect()
    )
    L = len(f1)
    assert out == [(0, 0, 0, 2, 2), (2, 2 * L, 80, 2, 2), (4, 4 * L, 160, 2, 2)]
