"""Pure-python netpbm codec pins (operators/multimodal.py
decode_netpbm / netpbm_histogram_decoder — r14, VERDICT r13
missing-item 2): the REAL decode path behind the image_features
decoder seam. Driver-side unit pins here; the Spark end-to-end run is
the hash-oracled `media_ppm_histogram` harness query."""

from __future__ import annotations

import numpy as np
import pytest

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    multimodal as MM,
)


def _ppm(w, h, raster, magic=b"P6", maxval=255, header_extra=b""):
    return magic + b" " + header_extra + str(w).encode() + b" " + str(
        h
    ).encode() + b" " + str(maxval).encode() + b"\n" + bytes(raster)


def test_p6_roundtrip_pixels():
    raster = bytes(range(2 * 2 * 3))
    w, h, px = MM.decode_netpbm(_ppm(2, 2, raster))
    assert (w, h) == (2, 2)
    assert px.shape == (2, 2, 3)
    assert px.tobytes() == raster  # row-major interleaved RGB preserved


def test_p5_grayscale_replicates_to_three_channels():
    raster = bytes([10, 20, 30, 40])
    w, h, px = MM.decode_netpbm(_ppm(2, 2, raster, magic=b"P5"))
    assert px.shape == (2, 2, 3)
    assert (px[:, :, 0] == px[:, :, 1]).all() and (px[:, :, 1] == px[:, :, 2]).all()
    assert px[0, 0, 0] == 10 and px[1, 1, 2] == 40


def test_header_comments_and_whitespace_variants():
    raster = bytes(12)
    payload = b"P6\n# a comment line\n 2 # inline\n2\n255\n" + raster
    w, h, px = MM.decode_netpbm(payload)
    assert (w, h) == (2, 2) and px.shape == (2, 2, 3)


@pytest.mark.parametrize(
    "payload, msg",
    [
        (b"P4 2 2 255\n" + bytes(12), "P5/P6 magic"),
        (b"JUNK", "P5/P6 magic"),
        (_ppm(2, 2, bytes(24), maxval=65535), "maxval"),
        (_ppm(2, 2, bytes(5)), "truncated netpbm raster"),
        (b"P6 2 2", "truncated netpbm header"),
        (b"P6 2 x 255\n" + bytes(12), "non-numeric"),
    ],
)
def test_malformed_payloads_raise(payload, msg):
    with pytest.raises(ValueError, match=msg):
        MM.decode_netpbm(payload)


def test_histogram_decoder_matches_numpy_reference():
    rng = np.random.RandomState(7)
    raster = rng.randint(0, 256, size=4 * 4 * 3, dtype=np.uint8).tobytes()
    feats = MM.netpbm_histogram_decoder(_ppm(4, 4, raster), 32, 32)
    assert feats.shape == (96,) and feats.dtype == np.float32
    # 4x4 -> 32x32 nearest-neighbor replicates each source pixel 64x,
    # so each channel's histogram is count-of-source-bytes-in-bin / 16
    src = np.frombuffer(raster, dtype=np.uint8).reshape(16, 3)
    for c in range(3):
        ref = np.bincount(src[:, c] >> 3, minlength=32)[:32] / 16.0
        np.testing.assert_allclose(feats[c * 32 : (c + 1) * 32], ref, rtol=0, atol=0)
    # histogram mass per channel is exactly 1
    assert feats.reshape(3, 32).sum(axis=1).tolist() == [1.0, 1.0, 1.0]


def test_histogram_decoder_non_uniform_resize():
    # 3x2 -> 4x4: index map src = dst * src_extent // dst_extent gives
    # uneven replication — pin against a direct numpy replay
    raster = bytes(range(3 * 2 * 3))
    feats = MM.netpbm_histogram_decoder(_ppm(3, 2, raster), 4, 4)
    px = np.frombuffer(raster, dtype=np.uint8).reshape(2, 3, 3)
    resized = px[(np.arange(4) * 2) // 4][:, (np.arange(4) * 3) // 4]
    for c in range(3):
        ref = np.bincount(resized[:, :, c].ravel() >> 3, minlength=32)[:32] / 16.0
        np.testing.assert_array_equal(feats[c * 32 : (c + 1) * 32], ref)


def _y4m(w, h, frames, cspace=b"C444", header_params=b"F25:1 Ip A1:1 "):
    head = b"YUV4MPEG2 W%d H%d %s%s\n" % (w, h, header_params, cspace)
    return head + b"".join(b"FRAME\n" + bytes(f) for f in frames)


def test_y4m_roundtrip_c444():
    frames = [bytes([i] * 12) for i in range(4)]  # 2x2 C444 = 12 bytes
    w, h, cs, got = MM.decode_y4m(_y4m(2, 2, frames))
    assert (w, h, cs) == (2, 2, "C444")
    assert got == frames


def test_y4m_c420_frame_size_and_default_colorspace():
    # C420: w*h*3//2 bytes; omitted C param defaults to C420jpeg
    frames = [bytes(6), bytes(range(6))]  # 2x2 C420 = 6 bytes
    payload = b"YUV4MPEG2 W2 H2 F25:1\n" + b"".join(
        b"FRAME\n" + f for f in frames
    )
    w, h, cs, got = MM.decode_y4m(payload)
    assert (w, h, cs) == (2, 2, "C420jpeg")
    assert got == frames


@pytest.mark.parametrize(
    "payload, msg",
    [
        (b"NOTAY4M W2 H2\n", "not a YUV4MPEG2"),
        (b"YUV4MPEG2 W2 H2 C444\nBADMK\n" + bytes(12), "frame marker"),
        (b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + bytes(5), "truncated y4m frame"),
        (b"YUV4MPEG2 W0 H2 C444\n", "bad y4m dimensions"),
        (b"YUV4MPEG2 W2 H2 Cmono\n", "unsupported y4m colorspace"),
    ],
)
def test_y4m_malformed_raise(payload, msg):
    with pytest.raises(ValueError, match=msg):
        MM.decode_y4m(payload)


def test_y4m_frame_params_after_marker_are_tolerated():
    # the spec allows per-frame parameters: FRAME Ixyz\n
    payload = b"YUV4MPEG2 W2 H2 C444\nFRAME Ix\n" + bytes(range(12))
    _, _, _, frames = MM.decode_y4m(payload)
    assert frames == [bytes(range(12))]


def test_sample_frames_y4m_spark_fanout(spark):
    from pyspark.sql import functions as F

    frames = [bytes([k] * 12) for k in range(7)]
    payload = _y4m(2, 2, frames)
    media = spark.createDataFrame(
        [("m1", "video", "video/x-yuv4mpeg", bytearray(payload))],
        "media_id string, modality string, mime string, data binary",
    )
    got = {
        r.frame_no: (r.byte_sum, r.byte_mean)
        for r in MM.sample_frames_y4m(media, every_n=3, max_frames=2).collect()
    }
    # frames 0 and 3 sampled (every 3rd, capped at 2); frame k sums to 12k
    assert got == {0: (0, 0.0), 3: (36, 3.0)}


def _wav(samples, bits=8, channels=1, rate=8000, extra_chunk=None):
    import struct

    if bits == 8:
        data = bytes(samples)
    else:
        data = b"".join(struct.pack("<h", s) for s in samples)
    body = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    if extra_chunk is not None:
        body += extra_chunk
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_8bit_roundtrip():
    rate, ch, bits, s = MM.decode_wav(_wav([0, 128, 255, 64]))
    assert (rate, ch, bits) == (8000, 1, 8)
    assert s.ravel().tolist() == [0, 128, 255, 64]


def test_wav_16bit_signed_le_and_stereo():
    rate, ch, bits, s = MM.decode_wav(
        _wav([-32768, 32767, 0, -1], bits=16, channels=2)
    )
    assert (ch, bits) == (2, 16)
    assert s.shape == (2, 2)
    assert s.tolist() == [[-32768, 32767], [0, -1]]


def test_wav_extra_chunks_and_odd_padding_tolerated():
    import struct

    # a 3-byte LIST chunk forces the odd-size word-alignment path
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    rate, ch, bits, s = MM.decode_wav(_wav([1, 2], extra_chunk=extra))
    assert s.ravel().tolist() == [1, 2]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda p: b"JUNK" + p[4:], "RIFF/WAVE"),
        (lambda p: p[:-1], "truncated RIFF chunk"),
        (lambda p: p.replace(b"\x01\x00\x01\x00", b"\x03\x00\x01\x00", 1),
         "format tag"),
        (lambda p: p.replace(b"\x08\x00data", b"\x0c\x00data", 1),
         "bit depth"),
    ],
)
def test_wav_malformed_raise(mutate, msg):
    with pytest.raises(ValueError, match=msg):
        MM.decode_wav(mutate(_wav([1, 2, 3, 4])))


def test_wav_rms_windows_spark(spark):
    samples = list(range(100, 140))  # 40 samples -> windows of 16: 16,16,8
    media = spark.createDataFrame(
        [("a1", "audio", "audio/wav", bytearray(_wav(samples)))],
        "media_id string, modality string, mime string, data binary",
    )
    rows = {r.win_no: r for r in MM.wav_rms_windows(media, window=16).collect()}
    assert set(rows) == {0, 1, 2}
    import math

    for w, lo in ((0, 100), (1, 116), (2, 132)):
        n = 16 if w < 2 else 8
        sq = sum((v - 128) ** 2 for v in range(lo, lo + n))
        assert rows[w].n_samples == n and rows[w].sq_sum == sq
        assert rows[w].rms == pytest.approx(math.sqrt(sq / n))


# ---- hypothesis property pins: decode is EXACTLY inverse to encode ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 8), h=st.integers(1, 8),
    data=st.data(), magic=st.sampled_from([b"P5", b"P6"]),
)
def test_netpbm_roundtrip_property(w, h, data, magic):
    ch = 3 if magic == b"P6" else 1
    raster = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch,
                           max_size=w * h * ch))
    )
    got_w, got_h, px = MM.decode_netpbm(_ppm(w, h, raster, magic=magic))
    assert (got_w, got_h) == (w, h) and px.shape == (h, w, 3)
    if magic == b"P6":
        assert px.tobytes() == raster
    else:
        assert px[:, :, 0].tobytes() == raster
        assert (px[:, :, 0] == px[:, :, 2]).all()


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 4), h=st.integers(1, 4),
    n_frames=st.integers(0, 5), data=st.data(),
)
def test_y4m_roundtrip_property(w, h, n_frames, data):
    size = w * h * 3
    frames = [
        bytes(data.draw(st.lists(st.integers(0, 255), min_size=size,
                                 max_size=size)))
        for _ in range(n_frames)
    ]
    got_w, got_h, cs, got = MM.decode_y4m(_y4m(w, h, frames))
    assert (got_w, got_h, cs) == (w, h, "C444") and got == frames


@settings(max_examples=40, deadline=None)
@given(
    bits=st.sampled_from([8, 16]), channels=st.integers(1, 3),
    n=st.integers(1, 32), data=st.data(),
)
def test_wav_roundtrip_property(bits, channels, n, data):
    lo, hi = (0, 255) if bits == 8 else (-32768, 32767)
    samples = data.draw(
        st.lists(st.integers(lo, hi), min_size=n * channels,
                 max_size=n * channels)
    )
    rate, ch, got_bits, s = MM.decode_wav(
        _wav(samples, bits=bits, channels=channels)
    )
    assert (ch, got_bits) == (channels, bits)
    assert s.shape == (n, channels)
    assert s.ravel().tolist() == samples
