"""Uncompressed-DIB AVI codec + real frame sampling.

The codec is a genuine nested-RIFF walker (LIST hdrl { avih, LIST strl {
strh, strf } } + LIST movi) with real DIB layout handling (bottom-up rows,
BGR order, 4-byte row padding). The `video_frames` driver oracle value-
checks it end-to-end; these tests pin the container edge cases.
"""

import numpy as np
import pytest

from webdedup.multimodal import decode_avi_rgb, encode_avi_rgb, sample_frames_decoded


def _frames(n, h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_roundtrip_with_row_padding():
    # w=6 -> 18-byte rows padded to 20: a fixed-layout decoder that skips
    # padding handling returns shifted pixels
    fr = _frames(4, 5, 6)
    out, uspf = decode_avi_rgb(encode_avi_rgb(fr, fps=10))
    assert np.array_equal(out, fr)
    assert uspf == 100_000


def test_roundtrip_without_padding():
    fr = _frames(2, 3, 4, seed=1)  # 12-byte rows, already aligned
    out, uspf = decode_avi_rgb(encode_avi_rgb(fr, fps=25))
    assert np.array_equal(out, fr)
    assert uspf == 40_000


def test_malformed_rejection():
    good = encode_avi_rgb(_frames(2, 3, 4, seed=2), fps=10)
    with pytest.raises(ValueError):
        decode_avi_rgb(b"RIFX" + good[4:])
    with pytest.raises(ValueError):
        decode_avi_rgb(good[:8] + b"WAVE" + good[12:])
    with pytest.raises(ValueError):
        decode_avi_rgb(good[: len(good) // 2])
    with pytest.raises(ValueError):
        decode_avi_rgb(None)


def test_compressed_video_rejected():
    import struct

    good = encode_avi_rgb(_frames(1, 3, 4, seed=3), fps=10)
    # flip biCompression (strf offset 16) from BI_RGB to a codec fourcc
    i = good.index(struct.pack("<IiiHHI", 40, 4, 3, 1, 24, 0))
    bad = good[: i + 16] + b"MJPG" + good[i + 20 :]
    with pytest.raises(ValueError, match="compression"):
        decode_avi_rgb(bad)


def test_sample_frames_decoded_contract(spark):
    # 5 frames at 10 fps (uspf=100k), every_ms=200 -> indices 0, 2, 4
    fr = _frames(5, 3, 4, seed=4)
    payload = encode_avi_rgb(fr, fps=10)
    media = spark.createDataFrame(
        [(7, payload)], "media_id long, payload binary"
    )
    rows = sorted(
        sample_frames_decoded(media, every_ms=200, bins=8).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.frame_ts_ms) for r in rows] == [(0, 0), (2, 200), (4, 400)]
    r0 = rows[0]
    assert (r0.width, r0.height) == (4, 3)
    # histogram of frame 0 channel 0 recomputed directly
    want = np.bincount(fr[0, :, :, 0].astype(np.int64).ravel() // 32, minlength=8)
    assert r0.features[:8] == want.tolist()
    assert sum(r0.features) == 3 * 3 * 4  # every pixel counted once per channel


def test_sample_frames_uneven_bins_counts_every_pixel(spark):
    # bins=3 doesn't divide 256 (width 85): values 255 land in bucket 3
    # by floor-division and must be folded into the last bucket, not
    # silently dropped (review finding, round 4)
    fr = np.full((1, 2, 2, 3), 255, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, encode_avi_rgb(fr, fps=10))], "media_id long, payload binary"
    )
    (row,) = sample_frames_decoded(media, every_ms=100, bins=3).collect()
    assert len(row.features) == 9
    # all 4 pixels of each channel in the LAST bucket, none lost
    assert row.features == [0, 0, 4] * 3


def test_zero_frame_period_skipped_in_lenient_mode(spark):
    # an avih with dwMicroSecPerFrame=0 must fail inside the decoder so
    # lenient mode can skip it instead of ZeroDivisionError-ing the task
    import struct

    good = encode_avi_rgb(_frames(1, 2, 2, seed=6), fps=10)
    i = good.index(struct.pack("<I", 100_000))
    bad = good[:i] + struct.pack("<I", 0) + good[i + 4 :]
    with pytest.raises(ValueError, match="us_per_frame"):
        decode_avi_rgb(bad)
    media = spark.createDataFrame(
        [(1, bad), (2, good)], "media_id long, payload binary"
    )
    ok = sample_frames_decoded(media, every_ms=100).collect()
    assert {r.media_id for r in ok} == {2}
    with pytest.raises(ValueError):
        sample_frames_decoded(media, every_ms=0)


def test_sample_frames_decoded_strict_vs_lenient(spark):
    media = spark.createDataFrame(
        [(1, b"garbage"), (2, encode_avi_rgb(_frames(1, 2, 2, seed=5), fps=10))],
        "media_id long, payload binary",
    )
    ok = sample_frames_decoded(media, every_ms=100).collect()
    assert {r.media_id for r in ok} == {2}
    with pytest.raises(Exception):
        sample_frames_decoded(media, every_ms=100, strict=True).collect()
