"""Multimodal plumbing tests (decode stubbed, Spark plumbing real)."""

import pytest
from pyspark.sql import functions as F

from webdedup.multimodal import (
    MEDIA_SCHEMA, extract_features, fake_decode, media_dedup_exact, sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG" + b"a" * 100, 10, 10, None),
        (2, "image", "image/png", b"\x89PNG" + b"a" * 100, 10, 10, None),  # exact dup
        (3, "image", "image/jpg", b"\xff\xd8" + b"b" * 50, 5, 5, None),
        (4, "video", "video/mp4", b"mp4!" + b"c" * 200, None, None, 3500),
        (5, "audio", "audio/wav", None, None, None, 1000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shape_and_determinism(spark, media):
    out = extract_features(media, dim=16).collect()
    assert len(out) == 5
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 104
    assert len(by_id[1]["features"]) == 16
    assert by_id[1]["features"] == by_id[2]["features"]  # identical payloads
    assert by_id[1]["features"] != by_id[3]["features"]
    assert by_id[5]["n_bytes"] == 0  # null payload handled


def test_fake_decode_deterministic():
    a = fake_decode(b"hello world", 8)
    b = fake_decode(b"hello world", 8)
    assert (a == b).all()


def test_media_dedup_exact(spark, media):
    groups = media_dedup_exact(media.where("payload is not null")).collect()
    assert len(groups) == 1
    assert groups[0]["n_members"] == 2
    assert groups[0]["rep_id"] == 1


def test_sample_frames_plan(spark, media):
    frames = sample_frames(media, every_ms=1000).collect()
    ts = sorted(r["frame_ts_ms"] for r in frames)
    assert ts == [0, 1000, 2000, 3000]


def test_custom_decoder_hook(spark, media):
    calls = []

    def decoder(payload):
        import numpy as np

        calls.append(1)
        return np.ones(4, dtype=np.float32)

    out = extract_features(media, decoder=decoder).collect()
    assert all(r["features"] == [1.0, 1.0, 1.0, 1.0] for r in out)


# ---------------- real WAV-PCM codec ----------------


def test_wav_roundtrip_exact():
    import numpy as np

    from webdedup.multimodal import decode_wav_pcm, encode_wav_pcm

    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=1001, dtype=np.int16)  # odd length
    out = decode_wav_pcm(encode_wav_pcm(s, sample_rate=8000))
    assert np.array_equal(out, s)


def test_wav_decoder_walks_chunks_not_fixed_offset():
    import numpy as np

    from webdedup.multimodal import decode_wav_pcm, encode_wav_pcm

    s = np.arange(-5, 5, dtype=np.int16)
    # odd-sized LIST chunk before data: forces word-alignment handling too
    payload = encode_wav_pcm(s, pad_chunk=b"INFOabc")
    assert np.array_equal(decode_wav_pcm(payload), s)
    # canonical minimal file (no extra chunk) also decodes
    assert np.array_equal(decode_wav_pcm(encode_wav_pcm(s, pad_chunk=None)), s)


@pytest.mark.parametrize("mutate", [
    lambda p: p[:10],                                # truncated header
    lambda p: b"RIFX" + p[4:],                       # bad magic
    lambda p: p.replace(b"fmt ", b"fmx ", 1),        # missing fmt chunk
    lambda p: p.replace(b"\x01\x00\x01\x00", b"\x03\x00\x01\x00", 1),  # float fmt
])
def test_wav_decoder_rejects_malformed(mutate):
    import numpy as np

    from webdedup.multimodal import decode_wav_pcm, encode_wav_pcm

    good = encode_wav_pcm(np.arange(16, dtype=np.int16))
    with pytest.raises(ValueError):
        decode_wav_pcm(mutate(good))


def test_extract_features_strict_mode(spark):
    import numpy as np

    from webdedup.multimodal import (
        decode_wav_pcm, encode_wav_pcm, extract_features,
    )

    good = encode_wav_pcm(np.arange(100, dtype=np.int16))
    rows = [(1, "audio", "audio/wav", bytearray(good), None, None, None),
            (2, "audio", "audio/wav", bytearray(b"garbage-not-riff"), None, None, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    dec = lambda p: decode_wav_pcm(p)[:16].astype("float64")

    # non-strict: bad payload degrades to zero features
    out = extract_features(media, decoder=dec, dim=16, strict=False).collect()
    bad = [r for r in out if r["media_id"] == 2][0]
    assert all(v == 0.0 for v in bad["features"])

    # strict: the job fails on the undecodable payload
    import pyspark.errors

    with pytest.raises(Exception):
        extract_features(media, decoder=dec, dim=16, strict=True).collect()


def test_ppm_roundtrip_exact():
    import numpy as np

    from webdedup.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(11)
    for shape in [(1, 1, 3), (3, 5, 3), (17, 16, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (decode_ppm(encode_ppm(px)) == px).all()
        assert (decode_ppm(encode_ppm(px, comment=None)) == px).all()


def test_ppm_decoder_tokenizes_header_not_fixed_offset():
    """A comment line containing digit-bearing text between magic and dims
    must be skipped; width/height split across varied whitespace must
    parse. A fixed-offset slice would read garbage for both."""
    import numpy as np

    from webdedup.multimodal import decode_ppm, encode_ppm

    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    assert (decode_ppm(encode_ppm(px, comment=b"9 9 9 maxval 1")) == px).all()
    hand = b"P6\n# c1\n# c2\n4\t2 # trailing\n255\n" + px.tobytes()
    assert (decode_ppm(hand) == px).all()


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"P5\n1 1\n255\n\x00\x00\x00",           # wrong magic
        b"P6\n2 2\n254\n" + b"\x00" * 12,        # unsupported maxval
        b"P6\n4 4\n255\n\x00\x00",               # truncated raster
        b"P6\nx 2\n255\n" + b"\x00" * 24,        # non-integer token
    ],
)
def test_ppm_decoder_rejects_malformed(payload):
    import pytest as _pytest

    from webdedup.multimodal import decode_ppm

    with _pytest.raises(ValueError):
        decode_ppm(payload)


def test_ppm_channel_histogram_counts():
    """Histogram is per interleaved channel: a raster whose R bytes are all
    0, G all 100, B all 255 lands one full count in exactly one bucket per
    channel, and width/height lead the feature vector."""
    import numpy as np

    from webdedup.multimodal import encode_ppm, ppm_channel_histogram

    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[:, :, 1] = 100
    px[:, :, 2] = 255
    f = ppm_channel_histogram(encode_ppm(px), bins=8)
    assert f[0] == 3 and f[1] == 2            # width, height
    r, g, b = f[2:10], f[10:18], f[18:26]
    assert r[0] == 6 and r[1:].sum() == 0
    assert g[100 // 32] == 6 and g.sum() == 6
    assert b[7] == 6 and b[:7].sum() == 0


def test_histograms_uneven_bins_fixed_length_and_total():
    # bins=3 doesn't divide the value range: the overflow bucket must fold
    # into the last bin (fixed-length vectors, no dropped values) in BOTH
    # sibling kernels, mirroring the sample_frames_decoded fix
    import numpy as np

    from webdedup.multimodal import (
        encode_ppm, encode_wav_pcm, ppm_channel_histogram, wav_sample_histogram,
    )

    px = np.full((2, 2, 3), 255, dtype=np.uint8)
    out = ppm_channel_histogram(encode_ppm(px), bins=3)
    assert len(out) == 2 + 3 * 3  # w, h + 3 channels x 3 bins exactly
    assert list(out[2:5]) == [0, 0, 4]  # all pixels in the LAST bucket

    samples = np.full(8, 32767, dtype=np.int16)
    hist = wav_sample_histogram(encode_wav_pcm(samples), bins=3)
    assert len(hist) == 3 and list(hist) == [0, 0, 8]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ppm_channel_histogram(encode_ppm(px), bins=0)
    with _pytest.raises(ValueError):
        wav_sample_histogram(encode_wav_pcm(samples), bins=0)
