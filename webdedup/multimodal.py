"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque ``binary`` columns with a metadata struct;
decode/feature-extraction run as Arrow-batched ``mapInPandas`` kernels so
payload bytes never round-trip through per-row Python.

Codecs — three REAL pure-numpy container parsers, each with its matching
writer and a driver value oracle over actually-decoded bytes:
``decode_wav_pcm`` (RIFF chunk walk, fmt validation, little-endian int16),
``decode_ppm`` (P6 header tokenizer with comments), and ``decode_avi_rgb``
(nested-RIFF walker; uncompressed-DIB frames: bottom-up BGR rows padded to
4 bytes; real frame sampling via ``sample_frames_decoded``). COMPRESSED
formats (JPEG, MP3, H.264, ...) are explicitly rejected — no codec
libraries exist in this container; plugging one in is a one-function swap.
``decoder=None`` in ``extract_features`` uses a deterministic fake
(byte-stat features) so schema/batching plumbing is testable without any
codec (``strict=True`` makes undecodable payloads raise instead of
degrading to zero features).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def fake_decode(payload: bytes, dim: int = 16):
    """Deterministic stand-in for a real decoder: byte-histogram features.

    Replace with e.g. PIL/torchvision decode; the mapInPandas harness,
    batching, and schema do not change.
    """
    import numpy as np

    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    b = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(b, bins=dim, range=(0, 256))
    return (hist / max(1, b.size)).astype(np.float32)


# ---------------- WAV-PCM: real pure-numpy container codec ----------------


def encode_wav_pcm(samples, sample_rate: int = 16000, pad_chunk: bytes | None = b"") -> bytes:
    """Serialize int16 samples into a canonical RIFF/WAVE PCM container.

    ``pad_chunk``: payload of an extra 'LIST' chunk inserted BEFORE 'data'
    (default: empty chunk present) — real-world WAVs carry INFO/LIST/fact
    chunks, so round-trip tests through this writer prove the decoder walks
    chunks rather than assuming the 44-byte canonical layout. None omits it.
    """
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = [(b"fmt ", fmt)]
    if pad_chunk is not None:
        chunks.append((b"LIST", pad_chunk))
    chunks.append((b"data", data))
    body = b"WAVE"
    for cid, payload in chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:  # RIFF chunks are word-aligned
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm(payload: bytes):
    """Parse a RIFF/WAVE PCM container → int16 sample array (pure numpy).

    A real chunk-walking parser, not a fixed-offset slice: validates the
    RIFF/WAVE magic, iterates word-aligned chunks in file order, reads the
    'fmt ' chunk (PCM format 1, 16-bit only), and decodes the 'data' chunk
    as little-endian int16. Raises ValueError on anything malformed —
    ``extract_features(strict=True)`` propagates, strict=False degrades to
    zero features.
    """
    import struct

    import numpy as np

    if payload is None or len(payload) < 12:
        raise ValueError("not a RIFF file: too short")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"malformed fmt chunk: size {size} < 16")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # word alignment
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, _, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    if n_channels != 1:
        raise ValueError(f"unsupported WAV: channels={n_channels}")
    return np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")


def wav_sample_histogram(payload: bytes, bins: int = 16):
    """Decoded-sample histogram features: count of samples per equal-width
    bucket over the int16 range (integer-exact → hash-stable vs a SQL
    oracle). The decode step is the REAL parser above."""
    import numpy as np

    if not 1 <= bins <= 65536:
        raise ValueError(f"bins must be in [1, 65536], got {bins}")
    s = decode_wav_pcm(payload)
    width = 65536 // bins
    # clamp: when bins doesn't divide 65536 evenly, value//width can reach
    # bins — fold the remainder into the last bucket so the vector length
    # is always exactly `bins` and every sample is counted once
    idx = np.minimum((s.astype(np.int64) + 32768) // width, bins - 1)
    return np.bincount(idx, minlength=bins).astype(np.int64)


def extract_features(
    media: DataFrame,
    decoder: Callable | None = None,
    dim: int = 16,
    batch_rows: int = 256,
    strict: bool = False,
) -> DataFrame:
    """media(MEDIA_SCHEMA) → (media_id, n_bytes, features) via mapInPandas.

    Binary payloads are large: keep Arrow batches small (batch_rows) so an
    executor never holds more than batch_rows payloads in memory — at 100 TB
    the input should be repartitioned so each task reads O(100 MB) of
    payload (spark.sql.files.maxPartitionBytes governs the scan side).

    ``strict=True``: a payload the decoder rejects fails the job (data
    quality gate); strict=False records zero features for it and moves on
    (bulk-ingest mode).
    """
    import numpy as np

    dec = decoder or (lambda p: fake_decode(p, dim))

    def safe(p):
        try:
            return np.asarray(dec(p), dtype=np.float64)
        except Exception:
            if strict:
                raise
            return np.zeros(dim, dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [safe(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    src = media.select("media_id", "payload")
    return src.mapInPandas(run, FEATURE_SCHEMA)


def media_dedup_exact(media: DataFrame) -> DataFrame:
    """Exact payload dedup: (fingerprint, n_members, rep_id) — md5 over
    binary, the byte-level analogue of the text fingerprint collapse."""
    return (
        media.groupBy(F.md5("payload").alias("fingerprint"))
        .agg(F.count("*").alias("n_members"), F.min("media_id").alias("rep_id"))
        .where(F.col("n_members") > 1)
    )


def sample_frames(video: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling PLAN for video rows: one row per sampled timestamp
    — pure-JVM explode over the metadata, no payload decode touched.

    This is the metadata face (which timestamps WOULD be sampled, from
    duration alone — cheap, runs on any row); the decoding sibling
    :func:`sample_frames_decoded` actually extracts pixel frames from
    uncompressed-DIB AVI payloads. No stub remains on this path.
    """
    return (
        video.where(F.col("kind") == "video")
        .where(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


# ---------------- PPM (P6): real pure-numpy image container codec ----------------


def encode_ppm(pixels, comment: bytes | None = b"synthetic") -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array into a binary PPM (P6).

    ``comment``: a '#' comment line emitted between the magic and the
    dimensions (default present) — real-world PPMs carry them, so
    round-trips through this writer prove the decoder tokenizes the header
    rather than slicing fixed offsets. None omits it.
    """
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {px.shape}")
    h, w, _ = px.shape
    header = b"P6\n"
    if comment is not None:
        header += b"# " + comment + b"\n"
    header += f"{w} {h}\n255\n".encode("ascii")
    return header + px.tobytes()


def decode_ppm(payload: bytes):
    """Parse a binary PPM (P6) → (h, w, 3) uint8 array (pure numpy).

    A real header tokenizer, not a fixed-offset slice: validates the P6
    magic, reads width/height/maxval as whitespace-separated tokens with
    '#'-to-newline comments allowed between them, requires maxval 255,
    then decodes exactly w*h*3 raster bytes after the single whitespace
    byte that terminates the header. Raises ValueError on anything
    malformed — ``extract_features(strict=True)`` propagates, strict=False
    degrades to zero features.
    """
    import numpy as np

    if payload is None or len(payload) < 2 or payload[0:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    vals: list[int] = []

    def _skip_ws_and_comments(p: int) -> int:
        while p < len(payload):
            c = payload[p : p + 1]
            if c in b" \t\r\n":
                p += 1
            elif c == b"#":
                while p < len(payload) and payload[p : p + 1] != b"\n":
                    p += 1
            else:
                break
        return p

    while len(vals) < 3:
        pos = _skip_ws_and_comments(pos)
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header: expected integer token")
        vals.append(int(payload[start:pos]))
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval: {maxval}")
    if pos >= len(payload) or payload[pos : pos + 1] not in b" \t\r\n":
        raise ValueError("malformed PPM header: missing raster separator")
    pos += 1  # exactly ONE whitespace byte before the raster
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError(f"truncated PPM raster: {len(raster)} < {need}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def ppm_channel_histogram(payload: bytes, bins: int = 8):
    """Decoded per-channel histograms + dimensions: [width, height,
    R-buckets..., G-buckets..., B-buckets...] (integer-exact →
    hash-stable vs a SQL oracle). The decode step is the REAL parser
    above."""
    import numpy as np

    if not 1 <= bins <= 256:
        raise ValueError(f"bins must be in [1, 256], got {bins}")
    px = decode_ppm(payload)
    h, w, _ = px.shape
    width = 256 // bins
    out = [np.int64(w), np.int64(h)]
    for c in range(3):
        # clamp like sample_frames_decoded: uneven bins must not emit an
        # overflow bucket (ragged vectors) nor drop 255-valued pixels
        idx = np.minimum(px[:, :, c].astype(np.int64).ravel() // width, bins - 1)
        out.extend(np.bincount(idx, minlength=bins).astype(np.int64))
    return np.array(out, dtype=np.int64)


# ---------------- AVI (uncompressed DIB): real pure-numpy video codec ----------------


def encode_avi_rgb(frames, fps: int = 10) -> bytes:
    """Serialize (n, h, w, 3) uint8 RGB frames into a genuine AVI container
    with uncompressed DIB video ('DIB ' handler, BI_RGB 24-bit).

    Produces the full nested-RIFF structure — LIST hdrl { avih, LIST strl
    { strh, strf } } then LIST movi { '00db' per frame } — with each frame
    stored the way DIBs actually are: bottom-up rows, BGR byte order, rows
    padded to 4-byte boundaries. Round-trips through the decoder below
    prove nested-LIST walking + row-padding handling, not a fixed layout.
    """
    import struct

    import numpy as np

    px = np.asarray(frames, dtype=np.uint8)
    if px.ndim != 4 or px.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB frames, got {px.shape}")
    n, h, w, _ = px.shape
    row_size = (w * 3 + 3) // 4 * 4
    frame_size = row_size * h

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) % 2 else b""
        )

    def list_chunk(formtype: bytes, children: bytes) -> bytes:
        return chunk(b"LIST", formtype + children)

    avih = struct.pack(
        "<10I", 1_000_000 // fps, frame_size * fps, 0, 0, n, 0, 1,
        frame_size, w, h,
    ) + b"\x00" * 16
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = list_chunk(
        b"hdrl", chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    )
    movi_children = b""
    pad = np.zeros((h, row_size - w * 3), dtype=np.uint8)
    for i in range(n):
        # bottom-up rows, BGR channel order, 4-byte-aligned rows
        dib = np.concatenate([px[i, ::-1, :, ::-1].reshape(h, w * 3), pad], axis=1)
        movi_children += chunk(b"00db", dib.tobytes())
    body = b"AVI " + hdrl + list_chunk(b"movi", movi_children)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_rgb(payload: bytes):
    """Parse an uncompressed-DIB AVI → ((n, h, w, 3) uint8 RGB array,
    micros_per_frame) — pure numpy, a real nested-RIFF walker.

    Validates RIFF/'AVI ' magic, walks top-level chunks, recurses into
    LIST hdrl for avih (dims, frame count, frame period) and LIST strl for
    strh ('vids' + 'DIB '/raw handler) and strf (BITMAPINFOHEADER,
    24-bit BI_RGB only), then collects '00db'/'00dc' bodies from LIST
    movi and undoes the DIB layout (bottom-up rows, BGR, padded rows).
    Raises ValueError on anything malformed — ``extract_features(
    strict=True)`` propagates, strict=False degrades to zero features.
    Compressed video (any non-zero biCompression) is explicitly rejected:
    no codec libraries exist in this environment.
    """
    import struct

    import numpy as np

    if payload is None or len(payload) < 12:
        raise ValueError("not a RIFF file: too short")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    def walk(buf: bytes):
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + size]
            if len(body) < size:
                raise ValueError(f"truncated chunk {cid!r}")
            yield cid, body
            pos += 8 + size + (size % 2)

    avih = None
    strh = None
    strf = None
    frames_raw: list[bytes] = []
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    for cid, body in walk(payload[12:end]):
        if cid != b"LIST":
            continue
        formtype, inner = body[:4], body[4:]
        if formtype == b"hdrl":
            for cid2, body2 in walk(inner):
                if cid2 == b"avih":
                    if len(body2) < 40:
                        raise ValueError("malformed avih")
                    avih = struct.unpack("<10I", body2[:40])
                elif cid2 == b"LIST" and body2[:4] == b"strl":
                    for cid3, body3 in walk(body2[4:]):
                        if cid3 == b"strh":
                            strh = body3
                        elif cid3 == b"strf":
                            strf = body3
        elif formtype == b"movi":
            for cid2, body2 in walk(inner):
                if cid2[2:4] in (b"db", b"dc"):
                    frames_raw.append(body2)
    if avih is None or strh is None or strf is None:
        raise ValueError("missing avih/strh/strf header")
    if strh[0:4] != b"vids":
        raise ValueError(f"first stream is not video: {strh[0:4]!r}")
    if len(strf) < 40:
        raise ValueError("malformed strf")
    _, w, h, _, bits, compression = struct.unpack("<IiiHHI", strf[:20])
    if bits != 24 or compression != 0:
        raise ValueError(
            f"unsupported video: bits={bits} compression={compression} "
            "(only uncompressed 24-bit DIB; no codec libraries in this environment)"
        )
    us_per_frame, n_frames = avih[0], avih[4]
    if us_per_frame <= 0:
        # a zero frame period would divide-by-zero every timestamp
        # computation downstream (lenient mode must be able to SKIP this
        # payload, so it has to fail here, inside the decoder)
        raise ValueError(f"malformed avih: us_per_frame={us_per_frame}")
    if len(frames_raw) != n_frames:
        raise ValueError(f"frame count mismatch: movi {len(frames_raw)} vs avih {n_frames}")
    row_size = (w * 3 + 3) // 4 * 4
    out = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) != row_size * h:
            raise ValueError(f"frame {i}: size {len(raw)} != {row_size * h}")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, row_size)[:, : w * 3]
        out[i] = rows.reshape(h, w, 3)[::-1, :, ::-1]
    return out, us_per_frame


def sample_frames_decoded(
    video: DataFrame, every_ms: int = 1000, bins: int = 8, strict: bool = False
) -> DataFrame:
    """REAL frame sampling: decode each AVI payload once, emit one row per
    sampled frame — (media_id, frame_idx, frame_ts_ms, width, height,
    features) with ``features`` the per-channel pixel histograms of the
    sampled frame (integer-exact → hash-stable vs a SQL oracle).

    Sampling contract: frame index (k * every_ms * 1000) // us_per_frame
    for k = 0, 1, ... while the index is in range, deduplicated — i.e. the
    frame on screen at each every_ms tick. The payload crosses Arrow ONCE
    per media row and is dropped before the output rows (only histograms
    shuffle onward); at 100 TB size scan partitions so each task holds
    O(100 MB) of payload (spark.sql.files.maxPartitionBytes), same as
    extract_features.
    """
    import numpy as np

    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive, got {every_ms}")
    if not 1 <= bins <= 256:
        raise ValueError(f"bins must be in [1, 256], got {bins}")
    width = 256 // bins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "frame_idx": [], "frame_ts_ms": [],
                "width": [], "height": [], "features": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames, uspf = decode_avi_rgb(p)
                except Exception:
                    if strict:
                        raise
                    continue
                n, h, w, _ = frames.shape
                seen = set()
                k = 0
                while True:
                    idx = (k * every_ms * 1000) // uspf
                    if idx >= n:
                        break
                    if idx not in seen:
                        seen.add(idx)
                        feats = []
                        for c in range(3):
                            # clamp: when bins doesn't divide 256 evenly,
                            # value//width can reach bins — fold the
                            # remainder into the last bucket so every
                            # pixel is counted exactly once per channel
                            buckets = np.minimum(
                                frames[idx, :, :, c].astype(np.int64).ravel() // width,
                                bins - 1,
                            )
                            feats.extend(np.bincount(buckets, minlength=bins).tolist())
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(idx)
                        rows["frame_ts_ms"].append(k * every_ms)
                        rows["width"].append(w)
                        rows["height"].append(h)
                        rows["features"].append(feats)
                    k += 1
            if rows["media_id"]:
                # an all-failed lenient batch must yield NOTHING: an empty
                # pandas frame infers float64 columns, which Arrow cannot
                # cast to the list<long> features field
                yield pd.DataFrame(rows)

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("width", LongType(), False),
            StructField("height", LongType(), False),
            StructField("features", ArrayType(LongType()), False),
        ]
    )
    return video.select("media_id", "payload").mapInPandas(run, schema)
