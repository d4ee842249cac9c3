"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched mapInPandas
stages.

The decoders are REAL pure-stdlib codecs (no PIL/opencv needed):
binary PPM (P6) and 24-bit uncompressed BMP are both fully specified
byte formats parseable with ``struct``/bytes. ``decode_image``
dispatches on the magic bytes, so a media frame can mix formats
row-by-row. Test payloads are synthesized deterministically from the
row id (``synth_image_media``), which lets a SQL oracle replay the
decoded statistics in closed form — if the encoder, parser, or
resampler were wrong, the replay would not match.
"""

from __future__ import annotations

import hashlib
import logging
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger(__name__)

#: The only exceptions the quarantine-by-omission stages swallow: what
#: the stdlib codecs raise on malformed bytes. Programming bugs
#: (AttributeError, TypeError, ...) still fail the task loudly.
CODEC_ERRORS = (ValueError, struct.error, IndexError)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


# ---------------------------------------------------------------------------
# Pure-stdlib image codecs. Pixel buffers are RGB, row-major, top-down,
# 3 bytes per pixel (the PPM wire order) regardless of container.
# ---------------------------------------------------------------------------


def _check_dims(width: int, height: int) -> None:
    if width < 1 or height < 1:
        raise ValueError(f"invalid image dimensions {width}x{height}")


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6, maxval 255): ASCII header + raw RGB rows."""
    _check_dims(width, height)
    if len(pixels) != width * height * 3:
        raise ValueError(f"pixel buffer is {len(pixels)} bytes, "
                         f"need {width * height * 3}")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + pixels


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM: returns (width, height, RGB pixel bytes).
    Handles arbitrary whitespace and ``#`` comments between header
    tokens, per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace / comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    width, height, maxval = tokens
    _check_dims(width, height)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    # Per the netpbm spec EXACTLY ONE whitespace byte terminates the
    # maxval token; the raster starts immediately after. The only
    # writer quirk tolerated is a CRLF terminator (consume the LF that
    # follows a CR). Anything laxer is wrong: raster bytes can be
    # whitespace-VALUED (gray 0x20, 0x0a, ...), so "skip whitespace
    # until the raster fits" decodes shifted pixels on any payload
    # with trailing bytes — silent corruption, not robustness.
    terminator = payload[pos : pos + 1]
    pos += 1
    if terminator == b"\r" and payload[pos : pos + 1] == b"\n":
        pos += 1
    need = width * height * 3
    pixels = payload[pos : pos + need]
    if len(pixels) != need:
        raise ValueError("truncated PPM raster")
    # The raster START is already unambiguous (single-terminator rule
    # above), so trailing bytes can't shift pixels. A trailing newline
    # is a common benign writer quirk — tolerate trailing WHITESPACE
    # only; non-whitespace tail bytes still mean a corrupt or
    # concatenated payload and are refused.
    tail = payload[pos + need :]
    if tail and not tail.isspace():
        raise ValueError(
            f"{len(tail)} non-whitespace trailing byte(s) after the "
            "PPM raster; payload looks corrupt or concatenated"
        )
    return width, height, pixels


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER): BGR, bottom-up rows
    padded to 4-byte boundaries — the classic Windows DIB layout."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"pixel buffer is {len(pixels)} bytes, "
                         f"need {width * height * 3}")
    _check_dims(width, height)
    row_size = (3 * width + 3) // 4 * 4
    image_size = row_size * height
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            off = (y * width + x) * 3
            r, g, b = pixels[off], pixels[off + 1], pixels[off + 2]
            row += bytes((b, g, r))  # BGR on the wire
        row += b"\x00" * (row_size - 3 * width)
        rows.append(bytes(row))
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 0, 0, 0, 0
    )
    return file_header + info_header + b"".join(rows)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit uncompressed BMP: returns (width, height, RGB
    pixel bytes in top-down row-major order)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", payload, 10)
    header_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise ValueError(f"unsupported DIB header size {header_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp uncompressed supported "
                         f"(got bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    _check_dims(width, height)
    row_size = (3 * width + 3) // 4 * 4
    out = bytearray(width * height * 3)
    for row_idx in range(height):
        y = height - 1 - row_idx if bottom_up else row_idx
        base = pixel_offset + row_idx * row_size
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            off = (y * width + x) * 3
            out[off : off + 3] = bytes((r, g, b))
    return width, height, bytes(out)


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode any supported image payload, dispatching on the magic
    bytes: P6 PPM or 24-bit BMP → (width, height, RGB top-down)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError(f"unrecognized image magic {payload[:2]!r}")


def reencode_image(payload_magic: bytes, width: int, height: int,
                   pixels: bytes) -> bytes:
    """Re-encode pixels in the same container the source used."""
    if payload_magic == b"P6":
        return encode_ppm(width, height, pixels)
    if payload_magic == b"BM":
        return encode_bmp(width, height, pixels)
    raise ValueError(f"unrecognized image magic {payload_magic!r}")


def nn_resize(pixels: bytes, width: int, height: int,
              new_width: int, new_height: int) -> bytes:
    """Nearest-neighbor resample of an RGB buffer: output pixel (x, y)
    reads source pixel ((x*width)//new_width, (y*height)//new_height) —
    the floor-index mapping, deterministic and SQL-replayable."""
    out = bytearray(new_width * new_height * 3)
    for y in range(new_height):
        sy = (y * height) // new_height
        for x in range(new_width):
            sx = (x * width) // new_width
            src = (sy * width + sx) * 3
            dst = (y * new_width + x) * 3
            out[dst : dst + 3] = pixels[src : src + 3]
    return bytes(out)


def image_stats(payload: bytes) -> tuple[int, int, list[float]]:
    """Default feature extractor: REAL decode, then exact integer
    statistics over the pixel values — [sum, min, max, n_values] as
    doubles (all exact: sums stay far under 2^53). Integer stats keep
    the cross-engine hash comparison exact where a float mean could
    differ in the last ulp."""
    width, height, pixels = decode_image(payload)
    return width, height, [
        float(sum(pixels)),
        float(min(pixels)),
        float(max(pixels)),
        float(len(pixels)),
    ]


# ---------------------------------------------------------------------------
# Deterministic payload synthesis: real images whose pixels follow a
# closed-form formula of the id, so SQL oracles can replay the decoded
# stats without a binary parser.
# ---------------------------------------------------------------------------


def synth_dims(media_id: int) -> tuple[int, int]:
    return 4 + media_id % 5, 3 + media_id % 4


def synth_pixels(media_id: int, width: int, height: int) -> bytes:
    """Pixel (x, y) channel c = (7*id + 13x + 31y + 97c) mod 256."""
    return bytes(
        (7 * media_id + 13 * x + 31 * y + 97 * c) % 256
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )


def synth_image_payload(media_id: int) -> tuple[bytes, str]:
    """A real image for ``media_id``: even ids encode as PPM, odd as
    BMP, so downstream decode paths must dispatch on format."""
    width, height = synth_dims(media_id)
    pixels = synth_pixels(media_id, width, height)
    if media_id % 2 == 0:
        return encode_ppm(width, height, pixels), "image/x-portable-pixmap"
    return encode_bmp(width, height, pixels), "image/bmp"


def _synth_media(ids: DataFrame, id_col: str, payload_fn) -> DataFrame:
    """Arrow-batched fixture stage: id column → MEDIA_SCHEMA frame of
    real payloads built by ``payload_fn(mid) -> (bytes, media_type)``.
    Python is fine here — this is test-fixture generation; production
    media arrives as binary columns and goes straight into the decode
    stages.

    The id frame is fanned out BEFORE synthesis (ext/dedup.fan_out):
    a local test corpus is one small parquet file, which would
    serialize the whole synth+decode pipeline onto one Python worker
    — measured 0.97 s of a 1.2 s query at sf0.1. The shuffle moves
    only the 8-byte ids, never payloads, and fan_out is a no-op on
    any input already wide enough (i.e. at real scale, where a media
    scan arrives with many splits)."""
    from dug_data_ingest_spark.ext.dedup import fan_out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k.name: [] for k in MEDIA_SCHEMA.fields}
            for mid in batch[id_col]:
                mid = int(mid)
                payload, mtype = payload_fn(mid)
                out["media_id"].append(mid)
                out["payload"].append(payload)
                out["media_type"].append(mtype)
                out["n_bytes"].append(len(payload))
                out["checksum"].append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in out.items()}
            )

    return fan_out(ids.select(id_col)).mapInPandas(run, MEDIA_SCHEMA)


def synth_image_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return _synth_media(ids, id_col, synth_image_payload)


# ---------------------------------------------------------------------------
# DataFrame stages.
# ---------------------------------------------------------------------------


def as_media(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap an arbitrary binary column into the typed media envelope
    (opaque payload + metadata), the storage contract for multimodal
    columns."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("checksum"),
    )


def extract_features(media: DataFrame, decoder=image_stats,
                     keep_cols: tuple[str, ...] = (),
                     feature_schema: T.StructType = FEATURE_SCHEMA) -> DataFrame:
    """Arrow-batched decode/feature-extract stage. Batch shape: each
    pandas batch holds whole payloads (bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch); partitioning is
    whatever upstream chose — repartition by size class first when
    payloads are skewed (a few 4K videos among thumbnails).

    ``keep_cols`` carries metadata columns through the stage so a
    consumer needing payload stats + envelope fields gets them in ONE
    decode pass instead of a self-join of two decode branches.

    Quarantine-by-omission: a payload the decoder rejects (truncated
    raster, unknown magic, zero dimensions) drops its row instead of
    failing the task — one malformed blob must not abort a 100 TB job
    (same posture as parse_data_tables, SURVEY §7 principles)."""
    out_schema = T.StructType(
        list(feature_schema.fields)
        + [media.schema[c] for c in keep_cols]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _feature_batch(batch, decoder, keep_cols, out_schema)

    cols = ["media_id", "payload", *keep_cols]
    return media.select(*cols).mapInPandas(run, out_schema)


def _feature_batch(batch: pd.DataFrame, decoder, keep_cols,
                   out_schema: T.StructType) -> pd.DataFrame:
    """One Arrow batch of the decode stage (module-level so the
    quarantine accounting is directly unit-testable).

    The decoder's 3-tuple lands in the schema's fields 1-3 by
    POSITION (media_id is field 0), so the same stage serves any
    modality: images fill (width, height, feature), audio fills
    (sample_rate, n_samples, feature)."""
    out: dict[str, list] = {f.name: [] for f in out_schema.fields}
    f1, f2, f3 = (f.name for f in out_schema.fields[1:4])
    dropped = 0
    for row in batch.itertuples(index=False):
        try:
            a, b, feat = decoder(bytes(row.payload))
        except CODEC_ERRORS:
            dropped += 1  # quarantine malformed payloads
            continue
        out["media_id"].append(row.media_id)
        out[f1].append(a)
        out[f2].append(b)
        out[f3].append(feat)
        for c in keep_cols:
            out[c].append(getattr(row, c))
    if dropped:
        log.warning(
            "extract_features quarantined %d/%d payloads in batch",
            dropped, len(batch),
        )
    return pd.DataFrame(
        {k: pd.Series(v, dtype="object") for k, v in out.items()}
    )


def resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize: decode, nearest-neighbor resample, re-encode
    in the source container format."""
    src_w, src_h, pixels = decode_image(payload)
    resized = nn_resize(pixels, src_w, src_h, width, height)
    return reencode_image(payload[:2], width, height, resized)


def resize(media: DataFrame, width: int, height: int,
           resizer=resize_payload) -> DataFrame:
    """Arrow-batched resize stage: payload → payload, metadata
    recomputed. Same MEDIA_SCHEMA out as in, so resize stages compose
    with extract_features/frame_sample; at scale this is the classic
    map-heavy stage you'd run after a size-class repartition so one
    4K video doesn't straggle a partition of thumbnails. Malformed
    payloads are quarantined by omission (see extract_features) —
    but CALLER-parameter errors are not data errors: the target
    dimensions are validated once here, loudly, so resize(df, 0, 5)
    raises instead of 'quarantining' every row and returning an
    empty frame from a successful job."""
    _check_dims(width, height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k.name: [] for k in MEDIA_SCHEMA.fields}
            dropped = 0
            for row in batch.itertuples(index=False):
                try:
                    resized = resizer(bytes(row.payload), width, height)
                except CODEC_ERRORS:
                    dropped += 1  # quarantine malformed payloads
                    continue
                out["media_id"].append(row.media_id)
                out["payload"].append(resized)
                out["media_type"].append(row.media_type)
                out["n_bytes"].append(len(resized))
                out["checksum"].append(hashlib.md5(resized).hexdigest())
            if dropped:
                log.warning(
                    "resize quarantined %d/%d payloads in batch",
                    dropped, len(batch),
                )
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in out.items()}
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing demo over opaque payloads: one output
    row per sampled offset (video frame-extraction has this exact
    explode shape: media row → many frame rows)."""
    n_frames = F.greatest(
        (F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "_"),
    ).select(
        "media_id",
        "frame_no",
        (F.col("frame_no") * every_n_bytes).alias("byte_offset"),
    )


# ---------------------------------------------------------------------------
# Pure-stdlib audio codec: canonical RIFF/WAVE, PCM16 little-endian
# mono. Like the image codecs above, WAV is a fully specified byte
# container parseable with struct — real decode plumbing, no soundfile
# or librosa needed.
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Canonical 44-byte-header WAV: PCM16 LE, mono."""
    if sample_rate <= 0:
        raise ValueError(f"invalid sample rate {sample_rate}")
    data = struct.pack(f"<{len(samples)}h", *samples)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def _parse_wav(payload: bytes) -> tuple[int, bytes]:
    """Parse a RIFF/WAVE payload → (sample_rate, raw PCM16 bytes).

    Walks the chunk list (so writers that insert LIST/INFO chunks
    between fmt and data still parse); requires PCM16 mono, the only
    layout ``encode_wav`` produces."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if (audio_format, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"only PCM16 mono supported, got fmt={audio_format} "
            f"ch={channels} bits={bits}"
        )
    return sample_rate, data


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a RIFF/WAVE payload → (sample_rate, n_samples, samples)."""
    sample_rate, data = _parse_wav(payload)
    n = len(data) // 2
    return sample_rate, n, list(struct.unpack(f"<{n}h", data[: 2 * n]))


def audio_stats(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode + per-clip features: [duration_ms, rms, zero_crossings,
    peak]. Integer-exact except rms (sqrt of a rational — both engines
    compute the identical IEEE double). rms is returned UNROUNDED:
    rounding happens in the Spark projection via F.round (HALF_UP),
    matching DuckDB ROUND in the oracle — Python round() is half-even
    and would be the one half-mode mismatch in the exact-hash gate.
    Per-sample math is numpy over the raw PCM buffer: int64 sums are
    exact (identical values to the pure-Python walk, ~30× the
    throughput on ~2k-sample clips)."""
    import numpy as np

    sample_rate, data = _parse_wav(payload)
    n = len(data) // 2
    if n == 0:
        raise ValueError("empty audio payload")
    s = np.frombuffer(data[: 2 * n], dtype="<i2").astype(np.int64)
    rms = float(int((s * s).sum()) / n) ** 0.5
    nonneg = s >= 0
    zc = int(np.count_nonzero(nonneg[:-1] != nonneg[1:]))
    peak = int(np.abs(s).max())
    return sample_rate, n, [n * 1000.0 / sample_rate, rms, float(zc), float(peak)]


AUDIO_SAMPLE_RATE = 8000


def synth_audio_samples(media_id: int) -> list[int]:
    """Deterministic pseudo-signal: sample i of clip d is
    ((31*d + 17*i) mod 201) - 100, length 1600 + (d mod 5)*80 —
    closed-form so a SQL oracle can replay the decoded features."""
    import numpy as np

    n = 1600 + (media_id % 5) * 80
    s = (31 * media_id + 17 * np.arange(n, dtype=np.int64)) % 201 - 100
    return s.tolist()


def synth_audio_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return _synth_media(
        ids,
        id_col,
        lambda mid: (
            encode_wav(AUDIO_SAMPLE_RATE, synth_audio_samples(mid)),
            "audio/wav",
        ),
    )


def extract_audio_features(media: DataFrame,
                           keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Audio decode/feature stage: extract_features with the audio
    decoder and schema — one batch walker, one quarantine posture."""
    return extract_features(
        media,
        decoder=audio_stats,
        keep_cols=keep_cols,
        feature_schema=AUDIO_FEATURE_SCHEMA,
    )


def image_phash(payload: bytes) -> tuple[int, int, int]:
    """Average-hash perceptual fingerprint of a decoded image — the
    aHash family every public near-dup image pipeline starts from
    (pHash/aHash/dHash): one bit per pixel, set when the pixel's
    channel-sum exceeds the image mean. All-integer by construction
    (bit = s·n_px > total, never a float mean), so the hash replays
    bit-for-bit in any engine from the same pixels. Returns
    (width, height, hash) with bit (y*w + x) in row-major order —
    w*h <= 63 for a BIGINT hash (the synth corpus is 4-8 x 3-6;
    real pipelines downsample to 8x8 first, which is this same
    function after nn_resize).

    Plugs into extract_features as its ``decoder`` — same Arrow-batch
    plumbing, quarantine-by-omission, and positional schema contract
    as image_stats.
    """
    w, h, px = decode_image(payload)
    n = w * h
    if n > 63:
        raise ValueError(
            f"image_phash: {w}x{h} exceeds the 63-bit BIGINT hash; "
            "nn_resize to 8x8 first (the standard aHash recipe)"
        )
    sums = [px[3 * i] + px[3 * i + 1] + px[3 * i + 2] for i in range(n)]
    total = sum(sums)
    bits = 0
    for i, s in enumerate(sums):
        if s * n > total:
            bits |= 1 << i
    return (w, h, bits)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("phash", T.LongType()),
    ]
)
