"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched mapInPandas
stages.

The decode step itself is STUBBED (this container has no image/audio
libraries — see ``decode_image``): the Spark-side contract — schema,
partitioning, UDF signature, batch shape — is real and tested, and a
deterministic fake decoder exercises the full pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decoder entry point — requires an image library that is
    not available in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; use fake_decode for the "
        "deterministic test path"
    )


def fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decoder: derives a fake (width, height)
    and an 4-dim feature from the bytes themselves, so the pipeline is
    fully testable without media libraries."""
    n = len(payload)
    width = (payload[0] if n else 0) + 1
    height = (payload[-1] if n else 0) + 1
    feature = [
        float(n),
        float(sum(payload[:16]) % 997),
        float(width * height % 101),
        float(payload[n // 2] if n else 0),
    ]
    return width, height, feature


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


def extract_features(media: DataFrame, decoder=fake_decode) -> DataFrame:
    """Arrow-batched decode/feature-extract stage. Batch shape: each
    pandas batch holds whole payloads (bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch); partitioning is
    whatever upstream chose — repartition by size class first when
    payloads are skewed (a few 4K videos among thumbnails)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"media_id": [], "width": [], "height": [], "feature": []}
            for row in batch.itertuples(index=False):
                w, h, feat = decoder(bytes(row.payload))
                out["media_id"].append(row.media_id)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in out.items()}
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: truncate the opaque
    payload to the target pixel budget. A real implementation decodes,
    resamples, re-encodes (PIL/opencv — not in this container)."""
    return payload[: width * height]


def resize(media: DataFrame, width: int, height: int, resizer=fake_resize) -> DataFrame:
    """Arrow-batched resize stage: payload → payload, metadata
    recomputed. Same MEDIA_SCHEMA out as in, so resize stages compose
    with extract_features/frame_sample; at scale this is the classic
    map-heavy stage you'd run after a size-class repartition so one
    4K video doesn't straggle a partition of thumbnails."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k.name: [] for k in MEDIA_SCHEMA.fields}
            for row in batch.itertuples(index=False):
                resized = resizer(bytes(row.payload), width, height)
                out["media_id"].append(row.media_id)
                out["payload"].append(resized)
                out["media_type"].append(row.media_type)
                out["n_bytes"].append(len(resized))
                out["checksum"].append(hashlib.md5(resized).hexdigest())
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
