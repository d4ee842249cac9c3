"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (F.zip_with / F.aggregate), JVM-side.

All math is done in double precision (embeddings are stored float32;
casting first keeps results engine-portable and avoids float32
accumulation drift).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two (pre-cast-to-double) vectors.

    ``try_divide``: cosine against a zero (or empty) vector is
    undefined — it yields NULL, which every caller's threshold / topk
    comparison then excludes. A bare ``/`` would throw DIVIDE_BY_ZERO
    under ANSI mode (the default on Spark 4, and this engine never
    disables it): one all-zero embedding row aborting a corpus-scale
    similarity job is the wrong failure mode for one bad row."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))
