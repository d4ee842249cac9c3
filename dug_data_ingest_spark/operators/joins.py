"""Join operators (SURVEY.md §2.3).

Every join in the reference is an equi / semi / anti join on study or
data-dictionary identifiers — there are no theta/range/as-of joins.
Scale notes per operator: the small side is always broadcast (the
reference's dict-lookups are the moral equivalent), the big fact side
stays shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_left_broadcast(
    fact: DataFrame, dim: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Fact ⟕ broadcast(dim): the Gen3-study × PicSure-variable driving
    join of the BDC fallback pipeline.

    Reference: per-study lookup at scripts/bdc/xml_generator.py:246-259
    and row fetch at scripts/bdc/run_dbgap_xml_gen_fallback.py:201-203.
    At 100 TB the variables table is the fact side; the study table is
    tiny (10^4 rows) and must broadcast — no shuffle of the fact.
    """
    return fact.join(F.broadcast(dim), on, how)


def semi_overlap_count(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """|left ⋉ right| as a 1-row DataFrame (column ``overlap``).

    Reference: ``gen3_ids.intersection(pic_ids)`` overlap scoreboard
    (scripts/bdc/run_dbgap_xml_gen_fallback.py:87-111).
    """
    return left.join(right, on, "left_semi").agg(F.count("*").alias("overlap"))


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """left ∖ right by key — studies without data dictionaries, stray
    dds, and the idempotent skip-if-ingested manifest check.

    Reference: ``set(metadata_ids) - set(datadict_ids)``
    (scripts/heal/get_heal_platform_mds_data_dicts.py:97-106, 229);
    skip-if-downloaded (scripts/bdc/get_dbgap_data_dicts.py:230-235).
    """
    return left.join(right, on, "left_anti")


def broadcast_map_enrich(
    rows: DataFrame, mapping: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Enrich with a small mapping table (≈1.4k rows in the reference).

    Reference: HDPID → research-network/study-type dict built at
    scripts/heal/get_heal_platform_mds_data_dicts.py:635-644 and
    applied via lambdas at :673-675. Broadcast-hash join — the Spark
    equivalent of a driver-side dict, but it scales to any fact size.
    """
    return rows.join(F.broadcast(mapping), on, how)


def edge_gen(
    df: DataFrame, subject, object_, predicate: str = "biolink:related_to"
) -> DataFrame:
    """Derive KGX edges (subject, predicate, object) from one table —
    a pure projection, no shuffle.

    Reference: ``make_edge_link`` + per-consent loop
    (scripts/bdc/get_bdc_studies_from_gen3.py:319-352).
    """
    return df.select(
        F.col(subject).cast("string").alias("subject"),
        F.lit(predicate).alias("predicate"),
        F.col(object_).cast("string").alias("object"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the skewed (left) side gets a random salt
    in [0, salt), the small-but-not-broadcastable right side is
    replicated salt times, and the join key becomes (key, salt) — a
    hot key's rows spread over ``salt`` reducers instead of one.

    Use when the hot side is too big to broadcast AND AQE's skew
    splitting isn't available/enough (e.g. a single study id carrying
    10^8 variable rows). Semantics identical to ``left.join(right, on,
    how)`` for the supported ``how`` values; only the physical
    distribution changes. Output drops the salt columns.

    ``how`` is restricted to inner/left/left_semi/left_anti: for
    right/full outer joins the salt-replicated right side would emit
    every unmatched right row ``salt`` times, silently changing the
    semantics.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated right "
            "side duplicates unmatched right rows under right/full outer. "
            f"Use one of {sorted(allowed)}."
        )
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    replicated_right = right.crossJoin(
        F.broadcast(
            right.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    return (
        salted_left.join(replicated_right, [on, "__salt"], how).drop("__salt")
    )
