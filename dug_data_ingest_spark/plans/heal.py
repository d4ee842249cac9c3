"""EP2 — the HEAL ingest pipeline (SURVEY.md §3), Spark-first.

Reference: scripts/heal/get_heal_platform_mds_data_dicts.py — per-study
JSON download, alias-tolerant field normalization (:36-63), global
variable-id uniquification (:358-400), enum/encodings maps (:427-472),
dbGaP XML per dd (:303-499), flat variable_index.csv (:501-511), KGX
graph (:549-580), research-network routing via a 1.4k-row mapping CSV
(:635-644, 673-675).

Spark shape: explode the study→dd map, normalize aliases with
coalesce, uniquify with an explicit-order window (deterministic across
partitionings, SURVEY §7 hard-part 3), broadcast-join the mapping, and
derive XML/KGX/variable-index from ONE normalized fields lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dug_data_ingest_spark.operators.joins import anti_join, broadcast_map_enrich
from dug_data_ingest_spark.operators.projections import alias_fields
from dug_data_ingest_spark.operators.windows import uniquify_ids
from dug_data_ingest_spark.sources.xml_dbgap import render_data_tables


def study_dd_links(studies: DataFrame) -> DataFrame:
    """(hdp_id, dd_label, dd_id) — explode of the label→id map.

    Reference: studies_to_dds walk at
    get_heal_platform_mds_data_dicts.py:112-135, 147-156.
    """
    return studies.select(
        "hdp_id",
        F.explode_outer("data_dictionaries").alias("dd_label", "dd_id"),
    )


def normalize_fields(fields: DataFrame) -> DataFrame:
    """Alias resolution + enum/encoding maps + uniquified variable id.

    - name|property → name (translate_data_dictionary_field, :47-53)
    - section|module|node → section, fallback chain ends at dd_id
      then 'none' (:55-62; generate_lakefs_dbgap_xml_index.py:157-160)
    - enumLabels wins over legacy '1=Male|2=Female' encodings string;
      codes missing a label fall back to the code (:443-467)
    - duplicate names across a study's dds get _1, _2 … suffixes in
      explicit 'ord' order (:358-400) — window, not a seen-set
    """
    base = fields.select(
        "hdp_id",
        "dd_id",
        alias_fields([F.col("name"), F.col("property")]).alias("name"),
        alias_fields(
            [F.col("section"), F.col("module"), F.col("node"), F.col("dd_id")],
            default=F.lit("none"),
        ).alias("section"),
        "title",
        "description",
        F.col("type").alias("type"),
        F.col("minimum").cast("string").alias("logical_min"),
        F.col("maximum").cast("string").alias("logical_max"),
        F.coalesce(
            F.map_from_arrays(
                F.col("enum"),
                F.transform(
                    F.col("enum"),
                    lambda c: F.coalesce(F.element_at(F.col("enumLabels"), c), c),
                ),
            ),
            F.str_to_map(F.col("encodings"), F.lit(r"\|"), F.lit("=")),
        ).alias("value_labels"),
        "ord",
    )
    return uniquify_ids(
        base.withColumn("name_study", F.concat_ws("/", "hdp_id", "name")),
        "name_study",
        [F.col("ord")],
        "unique_name_study",
    ).withColumn(
        # try_element_at: a field row whose name AND property are both
        # NULL yields a slash-less name_study (concat_ws skips NULLs),
        # so the split has one element — plain element_at(.., 2) would
        # abort the whole pipeline under ANSI mode; try_element_at
        # yields NULL and the row flows on (quarantine-not-abort)
        "unique_name",
        F.try_element_at(F.split("unique_name_study", "/", 2), F.lit(2)),
    ).drop("name_study", "unique_name_study")


def variable_index(norm_fields: DataFrame) -> DataFrame:
    """Flat index rows — the variable_index.csv columns at
    get_heal_platform_mds_data_dicts.py:504."""
    return norm_fields.select(
        F.col("hdp_id").alias("study_id"),
        F.col("dd_id"),
        F.col("unique_name").alias("name"),
        "section",
        "title",
        "description",
        "type",
        F.when(
            F.col("value_labels").isNotNull(),
            F.array_join(
                F.transform(
                    F.map_entries("value_labels"),
                    lambda e: F.concat_ws("=", e.getField("key"), e.getField("value")),
                ),
                "|",
            ),
        ).alias("encodings"),
        "logical_min",
        "logical_max",
    )


def heal_xml_docs(norm_fields: DataFrame) -> DataFrame:
    """One dbGaP <data_table> per (study, dd) — :303-499."""
    renderable = norm_fields.select(
        F.col("hdp_id").alias("study_id"),
        "dd_id",
        F.col("unique_name").alias("var_id"),
        F.col("unique_name").alias("name"),
        "description",
        "type",
        F.when(
            F.col("value_labels").isNotNull(),
            F.transform(
                F.map_entries("value_labels"),
                lambda e: F.struct(
                    e.getField("key").alias("code"),
                    e.getField("value").alias("label"),
                ),
            ),
        ).alias("values"),
    )
    return render_data_tables(renderable)


def kgx_graph(
    studies: DataFrame, links: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """KGX nodes + edges from study docs — :515-580. Self-derived
    (no shuffle): every study is a node; dd edges link study → dd.
    Pass the already-derived ``links`` frame (study_dd_links output)
    when the caller has one — heal_pipeline computes it anyway, and a
    second derivation here could silently drift from the first."""
    if links is None:
        links = study_dd_links(studies)
    nodes = studies.select(
        F.concat(F.lit("HEALDATAPLATFORM:"), F.col("hdp_id")).alias("id"),
        F.col("study_name").alias("name"),
        F.array(F.lit("biolink:Study")).alias("categories"),
        F.col("study_description").alias("description"),
        F.col("research_program").alias("program"),
    )
    edges = links.filter(F.col("dd_id").isNotNull()).select(
        F.concat(F.lit("HEALDATAPLATFORM:"), F.col("hdp_id")).alias("subject"),
        F.lit("biolink:related_to").alias("predicate"),
        F.col("dd_id").alias("object"),
    )
    return nodes, edges


def heal_pipeline(
    studies: DataFrame, fields: DataFrame, mapping: DataFrame
) -> dict[str, DataFrame]:
    """Full EP2. Reconciliation invariants (tested):
    - every fields row lands in variable_index exactly once
    - stray dds = link dd_ids minus fields dd_ids (anti join), and
      (strays ∪ rendered dds) == all linked dds
    - unmapped studies keep null study_type (left join, :673-675)
    """
    links = study_dd_links(studies)
    norm = normalize_fields(fields)
    routed = broadcast_map_enrich(
        studies,
        mapping.select(
            F.col("HDPID").alias("hdp_id"), "study_type", "network_name"
        ),
        "hdp_id",
    )
    strays = anti_join(
        links.filter(F.col("dd_id").isNotNull()).select("hdp_id", "dd_id"),
        norm.select("dd_id").distinct(),
        "dd_id",
    )
    nodes, edges = kgx_graph(studies, links)
    return {
        "links": links,
        "fields_normalized": norm,
        "variable_index": variable_index(norm),
        "xml_docs": heal_xml_docs(norm),
        "studies_routed": routed,
        "stray_dds": strays,
        "kgx_nodes": nodes,
        "kgx_edges": edges,
    }
