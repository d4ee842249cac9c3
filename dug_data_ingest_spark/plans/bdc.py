"""EP1 — the BDC ingest pipeline (SURVEY.md §3), Spark-first.

Reference orchestration: scripts/bdc/ingest.sh drives
get_bdc_studies_md_from_picsure.py (clean variables) →
get_bdc_studies_md_from_gen3.py (validate studies) →
run_dbgap_xml_gen_fallback.py (per-study loop: join variables, group
by data table, render XML, accumulate a mutable summary frame) →
rclone/commit per program.

Here each stage is a pure ``DataFrame -> DataFrame`` transform on one
lineage; the per-study Python loop becomes a broadcast join + grouped
render; the mutable summary becomes a status column aggregated at the
end (never abort, SURVEY §7 principles). The whole pipeline is two
shuffles: the (study_id, dtId) grouped render and the scoreboard
aggregation — the study-side join broadcasts (10^4 studies vs a
variable fact table that dominates at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dug_data_ingest_spark.operators.filters import (
    notnull_conjunction,
    required_fields_reason,
    split_valid_quarantine,
)
from dug_data_ingest_spark.operators.joins import enrich_left_broadcast
from dug_data_ingest_spark.operators.projections import (
    derive_study_id,
    normalize_program,
)
from dug_data_ingest_spark.sources.xml_dbgap import render_data_tables

PHS_ONLY_RE = r"^phs\d+"


def clean_picsure(variables: DataFrame) -> DataFrame:
    """Step 1 — PicSure variable cleaning: 5 non-null columns AND
    varId startswith 'phv', plus the derived base study id.

    Reference: scripts/bdc/get_bdc_studies_md_from_picsure.py:34-51.
    """
    cleaned = notnull_conjunction(
        variables,
        ["studyId", "dtId", "varId", "derived_var_name", "description"],
        startswith={"varId": "phv"},
    )
    return cleaned.withColumn("study_id", derive_study_id(F.col("studyId")))


def validate_gen3(studies: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Step 2 — study validation: dbGaP-shaped accession + required
    fields; non-matching / incomplete rows land in quarantine with a
    reason (never dropped silently).

    Reference: filter_studies at
    scripts/bdc/get_bdc_studies_md_from_gen3.py:167-219 and the
    accession regex at get_bdc_studies_from_gen3.py:214-226.
    """
    with_reason = required_fields_reason(
        studies, ["Accession", "Study Name", "Description"]
    )
    bad_acc = F.col("reject_reason").isNull() & ~F.col("Accession").rlike(PHS_ONLY_RE)
    with_reason = with_reason.withColumn(
        "reject_reason",
        F.when(bad_acc, F.lit("not a dbGaP accession")).otherwise(
            F.col("reject_reason")
        ),
    )
    valid, quarantine = split_valid_quarantine(with_reason)
    valid = (
        valid.withColumn("study_id", derive_study_id(F.col("Accession")))
        .withColumn("program_dir", normalize_program(F.col("Program")))
    )
    return valid, quarantine


def generate_xml(studies_valid: DataFrame, variables_clean: DataFrame) -> DataFrame:
    """Step 3 — the driving join + grouped XML render.

    One ``<data_table>`` document per (study_id, dtId) group, exactly
    the doc-per-group shape of scripts/bdc/xml_generator.py:111-162 /
    :201-212. The study side broadcasts; the grouped render is the
    pipeline's only wide transform on the variable fact table.
    """
    joined = enrich_left_broadcast(
        variables_clean,
        studies_valid.select("study_id", "Accession", "program_dir"),
        "study_id",
        how="inner",
    )
    renderable = joined.select(
        "study_id",
        F.col("dtId").alias("dd_id"),
        F.col("varId").alias("var_id"),
        F.coalesce("columnmeta_name", "derived_var_name").alias("name"),
        F.coalesce("columnmeta_description", "description").alias("description"),
        F.when(F.col("is_categorical"), "encoded value").otherwise("string").alias("type"),
        F.when(
            F.col("is_categorical"),
            F.transform(
                # plain from_json: Spark's JSON reader accepts
                # single-quoted strings (allowSingleQuotes default),
                # so it parses every Python-repr quoting form the
                # reference's eval() saw — ['Yes'], ["Don't know"],
                # mixed lists, embedded double quotes. The previous
                # regexp_replace(' -> ") corrupted any label
                # containing an apostrophe into invalid JSON and
                # silently nulled the whole values array.
                F.from_json(F.col("values"), "array<string>"),
                lambda v: F.struct(v.alias("code"), v.alias("label")),
            ),
        ).alias("values"),
    )
    return render_data_tables(renderable)


def summarize(
    studies_valid: DataFrame, variables_clean: DataFrame
) -> DataFrame:
    """Per-study scoreboard row: status/method/details columns carried
    set-based (the reference appends to a mutable pandas frame per
    loop iteration, run_dbgap_xml_gen_fallback.py:408-410, 459, 481).

    In fixture-replay mode there is no FTP download stage, so the
    method split is: studies with ≥1 cleaned variable → XML_generator
    SUCCESS; studies with none → both_methods_failed FAILED.
    """
    var_counts = variables_clean.groupBy("study_id").agg(
        F.count("*").alias("n_vars")
    )
    # studies ⟕ broadcast(var_counts), NOT a right join broadcasting
    # the study side: Spark cannot build the hash table on the
    # PRESERVED side of an outer join, so that hint would be silently
    # dropped and both sides shuffled. The per-study count table is
    # study-cardinality (small by construction) — the broadcastable
    # side of this join.
    scored = enrich_left_broadcast(
        studies_valid, var_counts, "study_id", how="left"
    ).select(
        "study_id",
        F.col("Accession").alias("accession_id"),
        F.when(F.col("n_vars") > 0, "SUCCESS").otherwise("FAILED").alias("status"),
        F.when(F.col("n_vars") > 0, "XML_generator")
        .otherwise("both_methods_failed")
        .alias("method"),
        # guard the format explicitly: Spark's format_string renders a
        # NULL argument as the literal string "null" (it never returns
        # NULL), so a bare coalesce over it can't supply the fallback —
        # studies with no variables would read "null variables
        # rendered" (latent until a scale where such studies exist;
        # caught by the sf0.1 oracle sweep)
        F.when(
            F.col("n_vars").isNotNull(),
            F.format_string("%d variables rendered", "n_vars"),
        )
        .otherwise(F.lit("no PicSure variables for study"))
        .alias("details"),
        F.col("program_dir").alias("program"),
    )
    return scored


def scoreboard(summary: DataFrame) -> DataFrame:
    """Counts by (status, method) — run_dbgap_xml_gen_fallback.py:80-126."""
    return summary.groupBy("status", "method").agg(F.count("*").alias("n"))


def bdc_pipeline(
    gen3_studies: DataFrame, picsure_variables: DataFrame
) -> dict[str, DataFrame]:
    """Full EP1: returns every stage output; nothing is collected.

    Reconciliation invariants (tested):
    - valid + quarantine row counts == gen3 input count
    - summary row count == valid count
    - SUCCESS studies in summary == distinct study_ids in xml_docs
    """
    variables_clean = clean_picsure(picsure_variables)
    studies_valid, quarantine = validate_gen3(gen3_studies)
    xml_docs = generate_xml(studies_valid, variables_clean)
    summary = summarize(studies_valid, variables_clean)
    return {
        "variables_clean": variables_clean,
        "studies_valid": studies_valid,
        "quarantine": quarantine,
        "xml_docs": xml_docs,
        "summary": summary,
        "scoreboard": scoreboard(summary),
    }
