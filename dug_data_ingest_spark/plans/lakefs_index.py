"""EP3 — the duplicate-index report, the reference's closest thing to
a real query and our flagship plan shape.

Reference: scripts/lakefs/generate_lakefs_dbgap_xml_index.py —
recursive listing (:183-213) → XML parse to Study/Section/Variable
rows (:110-180) → per (study_id, repository) nested counts (:274-288)
→ pivot by repository with a formatted cell + repository_count
(:266-291) → CSV.

The reference accumulates into module-global lists (:76-79) in one
thread; here the whole report is a single DataFrame lineage: one
shuffle for the groupBy, one for the pivot (both on study_id, so AQE
coalesces them), nothing on the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dug_data_ingest_spark.operators.aggregates import nested_counts, pivot_report


def variable_index_report(
    variables: DataFrame,
    repositories: Sequence[str],
    study_col: str = "study_id",
    repo_col: str = "repository",
    dd_col: str = "dd_id",
    section_col: str = "section",
) -> DataFrame:
    """variables (one row per variable occurrence) → pivot report.

    Columns out: ``study_id``, one column per repository holding the
    formatted "N DDs, M sections, K variables" cell (null where the
    study is absent from that repository), and ``repository_count``.
    """
    counts = nested_counts(
        variables,
        keys=[study_col, repo_col],
        distinct_cols=[(dd_col, "n_dds"), (section_col, "n_sections")],
    )
    cell = F.first(
        F.format_string(
            "%d DDs, %d sections, %d variables",
            F.col("n_dds"),
            F.col("n_sections"),
            F.col("n_rows"),
        )
    )
    report = pivot_report(counts, study_col, repo_col, repositories, cell)
    return report.orderBy(study_col)
