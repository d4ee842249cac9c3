"""End-to-end pipeline tests (SURVEY.md §5 item 2): fixture-shaped
metadata tables → full BDC (EP1) and HEAL (EP2) pipelines →
reconciliation invariants mirroring the reference's summary
scoreboards, plus XML round-trip through the real parser.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dug_data_ingest_spark.plans import fixtures as FX
from dug_data_ingest_spark.plans.bdc import bdc_pipeline
from dug_data_ingest_spark.plans.heal import heal_pipeline
from dug_data_ingest_spark.sources.xml_dbgap import parse_data_tables


@pytest.fixture(scope="module")
def bdc(spark):
    gen3 = FX.gen3_studies(spark)
    pic = FX.picsure_variables(spark)
    out = bdc_pipeline(gen3, pic)
    out["_gen3_count"] = gen3.count()
    out["_pic_count"] = pic.count()
    return out


@pytest.fixture(scope="module")
def heal(spark):
    studies = FX.heal_studies(spark)
    fields = FX.heal_fields(spark)
    mapping = FX.hdp_mapping(spark)
    out = heal_pipeline(studies, fields, mapping)
    out["_fields_count"] = fields.count()
    out["_studies_count"] = studies.count()
    return out


# ---------------------------------------------------------------------------
# EP1 — BDC
# ---------------------------------------------------------------------------


def test_bdc_valid_plus_quarantine_reconciles(bdc):
    # total = success + failed, set-based (run_dbgap_xml_gen_fallback.py:80-126)
    assert (
        bdc["studies_valid"].count() + bdc["quarantine"].count()
        == bdc["_gen3_count"]
    )


def test_bdc_quarantine_reasons_populated(bdc):
    q = bdc["quarantine"]
    assert q.filter(F.col("reject_reason").isNull()).count() == 0
    reasons = {r[0] for r in q.select("reject_reason").distinct().collect()}
    assert "not a dbGaP accession" in reasons
    assert any(r.startswith("missing required field") for r in reasons)


def test_bdc_summary_covers_every_valid_study(bdc):
    assert bdc["summary"].count() == bdc["studies_valid"].count()


def test_bdc_success_studies_match_rendered_docs(bdc):
    success_ids = {
        r[0]
        for r in bdc["summary"]
        .filter(F.col("status") == "SUCCESS")
        .select("study_id")
        .collect()
    }
    rendered_ids = {
        r[0] for r in bdc["xml_docs"].select("study_id").distinct().collect()
    }
    assert success_ids == rendered_ids
    assert len(rendered_ids) > 0


def test_bdc_scoreboard_totals(bdc):
    rows = {(r["status"], r["method"]): r["n"] for r in bdc["scoreboard"].collect()}
    assert sum(rows.values()) == bdc["summary"].count()
    assert all(
        m in ("XML_generator", "both_methods_failed") for (_, m) in rows
    )


def test_bdc_clean_filter_semantics(bdc):
    vc = bdc["variables_clean"]
    assert vc.filter(~F.col("varId").startswith("phv")).count() == 0
    assert vc.filter(F.col("dtId").isNull()).count() == 0


def test_bdc_xml_roundtrip_through_parser(bdc):
    docs = bdc["xml_docs"]
    parsed = parse_data_tables(docs.select("study_id", "dd_id", "xml"))
    # every rendered variable row comes back out of the parser
    n_vars_in = (
        bdc["variables_clean"]
        .join(bdc["studies_valid"].select("study_id"), "study_id", "inner")
        .count()
    )
    assert parsed.count() == n_vars_in
    # categorical variables carry their decoded value lists
    cat = parsed.filter(F.col("type") == "encoded value")
    assert cat.count() > 0
    assert cat.filter(F.size("values") != 3).count() == 0  # ['Male','Female','Other']


# ---------------------------------------------------------------------------
# EP2 — HEAL
# ---------------------------------------------------------------------------


def test_heal_variable_index_covers_all_fields(heal):
    assert heal["variable_index"].count() == heal["_fields_count"]


def test_heal_uniquify_no_duplicate_names_within_study(heal):
    dups = (
        heal["variable_index"]
        .groupBy("study_id", "name")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dups.count() == 0


def test_heal_uniquify_is_deterministic_across_partitionings(heal, spark):
    fields = FX.heal_fields(spark)
    from dug_data_ingest_spark.plans.heal import normalize_fields, variable_index

    a = variable_index(normalize_fields(fields)).orderBy("study_id", "dd_id", "name")
    b = variable_index(normalize_fields(fields.repartition(13))).orderBy(
        "study_id", "dd_id", "name"
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_heal_section_fallback_chain(heal):
    # every row has a non-null section; 'none' only when dd_id was null too
    vi = heal["variable_index"]
    assert vi.filter(F.col("section").isNull()).count() == 0
    fallback_to_dd = vi.filter(F.col("section").startswith("dd-"))
    assert fallback_to_dd.count() > 0  # rows with no section/module/node


def test_heal_enum_labels_with_code_fallback(heal):
    # code '9' has no label → encodings string falls back to 9=9
    enc = heal["variable_index"].filter(F.col("encodings").contains("9=9"))
    assert enc.count() > 0
    legacy = heal["variable_index"].filter(F.col("encodings") == "1=Male|2=Female")
    assert legacy.count() > 0  # legacy pipe-string path survives


def test_heal_stray_dds_are_the_ghost_links(heal):
    strays = {r["dd_id"] for r in heal["stray_dds"].collect()}
    assert strays  # fixture plants dd-missing-* ghosts
    assert all(s.startswith("dd-missing-") for s in strays)


def test_heal_routing_left_join_keeps_unmapped(heal):
    routed = heal["studies_routed"]
    assert routed.count() == heal["_studies_count"]
    assert routed.filter(F.col("study_type").isNull()).count() > 0
    assert routed.filter(F.col("study_type").isNotNull()).count() > 0


def test_heal_kgx_edges_subset_of_nodes(heal):
    node_ids = heal["kgx_nodes"].select(F.col("id").alias("subject"))
    dangling = heal["kgx_edges"].join(node_ids, "subject", "left_anti")
    assert dangling.count() == 0
    assert heal["kgx_nodes"].count() == heal["_studies_count"]


def test_heal_xml_docs_parse_back(heal):
    parsed = parse_data_tables(heal["xml_docs"].select("study_id", "dd_id", "xml"))
    assert parsed.count() == heal["_fields_count"]


def test_summarize_null_var_count_uses_fallback_details(spark):
    """Spark's format_string renders a NULL argument as the literal
    string "null" (it never returns NULL), so the no-variables
    fallback must be an explicit when/otherwise, not a coalesce over
    the formatted string. Latent until a scale where variable-less
    studies exist — caught by the sf0.1 oracle sweep."""
    from dug_data_ingest_spark.plans.bdc import summarize

    studies = spark.createDataFrame(
        [("phs000001", "phs000001.v1.p1", "covid"),
         ("phs000002", "phs000002.v1.p1", "covid")],
        ["study_id", "Accession", "program_dir"],
    )
    variables = spark.createDataFrame(
        [("phs000001", "phv1")], ["study_id", "varId"]
    )
    got = {r.study_id: (r.status, r.details) for r in summarize(studies, variables).collect()}
    assert got["phs000001"] == ("SUCCESS", "1 variables rendered")
    assert got["phs000002"] == ("FAILED", "no PicSure variables for study")


def test_coalesce_name_returns_raw_candidate_like_oracle(spark):
    # blankness is judged trimmed, the RAW candidate is returned (the
    # reference's get_study_name behavior) — and the registered oracle
    # must agree on whitespace-padded names, not emit the trimmed form
    import duckdb
    import pyspark.sql.functions as F

    from dug_data_ingest_spark.operators import projections as prj
    from dug_data_ingest_spark.queries import ORACLES, _register_all

    _register_all()
    rows = [
        (1, "BUILDING", " padded name "),   # falls through to c_name, raw
        (2, "  ", "fallback"),              # blank-after-trim candidate
        (3, " seg ", "unused"),             # padded first candidate, raw
        (4, None, None),                    # default
    ]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_mktsegment string, c_name string"
    )
    sp = {
        r.c_custkey: r.display_name
        for r in df.select(
            "c_custkey",
            prj.coalesce_name(
                F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                F.col("c_name"),
            ).alias("display_name"),
        ).collect()
    }
    assert sp == {1: " padded name ", 2: "fallback", 3: " seg ", 4: "(no name)"}
    con = duckdb.connect()
    con.register("customer_df", df.toPandas())
    con.execute("CREATE VIEW customer AS SELECT * FROM customer_df")
    du = {r[0]: r[1] for r in con.sql(ORACLES["proj-coalesce-name"]).fetchall()}
    assert du == sp
