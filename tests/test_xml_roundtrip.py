"""Round-trip property (SURVEY §5): parse(render(df)) == df on the
Study/DataTable/Variable/Value tree."""

from __future__ import annotations

from pyspark.sql import functions as F

from dug_data_ingest_spark.sources.xml_dbgap import (
    parse_data_tables,
    render_data_tables,
)
from tests.conftest import TEST_SF_DIR


def _variables(spark):
    from dug_data_ingest_spark.queries.sources import _part_as_variables

    return _part_as_variables(spark, TEST_SF_DIR)


def test_render_parse_roundtrip(spark):
    original = _variables(spark)
    back = parse_data_tables(render_data_tables(original))
    cols = ["study_id", "dd_id", "var_id", "name", "type"]
    orig_rows = sorted(map(tuple, original.select(cols).collect()))
    back_rows = sorted(map(tuple, back.select(cols).collect()))
    assert orig_rows == back_rows
    # values survive too
    v = back.select(F.col("values").getItem(0).getField("code")).collect()
    assert all(r[0] is not None for r in v)


def test_render_is_parseable_xml(spark):
    import xml.etree.ElementTree as ET

    doc = render_data_tables(_variables(spark)).first()
    root = ET.fromstring(doc.xml)
    assert root.tag == "data_table"
    assert root.get("study_id") == doc.study_id
    assert len(root.findall("variable")) >= 1


def test_parse_tolerates_malformed(spark):
    docs = spark.createDataFrame(
        [("s1", "d1", "<data_table id='d1' study_id='s1'><variable id='v1'><name>n</name></variable></data_table>"),
         ("s2", "d2", "not xml at all <<<")],
        "study_id string, dd_id string, xml string",
    )
    rows = parse_data_tables(docs).collect()
    assert len(rows) == 1 and rows[0].var_id == "v1"


def test_gap_exchange_stylesheet_pi(spark):
    from pyspark.sql import functions as F

    from dug_data_ingest_spark.sources.xml_dbgap import (
        parse_gap_exchange,
        render_gap_exchange,
    )

    studies = spark.createDataFrame(
        [("phs000001", "phs000001.v1.p1", "S & T <study>", 'desc "quoted"', "prog|x")],
        ["study_id", "accession", "study_name", "description", "program"],
    )
    with_pi = render_gap_exchange(studies, add_stylesheet=True)
    xml = with_pi.first().xml
    assert xml.startswith('<?xml-stylesheet type="text/xsl"')
    # parse back through the PI, escaping intact
    row = parse_gap_exchange(with_pi).first()
    assert row.study_name == "S & T <study>"
    assert row.description == 'desc "quoted"'


def test_modify_gap_exchange_study_name(spark):
    from dug_data_ingest_spark.sources.xml_dbgap import (
        modify_gap_exchange_study_name,
        parse_gap_exchange,
        render_gap_exchange,
    )

    studies = spark.createDataFrame(
        [
            ("phs1", "phs1.v1.p1", "Old One", "d1", "p1"),
            ("phs2", "phs2.v1.p1", "Old Two", "d2", "p2"),
        ],
        ["study_id", "accession", "study_name", "description", "program"],
    )
    docs = render_gap_exchange(studies)
    renames = spark.createDataFrame(
        [("phs1", "New & <Name>")], ["study_id", "new_study_name"]
    )
    out = modify_gap_exchange_study_name(docs, renames)
    flags = {r.study_id: r.modified for r in out.collect()}
    assert flags == {"phs1": True, "phs2": False}
    # The edit must survive re-serialization + re-parse, escaping intact.
    parsed = {
        r.study_id: r.study_name
        for r in parse_gap_exchange(out.select("study_id", "xml")).collect()
    }
    assert parsed == {"phs1": "New & <Name>", "phs2": "Old Two"}


def test_modify_gap_exchange_missing_element_is_false(spark):
    # The reference returns False when no Study/Configuration/
    # StudyNameEntrez exists; the doc must pass through unchanged.
    from dug_data_ingest_spark.sources.xml_dbgap import (
        modify_gap_exchange_study_name,
    )

    bare = "<GaPExchange><Studies><Study accession='a'/></Studies></GaPExchange>"
    docs = spark.createDataFrame([("phs9", bare)], ["study_id", "xml"])
    renames = spark.createDataFrame([("phs9", "X")], ["study_id", "new_study_name"])
    row = modify_gap_exchange_study_name(docs, renames).first()
    assert row.modified is False and row.xml == bare


def test_modify_preserves_stylesheet_prolog(spark):
    # ET parses THROUGH a prolog but never re-emits it: the rewrite
    # must carry the xml-stylesheet PI explicitly, or exactly the
    # renamed rows lose it and the published corpus is inconsistently
    # formatted
    from dug_data_ingest_spark.sources.xml_dbgap import (
        modify_gap_exchange_study_name,
        parse_gap_exchange,
        render_gap_exchange,
    )
    from dug_data_ingest_spark.queries.sources import _customer_as_studies

    studies = _customer_as_studies(spark, TEST_SF_DIR).limit(4)
    docs = render_gap_exchange(studies, add_stylesheet=True)
    one = docs.select("study_id").limit(1).collect()[0].study_id
    renames = spark.createDataFrame(
        [(one, "Renamed Study")], "study_id string, new_study_name string"
    )
    out = modify_gap_exchange_study_name(docs, renames).collect()
    by_id = {r.study_id: r for r in out}
    assert by_id[one].modified
    for r in out:
        assert r.xml.startswith("<?xml-stylesheet"), (r.study_id, r.xml[:60])
    # and the renamed doc still parses with the new name
    parsed = {
        r.study_id: r.study_name
        for r in parse_gap_exchange(
            spark.createDataFrame(
                [(r.study_id, r.xml) for r in out], "study_id string, xml string"
            )
        ).collect()
    }
    assert parsed[one] == "Renamed Study"


def test_null_and_malformed_docs_do_not_crash(spark):
    from dug_data_ingest_spark.sources.xml_dbgap import (
        modify_gap_exchange_study_name,
        parse_data_tables,
        parse_gap_exchange,
    )

    docs = spark.createDataFrame(
        [("s1", None), ("s2", "<not xml"), ("s3", "<GaPExchange><Studies>"
          '<Study accession="a"><Configuration>'
          "<StudyNameEntrez>N</StudyNameEntrez></Configuration>"
          "</Study></Studies></GaPExchange>")],
        "study_id string, xml string",
    )
    parsed = parse_gap_exchange(docs).collect()
    assert [r.study_id for r in parsed] == ["s3"]  # bad docs dropped, job alive

    renames = spark.createDataFrame(
        [("s1", "X"), ("s3", "Y")], "study_id string, new_study_name string"
    )
    out = {r.study_id: r for r in modify_gap_exchange_study_name(docs, renames).collect()}
    assert out["s1"].xml is None and not out["s1"].modified  # passthrough
    assert out["s3"].modified

    dt = spark.createDataFrame(
        [("s1", "d1", None), ("s2", "d2", "<data_table")],
        "study_id string, dd_id string, xml string",
    )
    assert parse_data_tables(dt).collect() == []


def test_duplicate_renames_do_not_duplicate_docs(spark):
    from dug_data_ingest_spark.sources.xml_dbgap import (
        modify_gap_exchange_study_name,
        render_gap_exchange,
    )
    from dug_data_ingest_spark.queries.sources import _customer_as_studies

    studies = _customer_as_studies(spark, TEST_SF_DIR).limit(3)
    docs = render_gap_exchange(studies)
    n = docs.count()
    one = docs.select("study_id").limit(1).collect()[0].study_id
    renames = spark.createDataFrame(
        [(one, "B name"), (one, "A name")],
        "study_id string, new_study_name string",
    )
    out = modify_gap_exchange_study_name(docs, renames).collect()
    assert len(out) == n  # duplicate-keyed dim must not fan the join out
    # deterministic pick: min of the candidate names
    from dug_data_ingest_spark.sources.xml_dbgap import parse_gap_exchange

    parsed = {
        r.study_id: r.study_name
        for r in parse_gap_exchange(
            spark.createDataFrame(
                [(r.study_id, r.xml) for r in out], "study_id string, xml string"
            )
        ).collect()
    }
    assert parsed[one] == "A name"


def test_empty_values_coalesce_to_null_through_roundtrip(spark):
    # XML has no representation distinguishing values=[] from
    # values=NULL (both render with no <value> children), so the
    # round-trip coalesces [] -> NULL — documented in parse_data_tables
    from dug_data_ingest_spark.sources.xml_dbgap import (
        parse_data_tables,
        render_data_tables,
    )

    rows = [
        ("s1", "d1", "v1", "n1", None, "string", []),
        ("s1", "d1", "v2", "n2", None, "string", None),
        ("s1", "d1", "v3", "n3", None, "enum", [("1", "yes")]),
    ]
    from dug_data_ingest_spark.sources.xml_dbgap import VARIABLE_SCHEMA

    df = spark.createDataFrame(rows, VARIABLE_SCHEMA)
    back = {r.var_id: r.values for r in parse_data_tables(render_data_tables(df)).collect()}
    assert back["v1"] is None and back["v2"] is None
    assert [tuple(v) for v in back["v3"]] == [("1", "yes")]


def test_content_containing_pi_close_is_not_truncated(spark):
    # '?>' + newline inside a text node must never truncate the doc
    # (no string surgery on the prolog — expat owns the parse)
    from dug_data_ingest_spark.sources.xml_dbgap import (
        parse_gap_exchange,
        render_gap_exchange,
    )

    studies = spark.createDataFrame(
        [("s1", "acc1", "Name", "weird ?>\n description", "P")],
        "study_id string, accession string, study_name string, "
        "description string, program string",
    )
    parsed = parse_gap_exchange(render_gap_exchange(studies, add_stylesheet=True)).collect()
    assert parsed[0].description == "weird ?>\n description"


def test_fused_rename_roundtrip_matches_staged(spark):
    # the r13 fused path (one mapInPandas) must be value-identical to
    # the staged render -> modify -> parse pipeline for every case
    # class: renamed, untouched, escaping-heavy, NULL-field study
    from dug_data_ingest_spark.sources.xml_dbgap import (
        modify_gap_exchange_study_name,
        parse_gap_exchange,
        render_gap_exchange,
        rename_gap_exchange_roundtrip,
    )

    studies = spark.createDataFrame(
        [
            ("phs1", "phs1.v1.p1", "Old One", "d1", "p1"),
            ("phs2", "phs2.v1.p1", "S & T <study>", 'desc "q"', "p|2"),
            ("phs3", "phs3.v1.p1", None, None, None),
        ],
        ["study_id", "accession", "study_name", "description", "program"],
    )
    renames = spark.createDataFrame(
        [("phs1", "New & <Name>"), ("phs3", "Filled")],
        ["study_id", "new_study_name"],
    )
    staged = parse_gap_exchange(
        modify_gap_exchange_study_name(render_gap_exchange(studies), renames),
        keep_cols=("modified",),
    )
    fused = rename_gap_exchange_roundtrip(studies, renames)
    key = lambda r: r["study_id"]  # noqa: E731
    assert sorted(map(tuple, fused.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, staged.collect()), key=lambda t: t[0]
    )
    # and it really is ONE Python stage (final plan only — the AQE
    # toString appends the Initial Plan copy)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("+- == Initial Plan ==")[0]
    assert plan.count("MapInPandas") == 1, plan
