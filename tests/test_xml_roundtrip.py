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
