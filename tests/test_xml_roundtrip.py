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
