"""DataSource-v2 dbGaP XML connector (sources/xml_datasource.py):
read a directory as VARIABLE_SCHEMA rows with per-file partitions and
study_id file pruning; write renders one XML doc per (study, dd).
Round-trips against the mapInPandas render path (xml_dbgap.py) so the
two packagings can never drift.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dug_data_ingest_spark.sources import xml_datasource
from dug_data_ingest_spark.sources.xml_datasource import DbGapXmlReader
from dug_data_ingest_spark.sources.xml_dbgap import (
    VARIABLE_SCHEMA,
    render_data_tables,
)


def _variables(spark):
    data = [
        ("s1", "dd1", "v1", "AGE", "age in years", "integer",
         [Row(code="1", label="young"), Row(code="2", label="old")]),
        ("s1", "dd1", "v2", "SEX", "sex code", "encoded", None),
        ("s1", "dd2", "v3", "BMI", "body mass index", "decimal", None),
        ("s2", "dd3", "v4", "SMOKE", "smoking status", "encoded",
         [Row(code="0", label="never")]),
    ]
    return spark.createDataFrame(data, VARIABLE_SCHEMA)


@pytest.fixture()
def xml_dir(spark, tmp_path):
    out = tmp_path / "xmls"
    out.mkdir()
    docs = render_data_tables(_variables(spark)).collect()
    for d in docs:
        (out / f"{d.study_id}__{d.dd_id}.xml").write_text(d.xml)
    return str(out)


def _rows(df):
    return sorted(
        (r.study_id, r.dd_id, r.var_id, r.name, r.description, r.type,
         tuple((v.code, v.label) for v in r["values"]) if r["values"] else None)
        for r in df.collect()
    )


def test_read_directory_roundtrips(spark, xml_dir):
    xml_datasource.register(spark)
    got = spark.read.format("dbgap_xml").load(xml_dir)
    assert got.schema == VARIABLE_SCHEMA
    assert _rows(got) == _rows(_variables(spark))


def test_one_partition_per_file(xml_dir):
    reader = DbGapXmlReader({"path": xml_dir})
    assert len(reader.partitions()) == 3  # dd1, dd2, dd3 files
    reader2 = DbGapXmlReader({"path": xml_dir, "files_per_partition": "2"})
    assert len(reader2.partitions()) == 2


def test_pushed_study_filter_prunes_files(xml_dir):
    from pyspark.sql.datasource import EqualTo, IsNotNull

    reader = DbGapXmlReader({"path": xml_dir, "filename_scheme": "study_dd"})
    pushed = [EqualTo(("study_id",), "s1"), IsNotNull(("name",))]
    # every filter is reported back unsupported (Spark re-applies on
    # rows), yet the matching files are pruned at planning time
    assert list(reader.pushFilters(pushed)) == pushed
    files = [p for part in reader.partitions() for p in part.paths]
    assert len(files) == 2 and all("s1__" in p for p in files)
    # without the scheme option, no pruning happens on foreign layouts
    plain = DbGapXmlReader({"path": xml_dir})
    plain.pushFilters(pushed)
    assert len([p for part in plain.partitions() for p in part.paths]) == 3


def test_filtered_read_end_to_end(spark, xml_dir):
    xml_datasource.register(spark)
    got = (
        spark.read.format("dbgap_xml")
        .option("filename_scheme", "study_dd")
        .load(xml_dir)
        .filter(F.col("study_id") == "s2")
    )
    rows = _rows(got)
    assert [r[0] for r in rows] == ["s2"]


def test_write_then_read_roundtrip(spark, tmp_path):
    xml_datasource.register(spark)
    out = str(tmp_path / "written")
    src = _variables(spark).repartition("study_id", "dd_id")
    src.write.format("dbgap_xml").mode("overwrite").save(out)
    back = spark.read.format("dbgap_xml").load(out)
    assert _rows(back) == _rows(_variables(spark))
    # overwrite re-run is idempotent: same rows, no stale files
    src.write.format("dbgap_xml").mode("overwrite").save(out)
    assert _rows(spark.read.format("dbgap_xml").load(out)) == _rows(_variables(spark))


def test_pruning_never_drops_foreign_files(spark, xml_dir, tmp_path):
    # a file that doesn't follow the study__dd naming carries no study
    # in its name, so pruning must keep it and let Spark's row filter
    # decide — pruning is an optimization, never a correctness gate
    import shutil

    foreign = f"{xml_dir}/legacy.xml"
    shutil.copy(f"{xml_dir}/s2__dd3.xml", foreign)
    from pyspark.sql.datasource import EqualTo

    reader = DbGapXmlReader({"path": xml_dir, "filename_scheme": "study_dd"})
    reader.pushFilters([EqualTo(("study_id",), "s2")])
    files = [p for part in reader.partitions() for p in part.paths]
    assert foreign in files  # kept despite the filter
    assert not any("s1__" in p for p in files)  # scheme files still pruned
    # end-to-end: rows from the mis-named file still arrive correctly
    xml_datasource.register(spark)
    got = (
        spark.read.format("dbgap_xml")
        .option("filename_scheme", "study_dd")
        .load(xml_dir)
        .filter(F.col("study_id") == "s2")
    )
    assert got.count() == 2  # s2's variable in both the real and copied file


def test_url_joining_handles_bare_paths():
    from dug_data_ingest_spark.sources.http_client import _page_url

    assert _page_url("http://h/mds/metadata", 10, 0) == "http://h/mds/metadata?limit=10&offset=0"
    assert _page_url("http://h/mds?x=1", 10, 50) == "http://h/mds?x=1&limit=10&offset=50"


def test_overwrite_commit_is_staged(spark, tmp_path):
    # stale recursive files vanish on commit; tmp files never visible
    import os

    xml_datasource.register(spark)
    out = tmp_path / "staged"
    (out / "sub").mkdir(parents=True)
    (out / "sub" / "stale__old.xml").write_text("<data_table/>")
    src = _variables(spark).repartition("study_id", "dd_id")
    src.write.format("dbgap_xml").mode("overwrite").save(str(out))
    names = sorted(os.path.basename(p) for p in __import__("glob").glob(f"{out}/**/*.xml*", recursive=True))
    assert not any(".tmp-" in n for n in names)  # all staged files promoted
    assert "stale__old.xml" not in names  # recursive stale cleanup
    assert _rows(spark.read.format("dbgap_xml").load(str(out))) == _rows(_variables(spark))


def test_streaming_read_is_incremental_exactly_once(spark, tmp_path):
    # land 2 files -> first availableNow run ingests them; land 1 more
    # -> second run (same checkpoint) ingests ONLY the new file
    xml_datasource.register(spark)
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    docs = {d.dd_id: d for d in render_data_tables(_variables(spark)).collect()}
    (land / "s1__dd1.xml").write_text(docs["dd1"].xml)
    (land / "s1__dd2.xml").write_text(docs["dd2"].xml)

    def run_once():
        q = (
            spark.readStream.format("dbgap_xml")
            .load(str(land))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(sink)
    assert sorted(r.var_id for r in first.collect()) == ["v1", "v2", "v3"]

    (land / "s2__dd3.xml").write_text(docs["dd3"].xml)
    run_once()
    second = spark.read.parquet(sink)
    # exactly-once: dd1/dd2 not re-ingested, dd3 appended
    assert sorted(r.var_id for r in second.collect()) == ["v1", "v2", "v3", "v4"]
