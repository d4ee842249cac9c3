"""CLI smoke: the pipeline entry points produce the reference's
output artifacts end-to-end."""

from __future__ import annotations

import os


def test_cli_bdc_end_to_end(spark, tmp_path):
    from dug_data_ingest_spark.cli import run_bdc
    from dug_data_ingest_spark.plans import fixtures as FX

    gen3_p = str(tmp_path / "gen3")
    pic_p = str(tmp_path / "pic")
    FX.gen3_studies(spark).write.parquet(gen3_p)
    FX.picsure_variables(spark).write.parquet(pic_p)

    class A:
        gen3, picsure, out, csv = gen3_p, pic_p, str(tmp_path / "out"), False

    run_bdc(spark, A)
    assert os.path.isdir(f"{A.out}/dbgap_xml")
    summary = (
        spark.read.option("header", True).csv(f"{A.out}/processing_summary")
    )
    quarantine = spark.read.option("header", True).csv(f"{A.out}/quarantine")
    assert summary.count() + quarantine.count() == FX.gen3_studies(spark).count()


def test_cli_heal_end_to_end(spark, tmp_path):
    from dug_data_ingest_spark.cli import run_heal
    from dug_data_ingest_spark.plans import fixtures as FX

    studies_p = str(tmp_path / "studies")
    fields_p = str(tmp_path / "fields")
    map_p = str(tmp_path / "mapping")
    FX.heal_studies(spark).write.parquet(studies_p)
    FX.heal_fields(spark).write.parquet(fields_p)
    FX.hdp_mapping(spark).write.parquet(map_p)

    class A:
        studies, fields, mapping = studies_p, fields_p, map_p
        out, csv = str(tmp_path / "out"), False

    run_heal(spark, A)
    vi = spark.read.option("header", True).csv(f"{A.out}/variable_index")
    assert vi.count() == FX.heal_fields(spark).count()
    nodes = spark.read.json(f"{A.out}/kgx/nodes")
    assert nodes.count() == FX.heal_studies(spark).count()
