"""Local replica of the driver's correctness gate: run every
registered query on Spark and its DuckDB oracle on the same parquet,
compare row-count + columns + order-insensitive values.
"""

from __future__ import annotations

import pytest

from dug_data_ingest_spark.queries import all_oracles, all_queries
from tests.conftest import TEST_SF_DIR, assert_frames_match

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for slug, fn in QUERIES.items():
        assert callable(fn), slug


@pytest.mark.parametrize("slug", sorted(ORACLES))
def test_oracle_parity(spark, duck, slug):
    df = QUERIES[slug](spark, TEST_SF_DIR)
    rel = duck.sql(ORACLES[slug])
    assert_frames_match(df, rel, slug)


@pytest.mark.parametrize("slug", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, slug):
    df = QUERIES[slug](spark, TEST_SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "study_id" in df.columns and "repository_count" in df.columns
