"""The retired length-band fuzzy-join baseline
(queries/relational.py:join_fuzzy_name) stays correct even though it
left the registry in round 7: it is the measured comparison point
behind join-fuzzy-qgram's design, so it must keep producing the exact
candidate-complete result the controlled comparison relied on."""

from __future__ import annotations

import duckdb

from dug_data_ingest_spark.queries.relational import (
    _RETIRED_FUZZY_NAME_ORACLE,
    join_fuzzy_name,
)
from tests.conftest import TEST_SF_DIR


def _norm(df):
    cols = sorted(df.columns)
    return sorted(map(repr, df[cols].itertuples(index=False, name=None)))


def test_retired_baseline_still_matches_its_oracle(spark):
    sp = join_fuzzy_name(spark, TEST_SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{TEST_SF_DIR}/part.parquet'"
    )
    du = con.sql(_RETIRED_FUZZY_NAME_ORACLE).df()
    assert len(sp) > 0
    assert _norm(sp) == _norm(du)


def test_retired_baseline_not_in_registry(spark):
    from dug_data_ingest_spark.queries import all_queries, all_oracles

    assert "join-fuzzy-name" not in all_queries()
    assert "join-fuzzy-name" not in all_oracles()
    assert "join-fuzzy-qgram" in all_queries()
