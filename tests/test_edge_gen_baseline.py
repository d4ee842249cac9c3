"""The retired KGX edge-projection query
(queries/relational.py:join_edge_gen) stays correct even though it
left the registry in round 8: it graded the IDENTICAL oracle as
snk-json-kgx (one registry slot per logical query — the
sim-topk-bruteforce / join-fuzzy-name precedent), whose scenario
derives the same edges and additionally round-trips them through the
KGX sink. The edge_gen operator (operators/joins.py) remains library
surface, so it keeps its own oracle parity here."""

from __future__ import annotations

import duckdb

from dug_data_ingest_spark.queries.relational import (
    _RETIRED_EDGE_GEN_ORACLE,
    join_edge_gen,
)
from tests.conftest import TEST_SF_DIR


def _norm(df):
    cols = sorted(df.columns)
    return sorted(map(repr, df[cols].itertuples(index=False, name=None)))


def test_retired_edge_gen_still_matches_its_oracle(spark):
    sp = join_edge_gen(spark, TEST_SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{TEST_SF_DIR}/orders.parquet'"
    )
    du = con.sql(_RETIRED_EDGE_GEN_ORACLE).df()
    assert len(sp) > 0
    assert _norm(sp) == _norm(du)


def test_retired_edge_gen_not_in_registry():
    from dug_data_ingest_spark.queries import all_oracles, all_queries

    assert "join-edge-gen" not in all_queries()
    assert "join-edge-gen" not in all_oracles()
    # the surviving slug of the identical-oracle pair, and the slug
    # the freed slot registered
    assert "snk-json-kgx" in all_queries()
    assert "dedup-strip-spans" in all_queries()


def test_survivor_grades_the_same_values(spark):
    # the retirement rationale: snk-json-kgx's graded values subsume
    # join-edge-gen's — identical oracle, identical edge rows
    from dug_data_ingest_spark.queries import all_oracles

    assert (
        " ".join(_RETIRED_EDGE_GEN_ORACLE.split())
        == all_oracles()["snk-json-kgx"]
    )
