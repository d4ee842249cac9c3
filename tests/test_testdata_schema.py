"""Guard: the driver-generated testdata schemas the whole repo assumes.

The 2026-08-13 regeneration changed ``events.ts`` from TIMESTAMP(NANOS)
to plain ``timestamp[us]`` and silently broke 14 slugs at once. This
test pins every table's column names and physical parquet dtypes so
the NEXT environment drift fails in exactly one obvious place.

``events.ts`` is special-cased: the loader
(dug_data_ingest_spark/queries/__init__.py::load) branches on the
actual dtype, so both historical encodings are legal — anything else
is not.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string",
               "n_regionkey": "int32"},
    "customer": {"c_custkey": "int64", "c_name": "string",
                 "c_nationkey": "int32", "c_acctbal": "double",
                 "c_mktsegment": "string"},
    "supplier": {"s_suppkey": "int64", "s_name": "string",
                 "s_nationkey": "int32", "s_acctbal": "double"},
    "part": {"p_partkey": "int64", "p_name": "string", "p_brand": "string",
             "p_type": "string", "p_size": "int32",
             "p_retailprice": "double"},
    "orders": {"o_orderkey": "int64", "o_custkey": "int64",
               "o_orderstatus": "string", "o_totalprice": "double",
               "o_orderdate": "timestamp[us]", "o_orderpriority": "string"},
    "lineitem": {"l_orderkey": "int64", "l_partkey": "int64",
                 "l_suppkey": "int64", "l_linenumber": "int32",
                 "l_quantity": "double", "l_extendedprice": "double",
                 "l_discount": "double", "l_tax": "double",
                 "l_returnflag": "string", "l_linestatus": "string",
                 "l_shipdate": "timestamp[us]"},
    "events": {"event_id": "int64", "ts": "timestamp[us]",
               "user_id": "int64", "event_type": "string",
               "value": "double", "props": "string"},
    "documents": {"doc_id": "int64", "text": "string", "lang": "string",
                  "source": "string", "n_chars": "int64"},
    "embeddings": {"vec_id": "int64", "embedding": "list<element: float>",
                   "label": "int32"},
}

# Encodings the events loader explicitly supports (dtype branch).
EVENTS_TS_OK = {"timestamp[us]", "timestamp[ns]", "int64"}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema(sf_dir: str, table: str) -> None:
    path = f"{sf_dir}/{table}.parquet"
    assert os.path.exists(path), f"missing testdata table {path}"
    schema = pq.read_schema(path)
    actual = {f.name: str(f.type) for f in schema}
    expected = dict(EXPECTED[table])
    if table == "events":
        assert actual.get("ts") in EVENTS_TS_OK, (
            f"events.ts drifted to {actual.get('ts')!r}; the loader only "
            f"handles {sorted(EVENTS_TS_OK)} — update load() AND this test"
        )
        expected.pop("ts")
        actual.pop("ts", None)
    assert actual == expected, (
        f"{path} schema drifted.\n  actual:   {actual}\n"
        f"  expected: {expected}\nEvery query in the registry assumes the "
        f"expected shape — fix loaders/queries before trusting other tests."
    )
