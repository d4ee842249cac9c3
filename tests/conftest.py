from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dug_data_ingest_spark.session import get_spark  # noqa: E402

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("dug-data-ingest-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{TEST_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return bool(v)
    return v


def normalize_frame(pdf):
    """Mirror of the driver's compare: sort columns by name, canonical
    cell values, order-insensitive row multiset."""
    import pandas as pd

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    pdf = pdf.where(pd.notna(pdf), None)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return cols, sorted(rows, key=repr)


def assert_frames_match(spark_df, duck_rel, slug: str):
    spdf = spark_df.toPandas()
    ddf = duck_rel.df()
    s_cols, s_rows = normalize_frame(spdf)
    d_cols, d_rows = normalize_frame(ddf)
    assert s_cols == d_cols, f"{slug}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{slug}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{slug}: {len(mismatches)} row mismatches, first: {mismatches[:3]}"
