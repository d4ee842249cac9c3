"""Pins for ext/graph.py::pagerank_weighted — weighted PageRank with
uniform dangling-mass redistribution over a fixed iteration count.
Closed-form over the edge weights, so the pin replays it in pure
Python on a graph that actually HAS a dangling node and asymmetric
weights; partition stability and validation ride the same fixture.
"""

from __future__ import annotations

import pytest

from dug_data_ingest_spark.ext.graph import pagerank_weighted

D = 0.85
ITERS = 3

# a -> b (3), a -> c (1), b -> c (2), c is DANGLING; d -> a (1)
EDGES = [
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "c", 2),
    ("d", "a", 1),
]


def _model():
    nodes = sorted({u for u, _, _ in EDGES} | {v for _, v, _ in EDGES})
    n = len(nodes)
    out_w = {}
    for u, _, w in EDGES:
        out_w[u] = out_w.get(u, 0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(ITERS):
        cin = {v: 0.0 for v in nodes}
        for u, v, w in EDGES:
            cin[v] += rank[u] * (w / out_w[u])
        dang = sum(rank[v] for v in nodes if v not in out_w)
        rank = {
            v: (1.0 - D) / n + D * (cin[v] + dang / n) for v in nodes
        }
    return {v: round(r, 4) for v, r in rank.items()}


def _df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string, weight int")


def test_pagerank_matches_pure_python_model(spark):
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank_weighted(_df(spark), n_iters=ITERS).collect()
    }
    assert got == _model()
    # fixture sanity: c is dangling and must still hold rank mass
    assert "c" in got and got["c"] > 0


def test_pagerank_mass_is_conserved(spark):
    total = sum(
        r["pagerank"]
        for r in pagerank_weighted(_df(spark), n_iters=ITERS).collect()
    )
    assert total == pytest.approx(1.0, abs=5e-4)  # 4dp rounding per node


def test_pagerank_partition_stable(spark):
    df = _df(spark)
    a = sorted(map(tuple, pagerank_weighted(df.repartition(5)).collect()))
    b = sorted(map(tuple, pagerank_weighted(df.coalesce(1)).collect()))
    assert a == b


def test_pagerank_validation(spark):
    with pytest.raises(ValueError, match="damping"):
        pagerank_weighted(_df(spark), damping=1.5)
    with pytest.raises(ValueError, match="n_iters"):
        pagerank_weighted(_df(spark), n_iters=0)
