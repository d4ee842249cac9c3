"""Model pin for ext/similarity.py::hard_negatives — contrastive
hard-negative mining: top-k cosine among rows whose label differs
(null-safe) from the query's.
"""

from __future__ import annotations

import math


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


ROWS = [
    (0, "a", [1.0, 0.0, 0.0]),
    (1, "a", [0.99, 0.1, 0.0]),   # same label: excluded however similar
    (2, "b", [0.9, 0.2, 0.1]),
    (3, "b", [0.0, 1.0, 0.0]),
    (4, None, [0.95, 0.0, 0.3]),  # NULL label: different class, eligible
    (5, "c", [0.5, 0.5, 0.5]),
]


def test_hard_negatives_match_model(spark):
    from dug_data_ingest_spark.ext.similarity import hard_negatives

    df = spark.createDataFrame(
        ROWS, "vec_id long, label string, embedding array<double>"
    )
    q = ROWS[0][2]
    got = [(r["vec_id"], r["label"]) for r in hard_negatives(df, q, "a", k=3).collect()]
    model = sorted(
        [(i, lab) for i, lab, v in ROWS if lab != "a"],
        key=lambda t: (-_cos(q, dict((i, v) for i, _, v in ROWS)[t[0]]), t[0]),
    )[:3]
    assert got == model
    # the same-label near-duplicate (vec 1, cos ~0.995) must be absent
    assert 1 not in [i for i, _ in got]
    # the NULL-label row is eligible (null-safe inequality)
    assert 4 in [i for i, _ in got]
