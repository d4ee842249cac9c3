"""Model-based property test for ``stratified_exact_k``
(ext/curation.py): the two-phase rank-threshold refinement must
return EXACTLY the rows and ranks of the naive per-stratum window

    row_number() OVER (PARTITION BY strata ORDER BY md5(key), key) <= k

on arbitrary corpora — NULL strata, NULL keys, strata smaller than k,
duplicate keys across strata, and md5-bucket boundary collisions
included. The DuckDB oracle cannot distinguish the two forms (it IS
the naive form), so only a model pin can catch a prune that drops a
true top-k row; the plan pin (test_plan_shapes.py) guards the other
direction — that the refinement's semi join doesn't silently
disappear back into a full-stratum sort.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from dug_data_ingest_spark.ext.curation import stratified_exact_k

# Few strata over many keys — the monster-stratum shape the refinement
# exists for; None exercises the null-safe semi join.
_STRATA = st.sampled_from(["en", "es", None])
_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 400)), _STRATA),
    max_size=60,
)


def _model(rows: list[tuple], k: int) -> set[tuple]:
    """Naive walk: per stratum, rank by (md5(str(key)), key) and keep
    <= k. Mirrors Spark's ordering: NULLs first under ascending."""
    by_stratum: dict = {}
    for key, stratum in rows:
        by_stratum.setdefault(stratum, []).append(key)
    out = set()
    for stratum, keys in by_stratum.items():
        def order(key):
            # md5(NULL) is NULL and sorts first, as does a NULL key in
            # the explicit tiebreak
            h = (
                None
                if key is None
                else hashlib.md5(str(key).encode()).hexdigest()
            )
            return (h is not None, h, key is not None, key)

        for rk, key in enumerate(sorted(keys, key=order)[:k], start=1):
            out.add((key, stratum, rk))
    return out


@given(rows=_rows, k=st.integers(1, 7), levels=st.sampled_from([1, 2]))
@example(rows=[(1, "en"), (1, "es"), (None, None), (2, None)], k=1, levels=1)
@example(rows=[(1, "en"), (1, "es"), (None, None), (2, None)], k=1, levels=3)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_refinement_matches_naive_model(spark, rows, k, levels):
    # levels > 1 recurses the bucket refinement on longer md5 prefixes;
    # the superset property must hold level by level, so every depth
    # returns EXACTLY the naive rows and ranks.
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    got = {
        (r["doc_id"], r["lang"], r["rk"])
        for r in stratified_exact_k(df, k=k, refine_levels=levels).collect()
    }
    assert got == _model(rows, k)


def test_prune_is_actually_pruning(spark):
    # One monster stratum: the candidate set entering the rank window
    # must be bucket-bounded, not the stratum. With 500 rows hashed
    # over 256 buckets and k=3, the admissible buckets hold only a few
    # rows — assert the semi join survives in the executed plan and
    # the result is still exactly the naive top-3.
    df = spark.createDataFrame(
        [(i, "en") for i in range(500)], "doc_id bigint, lang string"
    )
    out = stratified_exact_k(df, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    rows = [(i, "en") for i in range(500)]
    got = {(r["doc_id"], r["lang"], r["rk"]) for r in out.collect()}
    assert got == _model(rows, 3)


def test_multilevel_refinement_prunes_deeper(spark):
    # refine_levels=2 chains TWO null-safe semi joins (4-hex buckets on
    # top of 2-hex) and still returns the exact naive top-k; with 2000
    # rows the surviving candidate set entering the rank window is
    # ~k + n/65536-bounded rather than ~k + n/256.
    rows = [(i, "en") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = stratified_exact_k(df, k=2, refine_levels=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftSemi") >= 2, plan
    got = {(r["doc_id"], r["lang"], r["rk"]) for r in out.collect()}
    assert got == _model(rows, 2)
