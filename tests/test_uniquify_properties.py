"""Model-based property test for ``uniquify_ids``
(operators/windows.py): a pure-Python reference model of the
sequential seen-set walk (reference:
scripts/heal/get_heal_platform_mds_data_dicts.py:390-400) checked for
EXACT output equality against the one-pass window implementation on
hypothesis-generated name sequences.

The window rewrite is only equivalent to the walk when no RAW input
name has the generated ``base_N`` shape of another name in the input
(the documented divergence: the walk keeps suffixing, the window
raises — pinned by test_uniquify_raises_on_residual_collision in
test_scale_mechanisms.py). The strategy therefore draws from a pool
with no underscore-digit shapes, where the two algorithms must agree
exactly — including suffix ASSIGNMENT order, which follows the
explicit ``ord`` column, not partitioning.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dug_data_ingest_spark.operators.windows import uniquify_ids

# Small pool forces heavy duplication; no name has a `_<digits>`
# suffix, so the generated ids can never collide with a raw input id.
_NAMES = ["a", "b", "c", "aa"]

_name_seqs = st.lists(st.sampled_from(_NAMES), min_size=1, max_size=12)


def _model_walk(names: list[str]) -> list[str]:
    """Reference model: sequential seen-set suffixing in input order."""
    seen: set[str] = set()
    out = []
    for base in names:
        candidate = base
        i = 0
        while candidate in seen:
            i += 1
            candidate = f"{base}_{i}"
        seen.add(candidate)
        out.append(candidate)
    return out


@given(names=_name_seqs)
@settings(max_examples=25, deadline=None)
def test_uniquify_matches_sequential_walk(spark, names):
    df = spark.createDataFrame(list(enumerate(names)), ["ord", "name"])
    got = {
        (r.ord, r.uname)
        for r in uniquify_ids(df, "name", [F.col("ord")], "uname").collect()
    }
    assert got == set(enumerate(_model_walk(names)))
