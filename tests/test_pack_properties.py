"""Model-based property test for greedy sequence packing
(ext/curation.py pack_sequences): a pure-Python greedy first-fit model
checked for exact (group, id, n_tok, chunk) equality on
hypothesis-generated corpora — random group shapes, token counts
straddling the cap, over-cap documents, and caps down to 1.

The fixed tests in test_curation.py pin the documented semantics on
hand-built frames; this explores the packing combinatorics (exact-fit
boundaries, consecutive over-cap docs, single-doc groups) randomly.
"""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from dug_data_ingest_spark.ext.curation import pack_sequences

# token count None = NULL text (0 tokens); "" counts as 1 token under
# the documented whitespace-split semantics, so zero only via NULL
_corpus = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),                       # group
        st.one_of(st.none(), st.integers(min_value=1, max_value=40)),
    ),
    min_size=1,
    max_size=24,
)


def _model(rows, cap):
    """{(group, doc_id): chunk} under greedy first-fit in id order."""
    out, state = {}, {}
    for gid, (g, t) in enumerate(rows):
        t = 0 if t is None else t
        chunk, acc = state.get(g, (0, None))
        if acc is None or acc + t > cap:
            chunk, acc = chunk + 1, t
        else:
            acc += t
        state[g] = (chunk, acc)
        out[(g, gid)] = chunk
    return out


@given(rows=_corpus, cap=st.integers(min_value=1, max_value=50))
@example(rows=[("a", 10), ("a", 10), ("a", 1)], cap=20)   # exact fit
@example(rows=[("a", 40), ("a", 40)], cap=10)             # all over-cap
@example(rows=[("a", None), ("a", None), ("a", None)], cap=1)  # null docs
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_packing_matches_greedy_model(spark, rows, cap):
    # build texts whose whitespace token count equals t
    data = [
        (g, i, None if t is None else " ".join(["w"] * t))
        for i, (g, t) in enumerate(rows)
    ]
    docs = spark.createDataFrame(data, "source string, doc_id long, text string")
    got = {
        (r.source, r.doc_id): (r.n_tok, r.chunk)
        for r in pack_sequences(docs, cap=cap).collect()
    }
    model = _model(rows, cap)
    assert got.keys() == model.keys()
    for (g, i), (n_tok, chunk) in got.items():
        assert n_tok == (rows[i][1] or 0), (g, i)
        assert chunk == model[(g, i)], (g, i, chunk, model[(g, i)])


def test_null_source_group_packs_on_both_sides(spark):
    # a NULL source is a packing group like any other: the Spark
    # groupBy packs it, and the oracle's recursive join must follow
    # every row past rn=1 (IS NOT DISTINCT FROM — a plain equality
    # join never matches NULL = NULL and would emit only the seed row)
    import duckdb

    from dug_data_ingest_spark.queries import ORACLES, _register_all

    _register_all()
    data = [
        (None, 1, "w w w"),
        (None, 2, "w w"),
        ("a", 3, "w"),
    ]
    docs = spark.createDataFrame(
        data, "source string, doc_id long, text string"
    )
    sp = {
        (r.source, r.doc_id): r.chunk
        for r in pack_sequences(docs, cap=4).collect()
    }
    assert len(sp) == 3 and sp[(None, 2)] == 2  # 3+2 > 4 → new chunk
    con = duckdb.connect()
    con.register("documents_df", docs.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_df")
    # the registered oracle uses cap 256; shrink it for this corpus.
    # Guard the surgery: exactly the two known cap literals (the
    # running-total comparison and the chunk-width divisor) may match —
    # if the oracle's cap changes or another '256' ever appears, fail
    # here instead of silently rewriting the wrong thing.
    sql = ORACLES["pipeline-pack-sequences"]
    assert sql.count("256") == 2, sql
    sql = sql.replace("256", "4")
    du = {
        (r[0], r[1]): r[3] for r in con.sql(sql).fetchall()
    }
    assert du == sp
