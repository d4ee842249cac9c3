"""Model-based property test for span-level verbatim dedup
(ext/dedup.py::duplicated_span_stats): the registered oracle mirrors
the same window/island arithmetic in SQL, so an off-by-one in run
merging or coverage would agree on both sides — pin the semantics to
an independent naive Python walk instead.

Docs are built from a 2-word vocabulary so k-gram collisions (and
intra-document repeats — which MUST count as duplication) are the
common case, not a fluke.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from dug_data_ingest_spark.ext.dedup import duplicated_span_stats

_doc = st.lists(st.sampled_from(["aa", "bb"]), min_size=0, max_size=12)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _model(docs: list[list[str]], k: int):
    """Naive walk: count every k-gram occurrence corpus-wide, flag
    windows whose gram occurs > 1 time anywhere (same doc included),
    merge consecutive flagged positions into runs, report per doc."""
    from collections import Counter

    grams_by_doc = {}
    counts: Counter = Counter()
    for i, ws in enumerate(docs):
        if len(ws) < k:
            continue
        grams = [" ".join(ws[p : p + k]) for p in range(len(ws) - k + 1)]
        grams_by_doc[i] = grams
        counts.update(grams)

    out = {}
    for i, grams in grams_by_doc.items():
        dup_pos = [p + 1 for p, g in enumerate(grams) if counts[g] > 1]
        if not dup_pos:
            continue
        runs = []
        start = prev = dup_pos[0]
        nw = 1
        for p in dup_pos[1:]:
            if p == prev + 1:
                prev, nw = p, nw + 1
            else:
                runs.append((start, prev, nw))
                start = prev = p
                nw = 1
        runs.append((start, prev, nw))
        # covered_tokens = the true token union, computed here the
        # naive way (a set of covered positions) — independent of the
        # engine/oracle's sorted-interval overlap subtraction
        covered = {t for p in dup_pos for t in range(p, p + k)}
        out[i] = (
            sum(r[2] for r in runs),
            len(runs),
            max(r[1] - r[0] + k for r in runs),
            len(covered),
        )
    return out


@given(docs=_corpus, k=st.sampled_from([2, 3]))
# one doc repeating its own gram (intra-doc duplication), plus a
# cross-doc verbatim pair separated by a gap — two runs in one doc
@example(docs=[["aa", "aa", "aa"], ["aa", "aa", "bb", "aa", "aa"]], k=2)
@example(docs=[[]], k=2)  # empty doc: no windows, no row
# two runs ({1} and {3}) whose k-1 token tails overlap (window gap
# < k): naive run-coverage sum would report 6 covered tokens in a
# 5-token doc — the union is 5
@example(docs=[["aa", "bb", "aa", "bb", "aa"]], k=3)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_stats_match_naive_walk(spark, docs, k):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_dup_windows, r.n_runs, r.max_run_tokens, r.covered_tokens)
        for r in duplicated_span_stats(df, k=k).collect()
    }
    assert got == _model(docs, k)


def test_normalization_matches_the_tokenizer(spark):
    # punctuation/case/space-run differences must not defeat verbatim
    # matching — both docs normalize to the same token stream
    df = spark.createDataFrame(
        [(0, "Key AGG row,, scan!"), (1, "key agg   row scan")],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in duplicated_span_stats(df, k=4).collect()}
    assert got == {0, 1}
    norm = re.sub(r"[^a-z0-9 ]", "", "Key AGG row,, scan!".lower()).split()
    assert norm == ["key", "agg", "row", "scan"]


# --- strip_duplicated_spans -------------------------------------------------


def _strip_model(docs: list[list[str]], k: int):
    """Naive walk: canonical site of each duplicated gram = corpus-wide
    first (doc, pos); at every other site remove tokens [pos, pos+k-1]
    EXCEPT tokens lying under some canonical window of the same doc —
    the protection that keeps the one promised copy intact when an
    overlapping occurrence (intra-doc repeat at distance < k, or a
    removal run abutting a canonical site) would otherwise chew into
    it. Kept tokens rejoin in order."""
    from collections import Counter

    counts: Counter = Counter()
    grams_by_doc = {}
    for i, ws in enumerate(docs):
        grams = [
            " ".join(ws[p : p + k]) for p in range(max(0, len(ws) - k + 1))
        ]
        grams_by_doc[i] = grams
        counts.update(grams)
    canon = {}
    for i in sorted(grams_by_doc):
        for p, g in enumerate(grams_by_doc[i]):
            if counts[g] > 1 and g not in canon:
                canon[g] = (i, p + 1)
    out = {}
    for i, ws in enumerate(docs):
        remove: set[int] = set()
        protect: set[int] = set()
        for p, g in enumerate(grams_by_doc[i]):
            if counts[g] > 1:
                if canon[g] == (i, p + 1):
                    protect.update(range(p + 1, p + k + 1))
                else:
                    remove.update(range(p + 1, p + k + 1))
        remove -= protect
        out[i] = " ".join(w for j, w in enumerate(ws, 1) if j not in remove)
    return out


@given(docs=_corpus, k=st.sampled_from([2, 3]))
# two identical docs: the first survives whole, the second is gutted;
# third doc repeats its own gram so its later site strips intra-doc
@example(docs=[["aa", "bb", "aa"], ["aa", "bb", "aa"], ["aa", "aa", "aa"]], k=2)
# self-overlapping repeat: windows 1 and 2 share one gram; without
# canonical protection the removal at pos 2 would chew tokens 2..3
# out of the canonical site and the span would survive ZERO times
@example(docs=[["aa", "aa", "aa"]], k=2)
# removal run abuts the canonical site from the right (canonical @1,
# non-canonical @3, gap @2): protection keeps tokens 1..3, strips 4..5
@example(docs=[["aa", "bb", "aa", "bb", "aa"]], k=3)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_strip_matches_naive_walk(spark, docs, k):
    from dug_data_ingest_spark.ext.dedup import strip_duplicated_spans

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.clean_text
        for r in strip_duplicated_spans(df, k=k).collect()
    }
    want = _strip_model(docs, k)
    assert got == want
    # structural invariants independent of the model: every output is
    # an in-order subsequence of its input, and every doc emits a row
    assert set(got) == set(range(len(docs)))
    for i, ws in enumerate(docs):
        kept = got[i].split(" ") if got[i] else []
        it = iter(ws)
        assert all(any(w == t for t in it) for w in kept), (i, ws, kept)


# --- hot_spans ---------------------------------------------------------------


def test_hot_spans_matches_duckdb(spark):
    import duckdb

    from dug_data_ingest_spark.ext.dedup import hot_spans
    from tests.conftest import TEST_SF_DIR

    sp = hot_spans(
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet"), k=8, top=10
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{TEST_SF_DIR}/documents.parquet'"
    )
    du = con.sql("""
        WITH toks AS (
          SELECT doc_id,
                 regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +') AS w
          FROM documents
        ),
        grams AS (
          SELECT doc_id, array_to_string(list_slice(w, i, i + 7), ' ') AS span
          FROM toks, UNNEST(generate_series(1, len(w) - 7)) AS t(i)
          WHERE len(w) >= 8
        )
        SELECT span,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM grams GROUP BY span HAVING COUNT(*) > 1
        ORDER BY n_occurrences DESC, span ASC LIMIT 10
    """).df()
    norm = lambda d: list(  # noqa: E731 — deterministic order IS the contract
        map(repr, d[sorted(d.columns)].itertuples(index=False, name=None))
    )
    assert len(sp) == 10
    assert norm(sp) == norm(du)


def test_hot_spans_is_takeordered(spark):
    # the report must never sort the full distinct-gram table — top-N
    # folds into TakeOrderedAndProject
    from dug_data_ingest_spark.ext.dedup import hot_spans
    from tests.conftest import TEST_SF_DIR

    df = hot_spans(spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
