"""Property-based tests (hypothesis) for the custom code where
hand-picked fixtures are weakest: XML render/parse round-trip under
adversarial strings, and window-based uniquification vs a literal
seen-set reference walk.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

# XML 1.0 forbids most control chars; stick to what a compliant
# document can carry (the engine's contract is valid-XML payloads).
xml_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), blacklist_characters="￾￿"
    ),
    min_size=0,
    max_size=40,
)
ids = st.text(alphabet="abcdefghij0123456789_", min_size=1, max_size=12)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(ids, ids, xml_text, xml_text),
        min_size=1,
        max_size=8,
        unique_by=lambda r: r[1],
    )
)
def test_xml_roundtrip_arbitrary_strings(spark, rows):
    """parse(render(vars)) == vars for arbitrary XML-legal content —
    escaping of quotes/angles/ampersands/unicode must survive."""
    from dug_data_ingest_spark.sources.xml_dbgap import (
        VARIABLE_SCHEMA,
        parse_data_tables,
        render_data_tables,
    )

    data = [
        ("s1", "dd1", vid, name, desc, typ, None)
        for (name, vid, desc, typ) in rows
    ]
    df = spark.createDataFrame(data, VARIABLE_SCHEMA)
    back = parse_data_tables(render_data_tables(df))
    got = {
        (r.var_id, r.name, r.description, r.type)
        for r in back.collect()
    }
    # empty strings come back as empty-element text → None; the
    # reference's safe_text treats them identically (xml_generator.py:57-61)
    want = {
        (vid, name or None, desc or None, typ or None)
        for (name, vid, desc, typ) in rows
    }
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    names=st.lists(
        st.sampled_from(["a", "b", "c", "dd", "e"]), min_size=1, max_size=30
    )
)
def test_uniquify_matches_seen_set_walk(spark, names):
    """The window-based uniquify must reproduce the reference's
    global seen-set walk (get_heal_platform_mds_data_dicts.py:358-400)
    for any duplicate pattern, under any partitioning."""
    from dug_data_ingest_spark.operators.windows import uniquify_ids

    # reference semantics, literally
    seen: dict[str, int] = {}
    expected = []
    for n in names:
        if n in seen:
            seen[n] += 1
            expected.append(f"{n}_{seen[n]}")
        else:
            seen[n] = 0
            expected.append(n)

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], ["ord", "name"]
    ).repartition(5)
    out = uniquify_ids(df, "name", [F.col("ord")], "uname")
    got = [r.uname for r in out.orderBy("ord").collect()]
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_duplicate_clusters_match_union_find(spark, edges):
    """Min-label propagation fixpoint == reference union-find
    components on arbitrary small graphs (chains, stars, cycles,
    multi-edges) — the oracle checks one dataset; this checks the
    algorithm."""
    from dug_data_ingest_spark.ext.dedup import duplicate_clusters

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "a int, b int")
    got = {
        r["doc_id"]: r["component"]
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# Curation invariants (ext/curation.py)
# ---------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=30),
    cap=st.integers(min_value=1, max_value=300),
)
def test_pack_sequences_invariants(spark, sizes, cap):
    """For any token-size sequence and cap: (a) every chunk's total is
    <= cap unless it is a single over-cap document; (b) chunk ids are
    contiguous from 1 and non-decreasing in scan order; (c) a doc
    never waits for a later chunk while the current one still fits
    (greedy = the reference walk)."""
    from dug_data_ingest_spark.ext.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n) if n else None, "g") for i, n in enumerate(sizes)],
        "doc_id long, text string, source string",
    )
    rows = sorted(
        pack_sequences(docs, cap=cap).collect(), key=lambda r: r.doc_id
    )
    # reference sequential walk
    chunk, acc = 0, None
    for r, n in zip(rows, sizes):
        if acc is None or acc + n > cap:
            chunk, acc = chunk + 1, n
        else:
            acc += n
        assert (r.n_tok, r.chunk) == (n, chunk), (sizes, cap, rows)
    by_chunk: dict[int, list[int]] = {}
    for r in rows:
        by_chunk.setdefault(r.chunk, []).append(r.n_tok)
    for toks in by_chunk.values():
        assert sum(toks) <= cap or len(toks) == 1, (sizes, cap)
    assert sorted(by_chunk) == list(range(1, len(by_chunk) + 1))


def test_hash_sample_buckets_nest(spark):
    """Bucket sampling's defining property: the pct-a sample is a
    subset of the pct-b sample whenever a <= b, so held-out splits
    stay stable as the sampling rate grows."""
    from dug_data_ingest_spark.ext.curation import hash_sample

    docs = spark.createDataFrame(
        [(i, "t", "s") for i in range(300)], ["doc_id", "text", "source"]
    )
    kept = {
        pct: {r.doc_id for r in hash_sample(docs, pct).collect()}
        for pct in (5, 20, 60, 100)
    }
    assert kept[5] <= kept[20] <= kept[60] <= kept[100]
    assert len(kept[100]) == 300


def test_containment_catches_subset_docs_jaccard_misses(spark):
    """The operator's reason to exist, as a constructed case: a short
    doc whose shingles are a strict subset of a long doc's must score
    containment 1.0 while its Jaccard stays below the usual 0.8
    near-dup threshold — directional containment catches the
    embedded-document near-dup Jaccard structurally cannot."""
    from dug_data_ingest_spark.ext.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"filler{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], ["doc_id", "text"]
    )
    cont = {
        (r.a, r.b): r.containment
        for r in ngram_containment_pairs(docs, threshold=0.9).collect()
    }
    assert cont.get((1, 2)) == 1.0  # short fully contained in long
    assert (2, 1) not in cont  # direction matters: long is NOT in short
    jac = ngram_jaccard_pairs(docs, threshold=0.8).collect()
    assert jac == []  # union dominated by the long side


def test_sessionize_is_repartition_invariant(spark):
    """Session boundaries are a pure function of each user's ordered
    event times; any input partitioning must produce the identical
    session table (the window's shuffle canonicalizes placement)."""
    from tests.conftest import TEST_SF_DIR
    from dug_data_ingest_spark.queries import load
    from dug_data_ingest_spark.queries.analytics import sessionize_events

    ev = load(spark, TEST_SF_DIR, "events")
    rows = {tuple(r) for r in sessionize_events(ev).collect()}
    got = {tuple(r) for r in sessionize_events(ev.repartition(7)).collect()}
    assert got == rows and len(rows) > 0


def test_mode_per_group_tie_breaks_deterministically(spark):
    """On an exact count tie the struct-max argmax must pick the
    lexicographically larger event_type — same total order as the
    oracle's ORDER BY n DESC, event_type DESC."""
    rows = [
        (1, "click"), (1, "view"),            # tie 1-1 -> view
        (2, "view"), (2, "click"), (2, "click"),  # click wins 2-1
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    counts = df.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    best = counts.groupBy("user_id").agg(
        F.max(F.struct(F.col("n"), F.col("event_type"))).alias("best")
    )
    got = {
        r.user_id: (r["best"]["event_type"], r["best"]["n"])
        for r in best.collect()
    }
    assert got == {1: ("view", 1), 2: ("click", 2)}


def test_audit_fingerprint_detects_single_cell_mutation(spark):
    """The audit's reason to exist: fingerprint(orders) must differ
    from fingerprint(orders with ONE cell changed), and must be
    invariant to row order / partitioning (the histogram is a pure
    function of the row multiset)."""
    from tests.conftest import TEST_SF_DIR
    from dug_data_ingest_spark.queries import load
    from dug_data_ingest_spark.queries.pipelines import fingerprint_orders

    orders = load(spark, TEST_SF_DIR, "orders")
    base = {tuple(r) for r in fingerprint_orders(orders).collect()}
    shuffled = {tuple(r) for r in fingerprint_orders(orders.repartition(7)).collect()}
    assert shuffled == base and len(base) > 0

    mutated = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 1, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    assert {tuple(r) for r in fingerprint_orders(mutated).collect()} != base


def test_snapshot_diff_classification_invariants(spark):
    """added ⇔ no pre-cutoff orders; unchanged ⇒ spend identical and
    counts identical; every customer appears exactly once."""
    from tests.conftest import TEST_SF_DIR
    from dug_data_ingest_spark.queries import all_queries

    rows = all_queries()["pipeline-snapshot-diff"](spark, TEST_SF_DIR).collect()
    keys = [r.o_custkey for r in rows]
    assert len(keys) == len(set(keys)) > 0
    for r in rows:
        assert 0 <= r.old_orders <= r.new_orders
        assert (r.change_type == "added") == (r.old_orders == 0)
        if r.change_type == "unchanged":
            assert r.old_orders == r.new_orders
            assert r.old_spend == r.new_spend
        if r.change_type == "changed":
            assert r.new_orders > r.old_orders > 0


def test_gapfill_spine_is_dense_and_conserves_counts(spark):
    """Every event_type covers the identical contiguous daily span
    (global min..max), filled days carry n_events=0 + gap_filled, and
    the dense matrix conserves the raw event count."""
    import datetime

    from tests.conftest import TEST_SF_DIR
    from dug_data_ingest_spark.queries import all_queries, load

    rows = all_queries()["ts-gapfill-locf"](spark, TEST_SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    days_global = sorted({r.day for r in rows})
    lo, hi = (
        datetime.date.fromisoformat(days_global[0]),
        datetime.date.fromisoformat(days_global[-1]),
    )
    expect_n = (hi - lo).days + 1
    for t, rs in by_type.items():
        days = sorted(r.day for r in rs)
        assert len(days) == len(set(days)) == expect_n, t
        for r in rs:
            assert r.gap_filled == (r.n_events == 0)
    total = sum(r.n_events for r in rows)
    ev = load(spark, TEST_SF_DIR, "events")
    # NULL event_type rows are excluded by the operator's contract
    assert total == ev.filter(F.col("event_type").isNotNull()).count()


def test_unpivot_round_trips_through_pivot(spark):
    """Melting the wide status matrix and re-pivoting it reproduces
    the matrix exactly — unpivot is pivot's inverse on a dense frame."""
    from tests.conftest import TEST_SF_DIR
    from dug_data_ingest_spark.queries import all_queries

    tall = all_queries()["agg-unpivot-melt"](spark, TEST_SF_DIR)
    statuses = ["n_open", "n_filled", "n_partial"]
    rebuilt = (
        tall.groupBy("o_orderpriority")
        .pivot("status", statuses)
        .agg(F.first("n"))
    )
    wide = {}
    for r in rebuilt.collect():
        wide[r.o_orderpriority] = tuple(r[s] for s in statuses)
    melted = {}
    for r in tall.collect():
        melted.setdefault(r.o_orderpriority, {})[r.status] = r.n
    assert wide == {
        k: tuple(v[s] for s in statuses) for k, v in melted.items()
    } and len(wide) == 5


def test_moving_range_frame_matches_reference_walk(spark):
    """The RANGE-frame window agrees with a literal per-customer
    pandas walk of the 6-day trailing sum (independent of both Spark's
    window machinery and the DuckDB oracle)."""
    import datetime

    from tests.conftest import TEST_SF_DIR
    from dug_data_ingest_spark.queries import all_queries, load

    got = {
        r.o_orderkey: (r.trailing_7d_spend, r.trailing_7d_orders)
        for r in all_queries()["win-moving-avg-range"](spark, TEST_SF_DIR).collect()
    }
    orders = load(spark, TEST_SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", F.round("o_totalprice", 2).alias("p")
    ).toPandas()
    by_cust: dict[int, list] = {}
    for t in orders.itertuples(index=False):
        by_cust.setdefault(t.o_custkey, []).append(t)
    for rows in by_cust.values():
        for t in rows:
            window = [
                u
                for u in rows
                if datetime.timedelta(0)
                <= t.o_orderdate - u.o_orderdate
                <= datetime.timedelta(days=6)
            ]
            spend = round(sum(round(u.p, 2) for u in window), 2)
            assert got[t.o_orderkey] == (spend, len(window)), t.o_orderkey


def test_audit_fingerprint_serializes_nulls_totally(spark, duck):
    """Null fields must hash through the sentinel, not vanish: Spark's
    concat_ws silently SKIPS null args (shifting separators) while
    SQL's || nulls the row — both serializations coalesce per-field,
    so a row with nulls gets the same md5 in both engines and
    (1, NULL) never collides with (NULL, 1)."""
    from dug_data_ingest_spark.queries.pipelines import fingerprint_orders

    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_orderpriority string, o_totalprice double, o_orderdate timestamp"
    )
    row = spark.createDataFrame([(None, 5, None, "1-URGENT", None, None)], schema)
    got = fingerprint_orders(row).collect()[0]
    want = duck.sql(
        """
        SELECT md5(COALESCE(CAST(NULL AS VARCHAR), '<NULL>') || '|' ||
                   '5' || '|' || '<NULL>' || '|' || '1-URGENT' || '|' ||
                   '<NULL>' || '|' || '<NULL>') AS h
        """
    ).fetchone()[0]
    assert got.min_hash == got.max_hash == want and got.n_rows == 1

    swapped = spark.createDataFrame([(5, None, None, "1-URGENT", None, None)], schema)
    assert fingerprint_orders(swapped).collect()[0].min_hash != got.min_hash


def test_audit_fingerprint_catches_swap_corruption(spark):
    """count/min/max alone are blind to dropping row Y and duplicating
    row X inside one bucket (same count, same extrema); the 60-bit
    chunk sum must catch exactly that corruption."""
    from collections import defaultdict

    from tests.conftest import TEST_SF_DIR
    from dug_data_ingest_spark.queries import load
    from dug_data_ingest_spark.queries.pipelines import fingerprint_orders

    orders = load(spark, TEST_SF_DIR, "orders")
    # find a bucket with >= 4 rows and pick two NON-extremal hashes in
    # it: duplicate one order and drop the other
    hashed = fingerprint_orders(orders)  # forces same serialization
    from pyspark.sql import functions as SF

    with_h = orders.withColumn(
        "h",
        SF.md5(
            SF.concat_ws(
                "|",
                SF.coalesce(SF.col("o_orderkey").cast("string"), SF.lit("<NULL>")),
                SF.coalesce(SF.col("o_custkey").cast("string"), SF.lit("<NULL>")),
                SF.coalesce("o_orderstatus", SF.lit("<NULL>")),
                SF.coalesce("o_orderpriority", SF.lit("<NULL>")),
                SF.coalesce(
                    SF.round("o_totalprice", 2).cast("decimal(18,2)").cast("string"),
                    SF.lit("<NULL>"),
                ),
                SF.coalesce(SF.date_format("o_orderdate", "yyyy-MM-dd"), SF.lit("<NULL>")),
            )
        ),
    )
    buckets = defaultdict(list)
    for r in with_h.select("o_orderkey", "h").collect():
        buckets[r.h[:2]].append((r.h, r.o_orderkey))
    victim = next(
        sorted(v)[1:3] for v in buckets.values() if len(v) >= 4
    )  # two middle hashes: neither min nor max of the bucket
    (h_dup, key_dup), (h_drop, key_drop) = victim
    corrupted = orders.filter(SF.col("o_orderkey") != key_drop).unionAll(
        orders.filter(SF.col("o_orderkey") == key_dup)
    )
    base = {r.bucket: r for r in fingerprint_orders(orders).collect()}
    bad = {r.bucket: r for r in fingerprint_orders(corrupted).collect()}
    b = h_dup[:2]
    # the blind-spot trio is unchanged ...
    assert (base[b].n_rows, base[b].min_hash, base[b].max_hash) == (
        bad[b].n_rows,
        bad[b].min_hash,
        bad[b].max_hash,
    )
    # ... but the chunk sum moves, so the fingerprint differs
    assert base[b].sum_hash60 != bad[b].sum_hash60


def test_ohlc_order_key_truncates_subseconds(spark, duck):
    """Both engines must TRUNCATE the epoch in the OHLC order key: a
    bare CAST in DuckDB ROUNDS, so events 0.6s apart with inverted
    event_ids would pick different open/close rows. Pinned with
    adversarial (non-monotone-in-ts) ids the generated testdata
    happens never to produce."""
    import datetime as dt

    rows = [
        # same 15-min bucket; B is later in time but has a LOWER id,
        # and A's fraction (.6) rounds UP across the second boundary
        (7, dt.datetime(2024, 1, 1, 0, 0, 0, 600000), "click", 10.0),
        (3, dt.datetime(2024, 1, 1, 0, 0, 1, 200000), "click", 20.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    epoch = F.unix_timestamp("ts")
    ordkey = epoch * 10_000_000 + F.col("event_id")
    got = df.groupBy("event_type").agg(
        F.min_by("value", ordkey).alias("open"),
        F.max_by("value", ordkey).alias("close"),
    ).collect()[0]
    # truncation: A is second 0, B is second 1 -> A opens, B closes
    assert (got.open, got.close) == (10.0, 20.0)
    want = duck.sql(
        """
        WITH e(event_id, ts, value) AS (VALUES
          (7, TIMESTAMP '2024-01-01 00:00:00.6', 10.0),
          (3, TIMESTAMP '2024-01-01 00:00:01.2', 20.0))
        SELECT arg_min(value, CAST(FLOOR(epoch(ts)) AS BIGINT) * 10000000
                              + event_id) AS open,
               arg_max(value, CAST(FLOOR(epoch(ts)) AS BIGINT) * 10000000
                              + event_id) AS close
        FROM e
        """
    ).fetchone()
    assert want == (10.0, 20.0)
