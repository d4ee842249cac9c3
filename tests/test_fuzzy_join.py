"""Completeness tests for fuzzy_join_qgram (operators/joins.py): the
blocking must find EVERY pair within the edit-distance bound — that is
the property that lets the registered oracle be the naive theta-join.
"""

from __future__ import annotations

import random

import pytest


def _lev(a: str, b: str) -> int:
    # classic DP, test-side ground truth
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _mutate(rng: random.Random, s: str, n_edits: int) -> str:
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(n_edits):
        op = rng.choice(["sub", "ins", "del"] if len(s) > 1 else ["sub", "ins"])
        i = rng.randrange(len(s))
        if op == "sub":
            s = s[:i] + rng.choice(alpha) + s[i + 1 :]
        elif op == "ins":
            s = s[:i] + rng.choice(alpha) + s[i:]
        else:
            s = s[:i] + s[i + 1 :]
    return s


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(6)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    cands = []
    for i in range(200):
        n = rng.randint(1, 4)
        cands.append((i, " ".join(rng.choice(words) for _ in range(n))))
    # short strings exercise the exact-length fallback branch
    cands += [(200 + i, w[:4]) for i, w in enumerate(words)]
    probes = []
    for j in range(25):
        src_id, src = cands[rng.randrange(len(cands))]
        probes.append((1000 + j, _mutate(rng, src, rng.randint(0, 2))))
    return cands, probes


def test_qgram_join_matches_naive_levenshtein(spark, corpus):
    from dug_data_ingest_spark.operators.joins import fuzzy_join_qgram

    cands, probes = corpus
    expected = {
        (pid, cid, _lev(ps, cs))
        for pid, ps in probes
        for cid, cs in cands
        if _lev(ps, cs) <= 2
    }
    assert expected, "fixture must produce at least one true match"
    got = fuzzy_join_qgram(
        spark.createDataFrame(cands, ["cid", "ctext"]),
        spark.createDataFrame(probes, ["pid", "ptext"]),
        cand_id="cid", cand_str="ctext",
        probe_id="pid", probe_str="ptext",
        max_dist=2,
    ).collect()
    assert {(r.probe_id, r.match_id, r.lev) for r in got} == expected
    assert len(got) == len(expected)  # no duplicate pairs either


def test_qgram_join_short_probe_branch(spark):
    # probes below the pigeonhole length bound (9 for q=3, k=2) must
    # still find all matches via exact-length blocking
    from dug_data_ingest_spark.operators.joins import fuzzy_join_qgram

    cands = [(1, "cat"), (2, "cart"), (3, "carted"), (4, "dog"), (5, "ct")]
    probes = [(10, "cat"), (11, "crt")]
    got = fuzzy_join_qgram(
        spark.createDataFrame(cands, ["cid", "ctext"]),
        spark.createDataFrame(probes, ["pid", "ptext"]),
        cand_id="cid", cand_str="ctext",
        probe_id="pid", probe_str="ptext",
        max_dist=2,
    ).collect()
    expected = {
        (pid, cid, _lev(ps, cs))
        for pid, ps in probes
        for cid, cs in cands
        if _lev(ps, cs) <= 2
    }
    assert {(r.probe_id, r.match_id, r.lev) for r in got} == expected
