"""Pins for ext/curation.py::temperature_mix_rates / temperature_mix —
the alpha-sampling mixture rule of multilingual pretraining (Raffel et
al. 2020 §3.4.3 / Conneau et al. 2020). The rates are a closed-form
function of the stratum counts, so the pin replays them in pure
Python; the applied mix is pinned for proportions, nesting, and the
NULL-stratum exclusion contract.
"""

from __future__ import annotations

import math

import pytest

from dug_data_ingest_spark.ext.curation import (
    temperature_mix,
    temperature_mix_rates,
)

# heavily skewed corpus: en dominates, yue is scarce
N = {"en": 800, "es": 150, "fr": 40, "yue": 10}
ROWS = [
    (lang_i * 10000 + i, lang, f"{lang} document number {i} with words")
    for lang_i, (lang, n) in enumerate(sorted(N.items()))
    for i in range(n)
] + [(99991, None, "no language")]


def _model_rates(counts: dict[str, int], alpha: float) -> dict[str, float]:
    total = sum(counts.values())
    q = {s: (n / total) ** alpha for s, n in counts.items()}
    z = sum(q.values())
    T = min(n / (q[s] / z) for s, n in counts.items())
    return {s: min((q[s] / z) * T / n, 1.0) for s, n in counts.items()}


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id int, lang string, text string")


def test_rates_match_closed_form(spark):
    for alpha in (0.0, 0.3, 0.7, 1.0):
        got = temperature_mix_rates(_df(spark), alpha=alpha)
        expect = _model_rates(N, alpha)
        assert [s for s, *_ in got] == sorted(N)
        for s, n, rate, pct in got:
            assert n == N[s]
            assert rate == pytest.approx(expect[s], abs=1e-12)
            assert pct == math.floor(rate * 10000)
    # no NULL-stratum row
    assert all(s is not None for s, *_ in temperature_mix_rates(_df(spark)))


def test_alpha_semantics(spark):
    # alpha=1: natural mixture — every rate is 1 (keep everything);
    # alpha=0: uniform target — the SCARCEST stratum saturates at 1
    # and the head is cut to its size
    r1 = {s: rate for s, _, rate, _ in temperature_mix_rates(_df(spark), 1.0)}
    assert all(rate == pytest.approx(1.0) for rate in r1.values())
    r0 = {s: rate for s, _, rate, _ in temperature_mix_rates(_df(spark), 0.0)}
    assert r0["yue"] == pytest.approx(1.0)
    assert r0["en"] == pytest.approx(N["yue"] / N["en"])
    # alpha between: head rate strictly increases with alpha
    r3 = {s: r for s, _, r, _ in temperature_mix_rates(_df(spark), 0.3)}
    r7 = {s: r for s, _, r, _ in temperature_mix_rates(_df(spark), 0.7)}
    assert r0["en"] < r3["en"] < r7["en"] <= 1.0


def test_applied_mix_proportions_and_null_exclusion(spark):
    df = _df(spark)
    out = temperature_mix(df, alpha=0.3)
    got = {r["lang"]: 0 for r in out.collect()}
    for r in out.collect():
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    assert None not in got  # NULL stratum dropped by contract
    # the md5-bucket keep set is DETERMINISTIC: replay it exactly
    import hashlib

    rates = {s: pct for s, _, _, pct in temperature_mix_rates(df, 0.3)}

    def _bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 10000

    expect: dict[str, int] = {}
    for doc_id, lang, _ in ROWS:
        if lang is not None and _bucket(doc_id) < rates[lang]:
            expect[lang] = expect.get(lang, 0) + 1
    assert got == expect


def test_mix_nests_across_alpha(spark):
    # raising alpha only ever ADDS head-stratum documents: the md5
    # bucket rule makes every higher-rate mix a superset per stratum
    df = _df(spark)
    a = {r["doc_id"] for r in temperature_mix(df, alpha=0.3).collect()}
    b = {r["doc_id"] for r in temperature_mix(df, alpha=0.7).collect()}
    assert a <= b


def test_validation(spark):
    with pytest.raises(ValueError):
        temperature_mix_rates(_df(spark), alpha=1.5)
    assert temperature_mix_rates(
        _df(spark).where("lang is null")
    ) == []


def test_head_stratum_never_rounds_to_zero(spark):
    # the r10 advisor finding: a stratum whose keep rate falls below
    # 1/rate_buckets must clamp to pct=1, not silently vanish — only
    # NULL strata are excluded from the mix
    df = _df(spark)
    rates = temperature_mix_rates(df, alpha=0.0, rate_buckets=10)
    # alpha=0 targets uniform: en (800 docs) keeps 10/800 = 0.0125,
    # which floors to pct=0 at 10 buckets without the clamp
    pcts = {s: pct for s, _, _, pct in rates}
    assert all(p >= 1 for p in pcts.values()), pcts
    kept = temperature_mix(df, alpha=0.0, rate_buckets=10)
    langs_kept = {r["lang"] for r in kept.select("lang").distinct().collect()}
    assert langs_kept == set(N)  # every non-NULL stratum represented


def test_non_string_strata_column(spark):
    # weights schema derives from the input schema: an int strata
    # column must join without an implicit cast (or a DDL failure)
    df = spark.createDataFrame(
        [(i, i % 3, "txt") for i in range(300)],
        "doc_id int, src int, text string",
    )
    out = temperature_mix(df, alpha=0.5, strata_col="src")
    assert out.count() > 0
    assert dict(out.dtypes)["src"] == "int"
