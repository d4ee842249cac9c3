"""Model pin for ext/dedup.py::ngram_novelty — per-doc fraction of
distinct k-gram shingles appearing in no other document.
"""

from __future__ import annotations

import re


def _shingles(text, k):
    ws = [w for w in re.sub(r"[^a-z0-9 ]", "", (text or "").lower()).strip().split(" ") if w]
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


DOCS = [
    (1, "alpha beta gamma delta"),          # shares its only 3-gramset partially
    (2, "alpha beta gamma epsilon zeta"),   # overlaps doc 1 on 'alpha beta gamma'
    (3, "one two three four five six"),     # fully novel
    (4, "too short"),                       # < k words: no row
    (5, None),                              # NULL: no row
]


def test_ngram_novelty_matches_model(spark):
    from dug_data_ingest_spark.ext.dedup import ngram_novelty

    k = 3
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(df, k=k).collect()
    }
    sets = {i: _shingles(t, k) for i, t in DOCS}
    model = {}
    for i, sh in sets.items():
        if not sh:
            continue
        novel = sum(
            1 for s in sh if all(s not in o for j, o in sets.items() if j != i)
        )
        model[i] = (len(sh), novel, round(novel / len(sh), 4))
    assert got == model
    assert 4 not in got and 5 not in got  # sub-k and NULL docs: no row
    assert got[3][2] == 1.0               # fully novel doc
    assert got[1][2] < 1.0                # the shared 3-gram is not novel
