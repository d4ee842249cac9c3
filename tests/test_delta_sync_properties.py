"""Model-based property test for ``diff_manifests``
(sources/delta_sync.py): a 20-line pure-Python reference model of the
rclone-style diff — including the ranked rename pairing — checked for
EXACT output equality against the Spark implementation on
hypothesis-generated manifest pairs.

The fixed tests in test_delta_sync.py exercise the sink end-to-end on
real data; this file explores the diff's combinatorics — several
deleted and added keys sharing one content fingerprint (rank pairing),
fingerprints colliding on hash but not count, keys present on both
sides with and without changes, empty sides — that a single real
scenario can't cover.
"""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from dug_data_ingest_spark.sources.delta_sync import (
    MANIFEST_SCHEMA,
    ManifestRow,
    diff_manifest_rows,
    diff_manifests,
)

# A small fingerprint pool forces collisions: several keys sharing one
# content (rename candidates), and near-misses that agree on one
# component only (must NOT pair).
_FPS = [
    (1, 11, 101),
    (1, 11, 102),  # same n_rows+hash as above, different sum
    (2, 22, 202),
    (3, 33, 303),
]

_KEYS = [f"k{i}" for i in range(6)]

_manifest = st.dictionaries(
    st.sampled_from(_KEYS), st.sampled_from(_FPS), max_size=len(_KEYS)
)


def _model_diff(prev: dict, curr: dict) -> set[tuple]:
    """Reference model: rows of (sync_key, action, rename_to, n_rows)."""
    adds = sorted(k for k in curr if k not in prev)
    dels = sorted(k for k in prev if k not in curr)
    # rank pairing per fingerprint: i-th deleted key (key order) pairs
    # with i-th added key (key order) of the SAME full fingerprint
    pair: dict[str, str] = {}
    for fp in set(_FPS):
        d = [k for k in dels if prev[k] == fp]
        a = [k for k in adds if curr[k] == fp]
        pair.update(zip(d, a))
    consumed = set(pair.values())
    out = set()
    for k in sorted(set(prev) | set(curr)):
        if k in consumed:
            continue  # rename target vanishes from the plan
        if k in pair:
            out.add((k, "rename", pair[k], prev[k][0]))
        elif k not in prev:
            out.add((k, "upload", None, curr[k][0]))
        elif k not in curr:
            out.add((k, "delete", None, prev[k][0]))
        elif prev[k] == curr[k]:
            out.add((k, "keep", None, curr[k][0]))
        else:
            out.add((k, "upload", None, curr[k][0]))
    return out


def _to_df(spark, manifest: dict):
    rows = [(k, fp[0], fp[1], fp[2]) for k, fp in manifest.items()]
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


@given(prev=_manifest, curr=_manifest)
@example(prev={}, curr={"k0": _FPS[0]})
@example(prev={"k0": _FPS[0]}, curr={})
# one fingerprint, two deletes, two adds: rank pairing must align
# k0->k2, k1->k3 (sorted key order on both sides), never cross
@example(
    prev={"k0": _FPS[0], "k1": _FPS[0]},
    curr={"k2": _FPS[0], "k3": _FPS[0]},
)
# hash collides, sum differs: must NOT pair as a rename
@example(prev={"k0": _FPS[0]}, curr={"k1": _FPS[1]})
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_diff_matches_reference_model(spark, prev, curr):
    got = {
        (r.sync_key, r.action, r.rename_to, r.n_rows)
        for r in diff_manifests(
            _to_df(spark, prev), _to_df(spark, curr)
        ).collect()
    }
    assert got == _model_diff(prev, curr)


def _to_rows(manifest: dict) -> list[ManifestRow]:
    return [ManifestRow(k, *fp) for k, fp in manifest.items()]


@given(prev=_manifest, curr=_manifest)
@example(prev={}, curr={"k0": _FPS[0]})
@example(prev={"k0": _FPS[0]}, curr={})
@example(
    prev={"k0": _FPS[0], "k1": _FPS[0]},
    curr={"k2": _FPS[0], "k3": _FPS[0]},
)
@example(prev={"k0": _FPS[0]}, curr={"k1": _FPS[1]})
@settings(max_examples=300, deadline=None)
def test_driver_side_diff_matches_reference_model(prev, curr):
    # the driver-side twin delta_sync_write actually runs — same model,
    # no Spark session, so the search budget can be 10x larger
    got = {
        (r.sync_key, r.action, r.rename_to, r.n_rows)
        for r in diff_manifest_rows(_to_rows(prev), _to_rows(curr))
    }
    assert got == _model_diff(prev, curr)
