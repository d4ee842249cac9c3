"""Print the updated driver-green slug list after a driver round.

The driver's correctness gate records ~50 registry entries per round
(see README "Driver correctness coverage note"), so each round we
fold the newly green slugs into the registry's already-green list and
re-sort the remaining fresh slugs first:

    python tools/absorb_correctness.py CORRECTNESS_r02.json

Paste the output over `_R01_DRIVER_GREEN` in
dug_data_ingest_spark/queries/__init__.py (keep the name in sync),
then re-run tests/test_oracle_parity.py.
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(path: str) -> None:
    from dug_data_ingest_spark.queries import _R01_DRIVER_GREEN, all_queries

    rows = json.load(open(path))
    green_now = {
        slug
        for slug, r in rows.items()
        if isinstance(r, dict) and r.get("hash_match") and r.get("rows_match")
    }
    merged = list(_R01_DRIVER_GREEN) + sorted(
        green_now - set(_R01_DRIVER_GREEN)
    )
    fresh = [s for s in all_queries() if s not in set(merged)]
    not_green_anymore = [
        slug
        for slug, r in rows.items()
        if isinstance(r, dict) and not (r.get("hash_match") and r.get("rows_match"))
    ]
    if not_green_anymore:
        print("# WARNING regressions (fix before absorbing):", not_green_anymore)
    print(f"# {len(merged)} driver-green, {len(fresh)} still fresh: {fresh}")
    body = ", ".join(f'"{s}"' for s in merged)
    print(
        "_DRIVER_GREEN = [\n"
        + textwrap.fill(
            body, 74, initial_indent="    ", subsequent_indent="    ",
            break_long_words=False, break_on_hyphens=False,
        )
        + ",\n]"
    )


if __name__ == "__main__":
    main(sys.argv[1])
