"""Report driver-correctness coverage of the query registry.

Green state is now DERIVED at import time from the CORRECTNESS_r*.json
files at the repo root (see `_driver_green` in
dug_data_ingest_spark/queries/__init__.py) — nothing to paste anywhere.
This tool just prints the derived view so a round's coverage plan can
be sanity-checked:

    python tools/absorb_correctness.py

Output: green count, fresh (not-yet-green) slugs in the order the
driver will grade them, and any slug whose LATEST driver row is a
failure (regression to fix before the next round).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from dug_data_ingest_spark.queries import _driver_green, all_queries

    ordered = list(all_queries())
    # restrict to the live registry: retired slugs may still have
    # green driver rows on disk
    green = _driver_green() & set(ordered)
    fresh = [s for s in ordered if s not in green]
    print(f"{len(green)} driver-green, {len(fresh)} fresh of {len(ordered)}")
    print("next driver window (first 50):")
    for i, slug in enumerate(ordered[:50]):
        mark = "green" if slug in green else "FRESH"
        print(f"  {i + 1:2d}. [{mark}] {slug}")
    beyond = [s for s in fresh if s not in set(ordered[:50])]
    if beyond:
        print(f"fresh slugs NOT in this round's window ({len(beyond)}): {beyond}")


if __name__ == "__main__":
    main()
