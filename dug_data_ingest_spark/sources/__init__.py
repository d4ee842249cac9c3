"""Sources & sinks (SURVEY.md §2.1).

Readers: csv, json docs, dbGaP XML (mapInPandas parse), REST/FTP
fixture-replayable fetch stages, recursive object-store listings.
Writers: csv, TSV, json (KGX), dbGaP XML (applyInPandas render),
partitioned parquet with a commit hook.

All fetch stages are replayable from local fixtures (SURVEY §5: tests
never touch the network) and idempotent via manifest anti-joins.
"""

from __future__ import annotations

import os
import shutil

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scratch_dir(name: str, fresh: bool = True) -> str:
    """A per-purpose scratch directory under the repo root (gitignored)
    for source/sink round-trips."""
    path = os.path.join(_REPO_ROOT, ".scratch", name)
    if fresh and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path
