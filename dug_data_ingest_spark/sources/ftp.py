"""Raw-FTP protocol walk with reconnect/retry — the one reference code
path (scripts/bdc/get_dbgap_data_dicts.py:46-137) that previously had
only an HTTP-mirror substitute (sources/http_client.py:13-16).

Reference behavior mirrored:

- connect / anonymous login / ``PASV`` (ref :56-58)
- ``cwd`` into ``<study>/pheno_variable_summaries``; ``error_perm``
  probes the parent listing to distinguish "study exists but has no
  data dictionaries yet" from "accession id not found at all"
  (ref :69-81 — the reference logs a warning for the former and an
  error for the latter)
- ``error_temp`` (server-side session timeout) on ``cwd`` →
  disconnect, reconnect, retry — bounded, not unbounded (ref
  :104-120: "Sometimes we've timed out on the FTP server by this
  point. So let's disconnect and reconnect.")
- ``nlst`` listing + substring filename filter (``data_dict`` /
  ``GapExchange``, ref :85-87, :121-124)
- ``retrbinary`` download (ref :126-128). The reference found
  retrbinary flaky for the data-dict files and hard-switched those to
  the HTTPS mirror of the same tree (ref :92-104); here retrbinary is
  the primary and a PER-FILE failure falls back to the mirror URL when
  one is configured — the superset of both reference paths, and the
  same primary→mirror contract as ``fallback_download_fetcher``.

The FTP class is injectable (``ftp_factory``) so tests — and the
fixture-replayed ``src-ftp-walk`` query — replay the whole walk,
including error_temp reconnects and retrbinary failures, against an
in-process double (sources/ftp_fixture.py); no live network.

At cluster scale the walk runs INSIDE executors via the standard
``fetch_batch`` shape (``ftp_tree_fetcher``): one FTP connection per
Arrow batch, file payloads are rows from the moment they download, and
the study→executor fan-out is Spark's partitioning of the key column —
the driver never holds file bytes.
"""

from __future__ import annotations

import ftplib
from collections.abc import Callable
from ftplib import error_perm, error_temp

import pandas as pd

DEFAULT_FTP_TIMEOUT = 60  # reference: FTP_TIMEOUT (get_dbgap_data_dicts.py)
DEFAULT_RECONNECTS = 1


def _connect(host: str, timeout: float, ftp_factory):
    """connect + anonymous login + PASV (ref :56-58)."""
    ftp = ftp_factory(host, timeout=timeout)
    ftp.login()
    ftp.sendcmd("PASV")
    return ftp


def _quit_quietly(ftp) -> None:
    try:
        ftp.quit()
    except Exception:  # noqa: BLE001 — a dead control channel is fine here
        pass


def _cwd_with_reconnect(
    ftp, host, timeout, ftp_factory, dir_path, max_reconnects
):
    """cwd that survives server-side session timeouts: on error_temp,
    reconnect and retry up to ``max_reconnects`` times (ref :104-120).
    error_perm propagates — that's a missing directory, not a timeout.
    Returns the (possibly new) connection."""
    reconnects = 0
    while True:
        try:
            ftp.cwd(dir_path)
            return ftp
        except error_temp:
            if reconnects >= max_reconnects:
                raise
            reconnects += 1
            _quit_quietly(ftp)
            ftp = _connect(host, timeout, ftp_factory)


def probe_study(
    host: str,
    study_path: str,
    *,
    subdir: str = "pheno_variable_summaries",
    ftp_factory=ftplib.FTP,
    timeout: float = DEFAULT_FTP_TIMEOUT,
) -> str:
    """Classify a study directory the way the reference does on
    error_perm (ref :69-81): ``"ok"`` (the dictionaries subdir exists),
    ``"empty"`` (the study exists but has no dictionaries yet — the
    reference logs a warning and returns 0), or ``"missing"`` (the
    accession id is not on the server at all — reference logs an
    error)."""
    ftp = _connect(host, timeout, ftp_factory)
    try:
        try:
            ftp.cwd(f"{study_path}/{subdir}")
            return "ok"
        except error_perm:
            try:
                ftp.nlst(study_path)
                return "empty"
            except error_perm:
                return "missing"
    finally:
        _quit_quietly(ftp)


def fetch_ftp_dir(
    host: str,
    dir_path: str,
    name_filter: str,
    *,
    ftp_factory=ftplib.FTP,
    timeout: float = DEFAULT_FTP_TIMEOUT,
    max_reconnects: int = DEFAULT_RECONNECTS,
    mirror_template: str | None = None,
    http_get_fn=None,
) -> list[dict]:
    """Walk ONE FTP directory and download every file whose name
    contains ``name_filter``. Returns ``[{filename, source, content}]``
    with source ``"ftp"`` or ``"mirror"``.

    cwd survives error_temp via reconnect; a per-file retrbinary
    failure falls back to ``mirror_template.format(dir_path=...,
    filename=...)`` when given (the reference's HTTPS-mirror path,
    ref :92-104), else propagates.
    """
    ftp = _connect(host, timeout, ftp_factory)
    try:
        ftp = _cwd_with_reconnect(
            ftp, host, timeout, ftp_factory, dir_path, max_reconnects
        )
        # servers differ on NLST output: bare names, "./name", or full
        # paths — normalize to basenames so the filter and RETR always
        # see the same form
        names = sorted(
            {
                n.rsplit("/", 1)[-1]
                for n in ftp.nlst(".")
                if name_filter in n.rsplit("/", 1)[-1]
            }
        )
        out: list[dict] = []
        for name in names:
            chunks: list[bytes] = []
            try:
                ftp.retrbinary(f"RETR {name}", chunks.append)
                out.append(
                    {
                        "filename": name,
                        "source": "ftp",
                        "content": b"".join(chunks),
                    }
                )
            except (OSError, ftplib.Error):
                if mirror_template is None:
                    raise
                if http_get_fn is None:
                    from dug_data_ingest_spark.sources.http_client import http_get

                    http_get_fn = http_get
                resp = http_get_fn(
                    mirror_template.format(
                        dir_path=dir_path.strip("/"), filename=name
                    )
                )
                out.append(
                    {
                        "filename": name,
                        "source": "mirror",
                        "content": resp.content,
                    }
                )
        return out
    finally:
        _quit_quietly(ftp)


def ftp_tree_fetcher(
    host: str,
    dir_template: str,
    key_col: str,
    name_filter: str,
    *,
    ftp_factory=ftplib.FTP,
    timeout: float = DEFAULT_FTP_TIMEOUT,
    max_reconnects: int = DEFAULT_RECONNECTS,
    mirror_template: str | None = None,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """``fetch_batch`` callable (the rest.py stage shape) walking
    ``dir_template.format(key=key)`` per key: one FTP connection per
    Arrow batch, one output row per downloaded file —
    ``(key, filename, source, n_bytes, content)``."""

    def fetch(batch: pd.DataFrame) -> pd.DataFrame:
        records = []
        for key in batch[key_col]:
            for f in fetch_ftp_dir(
                host,
                dir_template.format(key=key),
                name_filter,
                ftp_factory=ftp_factory,
                timeout=timeout,
                max_reconnects=max_reconnects,
                mirror_template=mirror_template,
            ):
                records.append(
                    {
                        key_col: key,
                        "filename": f["filename"],
                        "source": f["source"],
                        "n_bytes": len(f["content"]),
                        "content": f["content"],
                    }
                )
        return pd.DataFrame(
            records,
            columns=[key_col, "filename", "source", "n_bytes", "content"],
        )

    return fetch
