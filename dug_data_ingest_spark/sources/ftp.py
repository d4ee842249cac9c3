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
  point. So let's disconnect and reconnect.") ``EOFError`` — what
  ftplib raises when the server silently drops the control
  connection — is treated as the same condition: it is neither an
  ``OSError`` nor an ``ftplib.Error``, so an except tuple without it
  lets a dropped connection crash the executor task instead of
  reconnecting.
- ``nlst`` listing + substring filename filter (``data_dict`` /
  ``GapExchange``, ref :85-87, :121-124)
- ``retrbinary`` download (ref :126-128). A transfer that dies with a
  session-timeout-shaped failure (``error_temp`` / ``EOFError``) gets
  ONE reconnect + re-cwd + retry — the same remedy the reference
  applies to cwd — BEFORE any fallback, so a mid-directory timeout
  doesn't silently reroute the remaining files. The reference found
  retrbinary flaky for the data-dict files and hard-switched those to
  the HTTPS mirror of the same tree (ref :92-104); here retrbinary is
  the primary and a file whose transfer still fails after the retry
  falls back to the mirror URL when one is configured — the superset
  of both reference paths, and the same primary→mirror contract as
  ``fallback_download_fetcher``.

The FTP class is injectable (``ftp_factory``) so tests — and the
fixture-replayed ``src-ftp-walk`` query — replay the whole walk,
including error_temp reconnects and retrbinary failures, against an
in-process double (sources/ftp_fixture.py); no live network.

At cluster scale the walk runs INSIDE executors via the standard
``fetch_batch`` shape (``ftp_tree_fetcher``): ONE FTP connection per
Arrow batch (``FtpWalker`` owns it — hundreds of keys share one
login/PASV handshake instead of one handshake per key, the
connection-churn pattern real servers throttle), file payloads are
rows from the moment they download, and the study→executor fan-out is
Spark's partitioning of the key column — the driver never holds file
bytes.
"""

from __future__ import annotations

import ftplib
from collections.abc import Callable
from ftplib import error_perm, error_temp

import pandas as pd

DEFAULT_FTP_TIMEOUT = 60  # reference: FTP_TIMEOUT (get_dbgap_data_dicts.py)
DEFAULT_RECONNECTS = 1

# the "session died under us" conditions a reconnect can cure:
# server-side timeout (421/426) or a silently dropped control
# connection (ftplib raises bare EOFError for that)
_RECONNECTABLE = (error_temp, EOFError)


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


class FtpWalker:
    """One FTP control connection with bounded reconnect-on-timeout.

    The walker OWNS the connection: reconnects swap the internal
    handle, and ``close()`` always quits the CURRENT one — so a cwd
    that reconnects and then fails can never leak the fresh socket
    (the bug shape of holding the pre-reconnect handle in a caller's
    finally). Connection setup is lazy; the reconnect budget is per
    operation, not per walker lifetime.
    """

    def __init__(
        self,
        host: str,
        *,
        ftp_factory=ftplib.FTP,
        timeout: float = DEFAULT_FTP_TIMEOUT,
        max_reconnects: int = DEFAULT_RECONNECTS,
    ) -> None:
        self.host = host
        self.ftp_factory = ftp_factory
        self.timeout = timeout
        self.max_reconnects = max_reconnects
        self._ftp = None

    def _conn(self):
        if self._ftp is None:
            self._ftp = _connect(self.host, self.timeout, self.ftp_factory)
        return self._ftp

    def _reconnect(self):
        if self._ftp is not None:
            _quit_quietly(self._ftp)
            self._ftp = None
        return self._conn()

    def close(self) -> None:
        if self._ftp is not None:
            _quit_quietly(self._ftp)
            self._ftp = None

    def cwd(self, dir_path: str) -> None:
        """cwd that survives server-side session timeouts: on
        error_temp/EOFError, reconnect and retry up to
        ``max_reconnects`` times (ref :104-120). error_perm propagates
        — that's a missing directory, not a timeout."""
        reconnects = 0
        while True:
            try:
                self._conn().cwd(dir_path)
                return
            except _RECONNECTABLE:
                if reconnects >= self.max_reconnects:
                    raise
                reconnects += 1
                self._reconnect()

    def _retr(self, name: str) -> bytes:
        chunks: list[bytes] = []
        self._conn().retrbinary(f"RETR {name}", chunks.append)
        return b"".join(chunks)

    def _with_reconnect(self, op, dir_path: str):
        """Run ``op()`` with the cwd treatment: a session-timeout-shaped
        failure (error_temp/EOFError) gets reconnect + re-cwd + retry,
        up to ``max_reconnects`` times — the SAME budget semantic as
        cwd(), so every operation in a fetch interprets the knob
        identically. Permanent failures (error_perm) and plain socket
        errors propagate immediately."""
        reconnects = 0
        while True:
            try:
                return op()
            except _RECONNECTABLE:
                if reconnects >= self.max_reconnects:
                    raise
                reconnects += 1
                self._reconnect()
                self.cwd(dir_path)

    def _nlst_with_reconnect(self, dir_path: str) -> list[str]:
        """NLST with the cwd treatment: the listing sits between cwd
        and the transfers, so a session timeout landing exactly there
        (e.g. the previous directory's downloads aged the session out)
        gets bounded reconnect + re-cwd + retry instead of killing the
        whole fetch task."""
        return self._with_reconnect(lambda: self._conn().nlst("."), dir_path)

    def _retr_with_reconnect(self, name: str, dir_path: str) -> bytes:
        """retrbinary with the cwd treatment, bounded like cwd(); a
        transfer that still fails is the caller's cue for the mirror
        fallback."""
        return self._with_reconnect(lambda: self._retr(name), dir_path)

    def fetch_dir(
        self,
        dir_path: str,
        name_filter: str,
        *,
        mirror_template: str | None = None,
        http_get_fn=None,
    ) -> list[dict]:
        """Walk ONE FTP directory and download every file whose name
        contains ``name_filter``. Returns
        ``[{filename, source, content}]`` with source ``"ftp"`` or
        ``"mirror"``.

        cwd, the NLST listing, and transfers all survive session
        timeouts via bounded reconnect; a file whose transfer STILL fails falls back to
        ``mirror_template.format(dir_path=..., filename=...)`` when
        given (the reference's HTTPS-mirror path, ref :92-104), else
        propagates.
        """
        self.cwd(dir_path)
        # servers differ on NLST output: bare names, "./name", or full
        # paths — normalize to basenames so the filter and RETR always
        # see the same form
        names = sorted(
            {
                n.rsplit("/", 1)[-1]
                for n in self._nlst_with_reconnect(dir_path)
                if name_filter in n.rsplit("/", 1)[-1]
            }
        )
        out: list[dict] = []
        for name in names:
            try:
                content = self._retr_with_reconnect(name, dir_path)
                out.append(
                    {"filename": name, "source": "ftp", "content": content}
                )
            except (OSError, EOFError, ftplib.Error):
                if mirror_template is None:
                    raise
                if http_get_fn is None:
                    from dug_data_ingest_spark.sources.http_client import (
                        http_get,
                    )

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
    """One-shot directory walk: a fresh ``FtpWalker`` per call, closed
    on every path. See ``FtpWalker.fetch_dir``."""
    walker = FtpWalker(
        host,
        ftp_factory=ftp_factory,
        timeout=timeout,
        max_reconnects=max_reconnects,
    )
    try:
        return walker.fetch_dir(
            dir_path,
            name_filter,
            mirror_template=mirror_template,
            http_get_fn=http_get_fn,
        )
    finally:
        walker.close()


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
    Arrow batch (one ``FtpWalker`` shared by every key in the batch),
    one output row per downloaded file —
    ``(key, filename, source, n_bytes, content)``."""

    def fetch(batch: pd.DataFrame) -> pd.DataFrame:
        records = []
        walker = FtpWalker(
            host,
            ftp_factory=ftp_factory,
            timeout=timeout,
            max_reconnects=max_reconnects,
        )
        try:
            for key in batch[key_col]:
                for f in walker.fetch_dir(
                    dir_template.format(key=key),
                    name_filter,
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
        finally:
            walker.close()
        return pd.DataFrame(
            records,
            columns=[key_col, "filename", "source", "n_bytes", "content"],
        )

    return fetch
