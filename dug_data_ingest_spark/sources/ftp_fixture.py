"""In-process ftplib double for fixture-replaying the raw-FTP walk
(sources/ftp.py) — the FTP analogue of rest.py's
``parquet_page_fetcher``: a deterministic virtual dbGaP-shaped tree
derived from a supplier parquet, served through the exact ftplib
surface the walk touches (login / PASV / cwd / nlst / retrbinary /
quit), including the failure modes the reference code defends against
(error_temp session timeouts on cwd, error_perm on unknown paths,
flaky retrbinary).

Virtual tree, one study per supplier row::

    /studies/phs{s_suppkey:06d}/pheno_variable_summaries/
        phs{s_suppkey:06d}.data_dict.xml   (content from s_name)
        README.txt                          (filtered out by name)

Used by tests/test_ftp.py and the graded ``src-ftp-walk`` query; the
double is module-level and picklable, so the walk genuinely runs
inside executors through the same ``fetch_batch`` path a live ftplib
connection would.
"""

from __future__ import annotations

import functools
from ftplib import error_perm, error_temp

# one virtual tree per parquet path per python process
_TREE_CACHE: dict[str, dict] = {}
# processes in which the one simulated session timeout already fired
_TIMEOUT_FIRED: set[str] = set()
# (parquet_path, filename) whose one simulated mid-transfer timeout
# already fired in this process
_RETR_FIRED: set[tuple[str, str]] = set()
# parquet paths whose one simulated control-connection drop (bare
# EOFError from ftplib) already fired in this process
_EOF_FIRED: set[str] = set()
# parquet paths whose one simulated session timeout DURING the NLST
# listing already fired in this process
_NLST_FIRED: set[str] = set()


def study_dir(suppkey: int) -> str:
    return f"/studies/phs{int(suppkey):06d}/pheno_variable_summaries"


def dict_filename(suppkey: int) -> str:
    return f"phs{int(suppkey):06d}.data_dict.xml"


def dict_content(suppkey: int, s_name: str) -> bytes:
    return (
        f'<data_table study="phs{int(suppkey):06d}">'
        f"<name>{s_name}</name></data_table>"
    ).encode()


def _tree_for(parquet_path: str) -> dict[str, dict[str, bytes]]:
    if parquet_path not in _TREE_CACHE:
        import pyarrow.parquet as pq

        pdf = pq.read_table(
            parquet_path, columns=["s_suppkey", "s_name"]
        ).to_pandas()
        tree: dict[str, dict[str, bytes]] = {}
        for k, name in zip(pdf["s_suppkey"], pdf["s_name"]):
            tree[study_dir(k)] = {
                dict_filename(k): dict_content(k, name),
                "README.txt": b"not a dictionary",
            }
        _TREE_CACHE[parquet_path] = tree
    return _TREE_CACHE[parquet_path]


class ParquetFTPDouble:
    """Just enough ftplib.FTP surface for sources/ftp.py, over the
    virtual tree. ``empty_studies`` are cwd-able at the study level
    but have no pheno_variable_summaries (probe → "empty");
    ``flaky_files`` make retrbinary raise error_temp EVERY time (→ the
    mirror fallback); ``flaky_once_files`` raise ONE error_temp per
    (tree, file) per process then transfer normally (→ the
    reconnect-and-retry path must recover on FTP, never rerouting to
    the mirror); ``timeout_first_cwd`` raises ONE error_temp per
    python process on the first cwd (→ the reconnect path), matching
    the server-side session timeout the reference reconnects around;
    ``eof_first_cwd`` raises ONE bare EOFError per process on the
    first cwd — what real ftplib raises when the server silently
    drops the control connection; ``timeout_first_nlst`` raises ONE
    error_temp per process on the first NLST — the session timeout
    landing between cwd and the transfers."""

    def __init__(
        self,
        host: str,
        timeout: float = 60,
        *,
        parquet_path: str,
        empty_studies: frozenset = frozenset(),
        flaky_files: frozenset = frozenset(),
        flaky_once_files: frozenset = frozenset(),
        timeout_first_cwd: bool = False,
        eof_first_cwd: bool = False,
        timeout_first_nlst: bool = False,
    ) -> None:
        self.host = host
        self.timeout = timeout
        self._parquet_path = parquet_path
        self._empty = empty_studies
        self._flaky = flaky_files
        self._flaky_once = flaky_once_files
        self._timeout_first_cwd = timeout_first_cwd
        self._eof_first_cwd = eof_first_cwd
        self._timeout_first_nlst = timeout_first_nlst
        self._cwd: str | None = None
        self._alive = True

    # --- ftplib surface -------------------------------------------------
    def login(self) -> str:
        return "230 anonymous"

    def sendcmd(self, cmd: str) -> str:
        return "227 entering passive mode" if cmd == "PASV" else "200 ok"

    def cwd(self, path: str) -> str:
        if self._timeout_first_cwd and self._parquet_path not in _TIMEOUT_FIRED:
            _TIMEOUT_FIRED.add(self._parquet_path)
            self._alive = False
            raise error_temp("421 service not available, closing control connection")
        if self._eof_first_cwd and self._parquet_path not in _EOF_FIRED:
            _EOF_FIRED.add(self._parquet_path)
            self._alive = False
            raise EOFError
        if not self._alive:
            raise error_temp("421 connection closed")
        if path in _tree_for(self._parquet_path):
            self._cwd = path
            return "250 ok"
        if path in self._empty:
            self._cwd = path
            return "250 ok"
        raise error_perm(f"550 {path}: no such directory")

    def nlst(self, arg: str = ".") -> list[str]:
        if self._timeout_first_nlst and self._parquet_path not in _NLST_FIRED:
            _NLST_FIRED.add(self._parquet_path)
            self._alive = False
            raise error_temp("421 service not available, closing control connection")
        if not self._alive:
            raise error_temp("421 connection closed")
        tree = _tree_for(self._parquet_path)
        if arg == ".":
            if self._cwd in tree:
                return sorted(tree[self._cwd])
            return []
        if arg in tree or arg in self._empty:
            return sorted(tree.get(arg, {"study_files.txt": b""}))
        if any(d.startswith(arg.rstrip("/") + "/") for d in tree):
            return sorted(
                {
                    d[len(arg.rstrip("/")) + 1 :].split("/")[0]
                    for d in tree
                    if d.startswith(arg.rstrip("/") + "/")
                }
            )
        raise error_perm(f"550 {arg}: no such file or directory")

    def retrbinary(self, cmd: str, callback) -> str:
        name = cmd.split(" ", 1)[1]
        if name in self._flaky:
            raise error_temp("426 connection closed; transfer aborted")
        if (
            name in self._flaky_once
            and (self._parquet_path, name) not in _RETR_FIRED
        ):
            _RETR_FIRED.add((self._parquet_path, name))
            self._alive = False
            raise error_temp("426 connection closed; transfer aborted")
        if not self._alive:
            raise error_temp("421 connection closed")
        files = _tree_for(self._parquet_path).get(self._cwd, {})
        if name not in files:
            raise error_perm(f"550 {name}: no such file")
        data = files[name]
        mid = max(1, len(data) // 2)
        callback(data[:mid])
        callback(data[mid:])
        return "226 transfer complete"

    def quit(self) -> str:
        self._alive = False
        return "221 goodbye"


def parquet_ftp_factory(
    parquet_path: str,
    *,
    empty_studies: frozenset = frozenset(),
    flaky_files: frozenset = frozenset(),
    flaky_once_files: frozenset = frozenset(),
    timeout_first_cwd: bool = False,
    eof_first_cwd: bool = False,
    timeout_first_nlst: bool = False,
):
    """ftp_factory for sources/ftp.py bound to a supplier parquet —
    picklable (functools.partial over a module-level class), so it
    ships to executors inside fetch_batch closures."""
    return functools.partial(
        ParquetFTPDouble,
        parquet_path=parquet_path,
        empty_studies=empty_studies,
        flaky_files=flaky_files,
        flaky_once_files=flaky_once_files,
        timeout_first_cwd=timeout_first_cwd,
        eof_first_cwd=eof_first_cwd,
        timeout_first_nlst=timeout_first_nlst,
    )
