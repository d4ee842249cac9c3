"""Production HTTP fetch callables for the rest.py fetch stages.

rest.py's ``paginated_fetch`` / ``keyed_fetch`` / ``incremental_fetch``
take a ``fetch_batch(pdf) -> pdf`` callable; fixtures plug in
``parquet_page_fetcher`` for replayable tests, and THESE are the real
network implementations, mirroring the reference's client semantics:

- bounded GET with timeout and explicit ``RuntimeError`` on failure
  (scripts/bdc/get_bdc_studies_from_gen3.py:32-82 — requests.get with
  GEN3_DOWNLOAD_TIMEOUT, raise on not-ok)
- per-key N+1 metadata GETs (same file :84-97)
- primary→mirror download fallback (scripts/bdc/get_dbgap_data_dicts.py:92-104
  — the FTP retrbinary path crashes, so files fall back to the HTTPS
  mirror of the same path). The reference's raw-FTP protocol walk
  (get_dbgap_data_dicts.py:104-120) IS implemented — sources/ftp.py:
  login/PASV, cwd with error_temp reconnect, error_perm study probe,
  nlst filter, retrbinary with per-file mirror fallback, fixture-
  replayed via sources/ftp_fixture.py — for FTP-only servers; this
  HTTP-with-retry + mirror path remains the default for dbGaP itself
  (it serves the identical tree over HTTPS, which is what a
  sandboxed / proxied cluster can actually reach; tested against a
  real local HTTP server in tests/test_http_fetch.py)

On top of the reference's semantics we add bounded retries with
exponential backoff for transient failures (429/5xx/connection
errors): on a 1000-executor cluster a fetch stage sees every flaky
LB response, and one transient 503 must not kill a 100 TB job. 4xx
other than 429 fails fast — retrying a 404 only hides real bugs.

Each callable keeps ONE ``requests.Session`` per Python worker
process (connection pooling across the partition's rows), matching
the one-connection-per-partition design of the mapInPandas stages.
"""

from __future__ import annotations

import time
from collections.abc import Callable

import pandas as pd

DEFAULT_TIMEOUT = 60  # reference: GEN3_DOWNLOAD_TIMEOUT (get_bdc_studies_from_gen3.py:26)
DEFAULT_RETRIES = 3
RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})


def http_get(
    url: str,
    *,
    session=None,
    timeout: float = DEFAULT_TIMEOUT,
    max_retries: int = DEFAULT_RETRIES,
    backoff: float = 0.5,
    sleep: Callable[[float], None] = time.sleep,
):
    """GET ``url`` with bounded retries and exponential backoff.

    Transient failures (connection errors, 429, 5xx) retry up to
    ``max_retries`` times sleeping ``backoff * 2**attempt`` between
    tries; anything else — or exhaustion — raises ``RuntimeError``
    carrying status and body text, the reference's failure contract
    (get_bdc_studies_from_gen3.py:60-64).

    Returns the ``requests.Response`` (already verified ok).
    """
    import requests

    ses = session if session is not None else requests
    last_err = "no attempt made"
    for attempt in range(max_retries + 1):
        try:
            resp = ses.get(url, timeout=timeout)
        except requests.RequestException as exc:
            last_err = f"connection error: {exc}"
        else:
            if resp.ok:
                return resp
            last_err = f"{resp.status_code} {resp.text[:500]}"
            if resp.status_code not in RETRY_STATUSES:
                break  # permanent client error: fail fast
        if attempt < max_retries:
            sleep(backoff * (2**attempt))
    raise RuntimeError(f"Could not download {url}: {last_err}")


def _url_key(key) -> str:
    """Percent-encode a key for interpolation into a URL path segment:
    the key_col contract is generic, so a key containing ' ', '#',
    '?', '&', or '/' must not truncate or re-route the request (quote
    is a no-op for the phs-id shaped keys the reference uses)."""
    from urllib.parse import quote

    return quote(str(key), safe="")


def _page_url(base_url: str, limit, offset) -> str:
    """Append pagination params with '&' or '?' as the base requires.
    (The reference demands a base 'ending with arguments or at least a
    question mark' — get_bdc_studies_from_gen3.py:39-41; handling the
    bare-path case here removes that silent-misuse trap.)"""
    sep = "&" if "?" in base_url else "?"
    return f"{base_url}{sep}limit={limit}&offset={offset}"


def _worker_session(state: dict):
    """One pooled Session per worker process, created lazily inside
    the task (a Session must never ride the closure through pickle)."""
    if "session" not in state:
        import requests

        state["session"] = requests.Session()
    return state["session"]


def gen3_page_fetcher(
    base_url: str,
    columns: list[str],
    *,
    timeout: float = DEFAULT_TIMEOUT,
    max_retries: int = DEFAULT_RETRIES,
    backoff: float = 0.5,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """``fetch_page`` callable for ``paginated_fetch``: for each
    (offset, limit) work-list row GET
    ``{base_url}&limit={limit}&offset={offset}`` and parse the JSON
    list of records.

    Reference: the serial while-loop pagination at
    get_bdc_studies_from_gen3.py:32-82; the ``&limit=..&offset=..``
    URL shape is kept verbatim. A page shorter than ``limit`` simply
    yields fewer rows (the work-list already bounds the range, so
    short pages terminate naturally rather than via the reference's
    break).
    """
    state: dict = {}

    def fetch(batch: pd.DataFrame) -> pd.DataFrame:
        ses = _worker_session(state)
        frames = []
        for row in batch.itertuples(index=False):
            url = _page_url(base_url, row.limit, row.offset)
            items = http_get(
                url,
                session=ses,
                timeout=timeout,
                max_retries=max_retries,
                backoff=backoff,
            ).json()
            if items and not isinstance(items[0], dict):
                # the Gen3 list endpoint returns bare id strings
                items = [{columns[0]: x} for x in items]
            frames.append(pd.DataFrame(items, columns=columns))
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(columns=columns)
        )

    return fetch


def keyed_item_fetcher(
    url_template: str,
    key_col: str,
    columns: list[str],
    *,
    timeout: float = DEFAULT_TIMEOUT,
    max_retries: int = DEFAULT_RETRIES,
    backoff: float = 0.5,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """``fetch_batch`` callable for ``keyed_fetch``: one GET per key
    (the reference's N+1 per-study metadata pulls,
    get_bdc_studies_from_gen3.py:84-97), one pooled session per
    partition. ``url_template`` is formatted with ``{key}``."""
    state: dict = {}

    def fetch(batch: pd.DataFrame) -> pd.DataFrame:
        ses = _worker_session(state)
        records = []
        for key in batch[key_col]:
            url = url_template.format(key=_url_key(key))
            item = http_get(
                url,
                session=ses,
                timeout=timeout,
                max_retries=max_retries,
                backoff=backoff,
            ).json()
            records.append({c: item.get(c) for c in columns})
        return pd.DataFrame(records, columns=columns)

    return fetch


def fallback_download_fetcher(
    primary_template: str,
    mirror_template: str,
    key_col: str,
    *,
    timeout: float = DEFAULT_TIMEOUT,
    primary_retries: int = 1,
    mirror_retries: int = DEFAULT_RETRIES,
    backoff: float = 0.5,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """``fetch_batch`` callable downloading one file per key, trying
    ``primary_template`` then ``mirror_template`` — the reference's
    FTP→HTTPS-mirror fallback (get_dbgap_data_dicts.py:92-104) as a
    pure-HTTP shape. Primary failures of ANY kind fall through to the
    mirror; only a mirror failure kills the task.

    The two legs carry separate retry budgets: the primary retries
    once (a single transient blip must not mislabel provenance as
    'mirror', but a struggling primary should fail over fast), while
    the mirror — the LAST line of defense before the task dies — gets
    the full retry budget, because one transient mirror 503 must not
    kill a 100 TB job. 4xx responses never retry on either leg
    (http_get fails fast on permanent client errors), so a genuinely
    missing primary file still fails over immediately.

    Output columns: (key, source 'primary'|'mirror', n_bytes,
    content binary).
    """
    state: dict = {}

    def fetch(batch: pd.DataFrame) -> pd.DataFrame:
        ses = _worker_session(state)
        records = []
        for key in batch[key_col]:
            try:
                resp = http_get(
                    primary_template.format(key=_url_key(key)),
                    session=ses,
                    timeout=timeout,
                    max_retries=primary_retries,
                    backoff=backoff,
                )
                source = "primary"
            except RuntimeError:
                resp = http_get(
                    mirror_template.format(key=_url_key(key)),
                    session=ses,
                    timeout=timeout,
                    max_retries=mirror_retries,
                    backoff=backoff,
                )
                source = "mirror"
            content = resp.content
            records.append(
                {
                    key_col: key,
                    "source": source,
                    "n_bytes": len(content),
                    "content": content,
                }
            )
        return pd.DataFrame(
            records, columns=[key_col, "source", "n_bytes", "content"]
        )

    return fetch


def download_gen3_list(
    base_url: str,
    *,
    download_limit: int = 50,
    timeout: float = DEFAULT_TIMEOUT,
    max_retries: int = DEFAULT_RETRIES,
    backoff: float = 0.5,
) -> list:
    """Driver-side serial pagination with short-page termination —
    the reference's exact loop (get_bdc_studies_from_gen3.py:32-82,
    GEN3_DOWNLOAD_LIMIT=50 at :25), used when the total count is
    unknown so the distributed offset work-list can't be built yet.
    The standard composition is: this once to size the listing, then
    ``paginated_fetch``/``keyed_fetch`` to pull records in parallel.
    """
    import requests

    ses = requests.Session()
    complete: list = []
    offset = 0
    while True:
        url = _page_url(base_url, download_limit, offset)
        page = http_get(
            url,
            session=ses,
            timeout=timeout,
            max_retries=max_retries,
            backoff=backoff,
        ).json()
        complete.extend(page)
        if len(page) < download_limit:
            break
        offset += download_limit
    return complete
