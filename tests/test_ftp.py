"""Raw-FTP protocol walk (sources/ftp.py) against the in-process
ftplib double (sources/ftp_fixture.py): the reference behaviors —
error_temp reconnect, error_perm study probe, name filtering,
retrbinary download, per-file mirror fallback — each replayed without
touching the network (reference: scripts/bdc/get_dbgap_data_dicts.py
:46-137)."""

from __future__ import annotations

from ftplib import error_temp

import pandas as pd
import pytest

from dug_data_ingest_spark.sources import ftp_fixture
from dug_data_ingest_spark.sources.ftp import (
    fetch_ftp_dir,
    ftp_tree_fetcher,
    probe_study,
)
from dug_data_ingest_spark.sources.ftp_fixture import (
    dict_content,
    dict_filename,
    parquet_ftp_factory,
    study_dir,
)
from tests.conftest import TEST_SF_DIR

SUPPLIER = f"{TEST_SF_DIR}/supplier.parquet"
HOST = "ftp.example.test"


def _names(n=3):
    import pyarrow.parquet as pq

    pdf = pq.read_table(SUPPLIER, columns=["s_suppkey", "s_name"]).to_pandas()
    return dict(zip(pdf["s_suppkey"][:n], pdf["s_name"][:n]))


def test_walk_downloads_filtered_files_with_exact_bytes():
    names = _names()
    factory = parquet_ftp_factory(SUPPLIER)
    for k, s_name in names.items():
        files = fetch_ftp_dir(
            HOST, study_dir(k), "data_dict", ftp_factory=factory
        )
        # README.txt filtered out by name; content assembled from the
        # chunked retrbinary callbacks
        assert [f["filename"] for f in files] == [dict_filename(k)]
        assert files[0]["source"] == "ftp"
        assert files[0]["content"] == dict_content(k, s_name)


def test_session_timeout_reconnects_then_succeeds():
    k = next(iter(_names()))
    ftp_fixture._TIMEOUT_FIRED.discard(SUPPLIER)
    factory = parquet_ftp_factory(SUPPLIER, timeout_first_cwd=True)
    files = fetch_ftp_dir(HOST, study_dir(k), "data_dict", ftp_factory=factory)
    assert len(files) == 1  # the walk survived the 421


def test_session_timeout_without_reconnect_budget_raises():
    k = next(iter(_names()))
    ftp_fixture._TIMEOUT_FIRED.discard(SUPPLIER)
    factory = parquet_ftp_factory(SUPPLIER, timeout_first_cwd=True)
    with pytest.raises(error_temp):
        fetch_ftp_dir(
            HOST, study_dir(k), "data_dict",
            ftp_factory=factory, max_reconnects=0,
        )


def test_probe_study_classifies_ok_empty_missing():
    k = next(iter(_names()))
    study = study_dir(k).rsplit("/", 1)[0]
    factory = parquet_ftp_factory(
        SUPPLIER, empty_studies=frozenset({"/studies/phs999999"})
    )
    assert probe_study(HOST, study, ftp_factory=factory) == "ok"
    # study exists but has no pheno_variable_summaries -> warning path
    assert probe_study(HOST, "/studies/phs999999", ftp_factory=factory) == "empty"
    # accession id not on the server at all -> error path
    assert probe_study(HOST, "/studies/phs000000x", ftp_factory=factory) == "missing"


def test_flaky_retrbinary_falls_back_to_mirror():
    names = _names()
    k, s_name = next(iter(names.items()))
    flaky = dict_filename(k)
    factory = parquet_ftp_factory(SUPPLIER, flaky_files=frozenset({flaky}))
    fetched_urls = []

    class _Resp:
        content = b"mirror bytes"

    def fake_http_get(url):
        fetched_urls.append(url)
        return _Resp()

    files = fetch_ftp_dir(
        HOST,
        study_dir(k),
        "data_dict",
        ftp_factory=factory,
        mirror_template="https://mirror.test/{dir_path}/{filename}",
        http_get_fn=fake_http_get,
    )
    assert files[0]["source"] == "mirror"
    assert files[0]["content"] == b"mirror bytes"
    assert fetched_urls == [
        f"https://mirror.test/{study_dir(k).strip('/')}/{flaky}"
    ]
    # without a mirror, the per-file failure propagates
    with pytest.raises(error_temp):
        fetch_ftp_dir(HOST, study_dir(k), "data_dict", ftp_factory=factory)


def test_nlst_path_forms_are_normalized():
    # servers differ on NLST output: bare names, "./name", full paths —
    # the walk must handle all three identically
    k = next(iter(_names()))
    base = parquet_ftp_factory(SUPPLIER)

    def prefixing_factory(prefix):
        def factory(host, timeout=60):
            inner = base(host, timeout=timeout)
            orig = inner.nlst
            inner.nlst = lambda arg=".": [f"{prefix}{n}" for n in orig(arg)]
            return inner

        return factory

    expected = fetch_ftp_dir(HOST, study_dir(k), "data_dict", ftp_factory=base)
    for prefix in ("./", f"{study_dir(k)}/"):
        got = fetch_ftp_dir(
            HOST, study_dir(k), "data_dict",
            ftp_factory=prefixing_factory(prefix),
        )
        assert got == expected, prefix


def test_tree_fetcher_batch_shape():
    names = _names(3)
    factory = parquet_ftp_factory(SUPPLIER)
    fetch = ftp_tree_fetcher(
        HOST,
        "/studies/phs{key:06d}/pheno_variable_summaries",
        "s_suppkey",
        "data_dict",
        ftp_factory=factory,
    )
    out = fetch(pd.DataFrame({"s_suppkey": list(names)}))
    assert list(out.columns) == [
        "s_suppkey", "filename", "source", "n_bytes", "content",
    ]
    assert len(out) == len(names)
    for _, row in out.iterrows():
        assert row["n_bytes"] == len(row["content"])
        assert row["content"] == dict_content(
            row["s_suppkey"], names[row["s_suppkey"]]
        )


def test_transfer_timeout_reconnects_and_stays_on_ftp():
    # a mid-directory session timeout during retrbinary must get the
    # same reconnect treatment as cwd — recovering ON FTP, not
    # rerouting the file (and every file after it) to the mirror
    names = _names()
    k, s_name = next(iter(names.items()))
    flaky_once = dict_filename(k)
    ftp_fixture._RETR_FIRED.discard((SUPPLIER, flaky_once))

    def must_not_call(url):
        raise AssertionError(f"mirror consulted for a recoverable timeout: {url}")

    factory = parquet_ftp_factory(
        SUPPLIER, flaky_once_files=frozenset({flaky_once})
    )
    files = fetch_ftp_dir(
        HOST,
        study_dir(k),
        "data_dict",
        ftp_factory=factory,
        mirror_template="https://mirror.test/{dir_path}/{filename}",
        http_get_fn=must_not_call,
    )
    assert files[0]["source"] == "ftp"
    assert files[0]["content"] == dict_content(k, s_name)


def test_session_timeout_during_nlst_reconnects():
    # the listing sits between cwd and the transfers; a 421 landing
    # exactly there (previous directory's downloads aged the session
    # out) must take the reconnect path like cwd/retrbinary, not kill
    # the fetch task
    k = next(iter(_names()))
    ftp_fixture._NLST_FIRED.discard(SUPPLIER)
    factory = parquet_ftp_factory(SUPPLIER, timeout_first_nlst=True)
    files = fetch_ftp_dir(HOST, study_dir(k), "data_dict", ftp_factory=factory)
    assert len(files) == 1


def test_eof_on_dropped_control_connection_reconnects():
    # ftplib raises bare EOFError (not OSError, not ftplib.Error) when
    # the server silently closes the control connection — it must take
    # the reconnect path, not crash the task
    k = next(iter(_names()))
    ftp_fixture._EOF_FIRED.discard(SUPPLIER)
    factory = parquet_ftp_factory(SUPPLIER, eof_first_cwd=True)
    files = fetch_ftp_dir(HOST, study_dir(k), "data_dict", ftp_factory=factory)
    assert len(files) == 1


def test_tree_fetcher_uses_one_connection_per_batch():
    # the documented contract: hundreds of keys share one login/PASV
    # handshake per Arrow batch, not one per key
    names = _names(3)
    base = parquet_ftp_factory(SUPPLIER)
    connects = []

    def counting_factory(host, timeout=60):
        connects.append(host)
        return base(host, timeout=timeout)

    fetch = ftp_tree_fetcher(
        HOST,
        "/studies/phs{key:06d}/pheno_variable_summaries",
        "s_suppkey",
        "data_dict",
        ftp_factory=counting_factory,
    )
    out = fetch(pd.DataFrame({"s_suppkey": list(names)}))
    assert len(out) == len(names)
    assert len(connects) == 1, connects


def test_reconnect_budget_means_the_same_for_every_operation():
    # max_reconnects=2 must survive TWO consecutive timeouts on the
    # SAME operation — nlst and retrbinary included, not just cwd.
    # (The pre-round-8 helpers treated the budget as a boolean: one
    # retry regardless of the knob, so a second consecutive NLST 421
    # killed the fetch while a second cwd 421 did not.)
    from ftplib import error_temp

    from dug_data_ingest_spark.sources.ftp import FtpWalker

    class FlakyTwice:
        def __init__(self):
            self.nlst_fails = 2
            self.retr_fails = 2

        def connect(self, host, timeout=None):
            pass

        def __call__(self, host, timeout=None):
            return self

        def login(self):
            pass

        def set_pasv(self, flag):
            pass

        def sendcmd(self, cmd):
            return "200"

        def cwd(self, d):
            pass

        def nlst(self, d):
            if self.nlst_fails:
                self.nlst_fails -= 1
                raise error_temp("421 session timed out")
            return ["data_dict.xml"]

        def retrbinary(self, cmd, cb):
            if self.retr_fails:
                self.retr_fails -= 1
                raise error_temp("421 session timed out")
            cb(b"payload")

        def quit(self):
            pass

    shared = FlakyTwice()
    walker = FtpWalker(
        "ftp.example.test", ftp_factory=shared, max_reconnects=2
    )
    files = walker.fetch_dir("/studies/x", "data_dict")
    assert [f["content"] for f in files] == [b"payload"]

    # and a budget of 1 still dies on the second consecutive timeout
    shared2 = FlakyTwice()
    walker2 = FtpWalker(
        "ftp.example.test", ftp_factory=shared2, max_reconnects=1
    )
    with pytest.raises(error_temp):
        walker2.fetch_dir("/studies/x", "data_dict")
