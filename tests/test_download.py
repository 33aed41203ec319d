"""Download pipeline: delegate protocol + threading contract (O8/S5/S6).

Uses an injected fake transport — no network."""

from __future__ import annotations

import threading

from datacamp_etl_spark.sources.download import (
    DownloadBatch,
    DownloadDelegate,
    DownloadManager,
    filename_from_url,
)


def test_filename_from_url():
    assert filename_from_url("http://x.com/a/b/data.csv?v=1") == "data.csv"
    assert filename_from_url("http://x.com/") == "index"


class ListDelegate(DownloadDelegate):
    """Pages through a work list — exercises serialized batch creation."""

    def __init__(self, batches):
        self._batches = list(batches)
        self.processed = []
        self.failed_batches = []
        self.processing_order = []
        self.create_calls = 0
        self.concurrent_creates = 0
        self._in_create = False
        self.threads_started = set()
        self.finished = False
        self._lock = threading.Lock()

    def create_download_batch(self):
        # must never run concurrently (reference serializes it)
        assert not self._in_create, "create_download_batch ran concurrently"
        self._in_create = True
        try:
            self.create_calls += 1
            if not self._batches:
                return None
            return DownloadBatch(self._batches.pop(0))
        finally:
            self._in_create = False

    def process_download_batch(self, batch):
        with self._lock:
            self.processing_order.append(threading.current_thread().name)
            self.processed.append(batch)

    def download_batch_failed(self, batch, error):
        self.failed_batches.append(batch)

    def download_thread_did_start(self, tid):
        self.threads_started.add(tid)

    def download_did_finish(self):
        self.finished = True


def _fake_transport(url: str):
    if "missing" in url:
        return 404, None
    if "boom" in url:
        raise RuntimeError("network down")
    return 200, f"content-of:{url}".encode()


def test_download_end_to_end(tmp_path):
    delegate = ListDelegate(
        [
            ["http://x/a.txt", "http://x/b.txt"],
            [{"url": "http://x/c.txt?q=1", "user_info": {"k": "v"}}],
            ["http://x/missing.txt"],
        ]
    )
    mgr = DownloadManager(
        delegate, download_directory=str(tmp_path), transport=_fake_transport
    )
    mgr.download(threads=3)

    assert delegate.finished
    assert len(delegate.processed) == 3
    assert delegate.threads_started == {0, 1, 2}
    # single consumer: all processing on one thread
    assert len(set(delegate.processing_order)) == 1

    by_url = {
        r["url"]: r for b in delegate.processed for r in b.results
    }
    assert by_url["http://x/a.txt"]["status_code"] == 200
    assert (tmp_path / "a.txt").read_bytes() == b"content-of:http://x/a.txt"
    # filename derived before '?', user_info round-trips
    assert by_url["http://x/c.txt?q=1"]["user_info"] == {"k": "v"}
    assert (tmp_path / "c.txt").exists()
    # failed URL recorded, no file
    assert by_url["http://x/missing.txt"]["status_code"] == 404
    assert by_url["http://x/missing.txt"]["file"] is None


def test_failed_batches_still_processed(tmp_path):
    delegate = ListDelegate([["http://x/boom.txt"], ["http://x/ok.txt"]])
    mgr = DownloadManager(
        delegate, download_directory=str(tmp_path), transport=_fake_transport
    )
    mgr.download(threads=1)
    # the exception batch is marked failed AND processed
    assert len(delegate.processed) == 2
    failed = [b for b in delegate.processed if b.failed]
    assert len(failed) == 1


def test_engine_dispatch(tmp_path):
    """S5: the reference's 4-engine dispatch (download_manager.rb:
    216-231). All in-process engines resolve to the HTTP transport;
    unknown engines raise; shell engines require their binary."""
    import pytest

    d = ListDelegate([])
    for eng in ("hydra", "curlmulti", "curleasy"):
        mgr = DownloadManager(d, download_directory=str(tmp_path), engine=eng)
        assert mgr._transport == mgr._http_fetch
    with pytest.raises(ValueError, match="unknown download engine"):
        DownloadManager(d, download_directory=str(tmp_path), engine="teleport")
    import shutil

    for eng in ("curl", "wget"):
        if shutil.which(eng):
            mgr = DownloadManager(d, download_directory=str(tmp_path), engine=eng)
            assert mgr.engine == eng
        else:
            with pytest.raises(ValueError, match="binary"):
                DownloadManager(d, download_directory=str(tmp_path), engine=eng)


def test_download_to_staging_e2e(spark, tmp_path):
    """S5 end-to-end oracle: DownloadManager fetches CSV fixtures over
    file:// with the REAL default transport (no injected fake), the
    consumer lands them as parquet staging, and mapped_append projects
    the staging table — closing the download -> staging -> load path."""
    from pyspark.sql import functions as F

    from datacamp_etl_spark.operators.loading import mapped_append

    src = tmp_path / "remote"
    src.mkdir()
    (src / "part1.csv").write_text("id,amount\n1,10.5\n2,20.0\n")
    (src / "part2.csv").write_text("id,amount\n3,30.25\n")
    land = tmp_path / "landing"
    staging_dir = str(tmp_path / "staging")

    class StagingDelegate(DownloadDelegate):
        def __init__(self, urls):
            self._work = [urls]
            self.landed = 0

        def create_download_batch(self):
            return DownloadBatch(self._work.pop(0)) if self._work else None

        def process_download_batch(self, batch):
            files = [r["file"] for r in batch.results if r["file"]]
            df = spark.read.option("header", True).csv(files)
            df.write.mode("append").parquet(staging_dir)
            self.landed += len(files)

    delegate = StagingDelegate(
        [f"file://{src}/part1.csv", f"file://{src}/part2.csv"]
    )
    DownloadManager(delegate, download_directory=str(land)).download(threads=2)
    assert delegate.landed == 2

    staged = spark.read.parquet(staging_dir)
    out = mapped_append(
        staged,
        {"id": "id", "amount_cents": F.col("amount").cast("double") * 100},
    )
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows["3"]["amount_cents"] == 3025.0
    assert rows["1"]["record_status"] == "loaded"


def test_stop_download(tmp_path):
    class EndlessDelegate(ListDelegate):
        def create_download_batch(self):
            self.create_calls += 1
            return DownloadBatch(["http://x/ok.txt"])

    delegate = EndlessDelegate([])

    class StoppingManager(DownloadManager):
        def _download_batch(self, batch):
            super()._download_batch(batch)
            if self._batch_counter >= 3:
                self.stop_download()

    mgr = StoppingManager(
        delegate, download_directory=str(tmp_path), transport=_fake_transport
    )
    mgr.download(threads=1)
    assert 3 <= len(delegate.processed) <= 4
