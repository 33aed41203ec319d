"""Parallel HTTP download pipeline (reference O8, S5, S6).

Reference ``DownloadManager`` (``lib/etl/download_manager.rb``):
N producer threads fetch URL batches; ONE consumer thread processes
landed batches; the delegate object drives the protocol. Contract
preserved exactly (SURVEY §3.3):

- ``create_download_batch`` is called under a lock (serialized paging
  through a work list; ``download_manager.rb:204-214``); returning
  None means exhausted and the thread exits
- producer threads never block on processing
- processing is **serialized** (single consumer;
  ``download_manager.rb:126-149``)
- **failed batches are still queued for processing**
  (``download_manager.rb:181-189``)
- delegate hooks: ``process_download_batch``,
  ``download_batch_failed``, ``download_batch_processing_failed``,
  ``download_thread_did_start/finish/failed``, ``download_did_finish``
  (``download_manager.rb:27-65``)
- results are ``{url, file, status_code, user_info}`` dicts
  (``download_manager.rb:272-285``)
- filename-from-URL: last path segment before ``?``
  (``download_manager.rb:250,303-305``)
- ``stop_download`` flag (``download_manager.rb:151-155``)

The reference dispatches over four engines (``download_manager.rb:
216-231``: curlmulti / curleasy / curl / hydra, plus a wget URL-list
variant) that are transport variants of the same contract. The
``engine=`` knob reproduces that dispatch: ``hydra`` / ``curlmulti`` /
``curleasy`` use the in-process HTTP transport (urllib +
ThreadPoolExecutor, ``max_concurrency`` fan-out inside a batch
mirroring hydra's ``max_concurrency = 20``,
``download_manager.rb:290``); ``curl`` and ``wget`` shell out to the
respective binary when present (``download_manager.rb:340-371,
427-480``), raising at construction if it isn't. The reference's
``download_meethod`` attr_accessor typo that made engine selection
dead code (``download_manager.rb:71`` vs ``:218``) is intentionally
not reproduced.

Downloaded files land where ``spark.read`` can reach them; the
processing delegate typically parses a batch into a staging table.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any
from urllib.parse import urlparse
from urllib.request import Request, urlopen

__all__ = ["DownloadBatch", "DownloadDelegate", "DownloadManager", "filename_from_url"]

#: hydra default (download_manager.rb:290)
DEFAULT_MAX_CONCURRENCY = 20
#: curleasy timeout seconds (download_manager.rb:327)
DEFAULT_TIMEOUT = 10.0


def filename_from_url(url: str) -> str:
    """Reference S6: last path segment before '?'
    (``download_manager.rb:250,303-305``)."""
    path = urlparse(url).path
    name = path.rsplit("/", 1)[-1]
    return name or "index"


def _normalize_url_spec(spec: Any) -> dict[str, Any]:
    """Reference S6: a batch URL is a string or
    ``{url:, filename:, user_info:}``; missing filename derived from
    the URL; ``user_info`` round-trips into the result
    (``download_manager.rb:236-250,263``)."""
    if isinstance(spec, str):
        return {"url": spec, "filename": filename_from_url(spec), "user_info": None}
    out = dict(spec)
    out.setdefault("filename", filename_from_url(out["url"]))
    out.setdefault("user_info", None)
    return out


class DownloadBatch:
    """Reference ``DownloadBatch`` (``download_batch.rb:21-32``): URLs
    in, per-URL results out."""

    def __init__(self, urls: list[Any], batch_id: int | None = None):
        self.batch_id = batch_id
        self.urls = [_normalize_url_spec(u) for u in urls]
        self.results: list[dict[str, Any]] = []
        self.failed: bool = False
        self.error: Exception | None = None


class DownloadDelegate:
    """Delegate protocol (``download_manager.rb:27-65``). Subclass and
    override; all hooks optional except ``create_download_batch`` /
    ``process_download_batch``."""

    def create_download_batch(self) -> DownloadBatch | None:  # serialized
        raise NotImplementedError

    def process_download_batch(self, batch: DownloadBatch) -> None:
        raise NotImplementedError

    def download_batch_failed(self, batch: DownloadBatch, error: Exception) -> None:
        pass

    def download_batch_processing_failed(
        self, batch: DownloadBatch, error: Exception
    ) -> None:
        pass

    def download_thread_did_start(self, tid: int) -> None:
        pass

    def download_thread_did_finish(self, tid: int) -> None:
        pass

    def download_thread_failed(self, tid: int, error: Exception) -> None:
        pass

    def download_did_finish(self) -> None:
        pass


class DownloadManager:
    """Producer/consumer download pipeline with the reference's
    threading contract."""

    #: engine name -> transport attribute (download_manager.rb:216-231)
    ENGINES = {
        "hydra": "_http_fetch",
        "curlmulti": "_http_fetch",
        "curleasy": "_http_fetch",
        "curl": "_shell_curl_fetch",
        "wget": "_shell_wget_fetch",
    }

    def __init__(
        self,
        delegate: DownloadDelegate,
        *,
        download_directory: str = ".",
        max_concurrency: int = DEFAULT_MAX_CONCURRENCY,
        timeout: float = DEFAULT_TIMEOUT,
        engine: str = "hydra",
        transport=None,
    ):
        self.delegate = delegate
        self.download_directory = download_directory
        self.max_concurrency = max_concurrency
        self.timeout = timeout
        if engine not in self.ENGINES:
            raise ValueError(
                f"unknown download engine {engine!r}; "
                f"valid: {sorted(self.ENGINES)}"
            )
        self.engine = engine
        if engine in ("curl", "wget"):
            import shutil

            if shutil.which(engine) is None:
                raise ValueError(
                    f"engine {engine!r} requires the {engine} binary on PATH"
                )
        self._transport = transport or getattr(self, self.ENGINES[engine])
        self._batch_lock = threading.Lock()
        self._batch_counter = 0
        self._processing_queue: "queue.Queue[DownloadBatch | None]" = queue.Queue()
        self._stop = threading.Event()

    # -- control (download_manager.rb:151-155) -------------------------
    def stop_download(self) -> None:
        self._stop.set()

    # -- main entry (download_manager.rb:81-124) -----------------------
    def download(self, *, threads: int = 1) -> None:
        os.makedirs(self.download_directory, exist_ok=True)
        producers = [
            threading.Thread(target=self._producer_loop, args=(tid,), daemon=True)
            for tid in range(threads)
        ]
        consumer = threading.Thread(target=self._consumer_loop, daemon=True)
        consumer.start()
        for p in producers:
            p.start()
        for p in producers:
            p.join()
        self._processing_queue.put(None)  # downloads finished sentinel
        consumer.join()
        self.delegate.download_did_finish()

    # -- producers (download_manager.rb:157-214) -----------------------
    def _next_batch(self) -> DownloadBatch | None:
        # Serialized batch creation with monotonic ids
        # (download_manager.rb:204-214).
        with self._batch_lock:
            batch = self.delegate.create_download_batch()
            if batch is None:
                return None
            self._batch_counter += 1
            batch.batch_id = self._batch_counter
            return batch

    def _producer_loop(self, tid: int) -> None:
        self.delegate.download_thread_did_start(tid)
        try:
            while not self._stop.is_set():
                batch = self._next_batch()
                if batch is None:
                    break
                try:
                    self._download_batch(batch)
                except Exception as e:  # noqa: BLE001
                    batch.failed = True
                    batch.error = e
                    self.delegate.download_batch_failed(batch, e)
                # Failed batches are still handed to processing
                # (download_manager.rb:181-189).
                self._processing_queue.put(batch)
        except Exception as e:  # noqa: BLE001
            self.delegate.download_thread_failed(tid, e)
        finally:
            self.delegate.download_thread_did_finish(tid)

    # -- single batch (download_manager.rb:287-321 hydra shape) --------
    def _download_batch(self, batch: DownloadBatch) -> None:
        with ThreadPoolExecutor(max_workers=self.max_concurrency) as pool:
            futures = [
                pool.submit(self._download_one, spec) for spec in batch.urls
            ]
            batch.results = [f.result() for f in futures]
        if any(r["status_code"] >= 400 or r["status_code"] == 0 for r in batch.results):
            batch.failed = True

    def _download_one(self, spec: dict[str, Any]) -> dict[str, Any]:
        path = os.path.join(self.download_directory, spec["filename"])
        try:
            status, content = self._transport(spec["url"])
            if status < 400 and content is not None:
                with open(path, "wb") as f:
                    f.write(content)
            # Result shape: download_manager.rb:272-285.
            return {
                "url": spec["url"],
                "file": path if status < 400 else None,
                "status_code": status,
                "user_info": spec.get("user_info"),
            }
        except Exception:  # network failure -> status 0, still recorded
            return {
                "url": spec["url"],
                "file": None,
                "status_code": 0,
                "user_info": spec.get("user_info"),
            }

    def _http_fetch(self, url: str) -> tuple[int, bytes | None]:
        req = Request(url, headers={"User-Agent": "datacamp-etl-spark/0.1"})
        try:
            with urlopen(req, timeout=self.timeout) as resp:
                status = getattr(resp, "status", 200) or 200
                return status, resp.read()
        except Exception as e:  # noqa: BLE001
            status = getattr(e, "code", 0)
            return int(status) if status else 0, None

    def _shell_curl_fetch(self, url: str) -> tuple[int, bytes | None]:
        """Shell-curl engine (``download_manager.rb:340-371``): one curl
        process per URL, HTTP status read from ``-w``."""
        import subprocess

        proc = subprocess.run(
            [
                "curl", "-sS", "-L", "--max-time", str(self.timeout),
                "-w", "\n%{http_code}", url,
            ],
            capture_output=True,
            check=False,
        )
        if proc.returncode != 0:
            return 0, None
        body, _, code = proc.stdout.rpartition(b"\n")
        try:
            status = int(code.strip() or 0)
        except ValueError:
            status = 0
        # file:// URLs report code 000 on success
        if status == 0 and proc.returncode == 0:
            status = 200
        return status, body if status < 400 else None

    def _shell_wget_fetch(self, url: str) -> tuple[int, bytes | None]:
        """wget engine (``download_manager.rb:427-480`` URL-list
        variant, applied per URL here so the result contract is
        uniform across engines)."""
        import subprocess

        proc = subprocess.run(
            ["wget", "-q", "-O", "-", "-T", str(int(self.timeout)), url],
            capture_output=True,
            check=False,
        )
        if proc.returncode != 0:
            return 0, None
        return 200, proc.stdout

    # -- consumer (download_manager.rb:126-149) ------------------------
    def _consumer_loop(self) -> None:
        while True:
            batch = self._processing_queue.get()
            if batch is None:
                return
            try:
                self.delegate.process_download_batch(batch)
            except Exception as e:  # noqa: BLE001
                self.delegate.download_batch_processing_failed(batch, e)
