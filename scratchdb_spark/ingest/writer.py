"""Micro-batch NDJSON buffer (reference N13,
datasink/filesystem/filesystem.go).

Rows append to a per-(database, table) open NDJSON file under a lock
(filesystem.go:313-357); the file rotates to the closed dir when it
exceeds ``max_size_bytes`` / ``max_rows`` / ``max_age_seconds``
(NeedsRotation, filesystem.go:191-205). The reference then uploads the
closed file to blob storage and enqueues a work message
(filesystem.go:95-171); locally we collapse that queue hop (N14/N15)
into a direct callback — the Structured Streaming path in
``streaming/`` re-introduces an at-least-once landing zone for cluster
deployments, where the closed dir is the stream source.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional


@dataclass
class _OpenFile:
    path: str
    created: float
    rows: int = 0
    size: int = 0
    lock: threading.Lock = field(default_factory=threading.Lock)


class BufferedWriter:
    def __init__(
        self,
        root: str,
        max_size_bytes: int = 64 * 1024 * 1024,
        max_rows: int = 100_000,
        max_age_seconds: float = 30.0,
        on_closed: Optional[Callable[[str, str, str], None]] = None,
        landing=None,
    ):
        """``on_closed(database, table, closed_path)`` fires after each
        rotation — the local stand-in for upload+enqueue+worker.

        ``landing`` (an :class:`scratchdb_spark.fs.HadoopLanding` or
        any object with ``upload(db, table, local_path) -> remote``)
        re-creates the reference's blob-store hop
        (filesystem.go:95-171): the rotated file is uploaded to the
        landing zone (s3a/gs/hdfs/file URI) and removed locally, and
        ``on_closed`` receives the REMOTE path. The open-file spool is
        deliberately node-local either way — line-grained appends
        belong on local disk, objects go to the store whole, exactly
        as the reference buffers locally then uploads."""
        self.root = root
        self.max_size_bytes = max_size_bytes
        self.max_rows = max_rows
        self.max_age_seconds = max_age_seconds
        self.on_closed = on_closed
        self.landing = landing
        self._open: dict[tuple[str, str], _OpenFile] = {}
        self._lock = threading.Lock()
        self._counter = 0

    def _open_dir(self, db: str, tbl: str) -> str:
        return os.path.join(self.root, "open", str(db), tbl)

    def _closed_dir(self, db: str, tbl: str) -> str:
        return os.path.join(self.root, "closed", str(db), tbl)

    def _get_file(self, db: str, tbl: str) -> _OpenFile:
        key = (str(db), tbl)
        with self._lock:
            f = self._open.get(key)
            if f is None:
                d = self._open_dir(db, tbl)
                os.makedirs(d, exist_ok=True)
                self._counter += 1
                path = os.path.join(d, f"{int(time.time()*1000)}_{self._counter}.ndjson")
                f = _OpenFile(path=path, created=time.time())
                self._open[key] = f
            return f

    def write_data(self, database: str, table: str, line: str) -> None:
        """Append one NDJSON line; rotate if thresholds hit."""
        f = self._get_file(database, table)
        with f.lock:
            data = line.rstrip("\n") + "\n"
            with open(f.path, "a", encoding="utf-8") as fh:
                fh.write(data)
            f.rows += 1
            f.size += len(data.encode())
        if self._needs_rotation(f):
            self._rotate(database, table)

    def _needs_rotation(self, f: _OpenFile) -> bool:
        if self.max_size_bytes and f.size >= self.max_size_bytes:
            return True
        if self.max_rows and f.rows >= self.max_rows:
            return True
        if self.max_age_seconds and time.time() - f.created >= self.max_age_seconds:
            return True
        return False

    def _rotate(self, database: str, table: str) -> Optional[str]:
        key = (str(database), table)
        with self._lock:
            f = self._open.pop(key, None)
        if f is None or f.rows == 0:
            return None
        if self.landing is not None:
            closed = self.landing.upload(str(database), table, f.path)
        else:
            d = self._closed_dir(database, table)
            os.makedirs(d, exist_ok=True)
            closed = os.path.join(d, os.path.basename(f.path))
            os.replace(f.path, closed)
        if self.on_closed:
            self.on_closed(str(database), table, closed)
        return closed

    def flush_all(self) -> list[str]:
        """Rotate every open buffer now (synchronous mode for tests and
        graceful shutdown)."""
        with self._lock:
            keys = list(self._open.keys())
        out = []
        for db, tbl in keys:
            p = self._rotate(db, tbl)
            if p:
                out.append(p)
        return out

    def tick(self) -> None:
        """Age-based rotation pass (reference: 1 s ticker goroutine,
        filesystem.go:173-189). Call from a timer/daemon thread."""
        with self._lock:
            items = list(self._open.items())
        now = time.time()
        for (db, tbl), f in items:
            if self.max_age_seconds and now - f.created >= self.max_age_seconds:
                self._rotate(db, tbl)
