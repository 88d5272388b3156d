"""Watermark state store.

The reference externalizes incremental state to MkPipe core: ``extract``
receives ``last_point`` and returns the new one stringified
(reference ``mkpipe_extractor_clickhouse/__init__.py:57, 113-115``).
Here the store is a small atomic JSON key→value file — values are always
strings exactly like the reference's contract, with datetimes serialized
by ``str()`` (ISO-like ``YYYY-MM-DD HH:MM:SS[.ffffff]``), which both
Spark's and DuckDB's timestamp parsers accept.

At 100 TB this state is per-*table*, not per-row — a handful of bytes —
so a driver-side JSON file (or any metastore) is the right scale; the
heavy lifting (max() over the extracted batch) runs distributed.
"""

from __future__ import annotations

import contextlib
import json
import os
import tempfile

import fcntl


class WatermarkStore:
    """Concurrent-safe: read-modify-write commits take an exclusive
    ``fcntl`` lock on a sidecar ``.lock`` file, so two pipelines sharing
    one state file (concurrent table ticks) cannot lose each other's
    committed watermarks.  Reads are lock-free — the atomic
    ``os.replace`` write means a reader always sees a complete JSON
    document."""

    def __init__(self, path: str):
        self.path = path

    @contextlib.contextmanager
    def _locked(self):
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        os.makedirs(d, exist_ok=True)
        lock_path = self.path + ".lock"
        with open(lock_path, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def _read(self) -> dict[str, str]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def get(self, table: str) -> str | None:
        return self._read().get(table)

    def _write(self, state: dict[str, str]) -> None:
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f, indent=2, sort_keys=True)
            os.replace(tmp, self.path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def set(self, table: str, value: str) -> None:
        with self._locked():
            state = self._read()
            state[table] = value
            self._write(state)

    def clear(self, table: str | None = None) -> None:
        if table is None:
            if os.path.exists(self.path):
                os.unlink(self.path)
            return
        with self._locked():
            state = self._read()
            state.pop(table, None)
            self._write(state)  # same atomic path as set()
