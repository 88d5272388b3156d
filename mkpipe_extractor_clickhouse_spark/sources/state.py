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

import json
import os
import tempfile


class WatermarkStore:
    def __init__(self, path: str):
        self.path = path

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
        state = self._read()
        state[table] = value
        self._write(state)

    def clear(self, table: str | None = None) -> None:
        if table is None:
            if os.path.exists(self.path):
                os.unlink(self.path)
            return
        state = self._read()
        state.pop(table, None)
        self._write(state)  # same atomic path as set()
