"""Bookmark / STATE store.

Re-creates Singer STATE semantics (reference tap.py:799-805 STATE
emission; client.py:287-315 forward-only bookmark advance;
wal_reader.py:307-344 idle-vs-timeout advance) as an atomic JSON document
on the driver.  Bookmarks are tiny (one value per stream) — this is
driver-side metadata by design, exactly like Spark's own offset log; the
data path never touches it except through a broadcast.

Layout::

    {"bookmarks": {"public.source_code_repos":
        {"replication_key": "_sdc_lsn", "replication_key_value": 123456}}}
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any


class StateStore:
    def __init__(self, path: str):
        self.path = path
        self._doc: dict[str, Any] = {"bookmarks": {}}
        if os.path.exists(path):
            with open(path) as f:
                self._doc = json.load(f)

    # -- reads ------------------------------------------------------------
    def bookmark(self, fqn: str) -> Any | None:
        return self._doc["bookmarks"].get(fqn, {}).get("replication_key_value")

    def bookmarks(self) -> dict[str, Any]:
        return {
            fqn: b.get("replication_key_value")
            for fqn, b in self._doc["bookmarks"].items()
        }

    def min_start_lsn(self, fqns: list[str], default: int = 0) -> int:
        """Shared-reader start position = min over per-stream bookmarks
        (reference wal_reader.py:133; test test_wal_reader.py:257-269)."""
        values = [self.bookmark(f) for f in fqns]
        present = [v for v in values if v is not None]
        if len(present) < len(fqns) or not present:
            return default
        return min(present)

    # -- watermarks (observability; never used for filtering) -------------
    def watermark(self, fqn: str) -> Any | None:
        return self._doc.get("watermarks", {}).get(fqn)

    def advance_watermark(self, fqn: str, value: Any) -> bool:
        """Track the highest LSN *seen* (reference max_lsn_seen,
        wal_reader.py:208,239).  Unlike the bookmark, this may outrun the
        checkpoint — it is observability metadata only.  The FILTER floor
        (``bookmark``) must never advance mid-run: Spark's file source does
        not guarantee LSN-ordered micro-batches across a crash-restart, so
        a floor that chases max-seen could drop not-yet-applied events.
        Final-state correctness under out-of-order batches comes from the
        LWW-by-LSN merge instead."""
        wm = self._doc.setdefault("watermarks", {})
        cur = wm.get(fqn)
        if value is None or (cur is not None and not (value > cur)):
            return False
        wm[fqn] = value
        return True

    # -- writes -----------------------------------------------------------
    def advance(self, fqn: str, replication_key: str, value: Any) -> bool:
        """Forward-only advance (reference client.py:287-315): a smaller
        value than the stored bookmark is ignored, never regresses.
        Returns True if the bookmark moved."""
        cur = self.bookmark(fqn)
        if cur is not None and value is not None and not (value > cur):
            return False
        if value is None:
            return False
        self._doc["bookmarks"][fqn] = {
            "replication_key": replication_key,
            "replication_key_value": value,
        }
        return True

    def flush(self) -> None:
        """Atomic write (tmp + rename) — the STATE message analog."""
        d = os.path.dirname(self.path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".state.tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(self._doc, f, indent=1, sort_keys=True)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
