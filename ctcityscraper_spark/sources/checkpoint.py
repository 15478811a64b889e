"""JSON checkpoint store — resume state for long ingest runs.

Mirrors reference src/engine/database.py:181-214: one JSON file per scope at
``<data_dir>/_checkpoints/<scope>.json`` holding
``{scope_key, last_entry_id, total_scraped, checkpoint_time}``. Resume
semantics are best-effort by design (reference README.md:118-120): a stale or
missing checkpoint means restart from the beginning; load-mode duplicates are
acceptable because dedup happens at query time (SCD2) or refresh time
(hash anti-join). Do not "fix" this — the reference's tests encode it.

At cluster scale the same file lives on the shared filesystem / object store;
it is a driver-side artifact (tiny), not a distributed dataset.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path


class CheckpointStore:
    def __init__(self, data_dir: str | Path):
        self.dir = Path(data_dir) / "_checkpoints"

    def _path(self, scope_key: str) -> Path:
        return self.dir / f"{scope_key}.json"

    def save(self, scope_key: str, last_entry_id, total_scraped: int) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        payload = {
            "scope_key": scope_key,
            "last_entry_id": last_entry_id,
            "total_scraped": int(total_scraped),
            "checkpoint_time": datetime.now(timezone.utc).isoformat(),
        }
        tmp = self._path(scope_key).with_suffix(".json.tmp")
        tmp.write_text(json.dumps(payload))
        tmp.replace(self._path(scope_key))

    def load(self, scope_key: str) -> dict | None:
        p = self._path(scope_key)
        if not p.exists():
            return None
        try:
            return json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            return None  # stale/corrupt checkpoint -> restart from beginning

    def clear(self, scope_key: str) -> None:
        self._path(scope_key).unlink(missing_ok=True)
