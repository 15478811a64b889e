"""Source contracts — the engine's extension interface (SURVEY §2.11 X1-X5).

Kept nearly verbatim in shape from the reference (src/engine/base.py:29-107):
they are engine-agnostic Python. ``scrape_fn`` / ``flatten_fn`` are the UDF /
UDTF surface the Spark engine invokes inside ``mapInPandas`` partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

# scrape_fn: (base_url, entry_id) -> payload dict | None. Raising
# ``invalid_entry_exception`` means "entry does not exist, skip silently"
# (reference src/engine/base.py:29-31, 44-46).
ScrapeFn = Callable[[str, Any], dict | None]

# flatten_fn: (list[payload]) -> {table_name: [row dicts]} — one input batch
# fans out to N tables x M rows (a multi-output UDTF; base.py:33-36).
FlattenFn = Callable[[list[dict]], dict[str, list[dict]]]


class InvalidEntryError(Exception):
    """Default 'entry does not exist' signal (skip, not an error)."""


@dataclass
class SourceDefinition:
    """What a source IS (reference src/engine/base.py:22-53)."""

    name: str
    scrape_fn: ScrapeFn
    flatten_fn: FlattenFn
    # "table/column" string resolved to a DISTINCT query at refresh time, or
    # a static list of ids (reference base.py:38-42, database.py:218-244)
    entry_id_source: str | list | None = None
    invalid_entry_exception: type[Exception] = InvalidEntryError
    # Optional per-table DDL schemas ("col type, ..."). When present, the
    # engine runs flatten INSIDE the fetch UDF and rows never touch the
    # driver (the bulk-backfill path); when absent, flatten runs driver-side
    # per micro-batch with inferred schemas (reference fidelity).
    table_schemas: dict[str, str] | None = None
    # optional per-table extra hash-exclusion fields (hash.py extra_exclude)
    hash_exclude: dict[str, set] = field(default_factory=dict)
    # optional side-effect extractors (reference base.py:48-53; out of the
    # analytic path — executed driver-side after each batch when present)
    get_photo_items_fn: Callable[[dict], list] | None = None
    download_fn: Callable[[Any], None] | None = None
    # post_refresh hook (reference X5, vgsi/source.py:955-966): called after
    # a refresh with (spark, store, refresh_start_time) — the CDC-report
    # surface (typically operators.scd2.changed_since over the main table)
    post_refresh_fn: Callable | None = None


@dataclass
class ResolvedParams:
    """What one run DOES (reference src/engine/base.py:56-62)."""

    scope_key: str
    base_url: str = ""
    entry_ids: list | None = None  # load mode: explicit id range/list
    refresh: bool = False


@dataclass
class EngineStats:
    """Run counters (reference src/engine/engine.py:196-199, 510-517)."""

    scraped: int = 0
    invalid: int = 0
    errors: int = 0
    rows_written: int = 0
    rows_skipped: int = 0
    elapsed_sec: float = 0.0

    @property
    def entries_per_sec(self) -> float:
        return self.scraped / self.elapsed_sec if self.elapsed_sec > 0 else 0.0
