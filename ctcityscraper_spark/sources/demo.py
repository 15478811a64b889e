"""Deterministic offline demo source — for benchmarks, docs, and smoke runs.

Two tables (entities + parts), no network, fixed payloads derived from the
entry id. Usable from the CLI:

    python -m ctcityscraper_spark.cli load ctcityscraper_spark.sources.demo:SOURCE demo \\
        --data-dir ./data --entry-id-min 1 --entry-id-max 1000 --rate 0
"""

from __future__ import annotations

from ctcityscraper_spark.sources.contracts import InvalidEntryError, SourceDefinition


def scrape(base_url: str, entry_id) -> dict:
    pid = int(entry_id)
    if pid < 0:
        raise InvalidEntryError(f"no entry {pid}")
    return {
        "pid": pid,
        "name": f"entity-{pid}",
        "value": round(pid * 1.5, 2),
        "category": f"cat{pid % 7}",
        "parts": [
            {"part_no": i, "size": (pid * 31 + i * 7) % 100}
            for i in range(pid % 4)
        ],
    }


def flatten(payloads: list[dict]) -> dict[str, list[dict]]:
    entities, parts = [], []
    for p in payloads:
        uuid = f"e{p['pid']}"
        entities.append(
            {
                "uuid": uuid,
                "pid": p["pid"],
                "name": p["name"],
                "value": p["value"],
                "category": p["category"],
            }
        )
        for part in p.get("parts", []):
            parts.append({"entity_uuid": uuid, "pid": p["pid"], **part})
    return {"entities": entities, "parts": parts}


SOURCE = SourceDefinition(
    name="demo",
    scrape_fn=scrape,
    flatten_fn=flatten,
    entry_id_source="entities/pid",
    table_schemas={
        "entities": "uuid string, pid long, name string, value double, category string",
        "parts": "entity_uuid string, pid long, part_no long, size long",
    },
)

# same source with driver-side flatten (schema inference) for comparison
SOURCE_DRIVER_FLATTEN = SourceDefinition(
    name="demo_driver",
    scrape_fn=scrape,
    flatten_fn=flatten,
    entry_id_source="entities/pid",
)
