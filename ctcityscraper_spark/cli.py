"""CLI mirroring the reference's ``scrape`` entry point (src/scrape.py:125-216).

Commands: ``load`` / ``refresh`` / ``refresh-all`` / ``admin`` with the
reference's shared tuning flags (--rate, --workers, --batch-size,
--checkpoint-every, --max-consecutive-errors). Sources are addressed as
``module.path:SOURCE_OBJECT`` — the registry pattern without a hardcoded
site list (the reference's REGISTRY, scrapers/__init__.py:4-7).

Example:
    python -m ctcityscraper_spark.cli load my_sources.vgsi:SOURCE newhaven \\
        --data-dir ./data --entry-id-min 1 --entry-id-max 27000
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys

from ctcityscraper_spark.engine import run_load, run_refresh
from ctcityscraper_spark.session import get_spark
from ctcityscraper_spark.sources.contracts import ResolvedParams, SourceDefinition
from ctcityscraper_spark.sources.store import ParquetStore


def load_source(spec: str) -> SourceDefinition:
    module_path, _, attr = spec.partition(":")
    mod = importlib.import_module(module_path)
    source = getattr(mod, attr or "SOURCE")
    if not isinstance(source, SourceDefinition):
        raise TypeError(f"{spec} is not a SourceDefinition")
    return source


def add_shared_args(p: argparse.ArgumentParser) -> None:
    # defaults mirror the reference CLI (src/scrape.py:131-145)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--rate", type=float, default=5.0, help="requests/sec")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=10)
    p.add_argument("--checkpoint-every", type=int, default=100)
    p.add_argument("--max-consecutive-errors", type=int, default=50)
    p.add_argument("--base-url", default="")


def _engine_kwargs(args) -> dict:
    return dict(
        batch_size=args.batch_size,
        rate_per_sec=args.rate,
        workers=args.workers,
        max_consecutive_errors=args.max_consecutive_errors,
    )


def cmd_load(args) -> int:
    spark = get_spark(app_name="ctcityscraper_load")
    source = load_source(args.source)
    store = ParquetStore(spark, args.data_dir, args.scope)
    entry_ids = None
    if args.entry_id_min is not None and args.entry_id_max is not None:
        entry_ids = list(range(args.entry_id_min, args.entry_id_max + 1))
    params = ResolvedParams(args.scope, base_url=args.base_url, entry_ids=entry_ids)
    stats = run_load(
        spark, store, source, params,
        checkpoint_every=args.checkpoint_every, **_engine_kwargs(args),
    )
    print(json.dumps(stats.__dict__ | {"entries_per_sec": round(stats.entries_per_sec, 2)}))
    return 0


def cmd_refresh(args) -> int:
    spark = get_spark(app_name="ctcityscraper_refresh")
    source = load_source(args.source)
    store = ParquetStore(spark, args.data_dir, args.scope)
    params = ResolvedParams(args.scope, base_url=args.base_url, refresh=True)
    stats = run_refresh(spark, store, source, params, **_engine_kwargs(args))
    print(json.dumps(stats.__dict__ | {"entries_per_sec": round(stats.entries_per_sec, 2)}))
    return 0


def cmd_refresh_all(args) -> int:
    # every scope directory under data-dir (reference get_all_scope_keys)
    from pathlib import Path

    rc = 0
    for scope_dir in sorted(Path(args.data_dir).iterdir()):
        if not scope_dir.is_dir() or scope_dir.name.startswith("_"):
            continue
        args.scope = scope_dir.name
        print(f"== refresh {args.scope} ==", file=sys.stderr)
        rc |= cmd_refresh(args)
    return rc


def cmd_admin(args) -> int:
    """Inspect a scope — or seed the cities dimension (reference
    run_admin --fetch-cities, scrapers/vgsi/source.py:968-977)."""
    spark = get_spark(app_name="ctcityscraper_admin")
    if getattr(args, "fetch_cities", False) or getattr(args, "seed_cities_json", None):
        from ctcityscraper_spark.sources.directory import (
            DEFAULT_DIRECTORY_URL,
            fetch_cities,
            load_cities_seed,
            store_cities,
        )

        if args.seed_cities_json:
            cities = load_cities_seed(args.seed_cities_json)
        else:
            from urllib.request import urlopen

            def fetcher(url: str) -> str:
                with urlopen(url, timeout=30) as resp:  # noqa: S310 — the
                    # directory URL is operator-provided, like the reference
                    return resp.read().decode("utf-8", "replace")

            cities = fetch_cities(fetcher, args.cities_url or DEFAULT_DIRECTORY_URL)
        count = store_cities(spark, args.data_dir, cities)
        print(json.dumps({"stored_cities": count}))
        return 0
    if args.scope is None:
        print("admin: a scope is required unless seeding cities", file=sys.stderr)
        return 2
    store = ParquetStore(spark, args.data_dir, args.scope)
    from ctcityscraper_spark.sources.checkpoint import CheckpointStore

    info = {
        "scope": args.scope,
        "tables": {
            t: {"files": len(store.list_files(t)), "rows": store.scan(t).count()}
            for t in store.tables()
        },
        "checkpoint": CheckpointStore(store.data_dir).load(args.scope),
    }
    print(json.dumps(info, indent=2, default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="ctcityscraper-spark")
    sub = parser.add_subparsers(dest="command", required=True)

    p_load = sub.add_parser("load", help="bulk ingest an entry-id range")
    p_load.add_argument("source", help="module.path:SOURCE")
    p_load.add_argument("scope")
    p_load.add_argument("--entry-id-min", type=int)
    p_load.add_argument("--entry-id-max", type=int)
    add_shared_args(p_load)
    p_load.set_defaults(fn=cmd_load)

    p_ref = sub.add_parser("refresh", help="re-scrape known entries, dedup unchanged")
    p_ref.add_argument("source", help="module.path:SOURCE")
    p_ref.add_argument("scope")
    add_shared_args(p_ref)
    p_ref.set_defaults(fn=cmd_refresh)

    p_all = sub.add_parser("refresh-all", help="refresh every scope under data-dir")
    p_all.add_argument("source", help="module.path:SOURCE")
    add_shared_args(p_all)
    p_all.set_defaults(fn=cmd_refresh_all)

    p_adm = sub.add_parser("admin", help="inspect a scope / seed cities dim")
    p_adm.add_argument("scope", nargs="?", default=None)
    p_adm.add_argument("--data-dir", default="data")
    p_adm.add_argument(
        "--fetch-cities", action="store_true",
        help="scrape the site directory into the cities dimension",
    )
    p_adm.add_argument(
        "--cities-url",
        default=None,
        help="directory page URL (defaults to the public portal)",
    )
    p_adm.add_argument(
        "--seed-cities-json", default=None,
        help="seed the cities dimension from a JSON file instead of fetching",
    )
    p_adm.set_defaults(fn=cmd_admin)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
