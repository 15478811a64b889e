"""Benchmark runner: headline catalog queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is executed twice: a warm-up is NOT used (cold numbers are the
honest ones at this scale); timing covers plan + execution + a count-style
materialization of the full result.
"""

from __future__ import annotations

import json
import os
import re
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

    from ctcityscraper_spark.plans.queries import QUERIES
    from ctcityscraper_spark.session import get_spark

    spark = get_spark(
        app_name="ctcityscraper_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Warm the JVM/codegen/parquet-reader paths and the Python worker pool
    # once so per-query numbers measure the queries, not session startup.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(10_000).selectExpr("sum(id * 2)").collect()
    spark.range(100).repartition(4).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, q in QUERIES.items():
        if not q.headline:
            continue
        # best of 2 (3 when the first two disagree badly): a single
        # local[32] run is vulnerable to GC/container hiccups; the min is
        # the honest steady-state cost of the plan
        runs: list[float] = []
        try:
            while len(runs) < 2 or (
                len(runs) == 2 and abs(runs[0] - runs[1]) > 0.25 * min(runs)
            ):
                # drain garbage from the PREVIOUS query outside the timed
                # window, so each number is the plan's cost, not the GC debt
                # of whatever ran before it (measured 2-5x swings without).
                # clearCache keeps every trial COLD: operators that persist
                # reusable artifacts (the LSH band index) must not get credit
                # for a previous trial's cache — the number is the full
                # pipeline cost, comparable across rounds.
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                df = q.fn(spark, sf_dir)
                # materialize every row (not just count — forces full
                # evaluation of all projected expressions) without
                # driver-collect overhead
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 4)
        except Exception as exc:  # noqa: BLE001 — one bad query must not
            # zero the whole round's bench (round 3 lost its entire BENCH
            # to a single analysis error); report and keep going
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    # ingestion throughput: the reference's own headline metric is
    # entries/sec through load (engine.py:347-348) — 2000 entries through
    # the full distributed-flatten pipeline incl. stamping + compaction
    import tempfile

    from ctcityscraper_spark.engine import run_load
    from ctcityscraper_spark.sources.contracts import ResolvedParams
    from ctcityscraper_spark.sources.demo import SOURCE
    from ctcityscraper_spark.sources.store import ParquetStore

    # best of 2 (fresh store each run): the first load pays mapInPandas
    # worker-pool and codegen warmup that isn't the pipeline's cost
    try:
        best = float("inf")
        for _ in range(2):
            store = ParquetStore(
                spark, tempfile.mkdtemp(prefix="bench_ingest_"), "bench"
            )
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            run_load(
                spark,
                store,
                SOURCE,
                ResolvedParams("bench", entry_ids=list(range(1, 2001))),
                batch_size=2000,
                checkpoint_every=None,
                retry_delay=0,
                workers=8,
            )
            best = min(best, time.perf_counter() - t0)
        timings["ingest_load_2000"] = round(best, 4)
    except Exception as exc:  # noqa: BLE001
        errors["ingest_load_2000"] = f"{type(exc).__name__}: {exc}"[:300]

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
