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

    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        if not q.headline:
            continue
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        # materialize every row (not just count — forces full evaluation
        # of all projected expressions) without driver-collect overhead
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
