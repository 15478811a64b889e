"""Scale-regime runner (SCALE.md r16; r15 VERDICT item 4): time the
shuffle-heaviest headline queries against the scale_gen corpus at the
given core count, noop-sink methodology (clearCache + GC drain before
each cold trial, best of N).

Usage: python plans/r16/scale_bench.py <scale_dir> <cores> [trials] [q ...]
Prints one JSON line: {"cores": C, "queries": {name: best_sec}, "runs": {...}}
"""

from __future__ import annotations

import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ctcityscraper_spark.operators import artifacts  # noqa: E402
from ctcityscraper_spark.plans.queries import QUERIES  # noqa: E402
from ctcityscraper_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "text_bpe_train",
    "dedup_minhash_lsh",
    "corpus_substring_spans",
    "dedup_prefix_filter_join",
    "dedup_groups_connected",
    "corpus_e2e_prep",
]


def main() -> None:
    scale_dir = sys.argv[1]
    cores = int(sys.argv[2])
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    names = sys.argv[4:] or DEFAULT_QUERIES
    spark = get_spark(
        app_name=f"scale_bench_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    spark.read.parquet(f"{scale_dir}/documents.parquet").count()  # warm
    best: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in names:
        q = QUERIES[name]
        runs[name] = []
        for t in range(trials):
            spark.catalog.clearCache()
            artifacts.release_all()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"scale {cores}c: {name} #{t}")
            t0 = time.perf_counter()
            q.fn(spark, scale_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(round(time.perf_counter() - t0, 3))
            print(f"# {name} c{cores} t{t}: {runs[name][-1]}s", flush=True)
        spark.catalog.clearCache()
        artifacts.release_all()
        best[name] = min(runs[name])
    print(json.dumps({"cores": cores, "queries": best, "runs": runs}))


if __name__ == "__main__":
    main()
