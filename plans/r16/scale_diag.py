"""Pre-flight check for a scale_gen corpus: raw minhash-LSH band-bucket
distribution (the quadratic-output hazard documented in scale_gen.py).

Usage: python plans/r16/scale_diag.py <scale_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F  # noqa: E402

from ctcityscraper_spark.operators.dedup import (  # noqa: E402
    _band_stack,
    minhash_signatures,
)
from ctcityscraper_spark.session import get_spark  # noqa: E402


def main() -> None:
    scale_dir = sys.argv[1]
    spark = get_spark(app_name="scale_diag", master="local[32]",
                      shuffle_partitions=32)
    docs = spark.read.parquet(f"{scale_dir}/documents.parquet")
    sig = minhash_signatures(docs, k=16, n=5)
    buckets = _band_stack(sig, 16, 8).groupBy("band", "band_hash").count()
    stats = buckets.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("total_pairs"),
    ).first()
    print(
        f"buckets={stats['n_buckets']} max_bucket={stats['max_bucket']} "
        f"candidate_pairs={int(stats['total_pairs'])}"
    )


if __name__ == "__main__":
    main()
