"""Deterministic scaled documents table for the r16 scale-regime runs
(SCALE.md; r15 VERDICT item 4).

The driver's testdata tops out at sf0.1 (5k docs, ~1.5 MB text), where
every headline query is fixed-overhead-bound and 8 cores beat 32. This
generator synthesizes a documents table of SCALE x that volume with the
duplication structure the dedup/corpus operators are built around, all
from pure hash expressions (no randomness, no network, reproducible
byte-for-byte):

- 1% of docs carry one of 4 SHORT (exactly 8-word) boilerplate header
  variants (~1250 docs each): 2 exact 4-word segments (segment-dedup
  hot list fires at min_docs=3), ~16 40-char windows shared by ~1250
  docs > doc_cap=1000 (the substring-span cap guard fires, as
  designed), ONE 8-gram word shingle > df_cap=1000 (the contamination
  guard fires). Both the brevity and the small population are
  load-bearing for RAW minhash-LSH: a shared header's shingle hashes
  are FIXED values, so across 16 permutations some header minimum
  always undercuts most bodies' minima and its band bucket collapses to
  ~the variant population — making the candidate OUTPUT (quadratic in
  bucket size by contract) explode. The first 100x attempt (20-word
  headers, 30% of docs, 32 variants) measured 56M candidate pairs and
  died spilling a single-task sort; 8 words x 8 variants at 30% still
  measured 122M. At 1% x 4 variants even a fully-collapsed band bucket
  is ~1250 docs (~0.8M pairs) — bounded. The df_cap'd cascade path is
  immune (hot shingles never enter its signatures); real deployments
  run THAT on boilerplate-bearing text. scale_diag.py checks the
  generated bucket distribution before a run.
- every 20th doc is an EXACT body-duplicate of its predecessor (md5
  fingerprint dedup, bloom chase, LSH/minhash/prefix candidates, CC
  edges: ~5% duplication, pair count linear in N).
- everything else is a unique word sequence over a shared 30k-word
  vocabulary (realistic shingle/df distributions without quadratic pair
  blowup).

Usage: python plans/r16/scale_gen.py <out_dir> [scale] [files]
Writes <out_dir>/documents.parquet as `files` parquet files so
parallelize_scan's multi-file branch (no repartition) is what the scale
runs measure.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F  # noqa: E402

from ctcityscraper_spark.session import get_spark  # noqa: E402

BASE_DOCS = 5000  # sf0.1 documents row count
N_BOILER_VARIANTS = 4


def main() -> None:
    out_dir = sys.argv[1]
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    files = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n = BASE_DOCS * scale
    spark = get_spark(app_name="scale_gen", master="local[32]",
                      shuffle_partitions=32)
    ids = spark.range(0, n, 1, 32).select(F.col("id").alias("doc_id"))
    # every 20th doc clones the body of its predecessor — exact duplicate
    base = F.when(
        (F.col("doc_id") % 20 == 19) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    n_words = (F.pmod(F.xxhash64(base, F.lit("len")), F.lit(60)) + 40).cast(
        "int"
    )
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(base * 1009 + j.cast("long"), F.lit("scale")),
                    F.lit(30000),
                ).cast("string"),
            ),
        ),
        " ",
    )
    hid = F.pmod(F.xxhash64("doc_id", F.lit("boiler")), F.lit(N_BOILER_VARIANTS)).cast(
        "string"
    )
    # exactly 8 words (2 exact 4-word segments), ~46 chars: "TERMS
    # variant<h> rights reserved admin site<h> mirroring policy "
    boiler = F.concat(
        F.lit("TERMS variant"), hid,
        F.lit(" rights reserved admin site"), hid,
        F.lit(" mirroring policy "),
    )
    text = F.when(F.col("doc_id") % 100 < 1, F.concat(boiler, body)).otherwise(
        body
    )
    docs = ids.select(
        "doc_id",
        text.alias("text"),
        F.when(F.pmod(F.xxhash64("doc_id", F.lit("lang")), F.lit(10)) < 7,
               F.lit("en")).otherwise(F.lit("de")).alias("lang"),
        F.concat(
            F.lit("s"),
            F.pmod(F.xxhash64("doc_id", F.lit("src")), F.lit(5)).cast("string"),
        ).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    (
        docs.repartition(files, "doc_id")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )
    stats = spark.read.parquet(f"{out_dir}/documents.parquet").agg(
        F.count("*"), F.sum(F.length("text"))
    ).first()
    print(f"wrote {stats[0]} docs, {stats[1]} text bytes, {files} files")


if __name__ == "__main__":
    main()
