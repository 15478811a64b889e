"""ctcityscraper_spark — a PySpark-native ingest-and-version analytics engine.

Re-expresses the capabilities of carlospreising/ctcityscraper (a web-scraping
ingestion engine landing append-only Parquet with query-time SCD2 versioning)
as an idiomatic Spark engine:

- ``functions``  : canonical column expressions (coercions, row-hash, uuid)
- ``sources``    : Parquet store (append/scan/compact/checkpoint), HTTP/SODA
                   source contracts, rate limiting
- ``operators``  : SCD2 views (current/history/changed-since), dedup family
                   (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding),
                   similarity search, text analysis, multimodal plumbing
- ``engine``     : load/refresh orchestration (the reference's run_load /
                   run_refresh re-expressed over DataFrames)
- ``streaming``  : Structured Streaming wrappers over the same semantics
- ``plans``      : the query catalog used by __spark_entry__ / bench

Design stance (SURVEY.md §7): DataFrames everywhere, no RDDs; storage is plain
Parquet directories ``data/<scope>/<table>/*.parquet`` (append-only) to match
the reference's semantics; all versioning is derived at query time with window
functions; Catalyst does the optimizing.
"""

__version__ = "0.1.0"
