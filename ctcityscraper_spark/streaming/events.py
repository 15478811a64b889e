"""Structured Streaming: the reference's micro-batch semantics, first-class.

The reference hand-rolls a micro-batch stream (buffer -> flush every
batch_size -> checkpoint, SURVEY §2.10 T1-T3). Structured Streaming gives the
same contract natively: file-source micro-batches, checkpointLocation for
exactly-once offsets, and ``foreachBatch`` for the stamp+append sink.

These wrappers expose:
- ``stream_from_directory``: parquet-directory stream (the append-only table
  layout IS a stream of files)
- ``tumbling_window_agg`` / ``sliding_window_counts``: event-time windows
  with watermark-bounded state
- ``write_scd2_stream``: foreachBatch sink stamping scraped_at/row_hash and
  appending via ParquetStore — the streaming twin of engine.run_load
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ctcityscraper_spark.sources.store import ParquetStore


def stream_from_directory(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Parquet directory as a micro-batch stream (source throttling via
    maxFilesPerTrigger — the reference's batch_size analogue, T1/T4)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_window_agg(
    events: DataFrame,
    window_duration: str = "6 hours",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time tumbling window counts+sums with late-data watermark.

    Batch twin under the oracle gate: plans/queries.events_tumbling_6h.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


def sliding_window_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping event-time windows (no reference analogue — extension)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration, slide), "user_id")
        .agg(F.count("*").alias("n"))
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state (T3's streaming twin).

    ``dropDuplicatesWithinWatermark`` keeps one row per key and EVICTS key
    state older than the watermark — the property that makes streaming
    dedup viable at 100 TB/day: state is bounded by the watermark horizon,
    not by total history. (The batch refresh dedup in store.write_batch
    keeps all-history hashes instead; that is the reference's semantics
    for slowly-changing scraped tables, while this is the right contract
    for high-volume append streams.)
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    within: str = "interval 6 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join with a time-range bound.

    Both sides buffer only ``watermark + within`` of state (Spark derives
    the eviction condition from the range predicate) — the standard
    enrichment-join contract: unbounded streams, bounded state.
    """
    l_ts, r_ts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return left.alias("l").withWatermark(left_ts, watermark).join(
        right.alias("r").withWatermark(right_ts, watermark),
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (r_ts >= l_ts)
        & (r_ts <= l_ts + F.expr(within)),
    )


def write_scd2_stream(
    stream: DataFrame,
    store: ParquetStore,
    table: str,
    checkpoint_dir: str,
    dedup_against_existing: bool = False,
):
    """foreachBatch sink: stamp metadata + append (+ optional refresh dedup).

    Exactly-once-per-batch via the streaming checkpoint — the principled
    version of the reference's JSON checkpoint (T2). Returns the
    StreamingQuery handle; caller stops it.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.write_batch(table, batch_df, dedup_against_existing=dedup_against_existing)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_incremental_spans(
    stream: DataFrame,
    docs_dir: str,
    index_dir: str,
    spans_dir: str,
    checkpoint_dir: str,
    width: int | None = None,
    doc_cap: int | None = None,
    pair_within_batch: bool = True,
):
    """Streaming exact-substring dedup against a growing stored index.

    The production shape for a continuously-ingested corpus: each
    micro-batch of new documents is checked for duplicated spans against
    the STORED hashed window index (operators/corpus.substring_windows
    ``hashed=True`` — 16 B/window parquet), matched spans append to
    ``spans_dir``, and the batch's own windows + texts then extend the
    index, so later batches dedup against everything before them. With
    ``pair_within_batch`` (default) the batch is also self-paired, so two
    duplicates arriving in the SAME micro-batch are caught too — their
    spans land with the lower id as ``corpus_doc`` (the kept occurrence,
    matching cut_duplicate_spans' keep-lowest policy). Exactness via the
    span-level fetch-and-verify against the stored corpus texts.

    Exactly-once end-to-end: the streaming checkpoint skips completed
    batches, and every write lands in a ``batch_id=N`` partition with
    mode=overwrite, so a crash-and-replay of an in-flight batch rewrites
    its own partitions instead of appending duplicates (the standard
    foreachBatch idempotence recipe). Readers just read the parent dirs —
    ``batch_id`` surfaces as a partition column recording lineage.
    Returns the StreamingQuery handle; caller stops it.
    """
    from pathlib import Path

    from pyspark.sql import functions as SF

    from ctcityscraper_spark.operators.corpus import (
        SPAN_DOC_CAP,
        SPAN_WINDOW_CHARS,
        duplicate_substring_spans,
        incremental_substring_spans,
        substring_windows,
    )

    w = width or SPAN_WINDOW_CHARS
    cap = doc_cap if doc_cap is not None else SPAN_DOC_CAP
    out_cols = [
        "new_doc", "corpus_doc", "start_new", "start_corpus",
        "span_len", "n_windows",
    ]

    def _put(df: DataFrame, base: str, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{base}/batch_id={batch_id}")

    def _index_frames(base: str, before_batch: int):
        # only batches strictly BEFORE this one: a replayed batch must not
        # join against its own half-written previous attempt
        return [
            p for p in Path(base).glob("batch_id=*")
            if int(p.name.split("=", 1)[1]) < before_batch and any(p.glob("*.parquet"))
        ]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            spans = None
            prior = _index_frames(index_dir, batch_id)
            if prior:
                spans = incremental_substring_spans(
                    batch_df,
                    corpus_docs=spark.read.parquet(
                        *[str(p) for p in _index_frames(docs_dir, batch_id)]
                    ),
                    corpus_windows=spark.read.parquet(*[str(p) for p in prior]),
                    width=w,
                    doc_cap=cap,
                    bucket_by_hash=True,
                ).select(*out_cols)
            if pair_within_batch:
                within = duplicate_substring_spans(
                    batch_df, width=w, doc_cap=cap, bucket_by_hash=True
                ).select(
                    SF.col("doc_b").alias("new_doc"),
                    SF.col("doc_a").alias("corpus_doc"),
                    SF.col("start_b").alias("start_new"),
                    SF.col("start_a").alias("start_corpus"),
                    "span_len",
                    "n_windows",
                )
                spans = within if spans is None else spans.unionByName(within)
            if spans is not None:
                _put(spans, spans_dir, batch_id)
            _put(batch_df.select("doc_id", "text"), docs_dir, batch_id)
            _put(
                substring_windows(batch_df, width=w, hashed=True),
                index_dir,
                batch_id,
            )
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
