"""Benchmark runner: headline catalog queries at $SPARK_GRAFT_SF_DIR.

The LAST stdout line is the primary record — ONE compact JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}``

Record layout (round-14: the r13 primary line grew past the driver's
2000-char tail capture and the official BENCH_r13.json landed with
``parsed: null``): the primary line now carries only the load-bearing
fields — raw per-query seconds, the three calibration scalars, the
anomaly list, and ``comparable_subtotal`` — and is length-guarded under
:data:`PRIMARY_LINE_BUDGET`. Everything derivable or diagnostic
(``queries_normalized`` = queries / calibration_sec;
``calibration_track``) moves to a PRECEDING ``bench_diagnostics`` line
and to the ``BENCH_FULL_LATEST.json`` sidecar at the repo root, which
holds the complete merged record for the judge.

Each query is executed twice: a warm-up is NOT used (cold numbers are the
honest ones at this scale); timing covers plan + execution + a count-style
materialization of the full result.

Error policy (round-3 lesson: one analysis error must never zero a whole
round's trend line): per-query failures land in an ``errors`` map, a query
whose first trial succeeded keeps its best completed timing even if a later
trial throws, and ``"partial": true`` flags any total computed with errors
present so round-over-round totals are never silently incomparable.

Self-normalization (round-7): boot-to-boot VM variance (measured ±40 % on
identical code) broke cross-round comparability of raw seconds, so a fixed
pure-CPU calibration job is timed first and every query is reported both
raw (``queries``/``value``) and divided by it (``queries_normalized``/
``value_normalized`` — unitless machine-relative cost; read trends off
these).

Two-term boot model (round-14, after r13's +12 % phantom regression on
git-identical code): a boot's cost has a per-query FIXED component (job
submission, planning, parquet-reader init, commit protocol) and a
VARIABLE compute rate, and they move independently — on the r13 driver
boot fixed overhead grew ~2x while the CPU calibration grew only 1.23x,
so the single-scalar normalization undercorrected and identical plans
read as slower.  :func:`calibrate_probe` times a FROZEN overhead-
dominated probe job each round (``probe_sec`` — the fixed-cost axis,
never change the probe's plan), and ``comparable_subtotal`` gains
``value_affine`` = sum(max(raw_q - probe_sec, 0)) / calibration_sec:
each query is charged one fixed-overhead quantum priced by the probe,
and only the remaining variable part is normalized by the CPU rate.
Methodology + validation in SCALE.md ("Cross-boot normalization").
"""

from __future__ import annotations

import json
import os
import re
import time


def calibrate(spark, trials: int = 3, rows: int = 256_000_000) -> float:
    """Fixed pure-CPU calibration workload — the round-over-round
    normalizer. The VM these rounds run on varies boot-to-boot (measured
    ±40 % on identical code), so raw seconds no longer measure the code.
    This times a constant, I/O-free Spark job (a 32-partition xxhash64
    fold over ``spark.range`` — whole-stage codegen, no shuffle, no
    Python workers, no disk) whose cost moves with the machine, not the
    repo; dividing query seconds by it cancels the machine. Min of
    ``trials`` runs, GC drained before each — same policy as
    :func:`time_query`."""
    best = None
    for _ in range(trials):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        # bit_xor, not sum: a long sum of `rows` (256M by default)
        # uniform 64-bit hashes overflows under Spark 4's ANSI mode
        spark.range(0, rows, 1, 32).selectExpr(
            "bit_xor(xxhash64(id, xxhash64(id, 42))) as s"
        ).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 4)


def calibrate_shuffle(spark, trials: int = 3, rows: int = 32_000_000) -> float:
    """Secondary calibration: a fixed SHUFFLE-shaped job (hash groupBy of
    ``rows`` longs into 100k keys). The pure-CPU calibration above prices
    raw compute but not the exchange/serialization path, and the two move
    independently across boots (r8: a boot 12 % faster on the CPU job
    showed ~+7 % on calibration-normalized totals for UNTOUCHED queries —
    normalization sensitivity, not regression). This field gives future
    rounds the second axis to separate those cases; it does NOT change
    the existing normalized metrics, which stay defined against the CPU
    job for cross-round continuity."""
    best = None
    for _ in range(trials):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        spark.range(0, rows, 1, 32).selectExpr("id % 100003 AS k").groupBy(
            "k"
        ).count().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 4)


def calibrate_probe(spark, sf_dir: str, trials: int = 3) -> float:
    """FROZEN fixed-overhead probe — the second axis of the two-term boot
    model (see module docstring). A deliberately tiny end-to-end job whose
    cost is ~all per-query fixed overhead (driver round-trip, planning,
    parquet reader init, noop commit) and ~no data work: scan the 5-row
    region table, filter, project, noop-write. Same shape as a timed
    query (``fn(spark, sf_dir)`` + noop write) so it prices the same
    fixed path the queries pay.

    NEVER change this plan: ``probe_sec`` is only meaningful across
    rounds if the probe is byte-identical round to round. Min of
    ``trials``, GC drained before each — same policy as
    :func:`calibrate`."""
    best = None
    for _ in range(trials):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        (
            spark.read.parquet(f"{sf_dir}/region.parquet")
            .filter("r_regionkey >= 0")
            .selectExpr("r_regionkey", "upper(r_name) AS r_name_u")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 4)


# The query set of the PREVIOUS round's BENCH_r{N}.json (update at round
# close when the headline set changes). build_output emits a
# ``comparable_subtotal`` over exactly this set — raw and normalized —
# so BENCH_rN vs BENCH_rN-1 is one field-to-field read instead of hand
# adjudication of which queries both rounds share and how calibration
# moved between boots.
PRIOR_ROUND = "r14"
PRIOR_ROUND_QUERY_SET = [
    "ann_cosine_topk_vectorized", "ann_kmeans_centroids",
    "ann_pq_retrain_cycle", "corpus_e2e_prep", "corpus_segment_dedup",
    "corpus_substring_spans", "dedup_bloom_chase",
    "dedup_bloom_membership", "dedup_groups_connected",
    "dedup_minhash_lsh", "dedup_prefix_filter_join",
    "events_tumbling_6h", "ingest_load_2000",
    "join_agg_by_segment", "pricing_summary", "scd2_latest_state",
    "subq_outer_join_order_counts", "top_revenue_orders",
]

# Headline queries promoted THIS round: not in the prior set, so they
# never pollute comparable_subtotal; recorded explicitly so the set
# growth is visible in the JSON rather than inferred by diffing rounds.
# r15: text_bpe_train. r16: the two streaming-twin entries (VERDICT r15
# item 7 — the streaming surface was never benched), timed like
# ingest_load_2000 as bench-local pipelines rather than catalog queries:
# streaming_corpus_prep_3b drives the full prep DAG over 3 availableNow
# micro-batches (one mid-run compaction) on a deterministic quarter of
# the documents table; streaming_bloom_membership_3b drives the two-tier
# dedup state twin over 3 micro-batches + compaction and finishes with a
# layered zone read (compacted epoch + tail deltas) serving a full-table
# probe.
NEW_HEADLINE_QUERIES: list[str] = [
    "text_bpe_train",
    "streaming_corpus_prep_3b",
    "streaming_bloom_membership_3b",
]

# In the headline set and in the prior round's record, but EXCLUDED from
# this round's comparable subtotal because the query's SEMANTICS changed
# between the rounds (the r14 case: corpus_e2e_prep gained the DSIR
# selection stage). r15: empty — no headline query's semantics changed.
SEMANTICS_CHANGED_EXCLUDED: list[str] = []

# Expected normalized cost per query (multiples of the fixed CPU
# calibration job) — the anomaly-detection reference, NOT a metric input.
# Values: the r11 verdict's clean rerun at the same HEAD/sf (calibration
# 0.234 s) for the four queries r11's official record caught during a
# degraded window, r11's own record for everything it measured at
# historical levels, and this round's local measurement for the two new
# headliners. The r11 lesson: a boot-local pressure window (page-cache /
# GC debt from whatever ran before bench) can triple a handful of queries
# while the start-of-run calibration — taken BEFORE the queries — sees
# nothing. A query whose normalized cost lands >2x its expectation gets a
# drain + re-trial, and if it STILL deviates it is flagged in
# ``anomalous`` so the record self-diagnoses instead of needing hand
# adjudication (which r10 and r11 both needed).
ANOMALY_FACTOR = 2.0
EXPECTED_NORMALIZED = {
    # r13 refresh: midpoint of the r12 record (calibration 0.273) and
    # this round's clean run (calibration 0.233) — two boots, same code
    # for the shared set
    "pricing_summary": 3.1,
    "join_agg_by_segment": 2.3,
    "scd2_latest_state": 1.8,
    "events_tumbling_6h": 1.7,
    "top_revenue_orders": 3.2,
    "dedup_bloom_membership": 5.5,
    "dedup_bloom_chase": 6.6,
    "dedup_minhash_lsh": 4.6,
    "dedup_groups_connected": 9.3,
    "ann_cosine_topk_vectorized": 1.9,
    "corpus_segment_dedup": 4.5,
    "corpus_substring_spans": 8.1,
    "subq_outer_join_order_counts": 1.5,
    "ingest_load_2000": 4.9,
    # fused hot-list/dfreq aggregation this round (3.56 -> 3.06 s raw)
    "dedup_prefix_filter_join": 13.1,
    # r14 refresh: the DSIR selection stage landed this round and the
    # r13 driver record + this round's fresh-process measurement agree
    # at ~42 normalized (41.98 at cal 0.338 / 42.02 at cal 0.422 — the
    # new stage's model-sized legs are absorbed; SCALE.md r14 table)
    "corpus_e2e_prep": 42.0,
    # r13 promotion: detect -> retrain -> verify (two sample-bounded
    # codebook trainings + two fixed-point drift legs), measured 2.7 s
    # raw at calibration 0.233
    "ann_pq_retrain_cycle": 11.8,
    # r13 promotion: fixed-point Lloyd fit (2 iters: per-iter scan-stage
    # argmin + k-row mergeable groupBy) + full-grid population audit,
    # measured 2.83/3.06 s raw on two runs at calibration ~0.27
    "ann_kmeans_centroids": 10.9,
    # r15 promotion: BPE training — one corpus word-freq scan + 4
    # vocab-sized merge iterations, measured 2.32 s raw at calibration
    # 0.476 (fresh process, sf0.1)
    "text_bpe_train": 4.9,
}


def _split_stream_source(spark, sf_dir: str, src: str, n: int = 3,
                         modulus: int | None = None) -> None:
    """Deterministic n-way doc_id-range split of the documents table into
    one parquet file-batch per directory — the micro-batch fixture for the
    streaming bench entries. Distinct mtimes are stamped explicitly (the
    file source orders by modification time) so the batch composition is
    reproducible without sleeping."""
    import glob

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if modulus:
        docs = docs.filter(F.col("doc_id") % modulus == 0)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    step = (hi - lo + n) // n
    for i in range(n):
        part = docs.filter(
            (F.col("doc_id") >= lo + i * step)
            & (F.col("doc_id") < lo + (i + 1) * step)
        )
        part.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
        for p in glob.glob(f"{src}/b{i}/*.parquet"):
            os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))


_STREAM_SRC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _streaming_prep_trial(spark, sf_dir: str) -> float:
    """One cold streaming_corpus_prep run: full DAG (boilerplate ->
    bloom-chased dedup -> contamination -> quality gate -> DSIR gate ->
    pack continuation), 3 availableNow micro-batches over a deterministic
    quarter of the documents table, compaction at batch 2, fresh zone +
    checkpoint dirs each trial (no state survives — every trial computes
    from the parquet input)."""
    import shutil
    import tempfile

    from ctcityscraper_spark.streaming.events import (
        stream_from_directory,
        streaming_corpus_prep,
    )

    td = tempfile.mkdtemp(prefix="bench_sprep_")
    try:
        _split_stream_source(spark, sf_dir, f"{td}/incoming", modulus=4)
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        stream = stream_from_directory(
            spark, f"{td}/incoming/b*", _STREAM_SRC_SCHEMA,
            max_files_per_trigger=1,
        )
        q = streaming_corpus_prep(
            stream, f"{td}/prep", f"{td}/ckpt",
            compact_every=2, quality_gate=True,
            dsir_gate=True, dsir_target="lang = 'en'",
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("streaming_corpus_prep did not drain in 600s")
        # materialize the run's ledger: stats row count pins 3 batches ran
        n_stats = spark.read.parquet(f"{td}/prep/stats").count()
        if n_stats != 3:
            raise AssertionError(f"expected 3 stats rows, got {n_stats}")
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(td, ignore_errors=True)


def _streaming_bloom_trial(spark, sf_dir: str) -> float:
    """One cold streaming_bloom_membership run over the full documents
    table in 3 micro-batches (compaction at batch 2, saturation stats),
    finished by the layered keyed-state read: the merged word zone
    (compacted epoch + post-epoch delta) probed by the whole table."""
    import shutil
    import tempfile

    from ctcityscraper_spark.operators.dedup import bloom_might_contain
    from ctcityscraper_spark.streaming.events import (
        read_bloom_words,
        stream_from_directory,
        streaming_bloom_membership,
    )

    m_bits, k = 1 << 16, 5
    td = tempfile.mkdtemp(prefix="bench_sbloom_")
    try:
        _split_stream_source(spark, sf_dir, f"{td}/incoming")
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        stream = stream_from_directory(
            spark, f"{td}/incoming/b*", _STREAM_SRC_SCHEMA,
            max_files_per_trigger=1,
        )
        q = streaming_bloom_membership(
            stream, f"{td}/words", f"{td}/flags", f"{td}/ckpt",
            m_bits, k, compact_every=2, stats_dir=f"{td}/stats",
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("streaming_bloom did not drain in 600s")
        bloom = read_bloom_words(spark, f"{td}/words")
        flagged = (
            bloom_might_contain(
                spark.read.parquet(f"{sf_dir}/documents.parquet"),
                bloom, m_bits, k,
            )
            .filter("might_contain")
            .count()
        )
        if flagged <= 0:
            raise AssertionError("probe found no ingested docs")
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(td, ignore_errors=True)


def time_query(spark, fn, sf_dir: str, max_trials: int = 3) -> tuple[float | None, str | None]:
    """Best-of-2 cold trials — 3 when the first two disagree badly OR the
    query costs 1-10 s (the band where the r11 boot-pressure anomaly
    lived: expensive enough that a single GC/container hiccup moves the
    round-over-round trend line, cheap enough that a third trial is
    nearly free; >10 s queries amortize hiccups across many stages and
    tripling them costs real minutes); returns
    (best_seconds | None, error | None). A single local[32] run is
    vulnerable to such hiccups; the min is the honest steady-state cost
    of the plan. If any trial completed, its best timing survives a
    later trial's failure (the error is still reported)."""
    runs: list[float] = []
    err: str | None = None
    try:
        while (
            len(runs) < 2
            or (len(runs) == 2 and abs(runs[0] - runs[1]) > 0.25 * min(runs))
            or (len(runs) == 2 and 1.0 < min(runs) <= 10.0)
        ):
            if len(runs) >= max_trials:
                break
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
            df = fn(spark, sf_dir)
            # materialize every row (not just count — forces full
            # evaluation of all projected expressions) without
            # driver-collect overhead
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
    except Exception as exc:  # noqa: BLE001 — report and keep going
        err = f"{type(exc).__name__}: {exc}"[:300]
    best = round(min(runs), 4) if runs else None
    return best, err


def _drain(spark) -> None:
    """Clear cached frames and drain JVM garbage twice — the recovery
    primitive before an anomaly re-trial (the first GC can promote, the
    second collects; measured to matter on the 128 GiB heap)."""
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.5)
    spark.sparkContext._jvm.System.gc()


def run_headline(
    spark, sf_dir: str, queries, calibration_sec: float | None = None
) -> tuple[dict, dict, dict, list]:
    """Time every headline query; returns (timings, errors,
    calibration_track, anomalous). A query can appear in BOTH of the
    first two maps (valid best timing + a later-trial error).

    Anomaly policy (r11 lesson — a boot-local pressure window tripled 4
    queries while the start-of-run calibration saw nothing, and the raw
    record needed hand adjudication for the second round running): after
    each query a 1-trial CPU calibration reprices the boot AT THAT POINT
    (``calibration_track``), and a query whose cost exceeds
    ``ANOMALY_FACTOR`` x its :data:`EXPECTED_NORMALIZED` entry under BOTH
    the start-of-run and the local calibration gets one drain + re-trial;
    the overall best survives. Still deviant after recovery -> the name
    lands in ``anomalous`` so the JSON self-diagnoses. A genuinely slower
    boot inflates the local calibration too and is NOT flagged; a
    genuinely slower plan (changed code) is exactly what SHOULD be
    flagged for the judge to adjudicate against git."""
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    calibration_track: dict[str, float] = {}
    anomalous: list[str] = []
    for name, q in queries.items():
        if not q.headline:
            continue
        best, err = time_query(spark, q.fn, sf_dir)
        cal_now = calibrate(spark, trials=1)
        calibration_track[name] = cal_now
        exp = EXPECTED_NORMALIZED.get(name)
        if (
            best is not None
            and exp is not None
            and calibration_sec
            and best / calibration_sec > ANOMALY_FACTOR * exp
            and best / cal_now > ANOMALY_FACTOR * exp
        ):
            _drain(spark)
            best2, err2 = time_query(spark, q.fn, sf_dir, max_trials=2)
            if best2 is not None:
                best = min(best, best2)
            if err2 is not None and err is None:
                err = err2
            cal_now = calibrate(spark, trials=1)
            calibration_track[name] = cal_now
            if best / calibration_sec > ANOMALY_FACTOR * exp and (
                best / cal_now > ANOMALY_FACTOR * exp
            ):
                anomalous.append(name)
        if best is not None:
            timings[name] = best
        if err is not None:
            errors[name] = err
    return timings, errors, calibration_track, anomalous


# Hard budget for the primary (final) stdout line. The driver records
# only the last 2000 chars of bench stdout; r13's single line hit ~2400
# chars and the official record landed with ``parsed: null``. 1900
# leaves headroom for the trailing newline and capture slack.
PRIMARY_LINE_BUDGET = 1900


def build_output(
    timings: dict,
    errors: dict,
    sf,
    calibration_sec: float | None = None,
    calibration_shuffle_sec: float | None = None,
    calibration_track: dict | None = None,
    anomalous: list | None = None,
    probe_sec: float | None = None,
) -> tuple[dict, dict]:
    """Returns ``(primary, diagnostics)``. ``primary`` is the compact
    final-line record the driver parses (length-guarded against
    :data:`PRIMARY_LINE_BUDGET`); ``diagnostics`` carries everything
    derivable or advisory and is printed as a preceding line + written
    to the ``BENCH_FULL_LATEST.json`` sidecar."""
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # explicit schema field: a total summed over fewer queries than the
        # full headline set must never read as a round-over-round speedup
        "comparable": not errors,
    }
    diagnostics: dict = {"record": "bench_diagnostics"}
    if calibration_sec:
        # raw seconds AND machine-normalized ratios: cross-round trends
        # should be read off the normalized numbers (unit: multiples of
        # the fixed CPU calibration job on the same boot), raw seconds
        # stay for within-round comparisons. Per-query normalized values
        # are derivable (queries / calibration_sec) and live in the
        # diagnostics record only — r13 lesson: they doubled the primary
        # line and cost the round its parsed record.
        out["calibration_sec"] = calibration_sec
        out["value_normalized"] = round(out["value"] / calibration_sec, 4)
        diagnostics["queries_normalized"] = {
            k: round(v / calibration_sec, 4) for k, v in timings.items()
        }
    if calibration_shuffle_sec:
        # second normalization axis (shuffle/exchange path) — recorded,
        # not used in the normalized metrics, so trends stay continuous
        out["calibration_shuffle_sec"] = calibration_shuffle_sec
    if probe_sec is not None:
        # fixed-overhead axis of the two-term boot model (module
        # docstring): the frozen probe's cost on THIS boot
        out["probe_sec"] = probe_sec
    if calibration_track:
        # per-query boot repricing (1-trial CPU calibration taken right
        # after each query): lets a reader see a mid-run pressure window
        # the start-of-run calibration cannot — diagnostic only, the
        # normalized metrics stay defined on calibration_sec
        diagnostics["calibration_track"] = calibration_track
    # always present so its absence can never be read as "not checked":
    # names whose cost stayed >ANOMALY_FACTOR x EXPECTED_NORMALIZED even
    # after a drain + re-trial under BOTH calibrations (see run_headline)
    out["anomalous"] = sorted(anomalous or [])
    # round-over-round comparable subtotal: the sum over EXACTLY the
    # prior round's query set, only when every one of them completed —
    # the one-field answer to "did shared code get faster or slower"
    prior = {
        n: timings[n]
        for n in PRIOR_ROUND_QUERY_SET
        if n in timings and n not in SEMANTICS_CHANGED_EXCLUDED
    }
    expected = [
        n for n in PRIOR_ROUND_QUERY_SET if n not in SEMANTICS_CHANGED_EXCLUDED
    ]
    if len(prior) == len(expected):
        out["comparable_subtotal"] = {
            "vs_round": PRIOR_ROUND,
            "n_queries": len(prior),
            "value": round(sum(prior.values()), 4),
            # the headline set GREW this round: the total above includes
            # these names, this subtotal (and the prior round's total)
            # does not — read trends off the subtotal
            "new_queries_excluded": sorted(
                set(NEW_HEADLINE_QUERIES) & set(timings)
            ),
            # in both rounds' sets but semantics changed this round —
            # excluded so the subtotal stays like-for-like (see the
            # SEMANTICS_CHANGED_EXCLUDED comment)
            "semantics_changed_excluded": sorted(
                set(SEMANTICS_CHANGED_EXCLUDED) & set(timings)
            ),
        }
        if calibration_sec:
            out["comparable_subtotal"]["value_normalized"] = round(
                sum(prior.values()) / calibration_sec, 4
            )
        if calibration_sec and probe_sec is not None:
            # two-term corrected subtotal (module docstring): charge each
            # query one fixed-overhead quantum (probe_sec) and normalize
            # only the variable remainder by the CPU rate. On a boot
            # where fixed overhead inflates 2x but compute only 1.2x
            # (the r13 driver boot), this stays flat where
            # value_normalized reads +12 % on identical code.
            out["comparable_subtotal"]["value_affine"] = round(
                sum(max(v - probe_sec, 0.0) for v in prior.values())
                / calibration_sec,
                4,
            )
        # same flagging policy as the headline total: a prior-set query
        # that kept a first-trial timing but errored on a later trial
        # may carry an anomalous single-trial number — never let that
        # read as a clean round-over-round speedup
        bad = sorted(set(PRIOR_ROUND_QUERY_SET) & set(errors))
        if bad:
            out["comparable_subtotal"]["partial"] = True
            out["comparable_subtotal"]["errored_queries"] = bad
    if errors:
        # the total is NOT round-comparable when any query errored out —
        # flag it rather than letting a smaller sum read as a speedup
        out["errors"] = errors
        out["partial"] = True
    # Length guard: the primary line MUST parse from a 2000-char tail
    # capture. Demote optional fields (never the required schema:
    # metric/value/unit/queries/sf) to diagnostics until it fits.
    for field in ("errors", "comparable_subtotal", "anomalous"):
        if len(json.dumps(out)) <= PRIMARY_LINE_BUDGET:
            break
        if field in out:
            diagnostics[field] = out.pop(field)
            diagnostics.setdefault("demoted_for_length", []).append(field)
    return out, diagnostics


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

    # calibrate AFTER warmup, BEFORE the queries: one fixed CPU job that
    # prices this boot's hardware so cross-round numbers stay comparable
    calibration_sec = calibrate(spark)
    calibration_shuffle_sec = calibrate_shuffle(spark)
    probe_sec = calibrate_probe(spark, sf_dir)

    timings, errors, calibration_track, anomalous = run_headline(
        spark, sf_dir, QUERIES, calibration_sec
    )

    # ingestion throughput: the reference's own headline metric is
    # entries/sec through load (engine.py:347-348) — 2000 entries through
    # the full distributed-flatten pipeline incl. stamping + compaction
    import tempfile

    from ctcityscraper_spark.engine import run_load
    from ctcityscraper_spark.sources.contracts import ResolvedParams
    from ctcityscraper_spark.sources.demo import SOURCE
    from ctcityscraper_spark.sources.store import ParquetStore

    def _ingest_trial() -> float:
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
        return time.perf_counter() - t0

    # best of 2 (fresh store each run): the first load pays mapInPandas
    # worker-pool and codegen warmup that isn't the pipeline's cost
    ingest_runs: list[float] = []
    try:
        for _ in range(2):
            ingest_runs.append(_ingest_trial())
    except Exception as exc:  # noqa: BLE001
        errors["ingest_load_2000"] = f"{type(exc).__name__}: {exc}"[:300]
    if ingest_runs:
        best = round(min(ingest_runs), 4)
        # same anomaly policy as run_headline — ingest is in the prior
        # round's comparable set, so an unflagged boot-pressure window
        # here would move comparable_subtotal with no diagnosis
        cal_now = calibrate(spark, trials=1)
        calibration_track["ingest_load_2000"] = cal_now
        exp = EXPECTED_NORMALIZED.get("ingest_load_2000")
        if (
            exp is not None
            and calibration_sec
            and best / calibration_sec > ANOMALY_FACTOR * exp
            and best / cal_now > ANOMALY_FACTOR * exp
        ):
            _drain(spark)
            try:
                best = min(best, round(_ingest_trial(), 4))
            except Exception as exc:  # noqa: BLE001
                errors.setdefault(
                    "ingest_load_2000", f"{type(exc).__name__}: {exc}"[:300]
                )
            cal_now = calibrate(spark, trials=1)
            calibration_track["ingest_load_2000"] = cal_now
            if best / calibration_sec > ANOMALY_FACTOR * exp and (
                best / cal_now > ANOMALY_FACTOR * exp
            ):
                anomalous.append("ingest_load_2000")
        timings["ingest_load_2000"] = best

    # streaming-twin entries (r16, VERDICT r15 item 7): bench-local
    # pipelines like ingest_load_2000 — fresh zone/checkpoint dirs per
    # trial, best of 2, same anomaly repricing policy
    for s_name, s_fn in (
        ("streaming_corpus_prep_3b", _streaming_prep_trial),
        ("streaming_bloom_membership_3b", _streaming_bloom_trial),
    ):
        s_runs: list[float] = []
        try:
            for _ in range(2):
                s_runs.append(s_fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            errors[s_name] = f"{type(exc).__name__}: {exc}"[:300]
        if not s_runs:
            continue
        best = round(min(s_runs), 4)
        cal_now = calibrate(spark, trials=1)
        calibration_track[s_name] = cal_now
        exp = EXPECTED_NORMALIZED.get(s_name)
        if (
            exp is not None
            and calibration_sec
            and best / calibration_sec > ANOMALY_FACTOR * exp
            and best / cal_now > ANOMALY_FACTOR * exp
        ):
            _drain(spark)
            try:
                best = min(best, round(s_fn(spark, sf_dir), 4))
            except Exception as exc:  # noqa: BLE001
                errors.setdefault(
                    s_name, f"{type(exc).__name__}: {exc}"[:300]
                )
            cal_now = calibrate(spark, trials=1)
            calibration_track[s_name] = cal_now
            if best / calibration_sec > ANOMALY_FACTOR * exp and (
                best / cal_now > ANOMALY_FACTOR * exp
            ):
                anomalous.append(s_name)
        timings[s_name] = best

    primary, diagnostics = build_output(
        timings,
        errors,
        sf,
        calibration_sec,
        calibration_shuffle_sec,
        calibration_track,
        anomalous,
        probe_sec,
    )
    # Full merged record to the sidecar (committed at round close) so the
    # judge gets every field even though the driver captures only a
    # 2000-char stdout tail.
    full = dict(primary)
    full.update({k: v for k, v in diagnostics.items() if k != "record"})
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_FULL_LATEST.json"),
        "w",
    ) as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    # diagnostics line FIRST — the primary record must be the last line
    print(json.dumps(diagnostics))
    line = json.dumps(primary)
    print(line)


if __name__ == "__main__":
    main()
