"""Release contract for operator-persisted artifacts.

Several operators persist reusable artifacts for the life of the session
(documented in their docstrings): the LSH band index
(``dedup.minhash_lsh_pairs`` / ``_lsh_band_pairs``), the cascade's shared
shingle index, ``corpus.token_budget_selection``'s tokenized frame,
``corpus.global_quality_rank``'s binned frame, and the ``localCheckpoint``s
backing ``graph.connected_components`` labels and
``dedup.keep_best_representative``. That is the right default for batch
jobs — the artifacts amortize across the job and the process exit frees
them — but a long-lived session composing many pipelines would accumulate
cached blocks indefinitely (LRU-evictable, never released).

This module makes the lifetime contract *enforceable* without changing any
operator's signature or behavior:

- Every operator-persisted artifact self-registers here at creation time.
- :func:`scope` is a context manager that releases everything registered
  inside its block on exit — wrap one pipeline composition and its
  artifacts die with it.
- :func:`release_all` frees every artifact registered so far in the
  session (e.g. between pipeline phases of a long-lived driver).

Release semantics differ by artifact kind, and the distinction matters:

- **persist-backed** frames (the band/shingle/token/binned indexes)
  recompute from lineage after release — downstream results stay correct,
  later actions just pay the rebuild.
- **checkpoint-backed** frames (CC labels, keep_best's components) have
  their lineage truncated by ``localCheckpoint``; releasing them frees the
  blocks but makes any frame still referencing them ONE-SHOT INVALID.
  Release these only after the results derived from them are materialized
  (written, collected, or re-checkpointed).

Single-driver-thread assumption, same as :func:`graph.persistent_rdd_ids`
(true for this engine's call sites); concurrent sessions should not share
a scope.
"""

from __future__ import annotations

import weakref
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class _Artifact:
    kind: str  # "persist" | "checkpoint"
    # persist-backed: the Python DataFrame is held WEAKLY (the registry
    # must not keep caller-dropped frames alive for the session) plus a
    # strong reference to its small JVM handle, through which unpersist
    # still works after the Python wrapper is garbage-collected
    df_ref: object = None
    jdf: object = None
    spark: object = None  # checkpoint-backed: session + RDD ids
    rdd_ids: set[int] = field(default_factory=set)
    released: bool = False

    def release(self) -> None:
        if self.released:
            return
        if self.kind == "persist":
            df = self.df_ref() if self.df_ref is not None else None
            if df is not None:
                df.unpersist()
            elif self.jdf is not None:
                self.jdf.unpersist(False)
        elif self.kind == "checkpoint" and self.spark is not None:
            from ctcityscraper_spark.operators.graph import unpersist_rdd_ids

            unpersist_rdd_ids(self.spark, self.rdd_ids)
        self.released = True


_TRACKED: list[_Artifact] = []
# open scope() start-indexes into _TRACKED; pruning is suspended while any
# scope is active because scopes release-and-delete by index range
_SCOPE_MARKS: list[int] = []


def _append(artifact: _Artifact) -> None:
    """Register an artifact, opportunistically dropping already-released
    entries first so a long-lived session that never calls scope()/
    release_all() doesn't accumulate dead entries (each holds a strong
    DataFrame reference) for its whole lifetime. Pruning shifts list
    indexes, so it is skipped while a scope() is open — scopes prune
    their own range on exit anyway."""
    if not _SCOPE_MARKS and any(a.released for a in _TRACKED):
        _TRACKED[:] = [a for a in _TRACKED if not a.released]
    _TRACKED.append(artifact)


def _track_persist(df: DataFrame) -> DataFrame:
    """Register a persist-backed artifact (called by operators right after
    ``.persist()``); returns the frame unchanged."""
    _append(_Artifact("persist", df_ref=weakref.ref(df), jdf=df._jdf))
    return df


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist + register a frame the caller references in two or more
    subplans: without this each reference re-executes the frame's whole
    upstream pipeline (the r11 kmv_overlap lesson, 82 s → 7 s). The one
    public spelling of the ``_track_persist(df.persist())`` idiom —
    operators and catalog queries share it so the registration contract
    has a single definition."""
    return _track_persist(df.persist())


def checkpoint_tracked(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` + registration — the LINEAGE-CUT sibling
    of :func:`persist_tracked`, for SMALL frames (sketches, label maps)
    whose deep upstream plan is about to be referenced from several
    subplans of one query.

    persist() caches the DATA but the analyzed logical plan still carries
    the frame's full lineage into every consumer — Catalyst re-analyzes
    the whole tree per reference and only then substitutes the cache
    (CacheManager.useCachedData), so a ≤ k-row sketch at the end of a
    deep composed pipeline can cost seconds of DRIVER time per reference
    (measured on corpus_e2e_prep's KMV audit: 12.6 s of planning for
    ~2 s of execution). localCheckpoint replaces the plan with a leaf, so
    consumers plan against a ≤ k-row LogicalRDD. Trade-offs (the module
    header's checkpoint semantics): executes HERE (eager), and released
    blocks cannot recompute — use only for frames that are cheap to hold
    and consumed before release."""
    spark = df.sparkSession
    from ctcityscraper_spark.operators.graph import persistent_rdd_ids

    before = persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=True)
    _track_checkpoint(spark, persistent_rdd_ids(spark) - before)
    return out


def _track_checkpoint(spark, rdd_ids: set[int]) -> None:
    """Register the RDD ids backing a ``localCheckpoint``.
    ``DataFrame.unpersist`` cannot free these (they live in the
    SparkContext persistent-RDD map, not the CacheManager), so release
    goes through :func:`graph.unpersist_rdd_ids`."""
    if rdd_ids:
        _append(_Artifact("checkpoint", spark=spark, rdd_ids=set(rdd_ids)))


def tracked_count(unreleased_only: bool = True) -> int:
    """Number of registered artifacts (for tests / introspection)."""
    return sum(1 for a in _TRACKED if not (unreleased_only and a.released))


def release_all() -> None:
    """Free every artifact registered so far in this session.

    Persist-backed frames recompute from lineage afterwards (results stay
    correct); checkpoint-backed frames become one-shot invalid — only
    release after their derived results are materialized."""
    for a in _TRACKED:
        a.release()
    _TRACKED.clear()


@contextmanager
def scope():
    """Release every operator artifact created inside the block on exit.

    ::

        with artifacts.scope():
            budgeted = token_budget_selection(docs, budget)
            budgeted.write.parquet(out)      # materialize INSIDE the scope
        # band/token/checkpoint blocks created above are now freed

    Scopes nest: an inner scope releases only its own artifacts."""
    mark = len(_TRACKED)
    _SCOPE_MARKS.append(mark)
    try:
        yield
    finally:
        _SCOPE_MARKS.pop()
        for a in _TRACKED[mark:]:
            a.release()
        del _TRACKED[mark:]
