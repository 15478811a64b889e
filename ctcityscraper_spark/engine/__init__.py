"""Ingest engine: load/refresh orchestration over Spark."""

from ctcityscraper_spark.engine.engine import (
    CircuitBreakerTripped,
    run_load,
    run_refresh,
)

__all__ = ["run_load", "run_refresh", "CircuitBreakerTripped"]
