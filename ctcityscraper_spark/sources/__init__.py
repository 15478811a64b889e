"""Sources & sinks: the Parquet store, checkpoints, and fetch contracts."""

from ctcityscraper_spark.sources.store import ParquetStore
from ctcityscraper_spark.sources.checkpoint import CheckpointStore

__all__ = ["ParquetStore", "CheckpointStore"]
