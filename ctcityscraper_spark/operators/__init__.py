"""Analytical operators: SCD2 views, dedup family, similarity, text analysis."""

from ctcityscraper_spark.operators.scd2 import (
    changed_since,
    current,
    history,
    register_scd2_views,
    with_version_columns,
)

__all__ = [
    "changed_since",
    "current",
    "history",
    "register_scd2_views",
    "with_version_columns",
]
