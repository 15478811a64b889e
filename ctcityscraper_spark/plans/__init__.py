"""Query catalog: every SURVEY.md §2 operator shape as (Spark fn, oracle SQL)."""

from ctcityscraper_spark.plans.tables import load_table, register_views
from ctcityscraper_spark.plans.queries import QUERIES, oracle_sql_catalog, query_catalog

__all__ = [
    "load_table",
    "register_views",
    "QUERIES",
    "query_catalog",
    "oracle_sql_catalog",
]
