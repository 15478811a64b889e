"""Paginated REST/JSON (SODA-style) source (SURVEY §2.1 S5/S6).

The reference's llc_ct_data source pages through Socrata datasets with
``$limit``/``$offset`` (scrapers/llc_ct_data/source.py:57-165) and sizes the
run with a ``$select=count(*)`` probe (:168-180). Spark restatement: the
row-count probe is a driver-side planning call; the page list becomes a
distributed fetch where each task pulls one page — pagination as a genuine
partitioned scan.

The HTTP boundary is an injected ``http_get(url) -> list[dict]`` callable so
the source is testable offline; wire a urllib-based getter for real use.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from ctcityscraper_spark.functions.localdf import local_rows_df

from ctcityscraper_spark.sources.http import with_retries

PAGE_SIZE = 50_000  # reference scrapers/llc_ct_data/source.py:30

HttpGet = Callable[[str], Any]


def page_url(base_url: str, dataset: str, limit: int, offset: int) -> str:
    return f"{base_url}/resource/{dataset}.json?$limit={limit}&$offset={offset}"


def count_url(base_url: str, dataset: str) -> str:
    return f"{base_url}/resource/{dataset}.json?$select=count(*)%20as%20n"


def probe_row_count(http_get: HttpGet, base_url: str, dataset: str) -> int:
    """Driver-side planning call (S6; reference :168-180)."""
    rows = http_get(count_url(base_url, dataset))
    return int(rows[0]["n"])


def plan_pages(total_rows: int, page_size: int = PAGE_SIZE) -> list[int]:
    """Page offsets covering the dataset — one fetch task per offset."""
    return list(range(0, max(total_rows, 1), page_size))


def fetch_dataset_distributed(
    spark: SparkSession,
    http_get: HttpGet,
    base_url: str,
    dataset: str,
    page_size: int = PAGE_SIZE,
    renames: dict[str, str] | None = None,
    retries: int = 3,
    retry_delay: float = 1.0,
) -> DataFrame:
    """All-string rows of one dataset, one page per Spark task.

    SODA rows stay strings (no coercion — reference keeps them raw) with the
    reference's rename applied (``id -> business_id``, :41-43, 156-159).
    """
    total = probe_row_count(http_get, base_url, dataset)
    offsets = plan_pages(total, page_size)
    renames = renames or {}

    def fetch_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out = []
            for offset in pdf["offset"]:
                url = page_url(base_url, dataset, page_size, int(offset))
                page = with_retries(lambda: http_get(url), retries=retries, delay=retry_delay)
                for row in page:
                    out = {renames.get(k, k): (None if v is None else str(v)) for k, v in row.items()}
                    rows_out.append(json.dumps(out))
            yield pd.DataFrame({"row_json": rows_out})

    pages_df = local_rows_df(spark, [(o,) for o in offsets], ["offset"], "offset long").repartition(
        min(len(offsets), spark.sparkContext.defaultParallelism)
    )
    json_rows = pages_df.mapInPandas(fetch_pages, "row_json string")
    # schema inferred from the JSON strings (all-string payloads); one pass
    return spark.read.json(json_rows.rdd.map(lambda r: r.row_json))
