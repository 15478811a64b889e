"""SQL-facing UDTF surface for the flatten contract (SURVEY §2.11 X2).

The reference's ``flatten_fn`` is a multi-output transformer: one scraped
payload fans out into N tables x M rows (src/engine/base.py:33-36). The
engine runs it inside ``mapInPandas`` (sources/http.py); this module
additionally exposes it as a registered PySpark UDTF so the same contract
is reachable from SQL text via a LATERAL join::

    spark.udtf.register("flatten_rows", make_flatten_udtf(flatten_fn))
    spark.sql('''
        SELECT f.table_name, f.row_json
        FROM scraped, LATERAL flatten_rows(payload_json) f
    ''')

Rows come back as (table_name, row_json) — the dynamic-schema boundary:
each table's rows are then parsed with its declared StructType via
``from_json`` exactly like the distributed-flatten path. The UDTF is a
plain Python UDTF (arrow-optimized evaluation is a Spark conf away); it
holds no state, so Spark is free to parallelize it per partition.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

from pyspark.sql.functions import udtf


def make_flatten_udtf(flatten_fn: Callable[[list[dict]], dict[str, list[dict]]]):
    """Wrap an engine flatten_fn as a PySpark UDTF class.

    Each input row carries one scraped payload as a JSON string; the UDTF
    emits one (table_name, row_json) row per flattened child row, with
    row_json key-sorted for deterministic downstream hashing.
    """

    class _Flatten:
        def eval(self, payload_json: str) -> Iterator[tuple]:  # noqa: D401
            if payload_json is None:
                return
            payload = json.loads(payload_json)
            for table, rows in flatten_fn([payload]).items():
                for row in rows:
                    yield table, json.dumps(row, sort_keys=True, default=str)

    return udtf(_Flatten, returnType="table_name string, row_json string")
