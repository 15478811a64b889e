"""Mutable lookup dimensions over immutable Parquet (SURVEY §2.1 S9/S10).

The reference keeps a small ``cities`` table in DuckDB with
``INSERT ... ON CONFLICT DO UPDATE`` upserts (scrapers/vgsi/source.py:687-766).
Vanilla Spark/Parquet has no in-place update, so the idiomatic equivalent:

- upsert = unionByName(existing, incoming) -> ROW_NUMBER() = 1 per key
  (newest wins) -> atomic directory swap
- point lookup = filter + first() on a broadcast-size dim

At cluster scale the dim stays a single small parquet directory; the
rewrite is O(dim size), not O(fact size).
"""

from __future__ import annotations

import shutil
import uuid as _uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class LookupDimension:
    def __init__(self, spark: SparkSession, path: str | Path, key: str):
        self.spark = spark
        self.path = Path(path)
        self.key = key

    def exists(self) -> bool:
        return self.path.exists() and any(self.path.glob("*.parquet"))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(str(self.path))

    def upsert(self, incoming: DataFrame, order_col: str = "_upsert_seq") -> int:
        """Insert-or-update by key; incoming rows win over existing.

        Returns the resulting row count.
        """
        incoming = incoming.withColumn(order_col, F.lit(1))
        if self.exists():
            existing = self.read().withColumn(order_col, F.lit(0))
            merged = existing.unionByName(incoming, allowMissingColumns=True)
        else:
            merged = incoming
        w = Window.partitionBy(self.key).orderBy(F.col(order_col).desc())
        result = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", order_col)
        )
        tmp = self.path.parent / f"_upsert_{self.path.name}_{_uuid.uuid4().hex[:8]}"
        result.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        count = self.spark.read.parquet(str(tmp)).count()
        if self.path.exists():
            shutil.rmtree(self.path)
        tmp.rename(self.path)
        return count

    def lookup(self, key_value, column: str):
        """Point lookup (S10; reference SELECT url ... WHERE city_key = ?)."""
        row = self.read().filter(F.col(self.key) == key_value).select(column).first()
        return row[0] if row else None
