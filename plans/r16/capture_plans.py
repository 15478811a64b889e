"""Capture .explain("formatted") for headline queries -> plans/r16/<q>_<tag>.txt.

Usage: python plans/r16/capture_plans.py <tag> [query ...]
With no query args, captures every headline query.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ctcityscraper_spark.plans.queries import QUERIES  # noqa: E402
from ctcityscraper_spark.session import get_spark  # noqa: E402

OUT_DIR = Path(__file__).resolve().parent


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n, q in QUERIES.items() if q.headline]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="plan_capture",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    for name in names:
        q = QUERIES[name]
        spark.sparkContext.setJobDescription(f"plan_capture: {name}")
        try:
            df = q.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (OUT_DIR / f"{name}_{tag}.txt").write_text(buf.getvalue())
            print(f"captured {name}")
        except Exception as exc:  # noqa: BLE001
            print(f"FAILED {name}: {type(exc).__name__}: {exc}")
        finally:
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
