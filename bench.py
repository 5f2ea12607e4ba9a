#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from optimus_any2any_spark.queries import all_queries
    from optimus_any2any_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    try:
        queries = {n: q for n, q in all_queries().items() if q.bench}
        # JVM/codegen warmup on the smallest SF so measured times are query
        # execution, not session spin-up.
        warm = "/root/testdata/sf0.001"
        for q in queries.values():
            try:
                q.spark(spark, warm).count()
            except Exception:
                pass

        times: dict[str, float] = {}
        for name, q in sorted(queries.items()):
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            n = df.count()
            times[name] = round(time.perf_counter() - t0, 4)
            print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

        total = round(sum(times.values()), 4)
        try:
            sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        except ValueError:
            sf = None
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_sec",
                    "value": total,
                    "unit": "sec",
                    "queries": times,
                    "sf": sf,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
