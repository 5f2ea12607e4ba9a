#!/usr/bin/env python
"""Dump .explain("formatted") for a list of declared queries.

Usage: python plans/r13/dump_plans.py <repo_dir> <suffix> <query...>
Writes plans/r13/<query>_<suffix>.txt under the *invoking* repo (cwd).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

repo = sys.argv[1]
suffix = sys.argv[2]
names = sys.argv[3:]

sys.path.insert(0, repo)

from pyspark.sql import SparkSession  # noqa: E402

OUT = Path(__file__).resolve().parent

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("plan-dump-r13")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)

from optimus_any2any_spark.queries import all_queries  # noqa: E402

qs = all_queries()
jvm = spark.sparkContext._jvm
mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

for name in names:
    q = qs[name]
    try:
        df = q.spark(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
    except Exception as e:  # noqa: BLE001
        txt = f"ERROR building {name}: {e!r}"
    (OUT / f"{name}_{suffix}.txt").write_text(txt)
    print(f"dumped {name}_{suffix} ({len(txt)} chars)", flush=True)

spark.stop()
