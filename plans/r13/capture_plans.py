#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/r13/.

Usage: python plans/r13/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after'; with no query names, captures every HEADLINE
  query (the benched set). Queries with streaming legs execute their streams
  during build — the captured plan is the returned DataFrame's (the batch
  composition), which is what the registry returns to the driver.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    from debezium_connector_vitess_spark.cache import checkpoint_scope
    from debezium_connector_vitess_spark.registry import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not names:
        import bench

        names = bench.HEADLINE
    out_dir = os.path.join(REPO, "plans", "r13")
    for name in names:
        fn = QUERIES[name]
        with checkpoint_scope(spark):
            df = fn(spark, SF_DIR)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
