#!/usr/bin/env python
"""Per-query Spark job census + isolated timing at sf0.1 (guide §1).

Usage: python plans/r13/job_census.py <query> [<query> ...]
Prints, per query: jobs per noop-sunk run, wall seconds (3 attempts, min),
and writes nothing — diagnostics only.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession

    from debezium_connector_vitess_spark.cache import checkpoint_scope
    from debezium_connector_vitess_spark.registry import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r13-job-census")
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
    st = spark.sparkContext.statusTracker()

    # warmup (bench.py shape)
    from debezium_connector_vitess_spark import changelog

    for t in ("region", "lineitem", "orders", "customer", "nation",
              "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    changelog.load_events(spark, SF_DIR).groupBy("event_type").count().collect()
    spark.range(0, 1000, 1, CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    names = sys.argv[1:]
    for name in names:
        fn = QUERIES[name]
        runs = []
        jobs = None
        for attempt in range(3):
            spark._jvm.System.gc()
            with checkpoint_scope(spark):
                ids0 = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
                n0 = len(list(ids0))
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
                ids1 = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
                jobs = len(list(ids1)) - n0
        print(f"CENSUS {name}: jobs={jobs} walls={runs} min={min(runs)}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
