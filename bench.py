"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full materialization,
no collect/driver transfer). Session settings mirror what a production
deployment would pin: AQE on, shuffle partitions ~ cores, UTC.

Each query runs twice back-to-back and BOTH timings are published:
``queries`` / ``value`` carry the steady-state (min of the two — the
regime a long-lived 100 TB deployment measures; the first execution pays
JIT/codegen compilation, which on a cold VM dominates sub-second queries
by 5-15x), while ``queries_cold`` / ``value_cold`` carry the first
execution, so round-over-round comparisons can separate methodology from
real progress. Set SPARK_GRAFT_WARMUP=0 for single-shot timing (then the
two sets are identical).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("space_spark_bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # Long driver sessions accumulate shuffle/broadcast state that the
        # ContextCleaner only releases on JVM GC; with a large heap full
        # GCs are rare and later queries degrade 3-5x. Default interval is
        # 30min — far longer than this benchmark.
        .config("spark.cleaner.periodicGC.interval", "30s")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM and the Python worker pool so per-query numbers measure
    # the queries, not executor/worker startup (the first mapInArrow/
    # mapInPandas query otherwise pays ~32 worker spawns).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(cpus * 2, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()

    warmup = os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0"
    timings: dict[str, float] = {}
    timings_cold: dict[str, float] = {}
    for i, (name, fn) in enumerate(entry_mod.queries().items()):
        if i % 8 == 7:
            # Deterministic cleanup point (see periodicGC note above).
            spark._jvm.System.gc()
        runs = []
        for _run in range(2 if warmup else 1):
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - start)
        timings[name] = round(min(runs), 3)
        timings_cold[name] = round(runs[0], 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "value_cold": round(sum(timings_cold.values()), 3),
                "queries_cold": timings_cold,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
