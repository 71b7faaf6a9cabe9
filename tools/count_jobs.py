"""Deterministic per-query cost counters: Spark jobs, stages, tasks.

Usage: python tools/count_jobs.py QUERY [QUERY...]

Runs each registry query once (noop sink) in a warmed session and
prints how many Spark jobs / stages / tasks it scheduled (StatusTracker
deltas). Job count is the noise-free proxy for driver-orchestrated
fixed cost (each job is a scheduling round-trip + barrier): wall-clock
on a bursty host cannot distinguish a removed job, this can."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry = entry_mod._query_registry()
    spark = bench.warm_session(cpus)
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        # Jobs without a group land under None only when no group is
        # set; fall back to scanning all known job ids via the JVM
        # tracker for robustness.
        jt = spark.sparkContext._jsc.sc().statusTracker()
        bj = set(jt.getJobIdsForGroup(None))
        registry[name](spark, sf_dir).write.mode("overwrite") \
            .format("noop").save()
        aj = set(jt.getJobIdsForGroup(None))
        new_jobs = sorted(aj - bj)
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            info = jt.getJobInfo(j)
            if info.isEmpty():
                continue
            for sid in info.get().stageIds():
                si = jt.getStageInfo(sid)
                if not si.isEmpty():
                    n_stages += 1
                    n_tasks += si.get().numTasks()
        print(f"{name}: jobs={len(new_jobs)} stages={n_stages} "
              f"tasks={n_tasks}")
    spark.stop()


if __name__ == "__main__":
    main()
