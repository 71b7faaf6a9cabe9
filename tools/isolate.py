"""Isolated-session re-timing of registered queries — the regression
ground truth bench v2 numbers are judged against.

Usage:
    python tools/isolate.py q9_product_profit [more names...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/isolate.py ...

Each named query gets a FRESH local[$SPARK_GRAFT_CPUS] session (same
config as bench.py) and three back-to-back timed runs; the first is
cold (JIT/codegen-inclusive). Compare bench.py's published median
against the warm runs here before concluding any regression — per-query
in-bench numbers carry session noise that an isolated rerun does not.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry_mod
from bench import warm_session


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry = entry_mod.queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    for name in names:
        spark = warm_session(cpus)
        runs = []
        for _ in range(3):
            # Mirror bench v3.1: without a GC before every run,
            # garbage-heavy queries degrade across their own
            # back-to-back runs and the "isolated ground truth" lies.
            spark._jvm.System.gc()
            time.sleep(0.3)
            start = time.perf_counter()
            registry[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(round(time.perf_counter() - start, 3))
        print(f"{name}: cold={runs[0]} warm={runs[1:]} ")
        spark.stop()


if __name__ == "__main__":
    main()
