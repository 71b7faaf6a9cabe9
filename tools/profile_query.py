"""Per-query profiler for optimization rounds (guide §1: measure first).

Usage: python tools/profile_query.py QUERY [QUERY...] [--explain-dir DIR]
       [--runs N] [--no-profile]

For each named registry query, in a fresh warmed session (same settings
as bench.py):
  - times `runs` executions (noop sink, GC before each — bench
    methodology) and prints each run + median;
  - captures `.explain("formatted")` of the returned DataFrame to
    DIR/<query>_<tag>.txt when --explain-dir is given (tag from
    --tag, default "before");
  - unless --no-profile, reruns once under cProfile and prints the top
    driver-side calls by cumulative time (fixture-phase breakdown: for
    lifecycle fixtures the interesting cost is append/refresh/commit
    calls, which explain() can't show).
"""
from __future__ import annotations

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-profile", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry = entry_mod._query_registry()
    unknown = [q for q in args.queries if q not in registry]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    for name in args.queries:
        fn = registry[name]
        spark = bench.warm_session(cpus)
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs = []
        for _ in range(args.runs):
            spark._jvm.System.gc()
            time.sleep(0.3)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        med = sorted(runs)[len(runs) // 2]
        print(f"[{name}] runs={runs} median={med}")

        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(args.explain_dir,
                               f"{name}_{args.tag}.txt")
            with open(out, "w") as f:
                f.write(plan)
            print(f"[{name}] explain -> {out}")

        if not args.no_profile:
            pr = cProfile.Profile()
            pr.enable()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            pr.disable()
            s = io.StringIO()
            st = pstats.Stats(pr, stream=s).sort_stats("cumulative")
            st.print_stats(r"space_spark|__spark_entry__", args.top)
            print(s.getvalue())
        spark.stop()


if __name__ == "__main__":
    main()
