"""Poor-man's py-spy: sample every Python thread while a query runs.

Usage: python tools/thread_sample.py QUERY

cProfile only sees the main thread, but streaming fixtures do their
real work on the foreachBatch thread — this was the round-13 blind
spot ("needs a thread-aware profiler"). No py-spy in this sandbox
(no network), so: a daemon thread polls ``sys._current_frames()``
every 10 ms and tallies, per thread, the innermost frame belonging to
repo code (falling back to pyspark, then whatever is innermost). A
frame sampled N times ≈ N*10 ms of wall spent there — for blocking
py4j calls that is the Spark ACTION the thread is waiting on, which
is exactly the attribution wanted: our-sink-code vs Spark machinery
vs idle.

Py4j service threads (clientserver/java_gateway/accumulator poll)
show up pinned at 100% in their accept/poll loops — ignore them; the
signal is the main thread and the streaming "Thread-N (run)" rows.
"""
from __future__ import annotations

import collections
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

INTERVAL = 0.01
_SERVICE_FRAMES = ("clientserver.py", "java_gateway.py", "accumulators.py")


def _classify(frame):
    """(bucket, innermost-relevant frame desc) for one thread's stack."""
    f, repo_f, spark_f = frame, None, None
    while f is not None:
        fn = f.f_code.co_filename
        if repo_f is None and ("/repo/" in fn or "space_spark" in fn
                               or "__spark_entry__" in fn):
            repo_f = f
        if spark_f is None and "pyspark" in fn:
            spark_f = f
        f = f.f_back
    tgt = repo_f or spark_f or frame
    where = "%s:%d:%s" % (os.path.basename(tgt.f_code.co_filename),
                          tgt.f_lineno, tgt.f_code.co_name)
    bucket = ("repo" if repo_f is not None
              else "pyspark" if spark_f is not None else "native/idle")
    return bucket, where


def main() -> None:
    query = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    samples: collections.Counter = collections.Counter()
    totals: collections.Counter = collections.Counter()
    stop = threading.Event()
    main_ident = threading.get_ident()

    def sampler() -> None:
        me = threading.get_ident()
        while not stop.is_set():
            names = {t.ident: (t.name or "?")
                     for t in threading.enumerate()}
            for ident, frame in list(sys._current_frames().items()):
                if ident == me:
                    continue
                kind = ("main" if ident == main_ident
                        else names.get(ident, "other"))
                bucket, where = _classify(frame)
                samples[(kind, bucket, where)] += 1
                totals[(kind, bucket)] += 1
            time.sleep(INTERVAL)

    spark = bench.warm_session(cpus)
    fn = entry_mod.queries()[query]
    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    start = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - start
    stop.set()
    th.join(1)

    print("%s: wall %.2fs  (~%.0f ms/sample)" % (query, wall,
                                                 INTERVAL * 1000))
    print("est seconds by thread|bucket (py4j service threads pinned "
          "in accept/poll are expected noise):")
    for (kind, bucket), n in totals.most_common():
        print("  %-34s %7.1fs" % ("%s|%s" % (kind, bucket), n * INTERVAL))
    print("top frames:")
    for (kind, bucket, where), n in samples.most_common(30):
        svc = any(s in where for s in _SERVICE_FRAMES)
        print("  %6.1fs  %-22s %s%s" % (n * INTERVAL, kind, where,
                                        "  [py4j service]" if svc else ""))
    spark.stop()


if __name__ == "__main__":
    main()
