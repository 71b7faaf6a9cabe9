"""Multi-batch semantics of ``stream_dedup``
(``dropDuplicatesWithinWatermark``), probed empirically on this Spark
build (round 6). The mechanics observed, which these tests document:

- The membership check is PURE KEY EXISTENCE — an expired-but-not-yet-
  evicted entry still dedups its key.
- State eviction runs at the END of micro-batch N using the watermark
  computed through batch N-1 (entries with ``event_time + delay`` below
  it are removed). So a key whose expiry the watermark passed in batch
  N becomes re-emittable only from batch N+1 on.
- The late-events filter for batch N uses the watermark through batch
  N-2 (one batch behind the eviction watermark).

The contract only GUARANTEES: duplicates closer than the delay always
dedup; state is bounded by the watermark horizon (a key re-occurring
far beyond it re-emits eventually); rows below the watermark are
dropped as late. The scenarios keep every comparison far from the
63-second horizon and give eviction a full intermediate batch, so they
hold under the observed timing AND under any stricter conforming one
(e.g. eviction with the watermark through batch N, or a non-lagging
late filter).
"""

import glob
import os
import shutil
import tempfile
import time
from datetime import datetime, timedelta

from space_spark.streaming.changefeed import stream_dedup

SCHEMA = "k string, ts timestamp"


def _ts(seconds: int) -> datetime:
    return datetime(2024, 1, 1) + timedelta(seconds=seconds)


def _run_batches(spark, batches, delay="63 seconds"):
    """Feed each rows-list as its own micro-batch (one file per batch,
    mtime-ordered, maxFilesPerTrigger=1) through stream_dedup and
    return the emitted (k, ts) multiset."""
    base = tempfile.mkdtemp(prefix="sdsem_")
    try:
        sdir, odir, ckpt = base + "/in", base + "/out", base + "/ck"
        os.makedirs(sdir)
        now = time.time()
        for i, rows in enumerate(batches):
            df = spark.createDataFrame(rows, SCHEMA)
            stage = base + "/stage"
            df.coalesce(1).write.mode("overwrite").parquet(stage)
            dest = os.path.join(sdir, f"b{i:03d}.parquet")
            shutil.move(glob.glob(stage + "/part-*.parquet")[0], dest)
            os.utime(dest, (now - 100 * (len(batches) - i),) * 2)
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(sdir)
        )
        out = stream_dedup(stream, "k", "ts", watermark=delay)
        q = (
            out.writeStream.format("parquet")
            .option("path", odir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
        return sorted(
            (r["k"], r["ts"]) for r in spark.read.parquet(odir).collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_within_delay_dedup_in_and_across_batches(spark):
    """Guarantee: distance < delay always dedups — including across a
    micro-batch boundary."""
    out = _run_batches(
        spark,
        [
            [("K", _ts(1000)), ("K", _ts(1000)), ("A", _ts(1005))],
            [("K", _ts(1040)), ("B", _ts(1050))],  # 40s < 63s from K@1000
        ],
    )
    assert out == [
        ("A", _ts(1005)),
        ("B", _ts(1050)),
        ("K", _ts(1000)),
    ]


def test_expired_key_still_dedups_until_evicted(spark):
    """The observed lag, pinned: K's expiry (1063) is far below the
    watermark J establishes (49937), yet K@90000 in the very next batch
    is STILL dropped — eviction at the end of batch N uses the
    watermark through N-1, so during J's own batch nothing was evicted
    with the new watermark yet and K's entry survived into batch 3's
    membership check. Bounded-state consumers must not assume a key
    re-emits in the first batch after its horizon passes."""
    out = _run_batches(
        spark,
        [
            [("K", _ts(1000)), ("A", _ts(1000))],
            [("J", _ts(50000))],
            [("K", _ts(90000))],
        ],
    )
    assert out == [
        ("A", _ts(1000)),
        ("J", _ts(50000)),
        ("K", _ts(1000)),
    ]


def test_far_reoccurrence_reemits_after_eviction_batch(spark):
    """Guarantee: with a FULL intermediate batch between the watermark
    jump and the re-occurrence, the old entry is provably evicted and
    the key re-emits with its new event time — the bounded-state
    property an unbounded dropDuplicates would get wrong."""
    out = _run_batches(
        spark,
        [
            [("K", _ts(1000)), ("A", _ts(1000))],
            [("J", _ts(50000))],   # watermark through here: 49937
            [("F", _ts(60000))],   # eviction opportunity: K, A removed
            [("K", _ts(90000))],
        ],
    )
    assert out == [
        ("A", _ts(1000)),
        ("F", _ts(60000)),
        ("J", _ts(50000)),
        ("K", _ts(1000)),
        ("K", _ts(90000)),
    ]


def test_late_replay_is_dropped(spark):
    """Guarantee: a replay far below the advanced watermark is dropped
    as late data, NOT re-emitted — even though its key has already been
    evicted from dedup state (the filler batch ensures eviction, so the
    drop is attributable to lateness, not to a lingering state hit)."""
    out = _run_batches(
        spark,
        [
            [("K", _ts(1000))],
            [("X", _ts(50000))],
            [("F", _ts(60000))],
            [("K", _ts(1000))],  # 1000 << watermark -> late
        ],
    )
    assert out == [
        ("F", _ts(60000)),
        ("K", _ts(1000)),
        ("X", _ts(50000)),
    ]
