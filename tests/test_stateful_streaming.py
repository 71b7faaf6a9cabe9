"""Custom stateful streaming operator (applyInPandasWithState)."""

import tempfile

from pyspark.sql import Row
from pyspark.sql import types as T

from space_spark.streaming.stateful import running_user_stats

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_running_user_stats_across_batches(spark):
    src = tempfile.mkdtemp(prefix="space_stateful_") + "/ev"
    # Two files -> two micro-batches (maxFilesPerTrigger=1): state must
    # carry user 1's totals across them.
    spark.createDataFrame(
        [Row(user_id=1, value=10.0), Row(user_id=2, value=5.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [Row(user_id=1, value=7.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    out = running_user_stats(stream)
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("user_stats").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()

    rows = spark.sql(
        "SELECT * FROM user_stats ORDER BY user_id, batches"
    ).collect()
    final = {}
    for r in rows:
        final[r.user_id] = (r.total_events, r.total_value)
    assert final[1] == (2, 17.0)  # cumulative across micro-batches
    assert final[2] == (1, 5.0)
    # User 1 appeared in two batches -> two emissions, increasing totals.
    u1 = [r for r in rows if r.user_id == 1]
    assert len(u1) == 2 and u1[0].total_events < u1[1].total_events
