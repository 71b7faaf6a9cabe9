"""Reference-compat runner shim (ds.local()/ds.ray() -> Arrow reads)."""

import pyarrow as pa
from pyspark.sql import Row
from pyspark.sql import types as T

from space_spark import Dataset, field

SIMPLE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def test_runner_read_and_mutations(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    runner = ds.local()

    # Mutations accept arrow tables / dicts (reference InputData union).
    runner.append(pa.table({"id": [1, 2, 3], "val": [0.1, 0.2, 0.3]}))
    runner.upsert({"id": [3, 4], "val": [3.0, 4.0]})
    runner.delete(field("id") == 1)

    tbl = runner.read_all()
    assert isinstance(tbl, pa.Table)
    got = dict(zip(tbl["id"].to_pylist(), tbl["val"].to_pylist()))
    assert got == {2: 0.2, 3: 3.0, 4: 4.0}

    # Batch iterator with re-slicing.
    batches = list(runner.read(batch_size=2))
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
    assert sum(b.num_rows for b in batches) == 3
    assert max(b.num_rows for b in batches) <= 2

    # diff as arrow; ray() is the same engine.
    d = ds.ray().diff(0, ds.current_snapshot_id)
    assert isinstance(d, pa.Table)
    assert ds.ray() .read_all().num_rows == 3


def test_mv_runner_refresh(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])

    def mk():
        def u(b):
            return {"id": b["id"], "v2": b["val"] * 2}
        return u

    out = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("v2", T.DoubleType())])
    mv = ds.map_batches(mk(), out).materialize(spark, tmp_location + "_mv")
    ds.local().append({"id": [1, 2], "val": [1.0, 2.0]})
    mv.ray().refresh()
    tbl = mv.local().read_all()
    assert dict(zip(tbl["id"].to_pylist(), tbl["v2"].to_pylist())) == \
        {1: 2.0, 2: 4.0}
