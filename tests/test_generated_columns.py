"""Generated + identity columns (Delta GENERATED ALWAYS AS (expr) /
AS IDENTITY analogs; beyond the reference): metadata-declared value
expressions recomputed by Dataset._align on every write path, and
atomically-reserved identity ranges assigned via a shuffle-free
distributed prefix sum."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from space_spark import Dataset, field, lit
from space_spark.errors import UserInputError

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("qty", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("double_qty", T.LongType()),
        T.StructField("name_upper", T.StringType()),
    ]
)


def _rows(spark, triples, with_gen=False):
    if with_gen:
        return spark.createDataFrame(
            [Row(id=i, qty=q, name=n, double_qty=0, name_upper="x")
             for i, q, n in triples], SCHEMA
        )
    sch = T.StructType(SCHEMA.fields[:3])
    return spark.createDataFrame(
        [Row(id=i, qty=q, name=n) for i, q, n in triples], sch
    )


@pytest.fixture()
def gen_table(spark, tmp_location):
    return Dataset.create(
        spark, tmp_location, SCHEMA, ["id"],
        generated_columns={
            "double_qty": field("qty") * 2,
            "name_upper": field("name").fn("upper"),
        },
    )


def test_append_computes_omitted_generated_columns(spark, gen_table):
    gen_table.append(_rows(spark, [(1, 5, "ab"), (2, 7, "cd")]))
    got = {r.id: (r.double_qty, r.name_upper)
           for r in gen_table.read().collect()}
    assert got == {1: (10, "AB"), 2: (14, "CD")}


def test_append_overwrites_supplied_generated_values(spark, gen_table):
    """GENERATED ALWAYS AS: user-supplied values are replaced by the
    expression — the invariant holds by construction."""
    gen_table.append(_rows(spark, [(1, 3, "xy")], with_gen=True))
    r = gen_table.read().collect()[0]
    assert (r.double_qty, r.name_upper) == (6, "XY")


def test_upsert_and_merge_recompute(spark, gen_table):
    gen_table.append(_rows(spark, [(1, 5, "ab")]))
    gen_table.upsert(_rows(spark, [(1, 9, "zz")]))
    r = gen_table.read().collect()[0]
    assert (r.qty, r.double_qty, r.name_upper) == (9, 18, "ZZ")


def test_update_recomputes_generated(spark, gen_table):
    gen_table.append(_rows(spark, [(1, 5, "ab"), (2, 6, "cd")]))
    gen_table.update(field("id") == 1, {"qty": 100})
    got = {r.id: r.double_qty for r in gen_table.read().collect()}
    assert got == {1: 200, 2: 12}


def test_sink_batch_write_computes_generated(spark, gen_table):
    from space_spark.sources.datasource import register_space_source

    register_space_source(spark)
    df = _rows(spark, [(10, 4, "ef")], with_gen=True)
    df.write.format("space").mode("append").save(gen_table.location)
    r = gen_table.reload().read().collect()[0]
    assert (r.double_qty, r.name_upper) == (8, "EF")


def test_generated_declaration_validation(spark, tmp_location):
    with pytest.raises(UserInputError, match="not in the schema"):
        Dataset.create(
            spark, tmp_location, SCHEMA, ["id"],
            generated_columns={"nope": field("qty") * 2},
        )
    with pytest.raises(UserInputError, match="unknown column"):
        Dataset.create(
            spark, tmp_location, SCHEMA, ["id"],
            generated_columns={"double_qty": field("ghost") * 2},
        )
    with pytest.raises(UserInputError, match="non-plain column"):
        # One generated column may not derive from another.
        Dataset.create(
            spark, tmp_location, SCHEMA, ["id"],
            generated_columns={
                "double_qty": field("qty") * 2,
                "name_upper": field("double_qty").fn("upper"),
            },
        )


def test_rename_and_drop_follow_generated(spark, tmp_location):
    ds = Dataset.create(
        spark, tmp_location, SCHEMA, ["id"],
        generated_columns={"double_qty": field("qty") * 2},
    )
    ds.rename_column("qty", "amount")
    ds.append(spark.createDataFrame(
        [Row(id=1, amount=4, name="a", name_upper="A")],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("name_upper", T.StringType()),
        ]),
    ))
    assert ds.read().collect()[0].double_qty == 8
    with pytest.raises(UserInputError, match="derive from it"):
        ds.drop_column("amount")
    ds.drop_column("double_qty")  # dropping the generated col is fine
    assert "double_qty" not in (ds.metadata.generated_columns or {})


# ------------------------------------------------------------- identity
ID_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _vrows(spark, vals):
    return spark.createDataFrame(
        [Row(v=v) for v in vals],
        T.StructType([T.StructField("v", T.StringType())]),
    )


@pytest.fixture()
def id_table(spark, tmp_location):
    return Dataset.create(
        spark, tmp_location, ID_SCHEMA, ["rid"],
        identity_columns={"rid": {"start": 1, "step": 1}},
    )


def test_identity_assigns_contiguous_unique(spark, id_table):
    id_table.append(_vrows(spark, [f"v{i}" for i in range(20)]))
    ids = sorted(r.rid for r in id_table.read().collect())
    assert ids == list(range(1, 21))
    # Second append continues from the watermark.
    id_table.append(_vrows(spark, ["a", "b", "c"]))
    ids = sorted(r.rid for r in id_table.read().collect())
    assert ids == list(range(1, 24))


def test_identity_preserves_supplied_nonnull(spark, id_table):
    """Upsert/rewrite rows keep their ids: non-null input values pass
    through; only NULL entries are assigned."""
    id_table.append(_vrows(spark, ["x", "y"]))  # rid 1, 2
    rows = {r.rid: r.v for r in id_table.read().collect()}
    assert set(rows) == {1, 2}
    id_table.upsert(spark.createDataFrame(
        [Row(rid=1, v="x2")], ID_SCHEMA
    ))
    rows = {r.rid: r.v for r in id_table.read().collect()}
    assert rows[1] == "x2" and set(rows) == {1, 2}


def test_identity_concurrent_writers_never_collide(
    spark, tmp_location
):
    """Two handles interleaving appends draw from disjoint reserved
    ranges — the commit-lock reservation, not luck."""
    a = Dataset.create(
        spark, tmp_location, ID_SCHEMA, ["rid"],
        identity_columns={"rid": {"start": 1, "step": 1}},
    )
    b = Dataset.load(spark, tmp_location)
    a.append(_vrows(spark, ["a1", "a2", "a3"]))
    b.reload().append(_vrows(spark, ["b1", "b2"]))
    a.reload().append(_vrows(spark, ["a4"]))
    ids = sorted(r.rid for r in a.reload().read().collect())
    assert ids == list(range(1, 7))  # unique AND gap-free here


def test_identity_step_and_start(spark, tmp_location):
    ds = Dataset.create(
        spark, tmp_location, ID_SCHEMA, ["rid"],
        identity_columns={"rid": {"start": 100, "step": 10}},
    )
    ds.append(_vrows(spark, ["a", "b", "c"]))
    assert sorted(r.rid for r in ds.read().collect()) == [100, 110, 120]


def test_identity_declaration_validation(spark, tmp_location):
    with pytest.raises(UserInputError, match="LongType"):
        Dataset.create(
            spark, tmp_location, ID_SCHEMA, ["rid"],
            identity_columns={"v": {"start": 1}},
        )
    with pytest.raises(UserInputError, match="step must be nonzero"):
        Dataset.create(
            spark, tmp_location, ID_SCHEMA, ["rid"],
            identity_columns={"rid": {"start": 1, "step": 0}},
        )


def test_identity_rejected_by_sink(spark, id_table):
    from space_spark.sources.datasource import register_space_source

    register_space_source(spark)
    df = spark.createDataFrame([Row(rid=1, v="a")], ID_SCHEMA)
    with pytest.raises(Exception, match="identity columns"):
        df.write.format("space").mode("append").save(id_table.location)


# ---------------------------------------------- value-expression algebra
def test_arith_func_json_roundtrip_and_arrow_parity(spark):
    """The widened algebra (Arith/Func) survives the JSON transport and
    agrees between the Spark and Arrow evaluators."""
    import pyarrow as pa

    from space_spark.core.expressions import (
        eval_arrow_rows,
        expr_from_json,
        expr_to_json,
    )

    e = ((field("a") * 2 + field("b")) / lit(4) >= lit(1.5)) & (
        field("s").fn("upper") == lit("XY")
    )
    e2 = expr_from_json(expr_to_json(e))
    batch = pa.record_batch(
        {"a": [1, 5, None], "b": [2, 2, 2], "s": ["xy", "ab", "xy"]}
    )
    arrow = eval_arrow_rows(e2, batch).to_pylist()
    df = spark.createDataFrame(
        [Row(a=1, b=2, s="xy"), Row(a=5, b=2, s="ab"),
         Row(a=None, b=2, s="xy")],
        "a long, b long, s string",
    )
    sparkside = [r.ok for r in
                 df.select(e2.to_spark().alias("ok")).collect()]
    assert arrow == sparkside == [False, False, None]


def test_arith_constraint_enforced(spark, tmp_location):
    """CHECK constraints can now use arithmetic: qty * 2 <= 100."""
    from space_spark import ConstraintViolationError

    ds = Dataset.create(
        spark, tmp_location, SCHEMA, ["id"],
        check_constraints={"cap": field("qty") * 2 <= lit(100)},
    )
    ds.append(_rows(spark, [(1, 50, "a")], with_gen=True))
    with pytest.raises(ConstraintViolationError, match="cap"):
        ds.append(_rows(spark, [(2, 51, "b")], with_gen=True))


def test_unknown_arith_fn_rejected_by_transport():
    import json

    from space_spark.core.expressions import expr_from_json

    with pytest.raises(ValueError):
        expr_from_json(json.dumps(
            {"n": "arith", "op": "**",
             "l": {"n": "field", "name": "a"},
             "r": {"n": "lit", "vt": "int", "v": 2}}
        ))
    with pytest.raises(ValueError):
        expr_from_json(json.dumps(
            {"n": "fn", "name": "eval",
             "c": {"n": "field", "name": "a"}}
        ))


# ----------------------------------------------- identity property check
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ID_OPS = st.lists(
    st.tuples(
        st.sampled_from(["append", "upsert_existing"]),
        st.integers(min_value=1, max_value=12),  # rows (append) / count
        st.integers(min_value=1, max_value=5),   # partitions
    ),
    min_size=1, max_size=4,
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ID_OPS)
def test_identity_invariants_under_random_sequences(spark, ops):
    """Under any append/upsert sequence and any input partitioning:
    ids are unique and non-null, clean appends keep the id set exactly
    1..N (contiguous — the prefix-sum + reservation never skips or
    reuses), and the watermark stays strictly ahead of every issued
    id."""
    import shutil
    import tempfile

    loc = tempfile.mkdtemp(prefix="space_idprop_") + "/t"
    try:
        ds = Dataset.create(
            spark, loc, ID_SCHEMA, ["rid"],
            identity_columns={"rid": {"start": 1, "step": 1}},
        )
        appended = 0
        for kind, n, parts in ops:
            if kind == "append":
                ds.append(_vrows(
                    spark, [f"a{appended + i}" for i in range(n)]
                ).repartition(parts))
                appended += n
            else:
                existing = [r.rid for r in
                            ds.read().select("rid").collect()]
                if not existing:
                    continue
                take = existing[:min(n, len(existing))]
                ds.upsert(spark.createDataFrame(
                    [Row(rid=i, v=f"u{i}") for i in take], ID_SCHEMA
                ).repartition(parts))
            ids = [r.rid for r in ds.read().select("rid").collect()]
            assert all(i is not None for i in ids)
            assert len(ids) == len(set(ids)) == appended
            assert sorted(ids) == list(range(1, appended + 1))
            wm = ds.metadata.identity_columns["rid"]["watermark"]
            assert wm == appended + 1
    finally:
        shutil.rmtree(loc.rsplit("/", 1)[0], ignore_errors=True)


def test_identity_failed_write_leaks_gap_not_duplicates(
    spark, tmp_location
):
    """A write that reserves a range and then ABORTS (CHECK constraint
    violation after assignment) leaks its reservation as a gap — ANSI
    identity semantics — and the next successful write continues from
    the advanced watermark with no reuse."""
    from space_spark import ConstraintViolationError

    sch = T.StructType([
        T.StructField("rid", T.LongType()),
        T.StructField("val", T.LongType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, sch, ["rid"],
        identity_columns={"rid": {"start": 1, "step": 1}},
        check_constraints={"val_pos": field("val") > 0},
    )
    ds.append(spark.createDataFrame(
        [Row(val=5), Row(val=6)],
        T.StructType([T.StructField("val", T.LongType())]),
    ))  # rids 1, 2
    with pytest.raises(ConstraintViolationError):
        ds.append(spark.createDataFrame(
            [Row(val=-1), Row(val=-2), Row(val=-3)],
            T.StructType([T.StructField("val", T.LongType())]),
        ))  # reserved 3..5, aborted -> gap
    ds.append(spark.createDataFrame(
        [Row(val=7)],
        T.StructType([T.StructField("val", T.LongType())]),
    ))
    ids = sorted(r.rid for r in ds.read().collect())
    assert ids == [1, 2, 6]  # gap 3-5 leaked, no reuse, no dupes
    assert ds.metadata.identity_columns["rid"]["watermark"] == 7


def test_identity_nonpk_merge_keeps_target_ids(spark, tmp_location):
    """A whole-row matched UPDATE must not displace the target's
    identity value with the fresh id _align assigned to the source
    row (Delta identity semantics: matched ids are stable)."""
    sch = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("rid", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, sch, ["k"],
        identity_columns={"rid": {"start": 1, "step": 1}},
    )
    two = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])
    ds.append(spark.createDataFrame(
        [Row(k=10, v="a"), Row(k=20, v="b")], two
    ))
    before = {r.k: r.rid for r in ds.read().collect()}
    ds.merge(spark.createDataFrame(
        [Row(k=10, v="a2"), Row(k=30, v="c")], two
    ))
    after = {r.k: (r.rid, r.v) for r in ds.read().collect()}
    assert after[10] == (before[10], "a2")  # id stable across update
    assert after[20] == (before[20], "b")
    assert after[30][1] == "c" and after[30][0] not in (
        before[10], before[20]
    )
    rids = [t[0] for t in after.values()]
    assert len(set(rids)) == 3 and all(r is not None for r in rids)


def test_generated_column_prunes_via_manifest_stats(spark, tmp_location):
    """Generated columns are physical columns with footer stats, so a
    filter on one prunes files like any other — the layout benefit
    Delta gets from generated partition columns falls out of manifest
    pruning here."""
    sch = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("bucket", T.LongType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, sch, ["id"],
        generated_columns={"bucket": field("id") % 10},
    )
    one = T.StructType([T.StructField("id", T.LongType())])
    # cluster_by the generated column -> disjoint per-file ranges.
    ds.append(
        spark.createDataFrame([Row(id=i) for i in range(400)], one),
        cluster_by=["bucket"],
    )
    all_files = ds.data_files()
    hit = ds.data_files(filter_=field("bucket") == 3)
    assert len(hit) < len(all_files)
    got = sorted(r.id for r in
                 ds.read(filter_=field("bucket") == 3).collect())
    assert got == [i for i in range(400) if i % 10 == 3]


def test_clone_carries_generated_identity_not_null(
    spark, tmp_location
):
    """A clone of a table with round-11 write-surface metadata keeps
    it all: generated exprs recompute, identity continues PAST the
    source's watermark (no id reuse against cloned rows), NOT NULL
    still enforces."""
    import shutil
    import tempfile

    from space_spark import ConstraintViolationError

    sch = T.StructType([
        T.StructField("rid", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("v2", T.LongType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, sch, ["rid"],
        identity_columns={"rid": {"start": 1, "step": 1}},
        generated_columns={"v2": field("v") * 2},
        not_null=["v"],
    )
    vs = T.StructType([T.StructField("v", T.LongType())])
    ds.append(spark.createDataFrame([Row(v=5), Row(v=6)], vs))
    dest = tempfile.mkdtemp(prefix="space_gclone_") + "/c"
    try:
        c = ds.clone(dest)
        c.append(spark.createDataFrame([Row(v=7)], vs))
        rows = {r.rid: (r.v, r.v2) for r in c.read().collect()}
        assert rows == {1: (5, 10), 2: (6, 12), 3: (7, 14)}
        with pytest.raises(ConstraintViolationError):
            c.append(spark.createDataFrame([Row(v=None)], vs))
    finally:
        shutil.rmtree(dest.rsplit("/", 1)[0], ignore_errors=True)


def test_arrow_modulo_exact_above_2_53(spark, tmp_location):
    """Review fix: the sink's Arrow evaluation of % must be exact
    int64, not a float64 emulation — a generated column over ids
    beyond 2^53 has to persist the same value on both write paths."""
    from space_spark.sources.datasource import register_space_source

    register_space_source(spark)
    big = 2 ** 60 + 3
    sch = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("m", T.LongType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, sch, ["k"],
        generated_columns={"m": field("k") % 1000003},
    )
    df = spark.createDataFrame([Row(k=big, m=0)], sch)
    df.write.format("space").mode("append").save(ds.location)  # Arrow path
    ds.reload().append(spark.createDataFrame(
        [Row(k=big + 1, m=0)], sch
    ))  # Spark path
    got = {r.k: r.m for r in ds.read().collect()}
    assert got[big] == big % 1000003  # exact, both engines agree
    assert got[big + 1] == (big + 1) % 1000003


def test_identity_passthrough_exact_above_2_53(spark, tmp_location):
    """Review fix: a batch mixing NULL ids with an explicit id above
    2^53 must keep the explicit id EXACT (the pandas bridge would
    round it; the Arrow assignment path must not)."""
    big = (1 << 53) + 1
    ds = Dataset.create(
        spark, tmp_location, ID_SCHEMA, ["rid"],
        identity_columns={"rid": {"start": 1, "step": 1}},
    )
    ds.append(spark.createDataFrame(
        [Row(rid=big, v="explicit"), Row(rid=None, v="fresh")],
        ID_SCHEMA,
    ).coalesce(1))  # one partition -> one Arrow batch mixes both
    got = {r.v: r.rid for r in ds.read().collect()}
    assert got["explicit"] == big  # not 2^53 (the float64 rounding)
    assert got["fresh"] == 1
