"""Falsifiable-filter unit tests (mirrors reference
tests/core/manifests/test_falsifiable_filters.py: parametrized
(filter, expected pruning) pairs incl. unsupported -> no pruning)."""

import pytest
from pyspark.sql import functions as F

from space_spark.core.expressions import field, lit

STATS = {"a", "b"}


def _prune(spark, expr, rows):
    """rows: list of dicts {_STATS_a: {_MIN,_MAX}, ...}; returns indexes kept."""
    df = spark.createDataFrame(
        [
            (
                i,
                (r.get("a_min"), r.get("a_max")),
                (r.get("b_min"), r.get("b_max")),
            )
            for i, r in enumerate(rows)
        ],
        "idx int, _STATS_a struct<_MIN:int,_MAX:int>, _STATS_b struct<_MIN:int,_MAX:int>",
    )
    fals = expr.falsifiable(STATS)
    if fals is None:
        return list(range(len(rows)))
    kept = df.where(~F.coalesce(fals, F.lit(False))).select("idx").collect()
    return sorted(r.idx for r in kept)


FILES = [
    {"a_min": 0, "a_max": 10, "b_min": 100, "b_max": 200},   # 0
    {"a_min": 20, "a_max": 30, "b_min": 0, "b_max": 5},      # 1
    {"a_min": 5, "a_max": 5, "b_min": 7, "b_max": 7},        # 2 constant
    {"a_min": None, "a_max": None, "b_min": 1, "b_max": 2},  # 3 no stats (all-null col)
]


@pytest.mark.parametrize(
    "expr,expected",
    [
        (field("a") == 25, [1, 3]),
        (field("a") != 5, [0, 1, 3]),
        (field("a") < 5, [0, 3]),
        (field("a") <= 5, [0, 2, 3]),
        (field("a") > 10, [1, 3]),
        (field("a") >= 10, [0, 1, 3]),
        ((field("a") > 10) & (field("b") < 10), [1, 3]),
        ((field("a") > 100) | (field("b") >= 100), [0, 3]),
        # ~(a==25) == (a!=25): only a file CONSTANT at 25 can be pruned.
        (~(field("a") == 25), [0, 1, 2, 3]),
        (~((field("a") == 25) & (field("b") < 10)), [0, 1, 2, 3]),
        (field("a") < field("b"), [0, 2, 3]),
        (field("a") > field("b"), [1, 3]),
        (lit(1) == lit(2), []),  # constant-false prunes everything
        (lit(1) == lit(1), [0, 1, 2, 3]),
    ],
)
def test_falsifiable_pruning(spark, expr, expected):
    assert _prune(spark, expr, FILES) == expected


def test_unsupported_field_keeps_all(spark):
    # Field without stats -> no pruning.
    assert _prune(spark, field("nostats") == 1, FILES) == [0, 1, 2, 3]
    # OR with an unsupported side -> no pruning at all.
    assert _prune(
        spark, (field("a") == 25) | (field("nostats") == 1), FILES
    ) == [0, 1, 2, 3]
    # AND with an unsupported side -> prune on the supported side.
    assert _prune(
        spark, (field("a") == 25) & (field("nostats") == 1), FILES
    ) == [1, 3]


def test_to_spark_roundtrip(spark):
    df = spark.createDataFrame([(1, "x"), (5, "y")], "a int, s string")
    expr = (field("a") > 2) & ~(field("s") == "z")
    assert df.where(expr.to_spark()).count() == 1


def test_field_isin_builds_closed_algebra(spark):
    from space_spark.core.expressions import (
        expr_from_json,
        expr_to_json,
        field,
    )

    e = field("x").isin([1, 2, 3])
    df = spark.sql("SELECT id AS x FROM range(0, 10)")
    got = sorted(r.x for r in df.where(e.to_spark()).collect())
    assert got == [1, 2, 3]
    # Round-trips through the declarative JSON transport.
    e2 = expr_from_json(expr_to_json(e))
    assert sorted(
        r.x for r in df.where(e2.to_spark()).collect()
    ) == [1, 2, 3]
    # Empty IN () is constant-false.
    empty = field("x").isin([])
    assert df.where(empty.to_spark()).count() == 0


def test_field_isin_prunes_manifests(spark):
    from space_spark.core.expressions import field
    from space_spark.core.manifests import prune_files

    # Falsifiable: each equality checks file min/max; the Or unions.
    e = field("x").isin([5, 100])
    f = e.falsifiable({"x"}, backend="spark")
    assert f is not None
