"""Property pin for the round-12 membership-pruning index: for ANY
filter expression in the closed algebra, reading through the
bloom-pruned file list returns EXACTLY the rows of the unpruned read —
a wrong prune (bloom dropping a file that holds a matching row) is the
one failure mode this feature must never have, and random OR/AND/IN
shapes are where a naive conjunct extractor would go wrong."""

import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from space_spark import Dataset, field
from space_spark.core.expressions import equality_conjuncts

# Small closed domains so random equalities HIT often (absent-value
# pruning is the easy case; present values catch wrong prunes).
KS = list(range(40))
HS = [f"h{i % 7}" for i in range(40)]  # 7 distinct strings


@pytest.fixture(scope="module")
def indexed_table(spark, tmp_path_factory):
    import pyspark.sql.types as T

    loc = str(tmp_path_factory.mktemp("bloomprop") / "t")
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("h", T.StringType()),
    ])
    ds = Dataset.create(spark, loc, schema, ["k"],
                        bloom_filters=["h", "k"])
    for lo in range(0, 40, 10):
        ds.append(spark.createDataFrame(
            [(k, HS[k]) for k in KS[lo:lo + 10]], schema
        ).coalesce(1))
    return ds


def _leaf(draw):
    col = draw(st.sampled_from(["k", "h"]))
    if col == "k":
        val = draw(st.integers(min_value=-2, max_value=45))
        op = draw(st.sampled_from(["==", ">=", "<", "!="]))
        e = {"==": field("k") == val, ">=": field("k") >= val,
             "<": field("k") < val, "!=": field("k") != val}[op]
        return e
    val = draw(st.sampled_from(HS + ["absent-a", "absent-b"]))
    if draw(st.booleans()):
        return field("h") == val
    other = draw(st.sampled_from(HS + ["absent-c"]))
    return field("h").isin([val, other])


@st.composite
def exprs(draw, depth=3):
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        return _leaf(draw)
    a = draw(exprs(depth=depth - 1))
    b = draw(exprs(depth=depth - 1))
    return (a & b) if draw(st.booleans()) else (a | b)


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=exprs())
def test_bloom_pruned_read_equals_unpruned(spark, indexed_table, e):
    ds = indexed_table
    snap = ds.metadata.snapshot(ds.current_snapshot_id)
    from space_spark.core import manifests as mf

    stats_files = mf.prune_files(
        spark, ds._manifest_abs_paths(snap),
        ds._phys_expr(e), ds._stats_fields(),
    )
    bloomed = ds._bloom_equality_prune(stats_files, snap, e)
    assert set(bloomed) <= set(stats_files)
    got = sorted(r.k for r in ds.read(filter_=e).collect())
    want = sorted(
        r.k for r in ds._read_files(sorted(mf.read_manifest_paths(
            ds._manifest_abs_paths(snap)
        ))).where(e.to_spark()).collect()
    )
    assert got == want, (e, got, want)


@given(e=exprs())
@settings(max_examples=60, deadline=None)
def test_extracted_conjuncts_are_implied(e):
    """Extractor soundness without Spark: any row SATISFYING the
    expression must take one of the extracted values for each
    extracted column — checked by brute force over the tiny domain."""
    eq = equality_conjuncts(e)
    if not eq:
        return
    # Evaluate the Expr tree in pure Python (Kleene three-valued).
    def ev(node, row):
        from space_spark.core.expressions import (
            And, Comparison, Field, Literal, Not, Or,
        )
        if isinstance(node, And):
            l, r = ev(node.left, row), ev(node.right, row)
            return None if (l is None or r is None) and not (
                l is False or r is False) else (
                False if l is False or r is False else (l and r))
        if isinstance(node, Or):
            l, r = ev(node.left, row), ev(node.right, row)
            if l is True or r is True:
                return True
            if l is None or r is None:
                return None
            return l or r
        if isinstance(node, Not):
            c = ev(node.child, row)
            return None if c is None else (not c)
        if isinstance(node, Comparison):
            def val(x):
                return row[x.name] if isinstance(x, Field) else x.value
            l, r = val(node.left), val(node.right)
            if l is None or r is None:
                return None
            if type(l) is not type(r) and not (
                    isinstance(l, (int, float))
                    and isinstance(r, (int, float))):
                return False if node.op == "==" else (
                    True if node.op == "!=" else None)
            return {"==": l == r, "!=": l != r, "<": l < r,
                    "<=": l <= r, ">": l > r, ">=": l >= r}[node.op]
        raise TypeError(node)

    for k in range(-2, 46):
        row = {"k": k, "h": HS[k] if 0 <= k < len(HS) else "zzz"}
        if ev(e, row) is True:
            for col, vals in eq.items():
                assert row[col] in vals, (e, row, col, vals)
