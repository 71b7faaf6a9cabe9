"""Property-based soundness of falsifiable-filter pruning: a pruned file
must contain NO row matching the predicate — for ANY data and ANY
predicate in the supported grammar. (Completeness is not required: keeping
too much is allowed, pruning a matching row is never allowed.)

Checked on the arrow backend (the default driver-side path), evaluating
predicates in plain Python as ground truth.
"""

import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings, strategies as st

from space_spark.core.expressions import Comparison, Field, Literal, lit

VALUES = st.integers(min_value=-5, max_value=5)
FIELDS = ["a", "b"]


@st.composite
def predicates(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        op = draw(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]))
        kind = draw(st.sampled_from(["fl", "lf", "ff", "ll"]))
        if kind == "fl":
            left, right = Field(draw(st.sampled_from(FIELDS))), Literal(draw(VALUES))
        elif kind == "lf":
            left, right = Literal(draw(VALUES)), Field(draw(st.sampled_from(FIELDS)))
        elif kind == "ff":
            left = Field(draw(st.sampled_from(FIELDS)))
            right = Field(draw(st.sampled_from(FIELDS)))
        else:
            left, right = Literal(draw(VALUES)), Literal(draw(VALUES))
        return Comparison(op, left, right)
    a = draw(predicates(depth=depth + 1))
    b = draw(predicates(depth=depth + 1))
    combiner = draw(st.sampled_from(["and", "or", "not"]))
    if combiner == "and":
        return a & b
    if combiner == "or":
        return a | b
    return ~a


_PY_OPS = {
    "==": lambda x, y: x == y,
    "!=": lambda x, y: x != y,
    "<": lambda x, y: x < y,
    "<=": lambda x, y: x <= y,
    ">": lambda x, y: x > y,
    ">=": lambda x, y: x >= y,
}


def eval_row(pred, row) -> bool:
    from space_spark.core import expressions as E

    if isinstance(pred, Comparison):
        def val(side):
            return row[side.name] if isinstance(side, Field) else side.value

        return _PY_OPS[pred.op](val(pred.left), val(pred.right))
    if isinstance(pred, E.And):
        return eval_row(pred.left, row) and eval_row(pred.right, row)
    if isinstance(pred, E.Or):
        return eval_row(pred.left, row) or eval_row(pred.right, row)
    if isinstance(pred, E.Not):
        return not eval_row(pred.child, row)
    raise AssertionError(type(pred))


@settings(max_examples=300, deadline=None)
@given(
    pred=predicates(),
    rows=st.lists(
        st.fixed_dictionaries({"a": VALUES, "b": VALUES}),
        min_size=1, max_size=8,
    ),
)
def test_pruned_file_has_no_matching_row(pred, rows):
    stats = {}
    for name in FIELDS:
        vals = [r[name] for r in rows]
        stats[f"_STATS_{name}"] = [{"_MIN": min(vals), "_MAX": max(vals)}]
    manifest = pa.table(stats)

    fals = pred.falsifiable(set(FIELDS), backend="arrow")
    if fals is None:
        return  # no pruning claimed: always sound
    # Evaluate "is this one file falsified?" exactly as prune_files does.
    kept = manifest.filter(fals.is_null() | ~fals)
    pruned = len(kept) == 0
    if pruned:
        assert not any(eval_row(pred, r) for r in rows), (
            f"UNSOUND: pruned file with matching rows; pred={pred!r} "
            f"rows={rows}"
        )


@settings(max_examples=100, deadline=None)
@given(pred=predicates())
def test_all_null_stats_never_break(pred):
    manifest = pa.table(
        {
            f"_STATS_{n}": pa.array(
                [{"_MIN": None, "_MAX": None}],
                pa.struct([("_MIN", pa.int64()), ("_MAX", pa.int64())]),
            )
            for n in FIELDS
        }
    )
    fals = pred.falsifiable(set(FIELDS), backend="arrow")
    if fals is None:
        return
    # Must evaluate without error; pruning an all-null-stats file is only
    # allowed for constant-false predicates (no stats involved).
    manifest.filter(fals.is_null() | ~fals)
