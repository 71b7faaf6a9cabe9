"""Hostile-session parity: a user's session may run in any timezone and
with Arrow transfer disabled; registered queries must still match the
DuckDB oracle bit-for-bit. The per-query defense is `_t()` re-pinning
`spark.sql.session.timeZone=UTC` (timestamp literals and windowing
otherwise shift), and engine-independent float/money construction. A
timestamp-heavy subset runs here under a non-UTC, arrow-off session —
backing README's hostile-session claim with an actual test."""

import pytest

from test_oracle import dtype_kinds, normalize, run_duck

import __spark_entry__ as entry_mod

HOSTILE_QUERIES = [
    "q_tumbling_window",   # timestamp bucketing
    "q_sessionize",        # event-time gaps
    "q_asof_signup",       # as-of join on timestamps
    "stream_dedup",        # streaming watermarks + timestamp literals
    "q1_pricing_summary",  # date filters + money sums
    # round-10 surfaces: update's CASE-encoded oracle is float-heavy,
    # overwrite's delete stream crosses the arrow-off boundary, and
    # heavy_hitters' two-pass recount must agree exactly without Arrow
    # batching on the driver side.
    "space_update_read",
    "space_overwrite_read",
    "text_heavy_hitters",
    # round-11 surfaces: identity assignment crosses mapInArrow with
    # Arrow transfer disabled session-wide (the worker-side Arrow path
    # is independent, which this proves); generated columns evaluate
    # through the Expr algebra under a non-UTC session; the blob-clone
    # read resolves record addresses through mapInArrow the same way.
    "space_identity_read",
    "space_generated_cols",
    "space_blob_clone",
    # round-12 surfaces: NOT NULL enforcement runs the Arrow-side
    # batch check in sink paths and the pushed-down scan in Dataset
    # paths (both independent of driver Arrow transfer); the
    # clustered read derives its SF-relative bounds from a driver
    # collect that must agree with DuckDB's integer floor division
    # regardless of session timezone.
    "space_not_null_read",
    "space_clustered_read",
    # round-13 surfaces: the bitext margin fold averages rounded
    # doubles across two top-k passes (float construction must agree
    # without driver Arrow); the aggregate-MV refresh folds signed
    # deltas through localCheckpoint + apply_changes and its avg is a
    # stored double accumulator — both must match DuckDB bit-for-bit
    # under a non-UTC, arrow-off session.
    "bitext_margin_topk",
    "space_agg_mv",
]


@pytest.mark.parametrize("name", HOSTILE_QUERIES)
def test_query_matches_oracle_under_hostile_session(spark, name):
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    prev_arrow = spark.conf.get(
        "spark.sql.execution.arrow.pyspark.enabled"
    )
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set(
            "spark.sql.execution.arrow.pyspark.enabled", "false"
        )
        import test_oracle as to

        spark_raw = entry_mod.queries()[name](spark, to.SF_DIR).toPandas()
        duck_raw = run_duck(entry_mod.oracle_sql()[name])
        sk, dk = dtype_kinds(spark_raw), dtype_kinds(duck_raw)
        assert sk == dk, f"{name}: dtype mismatch {sk} vs {dk}"
        import pandas as pd

        pd.testing.assert_frame_equal(
            normalize(spark_raw), normalize(duck_raw),
            check_dtype=False, check_exact=True, obj=name,
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        spark.conf.set(
            "spark.sql.execution.arrow.pyspark.enabled", prev_arrow
        )
