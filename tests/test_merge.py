"""MERGE INTO (round 9): conditional reconcile of a source frame
against a table by primary key — one snapshot commit, pruned matched
probe, untouched rows for matched-but-condition-false pairs."""

import os
import sys

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from space_spark import Dataset
from space_spark.errors import UserInputError

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, ts=ts, v=v) for k, ts, v in rows], SCHEMA
    )


def _state(ds):
    return sorted((r["k"], r["ts"], r["v"])
                  for r in ds.reload().read().collect())


@pytest.fixture()
def table(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SCHEMA, ["k"])
    ds.append(_df(spark, [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")]))
    return ds


def test_merge_update_insert_default(spark, table):
    v0 = table.current_snapshot_id
    table.merge(_df(spark, [(2, 20, "B"), (9, 20, "new")]))
    assert _state(table) == [
        (1, 10, "a"), (2, 20, "B"), (3, 10, "c"), (9, 20, "new")]
    # ONE snapshot commit, and time travel shows the pre-merge state.
    assert table.current_snapshot_id == v0 + 1
    old = sorted((r["k"], r["v"])
                 for r in table.read(version=v0).collect())
    assert old == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_condition_guards_stale_updates(spark, table):
    """The idempotent-ingest guard: only update when the source row is
    NEWER; stale matched rows stay untouched, new keys still insert."""
    table.merge(
        _df(spark, [(2, 5, "stale"), (3, 30, "fresh"), (7, 1, "new")]),
        matched_condition=lambda s, t: s["ts"] > t["ts"],
    )
    assert _state(table) == [
        (1, 10, "a"), (2, 10, "b"), (3, 30, "fresh"), (7, 1, "new")]


def test_merge_matched_delete(spark, table):
    table.merge(
        _df(spark, [(1, 99, "x"), (8, 99, "y")]),
        when_matched="delete", when_not_matched="insert",
    )
    assert _state(table) == [
        (2, 10, "b"), (3, 10, "c"), (8, 99, "y")]


def test_merge_conditional_delete_only(spark, table):
    """Delete matched rows older than the source's ts; ignore new keys
    (an expiry feed)."""
    table.merge(
        _df(spark, [(1, 50, "_"), (2, 1, "_"), (6, 50, "_")]),
        when_matched="delete", when_not_matched="ignore",
        matched_condition=lambda s, t: s["ts"] > t["ts"],
    )
    assert _state(table) == [(2, 10, "b"), (3, 10, "c")]


def test_merge_matched_ignore_insert_only(spark, table):
    table.merge(
        _df(spark, [(1, 99, "CLOBBER"), (5, 1, "new")]),
        when_matched="ignore",
    )
    assert _state(table) == [
        (1, 10, "a"), (2, 10, "b"), (3, 10, "c"), (5, 1, "new")]


def test_merge_duplicate_source_pks_raise(spark, table):
    with pytest.raises(UserInputError, match="duplicate"):
        table.merge(_df(spark, [(2, 20, "x"), (2, 21, "y")]))
    # Nothing committed.
    assert _state(table) == [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")]


def test_merge_rejects_bad_clauses(spark, table):
    with pytest.raises(UserInputError):
        table.merge(_df(spark, []), when_matched="upsert")
    with pytest.raises(UserInputError):
        table.merge(_df(spark, []), when_not_matched="update")


def test_merge_rejects_reserved_column_names(spark, tmp_location):
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("__m", T.StringType()),
    ])
    ds = Dataset.create(spark, tmp_location, schema, ["k"])
    src = spark.createDataFrame([Row(k=1, __m="x")], schema)
    with pytest.raises(UserInputError, match="reserves"):
        ds.merge(src)


def test_merge_timestamp_pk_bloom_table_non_utc_session(spark,
                                                        tmp_location):
    """Compose the round's two riskiest changes: merge's matched probe
    rides read_by_keys over a bloom-enabled TIMESTAMP-PK table under a
    non-UTC session — a bloom false negative would silently turn an
    update into a duplicate-key insert attempt."""
    import datetime as dt

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ])
    base = dt.datetime(2024, 5, 1, tzinfo=dt.timezone.utc)
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        ds = Dataset.create(spark, tmp_location, schema, ["ts"],
                            bloom_filters=True)
        rows = [Row(ts=base + dt.timedelta(minutes=i), v=f"v{i}")
                for i in range(10)]
        ds.append(spark.createDataFrame(rows, schema).coalesce(1))
        src = spark.createDataFrame(
            [Row(ts=rows[3].ts, v="UPDATED"),
             Row(ts=base + dt.timedelta(days=9), v="NEW")], schema)
        ds.merge(src)
        got = {r["v"] for r in ds.reload().read().collect()}
        assert "UPDATED" in got and "NEW" in got
        assert "v3" not in got  # the matched row was replaced, not duped
        assert len(got) == 11
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


# ----------------------------------------------------- multi-clause (r10)


def test_merge_multi_clause_first_match_wins(spark, table):
    """Ordered WHEN MATCHED clauses with per-clause conditions: the
    FIRST matching clause fires, later ones never see the row — Delta
    semantics. Clause 1 catches newer rows (update), clause 2 deletes
    rows whose source v says so, leftovers stay untouched."""
    from pyspark.sql import functions as F

    table.merge(
        _df(spark, [
            (1, 30, "fresh"),    # clause 1: newer -> update
            (2, 5, "DROP"),      # clause 1 fails, clause 2 -> delete
            (3, 5, "stale"),     # neither -> untouched
            (9, 1, "new"),       # unmatched -> insert
        ]),
        when_matched=[
            {"action": "update",
             "condition": lambda s, t: s["ts"] > t["ts"]},
            {"action": "delete",
             "condition": lambda s, t: s["v"] == F.lit("DROP")},
        ],
    )
    assert _state(table) == [
        (1, 30, "fresh"), (3, 10, "c"), (9, 1, "new")]


def test_merge_overlapping_clauses_respect_order(spark, table):
    """A row matching BOTH clauses takes the first one; swapping the
    clause order flips the outcome — the ordering is semantic, not
    cosmetic."""
    src = [(2, 99, "both")]  # newer AND flagged for delete
    table.merge(
        _df(spark, src),
        when_matched=[
            {"action": "update",
             "condition": lambda s, t: s["ts"] > t["ts"]},
            {"action": "delete",
             "condition": lambda s, t: s["ts"] > t["ts"]},
        ],
    )
    assert (2, 99, "both") in _state(table)  # update won
    table.merge(
        _df(spark, [(2, 100, "again")]),
        when_matched=[
            {"action": "delete",
             "condition": lambda s, t: s["ts"] > t["ts"]},
            {"action": "update",
             "condition": lambda s, t: s["ts"] > t["ts"]},
        ],
    )
    assert 2 not in {k for k, _, _ in _state(table)}  # delete won


def test_merge_partial_update_set(spark, table):
    """UPDATE SET col=expr: listed columns take the clause expression,
    UNLISTED columns keep their TARGET value (not the source's)."""
    from pyspark.sql import functions as F

    table.merge(
        _df(spark, [(2, 77, "SRC_V_MUST_NOT_LAND")]),
        when_matched=[
            {"action": "update",
             "set": {"ts": lambda s, t: s["ts"] + t["ts"],
                     # plain literals and ready Columns work too
                     }},
        ],
        when_not_matched="ignore",
    )
    # ts = 77+10, v kept from target ("b"), k untouched.
    assert _state(table) == [(1, 10, "a"), (2, 87, "b"), (3, 10, "c")]
    table.merge(
        _df(spark, [(3, 0, "zzz")]),
        when_matched=[{"action": "update", "set": {"v": "LIT"}}],
        when_not_matched="ignore",
    )
    assert (3, 10, "LIT") in _state(table)


def test_merge_unconditional_clause_must_be_last(spark, table):
    with pytest.raises(UserInputError, match="unreachable"):
        table.merge(
            _df(spark, [(2, 20, "x")]),
            when_matched=[
                {"action": "delete"},
                {"action": "update",
                 "condition": lambda s, t: s["ts"] > t["ts"]},
            ],
        )


def test_merge_set_validation(spark, table):
    with pytest.raises(UserInputError, match="primary key"):
        table.merge(_df(spark, [(2, 20, "x")]),
                    when_matched=[{"action": "update",
                                   "set": {"k": 99}}])
    with pytest.raises(UserInputError, match="unknown columns"):
        table.merge(_df(spark, [(2, 20, "x")]),
                    when_matched=[{"action": "update",
                                   "set": {"nope": 1}}])
    with pytest.raises(UserInputError, match="only valid"):
        table.merge(_df(spark, [(2, 20, "x")]),
                    when_matched=[{"action": "delete", "set": {"v": "x"}}])
    with pytest.raises(UserInputError, match="update|delete"):
        table.merge(_df(spark, [(2, 20, "x")]),
                    when_matched=[{"action": "upsert"}])
    with pytest.raises(UserInputError, match="single-clause"):
        table.merge(_df(spark, [(2, 20, "x")]),
                    when_matched=[{"action": "delete"}],
                    matched_condition=lambda s, t: s["ts"] > t["ts"])


def test_merge_null_condition_is_not_matching(spark, table):
    """A clause condition evaluating to NULL (comparison against NULL)
    counts as not-matching — SQL MERGE semantics — and falls through
    to the next clause rather than poisoning the cascade."""
    table.merge(
        _df(spark, [(2, None, "nullts")]),
        when_matched=[
            {"action": "update",
             "condition": lambda s, t: s["ts"] > t["ts"]},  # NULL
            {"action": "update", "set": {"v": "fallback"}},
        ],
        when_not_matched="ignore",
    )
    assert (2, 10, "fallback") in _state(table)


def test_merge_nondeterministic_source_consistent(spark, table):
    """r9 verdict "What's wrong #1": the source feeds the probe, the
    join, the adds, and the delete keys as SEPARATE actions; a
    nondeterministic source re-evaluated between them could emit
    divergent matched sets — a row deleted but not re-inserted. The
    aligned source is pinned (localCheckpoint) before anything derives
    from it, so an update-merge can never lose rows."""
    import random as _random

    from pyspark.sql import functions as F
    from pyspark.sql import types as TT

    @F.udf(returnType=TT.DoubleType())
    def _jitter():
        return _random.random()

    coin = _jitter.asNondeterministic()
    base = _df(spark, [(k, 50, f"u{k}") for k in range(1, 4)] +
                       [(k, 50, f"n{k}") for k in range(100, 104)])
    for _ in range(3):
        src = base.where(coin() < 0.5)  # different rows per evaluation
        table.reload().merge(src)  # when_matched=update
        keys = {k for k, _, _ in _state(table)}
        # Updates never lose rows: the original 3 keys all survive.
        assert {1, 2, 3} <= keys, keys


def test_merge_multi_clause_releases_checkpoint_blocks(spark, table):
    """The pinned source's storage blocks release when merge returns
    (same discipline as apply_changes' own checkpoint) — a CDC loop
    must not leak one persisted RDD per merge."""
    jsc = spark.sparkContext._jsc
    before = {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}
    table.merge(
        _df(spark, [(1, 99, "x"), (50, 1, "y")]),
        when_matched=[{"action": "update",
                       "condition": lambda s, t: s["ts"] > t["ts"]}],
    )
    after = {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}
    assert after <= before, after - before


# ------------------------------------------- full Delta surface (r10)


def test_merge_conditional_insert(spark, table):
    """when_not_matched clause list: unmatched source rows insert only
    when their condition holds (source-only accessor); set overrides
    listed columns, unlisted take the source value."""
    table.merge(
        _df(spark, [(50, 7, "even-gate"), (51, 8, "even-gate"),
                    (2, 99, "upd")]),
        when_matched="update",
        when_not_matched=[
            {"action": "insert",
             "condition": lambda s: s["ts"] % 2 == 0,
             "set": {"v": lambda s: s["v"]}},
        ],
    )
    st_ = _state(table)
    assert (51, 8, "even-gate") in st_      # even ts -> inserted
    assert 50 not in {k for k, _, _ in st_}  # odd ts -> dropped
    assert (2, 99, "upd") in st_             # matched path unaffected


def test_merge_conditional_insert_first_match_and_set(spark, table):
    """Two insert clauses, first-match-wins, the second a fallback
    with a set override."""
    table.merge(
        _df(spark, [(60, 2, "a"), (61, 3, "b")]),
        when_not_matched=[
            {"action": "insert",
             "condition": lambda s: s["ts"] % 2 == 0},
            {"action": "insert", "set": {"v": "FALLBACK"}},
        ],
    )
    st_ = dict((k, (ts, v)) for k, ts, v in _state(table))
    assert st_[60] == (2, "a")          # clause 1: source row verbatim
    assert st_[61] == (3, "FALLBACK")   # clause 2: set override


def test_merge_not_matched_by_source(spark, table):
    """Delta's WHEN NOT MATCHED BY SOURCE: target rows whose key is
    absent from the source — first clause deletes stale rows, second
    marks survivors; rows matching neither stay untouched; matched
    rows follow the normal path."""
    table.reload().append(_df(spark, [(10, 10, "d"), (11, 10, "e")]))
    table.merge(
        _df(spark, [(1, 99, "touched")]),  # only key 1 in the source
        when_matched="update",
        when_not_matched="ignore",
        when_not_matched_by_source=[
            {"action": "delete",
             "condition": lambda t: t["k"] % 2 == 0},
            {"action": "update",
             "condition": lambda t: t["k"] > 4,
             "set": {"v": "STALE"}},
        ],
    )
    assert _state(table) == [
        (1, 99, "touched"),   # matched update
        (3, 10, "c"),         # by-source, matches neither clause
        (11, 10, "STALE"),    # by-source update (odd, > 4)
    ]  # 2 and 10 deleted (even)


def test_merge_by_source_update_requires_set(spark, table):
    with pytest.raises(UserInputError, match="requires set"):
        table.merge(
            _df(spark, [(1, 99, "x")]),
            when_not_matched_by_source=[{"action": "update"}],
        )
    with pytest.raises(UserInputError, match="only valid"):
        table.merge(
            _df(spark, [(1, 99, "x")]),
            when_not_matched_by_source=[
                {"action": "delete", "set": {"v": "x"}}],
        )


def test_merge_full_surface_single_commit(spark, table):
    """All three clause families in ONE merge — still exactly one
    snapshot commit, and time travel shows the pre-merge state."""
    v0 = table.current_snapshot_id
    table.merge(
        _df(spark, [(1, 99, "m"), (40, 1, "i-odd"), (41, 2, "i-even")]),
        when_matched=[{"action": "update", "set": {"ts": 99}}],
        when_not_matched=[
            {"action": "insert",
             "condition": lambda s: s["ts"] % 2 == 0}],
        when_not_matched_by_source=[
            {"action": "delete", "condition": lambda t: t["k"] == 3}],
    )
    assert table.current_snapshot_id == v0 + 1
    assert _state(table) == [
        (1, 99, "a"),        # partial update: v kept from target
        (2, 10, "b"),        # by-source, condition false -> untouched
        (41, 2, "i-even"),   # conditional insert
    ]  # 3 deleted by-source; 40 dropped (odd gate)
    old = sorted((r["k"], r["ts"]) for r in table.read(version=v0).collect())
    assert old == [(1, 10), (2, 10), (3, 10)]
