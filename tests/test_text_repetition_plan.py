"""Plan-shape and strategy-equivalence pins for repetition_stats
(round-6 verdict #4: the row_number-window formulation was the suite's
slowest, most variance-prone plan). The default map strategy must stay
shuffle-free; the agg strategy must stay window-free; both must agree
value-for-value."""

from pyspark.sql import functions as F

from space_spark.operators.text import repetition_stats

ROWS = [
    (1, "a b a b a b c d e"),
    (2, "one two three one two three one two three one two three"),
    (3, None),
    (4, ""),
    (5, "x " * 200),
    (6, "unique tokens only never repeat anything at all here"),
    # tie between two bigrams with different lengths: the lexicographic
    # winner decides the frac, so both strategies must pick the same one
    (7, "bb bb zz aa zz aa"),
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_strategies_agree(spark):
    m = repetition_stats(_docs(spark), "text", "doc_id",
                         strategy="map").orderBy("doc_id").collect()
    a = repetition_stats(_docs(spark), "text", "doc_id",
                         strategy="agg").orderBy("doc_id").collect()
    assert [tuple(r) for r in m] == [tuple(r) for r in a]
    by_id = {r["doc_id"]: r for r in m}
    # doc 5: "x "*200 -> len 400, 200 tokens "x" + trailing "" token;
    # top bigram "x x" count 199, frac = 199*3/400
    assert by_id[5]["top2gram_char_frac"] == round(199 * 3 / 400, 6)
    assert by_id[3]["top2gram_char_frac"] == 0.0
    assert by_id[4]["dup5gram_char_frac"] == 0.0


def test_map_plan_has_no_shuffle_and_no_window(spark):
    plan = repetition_stats(
        _docs(spark), "text", "doc_id", strategy="map"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange" not in plan  # literal input is already split; the
    # only exchange a parquet input may add is the _fan_out repartition


def test_map_plan_on_files_has_at_most_fanout_exchange(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    _docs(spark).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    plan = repetition_stats(
        df, "text", "doc_id", strategy="map"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") <= 1


def test_agg_plan_has_no_window(spark):
    plan = repetition_stats(
        _docs(spark), "text", "doc_id", strategy="agg"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
