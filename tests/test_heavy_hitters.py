"""heavy_hitters: two-pass (Misra-Gries sketch -> exact recount)
frequent-token mining. The contract is EXACTNESS — identical output to
a full groupBy — with a shuffle bounded by partitions*k + |candidates|.
"""

import pytest
from pyspark.sql import functions as F

from space_spark.operators.text import heavy_hitters, tokens


def _exact(df, text_col, ppm):
    toks = df.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    total = toks.count()
    return sorted(
        (r.token, r.freq)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") * 1_000_000 >= ppm * total)
        .collect()
    )


@pytest.fixture(scope="module")
def docs(spark):
    # Zipf-ish corpus: few heavy tokens + a long unique tail, spread
    # over several partitions so per-partition sketches actually merge.
    rows = spark.sql(
        "SELECT id, CASE"
        "  WHEN id % 2 = 0 THEN concat('alpha beta tail', id)"
        "  WHEN id % 3 = 0 THEN concat('alpha gamma tail', id)"
        "  ELSE concat('delta tail', id, 'x tail', id, 'y') END AS text "
        "FROM range(0, 3000)"
    ).repartition(8)
    rows.persist().count()
    yield rows
    rows.unpersist()


@pytest.mark.parametrize("ppm", [200_000, 50_000, 5_000])
def test_matches_exact_groupby(spark, docs, ppm):
    got = sorted(
        (r.token, r.freq)
        for r in heavy_hitters(docs, "text", ppm).collect()
    )
    assert got == _exact(docs, "text", ppm)
    assert got, "fixture should produce at least one heavy hitter"


def test_tiny_sketch_still_exact(spark, docs):
    # Even a deliberately undersized-but-valid k (= ceil(1/eps)) keeps
    # the superset guarantee; recount restores exactness.
    ppm = 100_000
    got = sorted(
        (r.token, r.freq)
        for r in heavy_hitters(docs, "text", ppm, sketch_k=10).collect()
    )
    assert got == _exact(docs, "text", ppm)


def test_empty_corpus(spark):
    empty = spark.sql("SELECT CAST(NULL AS STRING) AS text").where(
        F.lit(False)
    )
    assert heavy_hitters(empty, "text", 1000).count() == 0


def test_threshold_validation(spark, docs):
    with pytest.raises(ValueError):
        heavy_hitters(docs, "text", 0)
    with pytest.raises(ValueError):
        heavy_hitters(docs, "text", 2_000_000)


def test_sketch_rows_bounded(spark, docs):
    # The candidate exchange is O(partitions * k), independent of the
    # number of distinct tokens (~6000 tail tokens in the fixture).
    import math

    ppm = 50_000
    k = math.ceil(2_000_000 / ppm)
    toks = docs.select(
        F.explode(tokens(F.col("text"))).alias("token")
    ).where(F.col("token") != "")
    n_parts = toks.rdd.getNumPartitions()
    cand = heavy_hitters(docs, "text", ppm)
    # Bound check via the plan inputs: distinct tail >> partitions*k.
    distinct_tokens = toks.distinct().count()
    assert distinct_tokens > n_parts * (k + 1)
    assert cand.count() < n_parts * (k + 1)
