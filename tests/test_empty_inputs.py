"""Every analytics operator must handle empty input without crashing."""

import pytest
from pyspark.sql import types as T

from space_spark.operators import dedup, joins, similarity, text


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string"
    )


@pytest.fixture()
def empty_emb(spark):
    return spark.createDataFrame(
        [], T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ])
    )


def test_dedup_ops_empty(spark, empty_docs):
    assert dedup.exact_dedup(empty_docs, ["text"], "doc_id").count() == 0
    assert dedup.duplicate_groups(empty_docs, ["text"], "doc_id").count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs, "doc_id", "text").count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs, "doc_id", "text").count() == 0
    assert dedup.simhash_pairs(empty_docs, "doc_id", "text").count() == 0


def test_text_ops_empty(spark, empty_docs):
    assert text.with_text_stats(empty_docs, "text").count() == 0


def test_similarity_ops_empty(spark, empty_emb):
    assert similarity.cosine_topk(empty_emb, empty_emb).count() == 0
    assert similarity.lsh_bucket_topk(empty_emb, empty_emb).count() == 0
    assert similarity.neardup_pairs(empty_emb, exact=False).count() == 0


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame([], "k long, t long, v string")
    got = joins.asof_join(left, right, on="t", by="k").collect()
    assert len(got) == 1 and got[0].v_asof is None


def test_range_join_empty(spark):
    pts = spark.createDataFrame([], "pid long, x double")
    bands = spark.createDataFrame([("b", 0.0, 1.0)],
                                  "band string, lo double, hi double")
    assert joins.range_join(pts, bands, "x", "lo", "hi").count() == 0


def test_new_text_and_sampling_ops_empty(spark):
    from space_spark.operators.sampling import temperature_mix_sample
    from space_spark.operators.text import c4_rules, unigram_logprob

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert c4_rules(empty_docs, "text").count() == 0
    assert unigram_logprob(empty_docs, "doc_id", "text").count() == 0
    empty_lang = spark.createDataFrame([], "doc_id long, lang string")
    assert temperature_mix_sample(empty_lang, "lang", "doc_id").count() == 0


def test_unigram_logprob_zero_token_docs_survive(spark):
    from space_spark.operators.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b a")], "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["n_scored"])
           for r in unigram_logprob(docs, "doc_id", "text").collect()}
    assert out[1] == (0, 0) and out[2] == (0, 0)
    assert out[3][0] == 3
