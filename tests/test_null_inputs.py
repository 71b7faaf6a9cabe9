"""NULL-tolerance sweep: a 100 TB crawl always contains null text /
null embeddings; every operator must process such rows without
crashing, treating null text as empty (the documented coalesce) and
null vectors as absent candidates — never poisoning the whole job."""

import pytest
from pyspark.sql import types as T

from space_spark.operators import dedup, sampling, similarity, text

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, None),
    (3, ""),
    (4, "the quick brown fox jumps over the lazy dog"),
    (5, "   "),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_dedup_ops_tolerate_null_text(spark, docs):
    assert len(dedup.exact_dedup(docs, ["text"], "doc_id").collect()) <= 5
    jac = dedup.ngram_jaccard_pairs(docs, "doc_id", "text").collect()
    assert len(jac) >= 1 and all(r["jaccard"] is not None for r in jac)
    assert len(
        dedup.minhash_lsh_pairs(docs, "doc_id", "text").collect()
    ) >= 0
    out = {r["doc_id"]: r for r in
           dedup.dedup_substrings(docs, "doc_id", "text",
                                  window=4).collect()}
    assert len(out) == 5
    # The null-text doc flows through the untouched branch as empty.
    assert out[2]["text"] == "" and out[2]["n_kept"] == 0
    # One of the two identical docs loses its duplicated window.
    assert {out[1]["n_dropped"], out[4]["n_dropped"]} != {0}
    lines = dedup.dedup_lines(docs, "doc_id", "text")
    assert lines.count() == 5


def test_text_ops_tolerate_null_text(spark, docs):
    # collect(), not count(): count() prunes computed columns, so e.g.
    # a DIVIDE_BY_ZERO hiding in a ratio column never evaluates (the
    # empty-doc crash in repetition_stats slipped past a count check).
    assert len(text.with_text_stats(docs, "text").collect()) == 5
    assert len(text.gopher_quality_flags(docs, "text").collect()) == 5
    assert len(text.c4_rules(docs, "text").collect()) == 5
    rep = {r["doc_id"]: r
           for r in text.repetition_stats(docs, "text",
                                          "doc_id").collect()}
    assert len(rep) == 5
    # Zero-length docs (null/empty text) score 0 everywhere.
    for d in (2, 3):
        assert rep[d]["dup5gram_char_frac"] == 0.0
        assert rep[d]["top2gram_char_frac"] == 0.0
    assert len(text.unigram_logprob(docs, "doc_id",
                                    "text").collect()) == 5


def test_sampling_tolerates_null_text(spark, docs):
    out = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "test": 0.2}
    )
    assert out.count() == 5


def test_similarity_excludes_null_embeddings(spark):
    """Null vectors must be EXCLUDED from retrieval, not surfaced as
    null-scored matches (the pre-fix behavior: a null-embedding query
    emitted k neighbors with NULL scores)."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0]), (4, [1.0, 0.1])],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]),
    )
    out = similarity.cosine_topk(emb, emb, "vec_id", "embedding",
                                 k=2).collect()
    assert out and all(r["score"] is not None for r in out)
    assert all(r["query_id"] != 2 and r["neighbor_id"] != 2 for r in out)
    pairs = similarity.neardup_pairs(emb, "vec_id", "embedding",
                                     threshold=0.5).collect()
    assert all(r["score"] is not None for r in pairs)
    sd = similarity.semantic_dedup(emb, "vec_id", "embedding",
                                   n_clusters=2, threshold=0.5)
    assert 2 not in {r["vec_id"] for r in sd.collect()}


def test_similarity_excludes_zero_and_nan_vectors(spark):
    """A zero-norm vector KILLS the whole job under Spark's default
    ANSI mode (DIVIDE_BY_ZERO in the score division) and a NaN
    component would rank above every real score (NaN sorts largest in
    Spark's double ordering). Both must drop out of retrieval."""
    nan = float("nan")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [nan, 1.0]), (3, [0.0, 1.0]),
         (4, [0.0, 0.0]), (5, [1.0, 0.1])],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]),
    )
    bad = {2, 4}
    out = similarity.cosine_topk(emb, emb, "vec_id", "embedding",
                                 k=2).collect()
    assert out and all(
        r["score"] is not None and r["score"] == r["score"] for r in out
    )
    assert all(r["query_id"] not in bad and r["neighbor_id"] not in bad
               for r in out)
    lsh = similarity.lsh_bucket_topk(emb, emb, "vec_id", "embedding",
                                     k=2, dim=2).collect()
    assert all(r["query_id"] not in bad and r["neighbor_id"] not in bad
               for r in lsh)
    pairs = similarity.neardup_pairs(emb, "vec_id", "embedding",
                                     threshold=0.5, dim=2).collect()
    assert all(r["id_a"] not in bad and r["id_b"] not in bad
               for r in pairs)
    sd = similarity.semantic_dedup(emb, "vec_id", "embedding",
                                   n_clusters=2, threshold=0.5)
    assert bad & {r["vec_id"] for r in sd.collect()} == set()
    ivf = similarity.ivf_topk(emb, emb, "vec_id", "embedding", k=2,
                              n_centroids=2, n_probe=2).collect()
    assert all(r["query_id"] not in bad and r["neighbor_id"] not in bad
               for r in ivf)


def test_null_primary_keys_rejected_at_ingress(spark, tmp_path):
    """Space primary keys are NOT NULL: a null key can never be matched
    by upsert/delete-by-key/point reads, so every write path must
    reject it loudly at ingress (detected from the footer null counts
    the stats pass already reads — no extra job), instead of the old
    internal TypeError from a None in driver-side stats merging."""
    import tempfile

    from pyspark.sql import Row

    from space_spark import Dataset
    from space_spark.errors import UserInputError
    from space_spark.sources.loaders import append_parquet

    schema = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    ds = Dataset.create(spark, str(tmp_path / "t"), schema, ["pk"])
    bad = spark.createDataFrame([Row(pk=None, v=1), Row(pk=2, v=2)],
                                schema)
    for op in (ds.append, ds.insert, ds.upsert):
        with pytest.raises(UserInputError, match="NOT NULL"):
            op(bad)
    # Zero-copy ingestion enforces the same contract on foreign files.
    ext = tempfile.mkdtemp(prefix="nullpk_ext_")
    bad.coalesce(1).write.mode("overwrite").parquet(ext + "/f")
    with pytest.raises(UserInputError, match="NOT NULL"):
        append_parquet(ds, ext + "/f/part-*.parquet")
    # The table remains clean and writable; orphans vacuum away.
    ds.append(spark.createDataFrame([Row(pk=5, v=5)], schema))
    assert ds.read().count() == 1
    ds.vacuum()
    assert ds.read().count() == 1


def test_quantize_survives_nonfinite_vectors(spark):
    """NaN/Inf components have no finite quantization scale and used to
    die in the ANSI int cast (CAST_OVERFLOW: NaN -> INT); they quantize
    to zeros with scale 0, like zero vectors."""
    nan, inf = float("nan"), float("inf")
    emb = spark.createDataFrame(
        [(1, [2.0, -4.0]), (2, [nan, 1.0]), (3, [inf, 1.0]),
         (4, [0.0, 0.0])],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]),
    )
    out = {r["id"]: r for r in
           similarity.quantize_int8(emb, "vec_id", "embedding").collect()}
    assert out[1]["scale"] > 0 and out[1]["q"] == [64, -127]
    for bad_id in (2, 3, 4):
        assert out[bad_id]["scale"] == 0.0
        assert out[bad_id]["q"] == [0, 0]
