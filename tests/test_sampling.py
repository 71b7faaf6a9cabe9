"""Deterministic sampling/split operators: stability and exactness."""

import math

import pytest
from pyspark.sql import functions as F

from space_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source")


def test_split_partitions_every_row_once(docs):
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = dict(
        (r["split"], r["n"])
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)


def test_split_stable_under_repartition(docs):
    a = {
        (r["doc_id"], r["split"])
        for r in hash_split(docs, "doc_id", {"a": 0.5, "b": 0.5}).collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in hash_split(
            docs.repartition(13), "doc_id", {"a": 0.5, "b": 0.5}
        ).collect()
    }
    assert a == b


def test_split_membership_stable_under_append(docs):
    """A row's assignment is a function of its id alone: growing the
    corpus never reassigns existing rows (the property rand() lacks)."""
    half = docs.where(F.col("doc_id") < 250)
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    small = {
        (r["doc_id"], r["split"])
        for r in hash_split(half, "doc_id", w).collect()
    }
    full = {
        (r["doc_id"], r["split"])
        for r in hash_split(docs, "doc_id", w).collect()
        if r["doc_id"] < 250
    }
    assert small == full


def test_split_weights_validated(docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.3})


def test_hash_sample_fraction_and_determinism(docs):
    s1 = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect())
    s2 = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect())
    assert s1 == s2
    n = docs.count()
    assert 0.1 * n < len(s1) < 0.3 * n  # ~20% within loose bounds
    assert len(set(s1)) == len(s1)


def test_stratified_exact_per_stratum(docs):
    frac = 0.1
    out = stratified_sample(docs, "source", frac, "doc_id")
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["source"]: math.ceil(r["n"] * frac)
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got == want  # EVERY stratum contributes exactly ceil(frac*n)


def test_chunk_documents_covers_all_tokens(spark):
    """Every token appears in some chunk; overlap duplicates exactly the
    stride-boundary tokens; tail chunk may be short."""
    from space_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1)
    rows = {(r["doc"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
            for r in out.collect()}
    assert rows[(1, 1)] == ("a b c d", 4)
    assert rows[(1, 2)] == ("d e f g", 4)
    assert rows[(1, 3)] == ("g", 1)
    assert rows[(2, 1)] == ("x", 1)
    assert (3, 1) in rows  # '' tokenizes to [''] — one empty chunk

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_pack_offsets_matches_global_cumsum(spark):
    """Two-phase distributed prefix sum == the naive global window."""
    from space_spark.operators.packing import pack_offsets

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 17 + 1).alias("n")
    )
    out = {
        r["id"]: (r["offset"], r["bin_id"])
        for r in pack_offsets(df, "id", "n", context_len=64,
                              num_partitions=7).collect()
    }
    rows = sorted(df.collect(), key=lambda r: r["id"])
    acc = 0
    for r in rows:
        assert out[r["id"]] == (acc, acc // 64), r["id"]
        acc += r["n"]


def test_domain_mix_exact_quotas(spark):
    """Kept counts hit floor(w_g * T) exactly; membership deterministic."""
    from space_spark.operators.sampling import domain_mix_sample

    df = spark.range(300).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 6, "en")
        .when(F.col("id") % 10 < 9, "fr")
        .otherwise("zh")
        .alias("lang"),
    )
    # counts: en=180, fr=90, zh=30; weights .5/.3/.2 ->
    # T = min(360, 300, 150) = 150 -> quotas en=75, fr=45, zh=30
    out = domain_mix_sample(
        df, "lang", "id", {"en": 0.5, "fr": 0.3, "zh": 0.2}
    )
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 75, "fr": 45, "zh": 30}
    # Deterministic: same call returns the identical id set.
    ids1 = {r["id"] for r in out.collect()}
    ids2 = {r["id"] for r in domain_mix_sample(
        df, "lang", "id", {"en": 0.5, "fr": 0.3, "zh": 0.2}).collect()}
    assert ids1 == ids2
    # Groups without weight are dropped entirely.
    out2 = domain_mix_sample(df, "lang", "id", {"en": 1.0})
    assert out2.select("lang").distinct().collect()[0]["lang"] == "en"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        domain_mix_sample(df, "lang", "id", {"en": 0.0})

    # A weights key with NO rows makes the target mix unsatisfiable:
    # the eager guard raises instead of silently shipping the remaining
    # groups at full quota — including when EVERY weighted group is
    # absent (an in-plan raise_error would never evaluate on an empty
    # surviving row set).
    with _pytest.raises(ValueError, match="no rows in the data"):
        domain_mix_sample(df, "lang", "id", {"en": 0.6, "de": 0.4})
    with _pytest.raises(ValueError, match="no rows in the data"):
        domain_mix_sample(df, "lang", "id", {"xx": 0.5, "yy": 0.5})


def test_weighted_sample_clamps_and_is_deterministic(spark):
    from space_spark.operators.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id"),
        # weights spanning <0, [0,1], >1 — clamped to [0,1]
        ((F.col("id") % 30) / 10.0 - 0.5).alias("w"),
    )
    out = weighted_sample(df, "w", "id")
    rows = out.collect()
    ids1 = {r["id"] for r in rows}
    # w <= 0 rows can never be kept; w >= 1 rows are always kept
    assert all((r["w"] > 0) for r in rows)
    always = {r["id"] for r in df.where("w >= 1.0").collect()}
    assert always <= ids1
    # deterministic
    ids2 = {r["id"] for r in weighted_sample(df, "w", "id").collect()}
    assert ids1 == ids2


def test_random_projection_preserves_relative_distance(spark):
    """JL sanity: projections of identical vectors coincide; orthogonal
    far vectors stay far apart relative to that."""
    from space_spark.operators.similarity import random_projection

    rows = [
        (0, [1.0] * 64),
        (1, [1.0] * 64),               # identical to 0
        (2, [-1.0] * 64),              # opposite
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: list(r["proj"])
           for r in random_projection(emb, "vec_id", "embedding",
                                      out_dim=8).collect()}
    assert out[0] == out[1]
    d01 = sum((a - b) ** 2 for a, b in zip(out[0], out[1]))
    d02 = sum((a - b) ** 2 for a, b in zip(out[0], out[2]))
    assert d01 == 0.0 and d02 > 1.0


def test_temperature_mix_quotas_and_bounds(spark):
    """alpha=0.5 keeps floor(sqrt(n_g * n_min)) per group: the smallest
    group survives whole, larger groups flatten toward it; alpha=1 keeps
    everything; alpha=0 caps all groups at n_min."""
    from space_spark.operators.sampling import temperature_mix_sample

    df = spark.range(260).select(
        F.col("id"),
        F.when(F.col("id") < 200, "en")
        .when(F.col("id") < 250, "fr")
        .otherwise("zh")
        .alias("lang"),
    )  # en=200, fr=50, zh=10
    out = temperature_mix_sample(df, "lang", "id", alpha=0.5)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # floor(sqrt(200*10))=44, floor(sqrt(50*10))=22, zh kept whole
    assert counts == {"en": 44, "fr": 22, "zh": 10}
    assert temperature_mix_sample(df, "lang", "id", alpha=1.0).count() == 260
    c0 = {r["lang"]: r["n"] for r in
          temperature_mix_sample(df, "lang", "id", alpha=0.0)
          .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert c0 == {"en": 10, "fr": 10, "zh": 10}
    # deterministic membership
    ids1 = {r["id"] for r in out.collect()}
    ids2 = {r["id"] for r in
            temperature_mix_sample(df, "lang", "id", alpha=0.5).collect()}
    assert ids1 == ids2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_mix_sample(df, "lang", "id", alpha=1.5)
