"""Production-vocab BPE (round-9 verdict #3): the Arrow-batched encoder
(`bpe_pieces_batched` / `bpe_token_count_batched`) must be
bit-equivalent to the JVM framed-replace path — which stays the
registered, oracle-verified spec — while scaling to merge tables the
JVM expression chain cannot (one `replace` per merge). Also pins the
ADVICE-r8 fixes: US-sentinel input stripping and merge-table
precondition validation."""

import os
import random
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from space_spark.operators.bpe import (
    DEFAULT_MERGES,
    bpe_learn_merges,
    bpe_pieces,
    bpe_pieces_batched,
    bpe_token_count,
    bpe_token_count_batched,
    validate_merges,
)

SF_DIR = os.environ.get("SPACE_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _assert_paths_agree(spark, texts, merges=None):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = df.select(
        "i",
        bpe_pieces(F.col("text"), merges).alias("pj"),
        bpe_token_count(F.col("text"), merges).alias("nj"),
        bpe_pieces_batched(F.col("text"), merges).alias("pb"),
        bpe_token_count_batched(F.col("text"), merges).alias("nb"),
    ).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert list(r["pj"]) == list(r["pb"]), (texts[r["i"]], r["pj"],
                                                r["pb"])
        assert r["nj"] == r["nb"] == len(r["pj"]), texts[r["i"]]


def test_batched_equals_jvm_on_corpus(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    bad = docs.select(
        (bpe_pieces(F.col("text")) != bpe_pieces_batched(F.col("text")))
        .alias("diff")
    ).where("diff").count()
    assert bad == 0


def test_batched_equals_jvm_on_edge_inputs(spark):
    texts = [
        None, "", "   ", "order key value", "ORDER Key",
        "café naïve order",            # UNK words pass through
        "a\x1fb order",                          # embedded US sentinel
        "\x1f\x1f", "\x1f",                      # US-only words vanish
        "x\x01y",                                # interior control char: UNK
        "\x01order\x01",                         # edge control chars: UNK
        "\torder\n value \x0b",                  # Java \s split classes
        "aaaa erer custocustomer",
        "it's can't 'quoted'",
    ]
    _assert_paths_agree(spark, texts)


def test_batched_equals_jvm_on_random_trained_tables(spark):
    rng = random.Random(99)
    alphabet = "abcdef"
    for _ in range(3):
        corpus = " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            for _ in range(80)
        )
        cdf = spark.createDataFrame([(1, corpus)], "i long, text string")
        merges = bpe_learn_merges(cdf, "text", n_merges=rng.randint(2, 24))
        words = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randint(1, 16)))
                 for _ in range(120)]
        _assert_paths_agree(spark, [" ".join(words[i:i + 6])
                                    for i in range(0, 120, 6)], merges)


def _synthetic_trained_table(n: int):
    """A trained-ORDERED table of n merges, built constructively:
    every component is a single char or an earlier output, so
    validate_merges accepts it (the property a real trainer guarantees)."""
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    outputs = list(alphabet)
    merges = []
    for i in range(n):
        a = outputs[i % len(outputs)]  # a char or an EARLIER output
        b = alphabet[i % 26]
        merges.append((a, b))
        outputs.append(a + b)
    return merges


def test_batched_handles_production_vocab_size(spark):
    """32k merges: validate + encode completes through the batched path
    (the JVM chain would materialize 32k nested replaces — see the
    measured sweep in SCALE.md)."""
    merges = _synthetic_trained_table(32_768)
    validate_merges(merges)
    df = spark.createDataFrame(
        [(i, "abcabc zzyzx order data " * 3) for i in range(64)],
        "i long, text string",
    )
    rows = df.select(
        bpe_token_count_batched(F.col("text"), merges).alias("n")
    ).collect()
    assert len(rows) == 64 and all(r["n"] > 0 for r in rows)


def test_validate_merges_rejects_untrained_order():
    with pytest.raises(ValueError, match="earlier merge"):
        validate_merges([("ab", "c"), ("a", "b")])
    validate_merges([("a", "b"), ("ab", "c")])  # trained order: fine
    validate_merges(DEFAULT_MERGES)


def test_jvm_path_rejects_untrained_order(spark):
    with pytest.raises(ValueError, match="earlier merge"):
        bpe_token_count(F.lit("abc"), [("ab", "c"), ("a", "b")])


def test_us_sentinel_count_matches_sql_oracle(spark):
    """ADVICE r8: a document containing the framing sentinel \\x1f must
    count identically in Spark and the DuckDB oracle (v1 diverged: the
    embedded byte inflated the Spark count)."""
    import duckdb

    from space_spark.operators.bpe import bpe_count_sql

    texts = ["a\x1fb order", "\x1f", "or\x1fder", "x \x1f y"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {r["i"]: r["n"] for r in df.select(
        "i", bpe_token_count(F.col("text")).alias("n")).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        lit = t.replace("'", "''")
        n = con.execute(
            f"SELECT {bpe_count_sql(f'''CAST('{lit}' AS VARCHAR)''')}"
        ).fetchone()[0]
        assert got[i] == n, (t, got[i], n)


def test_encoder_memo_lru_keeps_hot_entry():
    """r9 verdict "What's wrong #2": eviction must keep the entry being
    returned (and recently used ones) — the old clear-all made an
    alternating-table caller rebuild the rank dict every batch."""
    from space_spark.operators import bpe as bpe_mod

    saved = dict(bpe_mod._ENCODER_MEMO)
    bpe_mod._ENCODER_MEMO.clear()
    try:
        tables = [tuple([(chr(ord("a") + i), "z")]) for i in range(12)]
        encoders = [bpe_mod._encoder_for(t) for t in tables]
        # Memo is capped...
        assert len(bpe_mod._ENCODER_MEMO) <= 8
        # ...and the most recent entry survived the eviction churn:
        assert bpe_mod._encoder_for(tables[-1]) is encoders[-1]
        # LRU, not clear-all: the second-most-recent also survived.
        assert bpe_mod._encoder_for(tables[-2]) is encoders[-2]
        # A hit refreshes recency: touch tables[-1], add new tables, and
        # tables[-1] must outlive entries that were older at eviction.
        bpe_mod._encoder_for(tables[-1])
        for t in [tuple([(str(i), "q")]) for i in range(6)]:
            bpe_mod._encoder_for(t)
        assert bpe_mod._encoder_for(tables[-1]) is encoders[-1]
    finally:
        bpe_mod._ENCODER_MEMO.clear()
        bpe_mod._ENCODER_MEMO.update(saved)
