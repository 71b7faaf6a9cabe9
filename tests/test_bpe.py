"""Real-BPE tokenization: the JVM-expression encoder must match a
reference priority-queue BPE encoder exactly (the sequential-replace
equivalence argued in operators/bpe.py), the trainer must reproduce
hand-computed merges, and the DuckDB SQL mirror must agree."""

import os
import random
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from space_spark.operators.bpe import (
    DEFAULT_MERGES,
    bpe_count_sql,
    bpe_learn_merges,
    bpe_pieces,
    bpe_token_count,
)

SF_DIR = os.environ.get("SPACE_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def ref_bpe(word, merges):
    """Reference encoder: repeatedly merge ALL occurrences of the
    lowest-ranked pair present (the classic GPT-2/subword-nmt loop) —
    deliberately the 'other' algorithm, so agreement with the
    sequential-replace expression is evidence, not tautology."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    syms = list(word)
    while True:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            return syms
        a, b = merges[best]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out


def ref_count(text, merges):
    if text is None:
        return 0
    total = 0
    for w in text.lower().strip().split():
        if w and all(0x21 <= ord(c) <= 0x7E for c in w):
            total += len(ref_bpe(w, merges))
        elif w:
            total += 1
    return total


def test_expression_matches_reference_encoder_on_corpus(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = {
        r["doc_id"]: (r["n"], r["pieces"])
        for r in docs.select(
            "doc_id",
            bpe_token_count(F.col("text")).alias("n"),
            bpe_pieces(F.col("text")).alias("pieces"),
        ).collect()
    }
    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    assert got, "empty corpus?"
    for doc_id, text in texts.items():
        n, pieces = got[doc_id]
        assert n == ref_count(text, DEFAULT_MERGES), doc_id
        assert n == len(pieces), doc_id
        # Pieces reassemble the normalized text exactly.
        assert "".join(pieces) == "".join(text.lower().strip().split())


def test_expression_matches_reference_on_adversarial_words(spark):
    """Random words over the merge alphabet — the overlap/chain cases
    ('aaaa', repeated pairs, merge-output-feeds-merge) where a wrong
    replace strategy diverges from the priority encoder."""
    rng = random.Random(7)
    alphabet = "aberintsowcu"
    words = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
             for _ in range(300)]
    words += ["aaaa", "erer", "ererer", "stst", "inin", "custocustomer",
              "keykey", "valuevalue", "orderorder", "x", ""]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "i long, text string"
    )
    got = {r["i"]: (r["n"], list(r["p"])) for r in df.select(
        "i",
        bpe_token_count(F.col("text")).alias("n"),
        bpe_pieces(F.col("text")).alias("p"),
    ).collect()}
    for i, w in enumerate(words):
        exp = ref_bpe(w, DEFAULT_MERGES) if w else []
        assert got[i][1] == exp, (w, got[i][1], exp)
        assert got[i][0] == len(exp)


def test_non_ascii_and_empty_handling(spark):
    df = spark.createDataFrame(
        [(1, "café naïve"), (2, ""), (3, None), (4, "  "),
         (5, "order café key")],
        "i long, text string",
    )
    got = {r["i"]: r["n"] for r in df.select(
        "i", bpe_token_count(F.col("text")).alias("n")).collect()}
    assert got[1] == 2          # two non-ASCII words -> 1 each
    assert got[2] == 0 and got[3] == 0 and got[4] == 0
    # 'order' -> 1 piece (learned), 'café' -> 1 UNK, 'key' -> 1 piece
    assert got[5] == 3


def test_sql_mirror_agrees_with_spark(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    sql = f"SELECT doc_id, {bpe_count_sql('text')} AS n FROM documents"
    for doc_id, n in con.execute(sql).fetchall():
        assert got[doc_id] == n, doc_id


def test_trainer_learns_hand_computed_merges(spark):
    # Corpus: 'aa ab aa ab aa' x freq — pair (a,a) 5x, (a,b) 4x... use
    # a corpus small enough to verify by hand:
    #   'low low low lower lower' : pairs (l,o) 5, (o,w) 5, (w,e) 2,
    #   (e,r) 2 -> first merge (l,o) [tie with (o,w), lexicographic],
    #   then (lo,w) 5, then (w,e)... after 'low': (low,e) 2, (e,r) 2
    #   -> tie, (e,r) < (low,e) lexicographically.
    df = spark.createDataFrame(
        [(1, "low low low lower lower")], "i long, text string"
    )
    merges = bpe_learn_merges(df, "text", n_merges=4)
    assert merges == [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]


def test_trainer_encoder_roundtrip_compresses(spark):
    """Encoding with a table learned FROM this corpus must compress it:
    BPE token count strictly below character count, and at most the
    whitespace token count times the longest word length."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    merges = bpe_learn_merges(docs, "text", n_merges=32)
    assert len(merges) == 32
    row = docs.select(
        F.sum(bpe_token_count(F.col("text"), merges)).alias("bpe"),
        F.sum(F.length(F.regexp_replace(F.lower(F.trim("text")),
                                        r"\s+", ""))).alias("chars"),
        F.sum(F.size(F.filter(
            F.split(F.lower(F.trim("text")), r"\s+"),
            lambda w: w != F.lit("")))).alias("ws"),
    ).collect()[0]
    assert row["ws"] <= row["bpe"] < row["chars"]


def test_property_random_tables_and_words_match_reference(spark):
    """Hypothesis-style sweep without per-example Spark jobs: train merge
    tables from RANDOM tiny corpora (training guarantees the topological
    rank order the sequential-replace equivalence relies on), then check
    the expression encoder against the reference priority encoder over
    random words — one Spark job per table, hundreds of words each."""
    rng = random.Random(42)
    alphabet = "abcdef"
    for trial in range(4):
        corpus_words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            for _ in range(60)
        ]
        cdf = spark.createDataFrame(
            [(1, " ".join(corpus_words))], "i long, text string"
        )
        merges = bpe_learn_merges(cdf, "text",
                                  n_merges=rng.randint(1, 24))
        words = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randint(1, 16)))
                 for _ in range(250)] + corpus_words
        wdf = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "i long, text string"
        )
        got = {r["i"]: (r["n"], list(r["p"])) for r in wdf.select(
            "i",
            bpe_token_count(F.col("text"), merges).alias("n"),
            bpe_pieces(F.col("text"), merges).alias("p"),
        ).collect()}
        for i, w in enumerate(words):
            exp = ref_bpe(w, merges)
            assert got[i][1] == exp, (trial, w, merges, got[i][1], exp)
            assert got[i][0] == len(exp)


def test_sql_mirror_survives_quote_symbols(spark):
    """Learned merges can contain the single-quote character (it's
    printable ASCII and appears in contractions); the generated oracle
    SQL must escape it — and agree with the Spark side."""
    merges = [("'", "s"), ("e", "'")]
    text = "''s e' x"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT '''''s e'' x' AS text")
    n = con.execute(
        f"SELECT {bpe_count_sql('text', merges)} AS n FROM documents"
    ).fetchone()[0]
    # words: ''s -> [' , 's] = 2;  e' -> [e'] = 1;  x -> 1
    assert n == 4
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(
        bpe_token_count(F.col("text"), merges).alias("n")).collect()[0]["n"]
    assert got == n
