"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, fingerprinting.

These are additive capabilities beyond the reference (google/space has no
scalar-function library — SURVEY.md §2.5); they are the operations an
LLM-data pipeline runs over a ``documents`` table at 100 TB, so every one
is pure JVM-side ``pyspark.sql.functions`` (whole-stage codegen, no Python
in the hot path) and embarrassingly parallel (no shuffle).

All outputs are deterministic and reproducible in ANSI SQL, so each has a
DuckDB oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny stopword lists for the n-gram/stopword language-ID heuristic.
# Deterministic and mirrored verbatim in the SQL oracle.
LANG_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein"],
}
LANG_ORDER = ["de", "en", "es", "fr"]  # deterministic tie-break order


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9 ]", "")
    return F.when(F.length(text) > 0,
                  F.length(stripped) / F.length(text)).otherwise(F.lit(0.0))


def distinct_token_ratio(text: Column) -> Column:
    toks = tokens(text)
    return F.when(F.size(toks) > 0,
                  F.size(F.array_distinct(toks)) / F.size(toks)
                  ).otherwise(F.lit(0.0))


def stopword_count(text: Column, stopwords: List[str]) -> Column:
    lits = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(lits, t)))


def stopword_ratio(text: Column, stopwords: List[str]) -> Column:
    toks = tokens(text)
    return F.when(F.size(toks) > 0,
                  stopword_count(text, stopwords) / F.size(toks)
                  ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic heuristic quality score in [0,1]: rewards reasonable
    length, low punctuation density, lexical diversity and stopword
    presence (the standard cheap pre-filters for LLM corpus cleaning)."""
    length_score = F.least(token_count(text) / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(text, LANG_STOPWORDS["en"])
    return F.round(
        0.3 * length_score
        + 0.3 * (1.0 - punct_ratio(text))
        + 0.2 * distinct_token_ratio(text)
        + 0.2 * F.least(sw * 5.0, F.lit(1.0)),
        6,
    )


def lang_id(text: Column) -> Column:
    """Stopword-count language ID with deterministic tie-break (first in
    LANG_ORDER wins ties)."""
    scores = {lang: stopword_count(text, LANG_STOPWORDS[lang])
              for lang in LANG_ORDER}
    result = F.lit("unknown")
    best = F.lit(-1)
    # Build a left-to-right argmax: strictly-greater keeps the earlier
    # language on ties.
    for lang in LANG_ORDER:
        cond = scores[lang] > best
        result = F.when(cond, F.lit(lang)).otherwise(result)
        best = F.when(cond, scores[lang]).otherwise(best)
    return F.when(best <= 0, F.lit("unknown")).otherwise(result)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    md5 (not xxhash) so the exact same value is computable in any SQL
    engine for cross-checking."""
    normalized = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(normalized)


def vocab_topk(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Corpus vocabulary: the ``k`` most frequent tokens with counts
    (count desc, token asc — deterministic). One explode + hash-shuffle
    aggregate with map-side partial counts; the classic first step of
    tokenizer/vocab construction over a training corpus."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    return (
        toks.where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
    )


def tf_idf_top_terms(
    df: DataFrame, id_col: str, text_col: str, top_n: int = 3
) -> DataFrame:
    """Top-``top_n`` TF-IDF terms per document: score = tf * ln(N / df),
    rounded before ranking (score desc, term asc) so results are
    engine-independent. Term frequencies and document frequencies are one
    explode + two hash aggregates; the document-frequency side joins back
    by term (shuffle join — the term dictionary can exceed broadcast size
    at corpus scale)."""
    n_docs = df.count()
    terms = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        terms.dropDuplicates(["doc", "term"])
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = tf.join(dfreq, on="term").withColumn(
        "score",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4),
    )
    w = (
        Window.partitionBy("doc")
        .orderBy(F.col("score").desc(), F.col("term").asc())
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("doc", "term", "tf", "df", "score", "rank")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into fixed-token-window chunks with optional
    overlap — the sequence-windowing step of an LLM training pipeline
    (context-length packing preprocessing, RAG chunking).

    Chunk starts are 1, 1+stride, ... <= n_tokens (stride = chunk_tokens
    - overlap), so every token is covered and the tail chunk may be
    short. Pure JVM higher-order functions (sequence/slice/concat_ws) +
    one explode: embarrassingly parallel, no shuffle, and exactly
    reproducible in SQL (generate_series + list slicing)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc"), toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    out = base.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("__n"), F.lit(stride)),
                lambda s: F.slice(F.col("__toks"), s, chunk_tokens),
            )
        ).alias("__i", "__chunk"),
    )
    return out.select(
        "doc",
        (F.col("__i") + 1).cast("long").alias("chunk_id"),
        F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
        F.size("__chunk").cast("long").alias("n_tokens"),
    )


# GPT-2-style pre-tokenizer chunks, restricted to the Java-regex/RE2
# common dialect (the original's \s+(?!\S) lookahead is dropped — RE2 has
# no lookaround): a token is an optionally space-prefixed letter run,
# digit run, or punctuation run. Whitespace itself is not a token.
BPE_TOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_count_bpe(text: Column) -> Column:
    """Subword-style token count: the number of BPE pre-tokenizer chunks
    — a far better LLM-token estimate than whitespace splitting (which
    undercounts punctuation-heavy and number-heavy text)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/quality signals per document (Rae et al.
    2021, §A1.1 — the standard cheap corpus filters): mean word length,
    alphabetic-word fraction, duplicate-line fraction, bullet-point and
    ellipsis line fractions, symbol-per-word ratio, plus the combined
    ``gopher_pass`` accept flag.

    Pure JVM higher-order functions over one split of the text (no
    shuffle, embarrassingly parallel); every ratio divides exact integer
    counts and is rounded to 6 places, so the values — and the boolean
    threshold flag computed from them — are bit-reproducible in ANSI SQL.
    """
    t = F.col(text_col)
    out = df.withColumn("__words", F.split(F.trim(t), r"\s+")).withColumn(
        "__lines", F.split(t, "\n")
    )
    w, ln = F.col("__words"), F.col("__lines")
    nw, nl = F.size(w), F.size(ln)
    word_chars = F.aggregate(
        w, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    alpha_words = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    bullet_lines = F.size(
        F.filter(ln, lambda x: x.rlike(r"^\s*[-*•]"))
    )
    ellipsis_lines = F.size(F.filter(ln, lambda x: x.rlike(r"\.\.\.$")))
    hash_count = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    ell_count = (
        F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))
    ) / 3
    out = out.select(
        *df.columns,
        nw.alias("n_words"),
        token_count_bpe(t).alias("n_tokens_bpe"),
        nl.alias("n_lines"),
        F.round(F.when(nw > 0, word_chars / nw).otherwise(F.lit(0.0)), 6)
        .alias("mean_word_len"),
        F.round(F.when(nw > 0, alpha_words / nw).otherwise(F.lit(0.0)), 6)
        .alias("alpha_word_frac"),
        F.round(
            F.when(nl > 0, 1 - F.size(F.array_distinct(ln)) / nl)
            .otherwise(F.lit(0.0)), 6,
        ).alias("dup_line_frac"),
        F.round(F.when(nl > 0, bullet_lines / nl).otherwise(F.lit(0.0)), 6)
        .alias("bullet_line_frac"),
        F.round(
            F.when(nl > 0, ellipsis_lines / nl).otherwise(F.lit(0.0)), 6
        ).alias("ellipsis_line_frac"),
        F.round(
            F.when(nw > 0, (hash_count + ell_count) / nw)
            .otherwise(F.lit(0.0)), 6,
        ).alias("symbol_word_ratio"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("alpha_word_frac") > 0.8)
        & (F.col("dup_line_frac") < 0.3)
        & (F.col("bullet_line_frac") < 0.9)
        & (F.col("ellipsis_line_frac") < 0.3)
        & (F.col("symbol_word_ratio") < 0.1),
    )


# PII / URL patterns shared by the Spark operators and the SQL oracles.
# Restricted to syntax with identical semantics in Java regex (Spark) and
# RE2 (DuckDB): no lookaround, explicit character classes, ASCII \b.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RE = r"https?://[A-Za-z0-9./?=_%-]+"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII detection and scrubbing: counts of email / URL /
    phone / IPv4 matches plus the redacted text (matches replaced by
    typed tags, applied in a fixed order so the output is deterministic).

    Regex scans are JVM-side codegen (no Python); the operator is a
    projection — no shuffle, linear scan, safe at any scale. At 100 TB
    the scrub runs as part of the ingest projection pipeline."""
    t = F.col(text_col)
    redacted = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_URL_RE, "<URL>")
    redacted = F.regexp_replace(redacted, PII_IPV4_RE, "<IP>")
    redacted = F.regexp_replace(redacted, PII_PHONE_RE, "<PHONE>")
    return df.select(
        *df.columns,
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_URL_RE)).alias("n_urls"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.regexp_count(t, F.lit(PII_IPV4_RE)).alias("n_ipv4"),
        redacted.alias("redacted"),
    ).withColumn(
        "has_pii",
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ipv4")) > 0,
    )


def url_host_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-host URL statistics over a corpus: extract every URL, parse
    the host, and aggregate (n_urls, n_docs) per host — the domain-level
    profile used for crawl curation / blocklisting.

    One regexp_extract_all + explode + hash aggregate with map-side
    partial counts; the host dictionary is the only shuffled data."""
    hosts = df.select(
        F.col("doc_id"),
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"https?://([A-Za-z0-9.-]+)"), 1
            )
        ).alias("host"),
    )
    return hosts.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All per-document text statistics in one pass.

    Every expensive subexpression (the token split, per-language stopword
    counts, punctuation/diversity ratios) is materialized ONCE as a named
    intermediate column and every output reads the column: Catalyst
    higher-order functions are interpreted, and the naive composition
    re-split the text ~12 times per row (token_count + quality_score +
    4x lang_id + distinct ratio) — the round-2 regression. CollapseProject
    keeps named non-cheap exprs shared, so this is a single projection
    pipeline with each kernel evaluated once per row.

    Fan-out is byte-gated: these kernels are cheap per row, so the
    repartition shuffle only pays for itself on a genuinely large
    under-split input (e.g. one multi-GB file)."""
    from space_spark.operators.dedup import _fan_out

    df = _fan_out(df, min_bytes=32 << 20)
    orig_cols = df.columns
    t = F.col(text_col)
    toks = F.col("__toks")
    ntok = F.col("__ntok")
    base = df.withColumn("__toks", tokens(t)).withColumn(
        "__ntok", F.size(toks)
    )
    for lang in LANG_ORDER:
        lits = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        base = base.withColumn(
            f"__sw_{lang}",
            F.size(F.filter(toks, lambda x: F.array_contains(lits, x))),
        )
    base = (
        base.withColumn(
            "__punct",
            F.when(
                F.length(t) > 0,
                F.length(F.regexp_replace(t, r"[A-Za-z0-9 ]", ""))
                / F.length(t),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "__dtr",
            F.when(
                ntok > 0, F.size(F.array_distinct(toks)) / ntok
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "__swr_en",
            F.when(ntok > 0, F.col("__sw_en") / ntok).otherwise(F.lit(0.0)),
        )
    )
    # Left-to-right argmax over the materialized counts: strictly-greater
    # keeps the earlier language on ties (same semantics as lang_id()).
    lang_expr = F.lit("unknown")
    best = F.lit(-1)
    for lang in LANG_ORDER:
        cond = F.col(f"__sw_{lang}") > best
        lang_expr = F.when(cond, F.lit(lang)).otherwise(lang_expr)
        best = F.when(cond, F.col(f"__sw_{lang}")).otherwise(best)
    lang_expr = F.when(best <= 0, F.lit("unknown")).otherwise(lang_expr)
    return base.select(
        *orig_cols,
        ntok.alias("token_count"),
        F.length(t).alias("char_count"),
        F.round(F.col("__punct"), 6).alias("punct_ratio"),
        F.round(F.col("__dtr"), 6).alias("distinct_token_ratio"),
        F.round(
            0.3 * F.least(ntok / F.lit(100.0), F.lit(1.0))
            + 0.3 * (1.0 - F.col("__punct"))
            + 0.2 * F.col("__dtr")
            + 0.2 * F.least(F.col("__swr_en") * 5.0, F.lit(1.0)),
            6,
        ).alias("quality_score"),
        lang_expr.alias("pred_lang"),
        fingerprint(t).alias("fingerprint"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     strategy: str = "map") -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A1.1) beyond the line
    rules in ``gopher_quality_flags``: per document,

    - ``top{2,3,4}gram_char_frac`` — the fraction of the document's
      characters covered by the single most frequent token n-gram
      (count * n-gram length / text length); ties break to the
      lexicographically smallest gram so every engine agrees;
    - ``dup5gram_char_frac`` — the fraction of characters in REPEATED
      occurrences of 5-grams (occurrences beyond each gram's first;
      non-overlap-adjusted, which upper-bounds the paper's definition).

    ``strategy`` (both produce IDENTICAL values; equality is pinned by
    tests/test_text_repetition_plan.py):

    - ``"map"`` (default): the statistic is per-document, so it needs no
      shuffle at all. Tokenize in the JVM (the same ``split(lower(trim))``
      expression as the oracle — locale/regex semantics never enter
      Python), then ONE Arrow-batched ``mapInPandas`` counts each doc's
      n-grams locally and emits pure-integer stats (top count + gram
      length per n, duplicated-5-gram chars); the fractions and rounding
      stay in JVM expressions so cross-engine float behavior is
      unchanged. Map-only: zero shuffles, linear in corpus size, no
      skew surface — the previous explode + count-shuffle plan carried
      every token ~14x (2+3+4+5 gram copies) through an exchange and
      sorted each (doc, n) group in a window, and was the suite's
      slowest, most variance-prone plan (round-6 verdict #4).
    - ``"agg"``: pure built-in formulation for engines where Python
      workers are unavailable — one (doc, n, gram) explode + count with
      map-side combine, then a partial-aggregable
      ``min(struct(-count, gram))`` top-1 (no row_number window, no
      per-group sort) fused with the dup5 sum in a single pass.
    """
    from space_spark.operators.dedup import _fan_out

    if strategy not in ("map", "agg"):
        raise ValueError(f"strategy must be map|agg, got {strategy!r}")
    base = _fan_out(df.select(id_col, text_col)).select(
        id_col,
        F.length(F.col(text_col)).cast("long").alias("__len"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__toks"),
    )
    # Zero-length documents have no characters to cover: frac 0, not a
    # DIVIDE_BY_ZERO that kills the job under ANSI mode.

    def frac(num):
        return F.when(
            F.col("__len") > 0, F.round(num / F.col("__len"), 6)
        ).otherwise(F.lit(0.0))

    if strategy == "map":
        return _repetition_map(base, id_col, frac)
    return _repetition_agg(base, id_col, frac)


def _repetition_map(base: DataFrame, id_col: str, frac) -> DataFrame:
    import pandas as pd
    from pyspark.sql import types as T

    id_type = base.schema[id_col].dataType
    stats_schema = T.StructType(
        [T.StructField(id_col, id_type), T.StructField("__len", T.LongType())]
        + [
            T.StructField(name, T.LongType())
            for n in (2, 3, 4)
            for name in (f"__c{n}", f"__gl{n}")
        ]
        + [T.StructField("__dup5", T.LongType())]
    )

    def doc_stats(toks):
        # Mirrors the agg strategy's fam(n) exactly: indexes
        # 0..max(len-n, 0), gram = the (clamped) n-token slice joined by
        # one space; ties break to the smallest gram (Python str compares
        # by code point == UTF-8 binary order in Spark and DuckDB).
        from collections import Counter

        m = len(toks)
        out = []
        for n in (2, 3, 4, 5):
            cnt = Counter(
                " ".join(toks[i:i + n]) for i in range(max(m - n, 0) + 1)
            )
            if n < 5:
                g, c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
                out.extend((c, len(g)))
            else:
                out.append(
                    sum((c - 1) * len(g) for g, c in cnt.items())
                )
        return out

    def task(batches):
        for pdf in batches:
            rows = [
                doc_stats([] if t is None else list(t))
                for t in pdf["__toks"]
            ]
            cols = {
                id_col: pdf[id_col],
                "__len": pd.array(pdf["__len"], dtype="Int64"),
            }
            for j, name in enumerate(
                ["__c2", "__gl2", "__c3", "__gl3", "__c4", "__gl4",
                 "__dup5"]
            ):
                cols[name] = [r[j] for r in rows]
            yield pd.DataFrame(cols)

    stats = base.mapInPandas(task, stats_schema)
    return stats.select(
        id_col,
        *[
            frac(F.col(f"__c{n}") * F.col(f"__gl{n}"))
            .alias(f"top{n}gram_char_frac")
            for n in (2, 3, 4)
        ],
        frac(F.col("__dup5")).alias("dup5gram_char_frac"),
    )


def _repetition_agg(base: DataFrame, id_col: str, frac) -> DataFrame:
    toks = F.col("__toks")

    def fam(n):
        return F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(toks, i + 1, n)).alias("gram"),
            ),
        )

    exploded = base.select(
        id_col, "__len",
        F.explode(
            F.flatten(F.array(*[fam(n) for n in (2, 3, 4, 5)]))
        ).alias("p"),
    ).select(id_col, "__len", F.col("p.n").alias("n"),
             F.col("p.gram").alias("gram"))
    counts = exploded.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("c"), F.first("__len").alias("__len")
    )
    # Top-1 per (doc, n) as a partial-aggregable min(struct(-c, gram)):
    # same winner as ORDER BY c DESC, gram ASC but with map-side combine
    # and no per-group sort; the dup5 sum rides the same pass.
    per_n = counts.groupBy(id_col, "n").agg(
        F.min(F.struct((-F.col("c")).alias("nc"),
                       F.col("gram").alias("g"))).alias("top"),
        F.sum((F.col("c") - 1) * F.length("gram")).alias("__dupchars"),
        F.first("__len").alias("__len"),
    )
    per_n = per_n.select(
        id_col, "n",
        F.when(
            F.col("n") < 5,
            frac((-F.col("top.nc")) * F.length("top.g")),
        ).otherwise(frac(F.col("__dupchars"))).alias("f"),
    )
    pivoted = per_n.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("f")))
            .alias(f"top{n}gram_char_frac")
            for n in (2, 3, 4)
        ],
        F.max(F.when(F.col("n") == 5, F.col("f")))
        .alias("dup5gram_char_frac"),
    )
    return (
        base.select(id_col)
        .join(pivoted, on=id_col, how="left")
        .select(
            id_col,
            *[F.coalesce(F.col(c), F.lit(0.0)).alias(c)
              for c in ("top2gram_char_frac", "top3gram_char_frac",
                        "top4gram_char_frac", "dup5gram_char_frac")],
        )
    )


def c4_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style document heuristics (Raffel et al. 2020, §2.2 — the
    filters behind the Colossal Clean Crawled Corpus): sentence count,
    fraction of lines ending in terminal punctuation, code/boilerplate
    signals (curly braces, "lorem ipsum", "javascript"), and the
    combined ``c4_keep`` flag (>=3 sentences, no curly brace, no lorem
    ipsum, majority of lines end with terminal punctuation).

    Pure projection over one split of the text — no shuffle, linear
    scan; every count is an exact integer and each ratio rounds to 6
    places, so values and the flag reproduce bit-exactly in ANSI SQL."""
    t = F.col(text_col)
    low = F.lower(t)
    sentences = F.size(
        F.filter(F.split(t, r"[.!?]"),
                 lambda x: F.length(F.trim(x)) > 0)
    )
    lines = F.filter(F.split(t, "\n"),
                     lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    punct_end = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"[.!?\"']$"))
    )
    punct_frac = F.round(
        F.when(n_lines > 0, punct_end / n_lines).otherwise(F.lit(0.0)), 6
    )
    has_brace = low.contains("{")
    has_lorem = low.contains("lorem ipsum")
    has_js = low.contains("javascript")
    return df.select(
        *df.columns,
        sentences.cast("long").alias("n_sentences"),
        n_lines.cast("long").alias("n_text_lines"),
        punct_frac.alias("punct_line_frac"),
        has_brace.alias("has_curly_brace"),
        has_lorem.alias("has_lorem_ipsum"),
        has_js.alias("mentions_javascript"),
    ).withColumn(
        "c4_keep",
        (F.col("n_sentences") >= 3)
        & ~F.col("has_curly_brace")
        & ~F.col("has_lorem_ipsum")
        & (F.col("punct_line_frac") >= 0.5),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 65536,
) -> DataFrame:
    """Corpus-unigram language-model score per document — the cheap
    stand-in for a KenLM perplexity filter (CCNet-style quality
    bucketing): token probabilities come from the corpus's own top-
    ``vocab_size`` unigram counts, and each document gets its summed
    log10 probability over scored tokens.

    Deterministic across engines: per-token log-probs are scaled to
    integer MICRO-units before summing (integer addition commutes;
    float summation order does not), so the output hashes identically
    anywhere. Returns (id, n_tokens, n_scored, logprob_micro_sum) —
    callers derive mean logprob / perplexity buckets from the exact
    integers.

    100 TB plan shape: one token-count aggregate (explode + map-side
    partial counts — hot tokens collapse per task before the shuffle),
    a top-K rank over the VOCABULARY (not the corpus), then the vocab
    BROADCASTS back to the exploded corpus — corpus tokens never
    shuffle on the token key, so "the" appearing 10^11 times costs no
    skewed exchange; the only corpus-keyed shuffle is the final
    per-document aggregate (uniform ids). Out-of-vocab tokens are
    counted but unscored (``n_scored`` < ``n_tokens``). Every input
    document yields exactly one output row — documents with zero
    non-empty tokens (empty, NULL, whitespace-only text) score
    (0, 0, 0) instead of silently vanishing from the aggregate."""
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    # Top-K via orderBy+limit, which Spark plans as TakeOrderedAndProject:
    # each partition keeps its local top-K and only K rows per partition
    # merge. A global row_number window here would instead sort ALL
    # distinct tokens (web corpora have 10^8+: URLs, hashes, typos) in
    # one task. Same deterministic cut (freq desc, token asc).
    vocab = counts.orderBy(
        F.col("freq").desc(), F.col("token").asc()
    ).limit(vocab_size)
    # The denominator rides a global window OVER THE VOCAB — bounded by
    # vocab_size (<= 65536 rows in one task, the same bounded-merge any
    # top-K ends in), NOT the corpus. This keeps the expensive
    # corpus-wide token-count subtree embedded exactly once; a separate
    # agg + crossJoin would either embed it twice or need a persisted
    # intermediate that outlives the returned lazy plan.
    scored_vocab = vocab.withColumn(
        "__total", F.sum("freq").over(Window.partitionBy(F.lit(1)))
    ).select(
        "token",
        F.round(F.log10(F.col("freq") / F.col("__total")) * 1e6)
        .cast("long").alias("__lp_micro"),
    )
    scored = (
        toks.join(F.broadcast(scored_vocab), on="token", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("__lp_micro").alias("n_scored"),
            F.coalesce(F.sum("__lp_micro"), F.lit(0)).cast("long")
            .alias("logprob_micro_sum"),
        )
    )
    return df.select(id_col).join(scored, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
        .alias("n_tokens"),
        F.coalesce(F.col("n_scored"), F.lit(0)).cast("long")
        .alias("n_scored"),
        F.coalesce(F.col("logprob_micro_sum"), F.lit(0)).cast("long")
        .alias("logprob_micro_sum"),
    )


def heavy_hitters(
    df: DataFrame, text_col: str, threshold_ppm: int,
    sketch_k: int = 0,
) -> DataFrame:
    """EXACT frequent tokens — every token whose occurrence count
    satisfies ``freq * 1_000_000 >= threshold_ppm * total_tokens``
    (integer comparison, engine-exact) — found with a two-pass
    sketch-then-recount plan whose shuffle never touches the long tail.

    Pass 1 (candidates): a per-partition Misra-Gries summary with ``k``
    counters (default ``ceil(2e6 / threshold_ppm)``), maintained over
    Arrow batches via vectorized ``value_counts`` merges with the
    weighted reduce-to-k step (subtract the (k+1)-th largest, drop
    non-positives — Agarwal et al., "Mergeable Summaries", PODS'12).
    Guarantee: an MG(k) summary retains any item with partition count
    > N_p/(k+1), and a token with global frequency >= eps*N must have
    frequency >= eps*N_p in AT LEAST one partition (averaging
    argument), so with k >= 1/eps the UNION of per-partition summaries
    is a proven SUPERSET of the answer — no false negatives. Each
    partition emits at most ~k rows plus one exact token-count
    sentinel: O(partitions * k) sketch rows total, O(distinct) never
    materializes.

    Pass 2 (exact recount): re-scan the token stream keeping only
    candidate tokens (broadcast hash join against the tiny candidate
    set), count exactly, filter by the integer threshold. The groupBy
    shuffles at most |candidates| keys.

    vs ``vocab_topk``'s single global groupBy: a 100 TB web corpus has
    billions of distinct long-tail tokens — that shuffle is the
    dominant cost, and this plan replaces it with a bounded sketch
    exchange plus a second projected-column scan (map-side only). The
    sketch output is persisted (it is O(partitions*k), tiny) because
    both the exact total and the candidate set derive from it.

    Output: (token, freq) — exact counts, freq desc / token asc.
    ``freq * 1e6`` stays inside int64 up to ~9e12 total tokens.
    """
    import math

    if not (0 < threshold_ppm <= 1_000_000):
        raise ValueError("threshold_ppm must be in (0, 1e6]")
    k = sketch_k or math.ceil(2_000_000 / threshold_ppm)
    toks = df.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")

    def sketch_partition(batches):
        import pandas as pd

        counters: Dict[str, int] = {}
        total = 0
        for pdf in batches:
            vc = pdf["token"].value_counts()
            total += int(vc.sum())
            for tok, c in vc.items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > 4 * k:
                # Weighted MG reduce: subtract the (k+1)-th largest
                # from everyone, drop the non-positive.
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    t: c - cut for t, c in counters.items() if c > cut
                }
        if len(counters) > k:
            cut = sorted(counters.values(), reverse=True)[k]
            counters = {
                t: c - cut for t, c in counters.items() if c > cut
            }
        # The exact partition total rides OUT-OF-BAND as a flagged row
        # (token "" never survives the upstream filter): an in-band
        # magic token would collide with crawl garbage that really
        # contains it, corrupting both the total and the candidates.
        out = pd.DataFrame(
            {"token": list(counters) + [""],
             "cnt": list(counters.values()) + [total],
             "is_total": [False] * len(counters) + [True]}
        )
        yield out

    # localCheckpoint, not persist: both the exact total and the
    # candidate set derive from this tiny O(partitions*k) frame, and
    # checkpoint blocks are released by the ContextCleaner when the
    # frame is garbage-collected — a persist would leak storage memory
    # for the session lifetime on every call.
    sketch = toks.mapInPandas(
        sketch_partition, "token string, cnt long, is_total boolean"
    ).localCheckpoint(eager=True)
    total = (
        sketch.where(F.col("is_total"))
        .agg(F.sum("cnt").alias("n")).collect()[0]["n"]
    ) or 0
    candidates = (
        sketch.where(~F.col("is_total"))
        .select("token").distinct()
    )
    exact = (
        toks.join(F.broadcast(candidates), on="token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(
            F.col("freq") * F.lit(1_000_000).cast("long")
            >= F.lit(int(threshold_ppm)).cast("long")
            * F.lit(int(total)).cast("long")
        )
        .orderBy(F.col("freq").desc(), F.col("token").asc())
    )
    return exact
