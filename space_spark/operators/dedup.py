"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Additive capabilities beyond the reference (google/space stores training
data but has no dedup operators) — designed for 100 TB corpora:

- ``exact_dedup``: one hash-shuffle on the group columns. At scale this is
  the canonical groupBy; no driver state.
- ``ngram_jaccard_pairs``: EXACT Jaccard via an inverted-index shuffle join
  (explode shingles -> join on shingle -> count), NOT an O(n^2) cross join;
  the candidate space is bounded by shared shingles, which is how the big
  corpus dedups (e.g. RefinedWeb/Dolma pipelines) run it.
- ``minhash_lsh_pairs``: MinHash signatures computed entirely with JVM
  higher-order functions (no Python UDF), banded LSH bucket join to
  generate candidates, exact-Jaccard verification of candidates only.
- ``simhash``: 64-bit SimHash from token hashes via explode + bit-count
  aggregation (one shuffle), for hamming-distance near-dup.

All hashes are xxhash64-derived (JVM, codegen-fast) with fixed seeds, so
results are deterministic run-to-run; exact-Jaccard outputs are ratios of
integers and therefore cross-engine reproducible.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: (a*h + b) % P with h < P keeps products < 2^62,
# so int64 arithmetic cannot overflow (ANSI mode would raise).
MERSENNE_P = (1 << 31) - 1


def _fan_out(df: DataFrame) -> DataFrame:
    """CPU-heavy per-row work (shingling/hashing) parallelizes only as far
    as the input partitioning — and a small parquet file arrives as ONE
    partition, serializing everything onto one core. Repartition up to the
    cluster's parallelism when the input is under-split (cheap: it only
    shuffles raw text)."""
    sc_ = df.sparkSession.sparkContext
    target = sc_.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def _norm_tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def _token_ngrams(text: Column, n: int) -> Column:
    """Distinct token n-gram shingles as strings."""
    toks = _norm_tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(grams)


def _hash64(col: Column) -> Column:
    """Deterministic non-negative 63-bit hash (JVM xxhash64, seed 42 —
    codegen-fast; dedup ops need determinism, not cross-engine SQL
    reproducibility, so no md5 detour)."""
    return F.abs(F.xxhash64(col))


# ---------------------------------------------------------------- exact dedup
def exact_dedup(df: DataFrame, cols: Sequence[str], id_col: str) -> DataFrame:
    """Keep the min-id row per duplicate group (deterministic winner).

    One hash shuffle on ``cols``; Catalyst plans a partial (map-side)
    min-aggregate before the exchange."""
    w = Window.partitionBy(*cols).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_groups(df: DataFrame, cols: Sequence[str], id_col: str
                     ) -> DataFrame:
    """(group key cols, keep_id, dup_count) per distinct value group."""
    return df.groupBy(*cols).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count")
    )


# ------------------------------------------------------- exact n-gram Jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.4,
) -> DataFrame:
    """All pairs (a<b) with token-n-gram Jaccard >= threshold.

    Inverted-index formulation: explode distinct shingles, self-join on the
    shingle (hash shuffle co-locates equal shingles), count common shingles
    per pair, then Jaccard = common / (|A| + |B| - common). Scales as the
    number of SHARED shingles, not n^2. Jaccard is a ratio of exact ints —
    bit-identical in any engine."""
    df = _fan_out(df)
    shingled = df.select(
        F.col(id_col).alias("doc"),
        _token_ngrams(F.col(text_col), n).alias("shingles"),
    ).withColumn("n_shingles", F.size("shingles"))
    # Join on a 63-bit hash of the shingle, not the string: same counts
    # (collision odds ~2^-63 per shared pair) and a far smaller shuffle.
    exploded = shingled.select(
        "doc", "n_shingles",
        F.explode(F.transform("shingles", _hash64)).alias("shingle"),
    )
    # Hash-shuffle the self-join on the shingle key: AQE would happily
    # broadcast the exploded side at small scale, which is both flaky under
    # memory pressure and impossible at corpus scale — pin the plan that
    # survives 100x growth.
    a = exploded.alias("a").hint("shuffle_hash")
    b = exploded.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    return (
        common.withColumn(
            "jaccard",
            F.round(F.col("common")
                    / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ------------------------------------------------------------- MinHash + LSH
def _perm_constants(num_perm: int, seed: int = 42) -> List[tuple]:
    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, MERSENNE_P), rnd.randrange(0, MERSENNE_P))
        for _ in range(num_perm)
    ]


def minhash_signature(
    text: Column, num_perm: int = 32, ngram: int = 3, seed: int = 42
) -> Column:
    """MinHash signature as an array<long>, all JVM-side: shingle ->
    xxhash64 -> affine permutations mod a Mersenne prime ->
    array_min per permutation."""
    shingles = _token_ngrams(text, ngram)
    return _signature_from_hashes(
        F.transform(shingles, lambda s: _hash64(s) % MERSENNE_P),
        num_perm, seed,
    )


def _signature_from_hashes(hashes: Column, num_perm: int, seed: int
                           ) -> Column:
    parts = [
        F.array_min(
            F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b))
                        % MERSENNE_P)
        )
        for a, b in _perm_constants(num_perm, seed)
    ]
    return F.array(*parts)


def _with_numpy_signatures(hashed: DataFrame, num_perm: int, seed: int
                           ) -> DataFrame:
    """Append ``sig`` (array<long>) + ``n_shingles`` to a (doc, shingles)
    DataFrame via an Arrow-batched numpy kernel."""
    import numpy as np
    import pyarrow as pa_

    perms = _perm_constants(num_perm, seed)
    A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
    B = np.array([b for _, b in perms], dtype=np.int64)[:, None]
    out_schema = (
        "doc long, shingles array<long>, sig array<long>, n_shingles int"
    )

    def task(batches):
        for batch in batches:
            docs = batch.column(0)
            shingles = batch.column(1)
            sigs, counts = [], []
            for row in shingles.to_pylist():
                h = np.asarray(row, dtype=np.int64)
                if h.size == 0:
                    sigs.append([MERSENNE_P] * num_perm)
                    counts.append(0)
                    continue
                # (num_perm x n) broadcast; products < 2^62, no overflow.
                sigs.append(((A * h[None, :] + B) % MERSENNE_P)
                            .min(axis=1).tolist())
                counts.append(int(h.size))
            yield pa_.RecordBatch.from_arrays(
                [
                    docs,
                    shingles,
                    pa_.array(sigs, pa_.list_(pa_.int64())),
                    pa_.array(counts, pa_.int32()),
                ],
                names=["doc", "shingles", "sig", "n_shingles"],
            )

    return hashed.mapInArrow(task, out_schema)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 32,
    bands: int = 8,
    ngram: int = 3,
    threshold: float = 0.4,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact verification.

    1. Signature per doc (no shuffle — a projection).
    2. Band hashes; explode to (band_idx, band_hash) buckets; self-join on
       the bucket (hash shuffle) -> candidate pairs. At 100 TB this is THE
       standard sub-quadratic path; bucket skew is bounded by band width.
    3. Exact n-gram Jaccard verification of candidates only.
    """
    df = _fan_out(df)
    rows_per_band = num_perm // bands
    # Shingle hashing runs JVM-side; the num_perm affine permutations +
    # mins run as ONE vectorized numpy kernel in mapInArrow. (Catalyst
    # higher-order functions are interpreted, so num_perm chained
    # array_min(transform(...)) calls cost ~10x more than the same math
    # as a batched (perms x shingles) numpy broadcast.)
    hashed = (
        df.select(
            F.col(id_col).alias("doc"),
            _token_ngrams(F.col(text_col), ngram).alias("sh_str"),
        )
        .withColumn(
            "shingles",
            F.array_distinct(
                F.transform("sh_str", lambda s: _hash64(s) % MERSENNE_P)
            ),
        )
        .drop("sh_str")
    )
    sig_df = _with_numpy_signatures(hashed, num_perm, seed)

    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.hash(F.slice("sig", i * rows_per_band + 1, rows_per_band))
            .alias("bucket"),
        )
        for i in range(bands)
    ]
    buckets = sig_df.select(
        "doc", "shingles", "n_shingles",
        F.explode(F.array(*band_cols)).alias("bb"),
    ).select("doc", "shingles", "n_shingles", "bb.band", "bb.bucket")

    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.shingles").alias("sh_b"),
            F.col("b.n_shingles").alias("nb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = cand.withColumn(
        "common", F.size(F.array_intersect("sh_a", "sh_b"))
    ).withColumn(
        "jaccard",
        F.round(F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common")), 6),
    )
    return verified.where(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


# ------------------------------------------------------------------- SimHash
def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: sign of per-bit weighted sums of token
    hashes. Explode + single aggregation (one shuffle); bits extracted with
    shiftright/bitwise-and, no Python."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(_norm_tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", _hash64(F.col("tok")))
    sums = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1,
                       1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(60)
        ]
    )
    bit_terms = [
        F.when(F.col(f"b{i}") > 0,
               F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(60)
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return sums.select("doc", total.alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, candidate-generated by
    16-bit chunk equality (a hamming<=3 pair must share one of 4 chunks —
    pigeonhole), then verified with bit_count."""
    sh = simhash(df, id_col, text_col)
    chunks = sh.select(
        "doc", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftright("simhash", i * 15)
                    .bitwiseAND((1 << 15) - 1).alias("val"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select("doc", "simhash", "c.chunk", "c.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
