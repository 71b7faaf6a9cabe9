"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Additive capabilities beyond the reference (google/space stores training
data but has no dedup operators) — designed for 100 TB corpora:

- ``exact_dedup``: a partial-aggregable groupBy-min + join-back on the
  unique id (never a window over the group key — hot duplicate groups
  would serialize onto one reducer); no driver state.
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

import os
import random
from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: (a*h + b) % P with h < P keeps products < 2^62,
# so int64 arithmetic cannot overflow (ANSI mode would raise).
MERSENNE_P = (1 << 31) - 1


def _fan_out(df: DataFrame, min_bytes: int = 0) -> DataFrame:
    """CPU-heavy per-row work (shingling/hashing) parallelizes only as far
    as the input partitioning — and a small parquet file arrives as ONE
    partition, serializing everything onto one core. Repartition up to the
    cluster's parallelism when the input is under-split (cheap: it only
    shuffles raw text).

    ``min_bytes`` gates the repartition on measured input size: kernels
    that are cheap per row (plain projections) only pay the shuffle when
    the single-partition input is genuinely large; CPU-heavy kernels
    (MinHash signatures) pass 0 — they win from fan-out at any size.
    Inputs whose size cannot be measured (non-local URIs) are assumed
    large.

    The under-split probe uses ``inputFiles()`` (pure metadata) rather than
    ``df.rdd.getNumPartitions()``, which would force an RDD conversion plan
    per query."""
    sc_ = df.sparkSession.sparkContext
    target = sc_.defaultParallelism
    if target <= 1:
        return df  # a repartition(1) of one partition is a pure tax
    try:
        files = df.inputFiles()
    except Exception:  # non-file-based plans: leave partitioning alone
        return df
    if not files or len(files) >= max(2, target // 2):
        return df
    if min_bytes > 0:
        from urllib.parse import urlparse

        total = 0
        for uri in files:
            try:
                total += os.path.getsize(urlparse(uri).path)
            except OSError:
                total = None  # unmeasurable (remote FS): assume large
                break
        if total is not None and total < min_bytes:
            return df
    return df.repartition(target)


def _norm_tokens(text: Column) -> Column:
    # NULL text tokenizes to NO tokens: a crawl's null rows must flow
    # through dedup as empty documents, not as null arrays that poison
    # the downstream Arrow kernels (np.asarray(None) raises). Empty
    # tokens are filtered: F.trim strips ASCII spaces only, so text
    # with leading/trailing \n or \t would otherwise grow phantom ""
    # edge tokens — two crawl docs identical but for a trailing newline
    # (ubiquitous) scored Jaccard 0.75 instead of 1.0 and escaped
    # near-dedup at realistic thresholds.
    return F.filter(
        F.coalesce(
            F.split(F.lower(F.trim(text)), r"\s+"),
            F.array().cast("array<string>"),
        ),
        lambda t: t != "",
    )


def _token_ngrams(text: Column, n: int) -> Column:
    """Distinct token n-gram shingles as strings. A document with NO
    tokens yields NO grams (the sequence(0, 0) lower bound would emit
    one empty-string gram, which made ``decontaminate`` flag every
    null/empty corpus doc as contaminated whenever the benchmark side
    contained any null/empty row)."""
    toks = _norm_tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(
        F.size(toks) == 0, F.array().cast("array<string>")
    ).otherwise(F.array_distinct(grams))


def _hash64(col: Column) -> Column:
    """Deterministic non-negative 63-bit hash (JVM xxhash64, seed 42 —
    codegen-fast; dedup ops need determinism, not cross-engine SQL
    reproducibility, so no md5 detour)."""
    return F.abs(F.xxhash64(col))


# ---------------------------------------------------------------- exact dedup
def exact_dedup(df: DataFrame, cols: Sequence[str], id_col: str) -> DataFrame:
    """Keep the min-id row per duplicate group (deterministic winner;
    assumes ``id_col`` is unique per row, the usual document-id contract).

    Skew-safe at corpus scale: a window over ``cols`` would ship EVERY
    occurrence of a hot duplicate group to one reducer (windows have no
    partial aggregation). Instead the winner per group is computed with
    ``groupBy(cols).min(id)`` — map-side partial agg collapses each
    group to one row per task before the exchange, so a group with 10^9
    members costs O(tasks) shuffled rows — and winners join back on
    (cols..., id): the join keys include the unique id, so hot groups
    hash-spread across reducers instead of landing on one. NULL group
    values join null-safely (``eqNullSafe``), preserving the window
    semantics where NULL keys form a group with one winner — a plain
    equality join-back would silently drop every NULL-keyed row.

    Rows with a NULL id pass through UNDEDUPLICATED: "keep one of the
    NULL-id rows" has no deterministic answer (there is no tie-break),
    and folding them into min() would either lose them (min ignores
    NULLs) or match every NULL at once. NULL ids violate this
    operator's unique-id contract; passing them through is the safe,
    deterministic degradation."""
    has_id = df.where(F.col(id_col).isNotNull())
    winners = (
        has_id.groupBy(*cols).agg(F.min(id_col).alias(id_col)).select(
            [F.col(c).alias(f"__w_{c}") for c in [*cols, id_col]]
        )
    )
    cond = None
    for c in [*cols, id_col]:
        piece = F.col(c).eqNullSafe(F.col(f"__w_{c}"))
        cond = piece if cond is None else (cond & piece)
    return has_id.join(winners, on=cond, how="left_semi").unionByName(
        df.where(F.col(id_col).isNull())
    )


def duplicate_groups(df: DataFrame, cols: Sequence[str], id_col: str
                     ) -> DataFrame:
    """(group key cols, keep_id, dup_count) per distinct value group.

    NULL-id rows are excluded, mirroring ``exact_dedup``'s contract
    (it passes them through undeduplicated), so ``dup_count`` counts
    exactly the rows a dedup would consider — the two operators'
    numbers can never contradict each other."""
    return df.where(F.col(id_col).isNotNull()).groupBy(*cols).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count")
    )


# ------------------------------------------------------- exact n-gram Jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.4,
    prefix_filter: bool = False,
) -> DataFrame:
    """All pairs (a<b) with token-n-gram Jaccard >= threshold.

    Inverted-index formulation: explode distinct shingles, self-join on the
    shingle (hash shuffle co-locates equal shingles), count common shingles
    per pair, then Jaccard = common / (|A| + |B| - common). Scales as the
    number of SHARED shingles, not n^2. Jaccard is a ratio of exact ints —
    bit-identical in any engine.

    ``prefix_filter=True`` switches to the PPJoin/AllPairs candidate
    scheme (Bayardo et al., WWW'07; Xiao et al., WWW'08): order each
    document's shingles by global document frequency (rare first) and
    index only the first ``|A| - ceil(t*|A|) + 1`` — any pair at Jaccard
    >= t must share a prefix element, so the self-join runs over the
    prefix index only and hot shingles (the quadratic blowup at corpus
    scale) fall out of the index almost entirely. Candidates are then
    verified with an exact set intersection, so the OUTPUT IS IDENTICAL
    to the plain path (pinned in tests). Costs two extra shuffles (df
    count + per-doc rank); wins when shingle frequency is skewed — i.e.
    at real-corpus scale."""
    if prefix_filter:
        return _ngram_jaccard_prefix(df, id_col, text_col, n, threshold)
    # Shingles are joined by their full 64-bit hash, not the string: same
    # counts (collision odds ~2^-64 per pair) and a far smaller shuffle.
    # Tokens are hashed JVM-side; grams are mixed in the numpy kernel (the
    # same one MinHash uses, signatures skipped) — interpreted per-gram
    # string building was the round-1 cost.
    tok_hashed = _fan_out(df).select(
        F.col(id_col).alias("doc"),
        F.transform(_norm_tokens(F.col(text_col)), _hash64).alias("th"),
    )
    shingled = _with_gram_signatures(tok_hashed, n, None, 0)
    exploded = shingled.select(
        "doc", "n_shingles", F.explode("shingles").alias("shingle")
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


def _ngram_jaccard_prefix(
    df: DataFrame, id_col: str, text_col: str, n: int, threshold: float
) -> DataFrame:
    """PPJoin-style exact Jaccard (see ngram_jaccard_pairs docstring)."""
    tok_hashed = _fan_out(df).select(
        F.col(id_col).alias("doc"),
        F.transform(_norm_tokens(F.col(text_col)), _hash64).alias("th"),
    )
    # Four consumers read the shingling output (the document-frequency
    # aggregate, the prefix index, and both verification sides);
    # localCheckpoint materializes the most expensive stage ONCE and the
    # ContextCleaner reclaims the blocks when the result is dropped — no
    # explicit release() lifecycle for a lazy-returning operator.
    shingled = _with_gram_signatures(tok_hashed, n, None, 0).localCheckpoint()
    exploded = shingled.select(
        "doc", "n_shingles", F.explode("shingles").alias("shingle")
    )
    # Global shingle document frequencies (one hash-shuffle agg with
    # map-side partial counts).
    freqs = exploded.groupBy("shingle").agg(F.count("*").alias("__df"))
    # Rank each doc's shingles rare-first; keep the prefix. The window
    # shuffles on doc — bounded per-doc state, no skew (docs have ~equal
    # shingle counts relative to corpus hot keys).
    w = Window.partitionBy("doc").orderBy(
        F.col("__df").asc(), F.col("shingle").asc()
    )
    prefix = (
        exploded.join(freqs.hint("shuffle_hash"), on="shingle")
        .withColumn("__rn", F.row_number().over(w))
        .where(
            F.col("__rn")
            <= F.col("n_shingles") - F.ceil(
                F.col("n_shingles") * F.lit(threshold)
            ) + 1
        )
        .select("doc", "shingle")
    )
    a = prefix.alias("a").hint("shuffle_hash")
    b = prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_a = shingled.select(
        F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("na"),
    )
    sh_b = shingled.select(
        F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("nb"),
    )
    return (
        cand.join(sh_a, on="doc_a")
        .join(sh_b, on="doc_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
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
    # A gram-less doc (empty/null text) min's over an empty array ->
    # NULL; coalesce to the MERSENNE_P sentinel the Arrow kernel path
    # uses, so both signature APIs agree that "no content" is a
    # signature that matches only other no-content docs.
    parts = [
        F.coalesce(
            F.array_min(
                F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b))
                            % MERSENNE_P)
            ),
            F.lit(MERSENNE_P),
        )
        for a, b in _perm_constants(num_perm, seed)
    ]
    return F.array(*parts)


# Odd 64-bit mixing constant for the rolling polynomial gram hash (numpy
# int64 arithmetic wraps mod 2^64 — deterministic on every platform).
_GRAM_MIX = 0x9E3779B97F4A7C15


def _with_gram_signatures(tok_hashed: DataFrame, ngram: int,
                          num_perm: Optional[int], seed: int) -> DataFrame:
    """(doc, th: token-hash array) -> (doc, shingles, sig, n_shingles);
    ``num_perm=None`` skips the MinHash signature (gram hashing only, for
    the exact-Jaccard inverted index).

    Gram (shingle) hashes AND MinHash signatures are computed in one
    Arrow-batched numpy kernel from per-TOKEN hashes: a document has ~5x
    fewer tokens than gram strings, so the JVM side only hashes tokens and
    never materializes n-gram strings (the round-1 plan built every gram
    with interpreted concat_ws+slice HOFs — the dominant cost). A gram's
    hash is a polynomial mix of its token hashes over the full int64
    domain: distinct gram hashes correspond to distinct token tuples ==
    distinct gram strings (tokens cannot contain the separator), so
    Jaccard counts match the string definition the SQL oracle uses
    (collision odds ~2^-64 per pair; the mod-P reduction happens only
    inside the MinHash permutations, where overflow-safety requires it).

    Gram edge semantics mirror ``_token_ngrams``/the oracle: documents
    with fewer than ``ngram`` tokens yield ONE truncated gram."""
    import numpy as np
    import pyarrow as pa_

    if num_perm is not None:
        perms = _perm_constants(num_perm, seed)
        A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
        B = np.array([b for _, b in perms], dtype=np.int64)[:, None]
        out_schema = (
            "doc long, shingles array<long>, sig array<long>, "
            "n_shingles int"
        )
    else:
        out_schema = "doc long, shingles array<long>, n_shingles int"

    def task(batches):
        mix = np.int64(np.uint64(_GRAM_MIX).astype(np.int64))
        for batch in batches:
            docs = batch.column(0)
            shingle_rows, sigs, counts = [], [], []
            with np.errstate(over="ignore"):
                for row in batch.column(1).to_pylist():
                    t = np.asarray(row, dtype=np.int64)
                    if t.size == 0:
                        shingle_rows.append([])
                        if num_perm is not None:
                            sigs.append([MERSENNE_P] * num_perm)
                        counts.append(0)
                        continue
                    n_tok = t.size
                    if n_tok >= ngram:
                        g = t[: n_tok - ngram + 1].copy()
                        for j in range(1, ngram):
                            g = g * mix + t[j: n_tok - ngram + 1 + j]
                    else:  # single truncated gram
                        g = t[:1].copy()
                        for j in range(1, n_tok):
                            g = g * mix + t[j: j + 1]
                    # Shingle identity stays FULL 64-bit: distinct token
                    # tuples keep distinct gram hashes (collision odds
                    # ~2^-64 per pair) so exact-Jaccard counts are exact
                    # at corpus scale. A mod-P reduction here would give
                    # only 31-bit identities — ~65k distinct grams already
                    # reach 50% collision odds by the birthday bound.
                    h = np.unique(g)
                    shingle_rows.append(h.tolist())
                    counts.append(int(h.size))
                    if num_perm is not None:
                        # Reduce mod P ONLY for the affine permutations
                        # (hp < P keeps a*hp+b < 2^62 — no int64
                        # overflow); duplicate hp values cannot change a
                        # min. numpy % follows the divisor's sign:
                        # nonnegative even for wrapped-negative hashes.
                        hp = h % MERSENNE_P
                        sigs.append(((A * hp[None, :] + B) % MERSENNE_P)
                                    .min(axis=1).tolist())
            cols = [docs, pa_.array(shingle_rows, pa_.list_(pa_.int64()))]
            names = ["doc", "shingles"]
            if num_perm is not None:
                cols.append(pa_.array(sigs, pa_.list_(pa_.int64())))
                names.append("sig")
            cols.append(pa_.array(counts, pa_.int32()))
            names.append("n_shingles")
            yield pa_.RecordBatch.from_arrays(cols, names=names)

    return tok_hashed.mapInArrow(task, out_schema)


def release(df: DataFrame) -> None:
    """Unpersist cached intermediates attached to an operator's result
    (the ``materialize=False`` escape hatch of ``minhash_lsh_pairs``)."""
    for cached in getattr(df, "_space_cached", []):
        cached.unpersist()


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 128,
    bands: int = 64,
    ngram: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact verification.

    1. Signature per doc (no shuffle — a projection).
    2. Band hashes; explode to NARROW (doc, band, bucket) rows; self-join
       on the bucket (hash shuffle) -> bare (doc_a, doc_b) candidates. At
       100 TB this is THE standard sub-quadratic path; bucket skew is
       bounded by band width, and no shingle payload rides the join — the
       shingle sets are joined back exactly once per side AFTER candidate
       dedup (the round-1 plan duplicated both full shingle arrays into
       every bucket-collision row, multiplying the shuffle by candidate
       fan-out).
    3. Exact n-gram Jaccard verification of candidates only, so every
       emitted pair carries its TRUE Jaccard.

    The default band geometry (64 bands of 2 rows) is chosen so recall at
    ``threshold`` is ~1 - (1-t^2)^64 (>= 0.99998 at t=0.5, converging to 1
    above it): the emitted set equals the exact-threshold set with
    overwhelming probability, which is what makes the operator
    oracle-checkable against the all-pairs exact-Jaccard SQL (and is
    asserted exactly in tests at sf0.001/sf0.01).

    ``materialize=True`` (default) collects the bounded pair set through
    Arrow and unpersists the cached signatures before returning;
    ``materialize=False`` returns the lazy plan for write-out-at-scale
    callers, who must call ``release(result)`` when done."""
    if bands < 1 or num_perm % bands != 0:
        # bands > num_perm would make every band hash an EMPTY slice —
        # all docs share every bucket, an O(n^2) candidate explosion;
        # a non-dividing bands silently discards trailing permutations
        # and breaks the documented 1-(1-t^r)^b recall.
        raise ValueError(
            f"bands must divide num_perm (got num_perm={num_perm}, "
            f"bands={bands})"
        )
    rows_per_band = num_perm // bands
    # Token hashing runs JVM-side (one xxhash64 per token); gram hashes +
    # the num_perm affine permutations + mins run as ONE vectorized numpy
    # kernel in mapInArrow. (Catalyst higher-order functions are
    # interpreted — building gram STRINGS with concat_ws/slice HOFs was
    # the round-1 bottleneck.)
    tok_hashed = _fan_out(df).select(
        F.col(id_col).alias("doc"),
        F.transform(_norm_tokens(F.col(text_col)), _hash64).alias("th"),
    )
    # Three consumers read this table (bucket explode + both verify
    # joins); without a persist each one re-runs the shingling+signature
    # projection — the most expensive stage in the pipeline. Spark's own
    # MinHashLSH does the same. MEMORY_AND_DISK: spills, never recomputes.
    sig_df = _with_gram_signatures(tok_hashed, ngram, num_perm, seed
                                   ).persist()
    shingle_sets = sig_df.select("doc", "shingles", "n_shingles")

    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.hash(F.slice("sig", i * rows_per_band + 1, rows_per_band))
            .alias("bucket"),
        )
        for i in range(bands)
    ]
    # Empty-shingle docs (null/empty text) all carry the identical
    # sentinel signature: banding them pairs every such doc with every
    # other — O(k^2) candidates on a crawl's k null rows — and their
    # verification divides 0/0 (a job-killing DIVIDE_BY_ZERO under
    # Spark 4's default ANSI mode). They can never reach any positive
    # threshold, so excluding them is output-equivalent.
    buckets = sig_df.where(F.col("n_shingles") > 0).select(
        "doc", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc", "bb.band", "bb.bucket")

    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_a = shingle_sets.select(
        F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("na"),
    )
    sh_b = shingle_sets.select(
        F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("nb"),
    )
    verified = (
        cand.join(sh_a, on="doc_a")
        .join(sh_b, on="doc_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("common")
                    / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
    )
    out = verified.where(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )
    if not materialize:
        # Lazy scale path (a 100 TB run writes the pair set out rather
        # than collecting it): the cached signatures stay alive for the
        # caller's actions — caller MUST call release(result) after.
        out._space_cached = [sig_df]
        return out
    # Default: the post-threshold pair set is small relative to the
    # corpus — pull it once through Arrow, drop the cached signature
    # blocks, and hand back a local-backed DataFrame. No persisted
    # blocks outlive the call (round-2 leak: every invocation left
    # MEMORY_AND_DISK signature blocks on executors forever).
    try:
        tbl = out.toArrow()
    finally:
        # Without the finally, a failed collect (executor OOM, interrupt)
        # leaks the persisted signature blocks on every retry.
        sig_df.unpersist()
    return df.sparkSession.createDataFrame(tbl)


def dedup_clusters(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components over a near-duplicate PAIR graph: every doc
    appearing in a pair gets ``cluster_id`` = the smallest doc id in its
    component — the step that turns pairwise dedup output into
    keep-one-per-cluster decisions.

    Min-label propagation: each iteration joins labels across edges and
    takes the elementwise min; converges in <= graph-diameter iterations
    to a unique fixpoint (deterministic regardless of execution order —
    which is why the result oracles against a recursive-CTE transitive
    closure in SQL). Each iteration is one shuffle join + one min
    aggregate; ``localCheckpoint`` truncates the growing lineage so plan
    size stays constant (the standard Spark iterative-algorithm
    discipline; checkpoint blocks are released by the ContextCleaner as
    superseded iterations are garbage-collected). Near-dup components are
    tiny in practice (diameter ~2-4), so the loop exits early on the
    no-change test — one tiny count job per iteration."""
    # Materialize the edge list ONCE: pairs is typically the output of an
    # expensive candidate pipeline (shingling + inverted-index join), and
    # every iteration's join would otherwise recompute it end-to-end.
    # Hash-partitioned on dst and PERSISTED rather than checkpointed
    # (r14-opt, guide §2.4): an InMemoryTableScan reports the cached
    # plan's outputPartitioning (a localCheckpoint's Scan ExistingRDD
    # does not — measured), so every iteration's edges-side join
    # exchange disappears: the loop joins on dst == doc and the edge
    # list — the corpus-scale side — arrives pre-clustered from cache.
    # One construction-time shuffle replaces one edge-wide shuffle PER
    # ITERATION. persist is also strictly safer than localCheckpoint
    # here (lineage survives executor loss); blocks are reclaimed by
    # the ContextCleaner when the result is dropped, as before. The
    # eager labels checkpoint below populates the cache in its own
    # materialization job, preserving the evaluate-pairs-once
    # guarantee.
    from pyspark import StorageLevel

    n_shuffle = int(pairs.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"))
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        pairs.select(F.col("doc_b").alias("src"),
                     F.col("doc_a").alias("dst"))
    ).repartition(n_shuffle, "dst").persist(StorageLevel.MEMORY_AND_DISK)
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = edges.join(
            labels, edges.dst == labels.doc
        ).select(F.col("src").alias("doc"), "label")
        new = (
            labels.union(neigh)
            .groupBy("doc")
            .agg(F.min("label").alias("label"))
            # Lazy (r13-opt): the no-change count below is the sole
            # next consumer and scans every partition, materializing
            # the checkpoint in the same job — one job per iteration
            # instead of two. (edges/labels above stay EAGER: they are
            # consumed by parallel stages of a single action, where a
            # lazy checkpoint can be double-computed by concurrently
            # scheduled stages.)
            .localCheckpoint(eager=False)
        )
        # Min-propagation labels only decrease; fixpoint == no decrease.
        changed = (
            new.alias("n")
            .join(labels.alias("o"), on="doc")
            .where(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        # Returning silently would hand back labels that split one true
        # component into several clusters — wrong keep-one decisions
        # with no signal. Diameter > max_iter means the caller needs a
        # bigger budget, not a wrong answer.
        raise RuntimeError(
            f"dedup_clusters did not converge in max_iter={max_iter} "
            "iterations (component diameter exceeds the budget); "
            "raise max_iter"
        )
    return labels.select("doc", F.col("label").alias("cluster_id"))


# ------------------------------------------------------------------- SimHash
SIMHASH_BITS = 60


def _hash60_cross_engine(col: Column) -> Column:
    """60-bit token hash computable identically in any SQL engine: the
    first 15 hex digits of md5, parsed as an integer. (DuckDB mirror:
    ``('0x' || substring(md5(tok),1,15))::BIGINT``.) Used where the
    RESULT must be cross-engine reproducible; xxhash64 stays the default
    where only run-to-run determinism is needed."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per document: sign of per-bit sums of ±1 votes from
    every token occurrence's 60-bit hash.

    Token hashing runs JVM-side (md5 — cross-engine reproducible); the
    60-bit vote tally + sign runs as ONE Arrow-batched numpy popcount
    kernel per document. No explode, no shuffle: the round-1 plan exploded
    tokens and ran a 60-column SUM aggregate (9 s at sf0.1); this is a
    pure projection."""
    import numpy as np
    import pyarrow as pa_

    hashed = df.select(
        F.col(id_col).alias("doc"),
        F.transform(
            _norm_tokens(F.col(text_col)), _hash60_cross_engine
        ).alias("h"),
    )
    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)

    def task(batches):
        for batch in batches:
            docs = batch.column(0)
            sigs = []
            for row in batch.column(1).to_pylist():
                h = np.asarray(row, dtype=np.int64)
                if h.size == 0:
                    # A content-free doc (null/empty/whitespace text)
                    # has no signature: sig 0 would pair every such doc
                    # with every other at hamming 0 — and with any doc
                    # whose real signature is near-zero. NULL keeps the
                    # row in the output but out of pairing (the SQL
                    # oracle's GROUP BY over exploded tokens drops
                    # token-less docs the same way).
                    sigs.append(None)
                    continue
                # (n_tok x 60) bit matrix; votes = sum(2*bit - 1); a bit
                # is set iff its vote is strictly positive (ties -> 0,
                # mirroring SUM(...) > 0 in SQL).
                bits = (h[:, None] >> shifts[None, :]) & 1
                votes = (2 * bits - 1).sum(axis=0)
                sigs.append(int(((votes > 0).astype(np.int64)
                                 << shifts).sum()))
            yield pa_.RecordBatch.from_arrays(
                [docs, pa_.array(sigs, pa_.int64())],
                names=["doc", "simhash"],
            )

    return hashed.mapInArrow(task, "doc long, simhash long")


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """ALL pairs (a<b) within ``max_hamming`` SimHash bits — exact, not
    approximate: candidates come from chunk equality over max_hamming+1
    bit-chunks (pigeonhole: a pair differing in <= k bits must agree on at
    least one of k+1 chunks), then are verified with bit_count. The chunk
    join is a hash shuffle on narrow (doc, chunk, val) rows; no task ever
    sees the whole corpus. Deterministic AND cross-engine reproducible
    (md5-based token hashes), so the output oracles against all-pairs
    bit_count SQL."""
    n_chunks = max_hamming + 1
    width = (SIMHASH_BITS + n_chunks - 1) // n_chunks
    # Content-free docs carry a NULL signature (see simhash) and must
    # not enter candidate generation.
    sh = simhash(_fan_out(df), id_col, text_col).where(
        F.col("simhash").isNotNull()
    )
    chunks = sh.select(
        "doc", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftright("simhash", i * width)
                    .bitwiseAND((1 << width) - 1).alias("val"),
                )
                for i in range(n_chunks)
            ])
        ).alias("c"),
    ).select("doc", "simhash", "c.chunk", "c.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.hint("shuffle_hash")
        .join(b, (F.col("a.chunk") == F.col("b.chunk"))
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
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("long"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ------------------------------------------------------------ decontamination
def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    bench_text_col: Optional[str] = None,
    fan_out: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the number of
    distinct token ``n``-grams it shares with a benchmark/eval set — the
    GPT-3 appendix-C / The-Pile style overlap filter used to strip eval
    leakage from pretraining corpora (13-grams there; ``n`` is a knob
    because small eval suites warrant shorter grams).

    Returns (id_col, n_shared_grams) for contaminated documents only;
    anti-joining the corpus against this result yields the clean set.

    Scale design: the benchmark side is an eval suite — megabytes, not
    terabytes — so its distinct-gram set is **broadcast**; the corpus side
    is a projection + explode whose grams meet the broadcast hash map
    map-side, so NO corpus bytes shuffle. The only exchange is the final
    per-doc count aggregation over matched (doc, gram) hits, which is
    bounded by contamination volume, not corpus size. Grams join as raw
    strings (not hashes): equality on the broadcast side is exact, spares
    a hash pass, and keeps the operator bit-identical to the ANSI-SQL
    oracle.

    ``fan_out=False`` skips the internal under-split repartition —
    for callers whose ``df`` is already explicitly fanned out upstream
    (``_fan_out`` probes inputFiles(), so it cannot see a repartition
    already in the plan and would add a second, redundant exchange)."""
    bench_text_col = bench_text_col or text_col
    if fan_out:  # single-file corpora arrive as one partition
        df = _fan_out(df)
    bgrams = (
        benchmark.select(
            F.explode(_token_ngrams(F.col(bench_text_col), n)).alias("gram")
        )
        .distinct()
    )
    corpus = df.select(
        F.col(id_col),
        F.explode(_token_ngrams(F.col(text_col), n)).alias("gram"),
    )
    # _token_ngrams is distinct per document, so count(*) counts distinct
    # shared grams.
    return (
        corpus.join(F.broadcast(bgrams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# ------------------------------------------------------------- line dedup
def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 5,
    delimiter: str = "\n",
) -> DataFrame:
    """Cross-document LINE deduplication (CCNet / RefinedWeb style): every
    distinct line is kept only at its FIRST occurrence — smallest
    (document id, line position) — and each document is rebuilt from its
    surviving lines. This is the boilerplate-removal step of a crawl
    pipeline (navigation text, cookie banners and footers repeat across
    pages; document-level dedup never sees them). Lines shorter than
    ``min_len`` characters — and empty lines ALWAYS, regardless of
    ``min_len`` — are exempt (kept everywhere): dropping every repeated
    short line ("Yes.", paragraph breaks) would mangle prose, and the
    shortest lines are exactly the most-repeated ones.

    Returns (id_col, text, n_kept, n_dropped).

    Plan (skew-safe by construction — the operator's whole job is lines
    that repeat across billions of documents, so the hot-key case is the
    NORMAL case): exempt lines never enter any line-keyed exchange; the
    rest compute their first occurrence via
    ``groupBy(line).agg(min(struct(id, pos)))`` — a combinable aggregate,
    so map-side partial agg collapses a line occurring 10^9 times to one
    row per task before the shuffle — and winners join back on the full
    (line, id, pos) triple, whose hash spreads hot lines across reducers.
    A ``Window.partitionBy(line)`` here would instead sort all 10^9
    occurrences of "Home" in ONE task (windows have no partial
    aggregation). Final per-document rebuild shuffles on the document id
    (uniform). Deterministic and ANSI-SQL reproducible (ordered
    string_agg).

    ``delimiter`` picks the dedup unit: "\\n" (default) deduplicates
    lines; "\\n\\n" deduplicates paragraphs (RefinedWeb runs both).

    NULL text coalesces to '' (one exempt empty line), so such rows
    survive to the output instead of vanishing from the rebuild
    aggregate — every input document yields exactly one output row."""
    import re as _re

    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")),
                    _re.escape(delimiter))
        ).alias("pos", "line"),
    )
    exempt = (F.length("line") < min_len) | (F.col("line") == "")
    subject = lines.where(~exempt)
    winners = (
        subject.groupBy("line")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__w"))
        .select(
            "line",
            F.col(f"__w.{id_col}").alias(id_col),
            F.col("__w.pos").alias("pos"),
        )
    )
    kept = subject.join(
        winners.withColumn("__first", F.lit(True)),
        on=["line", id_col, "pos"],
        how="left",
    ).select(
        id_col, "pos", "line",
        F.coalesce(F.col("__first"), F.lit(False)).alias("__keep"),
    ).unionByName(
        lines.where(exempt).withColumn("__keep", F.lit(True))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"),
                               F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            delimiter,
        ).alias("text"),
        F.sum(F.when(F.col("__keep"), 1).otherwise(0)).cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("__keep"), 0).otherwise(1)).cast("long")
        .alias("n_dropped"),
    )
    return rebuilt


# ---------------------------------------------------- substring dedup
def _substr_tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __toks) tokenization shared by dedup_substrings' window and
    rebuild branches. NULL text tokenizes to NULL; coalesce to an empty
    array so such docs flow through the untouched branch as ('', 0, 0) —
    matching the SQL oracle's COALESCE over an absent aggregate row.
    Empty tokens filtered: trim strips spaces only, so a trailing \\n
    would otherwise add a phantom "" token that shifts every window
    fingerprint and inflates n_kept (same defect class as _norm_tokens;
    the rebuild would also emit doubled spaces)."""
    toks = F.filter(
        F.coalesce(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            F.array().cast("array<string>"),
        ),
        lambda t: t != "",
    )
    # NULL ids are poison here, excluded up front (ADVICE r13; the
    # module's standard discipline, see ivf_centroids/neardup_pairs):
    # min(struct(id, s)) sorts NULLs FIRST, so a NULL-id window would
    # win every fingerprint it touches, and the downstream anti/semi
    # joins on the id are null-unsafe — a NULL-id doc would land in
    # the untouched branch AND ghost through the rebuild aggregate,
    # emitting duplicate output rows.
    return (df.where(F.col(id_col).isNotNull())
            .select(F.col(id_col), toks.alias("__toks")))


def _substr_window_fingerprints(
    base: DataFrame, id_col: str, window: int, oracle_compat: bool
) -> DataFrame:
    """(id, s, __h): one fingerprint per length-``window`` token run.
    Default xxhash64 (8-byte LONG on the corpus-sized winners exchange);
    md5 hex only under oracle_compat. Split out so the plan-shape test
    can audit the fingerprint width — the eager ``dup_fps``/``covered``
    checkpoints hide this subtree from the public query's final plan."""
    n = F.size(F.col("__toks"))
    fingerprint = F.md5 if oracle_compat else F.xxhash64
    empty_t = "array<string>" if oracle_compat else "array<bigint>"
    return (
        base.select(
            id_col,
            "__toks",
            F.posexplode(
                # Docs shorter than the window yield NO windows (Spark's
                # sequence(0, -1) would descend, not stay empty).
                F.when(
                    n >= window,
                    F.transform(
                        F.sequence(F.lit(0), n - window),
                        lambda s: fingerprint(
                            F.concat_ws(
                                " ",
                                F.slice(F.col("__toks"), s + 1, window),
                            )
                        ),
                    ),
                ).otherwise(F.array().cast(empty_t))
            ).alias("s", "__h"),
        )
        .select(id_col, "s", "__h")
    )


def dedup_substrings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 50,
    oracle_compat: bool = False,
) -> DataFrame:
    """Cross-document EXACT-SUBSTRING deduplication (the ExactSubstr
    pass of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): every run of ``window`` consecutive
    tokens that already occurred earlier in the corpus — smallest
    (document id, start position) owns the first occurrence — is
    removed from later documents, token-wise: a token is dropped when
    ANY duplicated window covers it. Documents rebuild from surviving
    tokens (whitespace-normalized: single spaces).

    Returns (id_col, text, n_kept, n_dropped) with token counts.

    Plan (same skew discipline as ``dedup_lines`` — repeated substrings
    ARE the hot keys): window fingerprints default to ``xxhash64`` of
    the space-joined token slice — an 8-byte LONG on the corpus-sized
    winners exchange, 4x narrower than a 32-char md5 hex string
    (collision odds at 10^12 windows are ~3e-8 by the birthday bound,
    acceptable for dedup); ``oracle_compat=True`` switches to md5 for
    bit-reproducible cross-engine (DuckDB) verification. The first
    occurrence per fingerprint is ``groupBy(hash).agg(min(struct(id,
    s)))`` — map-side partial agg collapses a fingerprint occurring
    10^9 times to one row per task — and the join-back keys on the
    full (hash, id, s) triple, spreading hot fingerprints across
    reducers. Covered-position expansion explodes ONLY duplicated
    windows (bounded by duplication volume, not corpus size); the
    final anti-join and rebuild shuffle on uniform (id, pos) /
    (id) keys and run ONLY over documents that contain a duplicated
    span — the untouched majority passes through as a projection."""
    base = _substr_tokenized(df, id_col, text_col)
    win = _substr_window_fingerprints(base, id_col, window, oracle_compat)
    # Winner-per-fingerprint stays a partial-aggregable groupBy-min
    # (skew-safe: a fingerprint occurring 10^9 times collapses to one
    # row per task before the exchange). r13-opt restructure, two
    # changes with identical semantics:
    # - Only fingerprints with count > 1 can yield dup windows (a
    #   count-1 fingerprint's sole window IS its winner), so the
    #   join-back's build side shrinks from O(distinct fingerprints) —
    #   corpus-sized — to O(duplicated fingerprints), typically a tiny
    #   fraction (guide §2.3/§3.1: shuffle fewer bytes; the eager
    #   checkpoint gives AQE the exact size so it broadcasts when
    #   small, removing the corpus-side exchange outright).
    # - The old "__first IS NULL" left-join filter becomes an inner
    #   join + (id, s) != winner — same rows (id/s are non-null
    #   posexplode outputs).
    dup_fps = (
        win.groupBy("__h")
        .agg(F.min(F.struct(F.col(id_col), F.col("s"))).alias("__w"),
             F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .select(
            "__h",
            F.col(f"__w.{id_col}").alias("__wid"),
            F.col("__w.s").alias("__ws"),
        )
        .localCheckpoint(eager=True)
    )
    # NULL-SAFE exclusion (ADVICE r13): ids are non-null by the
    # ingress filter above, so this is equivalent to the plain
    # (id != wid) | (s != ws) — but stays correct (a window is
    # excluded iff it IS the elected winner) even if a future caller
    # path re-admits NULL ids.
    dup_windows = (
        win.join(dup_fps, on="__h", how="inner")
        .where(~(F.col(id_col).eqNullSafe(F.col("__wid"))
                 & F.col("s").eqNullSafe(F.col("__ws"))))
        .select(id_col, "s")
    )
    # Pinned: `covered` is consumed THREE times downstream (touched-id
    # set, per-position anti-join, dropped counts) and embeds the whole
    # fingerprint pipeline — unpinned, the window-hash computation ran
    # ~6x per query (the r13-opt explain showed 24 parquet scans).
    # Bounded by duplication volume, never corpus size.
    covered = dup_windows.select(
        id_col,
        F.explode(
            F.sequence(F.col("s"), F.col("s") + F.lit(window - 1))
        ).alias("pos"),
    ).distinct().localCheckpoint(eager=True)
    # Only documents that actually contain a duplicated span pay the
    # token-explode + rebuild shuffle; the (typically vast) untouched
    # majority passes through as a projection. The touched-id set is
    # O(affected docs) and semi/anti-joins decide membership.
    touched_ids = covered.select(id_col).distinct()
    untouched = base.join(touched_ids, on=id_col, how="left_anti").select(
        id_col,
        F.array_join(F.col("__toks"), " ").alias("text"),
        F.size(F.col("__toks")).cast("long").alias("n_kept"),
        F.lit(0).cast("long").alias("n_dropped"),
    )
    tokens = base.join(touched_ids, on=id_col, how="left_semi").select(
        id_col, F.posexplode(F.col("__toks")).alias("pos", "tok")
    )
    kept = tokens.join(covered, on=[id_col, "pos"], how="left_anti")
    dropped_counts = covered.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__nd")
    )
    rebuilt = (
        kept.groupBy(id_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("text"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
        # fully-deduplicated documents vanish from `kept`; resurface
        # them with empty text via the touched-doc universe
        .join(touched_ids, on=id_col, how="right")
        .join(dropped_counts, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
            .alias("n_kept"),
            F.coalesce(F.col("__nd"), F.lit(0)).cast("long")
            .alias("n_dropped"),
        )
    )
    return rebuilt.unionByName(untouched)


def keep_best_per_cluster(
    df: DataFrame,
    labels: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Canonical-document selection: keep the HIGHEST-``score_col``
    member of each near-duplicate cluster (ties: smallest id), pass
    unclustered rows through untouched. This is the decision step real
    pretraining dedup pipelines want — "drop duplicates, keep the best
    copy" — where min-id selection (``exact_dedup``) would discard a
    clean mirror in favor of a boilerplate-ridden first crawl.

    ``labels``: (doc, cluster_id), e.g. ``dedup_clusters`` output over
    MinHash-LSH pairs.

    Skew-safe at corpus scale, same discipline as ``exact_dedup``: a
    window over ``cluster_id`` has no partial aggregation — one hot
    cluster (a boilerplate page duplicated 10^8 times) lands on one
    reducer. Instead winners come from ``groupBy(cluster).max(struct
    (score, -id))`` — map-side combine collapses each cluster to one
    row per task — and the winner set (one row per cluster) joins back
    by id. NULL scores rank lowest (coalesced to -inf), so a cluster
    with any scored member never elects an unscored one. The min is
    taken over struct(-score, id) — negating the SCORE (always cast to
    double) rather than the id keeps ids type-generic: string/hash doc
    ids order natively inside the struct, where a negated string id
    would cast to NULL and silently elect nobody."""
    lbl = labels.select(
        F.col("doc").alias("__kb_doc"), "cluster_id"
    )
    # Three consumers fan out from `tagged` (winners agg, clustered
    # semi-join, unclustered pass-through); its upstream typically ends
    # in iterative connected-components clustering, so without a
    # truncation point that whole lineage re-executes ~3x.
    # localCheckpoint (same discipline as dedup_clusters' per-iteration
    # checkpoint) materializes it once.
    tagged = df.join(
        lbl, on=df[id_col] == F.col("__kb_doc"), how="left"
    ).drop("__kb_doc").localCheckpoint(eager=False)
    ranked = F.struct(
        (-F.coalesce(F.col(score_col).cast("double"),
                     F.lit(float("-inf")))).alias("ns"),
        F.col(id_col).alias("wid"),
    )
    winners = (
        tagged.where(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(F.min(ranked).alias("best"))
        .select(F.col("best.wid").alias("__kb_win"))
    )
    kept_clustered = tagged.where(F.col("cluster_id").isNotNull()).join(
        winners, on=F.col(id_col) == F.col("__kb_win"), how="left_semi"
    )
    return kept_clustered.unionByName(
        tagged.where(F.col("cluster_id").isNull())
    ).drop("cluster_id")
