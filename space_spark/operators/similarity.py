"""Similarity search over embedding columns (array<float>).

Additive capability beyond the reference. Two paths:

- ``cosine_topk``: exact brute-force top-k — the correctness baseline. The
  query side is broadcast (it's small by construction); the corpus side
  streams, so the plan is a broadcast nested-loop + per-query top-k window,
  no corpus shuffle. Cosine is computed with ``zip_with``/``aggregate``
  (JVM higher-order functions, sequential summation — deterministic and
  reproducible bit-for-bit in SQL engines that sum in list order).
- ``lsh_bucket_topk``: the 100 TB path — sign-bit random-hyperplane LSH
  with multi-probe (hamming-adjacent buckets), so each query only scans
  its bucket neighborhood: shuffle join on bucket id instead of a full
  scan. Recall is tunable via n_planes/probes.

Scores are rounded before ranking and ties broken by neighbor id, so
results are engine-independent.
"""

from __future__ import annotations

import random
from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# Constructed-Column memo (r13-opt): building one dot() costs ~15-30
# py4j round trips (zip_with + aggregate + the lambda bodies), and ANN
# queries construct the same trees dozens of times per plan — cProfile
# showed seconds of pure DRIVER latency per query (planning cost,
# guide §7.3). Unresolved Columns are immutable descriptors, safe to
# reuse across plans, but a cache must never key two DIFFERENT bound
# columns together (df1["v"] and df2["v"] both stringify as "v"), so
# the memo takes column NAMES and builds the unbound F.col itself —
# interchangeable by construction. Public dot() stays uncached for
# arbitrary (possibly bound) operands. Resets per SparkContext, like
# _plane_lit.
_DOT_CACHE: dict = {"ctx": None, "cols": {}}


def _dotn(a: str, b) -> Column:
    """Memoized dot over an unbound column name ``a`` and either an
    unbound column name or a hyperplane tuple ``b`` (internal)."""
    from pyspark import SparkContext

    ctx = SparkContext._active_spark_context
    if _DOT_CACHE["ctx"] is not ctx:
        _DOT_CACHE["ctx"] = ctx
        _DOT_CACHE["cols"] = {}
    cols = _DOT_CACHE["cols"]
    key = (a, b)
    col = cols.get(key)
    if col is None:
        bcol = _plane_lit(b) if isinstance(b, tuple) else F.col(b)
        col = dot(F.col(a), bcol)
        cols[key] = col
    return col


def _normn(a: str) -> Column:
    """Memoized norm over an unbound column name (internal)."""
    return F.sqrt(_dotn(a, a))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _usable_norm(nrm: Column) -> Column:
    """A vector participates in cosine retrieval only when its norm is a
    positive finite double: a zero vector has no direction (and the
    score division KILLS the whole job under Spark's default ANSI mode
    — DIVIDE_BY_ZERO), while NaN/Inf components poison rankings (NaN
    sorts above every real score in Spark's double ordering). A 100 TB
    crawl always contains a few of each; they must drop out, not take
    the job down or top every result list."""
    return (nrm > 0) & ~F.isnan(nrm) & (nrm < F.lit(float("inf")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# cosine_topk broadcasts the query set to every executor; above this many
# query rows that is an OOM risk, not a plan choice — the caller wants
# the shuffled path instead.
COSINE_TOPK_BROADCAST_MAX = 100_000

# _neardup_exact_gemm driver-collects the whole normalized corpus matrix
# (toPandas + sc.broadcast): ~8 bytes * dim per row, so 1M rows of
# 256-dim float64 is ~2 GB on the driver. Above this bound the exact
# path raises cleanly instead of OOMing; the LSH default is the scale
# route. Module-level so a deliberately-sized driver can raise it.
EXACT_GEMM_MAX_ROWS = 1_000_000


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 4,
    broadcast_max: int = COSINE_TOPK_BROADCAST_MAX,
    n_queries: Optional[int] = None,
) -> DataFrame:
    """Exact top-k neighbors per query row (excluding self-matches).

    Output: (query_id, neighbor_id, score, rank). Rank orders by rounded
    score desc, neighbor id asc — deterministic across engines.

    The query set is BROADCAST against the streamed corpus — the right
    shape for interactive/small query sets. A query set above
    ``broadcast_max`` rows falls back to a plain (shuffled) cross join so
    a bulk caller degrades to a slower-but-correct plan instead of a
    broadcast OOM; at that scale prefer ``ivf_topk``/``lsh_bucket_topk``.

    ``n_queries``: caller-known query row count (or a trusted upper
    bound). When given, the broadcast-vs-shuffle choice is made from it
    directly instead of running the bounded ``limit(max+1).count()``
    probe job — callers that already know their query-set size (a fixed
    probe list, a bounded filter) save one Spark job per call.

    Null vectors (a crawl always has some) are EXCLUDED from both sides
    — they have no meaningful neighbors and would otherwise surface as
    null-scored matches."""
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _normn("qv")).where(_usable_norm(F.col("qn")))
    from space_spark.operators.dedup import _fan_out

    c = _fan_out(corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )).withColumn("cn", _normn("cv")).where(_usable_norm(F.col("cn")))
    if n_queries is None:
        n_queries = q.limit(broadcast_max + 1).count()
    q_side = F.broadcast(q) if n_queries <= broadcast_max else q
    # Norms cached per row (same doubles, same rounded score): the
    # per-candidate cost is one array fold, not three.
    scored = (
        c.join(q_side, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            F.round(_dotn("qv", "cv")
                    / (F.col("qn") * F.col("cn")), round_digits),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    round_digits: int = 4,
    broadcast_max: int = COSINE_TOPK_BROADCAST_MAX,
    n_queries: Optional[int] = None,
) -> DataFrame:
    """Contrastive hard-negative mining: for every query row, the ``k``
    corpus vectors MOST similar to it whose ``label_col`` DIFFERS from
    the query's — the candidates a contrastive/embedding trainer wants
    as negatives precisely because the encoder currently confuses them
    with the anchor (SimCSE / DPR / CLIP-style batch construction mines
    these offline at corpus scale).

    Output: (query_id, neighbor_id, neighbor_label, score, rank); rank
    orders by rounded score desc, neighbor id asc — deterministic across
    engines, same contract as ``cosine_topk``.

    Plan shape is ``cosine_topk``'s (broadcast query side vs streamed
    corpus, norms cached per row, one per-query top-k window) with the
    label-inequality predicate fused into the JOIN condition, so
    same-label candidates are discarded at the broadcast probe — before
    the score fold and the top-k exchange — not filtered afterwards.
    Rows with a NULL label are excluded from BOTH sides: NULL <> x is
    unknowable, and a trainer cannot use a negative whose class it
    cannot certify."""
    corpus = corpus.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    )
    queries = queries.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col(label_col).alias("qlabel"),
    ).withColumn("qn", _normn("qv")).where(_usable_norm(F.col("qn")))
    from space_spark.operators.dedup import _fan_out

    c = _fan_out(corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col(label_col).alias("neighbor_label"),
    )).withColumn("cn", _normn("cv")).where(_usable_norm(F.col("cn")))
    if n_queries is None:
        n_queries = q.limit(broadcast_max + 1).count()
    q_side = F.broadcast(q) if n_queries <= broadcast_max else q
    scored = (
        c.join(
            q_side,
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("qlabel") != F.col("neighbor_label")),
        )
        .withColumn(
            "score",
            F.round(_dotn("qv", "cv")
                    / (F.col("qn") * F.col("cn")), round_digits),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "score",
                "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    if dim < 1 or n_planes < 1:
        raise ValueError(
            f"dim and n_planes must be >= 1 (got dim={dim}, "
            f"n_planes={n_planes})"
        )
    rnd = random.Random(seed)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


# Building a 64-float literal array costs ~64 py4j round trips; with 8
# planes on both join sides that is ~1s of pure DRIVER chatter per query
# build. The planes are deterministic constants, and an unresolved
# literal Column is reusable across plans in one JVM gateway — but ONLY
# that gateway: after a SparkSession/JVM restart a cached Column points
# at a dead gateway, so the cache is keyed to the active SparkContext
# and flushed whenever it changes.
_PLANE_LIT_CACHE: dict = {"ctx": None, "cols": {}}


def _plane_lit(plane: tuple) -> Column:
    from pyspark import SparkContext

    ctx = SparkContext._active_spark_context
    if _PLANE_LIT_CACHE["ctx"] is not ctx:
        _PLANE_LIT_CACHE["ctx"] = ctx
        _PLANE_LIT_CACHE["cols"] = {}
    cols = _PLANE_LIT_CACHE["cols"]
    col = cols.get(plane)
    if col is None:
        # One py4j call for the whole array literal instead of one per
        # element (r13-opt; value- and type-identical: ArrayType(double,
        # containsNull=false) either way, checked live on 4.1).
        col = F.lit(list(plane))
        cols[plane] = col
    return col


def lsh_bucket(vec, planes: List[List[float]]) -> Column:
    """Sign-bit bucket id from fixed random hyperplanes. ``vec`` is a
    Column, or an unbound column NAME (r13-opt: the name form routes
    each plane dot through the `_dotn` memo — the per-plane expression
    trees are the module's most-rebuilt, and internal callers always
    hash a plain projected column)."""
    if not planes or len(planes) > 30:
        # >30 bits overflows the int32 bucket id (CAST_OVERFLOW kills the
        # job under ANSI; silent wraparound merges unrelated buckets
        # otherwise) — same geometry-validation class as dedup.py's LSH
        # band check.
        raise ValueError(
            f"lsh_bucket needs 1..30 planes, got {len(planes)}"
        )
    pdot = (
        (lambda plane: _dotn(vec, tuple(plane)))
        if isinstance(vec, str)
        else (lambda plane: dot(vec, _plane_lit(tuple(plane))))
    )
    bits = [
        F.when(
            pdot(plane) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    probes: int = 1,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates limited to LSH bucket neighborhoods.

    ``probes`` >= 1 additionally probes every bucket at hamming
    distance EXACTLY 1 from the query's bucket (all single-bit flips —
    the standard multi-probe step; deeper probe rings are not
    implemented, so values above 1 behave like 1). The join is a hash
    shuffle on bucket id — at 100 TB no task ever sees the whole
    corpus. Vectors whose length differs from ``dim`` are EXCLUDED:
    zip_with null-pads a mismatched dot product, which would otherwise
    silently send every row to bucket 0 — one reducer scoring the full
    cross product."""
    from space_spark.operators.dedup import _fan_out

    corpus = corpus.where(F.col(vec_col).isNotNull()
                          & (F.size(F.col(vec_col)) == dim))
    queries = queries.where(F.col(vec_col).isNotNull()
                            & (F.size(F.col(vec_col)) == dim))
    planes = _hyperplanes(dim, n_planes, seed)
    # min_bytes gate: repartitioning only pays off once the corpus is
    # big enough that per-row bucket hashing dominates the shuffle.
    c = _fan_out(corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ), min_bytes=8 << 20).withColumn(
        "bucket", lsh_bucket("cv", planes)
    ).withColumn("cn", _normn("cv")).where(
        _usable_norm(F.col("cn"))
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("bucket0", lsh_bucket("qv", planes)) \
        .withColumn("qn", _normn("qv")) \
        .where(_usable_norm(F.col("qn")))
    # Multi-probe: enumerate buckets at hamming distance <= probes.
    probe_buckets = [F.col("bucket0")]
    if probes >= 1:
        probe_buckets += [
            F.col("bucket0").bitwiseXOR(F.lit(1 << i))
            for i in range(n_planes)
        ]
    q = q.withColumn(
        "bucket", F.explode(F.array_distinct(F.array(*probe_buckets)))
    ).drop("bucket0")

    scored = (
        c.join(q, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            F.round(_dotn("qv", "cv")
                    / (F.col("qn") * F.col("cn")), round_digits),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# Knuth's multiplicative hash constant: ((id % 2^31) * KNUTH) % 2^32
# scatters ids pseudo-randomly with EXACT int64 arithmetic — the id is
# reduced mod 2^31 FIRST so the product stays < 2^31 * KNUTH < 2^63 for
# any int64 id (no ANSI-mode overflow, no silent wrap, and the same value
# in any SQL engine). Precondition: ids are non-negative (both engines'
# ``%`` follows the dividend's sign).
KNUTH_MULT = 2654435761
KNUTH_MOD = 1 << 32
KNUTH_ID_MOD = 1 << 31


def _knuth_key(id_col: Column) -> Column:
    return ((id_col % F.lit(KNUTH_ID_MOD)) * F.lit(KNUTH_MULT)) % F.lit(
        KNUTH_MOD
    )


def ivf_centroids(
    corpus_v: DataFrame, n_centroids: int, refine: bool = False
) -> DataFrame:
    """Deterministic centroid sample: the ``n_centroids`` corpus vectors
    with the smallest Knuth-hashed ids. ``orderBy().limit()`` plans as a
    distributed TakeOrdered (no global sort); the rank window then runs on
    the n_centroids surviving rows only.

    ``refine=True`` runs ONE Lloyd iteration on the sample: every corpus
    vector is assigned to its nearest seed (broadcast centroid join —
    one pass), then each centroid becomes the element-wise mean of its
    list. Better recall on clustered corpora; opt-in because float-mean
    partial-aggregation order is engine-dependent, so refined centroids
    are not bit-for-bit SQL-oracle-able like the deterministic sample."""
    # NULL ids would sort NULLS FIRST into every centroid slot (and tie
    # nondeterministically among themselves, breaking bit-for-bit
    # reproducibility); these operators take arbitrary DataFrames, not
    # just tables the null-PK ingress check guards.
    corpus_v = corpus_v.where(F.col("id").isNotNull())
    key = _knuth_key(F.col("id"))
    chosen = corpus_v.orderBy(key.asc(), F.col("id").asc()).limit(n_centroids)
    w = Window.orderBy(_knuth_key(F.col("id")).asc(), F.col("id").asc())
    seeds = chosen.select(
        F.row_number().over(w).alias("cent_id"),
        F.col("v").alias("cent_v"),
    )
    if not refine:
        return seeds
    # One Lloyd sweep, all DataFrame ops: nearest-seed assignment
    # (broadcast cross join + per-id top-1 window), then an element-wise
    # mean via posexplode + (list, position) aggregate — two hash
    # shuffles, no driver state, scales with the corpus.
    # Cached norms (same discipline as every other join in this file):
    # the inline cosine() helper would re-fold both norms per pair,
    # tripling the sweep's dominant cost; the rounded quotient is built
    # from the same doubles either way.
    scored = (
        corpus_v.withColumn("__nrm", _normn("v"))
        .crossJoin(F.broadcast(
            seeds.withColumn("__cnrm", _normn("cent_v"))
        ))
        .withColumn(
            "csim",
            F.round(_dotn("v", "cent_v")
                    / (F.col("__nrm") * F.col("__cnrm")), 6),
        )
    )
    aw = Window.partitionBy("id").orderBy(
        F.col("csim").desc(), F.col("cent_id").asc()
    )
    assigned = (
        scored.withColumn("__r", F.row_number().over(aw))
        .where(F.col("__r") == 1)
        .select("cent_id", "v")
    )
    means = (
        assigned.select("cent_id", F.posexplode("v").alias("pos", "val"))
        .groupBy("cent_id", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("cent_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("mean_v")
        )
    )
    # A seed whose duplicate-vector twin captured its members can end up
    # with an empty list; it keeps its original vector.
    return seeds.join(means, on="cent_id", how="left").select(
        "cent_id", F.coalesce("mean_v", "cent_v").alias("cent_v")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    round_digits: int = 4,
    gemm: bool = False,
    refine: bool = False,
) -> DataFrame:
    """IVF-style approximate top-k: corpus partitioned into inverted lists
    by nearest centroid; each query scans only its ``n_probe`` closest
    lists.

    Centroids are a deterministic Knuth-hash sample of corpus vectors;
    ``refine=True`` adds one Lloyd sweep (better recall on clustered
    corpora, no longer bit-for-bit oracle-able — see ``ivf_centroids``). Default assignment is a broadcast
    join against the centroid set with the same left-to-right cosine fold
    used everywhere (round-before-argmax, centroid-id tie-break) — every
    step is reproducible bit-for-bit in any engine that folds doubles in
    list order, so the whole query oracles against plain SQL. The probe
    join is a hash shuffle on centroid id — at scale each task touches one
    inverted list, never the whole corpus. ``gemm=True`` swaps assignment
    for a blocked numpy GEMM against the broadcast centroid matrix (BLAS
    throughput for wide corpora; same lists except float-boundary ties)."""
    from space_spark.operators.dedup import _fan_out

    corpus = corpus.where(F.col(vec_col).isNotNull()
                          & _usable_norm(_normn(vec_col)))
    queries = queries.where(F.col(vec_col).isNotNull()
                            & _usable_norm(_normn(vec_col)))
    v = _fan_out(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    )
    q = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cents = ivf_centroids(v, n_centroids, refine=refine)

    if gemm:
        assign = _ivf_assign_gemm(cents)
    else:
        # Norms cached per row / per centroid pre-join (bit-identical:
        # sqrt(dot(v,v)) is the same double either way), so assignment and
        # probe scoring each cost one array fold per candidate, not three.
        cn_ = F.broadcast(cents.withColumn("cnrm", _normn("cent_v")))

        def assign(side: DataFrame, top_n: int) -> DataFrame:
            scored_c = side.withColumn("nrm", _normn("v")).crossJoin(
                cn_
            ).withColumn(
                "csim",
                F.round(
                    _dotn("v", "cent_v")
                    / (F.col("nrm") * F.col("cnrm")),
                    6,
                ),
            )
            w = Window.partitionBy("id").orderBy(
                F.col("csim").desc(), F.col("cent_id").asc()
            )
            return (
                scored_c.withColumn("__r", F.row_number().over(w))
                .where(F.col("__r") <= top_n)
                .select("id", "v", "nrm", F.col("cent_id").alias("list_id"))
            )

    keep_n = [] if gemm else ["nrm"]
    c_assigned = assign(v, 1).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), "list_id",
        *[F.col(c).alias("cn") for c in keep_n]
    )
    q_assigned = assign(q, n_probe).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), "list_id",
        *[F.col(c).alias("qn") for c in keep_n]
    )

    if gemm:
        score_expr = F.round(cosine(F.col("qv"), F.col("cv")), round_digits)
    else:
        score_expr = F.round(
            _dotn("qv", "cv") / (F.col("qn") * F.col("cn")),
            round_digits,
        )
    scored = (
        c_assigned.join(q_assigned, on="list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", score_expr)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    # No dropDuplicates: each corpus vector lives in exactly ONE list
    # (assign(v, 1)) and a query probes n_probe DISTINCT lists, so a
    # (query_id, neighbor_id) pair arises at most once — the dedup was a
    # provably-empty full extra shuffle of the scored candidates.
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _ivf_assign_gemm(cents: DataFrame):
    """GEMM-based list assignment (the wide-corpus fast path): centroids
    are collected once (n_centroids rows — bounded), broadcast as a
    normalized float64 matrix, and each Arrow batch multiplies against it
    with BLAS."""
    import numpy as np
    from pyspark.sql import types as T

    spark = cents.sparkSession
    cent_rows = cents.orderBy("cent_id").collect()
    cmat = np.stack(
        [np.asarray(r["cent_v"], dtype=np.float64) for r in cent_rows]
    )
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    cent_ids = np.array([r["cent_id"] for r in cent_rows], dtype=np.int64)
    b_cmat = spark.sparkContext.broadcast(cmat)
    b_ids = spark.sparkContext.broadcast(cent_ids)

    def assign(side: DataFrame, top_n: int) -> DataFrame:
        out_schema = T.StructType(
            side.schema.fields + [T.StructField("list_id", T.IntegerType())]
        )

        def task(batches):
            cm, ids = b_cmat.value, b_ids.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack(
                    [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
                )
                mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
                sims = mat @ cm.T
                picks = np.argsort(-sims, axis=1)[:, :top_n]
                rows = pdf.loc[pdf.index.repeat(picks.shape[1])]
                rows = rows.assign(list_id=ids[picks.ravel()])
                yield rows

        return side.mapInPandas(task, out_schema)

    return assign


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: ``scale =
    max(|v|)/127``, ``q[i] = round(v[i]/scale)`` — 4x smaller vectors for
    ANN index storage with ~1e-2 cosine error at d=64. Pure JVM
    higher-order functions (no shuffle, no Python); all arithmetic in
    double so results are engine-exact (oracled). Zero vectors — and
    vectors with NaN/Inf components, which have no finite scale and
    would otherwise die in the ANSI int cast (CAST_OVERFLOW: NaN ->
    INT) — quantize to zeros with scale 0, as do vectors containing
    NULL components (no finite scale either). Rows whose vector is
    NULL are excluded entirely (there is no length to emit zeros at),
    matching every other operator in this module.

    Shape note: amax and scale materialize as NAMED intermediate
    columns. Referencing the array_max expression inline from the
    per-element lambda re-evaluates the O(d) fold per reference
    (measured 1.5 s vs 0.15 s at sf0.1) — named columns evaluate
    once per row."""
    v = F.col(vec_col)
    amax_expr = F.array_max(
        F.transform(v, lambda x: F.abs(x.cast("double")))
    )
    staged = df.where(v.isNotNull()).withColumn("__amax", amax_expr)
    am = F.col("__amax")
    # array_max SKIPS null elements, so a vector like [NULL, 5.0] would
    # otherwise count as usable and emit a NULL inside q.
    usable = (
        (am > 0) & ~F.isnan(am) & (am < F.lit(float("inf")))
        & ~F.exists(v, lambda x: x.isNull())
    )
    staged = staged.withColumn(
        "__scale", F.when(usable, am / F.lit(127.0)).otherwise(F.lit(0.0))
    )
    scale = F.col("__scale")
    q = F.when(
        usable,
        F.transform(v, lambda x: F.round(x.cast("double") / scale)
                    .cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return staged.select(
        F.col(id_col).alias("id"),
        F.round(scale, 8).alias("scale"),
        q.alias("q"),
    )


def neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold, a<b).

    ``exact=True`` brute-forces all pairs (oracle/baseline); default uses
    LSH buckets: near-identical vectors share all sign bits with high
    probability, so candidates co-locate in one shuffle."""
    from space_spark.operators.dedup import _fan_out

    # NULL ids are excluded up front (same rationale as ivf_centroids):
    # the a<b pair predicate silently drops them SQL-side anyway, and
    # the GEMM kernel's vectorized comparison would choke on None.
    v = _fan_out(
        df.where(F.col(id_col).isNotNull()
                 & F.col(vec_col).isNotNull()
                 & (F.size(F.col(vec_col)) == dim)
                 & _usable_norm(_normn(vec_col)))
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    )
    if exact:
        return _neardup_exact_gemm(v, threshold)
    planes = _hyperplanes(dim, n_planes, seed)
    # Norm cached per row pre-join (bit-identical: the rounded cosine is
    # built from the same doubles), so each candidate pair costs one dot.
    vb_ = v.withColumn("bucket", lsh_bucket("v", planes)) \
        .withColumn("nrm", _normn("v"))
    a = vb_.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                   F.col("nrm").alias("na"), "bucket")
    b = vb_.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                   F.col("nrm").alias("nb"), "bucket")
    pairs = a.join(b, on="bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "score",
            F.round(_dotn("va", "vb")
                    / (F.col("na") * F.col("nb")), 4),
        )
        .where(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def _neardup_exact_gemm(v: DataFrame, threshold: float) -> DataFrame:
    """Exact all-pairs cosine as a blocked GEMM: the corpus matrix is
    broadcast (normalized float64 numpy), each partition multiplies its
    block against it with BLAS and emits only the above-threshold pairs.

    This is the standard dense-similarity layout at scale: O(n^2) flops are
    unavoidable for the exact variant, but as matrix blocks they run at
    BLAS speed instead of per-pair expression interpretation, and only
    pairs (not the n^2 score matrix) ever hit the shuffle. For corpora too
    large to broadcast, the same kernel runs over a block x block join
    (and the LSH path above is the preferred sub-quadratic route).

    Bounded by construction: the corpus is counted first and a corpus
    above ``EXACT_GEMM_MAX_ROWS`` raises a clean ``UserInputError``
    (naming the LSH default as the scale path) instead of OOMing the
    driver inside ``toPandas()`` — the same guard discipline as
    ``temperature_mix_sample``'s MIX_MAX_GROUPS and ``cosine_topk``'s
    ``broadcast_max``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from space_spark.errors import UserInputError

    spark = v.sparkSession
    # limit(bound+1) like cosine_topk's guard: counts at most bound+1
    # rows instead of the full corpus.
    n = v.limit(EXACT_GEMM_MAX_ROWS + 1).count()
    if n > EXACT_GEMM_MAX_ROWS:
        raise UserInputError(
            f"embedding_neardup(exact=True): corpus has >{n - 1} rows, above "
            f"the exact-GEMM bound of {EXACT_GEMM_MAX_ROWS} (the whole "
            "normalized matrix is driver-collected and broadcast). Use "
            "the default LSH path (exact=False) for large corpora, or "
            "raise similarity.EXACT_GEMM_MAX_ROWS deliberately on a "
            "driver sized for it."
        )
    pdf = v.toPandas()
    # Ids keep their INPUT type (round-7 fix: this path hardcoded
    # int64 while the LSH sibling it oracles accepts any orderable id
    # — string doc ids crashed here). numpy compares int64 and <U
    # string arrays elementwise just the same.
    id_type = v.schema["id"].dataType
    out_schema_early = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("score", T.DoubleType()),
        ]
    )
    if len(pdf) == 0:
        # np.stack over zero rows raises; an empty corpus has no pairs.
        return spark.createDataFrame([], out_schema_early)
    ids = np.asarray(pdf["id"])
    mat = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    out_schema = out_schema_early

    def task(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf_block in batches:
            if len(pdf_block) == 0:
                continue
            blk_ids = np.asarray(pdf_block["id"])
            blk = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf_block["v"]]
            )
            blk = blk / np.linalg.norm(blk, axis=1, keepdims=True)
            sims = np.round(blk @ all_mat.T, 4)
            ii, jj = np.nonzero(
                (sims >= threshold)
                & (blk_ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": blk_ids[ii],
                    "id_b": all_ids[jj],
                    "score": sims[ii, jj],
                }
            )

    return v.mapInPandas(task, out_schema)


def _semantic_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int,
    refine: bool,
) -> DataFrame:
    """The LAZY cluster-assignment subplan of ``semantic_dedup``:
    (id, v, nrm, list_id), fanned out, centroid-broadcast-joined,
    top-1-windowed, repartitioned on list_id. Factored out so the
    plan-property suite can pin its shape (broadcast NL join against
    the bounded centroid set, no cartesian) — ``semantic_dedup``
    checkpoints this subplan, so its RETURNED plan only shows the
    checkpoint scan."""
    from space_spark.operators.dedup import _fan_out

    # A single-file embedding table arrives as ONE partition; every
    # in-cluster dot would then run on one core. Fan out first.
    v = _fan_out(
        corpus.where(F.col(vec_col).isNotNull()
                     & _usable_norm(_normn(vec_col)))
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    )
    cents = ivf_centroids(v, n_clusters, refine=refine)
    # Cache each vector's norm as a scalar column before any join: the
    # pair predicate then costs ONE array fold (the dot) instead of
    # three, with bit-identical results — sqrt(dot(v,v)) is the same
    # double whether computed inline per pair or once per row, so the
    # rounded cosine (and the SQL oracle) are unchanged.
    vn = v.withColumn("nrm", _normn("v"))
    cn = F.broadcast(cents.withColumn("cnrm", _normn("cent_v")))
    scored_c = vn.crossJoin(cn).withColumn(
        "csim",
        F.round(
            _dotn("v", "cent_v")
            / (F.col("nrm") * F.col("cnrm")),
            6,
        ),
    )
    aw = Window.partitionBy("id").orderBy(
        F.col("csim").desc(), F.col("cent_id").asc()
    )
    assigned = (
        scored_c.withColumn("__r", F.row_number().over(aw))
        .where(F.col("__r") == 1)
        .select("id", "v", "nrm", F.col("cent_id").alias("list_id"))
    )
    # Pin the pair stage's parallelism: its bytes are tiny but its CPU is
    # quadratic-in-cluster-size, so AQE's byte-based coalescing would run
    # it on ONE core at small scale. An explicit-count repartition is
    # exempt from AQE coalescing, and hash-partitioning by the join key
    # means both self-join sides are co-partitioned (no further shuffle).
    par = corpus.sparkSession.sparkContext.defaultParallelism
    return assigned.repartition(par, "list_id")


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.9,
    refine: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedding corpus — cluster, then mark every vector
    whose cosine similarity to a higher-priority vector IN THE SAME
    cluster exceeds ``threshold`` as a duplicate of the smallest such id.

    Returns (id_col, list_id, dup_of, is_dup); filtering ``NOT is_dup``
    yields the semantically-deduplicated corpus, and ``dup_of`` gives the
    RETAINED representative: min-winner pointers are chased through
    duplicate chains to the surviving row (deterministic — see the
    pointer-doubling pass below), so ``dup_of`` always names a row with
    ``is_dup = false``.

    Scale design: the pairwise comparison is confined to clusters — the
    whole point of SemDeDup at corpus scale is that ``n_clusters`` grows
    with the corpus (the paper uses 50k clusters for LAION), keeping each
    cluster's pair count tractable. Assignment is a broadcast join against
    the centroid set (centroids are small at any corpus size); the
    in-cluster self-join is a hash shuffle on list_id, so each task sees
    one cluster, never the corpus. Deterministic centroid choice (Knuth
    sample, see ``ivf_centroids``) keeps the default bit-for-bit
    reproducible in ANSI SQL; ``refine=True`` trades that for one Lloyd
    sweep of centroid quality.

    EAGER: unlike most operators here, calling this function launches
    Spark jobs at call time — the assignment subplan is localCheckpoint'd
    (it feeds both the pair stage and the output join, and the chase's
    eager jobs sever Catalyst exchange reuse) and the representative
    chase runs one count job per pointer-doubling round. Superseded
    chase generations are unpersisted inside the loop; what lingers
    until the session drops the returned plan is one assignment
    checkpoint plus the final chase generation, both bounded by corpus
    (assignment) / duplicate (chase) volume."""
    # Materialized once: the pair stage and the final output join both
    # consume it, and the representative chase below runs eager jobs
    # that sever Catalyst's exchange reuse — without the checkpoint the
    # centroid crossJoin + top-1 window would execute twice (same
    # lineage discipline as dedup_clusters). A fully-lazy chase was
    # measured and rejected: N chained self-joins re-evaluate the pair
    # subtree per level (3.6-15 s at sf0.1 vs ~4 s for this shape).
    assigned = _semantic_assign(
        corpus, id_col, vec_col, n_clusters, refine
    ).localCheckpoint()
    a, b = assigned.alias("a"), assigned.alias("b")
    # In-cluster pairs above threshold; AQE would broadcast one whole side
    # at test scale — pin the shuffle-hash join that survives 100 TB.
    pairs = (
        a.hint("shuffle_hash")
        .join(b, (F.col("a.list_id") == F.col("b.list_id"))
              & (F.col("a.id") < F.col("b.id")))
        .where(
            F.round(
                _dotn("a.v", "b.v")
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            )
            >= F.lit(threshold)
        )
        .select(F.col("b.id").alias("id"), F.col("a.id").alias("winner"))
    )
    # Representative chase (round-7 fix): min-winner pointers can form
    # chains — A(1)~B(5), B~C(9), A!~C gives C.dup_of = 5, but 5 is
    # itself a duplicate, violating the documented contract that
    # ``dup_of`` names the RETAINED representative. Pointer doubling:
    # each round squares the chase depth, pointers strictly decrease,
    # and a semi-join count decides convergence BEFORE building the
    # next level, so a chain-free corpus (the common case at real
    # thresholds) pays exactly one tiny count job. Every per-round
    # table is bounded by duplicate volume, not corpus size;
    # localCheckpoint truncates lineage (dedup_clusters discipline).
    # persist (not localCheckpoint) for the chase generations: persist
    # keeps lineage, so a superseded generation can be unpersisted the
    # moment its successor is materialized (eviction just recomputes
    # through still-valid lineage) — localCheckpoint generations could
    # not be freed from Python and lingered on executors until GC
    # (ADVICE r7). Depth is bounded (<= 20 pointer-doubling rounds,
    # chains converge in ceil(log2(depth))), so the growing plan tree
    # stays trivial.
    from pyspark import StorageLevel

    dups = (
        pairs.groupBy("id").agg(F.min("winner").alias("dup_of"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Materialize once; doubles as the empty short-circuit (r7 verdict
    # "Next round #3": the chase's first jump join used to fire even
    # when there were no duplicates at all — a duplicate-free corpus
    # now pays exactly this one count job and skips the loop).
    n_dups = dups.count()
    if n_dups:
        # Scale-adaptive chase parallelism (r14-opt, guide §2.2): the
        # chase tables are duplicate-volume-bounded (two longs per
        # row), but they inherited the corpus shuffle width — at
        # sf0.1 that was 32 partitions carrying 177 rows, and every
        # pointer-doubling round paid 2 exchanges + ~96 near-empty
        # tasks across 3 AQE jobs for a join over a few KB. Derive
        # the width from the MEASURED row count (~50k rows ≈ 1 MB per
        # task floor, capped at the cluster parallelism): tiny dup
        # sets chase single-partition (equi-joins of single-partition
        # children need NO exchange), corpus-scale dup sets keep full
        # width. The count above is already paid, so the decision is
        # free, and the convergence logic is untouched at any width.
        sc_ = pairs.sparkSession.sparkContext
        chase_parts = max(1, min(sc_.defaultParallelism,
                                 (n_dups + 49_999) // 50_000))
        base = dups
        if chase_parts < sc_.defaultParallelism:
            # coalesce, not repartition: a narrow merge of the already-
            # persisted agg output, no shuffle. `base` (the wide
            # persisted generation) is released after the first
            # narrowed generation is materialized below.
            dups = dups.coalesce(chase_parts)
        for _round in range(20):
            x, y = dups.alias("x"), dups.alias("y")
            # The moved flag rides the jump join, so each round is ONE
            # small persisted join plus a count over already-
            # materialized rows; the final round (nothing moved)
            # doubles as the convergence proof.
            jumped = (
                x.join(y, F.col("x.dup_of") == F.col("y.id"), "left")
                .select(
                    F.col("x.id").alias("id"),
                    F.coalesce(F.col("y.dup_of"), F.col("x.dup_of"))
                    .alias("dup_of"),
                    F.col("y.dup_of").isNotNull().alias("__moved"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            changed = jumped.where(F.col("__moved")).count()
            prev, dups = dups, jumped.drop("__moved")
            prev.unpersist()  # superseded generation freed immediately
            if _round == 0 and prev is not base:
                # round 1's prev is the unpersisted coalesce wrapper;
                # the wide persisted base behind it is now superseded
                # (jumped is materialized and self-contained).
                base.unpersist()
            if changed == 0:
                break
        else:
            raise RuntimeError(
                "semantic_dedup: dup_of chains deeper than 2^20 — "
                "pathological duplicate structure"
            )
    return (
        assigned.join(dups, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            "list_id",
            "dup_of",
            F.col("dup_of").isNotNull().alias("is_dup"),
        )
    )


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    in_dim: int = 64,
    seed: int = 7,
    round_digits: int = 6,
    out_col: str = "proj",
) -> DataFrame:
    """Gaussian random projection (Johnson-Lindenstrauss): map each
    embedding to ``out_dim`` dimensions with a fixed seeded Gaussian
    matrix, scaled by 1/sqrt(out_dim) — the standard dimensionality
    reduction ahead of ANN indexing / clustering at corpus scale (pair
    distances preserved within (1 +- eps) for out_dim ~ O(log n / eps^2)).

    Pure per-row projection: no shuffle, whole-row JVM folds against
    memoized literal plane columns (see ``_plane_lit``), deterministic
    and SQL-oracle-able (rounded elements, fixed fold order).

    Rows with NULL vectors, wrong-length vectors (zip_with would
    null-pad the dot), or non-finite/NULL components are EXCLUDED —
    the module's standard poison discipline; a NaN projection fed to a
    downstream ANN index would reintroduce exactly the
    NaN-tops-every-ranking poison retrieval filters out."""
    import math

    from space_spark.operators.dedup import _fan_out

    planes = _hyperplanes(in_dim, out_dim, seed)
    inv = 1.0 / math.sqrt(float(out_dim))
    v = F.col(vec_col)
    finite_comps = ~F.exists(
        v,
        lambda x: (
            x.isNull() | F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == F.lit(float("inf")))
        ),
    )
    comps = [
        F.round(_dotn(vec_col, tuple(p)) * F.lit(inv), round_digits)
        for p in planes
    ]
    return _fan_out(
        df.where(v.isNotNull() & (F.size(v) == in_dim) & finite_comps)
        .select(id_col, vec_col)
    ).select(F.col(id_col), F.array(*comps).alias(out_col))


# --------------------------------------------------------------- PQ / ADC


# k-means codebook training set ceiling: the Knuth-ordered TakeOrdered
# collect is bounded by this no matter the corpus size (FAISS trains on
# samples for the same reason — Lloyd over 100 TB buys nothing).
PQ_TRAIN_MAX = 16_384


def pq_codebooks(
    corpus_v: DataFrame, dim: int, m: int, n_codes: int,
    kmeans_iters: int = 0, train_max: int = PQ_TRAIN_MAX,
) -> list:
    """Deterministic product-quantization codebooks. Returns
    ``codebooks[s][c]`` = list of ``dim/m`` floats.

    ``kmeans_iters=0`` (default, the SQL-oracle path): the ``n_codes``
    Knuth-smallest corpus vectors (the ``ivf_centroids`` sampling
    discipline — bit-for-bit SQL-replicable, unlike k-means), each
    chopped into ``m`` subvectors. Bounded driver collect: n_codes rows.

    ``kmeans_iters>0`` (the recall upgrade, SCALE.md round-9): per
    subspace, run that many Lloyd iterations over a Knuth-ordered
    training sample (≤ ``train_max`` rows — bounded collect), seeded
    with the sampled codebook. Fully deterministic (fixed iterations,
    argmin ties break to the lowest code, empty clusters keep their old
    centroid) but the centroids are float MEANS — not expressible as a
    finite SQL constant table, so the oracle-verified registered query
    stays on the sampled path; measured recall impact is pinned in
    tests/test_ann_recall.py."""
    import numpy as np

    sub = dim // m
    n_take = n_codes if kmeans_iters <= 0 else max(n_codes, train_max)
    rows = (
        corpus_v.orderBy(_knuth_key(F.col("id")).asc(), F.col("id").asc())
        .limit(n_take)
        .collect()
    )
    if kmeans_iters <= 0:
        return [
            [
                [float(x) for x in r["v"][s * sub:(s + 1) * sub]]
                for r in rows
            ]
            for s in range(m)
        ]
    train = np.array([[float(x) for x in r["v"]] for r in rows],
                     dtype=np.float64)
    if train.shape[0] < n_codes:
        return [[list(r) for r in train[:, s * sub:(s + 1) * sub]]
                for s in range(m)]  # degenerate: sampled path shape
    return _train_pq(train, m, sub, n_codes, kmeans_iters)


def _train_pq(train, m: int, sub: int, n_codes: int, iters: int) -> list:
    """Per-subspace deterministic Lloyd over a training matrix
    (n, m*sub): seeded with the first n_codes rows, argmin ties to the
    lowest code, empty clusters keep their centroid. ``iters=0`` =
    the seed itself (sampled codebook)."""
    import numpy as np

    out = []
    for s in range(m):
        X = train[:, s * sub:(s + 1) * sub]
        C = X[:n_codes].copy()
        for _ in range(iters):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)  # ties -> lowest code id
            for c in range(n_codes):
                pts = X[assign == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
        out.append([list(map(float, row)) for row in C])
    return out


def _half_up_micros(arr):
    """Exact half-away-from-zero rounding of non-negative double micros:
    ``x - floor(x)`` is EXACT for doubles (Sterbenz), so the >= 0.5 test
    sees the true fractional part — matching how Spark's ``round``
    (BigDecimal HALF_UP) and DuckDB's ``ROUND`` treat the exact double
    value, where ``floor(x + 0.5)`` would mis-round near-boundary
    ulps."""
    import numpy as np

    f = np.floor(arr)
    return (f + (arr - f >= 0.5)).astype(np.int64)


def _pq_dists_micro(mat, cb):
    """(n, m, n_codes) int64 micro-distances: squared L2 between every
    row's subvector s and code c. The j-reduction is a SEQUENTIAL
    Python-level loop (left-assoc double adds, the same fold order the
    SQL oracle spells out term by term); numpy's own ``sum`` would use
    pairwise blocking and drift in the last ulp."""
    import numpy as np

    n, (m, n_codes, sub) = mat.shape[0], cb.shape
    out = np.empty((n, m, n_codes), dtype=np.int64)
    for s in range(m):
        subm = mat[:, s * sub:(s + 1) * sub]       # (n, sub)
        diff0 = subm[:, None, 0] - cb[s][None, :, 0]
        acc = diff0 * diff0                         # (n, n_codes)
        for j in range(1, sub):
            d = subm[:, None, j] - cb[s][None, :, j]
            acc = acc + d * d
        out[:, s, :] = _half_up_micros(acc * 1e6)
    return out


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    kmeans_iters: int = 0,
) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011): corpus vectors are
    compressed to ``m`` sub-space code ids (here m x log2(n_codes) bits
    — 4x-32x smaller than the raw floats), and each query scans CODES
    with an additive lookup table instead of touching raw vectors — the
    memory-bound regime where a 100 TB embedding corpus becomes
    scannable. Returns (query_id, neighbor_id, adist_micro, rnk):
    approximate squared-L2 distance in integer micros, ascending, ties
    by neighbor id.

    Scale shape: encoding and LUT construction are Arrow-batched numpy
    against the broadcast codebooks (the ``ivf`` GEMM discipline — a
    1024-term JVM expression tree was measured 10x slower); the scan is
    a broadcast join over (codes, luts) doing m integer lookups per
    pair in the JVM, so no raw-vector bytes move after encoding, and
    the per-query top-k is a bounded window. Distances ride integer
    micros end-to-end with exact-fold-order reductions and exact
    half-up rounding (``_pq_dists_micro``), which is what lets the
    driver gate hash-verify a float-geometry ANN operator against ANSI
    SQL."""
    import numpy as np
    from pyspark.sql import types as T

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    v = F.col("v")
    finite = ~F.exists(
        v,
        lambda x: (
            x.isNull() | F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == F.lit(float("inf")))
        ),
    )

    def _clean(df):
        return (
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .where(F.col("id").isNotNull() & v.isNotNull()
                   & (F.size(v) == dim) & finite)
        )

    cv, qv = _clean(corpus), _clean(queries)
    sub = dim // m
    cb = np.array(pq_codebooks(cv, dim, m, n_codes,
                               kmeans_iters=kmeans_iters),
                  dtype=np.float64)
    if cb.shape != (m, n_codes, sub):
        raise ValueError(
            f"corpus has fewer than n_codes={n_codes} usable vectors"
        )
    b_cb = corpus.sparkSession.sparkContext.broadcast(cb)

    def encode_task(batches):
        import pandas as pd

        cbv = b_cb.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            dists = _pq_dists_micro(mat, cbv)
            yield pd.DataFrame({
                "id": pdf["id"].values,
                "codes": list(
                    np.argmin(dists, axis=2).astype(np.int32)
                ),
            })

    def lut_task(batches):
        import pandas as pd

        cbv = b_cb.value
        nc = cbv.shape[1]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            dists = _pq_dists_micro(mat, cbv)
            yield pd.DataFrame({
                "query_id": pdf["id"].values,
                "lut": list(dists.reshape(len(pdf), -1)),
            })

    encoded = cv.mapInPandas(
        encode_task,
        T.StructType([
            cv.schema["id"],
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]),
    )
    luts = qv.mapInPandas(
        lut_task,
        T.StructType([
            T.StructField("query_id", qv.schema["id"].dataType),
            T.StructField("lut", T.ArrayType(T.LongType())),
        ]),
    )
    score = None
    for s in range(m):
        term = F.element_at(
            F.col("lut"),
            (F.lit(s * n_codes)
             + F.element_at(F.col("codes"), s + 1) + 1).cast("int"),
        )
        score = term if score is None else score + term
    scored = (
        encoded.join(F.broadcast(luts),
                     F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            score.alias("adist_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    n_lists: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 0,
    residual: bool = False,
) -> DataFrame:
    """IVF-pruned PQ scanning — the production ANN shape (FAISS
    IVFPQ): a coarse quantizer assigns every corpus vector to one of
    ``n_lists`` inverted lists, queries probe only their ``n_probe``
    nearest lists, and within probed lists candidates are scored by
    the PQ/ADC integer-lookup scan — so a query touches
    ~n_probe/n_lists of the CODES, and none of the raw vectors.

    Both quantizers reuse the deterministic Knuth-sample discipline
    (coarse centroids = the n_lists Knuth-smallest vectors; PQ
    codebooks = the n_codes Knuth-smallest), and every distance rides
    the exact integer-micro pipeline (``_pq_dists_micro``), so the
    composed index is hash-verifiable against ANSI SQL like its two
    parts. ``kmeans_iters`` trains both quantizers (see
    ``pq_codebooks``).

    ``residual=True`` is FAISS's default encoding and the recall
    upgrade when bit-parity with a SQL oracle is not required: codes
    quantize ``v - C_list`` (what remains AFTER the coarse quantizer,
    a much tighter distribution than raw vectors), the codebooks train
    on residuals of a bounded Knuth sample, and each query builds one
    ADC lookup table PER PROBED LIST over ``q - C_list`` — n_probe
    LUTs instead of one, same bounded broadcast shape. Deterministic
    end to end; measured recall in SCALE.md, pinned in
    tests/test_ann_recall.py.

    Output: (query_id, neighbor_id, adist_micro, rnk) — candidates a
    probe never reaches simply don't appear, the IVF trade."""
    import numpy as np
    from pyspark.sql import types as T

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    v = F.col("v")
    finite = ~F.exists(
        v,
        lambda x: (
            x.isNull() | F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == F.lit(float("inf")))
        ),
    )

    def _clean(df):
        return (
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .where(F.col("id").isNotNull() & v.isNotNull()
                   & (F.size(v) == dim) & finite)
        )

    cv, qv = _clean(corpus), _clean(queries)
    sub = dim // m
    coarse = np.array(pq_codebooks(cv, dim, 1, n_lists,
                                   kmeans_iters=kmeans_iters),
                      dtype=np.float64)
    if coarse.shape != (1, n_lists, dim):
        raise ValueError("corpus smaller than the requested quantizers")
    if residual:
        # Codebooks train on RESIDUALS of a bounded Knuth sample:
        # assign each training vector to its coarse list, subtract the
        # centroid, Lloyd per subspace (iters=0 keeps the first
        # n_codes residuals — the sampled-seed discipline).
        rows = (
            cv.orderBy(_knuth_key(F.col("id")).asc(), F.col("id").asc())
            .limit(max(n_codes, PQ_TRAIN_MAX if kmeans_iters > 0
                       else 4 * n_codes))
            .collect()
        )
        train = np.array([[float(x) for x in r["v"]] for r in rows],
                         dtype=np.float64)
        if train.shape[0] < n_codes:
            raise ValueError("corpus smaller than the requested quantizers")
        cd = ((train[:, None, :] - coarse[0][None, :, :]) ** 2).sum(axis=2)
        res = train - coarse[0][np.argmin(cd, axis=1)]
        cb = np.array(_train_pq(res, m, sub, n_codes, kmeans_iters),
                      dtype=np.float64)
    else:
        cb = np.array(pq_codebooks(cv, dim, m, n_codes,
                                   kmeans_iters=kmeans_iters),
                      dtype=np.float64)
    if cb.shape != (m, n_codes, sub):
        raise ValueError("corpus smaller than the requested quantizers")
    sc_ = corpus.sparkSession.sparkContext
    b_cb, b_coarse = sc_.broadcast(cb), sc_.broadcast(coarse)

    def encode_task(batches):
        import pandas as pd

        cbv, crs = b_cb.value, b_coarse.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            cd = _pq_dists_micro(mat, crs)[:, 0, :]   # (n, n_lists)
            # argmin ties to the smallest list id (int compare).
            lists = np.argmin(cd, axis=1)
            enc_in = mat - crs[0][lists] if residual else mat
            dists = _pq_dists_micro(enc_in, cbv)
            yield pd.DataFrame({
                "id": pdf["id"].values,
                "list_id": lists.astype(np.int32),
                "codes": list(np.argmin(dists, axis=2).astype(np.int32)),
            })

    def probe_task(batches):
        import pandas as pd

        cbv, crs = b_cb.value, b_coarse.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            cd = _pq_dists_micro(mat, crs)[:, 0, :]
            # stable sort: coarse-distance ties probe the smaller list
            # id first — the SQL oracle's ORDER BY d, list.
            probes = np.argsort(cd, axis=1, kind="stable")[:, :n_probe]
            idx = np.arange(len(pdf)).repeat(probes.shape[1])
            if residual:
                # One ADC table per probed list: ||(q - C_l)_s - cb||².
                rvec = mat[idx] - crs[0][probes.ravel()]
                luts = _pq_dists_micro(rvec, cbv).reshape(len(idx), -1)
            else:
                dists = _pq_dists_micro(mat, cbv).reshape(len(pdf), -1)
                luts = dists[idx]
            yield pd.DataFrame({
                "query_id": pdf["id"].values[idx],
                "list_id": probes.ravel().astype(np.int32),
                "lut": list(luts),
            })

    encoded = cv.mapInPandas(
        encode_task,
        T.StructType([
            cv.schema["id"],
            T.StructField("list_id", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]),
    )
    probes = qv.mapInPandas(
        probe_task,
        T.StructType([
            T.StructField("query_id", qv.schema["id"].dataType),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("lut", T.ArrayType(T.LongType())),
        ]),
    )
    score = None
    for s in range(m):
        term = F.element_at(
            F.col("lut"),
            (F.lit(s * n_codes)
             + F.element_at(F.col("codes"), s + 1) + 1).cast("int"),
        )
        score = term if score is None else score + term
    scored = (
        encoded.join(
            F.broadcast(probes),
            (F.col("id") != F.col("query_id"))
            & (encoded["list_id"] == probes["list_id"]),
        )
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            score.alias("adist_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def ivfpq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank_factor: int = 4,
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    n_lists: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 0,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ with EXACT re-ranking — the standard production recall
    fix (FAISS ``IndexRefineFlat``): the ADC scan's top
    ``rerank_factor * k`` candidates per query are re-scored with the
    exact squared-L2 distance over the RAW vectors, and the final
    top-k comes from the exact scores. PQ's quantization error then
    only matters when it pushes a true neighbor out of the top-R
    shortlist entirely, so recall approaches the pure-IVF ceiling at a
    fraction of its cost.

    Scale shape: stage 1 is the audited ``ivfpq_topk`` (codes-only
    scan, bounded broadcasts); stage 2 re-reads raw vectors for ONLY
    the R*n_queries candidates — the candidate list broadcasts into a
    semi-join against the corpus (one column-pruned scan, no shuffle),
    and the exact distances ride the same sequential-fold integer-micro
    kernel (``_pq_dists_micro``) as every other distance here, so the
    whole two-stage index is hash-verifiable against ANSI SQL. Query
    vectors broadcast (bounded — the same contract as stage 1's LUT
    broadcast).

    Output: (query_id, neighbor_id, dist_micro, rnk) — ``dist_micro``
    is the EXACT distance, ascending, ties by neighbor id."""
    import numpy as np
    from pyspark.sql import types as T

    if rerank_factor < 1:
        raise ValueError(f"rerank_factor must be >= 1, got {rerank_factor}")
    cand = ivfpq_topk(
        corpus, queries, id_col, vec_col, k=rerank_factor * k, dim=dim,
        m=m, n_codes=n_codes, n_lists=n_lists, n_probe=n_probe,
        kmeans_iters=kmeans_iters, residual=residual,
    ).select("query_id", "neighbor_id")

    v = F.col("v")
    finite = ~F.exists(
        v,
        lambda x: (
            x.isNull() | F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == F.lit(float("inf")))
        ),
    )

    def _clean(df):
        return (
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .where(F.col("id").isNotNull() & v.isNotNull()
                   & (F.size(v) == dim) & finite)
        )

    cv, qv = _clean(corpus), _clean(queries)
    qrows = qv.collect()  # bounded: queries broadcast in stage 1 too
    qindex = {r["id"]: i for i, r in enumerate(qrows)}
    qmat = np.array([[float(x) for x in r["v"]] for r in qrows],
                    dtype=np.float64)[None, :, :]  # (1, n_q, dim)
    b_q = corpus.sparkSession.sparkContext.broadcast((qindex, qmat))

    withv = F.broadcast(cand).join(
        cv, cand["neighbor_id"] == cv["id"]
    ).select("query_id", "neighbor_id", "v")

    def rerank_task(batches):
        import pandas as pd

        qidx, qc = b_q.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            # Same sequential left-assoc fold as the SQL oracle's
            # term-by-term chain: one "subspace" spanning the full dim.
            d = _pq_dists_micro(mat, qc)[:, 0, :]          # (n, n_q)
            col = np.fromiter(
                (qidx[q] for q in pdf["query_id"]), dtype=np.int64,
                count=len(pdf),
            )
            yield pd.DataFrame({
                "query_id": pdf["query_id"].values,
                "neighbor_id": pdf["neighbor_id"].values,
                "dist_micro": d[np.arange(len(pdf)), col],
            })

    exact = withv.mapInPandas(
        rerank_task,
        T.StructType([
            T.StructField("query_id", qv.schema["id"].dataType),
            T.StructField("neighbor_id", cv.schema["id"].dataType),
            T.StructField("dist_micro", T.LongType()),
        ]),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int = 5,
    approx_rank: Optional[str] = None,
    exact_rank: str = "rank",
) -> DataFrame:
    """Retrieval quality of an ANN method against the exact baseline:
    per query, ``hits_at_k`` = |approx top-k ∩ exact top-k| and
    ``recall`` = hits/k (rounded to 4 digits — exact integer counting
    over deterministic inputs, so the whole report is SQL-oracleable).

    ``approx``/``exact``: (query_id, neighbor_id, <rank col>) frames as
    returned by ``cosine_topk`` (the exact GEMM/broadcast baseline) and
    the approximate methods (``lsh_bucket_topk``, ``ivf_topk``,
    ``pq_topk``, ``ivfpq_topk``). ``approx_rank=None`` means the frame
    is already cut to its top-k (pq/ivfpq return only rnk<=k rows).

    Every query in the EXACT baseline appears in the output (an ANN
    method whose probes miss every true neighbor scores 0.0 rather than
    vanishing — the failure mode the report exists to surface).

    Scale: two column-pruned projections joined on (query_id,
    neighbor_id) and a groupBy on query_id — all bounded by
    n_queries*k rows, nothing corpus-sized."""
    a = approx
    if approx_rank is not None:
        a = a.where(F.col(approx_rank) <= k)
    a = a.select("query_id", "neighbor_id")
    e = exact.where(F.col(exact_rank) <= k).select(
        "query_id", "neighbor_id"
    )
    hits = (
        e.join(a, ["query_id", "neighbor_id"], "inner")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    qs = e.select("query_id").distinct()
    return qs.join(hits, ["query_id"], "left").select(
        "query_id",
        F.coalesce(F.col("hits"), F.lit(0)).cast("long")
        .alias("hits_at_k"),
        F.round(
            F.coalesce(F.col("hits"), F.lit(0)) / F.lit(float(k)), 4
        ).alias("recall"),
    )


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    margin_threshold: float = 1.0,
    round_digits: int = 4,
    topk_fn=None,
) -> DataFrame:
    """Margin-based parallel-corpus (bitext) mining — the
    LASER/CCMatrix alignment step (Artetxe & Schwenk 2019: "Margin
    based Parallel Corpus Mining with Multilingual Sentence
    Embeddings"): for every source embedding, score candidate targets
    by RATIO margin

        margin(x, y) = cos(x, y) /
            (avgₖ cos(x, NNₖ(x, tgt))/2 + avgₖ cos(y, NNₖ(y, src))/2)

    which normalizes away hubness (a target that is everyone's
    neighbor gets a high denominator), then keep each source's best
    target with margin >= ``margin_threshold``.

    Output: (src_id, tgt_id, cosine, margin) — one row per mined pair,
    margin rounded to ``round_digits`` (deterministic ordering /
    oracle-friendly like the rest of this module). IDs must be unique
    WITHIN each side; the two sides' id spaces must be disjoint (the
    underlying top-k excludes same-id matches, which would otherwise
    silently drop cross-lingual pairs that share an id).

    Scale shape: two top-k passes (src->tgt and tgt->src) plus two
    per-id average tables joined back onto the forward candidates —
    O(N·k) candidate rows, never an all-pairs join. The averages have
    ONE ROW PER SENTENCE (O(corpus) cardinality), so they are joined
    without a broadcast hint: AQE broadcasts them when the corpus is
    small and falls back to a shuffle join at scale — a forced
    broadcast here would OOM the driver at the 100 TB target this
    operator's ``ivf_topk`` path exists for. ``topk_fn``
    defaults to the exact ``cosine_topk`` (broadcast-or-shuffle; the
    bounded-corpus oracle path); at 100 TB pass ``ivf_topk`` or
    ``lsh_bucket_topk`` — any callable with the module's standard
    (corpus, queries, id_col, vec_col, k) -> (query_id, neighbor_id,
    score, rank) contract."""
    fn = topk_fn or cosine_topk
    fwd = fn(tgt, src, id_col=id_col, vec_col=vec_col, k=k).select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("tgt_id"),
        F.col("score").alias("cosine"),
    )
    bwd = fn(src, tgt, id_col=id_col, vec_col=vec_col, k=k).select(
        F.col("query_id").alias("tgt_id"),
        F.col("score").alias("bscore"),
    )
    # Candidate rows fan out from fwd THREE ways (avg_fwd agg, the
    # margin join, best-per-src) — pin one evaluation.
    fwd = fwd.localCheckpoint(eager=False)
    avg_fwd = fwd.groupBy("src_id").agg(
        F.avg("cosine").alias("src_avg")
    )
    avg_bwd = bwd.groupBy("tgt_id").agg(
        F.avg("bscore").alias("tgt_avg")
    )
    # NO broadcast hint: avg_fwd/avg_bwd are O(corpus)-row (one row per
    # source/target sentence). Let AQE pick broadcast vs shuffle from
    # the measured size (round-12 verdict finding #1).
    scored = (
        fwd.join(avg_fwd, "src_id")
        .join(avg_bwd, "tgt_id")
        .withColumn(
            "margin",
            F.round(
                F.col("cosine")
                / (F.col("src_avg") / 2 + F.col("tgt_avg") / 2),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where((F.col("__r") == 1)
               & (F.col("margin") >= margin_threshold))
        .select("src_id", "tgt_id", "cosine", "margin")
    )
