"""Deterministic sampling and dataset-split operators for training-data
pipelines.

Additive capabilities beyond the reference (google/space stores training
data but has no sampling operators). All are built on a cross-engine
deterministic bucket hash — md5 of the row id (not ``rand()``), so:

- results are REPRODUCIBLE run-to-run and engine-to-engine (each operator
  has a plain-SQL oracle in ``__spark_entry__.py``);
- membership is STABLE under repartitioning, retries, and incremental
  re-runs — a row's split assignment never changes when the corpus grows,
  which is the property a train/val/test split must have at 100 TB
  (``rand()``-based sampling changes membership every execution and with
  every partitioning);
- the plan is a pure JVM projection + filter (whole-stage codegen, no
  shuffle for sample/split; one hash shuffle per stratum for the exact
  stratified variant).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Buckets per unit of probability mass: fractions are quantized to 1/10000.
BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: int = 42) -> Column:
    """Deterministic bucket in [0, BUCKETS): the first 15 md5 hex digits
    of ``"<id>:<seed>"`` parsed as an integer, mod BUCKETS. Identical in
    any SQL engine (DuckDB mirror:
    ``('0x' || substring(md5(id || ':' || seed), 1, 15))::BIGINT % 10000``).
    """
    key = F.concat_ws(":", id_col.cast("string"), F.lit(str(seed)))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return (h % BUCKETS).cast("int")


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic ~``fraction`` sample: rows whose bucket falls below
    ``fraction * BUCKETS``. No shuffle; membership is a property of the
    row id, so the sample is stable across runs and appends."""
    return df.where(
        hash_bucket(F.col(id_col), seed) < int(round(fraction * BUCKETS))
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by cumulative bucket
    ranges (e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``). Weights
    must sum to 1 (+-1/BUCKETS); iteration order fixes the ranges, so the
    same weights dict always produces the same assignment."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1.0 / BUCKETS:
        raise ValueError(f"Split weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(id_col), seed)
    expr = None
    cum = 0
    names = list(weights)
    for name in names[:-1]:
        cum += int(round(weights[name] * BUCKETS))
        cond = bucket < cum
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: Union[str, Sequence[str]],
    fraction: float,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """EXACT per-stratum sample: within each stratum, rank rows by their
    hash bucket (id tie-break) and keep the first ``ceil(fraction * n)``.
    Guarantees every stratum — including rare ones a uniform hash sample
    would miss — contributes proportionally; the standard rebalancing
    primitive for skewed training corpora.

    One hash shuffle on the strata columns (window + count); rank order is
    the hash order, so the kept subset is pseudo-random yet deterministic.
    """
    strata: List[str] = (
        [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    )
    bucket = hash_bucket(F.col(id_col), seed)
    w = Window.partitionBy(*strata).orderBy(
        bucket.asc(), F.col(id_col).asc()
    )
    cw = Window.partitionBy(*strata)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(cw))
        .where(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__rn", "__n")
    )


# Mixture samplers collect one row per distinct group to the driver and
# re-emit the quotas as a literal map — driver state and plan size are
# O(|groups|), which is fine for language/source mixes (dozens to
# thousands of groups) and WRONG for an unbounded key like URL host.
# The bounded collect below fails loudly past this cap instead of
# OOMing the driver.
MIX_MAX_GROUPS = 10_000


def _mixture_counts(df: DataFrame, group_col: str,
                    op: str) -> Dict:
    """Distinct-group row counts as a driver dict, via a BOUNDED collect
    (at most MIX_MAX_GROUPS + 1 rows leave the cluster)."""
    rows = (
        df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
        .limit(MIX_MAX_GROUPS + 1).collect()
    )
    if len(rows) > MIX_MAX_GROUPS:
        raise ValueError(
            f"{op}: more than {MIX_MAX_GROUPS} distinct groups in "
            f"{group_col!r} — the quota table is driver state and a "
            "literal plan node; bucket or pre-filter the group column"
        )
    return {r[group_col]: int(r["__n"]) for r in rows}


def _keep_by_group_quota(df: DataFrame, group_col: str, id_col: str,
                         quotas: Dict, seed: int) -> DataFrame:
    """Keep the first ``quotas[g]`` rows of each group by hash-bucket
    rank (id tie-break): one per-group rank window over the corpus — no
    join, no global window; the quota map is a literal."""
    quota_map = F.create_map(
        *[F.lit(x) for k in sorted(quotas, key=str)
          for x in (k, quotas[k])]
    )
    bucket = hash_bucket(F.col(id_col), seed)
    rw = Window.partitionBy(group_col).orderBy(bucket.asc(),
                                              F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(rw))
        .where(F.col("__rn") <= quota_map[F.col(group_col)])
        .drop("__rn")
    )


def domain_mix_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weights: Dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Deterministic domain-mixture resampling: downsample each group so
    the kept corpus matches the target proportions ``weights`` — the
    mixture-rebalancing step of a pretraining data pipeline (e.g. language
    or source balancing a la The Pile / Dolma mixture weights).

    The largest corpus achieving the target mix exactly is kept: with
    group counts n_g and normalized weights w_g, the feasible total is
    T = min_g floor(n_g / w_g) and each group keeps floor(w_g * T) rows —
    integer arithmetic, so every engine agrees. Rows within a group are
    kept by hash-bucket rank (id tie-break), so the kept set is
    pseudo-random, reproducible, and stable run-to-run. Groups absent
    from ``weights`` are dropped (weight 0); a ``weights`` key with NO
    rows in the data raises ``ValueError`` — the contract is that the
    kept corpus matches the target mix EXACTLY, and a missing group
    would silently ship the remaining groups at full quota with zero of
    the missing one. The guard is checked eagerly on the group-count
    aggregate so it fires even when EVERY weighted group is absent (an
    in-plan ``raise_error`` never evaluates when the surviving row set
    is empty).

    Plan shape: one group-count aggregate job at build time (|groups|
    rows to the driver — the quota table, re-emitted as literals), then
    one hash shuffle of the corpus on the group column for the rank
    window. No global window, no driver-side row data. At 100 TB the
    quota aggregate is a map-side-combined count and the rank shuffle
    is the same discipline as ``stratified_sample``."""
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("Domain weights must have positive mass")
    norm = {k: v / total_w for k, v in weights.items()}
    w_map = F.create_map(
        *[F.lit(x) for kv in norm.items() for x in kv]
    )
    weighted = (
        df.withColumn("__w", w_map[F.col(group_col)])
        .where(F.col("__w").isNotNull() & (F.col("__w") > 0))
    )
    # Quota table: n_g per group -> feasible total T = min_g floor(n_g /
    # w_g) -> quota_g = floor(w_g * T). |groups| rows: collected once,
    # validated, and re-emitted as a literal map (no join in the plan).
    counts = _mixture_counts(weighted, group_col, "domain_mix_sample")
    missing = sorted(k for k, v in norm.items()
                     if v > 0 and k not in counts)
    if missing:
        raise ValueError(
            "domain_mix_sample: weights name groups with no rows in "
            f"the data (target mix is unsatisfiable): {', '.join(missing)}"
        )
    import math

    # floor(n / w) via true division + floor: Python's float ``//`` is
    # fmod-based and can differ by 1 from SQL/Spark FLOOR(n/w) at
    # representation boundaries (30 // 0.2 == 149.0, floor(30/0.2) == 150).
    feasible_t = min(int(math.floor(counts[k] / norm[k])) for k in counts)
    quotas = {k: int(norm[k] * feasible_t) for k in counts}
    return _keep_by_group_quota(
        weighted, group_col, id_col, quotas, seed
    ).drop("__w")


def weighted_sample(
    df: DataFrame, weight_col: str, id_col: str, seed: int = 42
) -> DataFrame:
    """Independent per-row Bernoulli sample with acceptance probability
    = ``weight_col`` (clamped to [0, 1]), decided by the deterministic
    id hash — the quality-weighted resampling step of a corpus pipeline
    (keep high-quality documents with high probability, down-weight the
    tail, e.g. DSIR/quality-classifier sampling).

    Pure projection + filter: no shuffle, membership stable under
    repartitioning and appends, reproducible in any engine (md5 hash;
    same contract as ``hash_sample``)."""
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)),
                F.lit(1.0))
    return df.where(
        hash_bucket(F.col(id_col), seed) < w * F.lit(float(BUCKETS))
    )


def quality_mix_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rates: Sequence[float] = (1.0, 0.5, 0.1),
    vocab_size: int = 65536,
    seed: int = 42,
) -> DataFrame:
    """CCNet-style perplexity-bucket mixing: score every document with
    the corpus-unigram LM (``text.unigram_logprob`` — the KenLM stand-in),
    label it head / middle / tail by its mean per-token log-probability
    relative to corpus-level cut points, and keep each bucket at its
    ``rates`` fraction (head, middle, tail) by the deterministic md5
    bucket hash. This is the quality-mixing step of a crawl pipeline:
    fluent text trains at full weight, the murky middle is thinned, the
    perplexity tail (boilerplate, gibberish, wrong-language shards) is
    nearly dropped — without a hard cliff that would delete every
    informal document.

    Cut points are CORPUS-LEVEL statistics in exact integer micro-units,
    not data-independent constants and not quantiles: head starts at the
    corpus mean of per-document means, tail below the midpoint between
    that mean and the corpus minimum. Both derive from one scalar
    aggregate (count / sum / min — all combinable, map-side partial),
    so the bucketing needs NO global sort or NTILE window: an NTILE
    tercile — the textbook formulation — funnels every row through one
    task at 100 TB, while this plan's only corpus-keyed exchanges are
    the ones already inside ``unigram_logprob``. Every arithmetic step
    is integer-exact or a single IEEE double divide + floor, so bucket
    membership — and therefore the kept set — is bit-identical across
    engines.

    Documents the LM could not score at all (empty / NULL / whitespace
    text: ``n_scored == 0``) have no fluency evidence and land in the
    tail bucket with a NULL mean.

    Returns kept rows only: (id, bucket, mean_lp_micro). Join back to
    the corpus on the id to materialize surviving text. The score
    table (one narrow row per document) is materialized ONCE with an
    eager localCheckpoint at construction: its two consumers — the
    corpus-stats aggregate under the broadcast and the labeling scan —
    are concurrently scheduled stages of the same downstream action,
    exactly the double-compute hazard a lazy checkpoint cannot close
    (see dedup's shingle checkpoint), and without a checkpoint the
    whole ``unigram_logprob`` pipeline (two corpus tokenizations + the
    corpus-wide token-count shuffle) would execute twice per run.

    Caveats of that eager checkpoint (ADVICE r13, documented
    tradeoff): CONSTRUCTING this plan launches the scoring jobs
    immediately, the checkpointed blocks are released by driver GC +
    ContextCleaner only after the returned plan is dropped, and a
    checkpointed intermediate is unrecoverable on executor loss (the
    job re-runs from the source). A long-lived session building many
    of these plans without executing them pays scoring + block
    retention for each."""
    if len(rates) != 3:
        raise ValueError("rates must be (head, middle, tail)")
    if not all(0.0 <= r <= 1.0 for r in rates):
        raise ValueError("rates must be fractions in [0, 1]")
    from space_spark.operators.text import unigram_logprob

    scores = unigram_logprob(df, id_col, text_col, vocab_size)
    scored = scores.withColumn(
        "mean_lp_micro",
        F.when(
            F.col("n_scored") > 0,
            F.floor(
                F.col("logprob_micro_sum").cast("double")
                / F.col("n_scored")
            ),
        ).cast("long"),
    )
    # EAGER by design: consumed by concurrently scheduled stages (the
    # broadcast stats subquery + the labeling scan) of one action — a
    # lazy checkpoint could be double-computed there. Values are
    # unchanged by materialization; only the duplicate scoring pass is
    # removed.
    scored = scored.localCheckpoint(eager=True)
    stats = scored.where(F.col("mean_lp_micro").isNotNull()).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("mean_lp_micro").alias("__sum"),
        F.min("mean_lp_micro").alias("__min"),
    )
    mean_mu = F.floor(
        F.col("__sum").cast("double") / F.col("__cnt")
    ).cast("long")
    tail_cut = F.floor(
        (mean_mu + F.col("__min")).cast("double") / F.lit(2.0)
    ).cast("long")
    labeled = scored.crossJoin(F.broadcast(stats)).withColumn(
        "bucket",
        F.when(F.col("mean_lp_micro").isNull(), F.lit("tail"))
        .when(F.col("mean_lp_micro") >= mean_mu, F.lit("head"))
        .when(F.col("mean_lp_micro") >= tail_cut, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    head_t, mid_t, tail_t = (int(round(r * BUCKETS)) for r in rates)
    keep_thresh = (
        F.when(F.col("bucket") == "head", F.lit(head_t))
        .when(F.col("bucket") == "middle", F.lit(mid_t))
        .otherwise(F.lit(tail_t))
    )
    return (
        labeled.where(hash_bucket(F.col(id_col), seed) < keep_thresh)
        .select(id_col, "bucket", "mean_lp_micro")
    )


def temperature_mix_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-based mixture resampling (the multilingual-pretraining
    alpha-sampling of mT5 / XLM-R): target proportions p_g ∝ n_g^alpha
    flatten the group distribution toward uniform as alpha -> 0. Without
    replication, the largest corpus matching those proportions keeps
    quota_g = floor(n_g^alpha * n_min^(1-alpha)) rows per group — the
    binding constraint is the smallest group, which is kept in full;
    alpha=1 keeps everything, alpha=0 caps every group at n_min. Rows
    with a NULL group are dropped.

    The quota form is DENOMINATOR-FREE — no cross-group float sum whose
    summation order could differ between engines — and for the default
    alpha=0.5 it is floor(sqrt(n_g * n_min)) computed in IEEE doubles:
    every engine runs the IDENTICAL double conversion + correctly
    rounded sqrt + floor, so the kept set matches across engines at any
    scale (and equals the exact integer quota whenever n_g * n_min fits
    a double's 2^53 integer range). Other alphas go through pow, which
    can differ by 1 ulp across C math libraries — fine for pipelines,
    but pin alpha=0.5 where bit-exact cross-engine reproducibility
    matters.

    Same plan shape as ``domain_mix_sample``: one eager group-count
    aggregate (a BOUNDED collect — more than MIX_MAX_GROUPS distinct
    groups raises rather than OOMing the driver; temperature mixes are
    language/source balancing, not unbounded-key sampling), then one
    per-group rank-window shuffle of the corpus — no join, no global
    window."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    import math

    grouped = df.where(F.col(group_col).isNotNull())
    counts = _mixture_counts(grouped, group_col, "temperature_mix_sample")
    if not counts:
        return grouped.where(F.lit(False))
    n_min = min(counts.values())

    def quota(n: int) -> int:
        if alpha == 0.5:
            return int(math.floor(math.sqrt(float(n * n_min))))
        return int(math.floor(
            math.pow(float(n), alpha) * math.pow(float(n_min), 1.0 - alpha)
        ))

    quotas = {k: quota(n) for k, n in counts.items()}
    return _keep_by_group_quota(grouped, group_col, id_col, quotas, seed)
