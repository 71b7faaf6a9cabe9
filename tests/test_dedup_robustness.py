"""Dedup-operator robustness pins from the round-7 review — each of
these reproduced a real failure before its fix."""

import pytest
from pyspark.sql import functions as F

from space_spark.operators.dedup import (
    dedup_clusters,
    duplicate_groups,
    minhash_lsh_pairs,
)


def test_minhash_survives_multiple_null_docs_under_ansi(spark):
    """Two+ null/empty docs share the identical sentinel signature, so
    they bucket-collide in every band; verifying such a pair divides
    0/0 — a job-killing DIVIDE_BY_ZERO under Spark 4's default ANSI
    mode (the null-inputs fixture had exactly ONE null row, which is
    why it never caught this). Empty-shingle docs are now excluded
    from banding — output-equivalent, since they can never reach a
    positive threshold."""
    rows = [(1, None), (2, None), (3, ""), (4, "a b c d e f"),
            (5, "a b c d e f")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        pairs = minhash_lsh_pairs(docs, "doc_id", "text").collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {(4, 5)}, got  # real dups found; null docs pair nothing


def test_minhash_rejects_bad_band_geometry(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(docs, "doc_id", "text", num_perm=8, bands=16)
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(docs, "doc_id", "text", num_perm=100, bands=64)


def test_dedup_clusters_raises_when_budget_exhausted(spark):
    """A component whose diameter exceeds max_iter must raise, not
    silently return labels that split one true component."""
    chain = [(i, i + 1) for i in range(8)]
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup_clusters(pairs, max_iter=2)
    ok = dedup_clusters(pairs, max_iter=20)
    assert ok.select(F.countDistinct("cluster_id")).first()[0] == 1


def test_duplicate_groups_excludes_null_ids(spark):
    """exact_dedup passes NULL-id rows through undeduplicated; the
    group report must count only rows a dedup would actually consider,
    so the two operators' numbers can never contradict."""
    rows = [(None, "x"), (5, "x"), (None, "y")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["text"]: r for r in
           duplicate_groups(docs, ["text"], "doc_id").collect()}
    assert out["x"]["keep_id"] == 5 and out["x"]["dup_count"] == 1
    assert "y" not in out  # all-null-id group: nothing dedupable


def test_similarity_geometry_and_poison_guards(spark):
    """similarity.py analogs of the LSH geometry/poison class (round-7
    review): bad plane counts raise; wrong-length vectors are excluded
    instead of silently collapsing every row into bucket 0; quantize
    handles null vectors/components; random_projection drops poison."""
    from space_spark.operators.similarity import (
        lsh_bucket_topk,
        quantize_int8,
        random_projection,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [1.0, 0.0, 5.0]),
         (4, None), (5, [float("nan"), 1.0]), (6, [None, 5.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="planes"):
        lsh_bucket_topk(emb, emb, dim=2, n_planes=31).collect()
    with pytest.raises(ValueError, match=">= 1"):
        lsh_bucket_topk(emb, emb, dim=2, n_planes=0).collect()
    out = lsh_bucket_topk(emb, emb, dim=2, n_planes=4, k=2).collect()
    ids = {r["query_id"] for r in out} | {r["neighbor_id"] for r in out}
    assert 3 not in ids and 4 not in ids  # wrong-length + null excluded

    q = {r["id"]: r for r in quantize_int8(emb, "vec_id").collect()}
    assert 4 not in q  # null vector: no length to quantize at
    assert q[6]["scale"] == 0.0 and q[6]["q"] == [0, 0]  # null component
    assert q[1]["q"] == [127, 0]

    p = {r["vec_id"]: r
         for r in random_projection(emb, "vec_id", "embedding",
                                    out_dim=3, in_dim=2).collect()}
    assert set(p) == {1, 2}  # poison/mismatch rows dropped
    assert all(x is not None for x in p[1]["proj"])


def test_trailing_whitespace_docs_are_exact_near_duplicates(spark):
    """Round-7 tokenization fix: F.trim strips ASCII spaces only, so a
    trailing \\n/\\t used to add a phantom '' edge token — two docs
    identical but for a trailing newline scored Jaccard 0.75 and
    escaped near-dedup at realistic thresholds. Fixed: empty tokens
    are filtered, the pair scores exactly 1.0, and every tokenizing
    operator (jaccard, minhash, simhash, substr) sees identical token
    streams for the two docs."""
    from space_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "alpha beta gamma delta\n"),
         (3, "alpha beta gamma delta\t\n"),
         (4, "\n alpha beta gamma delta")],
        "doc_id long, text string",
    )
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(
               docs, "doc_id", "text", threshold=0.9).collect()}
    assert jac == {(a, b): 1.0
                   for a in (1, 2, 3) for b in (2, 3, 4) if a < b}
    mh = dedup.minhash_lsh_pairs(docs, "doc_id", "text",
                                 threshold=0.9).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in mh} == set(jac)
    sim = dedup.simhash_pairs(docs, "doc_id", "text").collect()
    assert {(r["doc_a"], r["doc_b"]) for r in sim} >= set(jac)
    assert all(r["hamming"] == 0 for r in sim)
    sub = {r["doc_id"]: r for r in dedup.dedup_substrings(
        docs, "doc_id", "text", window=4).collect()}
    # Doc 1 owns the only 4-token window; 2-4 lose all four tokens.
    assert sub[1]["n_dropped"] == 0
    assert all(sub[d]["n_dropped"] == 4 and sub[d]["text"] == ""
               for d in (2, 3, 4))


def test_decontaminate_ignores_content_free_docs(spark):
    """Round-7 tokenization fix: the empty-token-array gram used to be
    [''], so any null/empty benchmark row marked EVERY null/empty
    corpus doc contaminated. Fixed: no tokens -> no grams -> content-
    free docs never match."""
    from space_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [(1, "the secret eval answer is forty two exactly today ok"),
         (2, ""), (3, None), (4, "   \n")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the secret eval answer is forty two exactly today ok"),
         (101, ""), (102, None)],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["n_shared_grams"]
            for r in decontaminate(corpus, bench, "doc_id", "text",
                                   n=8).collect()}
    assert set(hits) == {1} and hits[1] >= 1


def test_simhash_empty_docs_carry_null_signature(spark):
    from space_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        [(1, "real content here"), (2, ""), (3, None), (4, " \n ")],
        "doc_id long, text string",
    )
    sigs = {r["doc"]: r["simhash"] for r in
            simhash(docs, "doc_id", "text").collect()}
    assert sigs[1] is not None
    assert sigs[2] is None and sigs[3] is None and sigs[4] is None


def test_semantic_dedup_chases_duplicate_chains(spark):
    """Round-7 fix: dup_of must name the RETAINED representative, not
    the nearest smaller similar row. Chain: 1~2 and 2~3 but 1!~3
    (unit vectors at 0/40/80 degrees, threshold cos45 ~ 0.707) — row 3's
    min winner is 2, which is itself a duplicate; the pointer chase must
    resolve 3 -> 1."""
    import math

    from space_spark.operators.similarity import semantic_dedup

    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    emb = spark.createDataFrame(
        [(1, vec(0)), (2, vec(40)), (3, vec(80))],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in semantic_dedup(
        emb, "vec_id", "embedding", n_clusters=1, threshold=0.7
    ).collect()}
    assert out[1]["is_dup"] is False and out[1]["dup_of"] is None
    assert out[2]["dup_of"] == 1
    assert out[3]["dup_of"] == 1  # chased through 2
    # Contract: every dup_of points at a surviving (non-dup) row.
    survivors = {k for k, r in out.items() if not r["is_dup"]}
    assert all(r["dup_of"] in survivors
               for r in out.values() if r["is_dup"])


def test_neardup_exact_gemm_accepts_string_ids(spark):
    """Round-7 fix: the exact-GEMM path hardcoded int64 ids while the
    LSH path it oracles accepts any orderable id; both must agree on a
    string-keyed corpus (and on an empty one)."""
    from space_spark.operators.similarity import neardup_pairs

    emb = spark.createDataFrame(
        [("docA", [1.0, 0.0]), ("docB", [0.999, 0.01]),
         ("docC", [0.0, 1.0]), (None, [1.0, 0.0])],
        "vec_id string, embedding array<double>",
    )
    exact = neardup_pairs(emb, "vec_id", "embedding", threshold=0.95,
                          dim=2, exact=True).collect()
    assert [(r["id_a"], r["id_b"]) for r in exact] == [("docA", "docB")]
    lsh = neardup_pairs(emb, "vec_id", "embedding", threshold=0.95,
                        dim=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in lsh} <= {("docA", "docB")}
    empty = emb.where("vec_id = 'nope'")
    assert neardup_pairs(empty, "vec_id", "embedding", threshold=0.9,
                         dim=2, exact=True).count() == 0


def test_keep_best_per_cluster_semantics(spark):
    """Winner = max score then min id; null scores rank lowest;
    unclustered rows pass through; output schema drops cluster_id."""
    from space_spark.operators.dedup import keep_best_per_cluster

    docs = spark.sql(
        "SELECT * FROM VALUES "
        "(1, CAST(10.0 AS DOUBLE)), (2, 30.0), (3, 30.0), "
        "(4, NULL), (5, 7.0), "
        "(9, NULL) "
        "AS t(doc_id, score)"
    )
    labels = spark.sql(
        "SELECT * FROM VALUES (1, 1), (2, 1), (3, 1), (4, 4), (5, 4) "
        "AS t(doc, cluster_id)"
    )
    kept = keep_best_per_cluster(docs, labels, "doc_id", "score")
    assert sorted(r.doc_id for r in kept.collect()) == [2, 5, 9]
    assert set(kept.columns) == {"doc_id", "score"}

    # All-null-score cluster still elects exactly one (min id).
    labels2 = spark.sql(
        "SELECT * FROM VALUES (4, 4), (9, 4) AS t(doc, cluster_id)"
    )
    kept2 = keep_best_per_cluster(docs, labels2, "doc_id", "score")
    assert sorted(r.doc_id for r in kept2.collect()) == [1, 2, 3, 4, 5]


def test_keep_best_per_cluster_string_ids(spark):
    """Winner election must survive non-numeric ids (review finding:
    a negated string id cast to NULL and dropped every clustered
    row)."""
    from space_spark.operators.dedup import keep_best_per_cluster

    docs = spark.sql(
        "SELECT * FROM VALUES "
        "('sha:aa', CAST(1.0 AS DOUBLE)), ('sha:bb', 9.0), "
        "('sha:cc', 9.0), ('sha:zz', NULL) AS t(doc_id, score)"
    )
    labels = spark.sql(
        "SELECT * FROM VALUES ('sha:aa', 'c1'), ('sha:bb', 'c1'), "
        "('sha:cc', 'c1') AS t(doc, cluster_id)"
    )
    kept = keep_best_per_cluster(docs, labels, "doc_id", "score")
    assert sorted(r.doc_id for r in kept.collect()) == \
        ["sha:bb", "sha:zz"]


def test_neardup_exact_gemm_bounded_raises_clean_error(
    spark, monkeypatch
):
    """The exact GEMM path driver-collects the whole corpus matrix —
    above EXACT_GEMM_MAX_ROWS it must raise a clean UserInputError
    naming the LSH default (round-12 verdict finding #2), never OOM
    inside toPandas()."""
    import space_spark.operators.similarity as sim
    from space_spark.errors import UserInputError
    from space_spark.operators.similarity import neardup_pairs

    monkeypatch.setattr(sim, "EXACT_GEMM_MAX_ROWS", 3)
    emb = spark.sql(
        "SELECT id AS vec_id, array(cast(id AS float), 1.0F) AS embedding "
        "FROM range(10)"
    )
    with pytest.raises(UserInputError, match="exact-GEMM bound"):
        neardup_pairs(emb, "vec_id", "embedding", threshold=0.5,
                      dim=2, exact=True).collect()
    # At or under the bound the path still works.
    monkeypatch.setattr(sim, "EXACT_GEMM_MAX_ROWS", 1_000)
    assert neardup_pairs(emb, "vec_id", "embedding", threshold=-1.0,
                         dim=2, exact=True).count() > 0


def test_dedup_substrings_excludes_null_ids(spark):
    """NULL-id docs are poison for ExactSubstr (r14/ADVICE r13):
    min(struct(id, s)) would elect a NULL-id winner (struct mins sort
    NULLs first) and the null-unsafe anti/semi joins downstream would
    both keep such a doc untouched AND ghost it through the rebuild,
    emitting duplicate output rows. They are excluded at ingress —
    every non-null doc still comes back exactly once."""
    from pyspark.sql import Row, types as T

    from space_spark.operators.dedup import dedup_substrings

    text = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 " * 3
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=text), Row(doc_id=2, text=text),
         Row(doc_id=None, text=text)],
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("text", T.StringType())]))
    out = dedup_substrings(docs, "doc_id", "text", window=10).collect()
    assert sorted(r.doc_id for r in out) == [1, 2]
    # The repeated span dedups both within and across the surviving
    # docs: doc 1 keeps one copy of the repeated window, doc 2 loses
    # everything to doc 1's windows.
    kept = {r.doc_id: r.n_kept for r in out}
    assert kept[1] == 10 and kept[2] == 0
