"""Training-shard export: deterministic permutation, sorted shard
files, manifest-equals-files (operators/export.py)."""

import glob
import hashlib
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from space_spark.operators.export import (
    export_training_shards,
    shuffle_key,
    with_shards,
)

SF_DIR = os.environ.get("SPACE_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "n_chars")


def py_key(doc_id, seed=42):
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()
    return int(h[:15], 16)


def test_shuffle_key_matches_python_md5(spark):
    rows = _docs(spark).select(
        "doc_id", shuffle_key(F.col("doc_id")).alias("k")).collect()
    for r in rows:
        assert r["k"] == py_key(r["doc_id"])


def test_manifest_matches_files_and_covers_corpus(spark, tmp_location):
    docs = _docs(spark).withColumnRenamed("n_chars", "n_tokens")
    manifest = export_training_shards(
        docs, "doc_id", tmp_location + "/sh", n_shards=4
    ).collect()
    n = docs.count()
    assert sum(r["n_rows"] for r in manifest) == n
    assert {r["shard_id"] for r in manifest} <= set(range(4))
    # Manifest agrees with an independent recomputation.
    by_shard = {}
    for r in docs.select("doc_id", "n_tokens").collect():
        k = py_key(r["doc_id"])
        by_shard.setdefault(k % 4, []).append((k, r["doc_id"],
                                               r["n_tokens"]))
    for r in manifest:
        ks = sorted(by_shard[r["shard_id"]])
        assert r["n_rows"] == len(ks)
        assert r["min_key"] == ks[0][0]
        assert r["max_key"] == ks[-1][0]
        assert r["first_id"] == ks[0][1]
        assert r["n_tokens"] == sum(t for _, _, t in ks)


def test_written_shards_are_key_sorted(spark, tmp_location):
    docs = _docs(spark)
    export_training_shards(docs, "doc_id", tmp_location + "/sh",
                           n_shards=4)
    shard_dirs = sorted(glob.glob(tmp_location + "/sh/shard_id=*"))
    assert len(shard_dirs) >= 3  # tiny corpora may leave a shard empty
    for d in shard_dirs:
        ids = [r["doc_id"]
               for r in spark.read.parquet(d).collect()]
        keys = [py_key(i) for i in ids]
        assert keys == sorted(keys), d
        # The shuffle actually permutes: shard order != id order
        # (astronomically unlikely to be sorted for >10 md5 keys).
        if len(ids) > 10:
            assert ids != sorted(ids), d


def test_export_is_deterministic(spark, tmp_location):
    docs = _docs(spark)
    m1 = sorted(map(tuple, export_training_shards(
        docs, "doc_id", tmp_location + "/a", n_shards=4).collect()))
    m2 = sorted(map(tuple, export_training_shards(
        docs, "doc_id", tmp_location + "/b", n_shards=4).collect()))
    assert m1 == m2
    # A different seed is a different permutation.
    m3 = sorted(map(tuple, export_training_shards(
        docs, "doc_id", tmp_location + "/c", n_shards=4,
        seed=7).collect()))
    assert m1 != m3


def test_n_shards_validated(spark):
    with pytest.raises(ValueError, match="positive"):
        with_shards(_docs(spark), "doc_id", 0)


def test_null_ids_excluded(spark, tmp_location):
    """A NULL id's md5 key would collapse to one shared value (concat_ws
    skips NULLs) — such rows are excluded, not silently piled into one
    shard position."""
    docs = spark.createDataFrame(
        [(1, 10), (None, 11), (2, 12), (None, 13)],
        "doc_id long, n_tokens long",
    )
    manifest = export_training_shards(
        docs, "doc_id", tmp_location + "/sh", n_shards=2
    ).collect()
    assert sum(r["n_rows"] for r in manifest) == 2
    written = spark.read.parquet(tmp_location + "/sh")
    assert sorted(r["doc_id"] for r in written.collect()) == [1, 2]
