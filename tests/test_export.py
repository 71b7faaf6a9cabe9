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


# ----------------------------------------------------------- webdataset
def _full_docs(spark):
    return spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text", "lang")


def _read_wds(out_dir):
    """{doc_id: {ext: bytes}} reconstructed from every written tar,
    plus the per-tar sequential member order."""
    import tarfile

    samples, orders = {}, {}
    for p in sorted(glob.glob(os.path.join(out_dir, "shard-*.tar"))):
        order = []
        with tarfile.open(p) as t:
            for m in t.getmembers():
                base, ext = m.name.rsplit(".", 1)
                samples.setdefault(int(base), {})[ext] = \
                    t.extractfile(m).read()
                order.append(m.name)
        orders[p] = order
    return samples, orders


def test_webdataset_roundtrips_corpus(spark, tmp_path):
    """Files-derived oracle (registry is at its rotation cap, per the
    budget ledger in __spark_entry__.py): every document round-trips
    through the tars byte-for-byte, grouped WebDataset-style by
    basename; the manifest agrees with a recount of the files."""
    from space_spark.operators.export import export_webdataset

    docs = _full_docs(spark)
    out = str(tmp_path / "wds")
    manifest = export_webdataset(
        docs, "doc_id", out, n_shards=4,
        components={"txt": "text", "cls": "lang"},
    ).collect()

    samples, _ = _read_wds(out)
    want = {r.doc_id: r for r in docs.collect()}
    assert set(samples) == set(want)
    for did, comp in samples.items():
        assert comp["txt"].decode() == want[did].text
        assert comp["cls"].decode() == want[did].lang

    assert sorted(m.shard_id for m in manifest) == [0, 1, 2, 3]
    assert sum(m.n_samples for m in manifest) == len(want)
    for m in manifest:
        assert m.n_members == 2 * m.n_samples
        assert os.path.getsize(m.path) == m.n_bytes


def test_webdataset_deterministic_order_and_bytes(spark, tmp_path):
    """Same corpus, two exports: byte-identical tars (pinned tar
    metadata + md5 shuffle order), and the within-tar order follows
    the shuffle key — a reproducible global permutation."""
    from space_spark.operators.export import export_webdataset

    docs = _full_docs(spark)
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_webdataset(docs, "doc_id", out1, 3,
                      {"txt": "text"}).collect()
    export_webdataset(docs.orderBy(F.rand(7)), "doc_id", out2, 3,
                      {"txt": "text"}).collect()
    for p1 in sorted(glob.glob(os.path.join(out1, "*.tar"))):
        p2 = os.path.join(out2, os.path.basename(p1))
        assert open(p1, "rb").read() == open(p2, "rb").read()
    _, orders = _read_wds(out1)
    for order in orders.values():
        keys = [py_key(int(n.rsplit(".", 1)[0])) for n in order]
        assert keys == sorted(keys)


def test_webdataset_binary_component_and_null_skip(spark, tmp_path):
    """Binary columns write raw bytes; a NULL component is omitted
    from the sample (loader-side optional field), not an empty file."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from space_spark.operators.export import export_webdataset

    sch = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("img", T.BinaryType()),
        T.StructField("cap", T.StringType()),
    ])
    df = spark.createDataFrame(
        [Row(id=1, img=b"\x00\xffPNG", cap="a cat"),
         Row(id=2, img=b"\x01\x02", cap=None)], sch
    )
    out = str(tmp_path / "bin")
    manifest = export_webdataset(
        df, "id", out, 1, {"png": "img", "txt": "cap"}
    ).collect()
    samples, _ = _read_wds(out)
    assert samples[1]["png"] == b"\x00\xffPNG"
    assert samples[1]["txt"] == b"a cat"
    assert samples[2]["png"] == b"\x01\x02"
    assert "txt" not in samples[2]
    assert manifest[0].n_samples == 2 and manifest[0].n_members == 3


def test_webdataset_read_roundtrip(spark, tmp_path):
    """export_webdataset -> read_webdataset is the identity on the
    corpus (keyed by id), including NULL for absent components."""
    from space_spark.operators.export import (
        export_webdataset,
        read_webdataset,
    )

    docs = _full_docs(spark)
    out = str(tmp_path / "rt")
    export_webdataset(docs, "doc_id", out, 3,
                      {"txt": "text", "cls": "lang"}).collect()
    back = read_webdataset(spark, out, ["txt", "cls", "ghost"])
    rows = {int(r["__key"]): r for r in back.collect()}
    want = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == set(want)
    for did, r in rows.items():
        assert bytes(r["txt"]).decode() == want[did].text
        assert bytes(r["cls"]).decode() == want[did].lang
        assert r["ghost"] is None


def test_webdataset_orphan_sweep_is_job_scoped(spark, tmp_path):
    """The post-export orphan sweep must delete only THIS job's tmp
    tars (token-scoped glob): a concurrent export into the same
    out_dir owns its own in-flight tmps, and sweeping them would make
    the other job's os.replace fail mid-flight (round-12 ADVICE)."""
    from space_spark.operators.export import export_webdataset

    docs = _full_docs(spark)
    out = str(tmp_path / "wds")
    os.makedirs(out)
    # A foreign job's in-flight tmp (different token) plus a legacy
    # un-tokenized one.
    foreign = os.path.join(out, ".shard-000001.tar.tmp-aaaabbbbcccc-dddd")
    legacy = os.path.join(out, ".shard-000002.tar.tmp-deadbeef1234")
    for p in (foreign, legacy):
        with open(p, "wb") as f:
            f.write(b"in-flight bytes")
    # A third tmp from a job that CRASHED long ago (stale mtime): the
    # age-gated foreign sweep must reclaim it, or crashed jobs leak
    # multi-GB tmps forever (round-12 review finding).
    crashed = os.path.join(out, ".shard-000003.tar.tmp-0123456789ab-e")
    with open(crashed, "wb") as f:
        f.write(b"orphan bytes")
    old_time = 1_000_000_000  # 2001 — far past EXPORT_TMP_REAP_AGE_SEC
    os.utime(crashed, (old_time, old_time))
    export_webdataset(
        docs, "doc_id", out, n_shards=2,
        components={"txt": "text"},
    ).collect()
    # Our export finished and swept ITS tmps; FRESH foreign/legacy
    # tmps survive (possibly-live concurrent exports), the aged-out
    # crash orphan is reclaimed.
    assert os.path.exists(foreign)
    assert os.path.exists(legacy)
    assert not os.path.exists(crashed)
    leftover = [p for p in os.listdir(out) if ".tar.tmp-" in p]
    assert sorted(leftover) == sorted(
        [os.path.basename(foreign), os.path.basename(legacy)]
    )
