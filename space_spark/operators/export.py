"""Training-shard export: the last step of a data pipeline — lay the
corpus out as N shards in a deterministic pseudo-random order and hand
the trainer a manifest.

Trainers want (a) a reproducible global shuffle (not ``rand()``, which
changes under retries/repartitioning), (b) even shards a data-loader
can stripe across workers, (c) a manifest with per-shard row/token
counts for step accounting. The shuffle key is the md5 integer of
``"<id>:<seed>"`` (the repo-wide deterministic-hash discipline, same
construction as ``sampling.hash_bucket``): shard = key mod n_shards,
within-shard order = key order — together a fixed permutation of the
corpus that any engine can recompute.

Scale: one hash-shuffle on the shard id (the write's natural
partitioning), sort WITHIN partitions only (no global sort), and the
manifest is a partial-aggregable groupBy over what was actually
WRITTEN (read back from the sink, so the manifest can never disagree
with the files)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_key(id_col: Column, seed: int = 42) -> Column:
    """Deterministic 60-bit shuffle key: first 15 md5 hex digits of
    ``"<id>:<seed>"`` as a long (non-negative). Identical in any SQL
    engine: ``('0x' || substring(md5(id || ':' || seed), 1, 15))::BIGINT``.
    """
    key = F.concat_ws(":", id_col.cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def with_shards(df: DataFrame, id_col: str, n_shards: int,
                seed: int = 42) -> DataFrame:
    """Add ``__key`` (shuffle position) and ``shard_id`` columns.

    NULL-id rows are EXCLUDED (the ``exact_dedup`` discipline): their
    md5 key would collapse to one identical value (``concat_ws`` skips
    NULL), silently piling every such row at one position of one shard
    — and a training example without an id can't be accounted for in a
    manifest anyway."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    k = shuffle_key(F.col(id_col), seed)
    return df.where(F.col(id_col).isNotNull()).withColumn(
        "__key", k
    ).withColumn(
        "shard_id", (F.col("__key") % n_shards).cast("int")
    )


def export_training_shards(
    df: DataFrame,
    id_col: str,
    out_dir: str,
    n_shards: int,
    seed: int = 42,
) -> DataFrame:
    """Write the corpus as ``shard_id=N`` parquet partitions in
    deterministic shuffle order and return the manifest, aggregated
    from the FILES JUST WRITTEN: (shard_id, n_rows, min_key, max_key,
    first_id = the id at the shard's first shuffle position). If the
    input has an ``n_tokens`` column the manifest also carries its
    per-shard sum (token-budget accounting for the trainer)."""
    spark = df.sparkSession
    sharded = with_shards(df, id_col, n_shards, seed)
    (
        sharded.repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "__key")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    written = spark.read.parquet(out_dir)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("__key").alias("min_key"),
        F.max("__key").alias("max_key"),
        F.min_by(id_col, "__key").alias("first_id"),
    ]
    if "n_tokens" in written.columns:
        aggs.append(F.sum("n_tokens").cast("long").alias("n_tokens"))
    return written.groupBy(
        F.col("shard_id").cast("int").alias("shard_id")
    ).agg(*aggs)


# A foreign (other-job) tmp tar older than this is treated as a crash
# orphan and reclaimed by the next export's sweep; younger ones are
# presumed live concurrent writes and left alone. 24 h: far beyond any
# real export's task lifetime, far short of "forever".
EXPORT_TMP_REAP_AGE_SEC = 24 * 3600


def export_webdataset(
    df: DataFrame,
    id_col: str,
    out_dir: str,
    n_shards: int,
    components,
    seed: int = 42,
) -> DataFrame:
    """Export the corpus as WebDataset-style tar shards — the layout
    multimodal training loaders stream sequentially: each sample is a
    group of consecutive tar members sharing a basename and differing
    by extension (``<id>.txt``, ``<id>.json``, ``<id>.jpg``...).

    ``components``: {extension: column name}. String columns are
    written UTF-8; binary columns raw; anything else is cast to its
    string form. Returns the manifest DataFrame (shard_id, path,
    n_samples, n_members, n_bytes), recounted from the tars ACTUALLY
    written (each task re-opens its finished tar), so the manifest can
    never disagree with the files.

    Determinism: sample order inside each tar is the same md5 shuffle
    key ``export_training_shards`` uses, and tar metadata (mtime, uid,
    gid, mode) is pinned — two exports of the same corpus produce
    byte-identical shards, so resumed/retried export jobs are safe to
    overwrite-and-compare.

    Scale shape: one hash-shuffle on shard_id + a within-partition
    sort (no global sort); each task streams its samples straight into
    ``tarfile`` (stdlib, append-only IO) — the tar bytes never sit in
    memory, and writing N shards is embarrassingly parallel across
    executors. ``out_dir`` must be a filesystem path visible to the
    executors (on a cluster: a shared/NFS/FUSE mount — object-store
    targets should export to the mount and lifecycle from there).
    """
    import os

    spark = df.sparkSession
    exts = sorted(components)
    cols = [components[e] for e in exts]
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"Component column {c!r} not in DataFrame")
    binary_like = {
        f.name for f in df.schema.fields
        if f.dataType.simpleString() == "binary"
    }
    sharded = (
        with_shards(df, id_col, n_shards, seed)
        .select(id_col, "__key", "shard_id", *cols)
        .repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "__key")
    )
    os.makedirs(out_dir, exist_ok=True)
    id_name = id_col
    bin_cols = {c for c in cols if c in binary_like}
    # Per-JOB token baked into every tmp filename: the post-collect
    # orphan sweep globs only THIS job's tmps, so two concurrent
    # exports into one out_dir can't delete each other's in-flight
    # files out from under an os.replace (round-12 ADVICE).
    import uuid as _uuid_mod

    job_token = _uuid_mod.uuid4().hex[:12]

    def task(batches):
        import tarfile
        import uuid as _uuid

        import pyarrow as _pa

        open_shard = {"id": None, "tar": None, "tmp": None,
                      "n_samples": 0, "n_members": 0}
        results = []

        def close_current():
            if open_shard["tar"] is None:
                return
            open_shard["tar"].close()
            sid = open_shard["id"]
            final = os.path.join(out_dir, f"shard-{sid:06d}.tar")
            # Attempt-isolated write + atomic rename: a retried or
            # speculative task never interleaves bytes into the final
            # path; whichever complete tmp renames last wins.
            os.replace(open_shard["tmp"], final)
            with tarfile.open(final, "r") as chk:  # recount from disk
                members = chk.getmembers()
            results.append((
                sid, final, open_shard["n_samples"], len(members),
                os.path.getsize(final),
            ))
            open_shard.update(id=None, tar=None, tmp=None,
                              n_samples=0, n_members=0)

        def member_bytes(value, colname):
            if value is None:
                return None
            if colname in bin_cols:
                return bytes(value)
            return str(value).encode("utf-8")

        for batch in batches:
            names = batch.schema.names
            idx = {n: i for i, n in enumerate(names)}
            sid_arr = batch.column(idx["shard_id"]).to_pylist()
            id_arr = batch.column(idx[id_name]).to_pylist()
            comp_arrs = {c: batch.column(idx[c]).to_pylist()
                         for c in cols}
            for row in range(batch.num_rows):
                sid = sid_arr[row]
                if open_shard["id"] != sid:
                    close_current()
                    tmp = os.path.join(
                        out_dir,
                        f".shard-{sid:06d}.tar.tmp-{job_token}-"
                        f"{_uuid.uuid4().hex[:12]}",
                    )
                    open_shard.update(
                        id=sid,
                        tar=tarfile.open(tmp, "w"),
                        tmp=tmp, n_samples=0, n_members=0,
                    )
                base = str(id_arr[row])
                wrote_any = False
                for ext in exts:
                    data = member_bytes(comp_arrs[components[ext]][row],
                                        components[ext])
                    if data is None:
                        continue  # absent component: member omitted
                    info = tarfile.TarInfo(name=f"{base}.{ext}")
                    info.size = len(data)
                    info.mtime = 0   # pinned: byte-identical re-exports
                    info.uid = info.gid = 0
                    info.mode = 0o644
                    import io as _io

                    open_shard["tar"].addfile(info, _io.BytesIO(data))
                    open_shard["n_members"] += 1
                    wrote_any = True
                if wrote_any:
                    open_shard["n_samples"] += 1
        close_current()
        if results:
            yield _pa.RecordBatch.from_arrays(
                [
                    _pa.array([r[0] for r in results], _pa.int32()),
                    _pa.array([r[1] for r in results], _pa.string()),
                    _pa.array([r[2] for r in results], _pa.int64()),
                    _pa.array([r[3] for r in results], _pa.int64()),
                    _pa.array([r[4] for r in results], _pa.int64()),
                ],
                names=["shard_id", "path", "n_samples", "n_members",
                       "n_bytes"],
            )

    manifest_rows = sharded.mapInArrow(
        task,
        "shard_id int, path string, n_samples long, "
        "n_members long, n_bytes long",
    ).collect()
    # Export is a terminal action, so run it EAGERLY: the driver can
    # then sweep tmp tars orphaned by killed/speculative task attempts
    # (only completed shards os.replace to their final names — a loser
    # attempt's uuid-suffixed tmp would otherwise sit in out_dir
    # forever, multi-GB at training scale). THIS job's token is swept
    # unconditionally; FOREIGN tmps (concurrent exports, or a job that
    # crashed before its own sweep) are reclaimed only past an mtime
    # age gate — old enough that no live export still holds them, so
    # the concurrent-export race is closed without leaking crashed
    # jobs' tmps forever (round-12 review finding).
    import glob as _glob
    import time as _time

    now = _time.time()
    for stale in _glob.glob(os.path.join(out_dir, ".shard-*.tar.tmp-*")):
        mine = f".tar.tmp-{job_token}-" in os.path.basename(stale)
        try:
            if not mine and (
                now - os.path.getmtime(stale) < EXPORT_TMP_REAP_AGE_SEC
            ):
                continue  # possibly a live concurrent export's file
            os.remove(stale)
        except OSError:
            pass
    return spark.createDataFrame(
        manifest_rows,
        "shard_id int, path string, n_samples long, "
        "n_members long, n_bytes long",
    )


def read_webdataset(
    spark,
    path: str,
    components,
) -> DataFrame:
    """Read WebDataset tar shards back into a DataFrame — the loader
    side of :func:`export_webdataset` and of any external WebDataset
    corpus: one row per sample (``__key`` = member basename, one
    BINARY column per requested extension; absent members are NULL).

    ``components``: extensions to surface, e.g. ``["txt", "json",
    "jpg"]`` (fixed output schema — Spark needs it up front).

    Scale shape: shard paths are discovered by Spark's binaryFile
    source (path column ONLY is selected, so the tars are NOT
    buffered through the scan — Catalyst prunes the content column
    away), then each task streams ITS tar files sequentially with
    stdlib tarfile, yielding Arrow batches per ~1k samples. One task
    per tar group — embarrassingly parallel, no shuffle; downstream
    repartition decides placement."""
    import os

    exts = list(components)
    fields = ", ".join(f"`{e}` binary" for e in exts)
    paths = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar") if not path.endswith(".tar")
        else path
    ).select("path")

    def task(batches):
        import io
        import tarfile
        from urllib.parse import unquote, urlparse

        import pyarrow as _pa

        BATCH = 1024

        def flush(buf):
            if not buf["__key"]:
                return None
            arrays = [_pa.array(buf["__key"], _pa.string())] + [
                _pa.array(buf[e], _pa.binary()) for e in exts
            ]
            out = _pa.RecordBatch.from_arrays(
                arrays, names=["__key"] + exts
            )
            for k in buf:
                buf[k] = []
            return out

        for batch in batches:
            for p in batch.column(0).to_pylist():
                # binaryFile returns URI strings — percent-DECODE like
                # MetadataLog does, or '/my corpus/' arrives as
                # '/my%20corpus/' and every open fails.
                local = unquote(urlparse(p).path) if "://" in p or \
                    p.startswith("file:") else p
                buf = {"__key": [], **{e: [] for e in exts}}
                cur_key, cur = None, {}

                def emit(key, members):
                    buf["__key"].append(key)
                    for e in exts:
                        buf[e].append(members.get(e))

                with tarfile.open(local, "r") as t:
                    for m in t:
                        if not m.isfile() or "." not in m.name:
                            continue
                        base, ext = m.name.rsplit(".", 1)
                        if base != cur_key:
                            if cur_key is not None:
                                emit(cur_key, cur)
                                if len(buf["__key"]) >= BATCH:
                                    out = flush(buf)
                                    if out is not None:
                                        yield out
                            cur_key, cur = base, {}
                        if ext in cur:
                            continue  # duplicate member: first wins
                        data = t.extractfile(m)
                        cur[ext] = data.read() if data else None
                    if cur_key is not None:
                        emit(cur_key, cur)
                out = flush(buf)
                if out is not None:
                    yield out

    return paths.mapInArrow(task, f"`__key` string, {fields}")
