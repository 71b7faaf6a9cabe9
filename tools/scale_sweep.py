"""One-off sf0.1 -> sf1.0 scaling sweep of the heaviest operators
(round-9 verdict #4): generate a 10x dataset by tiling sf0.1 with
per-copy perturbations that PRESERVE workload character (ids shifted so
keys stay unique; document text suffixed per copy so cross-copy rows
are near- but not exact-duplicates; embeddings nudged in one dimension
so semantic clusters don't collapse into 10-way exact groups), then
time each query warm in a bench-identical session at both scales and
print the wall-time scaling exponent log10(t_sf1/t_sf0.1).

Usage: python tools/scale_sweep.py [out.json] [--queries a,b,c]
(--queries overrides the default HEAVY list — round 10 used it to add
the new heavies without re-timing the recorded ones.)
Writes generated data under .scale_sweep/sf1 (gitignored, ~150 MB);
delete the directory after recording results in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, ".scale_sweep", "sf1")
COPIES = 10

HEAVY = [
    "dedup_substr", "dedup_minhash_lsh", "dedup_semantic",
    "stream_session_agg", "text_bpe_pack", "pipeline_pretrain_filter",
    "export_shards_manifest", "space_stream_mv", "ann_ivfpq_rerank",
    "space_zorder_pruned",
]


def generate() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    copies = f"(SELECT unnest(range({COPIES})) AS copy)"

    def gen(name: str, select: str) -> None:
        dest = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(dest):
            return
        con.execute(
            f"COPY ({select}) TO '{dest}' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"  {name}: {n} rows", flush=True)

    gen("documents", f"""
        SELECT doc_id + copy * 10000000 AS doc_id,
               CASE WHEN copy = 0 THEN text
                    ELSE text || ' c' || copy END AS text,
               lang, source,
               CASE WHEN copy = 0 THEN n_chars
                    ELSE n_chars + 2 + length(copy::VARCHAR)
               END AS n_chars
        FROM '{SRC}/documents.parquet', {copies}""")
    gen("embeddings", f"""
        SELECT vec_id + copy * 10000000 AS vec_id,
               CAST(list_concat([embedding[1] + copy * 0.001],
                                embedding[2:]) AS FLOAT[]) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', {copies}""")
    gen("events", f"""
        SELECT event_id + copy * 10000000 AS event_id, ts,
               user_id + copy * 1000000 AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', {copies}""")
    gen("lineitem", f"""
        SELECT * REPLACE (l_orderkey + copy * 100000000 AS l_orderkey)
        FROM '{SRC}/lineitem.parquet', {copies}""")
    # r10: the merge queries build their table from customer — scale it
    # too, so their sweep rows measure a FIXED-size source merged into
    # a 10x table (probe/bloom/commit scaling), not a symlinked no-op.
    gen("customer", f"""
        SELECT * EXCLUDE (copy)
               REPLACE (c_custkey + copy * 10000000 AS c_custkey)
        FROM '{SRC}/customer.parquet', {copies}""")
    # Remaining tables: symlink the sf0.1 originals (queries under test
    # only read the four above; links keep _t() loaders working if a
    # query touches a dimension table).
    for f in os.listdir(SRC):
        dest = os.path.join(OUT, f)
        if not os.path.exists(dest):
            os.symlink(os.path.join(SRC, f), dest)


def run(sf_dir: str, names, cpus: int) -> dict:
    import bench
    import __spark_entry__ as entry_mod

    spark = bench.warm_session(cpus)
    qs = entry_mod.queries()
    out = {}
    try:
        for name in names:
            fn = qs[name]
            spark.sparkContext._jvm.System.gc()
            times = []
            for _ in range(2):  # first run warms, second is reported
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite") \
                    .format("noop").save()
                times.append(time.perf_counter() - t0)
            out[name] = round(times[-1], 3)
            print(f"  {name}: cold {times[0]:.2f}s warm {times[-1]:.2f}s",
                  flush=True)
    finally:
        spark.stop()
    return out


def main() -> None:
    import math

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = list(HEAVY)
    if "--queries" in sys.argv:
        i = sys.argv.index("--queries")
        names = sys.argv[i + 1].split(",")
        del sys.argv[i:i + 2]
    print("generating sf1 (10x sf0.1, perturbed)...", flush=True)
    generate()
    print("timing at sf0.1...", flush=True)
    t01 = run(SRC, names, cpus)
    print("timing at sf1...", flush=True)
    t1 = run(OUT, names, cpus)
    rows = {}
    for name in names:
        ratio = t1[name] / t01[name] if t01[name] else float("nan")
        rows[name] = {
            "sf0.1_s": t01[name],
            "sf1_s": t1[name],
            "ratio_10x_data": round(ratio, 2),
            "scaling_exponent": round(math.log10(ratio), 2)
            if ratio > 0 else None,
        }
        print(f"{name}: {t01[name]:.2f}s -> {t1[name]:.2f}s "
              f"(x{ratio:.1f}, exp {math.log10(ratio):.2f})", flush=True)
    result = {"copies": COPIES, "cpus": cpus, "queries": rows}
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sweep.json"
    with open(dest, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", dest)


if __name__ == "__main__":
    main()
