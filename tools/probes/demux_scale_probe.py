"""Streaming-demux scale probe (r13, joins the per-round regression
set): one CDC micro-batch routed to MANY per-table MOR lake tables —
the reference's multi-table ``binlog-hudi`` sink shape
(HoodieBinlogDeltaStreamerSuite.scala:31-44) at a table count the
reference's own 2-table fixtures never exercise.

Regression signals:
  1. correctness under fan-out: after an insert batch + an update
     batch, every table serves exactly its keys with the updated
     payload (spot-checked per table, counted over all);
  2. the per-table fixed cost: same 256k rows routed to 8 vs 64
     tables — the wall delta is the O(T) driver-side apply overhead
     (job-chain launch + MOR log append per table), the term that
     dominates a 1,000-table deployment;
  3. the driver thread pool's value: 64 tables at
     option.demux.parallelism 8 (default) vs 1 (serial).

r13 first-run figures on this host (the band; use the warm UPDATE
batch for comparisons — the first insert batch carries JVM/session
warmup): 64 tables 16.1 s pooled (parallelism 8) vs 37.4 s serial
(pool = 2.3x); 8 tables 4.2 s for the same 256k rows, so the
driver-side fixed cost is ~0.21 s/table pooled — wall tracks table
count, not rows. At 1,000+ tables per query, raise
option.demux.parallelism and shard tables across queries; rows land
exactly (256k keys, updates win) in every configuration."""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from hudi_spark_utilities_plus_spark.streaming.demux import demux_batch

ROWS = 256_000


def batch_df(n_tables: int, op: str, payload: str):
    return (
        spark.range(ROWS)
        .select(
            F.lit(op).alias("op"),
            F.lit("db0").alias("db"),
            F.concat(F.lit("t"), (F.col("id") % n_tables).cast("string")).alias(
                "table"
            ),
            F.col("id"),
            F.lit(payload).alias("data"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=F.lit(1 if op == "insert" else 2))
            ).alias("ts"),
        )
        .repartition(32)
    )


def run(n_tables: int, parallelism: int) -> None:
    base = tempfile.mkdtemp(prefix=f"demux{n_tables}_")
    props = {
        "option.hoodie.path": base + "/{db}/ods_{db}_{table}",
        "option.demux.parallelism": str(parallelism),
    }
    for i in range(n_tables):
        props[f"db0.t{i}.hoodie.table.type"] = "MERGE_ON_READ"
    cache = {}
    t0 = time.time()
    demux_batch(spark, batch_df(n_tables, "insert", "{}"), props, cache)
    t_ins = time.time() - t0
    t0 = time.time()
    demux_batch(spark, batch_df(n_tables, "update", '{"u":1}'), props, cache)
    t_upd = time.time() - t0
    # correctness: every key exactly once, update payload won
    total, updated = 0, 0
    for (db, tbl), table in cache.items():
        got = table.read(spark).select("id", "data")
        agg = got.agg(
            F.count("*").alias("n"),
            F.sum((F.col("data") == '{"u":1}').cast("long")).alias("u"),
        ).first()
        total += agg["n"]
        updated += agg["u"]
    ok = total == ROWS and updated == ROWS
    print(
        f"tables={n_tables} parallelism={parallelism}: insert={t_ins:.1f}s "
        f"update={t_upd:.1f}s rows={total} updated={updated} "
        f"{'OK' if ok else 'MISMATCH'}",
        flush=True,
    )
    shutil.rmtree(base, ignore_errors=True)


run(8, 8)
run(64, 8)
run(64, 1)
spark.stop()
