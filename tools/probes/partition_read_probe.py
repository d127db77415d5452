"""Partition-scoped read regression probe (VERDICT r11 item 6): 8M rows
across 64 partition values on a 128-file partition-clustered MOR
manifest genesis with a live delta log — read(partitions=[7]) must open
only that partition's files (plus any files the log-guard /
base-duplicate guard provably needs), beat the full-scan+filter
baseline, and return exactly the partition's merged rows. r11 gate
figure: 3/128 files, 0.59 s vs 0.90 s full, on this host.

The genesis is range-clustered on (p, id), so per-file KEY envelopes
are disjoint and the manifest publishes the key_unique proof — the r12
base-duplicate guard must therefore re-admit NOTHING here (the probe
asserts the opened-file count stayed at the r11 level)."""
import sys
import os
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("psread-probe")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from hudi_spark_utilities_plus_spark.lake import HudiTable

ROWS, PARTS, FILES = 8_000_000, 64, 128
path = tempfile.mkdtemp(prefix="psrp_") + "/t"
t = HudiTable(
    path=path,
    record_key="id",
    precombine="ver",
    partition_field="p",
    table_type="MERGE_ON_READ",
    options={"hoodie.commit.mode": "manifest"},
)
df = spark.range(ROWS).select(
    F.col("id"),
    F.lit(0).alias("ver"),
    (F.col("id") % PARTS).cast("int").alias("p"),
    F.sha1(F.col("id").cast("string")).alias("v"),
)
t.bulk_insert(df.repartitionByRange(FILES, "p", "id"))
assert t._manifest_key_unique(), "range-clustered genesis should prove it"
# a live log so the merging path (and both guards) actually runs
t.upsert(
    spark.createDataFrame([(7, 1, 7, "logged")], "id long, ver int, p int, v string")
)
base = set(t._manifest_files())
s = time.time()
d = t.read(spark, partitions=[7])
n = d.count()
dt = round(time.time() - s, 2)
opened = {
    f.replace("file://", "").replace("file:", "") for f in d.inputFiles()
} & base
s = time.time()
n_full = t.read(spark).filter(F.col("p") == 7).count()
dt_full = round(time.time() - s, 2)
print(
    f"read(partitions=[7]): {len(opened)}/{len(base)} base files, "
    f"{dt}s vs full-scan+filter {dt_full}s; rows={n}"
)
assert n == n_full == ROWS // PARTS
assert len(opened) <= 4, f"pruning regressed: opened {len(opened)} files"
spark.stop()
