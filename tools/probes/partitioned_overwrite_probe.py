"""Partitioned-manifest dynamic-overwrite regression probe (VERDICT r11
item 6 asked for this to join the per-round list): 2M rows across 64
partition values on a hash-clustered 42-file manifest genesis — a
single-partition insert_overwrite must CARRY the partition-disjoint
files by reference (same path, same mtime), drop/rewrite only the
envelope-overlapping rest, and the whole operation's wall time must
track the touched files, not the table. r11 gate figure: 37/42 carried,
~3.6 s end to end on this host."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("poverwrite-probe")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from hudi_spark_utilities_plus_spark.lake import HudiTable

ROWS, PARTS, FILES = 2_000_000, 64, 42
path = tempfile.mkdtemp(prefix="powp_") + "/t"
t = HudiTable(
    path=path,
    record_key="id",
    precombine="ver",
    partition_field="p",
    options={"hoodie.commit.mode": "manifest"},
)
df = spark.range(ROWS).select(
    F.col("id"),
    F.lit(0).alias("ver"),
    (F.col("id") % PARTS).cast("int").alias("p"),
    F.sha1(F.col("id").cast("string")).alias("v"),
)
# hash-clustered: every file MIXES partitions except where hashing
# happens to isolate one — the realistic worst-ish case for the
# envelope classifier (range-clustered layouts carry even more)
t.bulk_insert(df.repartition(FILES, "p"))
live = t._manifest_files()
print(f"genesis: {len(live)} files")
batch = (
    df.filter(F.col("p") == 7)
    .withColumn("ver", F.lit(1))
    .withColumn("v", F.lit("overwritten"))
)
mtimes = {f: os.path.getmtime(f) for f in live}
s = time.time()
t.insert_overwrite(batch, spark)
dt = round(time.time() - s, 2)
after = set(t._manifest_files())
carried = [f for f in live if f in after and os.path.getmtime(f) == mtimes[f]]
print(
    f"single-partition overwrite: carried {len(carried)}/{len(live)} "
    f"files by reference, {dt}s"
)
n7 = t.read(spark, partitions=[7]).count()
expect = batch.count()
assert n7 == expect, (n7, expect)
assert t.read(spark).count() == ROWS
print(f"state check ok: partition 7 rows={n7}")
spark.stop()
