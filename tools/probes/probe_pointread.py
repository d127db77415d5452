"""Gate-figure probe: point-read file pruning on a many-file manifest
table — files opened + latency, point read vs full read, COW and MOR."""
import sys, time, tempfile, os

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("pointread-probe")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
from hudi_spark_utilities_plus_spark.lake import HudiTable

N_FILES = 512
ROWS = 8_000_000

for ttype in ("COPY_ON_WRITE", "MERGE_ON_READ"):
    path = tempfile.mkdtemp(prefix=f"prp_{ttype[:3]}_") + "/t"
    t = HudiTable(
        path=path,
        record_key="id",
        precombine="ver",
        table_type=ttype,
        options={"hoodie.commit.mode": "manifest"},
    )
    df = spark.range(ROWS).select(
        F.col("id"),
        F.lit(1).alias("ver"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    t.bulk_insert(df.repartitionByRange(N_FILES, "id"))
    if ttype == "MERGE_ON_READ":
        # a live delta log: the point read must merge it over the pruned base
        t.upsert(
            spark.createDataFrame(
                [(ROWS // 2, 2, "updated")], "id long, ver int, payload string"
            )
        )
    n_manifest = len(t._manifest_files())
    probe = spark.createDataFrame([(ROWS // 2,)], "id long")

    t0 = time.time()
    pt = t.read(spark, keys=probe)
    rows = pt.collect()
    t_point = time.time() - t0
    base_scanned = len(
        {
            f.replace("file://", "").replace("file:", "")
            for f in pt.inputFiles()
        }
        & set(t._manifest_files())
    )

    t0 = time.time()
    full = t.read(spark).where(F.col("id") == ROWS // 2).collect()
    t_full = time.time() - t0
    assert [r["payload"] for r in rows] == [r["payload"] for r in full]
    print(
        f"{ttype}: manifest_files={n_manifest} point_read: "
        f"base_files_scanned={base_scanned} t={t_point:.2f}s | "
        f"full_read+filter: t={t_full:.2f}s | speedup {t_full / t_point:.1f}x"
    )
spark.stop()
