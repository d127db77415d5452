"""120-commit MOR upsert probe (r10 regression probe, VERDICT item 6):
5-row batches, compaction OFF vs ON; per-20-commit bucket medians +
read-after cost."""
import sys, time, statistics, shutil, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from hudi_spark_utilities_plus_spark.lake import HudiTable

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

def run(tag, options):
    p = f"/tmp/probe/t_{tag}"
    for d in (p, p + "__hudi_log", p + "__hudi_seqclaim"):
        shutil.rmtree(d, ignore_errors=True)
    for f in (p + "__hudi_seqbase", p + "__hudi_seqmax"):
        if os.path.exists(f):
            os.remove(f)
    t = HudiTable(path=p, record_key="id", precombine="ver",
                  table_type="MERGE_ON_READ", options=options)
    t.bulk_insert(spark.range(1000).selectExpr("id", "0 as ver", "uuid() as v"))
    times = []
    for i in range(120):
        df = spark.range(i * 5, i * 5 + 5).selectExpr(f"id % 1000 as id", f"{i+1} as ver", "uuid() as v")
        s = time.time()
        t.upsert(df)
        times.append(time.time() - s)
    buckets = [round(statistics.median(times[k:k+20]), 2) for k in range(0, 120, 20)]
    s = time.time()
    n = t.read(spark).count()
    rd = round(time.time() - s, 2)
    print(f"{tag}: bucket-medians={buckets} read_after={rd}s rows={n}")

run("compaction_off", {})
run("compaction_on", {"hoodie.compact.inline": "true"})
# r14: seq allocation through the claim-dir conditional put (the
# object-store protocol, forced on this local path) — must stay FLAT
# like the sidecar, vs the log-scan fallback's per-append drift the
# r13 /tmp prototype measured at [0.52..0.65] s
run("claim_alloc", {"hoodie.seq.allocation": "claim"})
spark.stop()
