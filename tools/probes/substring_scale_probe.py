"""100k-doc substring-dedup regression probe (dedup100k precedent):
inflate sf0.1 documents to 100k with KNOWN duplicated-span structure —
every 3rd base doc's copies share the full original body (tail-mutated
copies), so the grid detector must find large cross-copy regions —
run duplicated_spans (L=64, s=32), time it, and pin determinism: span
count and duplicated-char total must be EXACT across back-to-back runs
(the wall tracks host load; the counts are the regression signal).

Band (r14, quiet host): exactly 93,142 spans / 26,437,664 dup chars
over 100k docs (~900k grid shingles), walls ~5-7 s per run.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from hudi_spark_utilities_plus_spark.operators.spans import duplicated_spans

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
    "doc_id", "text"
)
n0 = docs.count()
reps = 100_000 // n0
inflated = docs
for k in range(1, reps):
    mut = docs.select(
        (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
        # every 3rd copy keeps the body (cross-copy duplicated spans),
        # others get a reversed body behind a variant prefix — content
        # the grid may or may not re-align on, but deterministically so
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(f" tail{k}")),
        )
        .otherwise(
            F.concat(F.lit(f"variant {k} prefix "), F.reverse(F.col("text")))
        )
        .alias("text"),
    )
    inflated = inflated.unionByName(mut)
inflated = inflated.repartition(32).persist()
total = inflated.count()
prev = None
for run in (1, 2):
    t0 = time.time()
    spans = duplicated_spans(inflated, "text", "doc_id", 64, 32).persist()
    n_spans = spans.count()
    dup_chars = spans.select(
        F.sum(F.col("span_end") - F.col("span_start")).alias("c")
    ).first()["c"]
    spans.unpersist()
    print(
        f"run{run}: docs={total} spans={n_spans} dup_chars={dup_chars} "
        f"wall={time.time()-t0:.1f}s"
    )
    if prev is not None and prev != (n_spans, dup_chars):
        print(f"NONDETERMINISTIC: {prev} != {(n_spans, dup_chars)}")
        sys.exit(1)
    prev = (n_spans, dup_chars)
spark.stop()
