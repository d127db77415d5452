"""100k-doc near-dedup regression probe (r8/r10 precedent): inflate the
sf0.1 documents table to 100k docs (mutated copies -> known near-dup
structure), run ngram_jaccard_pairs, time it, sanity-check pair volume."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from hudi_spark_utilities_plus_spark.operators.dedup import ngram_jaccard_pairs

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
n0 = docs.count()
reps = 100_000 // n0
inflated = docs
for k in range(1, reps):
    mut = docs.select(
        (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
        # every 3rd copy mutates the tail (near-dup), others get fresh text
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(f" tail{k}")))
        .otherwise(F.concat(F.lit(f"variant {k} prefix "), F.reverse(F.col("text"))))
        .alias("text"),
    )
    inflated = inflated.unionByName(mut)
inflated = inflated.repartition(32).persist()
total = inflated.count()
for run in (1, 2):
    t0 = time.time()
    pairs = ngram_jaccard_pairs(inflated, "text", "doc_id", threshold=0.8)
    n_pairs = pairs.count()
    print(f"run{run}: docs={total} pairs={n_pairs} wall={time.time()-t0:.1f}s")
spark.stop()
