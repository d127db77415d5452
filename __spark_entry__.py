"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full named-query registry of
``hudi_spark_utilities_plus_spark`` (one entry per implemented operator
from SURVEY.md §2; oracles are DuckDB-dialect ANSI SQL over the same
parquet tables).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the engine importable from any cwd — on the driver (sys.path) and,
# when the SparkContext hasn't started yet, on python workers (PYTHONPATH).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if _REPO not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hudi_spark_utilities_plus_spark.queries import QUERIES
    from hudi_spark_utilities_plus_spark.session import tune_runtime

    tune_runtime(spark)
    return QUERIES["join_inner"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate covers the FIRST 50 entries of ``queries()``
# in dict order. ONE window rationale lives here (the current round's);
# history belongs to SURVEY's per-round sections and the LEDGER_r*.json
# artifacts, not an ever-growing comment.
_CHECK_ORDER = [
    # r15 window (ledger-computed at the product tree, LEDGER_r15.json):
    # the 41-id text-closure stain — the r15 product commits touch
    # operators/text.py, and the closure CONTAINS the similarity + spans
    # families via similarity->dedup->text imports, which is what made
    # this round's similarity/spans work stain-free — + the new
    # dedup_substring_refine + 8 oldest-r7 spares = 50 exactly; the 5
    # remaining r7 rows (subquery_scalar, text_normalize,
    # url_canonicalize, win_first_last, win_forward_fill) roll to r16.
    "dedup_substring_refine",
    "chunk_documents",
    "contamination_check",
    "corpus_filter_funnel",
    "dedup_components",
    "dedup_containment",
    "dedup_editdistance",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "doc_fingerprint",
    "graph_triangle_count",
    "keyword_extract",
    "lang_id",
    "mm_features",
    "mm_frame_sample",
    "mm_audio_energy",
    "mm_resize",
    "ngram_bigrams",
    "pack_token_budget",
    "pii_scrub",
    "quality_model_score",
    "sample_hash_docs",
    "split_train_val",
    "text_quality",
    "text_repetition",
    "tfidf_topterms",
    "token_counts",
    "word_freq",
    "ann_topk",
    "ann_topk_ivf",
    "ann_topk_ivf_index",
    "ann_topk_lsh",
    "ann_topk_pq",
    "dedup_embedding_semantic",
    "dedup_simhash",
    "dedup_substring_coverage",
    "dedup_substring_spans",
    "dedup_substring_strip",
    "embedding_quantize",
    "embedding_similar_pairs",
    "embedding_similar_pairs_lsh",
    "sample_stratified",
    "scd2_build",
    "sql_pipe_syntax",
    "stream_complete_agg",
    "stream_dedup_watermark",
    "stream_sliding",
    "stream_static_join",
    "subquery_not_in_nulls",
]


def _ordered(registry: dict) -> list[str]:
    """_CHECK_ORDER first, then any remaining ids in registration order."""
    known = [n for n in _CHECK_ORDER if n in registry]
    rest = [n for n in registry if n not in _CHECK_ORDER]
    return known + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hudi_spark_utilities_plus_spark.queries import QUERIES
    from hudi_spark_utilities_plus_spark.session import tune_runtime

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_runtime(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(QUERIES[name]) for name in _ordered(QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query id."""
    from hudi_spark_utilities_plus_spark.queries import ORACLES

    return {name: ORACLES[name] for name in _ordered(ORACLES)}
