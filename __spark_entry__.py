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
# in dict order.  Round-6 rotation (the staleness-refresh round VERDICT r5
# item 1 asks for): (a) round-6 new ids, never driver-checked
# (hive-sync catalog read; Mongo/ES executed end to end through the
# Python Data Source stand-ins; streaming stateful dedup; hashed-feature
# quality model); (b) the FULL r2 cohort — the 18 ids whose last green
# driver row is round 2; (c) the 27 oldest r3 ids.
# The 8 r3 ids deferred past the window edge each have a same-family
# sibling INSIDE the window and lead the r7 rotation, followed by the
# r5 ids whose implementation round 6 touched (multimodal PIL guard,
# stream progress accounting, jdbc Derby drop, xlsx writer) — those are
# re-proven this round by the full-registry /verify exact-compare and
# keep their r5 rows meanwhile.
_CHECK_ORDER = [
    # (a) round-6 new ids, never driver-checked
    "hudi_hive_sync_read",
    "mongo_scan",
    "es_scan",
    "stream_dedup",
    "quality_model_score",
    # (b) stale cohort: last green row is round 2 (all 18)
    "agg_distinct",
    "join_anti",
    "win_running_sum",
    "hudi_mor_read",
    "join_full",
    "cdc_apply",
    "token_counts",
    "stream_tumbling",
    "derive_partition_dt",
    "filter_in",
    "filter_null",
    "set_except",
    "set_intersect",
    "join_cross",
    "flatten_cartesian",
    "flatten_array_struct",
    "agg_cube",
    "win_lag",
    # (c) oldest r3 ids (27 of 35)
    "agg_decimal_total",
    "agg_grouping_sets",
    "agg_mode",
    "agg_percentile",
    "agg_salted",
    "ann_topk",
    "date_arith",
    "distinct_rows",
    "embedding_similar_pairs",
    "hist_totalprice",
    "hudi_cluster_read",
    "join_asof",
    "join_salted",
    "pivot_status",
    "sample_hash_docs",
    "stream_session",
    "subquery_exists",
    "text_repetition",
    "tpch_q10_shape",
    "tpch_q18_shape",
    "tpch_q1_shape",
    "tpch_q3_shape",
    "tpch_q5_shape",
    "unpivot_measures",
    "win_ntile",
    "win_range_between",
    "word_freq",
    # ---- window edge: position 50 ----
    # deferred r3 ids (same-family sibling inside the window); r7 head
    "agg_percentile_sketch",
    "subquery_scalar",
    "win_first_last",
    "order_nulls",
    "stream_sliding",
    "sample_stratified",
    "keyword_extract",
    "map_access",
    # r5 ids whose implementation round 6 touched — next in r7
    "mm_features",
    "mm_resize",
    "stream_trigger",
    "stream_demux",
    "jdbc_scan",
    "excel_scan",
    "dedup_ngram_jaccard",
    # anything not listed appends in registration order (see _ordered)
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
