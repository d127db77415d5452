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
# in dict order.  Round-5 rotation: (a) the round-4 red row, oracle fixed
# this round (HUGEINT-typed SUM(CASE) -> COUNT(*) FILTER); (b) round-5 new
# ids, never driver-checked; (c) ids whose oracle or implementation this
# round's changes touch (mm ASCII-guard oracles, join_bucketed refactor,
# verify-join fallback, global_running_sum decimal branch); (d) the stale
# cohort whose last green row is round 2 — everything else was re-proven in
# r3/r4.  40 of the 49 r2-cohort ids fit; the nine deferred past the window
# edge all have same-operator-family siblings INSIDE the window and lead
# the r6 rotation.
_CHECK_ORDER = [
    # (a) round-4 red row — oracle rewritten COUNT(*) FILTER, must re-prove
    "tpch_q12_shape",
    # (b) round-5 new ids, never driver-checked
    "join_right",
    "stream_trigger",
    "stream_recovery",
    "stream_stateful",
    "win_lead",
    "array_hof",
    "join_nullsafe",
    "hudi_incremental_read",
    "stream_demux",
    "excel_scan",
    "jdbc_scan",
    "csv_scan",
    # (c) oracle / implementation touched this round
    "mm_resize",
    "mm_frame_sample",
    "join_bucketed",
    "pack_token_budget",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    # (d) stale cohort: last green row is round 2 (40 of 49 fit the window)
    "agg_approx_distinct",
    "agg_group",
    "agg_rollup",
    "array_funcs",
    "cast_types",
    "cte",
    "date_funcs",
    "dedup_latest_wins",
    "doc_fingerprint",
    "filter_eq",
    "flatten_struct",
    "hudi_upsert",
    "join_broadcast",
    "join_inner",
    "join_left",
    "join_range",
    "join_semi",
    "json_funcs",
    "lang_id",
    "math_funcs",
    "null_funcs",
    "project_expr",
    "scan_parquet",
    "set_union",
    "sort_limit_topk",
    "str_funcs",
    "struct_access",
    "subquery_in",
    "text_quality",
    "transform_sql",
    "win_rank",
    # ---- window edge: position 50 ----
    # deferred r2-cohort ids (each has a same-family sibling inside the
    # window above); these lead the round-6 rotation
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
    # last green row r3
    "agg_decimal_total",
    "agg_grouping_sets",
    "agg_mode",
    "agg_percentile",
    "agg_percentile_sketch",
    "agg_salted",
    "ann_topk",
    "date_arith",
    "distinct_rows",
    "embedding_similar_pairs",
    "hist_totalprice",
    "hudi_cluster_read",
    "join_asof",
    "join_salted",
    "keyword_extract",
    "map_access",
    "order_nulls",
    "pivot_status",
    "sample_hash_docs",
    "sample_stratified",
    "stream_session",
    "stream_sliding",
    "subquery_exists",
    "subquery_scalar",
    "text_repetition",
    "tpch_q10_shape",
    "tpch_q18_shape",
    "tpch_q1_shape",
    "tpch_q3_shape",
    "tpch_q5_shape",
    "unpivot_measures",
    "win_first_last",
    "win_ntile",
    "win_range_between",
    "word_freq",
    # last green row r4 — freshest; any id not listed here appends in
    # registration order (see _ordered)
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
