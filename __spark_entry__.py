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
# in dict order.  Round-4 rotation: (a) the last three ids with no driver row
# in any round, (b) the three round-3 failures, now fixed, (c) the five ids
# that had no oracle until this round, (d) re-checks of everything this
# round's code changes touch (scatter() gating affects every documents/
# embeddings pipeline), then algorithmic re-checks.  New round-4 operators
# go in the first block as they are built.
_CHECK_ORDER = [
    # round-4 new operators — never checked (prepend as built)
    "hudi_time_travel",
    "hudi_mor_ro_read",
    "join_bucketed",
    "corpus_filter_funnel",
    "split_train_val",
    "funnel_conversion",
    "retention_cohorts",
    "win_cume_dist",
    "agg_stats_moments",
    "profile_orders",
    "agg_collect_csv",
    "date_spine_fill",
    "agg_conditional_family",
    "tpch_q4_shape",
    "tpch_q6_shape",
    "tpch_q7_shape",
    "tpch_q8_shape",
    "tpch_q11_shape",
    "tpch_q12_shape",
    "tpch_q14_shape",
    "tpch_q15_shape",
    "tpch_q16_shape",
    "tpch_q19_shape",
    "tpch_q22_shape",
    "tpch_q2_shape",
    "tpch_q9_shape",
    "tpch_q13_shape",
    "tpch_q17_shape",
    "tpch_q20_shape",
    "tpch_q21_shape",
    # (a) never driver-checked in any round
    "set_union_all",
    "agg_having",
    "agg_minmax",
    # (b) round-3 failures, fixed this round
    "sessionize_events",
    "pack_token_budget",
    "embedding_quantize",
    # (c) oracle-backed for the first time this round
    "dedup_simhash",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "mm_resize",
    "mm_frame_sample",
    # (d) re-checks touched by the scatter() gating change
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_components",
    "contamination_check",
    "mm_features",
    "pii_scrub",
    "ngram_bigrams",
    "chunk_documents",
    "keyword_extract",
    "text_quality",
    "text_repetition",
    "lang_id",
    "doc_fingerprint",
    "sample_hash_docs",
    "sample_stratified",
    "word_freq",
    # algorithmic re-checks
    "embedding_similar_pairs",
    "ann_topk",
    "join_asof",
    "win_ntile",
    "win_range_between",
    "agg_percentile",
    "hudi_cluster_read",
    "hudi_mor_read",
    "hudi_upsert",
    "cdc_apply",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "tpch_q1_shape",
    "tpch_q3_shape",
    "tpch_q5_shape",
    "tpch_q10_shape",
    "tpch_q18_shape",
    "agg_decimal_total",
    "agg_grouping_sets",
    "join_salted",
    "agg_mode",
    # past the window edge: green rows of record in r1/r2/r3
    "agg_percentile_sketch",
    "hist_totalprice",
    "unpivot_measures",
    "agg_salted",
    "pivot_status",
    "win_first_last",
    "subquery_scalar",
    "subquery_exists",
    "map_access",
    "date_arith",
    "distinct_rows",
    "order_nulls",
    "dedup_latest_wins",
    "agg_approx_distinct",
    "cast_types",
    "flatten_struct",
    "flatten_array_struct",
    "flatten_cartesian",
    "agg_rollup",
    "agg_cube",
    "win_rank",
    "win_lag",
    "win_running_sum",
    "json_funcs",
    "subquery_in",
    "cte",
    "transform_sql",
    "agg_group",
    "join_range",
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
