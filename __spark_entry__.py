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
    # r16 window (ledger-computed at the product tree, LEDGER_r16.json):
    # the lake-family round the r15 verdict mandated — the seqmax-race
    # fix (lake.py) + the Mongo $match apply (sources/standin.py, inside
    # the lake closure) stain the 26-id lake family; + the new
    # mongo_match_pushdown id + the 5 r7 leftovers + the 18 oldest-r8
    # rows as spares = 50 exactly. The text/similarity/spans closure
    # (41 ids, freshly rowed r15) is untouched by design.
    "mongo_match_pushdown",
    "binlog_purge_recovery",
    "binlog_stream_scan",
    "es_scan",
    "hudi_cdc_read",
    "hudi_clean_grace",
    "hudi_clean_reclaim",
    "hudi_cluster_read",
    "hudi_filegroup_prune",
    "hudi_hive_sync_read",
    "hudi_incremental_read",
    "hudi_insert_overwrite",
    "hudi_manifest_commit",
    "hudi_mor_read",
    "hudi_mor_ro_read",
    "hudi_partition_overwrite",
    "hudi_partitioned_upsert",
    "hudi_point_read",
    "hudi_rectify_sizes",
    "hudi_restore_read",
    "hudi_schema_evolution",
    "hudi_time_travel",
    "hudi_upsert",
    "mongo_scan",
    "stream_demux",
    "stream_demux_recovery",
    "stream_demux_transform",
    "subquery_scalar",
    "text_normalize",
    "url_canonicalize",
    "win_first_last",
    "win_forward_fill",
    "agg_collect_csv",
    "agg_conditional_family",
    "agg_having",
    "agg_stats_moments",
    "date_spine_fill",
    "funnel_conversion",
    "pivot_dynamic",
    "profile_orders",
    "retention_cohorts",
    "sessionize_events",
    "sql_parameterized",
    "stream_stream_join",
    "stream_stream_left_join",
    "stream_trigger",
    "tpch_q11_shape",
    "tpch_q13_shape",
    "tpch_q14_shape",
    "tpch_q15_shape",
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
