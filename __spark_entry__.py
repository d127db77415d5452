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
# in dict order. Round-12 window (the VERDICT r11 ROTATION round),
# COMPUTED by tools/ledger.py at the committed tree: 1 never-checked
# (hudi_partition_overwrite — the r11-earmarked new id, the round's
# only registry growth) + the 15 r10-row spills (all carrying exactly
# the warning-only materialize.py fdb0a06 stain) + the 24 ids
# re-stained by this round's fixes (lake.py: base-duplicate guard for
# partition-scoped MOR reads + key_unique manifest claim + lock
# ownership tokens + filesystem-scope docs; streaming/cdc.py:
# persist-inside-try; sources/standin.py: count-offset retirement —
# every one of the 24 has lake.py in its file-level closure, so the
# cdc/standin dependents cost no extra slots) + 10 of the 26 r5-row
# ids alphabetically (the remaining 16 r5 + 33 r6 spill to r13, which
# per VERDICT r11 item 1 is the second half of the two-round
# old-cohort clear: 1+15+24 mandatory entries left only 10 free
# slots — the arithmetic is in SURVEY §13).
_CHECK_ORDER = [
    # never driver-checked: the r11-earmarked partitioned-manifest
    # dynamic-overwrite id (carry/drop/rewrite classification pinned
    # physically — mtime pins, manifest absence, survivor-row exactness)
    "hudi_partition_overwrite",
    # the 15 r10-row spills (single warning-only materialize.py stain)
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
    "win_ntile",
    "win_range_between",
    "word_freq",
    # the 24 ids re-stained by the r12 lake/cdc/standin fixes
    "binlog_purge_recovery",
    "binlog_stream_scan",
    "es_scan",
    "hudi_cdc_read",
    "hudi_clean_reclaim",
    "hudi_cluster_read",
    "hudi_filegroup_prune",
    "hudi_hive_sync_read",
    "hudi_incremental_read",
    "hudi_insert_overwrite",
    "hudi_manifest_commit",
    "hudi_mor_read",
    "hudi_mor_ro_read",
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
    # r5-cohort rotation, oldest rows in the registry, alphabetical
    "dedup_latest_wins",
    "filter_eq",
    "flatten_struct",
    "join_broadcast",
    "join_bucketed",
    "join_inner",
    "join_left",
    "join_nullsafe",
    "join_range",
    "join_right",
    # ---- window edge: position 50 ----
    # r5 spill to r13: join_semi, json_funcs, math_funcs, null_funcs,
    # project_expr, scan_parquet, set_union, sort_limit_topk,
    # str_funcs, stream_recovery, struct_access, subquery_in,
    # tpch_q12_shape, transform_sql, win_lead, win_rank — then the 33
    # r6-row ids (agg_cube ... win_running_sum)
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
