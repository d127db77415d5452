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
# in dict order.  Round-9 window (VERDICT r8 "Next" items 3/6 pin the
# composition): (a) the one new id this round (stream_demux_transform —
# the per-table SQL-transform hook now reachable from the streaming
# demux sink, the capability VERDICT r8 item 6 earmarked the registry
# budget for); (b) every id whose CODE was touched in r8 or r9 but whose
# latest driver row predates the change — the streaming/demux family
# (stream_demux after the partitioned-payload fix, cdc_apply,
# stream_stateful, stream_dedup), the r8 text.py rework consumers
# (doc_fingerprint — now with the r9 ASCII fast path — lang_id,
# text_quality), the r8 multimodal totalization (mm_features,
# mm_frame_sample), the r8 global-window rework (win_range_between,
# pack_token_budget, win_cume_dist), the r8+r9 similarity guard work
# (ann_topk, ann_topk_lsh, ann_topk_ivf, embedding_similar_pairs,
# embedding_similar_pairs_lsh, dedup_embedding_semantic), and the full
# hudi family (lake.py's r9 write-path changes: missing-partition-column
# materialization, NULL-precombine delete markers); (c) the ENTIRE
# r4-row residue — computed truth from the CORRECTNESS r01-r08 union is
# **11** ids (mm_features is on an r4 row, not r5 as this comment
# previously claimed — VERDICT r8 "What's wrong" 3): mm_features (in
# (b)), set_union_all, win_cume_dist (in (b)), agg_minmax,
# ngram_bigrams, tpch_q16/q17/q19/q20/q21/q22; (d) r5-cohort fill,
# oldest-first, to 50. Post-r9 (all green): no id's row predates its
# last code change, 0 r4-row ids; r10 = the remaining r5 spill + the r6
# cohort, after which no row is older than 3 rounds.
_CHECK_ORDER = [
    # (a) new this round — never driver-checked
    "stream_demux_transform",
    # (b) code-touched in r8/r9, row predates the change
    "stream_demux",
    "cdc_apply",
    "stream_stateful",
    "stream_dedup",
    "doc_fingerprint",
    "lang_id",
    "text_quality",
    "mm_features",
    "mm_frame_sample",
    "win_range_between",
    "pack_token_budget",
    "win_cume_dist",
    "ann_topk",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "embedding_similar_pairs",
    "embedding_similar_pairs_lsh",
    "dedup_embedding_semantic",
    "hudi_upsert",
    "hudi_incremental_read",
    "hudi_mor_read",
    "hudi_cluster_read",
    "hudi_hive_sync_read",
    "hudi_insert_overwrite",
    "hudi_partitioned_upsert",
    "hudi_restore_read",
    "hudi_schema_evolution",
    "hudi_cdc_read",
    "hudi_manifest_commit",
    # hudi_mor_ro_read / hudi_time_travel sit on r8 rows, but the
    # write paths they drive (bulk_insert/upsert/delete) changed in
    # r9 (_with_partition_col, _append_log materialization, the COW
    # NULL-precombine marker semantics) — "full hudi family" means
    # ALL 13 ids, at the cost of two r5-fill slots (dedup_latest_wins
    # / filter_eq spill to the r10 head)
    "hudi_mor_ro_read",
    "hudi_time_travel",
    # (c) the remaining r4-row residue (computed: 11 total; mm_features
    # and win_cume_dist already above)
    "set_union_all",
    "agg_minmax",
    "ngram_bigrams",
    "tpch_q16_shape",
    "tpch_q17_shape",
    "tpch_q19_shape",
    "tpch_q20_shape",
    "tpch_q21_shape",
    "tpch_q22_shape",
    # (d) r5-cohort fill to position 50 (oldest rows first; the rest of
    # the r5 cohort + r6 spill to the r10 window)
    "agg_approx_distinct",
    "agg_group",
    "agg_rollup",
    "array_funcs",
    "array_hof",
    "cast_types",
    "csv_scan",
    "cte",
    "date_funcs",
    # ---- window edge: position 50 ----
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
