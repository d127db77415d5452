"""Cluster-size independence: the same query must produce bit-identical
results at different shuffle-partition counts — the property that lets a
100 TB deployment resize its cluster without drifting numbers. This is
why money sums run in exact decimal, global windows run two-phase, and
near-dup pair sets come from verified candidates: none of them may
depend on how rows happen to be partitioned."""

from __future__ import annotations

import pytest

from hudi_spark_utilities_plus_spark.queries import QUERIES

# Representative ids per family: exact-decimal aggregation, two-phase
# global windows, running-sum packing, verified near-dup pairs, exact
# percentiles.
_IDS = [
    "agg_group",
    "win_ntile",
    "pack_token_budget",
    "dedup_minhash_lsh",
    "agg_percentile",
]


def _rows(spark, name, sf_dir, partitions):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = QUERIES[name](spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(tuple(r) for r in df.select(cols).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", _IDS)
def test_results_identical_across_partition_counts(spark, sf_dir, name):
    assert _rows(spark, name, sf_dir, 3) == _rows(spark, name, sf_dir, 17)
