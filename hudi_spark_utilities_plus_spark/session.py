"""SparkSession builder with production defaults.

Reference parity: ``boxer-common/.../Sparker.scala:8-28`` builds a session
with Kryo + 512m buffer defaults, but drops its config map before applying
it (defaults only took effect via ``--conf`` in launch scripts,
``test-startup.sh:4-6``). This builder actually applies them, plus the
scale-oriented settings the reference left to submit scripts:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- Arrow for pandas UDF exchange
- parquet datetime rebase CORRECTED (``test-startup.sh:5``)
- UTC session timezone so timestamp semantics are stable across hosts
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults the reference set in Sparker.scala:10-11 + every launch script,
# merged with the scale posture this rebuild standardizes on.
DEFAULT_CONF: dict[str, str] = {
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.kryoserializer.buffer.max": "512m",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    # Scale posture: AQE handles skew joins + post-shuffle coalescing at
    # 100 TB without hand-tuning every query's partition count.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def build_spark_session(
    app_name: str = "hudi-spark-utilities-plus-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with defaults actually applied.

    ``conf`` overrides ``DEFAULT_CONF``; ``master`` defaults to
    ``local[$SPARK_GRAFT_CPUS]`` when unset and no cluster master is
    configured in the environment.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    merged = dict(DEFAULT_CONF)
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Shuffle parallelism tracks the session's ACTUAL core count (the
    # bench runs at several $SPARK_GRAFT_CPUS values to measure scaling —
    # a constant tuned for one core count mis-sizes every other run, and
    # a cluster's capacity intent arrives via explicit conf). Same
    # only-if-Spark's-200-default guard as tune_runtime: a caller- or
    # submit-script-configured value is never clobbered (r16; results
    # are partition-count independent by design — perf-only).
    if "spark.sql.shuffle.partitions" not in merged:
        try:
            if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
                spark.conf.set(
                    "spark.sql.shuffle.partitions",
                    str(max(1, spark.sparkContext.defaultParallelism)),
                )
        except Exception:
            pass
    return spark


def tune_runtime(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an externally built session.

    Used when the harness hands us a session we didn't build (driver
    verify path): only runtime-mutable confs are set, silently skipping
    any that this Spark build treats as static.
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    # Align shuffle parallelism with the host's actual core count ONLY
    # when the session owner left Spark's 200 default in place (the
    # default mainly taxes the stateful streaming ids: 200 state-store
    # partitions per micro-batch on a 32-core box). A deliberately
    # configured value — e.g. 2000 for a large cluster — is capacity
    # intent and must not be clobbered. defaultParallelism, not a
    # hardcoded 32: on other hosts the literal is simply wrong. Results
    # are partition-count independent by design either way — perf-only.
    try:
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(1, spark.sparkContext.defaultParallelism)),
            )
    except Exception:
        pass
    return spark
