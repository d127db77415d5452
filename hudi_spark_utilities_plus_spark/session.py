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
    # a cluster's capacity intent arrives via explicit conf). Guards
    # (r17, ADVICE r16): (a) an explicitly configured value is detected
    # via the STARTUP SparkConf (spark-defaults / --conf / builder), so
    # a deliberate "200" is no longer mistaken for Spark's default —
    # the value-equality heuristic remains only as tune_runtime's
    # fallback where no startup conf is reachable; (b) the derive is
    # LOCAL-master-only — on a cluster with dynamic allocation,
    # defaultParallelism at session build can reflect zero registered
    # executors and would mis-size the whole session. Results are
    # partition-count independent by design — perf-only.
    if "spark.sql.shuffle.partitions" not in merged:
        try:
            sc = spark.sparkContext
            if (
                sc.master.startswith("local")
                and not sc.getConf().contains("spark.sql.shuffle.partitions")
                # value check too: getOrCreate may have handed us a
                # REUSED session whose owner set the conf at runtime
                and spark.conf.get("spark.sql.shuffle.partitions", "200")
                == "200"
            ):
                spark.conf.set(
                    "spark.sql.shuffle.partitions",
                    str(max(1, sc.defaultParallelism)),
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
    # intent and must not be clobbered; a startup-conf-set value is
    # detected exactly, and the value-equality check remains for
    # runtime sets. KNOWN EDGE (ADVICE r16, documented): an owner who
    # deliberately chose the literal 200 via a runtime spark.conf.set
    # is indistinguishable from Spark's default here and gets the
    # core-count derive — inherent to the heuristic; results are
    # partition-count independent by design either way (perf-only).
    # LOCAL masters only: under dynamic allocation a cluster session's
    # defaultParallelism at call time can reflect zero registered
    # executors and would mis-size every later stage.
    try:
        sc = spark.sparkContext
        if (
            sc.master.startswith("local")
            and not sc.getConf().contains("spark.sql.shuffle.partitions")
            and spark.conf.get("spark.sql.shuffle.partitions", "200") == "200"
        ):
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(1, sc.defaultParallelism)),
            )
    except Exception:
        pass
    return spark
