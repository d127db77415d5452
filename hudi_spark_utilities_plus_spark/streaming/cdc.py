"""CDC change-event model + apply semantics (binlog emulation).

Reference parity: the binlog streamer consumes MySQL binlog events keyed
by (db, table) regex patterns and materializes latest-state Hudi tables
via recordkey + precombine (``HoodieBinlogDeltaStreamer.scala:77-89``,
``hoodie_table_meta.properties:3-4``). No MySQL exists here, so the
source is emulated as a file-based Structured Streaming source carrying
the same envelope (FIXTURES.md F5):

    op: insert|update|delete, db, table, id (record key),
    data (payload JSON), ts (binlog position / precombine)

``read_cdc_stream`` yields the unbounded DataFrame; ``apply_cdc_batch``
applies one micro-batch to a keyed table: within-batch latest-wins
compaction first (a batch may hold several ops per key), then upsert the
non-deletes and delete the delete-keys — idempotent, so checkpoint replay
after failure converges to the same state (at-least-once delivery +
idempotent apply ⇒ exactly-once table state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..lake import HudiTable

CDC_SCHEMA = (
    "op STRING, db STRING, `table` STRING, id BIGINT, data STRING, ts TIMESTAMP, "
    "binlog_file STRING, binlog_offset BIGINT"
)


def read_cdc_stream(
    spark: SparkSession,
    path: str,
    database_pattern: str = ".*",
    table_pattern: str = ".*",
    max_files_per_trigger: int | None = None,
    binlog_name_prefix: str = "mysql-bin",
    binlog_index: int | str | None = None,
    binlog_file_offset: int | str | None = None,
) -> DataFrame:
    """File-based CDC source with the reference's db/table regex routing
    (comma lists rewritten to alternation, HoodieBinlogDeltaStreamer
    .scala:85) and binlog start position (``bingLogNamePrefix`` /
    ``binlogIndex`` / ``binlogFileOffset``, scala:86-88 — the reference
    keeps spark-binlog's "bingLog" typo in the option key; the Python
    surface uses the corrected spelling).

    Position semantics mirror MySQL: events carry the binlog file name
    (``{prefix}.{index:06d}``) and byte offset; a start position keeps
    events at or after ``(file, offset)``. Checkpoint recovery subsumes
    the position on restart — the option matters for first attach, same
    as the reference. Events without position columns (older fixtures)
    are kept."""
    reader = spark.readStream.schema(CDC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.json(path)
    db_re = "|".join(p.strip() for p in database_pattern.split(","))
    tbl_re = "|".join(p.strip() for p in table_pattern.split(","))
    df = df.filter(
        F.col("db").rlike(f"^({db_re})$") & F.col("table").rlike(f"^({tbl_re})$")
    )
    if binlog_index is not None:
        start_idx = int(binlog_index)
        start_off = int(binlog_file_offset or 4)  # 4 = first event, as in MySQL
        # compare PARSED integer indexes, not file-name strings: MySQL
        # widens the suffix past 6 digits at .999999 rollover, and
        # 'mysql-bin.1000000' < 'mysql-bin.999999' lexicographically —
        # string comparison re-ingests pre-start events at the rollover
        file_idx = F.substring_index(F.col("binlog_file"), ".", -1).cast(
            "long"
        )
        df = df.filter(
            F.col("binlog_file").isNull()
            | (file_idx > start_idx)
            | (
                (file_idx == start_idx)
                # a null offset means "no position" — keep, per the
                # docstring contract (coalescing to 0 silently dropped
                # such events whenever start_off > 0)
                & (
                    F.col("binlog_offset").isNull()
                    | (F.col("binlog_offset") >= start_off)
                )
            )
        )
    return df


def read_binlog_stream(
    spark: SparkSession,
    path: str,
    database_pattern: str = ".*",
    table_pattern: str = ".*",
    binlog_name_prefix: str = "mysql-bin",
    binlog_index: int | str | None = None,
    binlog_file_offset: int | str | None = None,
    host: str = "localhost",
    port: int | str = 3306,
    username: str = "",
    password: str = "",
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """CDC stream through the CONNECTOR'S format name — the reference
    reads ``spark.readStream.format("mysql-binlog")`` with the
    spark-binlog option set (HoodieBinlogDeltaStreamer.scala:77-89).
    This resolves that exact format via the registered streaming Python
    Data Source stand-in (sources/standin.BinlogStandInSource): format
    resolution, option forwarding (including the reference-preserved
    ``bingLogNamePrefix`` typo key and the comma→'|' pattern rewrite),
    offset tracking, and checkpointed replay are all the real Spark
    streaming machinery; only the MySQL network hop is simulated by the
    JSON-lines fixture dir at ``path``.

    ``read_cdc_stream`` (above) remains the file-source emulation used
    where a plain file stream is the point (e.g. maxFilesPerTrigger
    batching control); pipelines that want reference parity end to end
    use this one."""
    from ..sources.standin import register_standin_sources

    register_standin_sources(spark)
    reader = (
        spark.readStream.format("mysql-binlog")
        .option("standin.path", path)
        .option("host", host)
        .option("port", str(port))
        .option("userName", username)
        .option("password", password)
        .option("databaseNamePattern", "|".join(
            p.strip() for p in database_pattern.split(",")
        ))
        .option("tableNamePattern", "|".join(
            p.strip() for p in table_pattern.split(",")
        ))
        .option("bingLogNamePrefix", binlog_name_prefix)
    )
    if binlog_index is not None:
        reader = reader.option("binlogIndex", str(int(binlog_index))).option(
            "binlogFileOffset", str(int(binlog_file_offset or 4))
        )
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def compact_batch(batch_df: DataFrame, record_key: str, precombine: str) -> DataFrame:
    """Within-batch latest-wins: keep only the last op per key.

    Ties on the precombine break on the BINLOG POSITION when the
    envelope carries it (binlog ts is second-resolution, so
    insert-then-delete on one key within a second is routine): ordering
    by ts alone left the winner to shuffle-internal row order — a
    checkpoint replay could pick the other op, breaking the
    replay-converges claim. (binlog_file compares by its parsed integer
    index; the name string mis-orders at the 6-digit rollover.)"""
    order = [F.col(precombine).desc()]
    cols = set(batch_df.columns)
    if "binlog_file" in cols:
        order.append(
            F.substring_index(F.col("binlog_file"), ".", -1)
            .cast("long")
            .desc_nulls_last()
        )
    if "binlog_offset" in cols:
        order.append(F.col("binlog_offset").desc_nulls_last())
    w = Window.partitionBy(record_key).orderBy(*order)
    return (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc_batch(
    table: HudiTable, batch_df: DataFrame, spark: SparkSession
) -> None:
    """Apply one micro-batch of change events to a keyed lake table.

    Deletes keep the precombine column: a redelivered/out-of-order
    delete in a LATER micro-batch (at-least-once delivery) must compete
    by timestamp with the newer upsert already in the table — a
    key-only delete is unconditional and would kill the newer row."""
    compacted = compact_batch(batch_df, table.record_key, table.precombine).persist()
    try:
        upserts = compacted.filter(F.col("op") != "delete").drop("op", "db", "table")
        del_cols = [table.record_key]
        if table.precombine in compacted.columns:
            del_cols.append(table.precombine)
        deletes = compacted.filter(F.col("op") == "delete").select(*del_cols)
        if not upserts.isEmpty():
            table.upsert(upserts, spark)
        if not deletes.isEmpty():
            table.delete(deletes, spark)
    finally:
        compacted.unpersist()
