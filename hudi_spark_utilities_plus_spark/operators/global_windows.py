"""Scale-safe replacements for globally-ordered window functions.

A ``Window.orderBy(...)`` with no ``partitionBy`` plans an
``Exchange SinglePartition`` → every row funnels through ONE task —
correct at sf0.01, dead at 100 TB. These operators compute the same
results as two-phase distributed programs:

- :func:`global_row_number` — range-partition on the order keys, rank
  locally per partition (NO second exchange: the local ordinal falls
  out of ``monotonically_increasing_id`` after an in-partition sort),
  then add per-partition cumulative offsets (a ``n_partitions``-row
  metadata collect, same class as IVF centroids). ntile/percent_rank
  derive from the global row number plus the (driver-side) total count.
- :func:`range_frame_sum` — a value-RANGE-framed running sum expressed
  as a bounded block self-join: bucket rows into blocks the width of
  the frame, emit each row as a contributor to its own and the next
  block, equi-join on block, filter the value range, aggregate. Every
  stage is a hash shuffle on block/key — no single-partition anything.

Neither produces an ``Exchange SinglePartition`` in the executed plan
(pinned by tests/test_plans.py).

Internal temp columns are ``__gw_``-prefixed so a caller's own columns
are never clobbered by the intermediate ``withColumn``/``drop`` steps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# monotonically_increasing_id() = (partition_id << 33) | row_index, so
# the low 33 bits ARE the 0-based ordinal within the partition — a local
# row number with no window (and no hash exchange). Valid while every
# partition holds < 2^33 rows (8.5 B — far above any sane task size);
# the per-partition counts collect enforces the bound at runtime.
_MID_ROW_MASK = (1 << 33) - 1


def _materialize(df: DataFrame) -> DataFrame:
    """Freeze the frame — correctness, not caching: the monotonic ids /
    in-partition window sums are nondeterministic under recomputation
    (range sampling, id assignment), so the offsets collected
    driver-side and the rows the caller finally reads MUST come from
    one single evaluation. See operators/materialize.py for why
    checkpoint, not persist."""
    from .materialize import materialize

    return materialize(df)


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    n_partitions: int | None = None,
    out_col: str = "rn",
) -> tuple[DataFrame, int]:
    """Globally-ordered row_number without a single-partition window.

    Phase 1: ``repartitionByRange`` on the order keys (deterministic
    sampled boundaries) + ``sortWithinPartitions`` — each task sorts
    only its slice, and the local ordinal is read straight off
    ``monotonically_increasing_id``'s low bits, so there is NO second
    exchange (a ``Window.partitionBy(partition-tag)`` would hash-shuffle
    the full dataset a second time just to re-cluster rows that are
    already colocated). Phase 2: per-partition row counts
    (``n_partitions`` rows — metadata, not data) are collected, turned
    into cumulative offsets, and broadcast-joined back: global rn =
    offset + local rn.

    Order keys must be a total order (unique): rows tying across a
    range boundary would otherwise get arbitrary relative ranks.

    Returns ``(df_with_rn, total_row_count)`` — the total falls out of
    the offsets for free (callers need it for ntile/percent_rank).
    """
    sess = df.sparkSession
    n_partitions = n_partitions or sess.sparkContext.defaultParallelism
    # _materialize: the ids below must be computed exactly once (see
    # its docstring) — the counts collect and the caller's final read
    # must observe the same evaluation
    local = _materialize(
        df.repartitionByRange(n_partitions, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__gw_pid", F.spark_partition_id())
        .withColumn(
            "__gw_lrn",
            (
                F.monotonically_increasing_id().bitwiseAND(
                    F.lit(_MID_ROW_MASK)
                )
                + 1
            ).cast("long"),
        )
    )
    counts = sorted(
        (r["__gw_pid"], r["n"])
        for r in local.groupBy("__gw_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        if n >= 1 << 33:
            # the low-bits ordinal wraps into the partition-id bits
            # past 2^33 rows in one partition — fail loudly instead of
            # silently emitting duplicate/wrapped row numbers (the
            # counts are already on the driver, the check is free)
            raise RuntimeError(
                f"partition {pid} holds {n} rows (>= 2^33): the "
                "monotonic-id ordinal would wrap — raise n_partitions"
            )
        offsets[pid] = acc
        acc += n
    off_df = F.broadcast(
        sess.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            "__gw_pid INT, __gw_off LONG",
        )
    )
    out = (
        local.join(off_df, "__gw_pid")
        .withColumn(out_col, (F.col("__gw_off") + F.col("__gw_lrn")).cast("long"))
        .drop("__gw_pid", "__gw_lrn", "__gw_off")
    )
    return out, acc


def ntile_expr(rn: Column, n_total: int, tiles: int) -> Column:
    """Standard-SQL NTILE from a global row number and the total count
    (driver-side scalar): the first ``n mod tiles`` buckets get
    ``⌈n/tiles⌉`` rows, the rest ``⌊n/tiles⌋``."""
    if tiles <= 0:
        raise ValueError(f"tiles must be > 0; got {tiles}")
    q, r = divmod(n_total, tiles)
    if q == 0:  # fewer rows than tiles: bucket = rn
        return rn.cast("int")
    big = r * (q + 1)  # rows living in the (q+1)-sized buckets
    return (
        F.when(rn <= big, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(F.lit(r) + F.floor((rn - big - 1) / q) + 1)
        .cast("int")
    )


def percent_rank_expr(rn: Column, n_total: int) -> Column:
    """PERCENT_RANK = (rank-1)/(n-1) — with a unique total order,
    rank == row_number; exact IEEE division on both engines."""
    if n_total <= 1:
        return F.lit(0.0)
    return (rn - 1).cast("double") / F.lit(float(n_total - 1))


def global_running_sum(
    df: DataFrame,
    order_by: list[Column],
    val: Column,
    n_partitions: int | None = None,
    out_col: str = "cum",
) -> DataFrame:
    """``SUM(val) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` without
    the ``Exchange SinglePartition`` a global ORDER BY window plans.

    Same two-phase program as :func:`global_row_number` with SUM in
    place of COUNT: range-partition on the order keys, local running sum
    per partition, then add per-partition total offsets (an
    ``n_partitions``-row metadata collect, broadcast back). Order keys
    must be a total order (unique) for a deterministic result.

    The local cumulative sum needs a ``Window.partitionBy`` on the
    partition tag, which Catalyst satisfies with a second hash exchange
    (it cannot see that rows are already colocated by partition id; a
    bare ordinal can be read off ``monotonically_increasing_id`` but a
    running SUM cannot). The alternative — an Arrow-batched
    ``mapInPandas`` cumsum — would avoid that exchange but round-trips
    the full dataset through Python serialization, which costs as much
    as the shuffle it saves and breaks whole-stage codegen; the JVM
    shuffle is the deliberate choice."""
    sess = df.sparkSession
    n_partitions = n_partitions or sess.sparkContext.defaultParallelism
    tagged = (
        df.repartitionByRange(n_partitions, *order_by)
        .withColumn("__gw_pid", F.spark_partition_id())
        .withColumn("__gw_v", val)
    )
    w = (
        Window.partitionBy("__gw_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # __gw_lcnt (COUNT ignores NULLs) distinguishes "prefix sums to
    # NULL because every value so far is NULL" from a genuine sum: the
    # SQL running sum is NULL only while the GLOBAL prefix has zero
    # non-null values, but the in-partition __gw_lcum alone is NULL for
    # any row whose LOCAL prefix is all-NULL — adding the offset to
    # that NULL silently yielded NULL where the true running sum is the
    # preceding partitions' total.
    local = _materialize(
        tagged.withColumn("__gw_lcum", F.sum("__gw_v").over(w)).withColumn(
            "__gw_lcnt", F.count("__gw_v").over(w)
        )
    )
    totals = sorted(
        (r["__gw_pid"], r["t"], r["c"])
        for r in local.groupBy("__gw_pid")
        .agg(F.sum("__gw_v").alias("t"), F.count("__gw_v").alias("c"))
        .collect()
    )
    # offsets inherit the sum's arithmetic from the VALUE column's type:
    # integral columns stay exact longs (token counts — the original
    # contract); DECIMAL columns keep exact Decimal offsets (money sums
    # are exact — collapsing them to float would silently lose cents);
    # other fractional types ride as doubles
    from decimal import Decimal

    from pyspark.sql.types import DecimalType

    vt = tagged.schema["__gw_v"].dataType
    integral = vt.simpleString() in ("tinyint", "smallint", "int", "bigint")
    decimal = isinstance(vt, DecimalType)
    offsets, acc, cnt_acc = {}, Decimal(0) if decimal else 0, 0
    for pid, t, c in totals:
        offsets[pid] = (
            int(acc) if integral else (acc if decimal else float(acc)),
            cnt_acc,
        )
        acc += t or 0  # SUM of an all-NULL partition is NULL → adds 0
        cnt_acc += c
    off_type = (
        "LONG" if integral else f"DECIMAL(38,{vt.scale})" if decimal else "DOUBLE"
    )
    off_df = F.broadcast(
        sess.createDataFrame(
            [(pid, off, cnt) for pid, (off, cnt) in offsets.items()],
            f"__gw_pid INT, __gw_off {off_type}, __gw_offcnt LONG",
        )
    )
    out = F.when(
        # zero non-null values in the whole global prefix → NULL, the
        # SQL window semantic; otherwise a NULL local prefix
        # contributes 0 on top of the preceding partitions' total
        (F.col("__gw_offcnt") + F.col("__gw_lcnt")) == 0,
        F.lit(None),
    ).otherwise(F.col("__gw_off") + F.coalesce(F.col("__gw_lcum"), F.lit(0)))
    if integral:
        out = out.cast("long")
    elif decimal:
        out = out.cast(f"decimal(38,{vt.scale})")
    else:
        out = out.cast("double")
    return (
        local.join(off_df, "__gw_pid")
        .withColumn(out_col, out)
        .drop(
            "__gw_pid", "__gw_v", "__gw_lcum", "__gw_lcnt",
            "__gw_off", "__gw_offcnt",
        )
    )


def range_frame_sum(
    df: DataFrame,
    key_col: str,
    val: Column,
    preceding: int,
    out_col: str = "frame_sum",
    keys_unique: bool = False,
) -> DataFrame:
    """``SUM(val) OVER (ORDER BY key RANGE BETWEEN p PRECEDING AND
    CURRENT ROW)`` as a bounded block join (one output row per distinct
    key; RANGE-frame peers share a sum by definition).

    Rows bucket into blocks of width ``preceding``; a frame
    ``[k-p, k]`` spans at most 2 consecutive blocks, so each row is
    emitted as a contributor to its own and the following block and the
    frame sum is an equi-join on block + a range filter + a groupBy —
    per-row work bounded by 2 blocks' density, all shuffles hash-keyed.

    NULL keys form their own peer group, as in the native RANGE window
    (their frame is exactly the NULL peers), handled as a separate
    keyed aggregate unioned in — the block join's NULL arithmetic would
    otherwise silently drop those rows.
    """
    if preceding <= 0:
        raise ValueError(
            f"preceding must be > 0 (it is the block width); got {preceding}"
        )
    k = F.col(key_col)

    kt = df.schema[key_col].dataType.simpleString()
    if kt in ("tinyint", "smallint", "int", "bigint"):
        # INTEGER floor division, not F.floor(k / p): Spark's Divide
        # casts both sides to double, and for keys beyond ~2^53 the
        # rounded quotient lands rows in the wrong block — a frame
        # contributor emitted to blocks {b, b+1} never joins its
        # target's block and is SILENTLY dropped from the sum
        # (Snowflake-style 64-bit ids hit this everywhere). `div`
        # truncates toward zero, so floor = tdiv - 1 exactly when the
        # operands have opposite signs and the remainder is non-zero.
        def _block() -> Column:
            tdiv = F.expr(f"`{key_col}` div {preceding}")
            return tdiv - F.when(
                ((k % preceding) != 0) & (k < 0), 1
            ).otherwise(0)

    else:

        def _block() -> Column:
            return F.floor(k / preceding)

    nn = df.filter(k.isNotNull())
    contrib = nn.select(
        k.alias("__gw_ck"),
        val.alias("__gw_cv"),
        _block().alias("__gw_blk"),
    )
    contrib = contrib.select(
        "__gw_ck",
        "__gw_cv",
        F.explode(
            F.array(F.col("__gw_blk"), F.col("__gw_blk") + 1)
        ).alias("__gw_blk"),
    )
    # keys_unique skips the distinct (a full extra exchange + dedup agg)
    # when the caller guarantees one row per key — e.g. a primary key
    rows = nn.select(k.alias(key_col))
    if not keys_unique:
        rows = rows.distinct()
    rows = rows.withColumn("__gw_blk", _block())
    result = (
        rows.join(contrib, "__gw_blk")
        .filter(
            (F.col("__gw_ck") >= F.col(key_col) - preceding)
            & (F.col("__gw_ck") <= F.col(key_col))
        )
        .groupBy(key_col)
        .agg(F.sum("__gw_cv").alias(out_col))
    )
    # NULL peer group: one row, sum over the NULL-key rows only
    null_rows = (
        df.filter(k.isNull())
        .groupBy(k.alias(key_col))
        .agg(F.sum(val).alias(out_col))
    )
    return result.unionByName(null_rows)
