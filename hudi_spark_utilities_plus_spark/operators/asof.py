"""As-of (nearest-prior) join — the time-series join Spark lacks.

Reference parity: the reference engine has no as-of operator either; this
is one of the pipeline extensions (time-aligned feature lookup, "latest
dimension state at event time", trade/quote alignment) the brief calls
for. Directions match pandas ``merge_asof``: ``backward`` (default —
DuckDB ``ASOF LEFT JOIN`` semantics for non-NULL timestamps: for each
left row, the right row with the greatest ``right_ts`` ≤ ``left_ts``
within the same key), ``forward`` (smallest ``right_ts`` ≥
``left_ts``), and ``nearest`` (smaller absolute gap; equal gaps
resolve backward), or NULLs when no candidate exists.

NULL policy — SQL-predicate semantics, a DELIBERATE divergence from
DuckDB: a NULL probe timestamp (or NULL key, either side) matches
NOTHING, exactly as the predicate ``l.ts >= r.ts AND l.k = r.k``
evaluates. DuckDB 1.0.0's sort-based ASOF instead treats NULL ts as +∞
on BOTH sides (a NULL-ts probe matches the key's LATEST right row; a
NULL-ts right row is that latest). For a training-data pipeline the
predicate reading is the safe one — a record with an unknown event time
silently picking up the newest dimension state is a correctness hazard,
not a feature. The differential test
(tests/test_properties.py::test_asof_join_matches_duckdb) oracles the
predicate semantics directly.

100 TB design — the MERGE shape, not the range-join shape:
``left ⋈ right ON key AND r.ts <= l.ts`` + argmax is a candidate
explosion (every left row pairs with its whole right history — O(|L|·|R|)
per key). Instead both sides are UNIONED and sorted once per key: a
single hash shuffle on the join key, then one linear window pass where
each left row picks up the running "last right payload seen". Cost is
O((|L|+|R|) log per-partition) with no pair materialization at all —
the distributed equivalent of the classic sorted-merge as-of algorithm.

Skewed keys (one user with millions of events) are AQE's skew-split
problem for the sort; the window itself is a linear scan. A ``tolerance``
bound nulls out matches older than ``left_ts - tolerance`` AFTER the
merge — it does not change the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
    *,
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join with pandas ``merge_asof`` direction parity —
    ``backward`` (default; DuckDB ``ASOF LEFT JOIN`` parity on non-NULL
    keys/timestamps), ``forward``, or ``nearest``. NULL matches nothing
    (module note).

    Every column of ``left`` is kept; every non-key column of ``right``
    comes back NULL-filled when no candidate exists for the key —
    backward: greatest ``right_ts <= left_ts``; forward: smallest
    ``right_ts >= left_ts``; nearest: smaller absolute gap, EQUAL gaps
    resolve backward (pinned against pandas 2.2 merge_asof; both bounds
    inclusive). The tolerance, when given, nulls candidates farther
    than it in the match direction — SECONDS on temporal columns, the
    column's OWN UNITS on numeric event times (pandas convention; the
    engine cannot know whether a BIGINT is seconds or micros). Because
    the unit is dtype-dependent, ``tolerance`` is the preferred spelling
    for numeric event times; ``tolerance_seconds`` remains as the
    back-compatible alias (they are the same parameter — passing both
    raises). ``left_ts`` and ``right_ts`` must resolve to the SAME data
    type: the internal union would otherwise coerce one side, silently
    changing which tolerance-unit branch applies — cast explicitly
    first. A left row with a NULL ``on`` key or NULL ``left_ts`` is
    kept with NULL right columns.

    Determinism: if ``right`` has several rows at the same (key, ts),
    the one with the greatest remaining-column tuple wins in EVERY
    direction (the union is ordered by the full payload struct).
    Pre-aggregate the right side to unique (key, ts) when a specific
    tie policy is needed.

    Plan shape: backward is one hash shuffle on the key + one window
    pass. forward is the mirror sort. nearest runs BOTH window passes
    over the SAME exchange — Catalyst plans one hash partitioning and
    two in-partition sorts, still no pair materialization.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tolerance is not None:
        if tolerance_seconds is not None:
            raise ValueError(
                "pass tolerance OR tolerance_seconds, not both — they "
                "are the same parameter (tolerance_seconds is the "
                "back-compatible alias)"
            )
        tolerance_seconds = tolerance
    lt_type = left.schema[left_ts].dataType
    rt_type = right.schema[right_ts].dataType
    if lt_type != rt_type:
        raise TypeError(
            f"left_ts {left_ts!r} ({lt_type.simpleString()}) and "
            f"right_ts {right_ts!r} ({rt_type.simpleString()}) must "
            "resolve to the same data type: the as-of merge unions both "
            "timestamp columns, and the union's implicit coercion would "
            "silently decide which tolerance-unit branch (interval "
            "seconds vs column units) applies — cast one side "
            "explicitly first"
        )
    # composite keys (pandas merge_asof ``by=[...]`` parity): every key
    # column shuffles/partitions together; a NULL in ANY key column
    # matches nothing (conjunctive SQL equality)
    keys = [on] if isinstance(on, str) else list(on)
    r_payload = [c for c in right.columns if c not in keys]
    # a NULL right_ts can never satisfy right_ts <= left_ts, and a NULL
    # right KEY can never equal any left key (SQL equality — DuckDB ASOF
    # parity). Without the filters NULL-ts rows sort first in the window
    # and F.last hands them to left rows with no real prior match, and —
    # worse — partitionBy groups the NULL keys of BOTH sides into one
    # partition, silently matching NULL-key left rows to NULL-key right
    # rows where the SQL join predicate matches nothing.
    keys_ok = F.col(right_ts).isNotNull()
    for k in keys:
        keys_ok = keys_ok & F.col(k).isNotNull()
    right = right.filter(keys_ok)
    key_cols = [F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)]
    part_cols = [f"_k{i}" for i in range(len(keys))]
    l_side = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(
            right.select(F.struct(*r_payload).alias("s")).schema["s"].dataType
        ).alias("_pay"),
        F.struct(*left.columns).alias("_lrow"),
    )
    r_side = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.struct(*r_payload).alias("_pay"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
    )
    u = l_side.unionByName(r_side)
    # dtype dispatch, pandas merge_asof precedent: temporal columns
    # take the tolerance as SECONDS (interval arithmetic); numeric
    # event-time columns (epoch longs, sequence numbers) take it in
    # the COLUMN'S OWN UNITS — the engine cannot know whether a
    # BIGINT is seconds, millis, or micros, and BIGINT - INTERVAL
    # is an AnalysisException anyway (DATATYPE_MISMATCH).
    ts_type = u.schema["_ts"].dataType.typeName()

    def _delta(amount: int):
        if ts_type in ("timestamp", "timestamp_ntz", "date"):
            return F.expr(f"INTERVAL {int(amount)} SECOND")
        return F.lit(amount)

    # backward: right rows sort BEFORE left rows at equal ts (inclusive
    # bound); among equal-ts right rows the payload struct orders them
    # so "last" is deterministic (greatest payload wins). NULL left ts
    # sorts FIRST (asc default) — no preceding right row, no match.
    w_back = (
        Window.partitionBy(*part_cols)
        .orderBy("_ts", "_is_left", "_pay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward mirror: LEFT rows sort before right rows at equal ts
    # (inclusive bound the other way); _pay desc so "first" is the
    # greatest payload — the same tie convention as backward. NULL left
    # ts sorts LAST — nothing follows it but other NULL-ts left rows
    # (NULL right ts is filtered above), so no match.
    w_fwd = (
        Window.partitionBy(*part_cols)
        .orderBy(
            F.col("_ts").asc_nulls_last(),
            F.col("_is_left").desc(),
            F.col("_pay").desc(),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def _bounded(match, *, is_back: bool):
        """Null the match beyond the tolerance, direction-sensitively."""
        if tolerance_seconds is None:
            return match
        if is_back:
            ok = match[right_ts] >= F.col("_ts") - _delta(tolerance_seconds)
        else:
            ok = match[right_ts] <= F.col("_ts") + _delta(tolerance_seconds)
        return F.when(ok, match)

    if direction == "backward":
        u = u.withColumn("_b", F.last("_pay", ignorenulls=True).over(w_back))
        match = _bounded(F.col("_b"), is_back=True)
    elif direction == "forward":
        u = u.withColumn("_f", F.first("_pay", ignorenulls=True).over(w_fwd))
        match = _bounded(F.col("_f"), is_back=False)
    else:  # nearest — both passes over the same exchange, pick closer
        u = u.withColumn(
            "_b", F.last("_pay", ignorenulls=True).over(w_back)
        ).withColumn("_f", F.first("_pay", ignorenulls=True).over(w_fwd))
        b = _bounded(F.col("_b"), is_back=True)
        f = _bounded(F.col("_f"), is_back=False)
        # equal gaps resolve BACKWARD (<=) — the pandas tie rule
        match = (
            F.when(f.isNull(), b)
            .when(b.isNull(), f)
            .when(
                (F.col("_ts") - b[right_ts]) <= (f[right_ts] - F.col("_ts")),
                b,
            )
            .otherwise(f)
        )
    merged = u.filter(F.col("_is_left") == 1).withColumn("_match", match)
    out = merged.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_match")[c].alias(c) for c in r_payload],
    )
    return out
