"""Named query registry — the correctness surface of the engine.

Every operator class from SURVEY.md §2 (first-party A1-A18, delegated SQL
B1-B25, streaming C, and the LLM-pipeline extensions) is represented by a
named query: a ``fn(spark, sf_dir) -> DataFrame`` plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string the driver
hash-compares against at sf0.01.

Conventions:
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before hashing);
- money/double aggregates use the exact-decimal pattern
  ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`` (helper ``dsum``):
  each addend is snapped to an exact decimal, summed exactly (order
  independent), and emitted as a bit-identical double in both engines —
  no float-association or rounding-mode mismatch can flip the hash;
- all plans are shuffle-bounded DataFrame transforms — nothing collects
  to the driver; joins against dimension tables are broadcast.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_tables
from .operators.flatten import flatten
from .operators.transform import transform

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register ``fn`` under ``name`` with an optional DuckDB oracle."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark, sf_dir, *names):
    return load_tables(spark, sf_dir, list(names), register=False)


def dsum(col, scale: int = 2):
    """Order-independent money sum: round each addend to an exact DECIMAL,
    sum exactly (no float association), emit DOUBLE. Bit-identical across
    engines and partition counts — the registry's convention for every
    aggregate the oracle hash-compares. Oracle mirror:
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# B1-B3: scan / project / filter
# ---------------------------------------------------------------------------


@query(
    "scan_parquet",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_parquet(spark, sf_dir):
    """B1: lake-table scan (Hudi base files are parquet)."""
    return _t(spark, sf_dir, "nation")["nation"]


@query(
    "project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def project_expr(spark, sf_dir):
    """B2: projection with expressions + aliasing."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "filter_eq",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def filter_eq(spark, sf_dir):
    """B3: equality predicate (HoodieBatchTest.scala:21 shape)."""
    c = _t(spark, sf_dir, "customer")["customer"]
    return c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_in(spark, sf_dir):
    """B3: IN-list predicate (mysql-hudi-import.properties:7 shape)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


@query(
    "filter_null",
    oracle="""
    SELECT event_id, NULLIF(event_type, 'click') AS et
    FROM events WHERE NULLIF(event_type, 'click') IS NULL
    """,
)
def filter_null(spark, sf_dir):
    """B3: null predicate over a derived nullable column."""
    e = _t(spark, sf_dir, "events")["events"]
    et = F.nullif(F.col("event_type"), F.lit("click"))
    return e.select("event_id", et.alias("et")).filter(F.col("et").isNull())


# ---------------------------------------------------------------------------
# B4-B8: joins
# ---------------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner(spark, sf_dir):
    """B4: the flagship — revenue by market segment (lineitem⋈orders⋈customer).

    Scale: both joins are on the natural hash keys; customer is broadcast
    relative to lineitem at typical scale ratios, AQE picks the strategy.
    """
    t = _t(spark, sf_dir, "lineitem", "orders", "customer")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left(spark, sf_dir):
    """B5: left outer join, null-extending, with aggregates over the gap."""
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("double")
            .alias("spend"),
        )
    )


@query(
    "join_right",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_right(spark, sf_dir):
    """B5: right outer join — the preserved side is on the right, orders
    null-extend for customers with no orders (reference basis: the
    delegated SQL surface accepts any join type, TransformUtils.scala:37).

    Scale: same shuffle as the left-join mirror — Spark plans RIGHT
    OUTER as a build-side flip of the same hash/sort-merge join, so no
    extra exchange vs join_left."""
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"), "right")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("double")
            .alias("spend"),
        )
    )


@query(
    "join_full",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full(spark, sf_dir):
    """B5: full outer join of per-nation customer vs supplier counts."""
    t = _t(spark, sf_dir, "customer", "supplier")
    c = t["customer"].groupBy(F.col("c_nationkey").alias("c_nk")).agg(
        F.count("*").alias("n_customers")
    )
    s = t["supplier"].groupBy(F.col("s_nationkey").alias("s_nk")).agg(
        F.count("*").alias("n_suppliers")
    )
    return c.join(s, F.col("c_nk") == F.col("s_nk"), "full").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def join_semi(spark, sf_dir):
    """B6: left semi join (EXISTS)."""
    t = _t(spark, sf_dir, "customer", "orders")
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti(spark, sf_dir):
    """B6: left anti join (NOT EXISTS)."""
    t = _t(spark, sf_dir, "customer", "orders")
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT a.r_name AS a_name, b.r_name AS b_name
    FROM region a CROSS JOIN region b
    """,
)
def join_cross(spark, sf_dir):
    """B7: cartesian product (flatten's documented multi-array case)."""
    r = _t(spark, sf_dir, "region")["region"]
    return r.select(F.col("r_name").alias("a_name")).crossJoin(
        r.select(F.col("r_name").alias("b_name"))
    )


@query(
    "join_range",
    oracle="""
    SELECT a.event_id AS purchase_id, b.event_id AS view_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts < a.ts
     AND b.ts >= a.ts - INTERVAL 1 HOUR
    WHERE a.event_type = 'purchase' AND b.event_type = 'view'
    """,
)
def join_range(spark, sf_dir):
    """B7: equi + range (theta) join — views within 1h before a purchase.

    Scale: the equi part (user_id) hash-partitions; the range predicate is
    a post-join filter, so this never degrades to a nested-loop join.
    """
    e = _t(spark, sf_dir, "events")["events"]
    a = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("a_uid"),
        F.col("ts").alias("a_ts"),
    )
    b = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("b_uid"),
        F.col("ts").alias("b_ts"),
    )
    return a.join(
        b,
        (F.col("a_uid") == F.col("b_uid"))
        & (F.col("b_ts") < F.col("a_ts"))
        & (F.col("b_ts") >= F.col("a_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "view_id")


@query(
    "join_broadcast",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_broadcast(spark, sf_dir):
    """B8: explicit broadcast of the small dimension (25-row nation) —
    at 100 TB the fact side never shuffles for this join."""
    t = _t(spark, sf_dir, "customer", "nation")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            (dsum("c_acctbal") / F.count("*")).alias("avg_bal"),
        )
    )


# ---------------------------------------------------------------------------
# B9-B11: aggregation
# ---------------------------------------------------------------------------


@query(
    "agg_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group(spark, sf_dir):
    """B9: TPC-H Q1-shaped grouped aggregation (partial+final hash agg)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price, 4).alias("sum_disc_price"),
        dsum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
        (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
        (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
        (dsum("l_discount") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark, sf_dir):
    """B10: exact count-distinct (expand + two-phase agg in Spark)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """B10: approx_count_distinct (HyperLogLog++) — the 100 TB-scale path
    for distinct cardinality. The raw HLL estimate is engine-specific
    (DuckDB's approx differs), so the checkable output is the invariant
    part: group keys, the exact distinct count, and ``approx_ok`` —
    whether the HLL estimate landed within 5× the requested rsd (0.02 →
    10%) of the exact count. If HLL ever regresses badly the flag flips
    false and the driver hash catches it."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
    ).select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.col("exact_parts") * F.lit(0.10)
        ).alias("approx_ok"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark, sf_dir):
    """B11: rollup (multi-level aggregates with NULL grouping markers)."""
    t = _t(spark, sf_dir, "customer", "nation", "region")
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal").alias("total_bal"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """B11: cube."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# B12-B13: window functions
# ---------------------------------------------------------------------------


@query(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, rnk FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             RANK() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer) WHERE rnk <= 3
    """,
)
def win_rank(spark, sf_dir):
    """B12: ranking window — top-3 customers per nation by balance."""
    c = _t(spark, sf_dir, "customer")["customer"]
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select("c_custkey", "c_nationkey", "c_acctbal", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "dedup_latest_wins",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def dedup_latest_wins(spark, sf_dir):
    """B12 + §1.2: the Hudi precombine merge — latest row per record key.
    This window-dedup IS the upsert core (lake.merge_latest_wins)."""
    e = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@query(
    "win_lag",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
    FROM events
    """,
)
def win_lag(spark, sf_dir):
    """B13: analytic window (lag) — exact pass-through values."""
    e = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", "value", F.lag("value").over(w).alias("prev_value")
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM events
    """,
)
def win_running_sum(spark, sf_dir):
    """B13: frame-bounded running sum."""
    e = _t(spark, sf_dir, "events")["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


# ---------------------------------------------------------------------------
# B14-B15: sort/limit, set ops
# ---------------------------------------------------------------------------


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_limit_topk(spark, sf_dir):
    """B14: ORDER BY + LIMIT — Spark plans TakeOrderedAndProject (no full
    sort shuffle; each partition top-10s then the driver merges 10×P rows)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "set_union",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
    """,
)
def set_union(spark, sf_dir):
    """B15: UNION (distinct)."""
    t = _t(spark, sf_dir, "customer", "orders")
    a = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = t["orders"].filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@query(
    "set_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT c_nationkey AS nationkey FROM customer
    """,
)
def set_except(spark, sf_dir):
    """B15: EXCEPT (distinct) — nations with no customers."""
    t = _t(spark, sf_dir, "nation", "customer")
    return (
        t["nation"].select(F.col("n_nationkey").alias("nationkey"))
        .subtract(t["customer"].select(F.col("c_nationkey").alias("nationkey")))
    )


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    """B15: INTERSECT (distinct) — nations with both customers and suppliers."""
    t = _t(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


# ---------------------------------------------------------------------------
# B16-B23: scalar function families
# ---------------------------------------------------------------------------


@query(
    "str_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS uname,
           LOWER(c_mktsegment) AS lseg,
           SUBSTRING(c_name, 1, 8) AS prefix,
           LENGTH(c_name) AS name_len,
           CONCAT(c_mktsegment, '-', CAST(c_custkey AS VARCHAR)) AS tag,
           REPLACE(c_name, 'Customer#', 'C#') AS short_name,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits
    FROM customer
    """,
)
def str_funcs(spark, sf_dir):
    """B16: string function family."""
    c = _t(spark, sf_dir, "customer")["customer"]
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(
            F.col("c_mktsegment"), F.lit("-"), F.col("c_custkey").cast("string")
        ).alias("tag"),
        F.regexp_replace("c_name", "Customer#", "C#").alias("short_name"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate) AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mo,
           EXTRACT(DAY FROM o_orderdate) AS dy,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date
    FROM orders
    """,
)
def date_funcs(spark, sf_dir):
    """B17: date/time function family."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


@query(
    "derive_partition_dt",
    oracle="""
    SELECT event_id,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), '1970-01-01') AS dt
    FROM events
    """,
)
def derive_partition_dt(spark, sf_dir):
    """B17/A: the reference's partition-derivation transform —
    ``nvl(cast(to_date(create_date_time) as string),'1970-01-01') as dt``
    (HoodieBinlogDeltaTransformationSuite.scala:39-40)."""
    e = _t(spark, sf_dir, "events")["events"]
    return e.select(
        "event_id",
        F.coalesce(
            F.to_date("ts").cast("string"), F.lit("1970-01-01")
        ).alias("dt"),
    )


@query(
    "null_funcs",
    oracle="""
    SELECT event_id,
           COALESCE(NULLIF(event_type, 'view'), 'filtered') AS et,
           CASE WHEN value > 100 THEN 'high'
                WHEN value > 10 THEN 'mid'
                ELSE 'low' END AS bucket
    FROM events
    """,
)
def null_funcs(spark, sf_dir):
    """B18: nvl/coalesce/nullif/CASE WHEN."""
    e = _t(spark, sf_dir, "events")["events"]
    return e.select(
        "event_id",
        F.coalesce(
            F.nullif(F.col("event_type"), F.lit("view")), F.lit("filtered")
        ).alias("et"),
        F.when(F.col("value") > 100, "high")
        .when(F.col("value") > 10, "mid")
        .otherwise("low")
        .alias("bucket"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_d,
           CAST(FLOOR(l_quantity) AS BIGINT) AS floor_q,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_p,
           l_orderkey % 7 AS key_mod,
           FLOOR(SQRT(l_extendedprice) * 1000000 + 0.5) / 1000000 AS sqrt_p
    FROM lineitem
    """,
)
def math_funcs(spark, sf_dir):
    """B19: math/numeric family."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.floor("l_quantity").alias("floor_q"),
        F.ceil("l_extendedprice").alias("ceil_p"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        (F.floor(F.sqrt("l_extendedprice") * 1000000 + 0.5) / 1000000).alias(
            "sqrt_p"
        ),
    )


@query(
    "cast_types",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_big,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(CAST(l_quantity AS DECIMAL(12, 2)) AS DOUBLE) AS qty_dec
    FROM lineitem
    """,
)
def cast_types(spark, sf_dir):
    """B20: casts / schema coercion (JDBC customSchema analogue).

    The decimal cast stays under test, but the comparison column is
    emitted as DOUBLE (registry ``dsum`` convention): raw DECIMAL output
    normalizes differently between Spark and the driver's DuckDB hash
    (Decimal('23.00') vs 23.0), so a bit-exact DECIMAL column is not
    comparison-safe across engines.
    """
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("l_quantity").cast("decimal(12,2)").cast("double").alias("qty_dec"),
    )


@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           embedding[1] AS first_val,
           embedding[64] AS last_val,
           LIST_CONTAINS(embedding, 0.0) AS has_zero
    FROM embeddings
    """,
)
def array_funcs(spark, sf_dir):
    """B21: array function family over the embedding column."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", 64).alias("last_val"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
    )


@query(
    "struct_access",
    oracle="""
    SELECT event_id, event_type AS meta_type, user_id AS meta_who_uid
    FROM events
    """,
)
def struct_access(spark, sf_dir):
    """B22 + A2: build a nested struct, then access via flatten's
    promotion (parent_child rename, TransformUtils.scala:69)."""
    e = _t(spark, sf_dir, "events")["events"]
    nested = e.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("type"),
            F.struct(F.col("user_id").alias("uid")).alias("who"),
        ).alias("meta"),
    )
    return flatten(nested)


@query(
    "json_funcs",
    oracle="""
    SELECT event_id,
           props ->> '$.k' AS k_str,
           CAST(props ->> '$.k' AS INTEGER) AS k_int
    FROM events
    """,
)
def json_funcs(spark, sf_dir):
    """B23: JSON extraction from the string props column."""
    e = _t(spark, sf_dir, "events")["events"]
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    )


# ---------------------------------------------------------------------------
# B24: subqueries / CTE
# ---------------------------------------------------------------------------


@query(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    """,
)
def subquery_in(spark, sf_dir):
    """B24: IN-subquery (decorrelated to a semi join by Catalyst)."""
    load_tables(spark, sf_dir, ["orders", "customer"], register=True)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        """
    )


@query(
    "cte",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
    )
    SELECT n, COUNT(*) AS n_customers FROM per_cust GROUP BY n
    """,
)
def cte(spark, sf_dir):
    """B24: WITH / common table expression."""
    load_tables(spark, sf_dir, ["orders"], register=True)
    return spark.sql(
        """
        WITH per_cust AS (
          SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
        )
        SELECT n, COUNT(*) AS n_customers FROM per_cust GROUP BY n
        """
    )


# ---------------------------------------------------------------------------
# A1/A2: first-party transform + flatten
# ---------------------------------------------------------------------------


@query(
    "transform_sql",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def transform_sql(spark, sf_dir):
    """A1: the <SRC> SQL-template transform (TransformUtils.scala:26-38)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return transform(
        spark,
        li,
        "SELECT l_returnflag, COUNT(*) AS cnt, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty "
        "FROM <SRC> GROUP BY l_returnflag",
    )


@query(
    "flatten_struct",
    oracle="""
    SELECT event_id,
           CAST(props ->> '$.k' AS INTEGER) AS p_k,
           event_type AS meta_type,
           user_id AS meta_who_uid
    FROM events
    """,
)
def flatten_struct(spark, sf_dir):
    """A2 (struct case): parse props JSON to a struct + build a nested
    struct, flatten both — children promoted with parent_child names."""
    e = _t(spark, sf_dir, "events")["events"]
    nested = e.select(
        "event_id",
        F.from_json("props", "k INT").alias("p"),
        F.struct(
            F.col("event_type").alias("type"),
            F.struct(F.col("user_id").alias("uid")).alias("who"),
        ).alias("meta"),
    )
    return flatten(nested)


@query(
    "flatten_array_struct",
    oracle="""
    SELECT l_orderkey, l_linenumber, u.kind AS charges_kind, u.v AS charges_v
    FROM lineitem,
         UNNEST([{'kind': 'base', 'v': l_extendedprice},
                 {'kind': 'tax',  'v': l_extendedprice * l_tax}]) AS t(u)
    """,
)
def flatten_array_struct(spark, sf_dir):
    """A2 (array-of-struct case): explode_outer one row per element
    (TransformUtils.scala:56-64; MongoDB Ingestion doc worked example)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    nested = li.select(
        "l_orderkey",
        "l_linenumber",
        F.array(
            F.struct(
                F.lit("base").alias("kind"), F.col("l_extendedprice").alias("v")
            ),
            F.struct(
                F.lit("tax").alias("kind"),
                (F.col("l_extendedprice") * F.col("l_tax")).alias("v"),
            ),
        ).alias("charges"),
    )
    return flatten(nested)


@query(
    "flatten_cartesian",
    oracle="""
    SELECT o_orderkey, u1.s AS statuses_s, u2.p AS prios_p
    FROM orders,
         UNNEST([{'s': o_orderstatus}, {'s': 'X'}]) AS t1(u1),
         UNNEST([{'p': o_orderpriority}, {'p': 'NONE'}]) AS t2(u2)
    """,
)
def flatten_cartesian(spark, sf_dir):
    """A2: two array-of-struct columns ⇒ documented cartesian product
    (docs/document/01.MongoDB Ingestion.md:134-147)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    nested = o.select(
        "o_orderkey",
        F.array(
            F.struct(F.col("o_orderstatus").alias("s")),
            F.struct(F.lit("X").alias("s")),
        ).alias("statuses"),
        F.array(
            F.struct(F.col("o_orderpriority").alias("p")),
            F.struct(F.lit("NONE").alias("p")),
        ).alias("prios"),
    )
    return flatten(nested)


# ---------------------------------------------------------------------------
# §1.2 lake semantics + streaming-equivalent batch queries
# ---------------------------------------------------------------------------


@query(
    "hudi_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
             o_orderdate + INTERVAL 1 DAY AS o_orderdate, 1 AS src
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    base AS (
      SELECT o_orderkey, o_totalprice, o_orderdate, 0 AS src FROM orders
    ),
    merged AS (SELECT * FROM base UNION ALL SELECT * FROM updates)
    SELECT o_orderkey, o_totalprice, o_orderdate FROM merged
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey
                               ORDER BY o_orderdate DESC, src DESC) = 1
    """,
)
def hudi_upsert(spark, sf_dir):
    """§1.2: Hudi upsert semantics — recordkey=o_orderkey,
    precombine=o_orderdate, incoming beats existing on ties. Same
    window-dedup plan lake.HudiTable.upsert executes against storage."""
    from .lake import merge_latest_wins

    o = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    base = o.withColumn("src", F.lit(0))
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
        .withColumn("src", F.lit(1))
    )
    merged = base.unionByName(updates)
    return merge_latest_wins(
        merged, "o_orderkey", "o_orderdate", tiebreak="src"
    ).drop("src")


@query(
    "hudi_mor_read",
    oracle="""
    WITH updated AS (
      SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
             o_orderdate + INTERVAL 1 DAY AS o_orderdate
      FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT o.o_orderkey,
           COALESCE(u.o_totalprice, o.o_totalprice) AS o_totalprice,
           COALESCE(u.o_orderdate, o.o_orderdate) AS o_orderdate
    FROM orders o LEFT JOIN updated u USING (o_orderkey)
    WHERE o.o_orderkey % 20 <> 0
    """,
)
def hudi_mor_read(spark, sf_dir):
    """§1.2 MERGE_ON_READ end-to-end against real storage: bulk_insert
    base → log-appended upsert (keys %10) → unconditional delete (keys
    %20) → merge-on-read. Exercises lake.HudiTable's delta-log write
    path and read-side merge (the COW sibling is hudi_upsert)."""
    import tempfile

    from .lake import HudiTable

    o = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    t = HudiTable(
        path=tempfile.mkdtemp(prefix="mor_q_") + "/t",
        record_key="o_orderkey",
        precombine="o_orderdate",
        table_type="MERGE_ON_READ",
    )
    t.bulk_insert(o)
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
    )
    t.upsert(updates, spark)
    t.delete(o.filter(F.col("o_orderkey") % 20 == 0).select("o_orderkey"), spark)
    return t.read(spark)


@query(
    "hudi_mor_ro_read",
    oracle="SELECT o_orderkey, o_totalprice, o_orderdate FROM orders",
)
def hudi_mor_ro_read(spark, sf_dir):
    """§1.2 MOR read_optimized query type, driver-provable: after the
    same upsert + delete log commits as hudi_mor_read, a read-optimized
    read must return ONLY the compacted base — the original bulk_insert
    state, pending log commits invisible (Hudi's
    ``hoodie.datasource.query.type=read_optimized``; no merge shuffle)."""
    import tempfile

    from .lake import HudiTable

    o = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    t = HudiTable(
        path=tempfile.mkdtemp(prefix="ro_q_") + "/t",
        record_key="o_orderkey",
        precombine="o_orderdate",
        table_type="MERGE_ON_READ",
    )
    t.bulk_insert(o)
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
    )
    t.upsert(updates, spark)
    t.delete(o.filter(F.col("o_orderkey") % 20 == 0).select("o_orderkey"), spark)
    return t.read(spark, mode="read_optimized")


@query(
    "hudi_time_travel",
    oracle="""
    WITH updated AS (
      SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
             o_orderdate + INTERVAL 1 DAY AS o_orderdate
      FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT o.o_orderkey,
           COALESCE(u.o_totalprice, o.o_totalprice) AS o_totalprice,
           COALESCE(u.o_orderdate, o.o_orderdate) AS o_orderdate
    FROM orders o LEFT JOIN updated u USING (o_orderkey)
    """,
)
def hudi_time_travel(spark, sf_dir):
    """§1.2 time travel (Hudi ``as.of.instant``): same MOR write
    sequence as hudi_mor_read (bulk_insert → upsert keys %10 → delete
    keys %20), but read AS OF the upsert commit — the later delete must
    be invisible, so the oracle is the updated table with every key
    still present. The as-of merge ignores younger log entries; cost is
    the same single key-shuffle as the snapshot read."""
    import tempfile

    from .lake import HudiTable

    o = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    t = HudiTable(
        path=tempfile.mkdtemp(prefix="tt_q_") + "/t",
        record_key="o_orderkey",
        precombine="o_orderdate",
        table_type="MERGE_ON_READ",
    )
    t.bulk_insert(o)
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
    )
    t.upsert(updates, spark)
    upsert_seq = t.latest_commit_seq(spark)
    t.delete(o.filter(F.col("o_orderkey") % 20 == 0).select("o_orderkey"), spark)
    return t.read(spark, as_of_seq=upsert_seq)


@query(
    "hudi_incremental_read",
    oracle="""
    SELECT o_orderkey,
           o_totalprice * 2 AS o_totalprice,
           o_orderdate + INTERVAL 1 DAY AS o_orderdate
    FROM orders
    WHERE o_orderkey % 10 = 0 AND o_orderkey % 20 <> 0
    """,
)
def hudi_incremental_read(spark, sf_dir):
    """§1.2 Hudi's third MOR query type (incremental pull): same write
    sequence as hudi_time_travel (bulk_insert → upsert keys %10 with
    doubled price / +1 day → delete keys %20), then read the CHANGES
    since the bulk load. The pull returns the current snapshot rows of
    every key touched after the cursor; keys whose net effect is
    deletion vanish — so exactly the updated-but-not-deleted keys, with
    their post-upsert values (the oracle). Cost tracks the delta (a
    seq-pruned log scan + key semi-join), not the table — the CDC-export
    shape downstream consumers poll at 100 TB."""
    import tempfile

    from .lake import HudiTable

    o = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    t = HudiTable(
        path=tempfile.mkdtemp(prefix="inc_q_") + "/t",
        record_key="o_orderkey",
        precombine="o_orderdate",
        table_type="MERGE_ON_READ",
    )
    t.bulk_insert(o)
    cursor = t.latest_commit_seq(spark)  # pre-change cursor
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
    )
    t.upsert(updates, spark)
    t.delete(o.filter(F.col("o_orderkey") % 20 == 0).select("o_orderkey"), spark)
    return t.read_incremental(spark, cursor)


@query(
    "hudi_hive_sync_read",
    oracle="""
    WITH updated AS (
      SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
             o_orderdate + INTERVAL 1 DAY AS o_orderdate
      FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT o.o_orderkey,
           COALESCE(u.o_totalprice, o.o_totalprice) AS o_totalprice,
           COALESCE(u.o_orderdate, o.o_orderdate) AS o_orderdate
    FROM orders o LEFT JOIN updated u USING (o_orderkey)
    """,
)
def hudi_hive_sync_read(spark, sf_dir):
    """Hive-sync driver-provable end to end (``hoodie.datasource.
    hive_sync.*``, hudi_mongodb_batch.properties:22-29): a MOR table
    written with sync enabled, read back BY CATALOG NAME. Exercises the
    full HiveSyncTool-analogue state machine (lake._maybe_sync_catalog):
    bulk_insert registers ``<db>.<tbl>`` and ``<db>.<tbl>_ro``; the
    upsert's pending log commit withholds the snapshot name (a by-name
    query must not silently serve stale base data) while ``_ro`` stays
    valid; compact() restores the snapshot name, whose catalog read is
    the returned (and oracle-checked) merged result."""
    import tempfile
    import uuid

    from .lake import HudiTable

    o = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    # own database (not the tests' data_import): a shared db would break
    # any other owner's non-cascade DROP DATABASE. Unique table name per
    # invocation because the returned frame reads by catalog name
    # LAZILY — which is also why there is no cleanup of earlier
    # invocations' tables here: a caller may still hold (and re-collect)
    # a prior returned frame, and dropping its table would break that
    # re-evaluation. The leak is two catalog entries per invocation,
    # bounded by the handful of driver/pytest runs per session.
    db, tbl = "hive_sync_q", f"ods_orders_{uuid.uuid4().hex[:8]}"
    t = HudiTable(
        path=tempfile.mkdtemp(prefix="hive_sync_q_") + "/t",
        record_key="o_orderkey",
        precombine="o_orderdate",
        table_type="MERGE_ON_READ",
        options={
            "hoodie.datasource.hive_sync.enable": "true",
            "hoodie.datasource.hive_sync.database": db,
            "hoodie.datasource.hive_sync.table": tbl,
        },
    )
    t.bulk_insert(o)
    if not spark.catalog.tableExists(f"{db}.{tbl}"):
        raise AssertionError("hive sync did not register the snapshot name")
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
    )
    t.upsert(updates, spark)
    # pending log: snapshot name withheld, _ro (base-only) still valid
    if spark.catalog.tableExists(f"{db}.{tbl}"):
        raise AssertionError("snapshot name must be withheld while log pends")
    if not spark.catalog.tableExists(f"{db}.{tbl}_ro"):
        raise AssertionError("read-optimized name must stay registered")
    t.compact(spark)
    return spark.table(f"`{db}`.`{tbl}`")


def _bucketed_cleanup(spark) -> None:
    """Reclaim THIS session's earlier bucketed tables plus clearly
    orphaned warehouse dirs. DROP TABLE removes a managed table's dir;
    the rm sweep is scoped to dirs older than 6 h so a concurrent
    session sharing the warehouse never loses a live table (its dirs
    are minutes old)."""
    import glob
    import os
    import shutil
    import time
    from urllib.parse import urlparse

    for tbl in spark.catalog.listTables():
        if tbl.name.startswith(("bq_li_", "bq_o_")):
            spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if wh:
        cutoff = time.time() - 6 * 3600
        for d in glob.glob(os.path.join(wh, "bq_li_*")) + glob.glob(
            os.path.join(wh, "bq_o_*")
        ):
            try:
                if os.path.getmtime(d) < cutoff:
                    shutil.rmtree(d, ignore_errors=True)
            except OSError:
                pass


def bucketed_write(spark, sf_dir) -> tuple[str, str]:
    """Layout phase of the bucketed join: write both fact tables
    bucketBy(16)+sortBy on the join key (uuid-suffixed names, so a
    re-entrant run never collides). Returns the (lineitem, orders)
    table names. Benched separately from the join — the write is the
    one-time layout cost, the join is the recurring payoff."""
    import uuid

    _bucketed_cleanup(spark)
    suffix = uuid.uuid4().hex[:8]
    li_t, o_t = f"bq_li_{suffix}", f"bq_o_{suffix}"
    t = _t(spark, sf_dir, "lineitem", "orders")
    t["lineitem"].select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).write.bucketBy(16, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable(li_t)
    t["orders"].select("o_orderkey", "o_orderstatus").write.bucketBy(
        16, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable(o_t)
    return li_t, o_t


def bucketed_join(spark, li_t: str, o_t: str) -> DataFrame:
    """Join phase over pre-bucketed tables: zero join-side exchanges
    (test_plans.py pins the no-Exchange property)."""
    # the merge hint (not a session-conf toggle, which would leak into
    # the caller's later queries) forces the sort-merge strategy that
    # reads the bucket layout — planned with zero exchanges
    return (
        spark.table(li_t)
        .hint("merge")
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "join_bucketed",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_bucketed(spark, sf_dir):
    """Bucketed co-located join end-to-end: both fact tables written
    bucketBy(16) + sortBy on the join key, then joined WITHOUT a
    broadcast — the bucket layout replaces the shuffle (no Exchange
    hashpartitioning on either side; test_plans pins the property on
    toy tables, this id proves value-correctness on the real data).
    This is the pre-partitioning pattern for repeated large-large joins
    at 100 TB: pay the layout once at write time, join for free after.
    The aggregation keys on o_orderstatus AFTER the join, so the
    bucketed join's output partitioning feeds the aggregate's partial
    phase directly."""
    li_t, o_t = bucketed_write(spark, sf_dir)
    return bucketed_join(spark, li_t, o_t)


@query(
    "hudi_cluster_read",
    oracle="SELECT o_orderkey, o_totalprice, o_orderdate FROM orders",
)
def hudi_cluster_read(spark, sf_dir):
    """§1.2 layout optimization end-to-end (Hudi clustering,
    ``hoodie.layout.optimize.strategy=z-order``): bulk_insert orders,
    Z-order-cluster the files on (o_orderdate, o_totalprice), read back.
    Clustering is a physical-layout rewrite — content is identical (the
    oracle is the plain table), but each file's min/max envelope on BOTH
    sort columns shrinks, so date+price range filters skip files via
    parquet footer stats instead of scanning (lake.HudiTable.cluster)."""
    import tempfile

    from .lake import HudiTable

    o = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    t = HudiTable(
        path=tempfile.mkdtemp(prefix="clu_q_") + "/t",
        record_key="o_orderkey",
        precombine="o_orderdate",
    )
    t.bulk_insert(o)
    t.cluster(spark, ["o_orderdate", "o_totalprice"], target_files=8)
    return t.read(spark)


@query(
    "cdc_apply",
    oracle="""
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value,
             CASE WHEN event_type = 'click' THEN 'delete' ELSE 'upsert' END AS op,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1 AND op <> 'delete'
    """,
)
def cdc_apply(spark, sf_dir):
    """C5 (batch-expressed): CDC materialization — events as a change
    stream keyed by user_id; latest op wins; deletes drop the key. The
    streaming path (streaming.cdc) runs this exact merge per micro-batch."""
    e = _t(spark, sf_dir, "events")["events"]
    changes = e.withColumn(
        "op",
        F.when(F.col("event_type") == "click", "delete").otherwise("upsert"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "delete"))
        .select("user_id", "event_id", "value")
    )


@query(
    "stream_tumbling",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling(spark, sf_dir):
    """C6 (batch-expressed): tumbling 1-hour event-time windows — the
    same F.window aggregation streaming.windows runs with a watermark."""
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "hudi_restore_read",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_totalprice * 2 AS p,
             o_orderdate + INTERVAL 1 DAY AS d
      FROM orders WHERE o_orderkey % 10 = 0
    ), s1 AS (
      SELECT o.o_orderkey,
             COALESCE(a.p, o.o_totalprice) AS o_totalprice,
             COALESCE(a.d, o.o_orderdate) AS o_orderdate
      FROM orders o LEFT JOIN a USING (o_orderkey)
    ), b AS (
      SELECT o_orderkey, o_totalprice + 5 AS p,
             o_orderdate + INTERVAL 2 DAY AS d
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT s1.o_orderkey,
           COALESCE(b.p, s1.o_totalprice) AS o_totalprice,
           COALESCE(b.d, s1.o_orderdate) AS o_orderdate
    FROM s1 LEFT JOIN b USING (o_orderkey)
    """,
)
def hudi_restore_read(spark, sf_dir):
    """§1.2 savepoint + restore (Hudi ``savepoint create`` /
    ``restore``), driver-provable end to end: bulk_insert -> upsert A
    (keys %10, price x2, precombine +1 day) -> SAVEPOINT -> a junk
    delete of every %3 key -> RESTORE to the savepoint (the delete
    commit is physically discarded, not just hidden) -> upsert B
    (keys %7, price +5 off the ORIGINAL rows, precombine +2 days) ->
    snapshot read. The oracle is base+A with B merged on top: every %3
    key must still be present (restore really unwound the delete) and
    the post-restore commit must land on the restored timeline (B beats
    A on %70 keys via the later precombine). Restore cost is one
    seq-pruned log rewrite; base files untouched."""
    import tempfile

    from .lake import HudiTable

    o = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    t = HudiTable(
        path=tempfile.mkdtemp(prefix="restore_q_") + "/t",
        record_key="o_orderkey",
        precombine="o_orderdate",
        table_type="MERGE_ON_READ",
    )
    t.bulk_insert(o)
    t.upsert(
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")),
        spark,
    )
    sp = t.savepoint(spark)
    t.delete(o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey"), spark)
    t.restore(spark, sp)
    t.upsert(
        o.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 5)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 2 DAY")),
        spark,
    )
    return t.read(spark)


@query(
    "hudi_schema_evolution",
    oracle="""
    WITH u AS (
      SELECT o_orderkey, o_totalprice * 2 AS p,
             o_orderdate + INTERVAL 1 DAY AS d, 'upd' AS note
      FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT o.o_orderkey,
           COALESCE(u.p, o.o_totalprice) AS o_totalprice,
           COALESCE(u.d, o.o_orderdate) AS o_orderdate,
           u.note AS o_note
    FROM orders o LEFT JOIN u USING (o_orderkey)
    """,
)
def hudi_schema_evolution(spark, sf_dir):
    """§1.2 schema evolution on upsert (Hudi's
    ``hoodie.datasource.write.reconcile.schema`` add-column path): the
    incoming batch carries a NEW column ``o_note`` absent from the
    table; after the upsert the table schema is the union — updated
    rows carry the value, untouched rows read NULL (never a schema
    clash, never a dropped column). The COW merge unions by name with
    allowMissingColumns and the rewrite persists the widened schema;
    the MOR log path gets the same via mergeSchema (pinned in
    tests/test_units.py)."""
    import tempfile

    from .lake import HudiTable

    o = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    t = HudiTable(
        path=tempfile.mkdtemp(prefix="evo_q_") + "/t",
        record_key="o_orderkey",
        precombine="o_orderdate",
    )
    t.bulk_insert(o)
    t.upsert(
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
        .withColumn("o_note", F.lit("upd")),
        spark,
    )
    return t.read(spark)


# Import-time registration of the LLM-pipeline queries (dedup, similarity,
# text analysis, multimodal) — see queries_llm.py.
from . import queries_llm  # noqa: E402,F401  (registry side effects)
from . import queries_extra  # noqa: E402,F401  (registry side effects)
from . import queries_pipeline  # noqa: E402,F401  (registry side effects)
from . import queries_tpch  # noqa: E402,F401  (registry side effects)
