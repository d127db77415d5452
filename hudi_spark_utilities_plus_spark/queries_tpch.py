"""TPC-H composite shapes, second wave (Q4/Q6/Q7/Q8/Q11/Q12/Q14/Q15/
Q16/Q19/Q22 analogues) — the full breadth of the delegated-SQL surface
(SURVEY.md §2.B) exercised as end-to-end pipelines: semi/anti joins
driven by EXISTS, scalar-subquery thresholds, disjunctive join
predicates, conditional aggregation, and ratio reports.

The testdata is TPC-H-ish, not TPC-H: no partsupp table, no
l_shipmode/l_commitdate columns, simplified p_type vocabulary. Where the
canonical query needs a missing column the shape keeps the *plan* (the
join/agg/subquery structure Catalyst must optimize) and swaps the
predicate to an existing column; docstrings note each swap.

Cross-engine exactness rules (same as queries.py): money aggregates via
``dsum`` (exact DECIMAL sum emitted as one double), ratios as a single
double division of two exact sums, scalar-threshold comparisons
restated multiplicatively so no engine divides first.

Reference parity: the SQL-transform hook (TransformUtils.scala:26-38)
declares arbitrary SELECT pipelines over registered sources as the
reference's surface; these are the deep-end instances of that surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_tables
from .queries import dsum, query


def _t(spark, sf_dir, *names):
    return load_tables(spark, sf_dir, list(names), register=False)


@query(
    "tpch_q6_shape",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_shape(spark, sf_dir):
    """TPC-H Q6 (forecast revenue change): the pure scan-throughput
    query — every predicate pushes to the parquet scan (year range,
    discount band, quantity cap), one map-side-combined scalar
    aggregate, zero joins. At 100 TB this is the row-group-pruning
    benchmark: only the ship-date-matching row groups are read."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q4_shape",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_shape(spark, sf_dir):
    """TPC-H Q4 (order-priority checking): quarter-filtered orders
    semi-joined to qualifying lineitems, counted per priority. The
    EXISTS becomes a left-semi hash join — build side is the filtered
    lineitem key set, no duplication of matching orders. (The canonical
    l_commitdate < l_receiptdate predicate has no column here; the
    returned-line flag keeps the same selective-EXISTS plan.)"""
    t = _t(spark, sf_dir, "orders", "lineitem")
    late = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q7_shape",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS yr,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def tpch_q7_shape(spark, sf_dir):
    """TPC-H Q7 (volume shipping): the bidirectional two-nation trade
    report. Both nation lookups broadcast; the disjunctive nation-pair
    predicate applies after the (tiny) broadcasts rather than blocking
    join reordering; the fact spine (lineitem-orders-customer-supplier)
    stays shuffled on its natural keys."""
    t = _t(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q8_shape",
    oracle="""
    WITH vol AS (
      SELECT year(o_orderdate) AS yr,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS v,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT yr,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(v) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY yr
    """,
)
def tpch_q8_shape(spark, sf_dir):
    """TPC-H Q8 (national market share): NATION_3's share of PROMO-part
    revenue sold into AMERICA, per order year. Seven-table join where
    part (filtered), nation ×2, and region broadcast; the share is one
    double division of two exact decimal sums (numerator via CASE inside
    the same aggregate — no second pass over the joined fact)."""
    t = _t(spark, sf_dir, "lineitem", "part", "supplier", "orders", "customer",
           "nation", "region")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    amer = t["region"].filter(F.col("r_name") == "AMERICA").select("r_regionkey")
    vol = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "PROMO")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(amer), F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("yr"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("v"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return vol.groupBy("yr").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("v")).otherwise(zero))
            .cast("double")
            / F.sum("v").cast("double")
        ).alias("mkt_share")
    )


@query(
    "tpch_q11_shape",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2)))
                  AS DOUBLE) AS part_value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > (SELECT CAST(SUM(CAST(l_extendedprice * l_quantity
                                             AS DECIMAL(18,2))) AS DOUBLE)
                        FROM lineitem) * 0.001
    """,
)
def tpch_q11_shape(spark, sf_dir):
    """TPC-H Q11 (important stock): per-part traded value filtered
    against a fraction of the corpus-global value — the group-vs-global
    scalar-subquery pattern. One keyed aggregate; the global total is
    map-side partial-aggregated from the SAME shuffle's partials
    conceptually, here a second tiny aggregate whose single-row result
    broadcasts into the filter (no Exchange SinglePartition on the big
    side). (partsupp is absent; lineitem extendedprice×quantity stands
    in for supplycost×availqty, same plan.)"""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    val = F.col("l_extendedprice") * F.col("l_quantity")
    pv = li.groupBy("l_partkey").agg(dsum(val, 2).alias("part_value"))
    total = li.agg((dsum(val, 2) * F.lit(0.001)).alias("threshold"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@query(
    "tpch_q12_shape",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_shape(spark, sf_dir):
    """TPC-H Q12 (shipping priority classes): fact-fact join with the
    year filter pushed to the lineitem scan, conditional-count
    aggregation (CASE inside SUM — one pass, two tallies). (l_shipmode
    is absent; l_linestatus keys the groups, same plan.)"""
    t = _t(spark, sf_dir, "orders", "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_shape",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14_shape(spark, sf_dir):
    """TPC-H Q14 (promotion effect): one month of lineitem joined to
    part (broadcast — part is the small dim), promo share as a single
    double division of two exact decimal sums accumulated in the same
    aggregate pass."""
    t = _t(spark, sf_dir, "lineitem", "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q15_shape",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def tpch_q15_shape(spark, sf_dir):
    """TPC-H Q15 (top supplier): quarter revenue per supplier, then the
    argmax via a broadcast scalar MAX over the aggregate — the
    aggregate-of-aggregate pattern. Exact-decimal revenue makes the
    equality join against the max deterministic cross-engine."""
    t = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        t["supplier"]
        .join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_shape",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_shape(spark, sf_dir):
    """TPC-H Q16 (supplier-part relationship count): negated dimension
    predicates + IN-list pushed to the broadcast part side, exact
    distinct-supplier count per (brand, type, size) — the two-shuffle
    distinct-agg plan (partial distinct on (keys, suppkey), then count).
    (partsupp is absent; lineitem provides the part-supplier pairs,
    same plan.)"""
    t = _t(spark, sf_dir, "part", "lineitem")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q19_shape",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19_shape(spark, sf_dir):
    """TPC-H Q19 (discounted revenue, disjunctive predicates): the
    classic OR-of-ANDs join filter. The join stays a single equi-join on
    partkey (broadcast part) with the disjunction evaluated as a
    residual filter — not three separate joins; Catalyst additionally
    derives the common p_size <= 15 / quantity bounds for scan pruning."""
    t = _t(spark, sf_dir, "lineitem", "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q22_shape",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
            > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def tpch_q22_shape(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): customers with
    above-average balance and no orders — scalar-subquery threshold +
    anti join. The mean test is restated multiplicatively
    (bal · n_pos > sum_pos) so neither engine divides: both sides are
    then exact products/sums of identical doubles, no average-
    accumulation-order hazard. The anti join builds on the orders key
    set; the threshold broadcasts as a single row."""
    t = _t(spark, sf_dir, "customer", "orders")
    pos = t["customer"].filter(F.col("c_acctbal") > 0)
    thr = pos.agg(
        F.count(F.lit(1)).alias("n_pos"),
        dsum("c_acctbal", 2).alias("sum_pos"),
    )
    return (
        t["customer"]
        .join(F.broadcast(thr))
        .filter(F.col("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(
            t["orders"].select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )


@query(
    "tpch_q2_shape",
    oracle="""
    WITH pc AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY 1, 2
    ), best AS (
      SELECT pk, sk, cost, MIN(cost) OVER (PARTITION BY pk) AS best_cost
      FROM pc
    )
    SELECT p_partkey, s_suppkey, s_name, s_acctbal, cost
    FROM best
    JOIN part ON p_partkey = pk
    JOIN supplier ON s_suppkey = sk
    WHERE p_size = 25 AND cost = best_cost
    """,
)
def tpch_q2_shape(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier): for every size-25 part, the
    supplier(s) achieving the minimum observed unit cost — the
    correlated-min pattern, expressed as one keyed aggregate plus a
    per-part window MIN (no re-join of an aggregated subquery against
    its own source). The part filter broadcasts into the aggregate's
    output before the window, so the window only ranks surviving parts.
    (partsupp is absent; per-(part, supplier) min unit price from
    lineitem stands in for ps_supplycost — identical plan.)"""
    t = _t(spark, sf_dir, "lineitem", "part", "supplier")
    from pyspark.sql import Window

    pc = (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    sized = t["part"].filter(F.col("p_size") == 25).select("p_partkey")
    pc = pc.join(F.broadcast(sized), F.col("pk") == F.col("p_partkey"))
    w = Window.partitionBy("pk")
    return (
        pc.withColumn("best_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("best_cost"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("sk"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "cost")
    )


@query(
    "tpch_q9_shape",
    oracle="""
    SELECT n_name, year(o_orderdate) AS yr,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity * 0.1
                         AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def tpch_q9_shape(spark, sf_dir):
    """TPC-H Q9 (product-type profit): the five-way star join grouped by
    supplier nation and order year, with the part-name LIKE filter
    pushed into the broadcast part side. Profit per line = revenue minus
    a cost basis (p_retailprice × qty × 0.1 stands in for the absent
    ps_supplycost), summed as exact decimals."""
    t = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    ).cast("decimal(18,4)")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "tpch_q13_shape",
    oracle="""
    WITH co AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM co GROUP BY c_count
    """,
)
def tpch_q13_shape(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): left join with a
    residual predicate ON the join (not a post-filter — customers whose
    only orders are urgent must still count as zero), then the
    aggregate-of-aggregate histogram. COUNT(column) skips the nulls the
    outer join manufactures."""
    t = _t(spark, sf_dir, "customer", "orders")
    co = (
        t["customer"]
        .join(
            t["orders"],
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q17_shape",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS pk,
             SUM(l_quantity) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pk = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
    """,
)
def tpch_q17_shape(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): each line compares its
    quantity against 20% of its part's average — the correlated-scalar-
    aggregate pattern, planned as one per-part aggregate joined back to
    the fact (one lineitem shuffle on partkey feeds both sides under
    exchange reuse). The average is emitted as SUM/COUNT in both
    engines: quantities are integer-valued doubles, so the sum is exact
    in any accumulation order and the single division is bit-stable.
    The per-part aggregate is semi-filtered to brand-matching parts
    first — the join would drop other parts' averages anyway, and at
    100 TB that turns a whole-corpus aggregate into a selective one."""
    t = _t(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"]
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#3")
    pa = (
        li.join(
            F.broadcast(brand_parts.select("p_partkey")),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"))
    )
    return (
        li.join(
            F.broadcast(brand_parts),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q20_shape",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 50
    )
    """,
)
def tpch_q20_shape(spark, sf_dir):
    """TPC-H Q20 (excess-volume suppliers): suppliers who moved > 50
    units of any name-matched part in the year — the IN-over-grouped-
    HAVING pattern, planned as aggregate → distinct keys → left-semi
    join (the supplier table never duplicates). Quantity sums are exact
    (integer-valued doubles). (ps_availqty is absent; the shipped-volume
    threshold keeps the same nested-aggregate plan.)"""
    t = _t(spark, sf_dir, "supplier", "lineitem", "part")
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "tpch_q21_shape",
    oracle="""
    WITH os AS (
      SELECT l_orderkey AS ok,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
               AS n_r_supp
      FROM lineitem GROUP BY 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN os ON ok = l1.l_orderkey
    WHERE l1.l_returnflag = 'R' AND n_supp >= 2 AND n_r_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def tpch_q21_shape(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): the EXISTS /
    NOT-EXISTS pair over sibling lineitems, rewritten as ONE per-order
    aggregate — n_supp ≥ 2 encodes the EXISTS (another supplier on the
    order), n_r_supp = 1 encodes the NOT EXISTS (no OTHER supplier also
    flagged, since l1 itself is flagged). One extra lineitem aggregate
    instead of two correlated self-joins — at 100 TB that is two fewer
    shuffles of the fact table. (l_returnflag = 'R' stands in for the
    absent receipt-after-commit lateness predicate.)"""
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    li = t["lineitem"]
    os_ = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(os_, F.col("ok") == F.col("l_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
