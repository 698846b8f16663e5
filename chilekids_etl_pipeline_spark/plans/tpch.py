"""Classic TPC-H join/subquery shapes, adapted to the available star schema.

The synthetic tables carry no ``partsupp``, so the part-supplier cost
relation is derived from lineitem (min observed unit price per
part × supplier) — the *shapes* being proven are the TPC-H ones:

- Q2: correlated scalar subquery over the min-cost supplier per part,
  decorrelated into a per-part min + equi-join back.
- Q20: nested semi-join — suppliers having supplied a significant share
  of some part's volume, pushed through IN/LEFT SEMI.
- Q4 / Q7 / Q8 / Q9 / Q10 / Q11 / Q12 / Q14 / Q15 / Q16 / Q17 / Q18 /
  Q19 / Q21 / Q22 counterparts live here too; each states the canonical
  subquery form in the DuckDB oracle and the decorrelated/join form in
  Spark, proving they compute the same thing. Q11 and Q16 run over the
  derived partsupp. Together with Q1/Q3/Q5/Q6/Q13 in the analytics
  modules, all 22 TPC-H query shapes are covered.

Scale notes: every decorrelation shuffles on the correlation key exactly
once; dimension sides broadcast; no shape degenerates to a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Q2 shape: min-cost supplier per part (correlated scalar subquery)


_Q2_ORACLE = """
WITH ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_supplycost
    FROM lineitem GROUP BY 1, 2
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
       ps.ps_supplycost AS min_cost
FROM part p
JOIN ps ON p.p_partkey = ps.ps_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
  AND ps.ps_supplycost = (
      SELECT min(ps2.ps_supplycost)
      FROM ps ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape. The oracle states the correlated scalar subquery
    (per-part minimum over region suppliers); here it is decorrelated:
    one window-min over the region-filtered part-supplier costs, then an
    equality filter — a single shuffle on the correlation key
    (ps_partkey) instead of a per-row subquery. Dimensions broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sup_eu = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )

    ps_eu = ps.join(broadcast(sup_eu), F.col("ps_suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("ps_partkey")
    best = ps_eu.withColumn("min_cost_all", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost_all")
    )

    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    # min_cost emitted as the RAW double: both engines derive bit-identical
    # IEEE quotients, but SQL round() tie-breaks differently on half-way
    # values (Spark: shortest-decimal HALF_UP; DuckDB: binary) — observed
    # as a 4th-decimal mismatch at sf0.1. The harness rounds uniformly.
    return best.join(broadcast(p), F.col("ps_partkey") == F.col("p_partkey")).select(
        "s_acctbal",
        "s_name",
        "n_name",
        "p_partkey",
        "p_type",
        F.col("ps_supplycost").alias("min_cost"),
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested semi-join over an aggregate threshold


_Q20_ORACLE = """
SELECT s.s_name, n.n_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > 0.3 * (
        SELECT sum(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
          AND l2.l_shipdate >= DATE '1996-01-01' AND l2.l_shipdate < DATE '1997-01-01'
    )
)
"""


@register("q20_significant_share_suppliers", oracle=_Q20_ORACLE)
def q20_significant_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped >30% of some part's 1996
    volume. The nested correlated aggregate (per-part total) decorrelates
    into a window-sum over the same grouped relation — the per-(supp,part)
    and per-part aggregations share one shuffle on l_partkey — and the
    outer IN becomes a LEFT SEMI join against the qualifying suppliers."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    per_sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    qualifying = (
        per_sp.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join + priority count


_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → LEFT SEMI join, then a priority histogram.
    The semi join ships only the distinct matching order keys; the date
    filter pushes into the orders scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q12 shape: join + dual conditional aggregation


_Q12_ORACLE = """
SELECT l_returnflag AS ship_class,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
       cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS bigint) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_returnflag
"""


@register("q12_priority_by_class", oracle=_Q12_ORACLE)
def q12_priority_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-to-fact join with the selective filter on the
    bigger side (pushes to its scan), conditional sums in one pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue ratio (conditional agg ratio, exact decimal sums)


_Q14_ORACLE = """
SELECT 100.0 * cast(sum(CASE WHEN p_type = 'PROMO'
                 THEN cast(l_extendedprice AS decimal(18,2))
                      * (1 - cast(l_discount AS decimal(18,2)))
                 ELSE cast(0 AS decimal(18,2)) END) AS double)
          / cast(sum(cast(l_extendedprice AS decimal(18,2))
                     * (1 - cast(l_discount AS decimal(18,2)))) AS double)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'
"""


@register("q14_promo_revenue", oracle=_Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast the part dimension, conditional revenue
    ratio in one aggregation. Decimal sums keep both engines exact; the
    single division happens on the exact totals."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = li.join(broadcast(p), li.l_partkey == p.p_partkey)
    zero = F.lit(0).cast("decimal(18,2)")
    # Raw IEEE quotient on exact decimal totals — no SQL round(): Spark and
    # DuckDB tie-break half-way doubles differently; the harness rounds
    # uniformly at 6 dp.
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


# ---------------------------------------------------------------------------
# Q17 shape: correlated average-quantity subquery


_Q17_ORACLE = """
SELECT cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) / 7.0
       AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12'
  AND l.l_quantity < 0.2 * (
      SELECT avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@register("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated per-part average decorrelates into a
    window-avg over the brand-restricted lineitems (the correlation key is
    l_partkey, and the brand filter only removes whole parts, so the
    window sees exactly the subquery's rows). One shuffle on l_partkey."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    li = load_table(spark, sf_dir, "lineitem").join(
        broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    small = li.withColumn("avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    # Exact decimal total divided once as a double — no SQL round() (engine
    # tie-break divergence); the harness rounds uniformly at 6 dp.
    return small.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0))
        .alias("avg_yearly")
    )


# ---------------------------------------------------------------------------
# Q18 shape: IN over a grouped HAVING (large-volume orders)


_Q18_ORACLE = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       cast(o.o_totalprice AS double) AS total,
       cast(sum(l.l_quantity) AS double) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 250
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@register("q18_large_volume_orders", oracle=_Q18_ORACLE)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-subquery is the same aggregation the outer
    query performs — computed once here; the HAVING filter doubles as the
    semi-join, so lineitem is scanned and aggregated a single time."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sum_qty"))
    big = per_order.filter(F.col("sum_qty") > 250)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("total"),
            F.col("sum_qty").cast("double"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute predicate (OR-of-ANDs pushdown)


_Q19_ORACLE = """
SELECT cast(sum(cast(l_extendedprice AS decimal(18,2))
               * (1 - cast(l_discount AS decimal(18,2)))) AS double) AS revenue,
       count(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs spanning both join sides. Catalyst
    derives the single-side implications (brand/size on part, quantity on
    lineitem) and pushes them below the join; the residual disjunction
    evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 30))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return j.filter(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS (suppliers who alone kept an order waiting)


_Q21_ORACLE = """
SELECT s.s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s.s_name
"""


@register("q21_waiting_supplier", oracle=_Q21_ORACLE)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS (another supplier in the order) + NOT EXISTS
    (no OTHER supplier late). Both decorrelate into ONE per-order
    aggregation — distinct suppliers, distinct LATE suppliers, and (via
    max over the late suppliers) WHICH supplier was late: when exactly
    one supplier is late, max(late suppkey) IS that supplier, so no
    second pass over the join is needed to recover it. The
    doubly-correlated NOT EXISTS therefore costs one shuffle on the
    order key and the lineitem⋈orders join runs once (the previous
    two-reference form recomputed it for the late-pairs side — idle sf1
    A/B 2.4 s → 1.5 s). 'Late' = shipped >90 days after order date."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    waiting = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    ).select("l_orderkey", "late_supp")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(broadcast(s), waiting.late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 shape: anti-join + global scalar-average threshold


_Q22_ORACLE = """
WITH thresh AS (
    SELECT cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) / count(*) AS avg_bal
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS cntry,
       count(*) AS numcust,
       cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS totacctbal
FROM customer c CROSS JOIN thresh
WHERE c.c_acctbal > thresh.avg_bal
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT'
        AND o.o_orderdate >= DATE '1999-01-01'
  )
GROUP BY c_nationkey
"""


@register("q22_idle_rich_customers", oracle=_Q22_ORACLE)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: a global scalar (average positive balance) gates
    the fact side, NOT EXISTS (no recent urgent order) becomes a LEFT ANTI
    join with the correlated predicates pushed into the anti side's scan.
    The scalar is a one-row broadcast; the threshold is computed as exact
    decimal sum / count so both engines derive the identical double."""
    c = load_table(spark, sf_dir, "customer")
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        )
        .select("o_custkey")
    )
    rich = c.crossJoin(broadcast(thresh)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy(F.col("c_nationkey").alias("cntry")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier(s) by revenue — view + scalar-max equality


_Q15_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           cast(sum(cast(l_extendedprice AS decimal(18,2))
                    * (1 - cast(l_discount AS decimal(18,2)))) AS double)
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue view computed once, the scalar-max
    subquery as a one-row aggregate broadcast back over the view (the
    q22 threshold idiom) — exact ties kept, unlike LIMIT 1. An
    unpartitioned window-max would funnel every supplier row through a
    single task; the 1-row broadcast keeps the view fully parallel.
    Revenue sums are exact decimals so the equality compare is portable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    best = revenue.crossJoin(broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return best.join(broadcast(s), best.supplier_no == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations (dual-dimension fact join)


_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       cast(sum(volume) AS double) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           cast(l.l_extendedprice AS decimal(18,2))
               * (1 - cast(l.l_discount AS decimal(18,2))) AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_nation_volume", oracle=_Q7_ORACLE)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the fact table joins two different dimension chains
    (supplier-nation and customer-nation) with a symmetric nation-pair
    disjunction that only resolves post-join. Both nation dims broadcast;
    the date filter pushes into the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    j = (
        li.join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"),
                 vol.alias("volume"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape: market share (conditional share of a grouped decimal sum)


_Q8_ORACLE = """
SELECT o_year,
       cast(cast(sum(CASE WHEN nation = 'NATION_5' THEN volume
                          ELSE cast(0 AS decimal(18,2)) END) AS double)
            / cast(sum(volume) AS double) AS double) AS mkt_share
FROM (
    SELECT year(o.o_orderdate) AS o_year,
           cast(l.l_extendedprice AS decimal(18,2))
               * (1 - cast(l.l_discount AS decimal(18,2))) AS volume,
           n1.n_name AS nation
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_type = 'ECONOMY'
      AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1998-01-01'
) nations
GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's share of yearly volume — conditional
    decimal sum over total decimal sum, divided once as doubles (exact
    numerators/denominators, portable quotient). Part/supplier/nation
    broadcast; the selective p_type filter prunes the fact rows through
    the broadcast join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate")
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    j = (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"),
                F.col("n_name").alias("nation"))
    )
    return j.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 shape: product profit by nation and year (derived cost, no partsupp)


_Q9_ORACLE = """
SELECT nation, o_year, cast(sum(amount) AS double) AS sum_profit
FROM (
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           cast(l.l_extendedprice AS decimal(18,2))
               * (1 - cast(l.l_discount AS decimal(18,2)))
           - cast(p.p_retailprice AS decimal(18,2))
               * cast(l.l_quantity AS decimal(18,2))
               * cast(0.5 AS decimal(18,2)) AS amount
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
"""


@register("q9_product_profit", oracle=_Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per nation-year over a part-name LIKE filter.
    partsupp doesn't exist in this schema, so supply cost derives from
    p_retailprice (half price per unit) — the join topology and the
    decimal profit arithmetic are the Q9 structure. All dims broadcast;
    one shuffle for the final aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    ) - F.col("p_retailprice").cast("decimal(18,2)") * F.col("l_quantity").cast(
        "decimal(18,2)"
    ) * F.lit(0.5).cast("decimal(18,2)")
    j = (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return (
        j.select(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue per customer (threshold, not LIMIT)


_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       cast(sum(cast(l.l_extendedprice AS decimal(18,2))
                * (1 - cast(l.l_discount AS decimal(18,2)))) AS double) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '1996-10-01' AND o.o_orderdate < DATE '1997-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
HAVING sum(cast(l.l_extendedprice AS decimal(18,2))
           * (1 - cast(l.l_discount AS decimal(18,2)))) > 8000
"""


@register("q10_returned_revenue", oracle=_Q10_ORACLE)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost revenue from returned items per customer in a
    quarter. A deterministic HAVING threshold replaces Q10's LIMIT 20 —
    top-N over tied doubles is not portable, a decimal threshold is. The
    returnflag and date filters push into their scans; nation broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(rev).alias("rev_dec")
    )
    return agg.filter(F.col("rev_dec") > 8000).select(
        "c_custkey", "c_name", "n_name",
        F.col("rev_dec").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Q16 shape: supplier count per part attribute, with a blacklist anti-join


_Q16_ORACLE = """
WITH ps AS (
    SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
    FROM lineitem
)
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type NOT LIKE 'MED%'
  AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND ps.ps_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q16_parts_supplier_count", oracle=_Q16_ORACLE)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers able to supply each surviving
    part attribute combination. partsupp derives from lineitem (distinct
    part×supplier pairs, as for Q2/Q20); the complaints NOT IN becomes a
    LEFT ANTI against the low-standing supplier blacklist (s_acctbal
    analog — the schema has no s_comment). Part filters push to the scan;
    the tiny blacklist broadcasts; countDistinct runs two-phase."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000.0)
        .select("s_suppkey")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("MED%")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    return (
        ps.join(broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q11 shape: per-part share of a global aggregate, scalar threshold


_Q11_ORACLE = """
WITH ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           sum(cast(l_extendedprice AS decimal(18,2))
               * cast(l_quantity AS decimal(18,2))) AS ps_value
    FROM lineitem GROUP BY 1, 2
),
val AS (
    SELECT ps.ps_partkey, sum(ps.ps_value) AS part_value
    FROM ps JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_nationkey < 13
    GROUP BY ps.ps_partkey
)
SELECT ps_partkey, cast(part_value AS double) AS part_value
FROM val
WHERE cast(part_value AS double) > (
    SELECT 1.5 * cast(sum(part_value) AS double) / count(*) FROM val
)
"""


@register("q11_important_stock", oracle=_Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stocked value (for one nation group's
    suppliers) exceeds a share of the global aggregate over the SAME
    relation. The scalar subquery is a 1-row aggregate broadcast back over
    the view (q22/q15 idiom). The threshold is 1.5× the mean part value —
    scale-invariant, unlike Q11's 0.0001/SF literal fraction. Values are
    exact decimal sums; the single division and compare happen on doubles
    both engines derive identically."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_quantity").cast("decimal(18,2)")
        ).alias("ps_value")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            broadcast(
                load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 13)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    val = (
        ps.join(broadcast(sup), ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(F.sum("ps_value").alias("part_value_dec"))
        # referenced twice (threshold scalar + filter side); persisting the
        # small per-part aggregate stops the lineitem scan + double
        # aggregation from running twice — same idiom as the persisted
        # shingle table in dedup_minhash_lsh
        .persist()
    )
    thresh = val.agg(
        (
            F.lit(1.5) * F.sum("part_value_dec").cast("double") / F.count(F.lit(1))
        ).alias("thresh")
    )
    return (
        val.crossJoin(broadcast(thresh))
        .filter(F.col("part_value_dec").cast("double") > F.col("thresh"))
        .select(
            "ps_partkey", F.col("part_value_dec").cast("double").alias("part_value")
        )
    )
