"""Headline analytical queries (TPC-H-shaped) used by bench.py.

These compose the §2 operators into realistic multi-operator pipelines
over the star schema — the closest analogue of the reference's
fixed-shape analytical pipelines (SURVEY.md §0), and the queries whose
sf0.1 wall-clock the driver benchmarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.functions.scalar import money_sum, revenue_expr
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 4) AS DOUBLE)
               AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 4) AS DOUBLE)
               AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                               AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-scan multi-aggregate pricing summary.

    Pure map-side partial aggregation into a tiny exchange — the plan
    that must hold at 100 TB (no shuffle of raw rows).
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity"), scale=2).alias("sum_qty"),
            money_sum(F.col("l_extendedprice"), scale=2).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 20
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> top-k.

    customer is filtered then broadcast; lineitem join stays on the fact
    side; final top-20 is TakeOrderedAndProject (no global sort).
    """
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(revenue_expr()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(20)
    )


@register(
    "q_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1994-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with a multi-key (supp+nation) edge.

    All dims broadcast; the only shuffle is lineitem x orders. The
    c_nationkey = s_nationkey condition rides the supplier join as a
    residual multi-key equi-condition.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(revenue_expr()).alias("revenue"))
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT p_brand,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4)
               AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size <= 5
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    GROUP BY p_brand
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (small-order revenue).

    Declared through the SQL surface so Catalyst's subquery
    decorrelation plans it — the correlated AVG becomes one grouped
    aggregate joined back to the fact scan (two scans of lineitem, one
    shuffle each, no per-row subquery execution). The reference has no
    subquery mechanism at all; this is pure optimizer leverage
    (SURVEY.md §4: decorrelation listed among Catalyst capabilities the
    reference never had).
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("lineitem", "part"))
    return spark.sql(
        """
        SELECT p_brand,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4)
                   AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_size <= 5
          AND l_quantity < (
              SELECT 0.2 * AVG(l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = lineitem.l_partkey
          )
        GROUP BY p_brand
        """
    )


@register(
    "q_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
    GROUP BY l_linestatus
    """,
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts over a fact-fact join.

    The IN-list CASE pair runs inside the post-join project, so the
    aggregate is two codegen'd conditional sums — the reference's
    SHARED/TOTAL two-counters-one-pass pattern
    (LASERInputCheckMapper.java:239-251) over a join instead of a scan.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_promo_revenue",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000
                                         + 0.5) AS BIGINT) ELSE 0 END)
             / SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000 + 0.5)
                        AS BIGINT)),
           4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01'
      AND l_shipdate <  TIMESTAMP '1995-10-01'
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional to total revenue.

    Both sums aggregate exact micro-unit int64s (micro_units pattern on
    BOTH engines — identical floor(x*1e6+0.5) spelling), so the final
    double ratio is bit-identical cross-engine: same two integers, same
    one division. Part side broadcasts; one shuffle for the 1-row agg.
    """
    from laser_hadoop_spark.functions.scalar import micro_units

    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = table(spark, sf_dir, "part")
    rev = micro_units(revenue_expr())
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct")
    )


@register(
    "q_disjunctive_pred",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-AND predicate blocks across a join.

    Catalyst pushes the common-prefix simplifications and keeps the
    disjunction as the join's residual condition; per-side conjuncts
    that appear in every branch (none here by design) would be pushed
    below the join. The interesting scale property: the part side still
    broadcasts and the fact scan still prunes columns — disjunctions
    don't break pushdown, they only widen the residual filter.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((br == "Brand#2") & sz.between(10, 30) & q.between(10, 30))
        | ((br == "Brand#3") & sz.between(20, 50) & q.between(20, 50))
    )
    return j.where(cond).agg(
        F.count("*").alias("n_lines"),
        money_sum(revenue_expr()).alias("revenue"),
    )


@register(
    "q_inactive_customers",
    oracle="""
    SELECT c_nationkey % 10 AS cgroup,
           COUNT(*) AS n_custs,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 4) AS DOUBLE)
               AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    GROUP BY c_nationkey % 10
    """,
)
def q_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery + NOT EXISTS.

    Rich customers who never ordered: the scalar AVG becomes a 1-row
    broadcast; NOT EXISTS rewrites to a left-anti join on o_custkey
    (J3's violation-detect pattern, LASERInputCheckMapper.java:139-143,
    as a declarative subquery). Orders side is pre-projected to the
    join key only, so the anti join shuffles one bigint column.
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("customer", "orders"))
    return spark.sql(
        """
        SELECT c_nationkey % 10 AS cgroup,
               COUNT(*) AS n_custs,
               ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 4)
                   AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        GROUP BY c_nationkey % 10
        """
    )
