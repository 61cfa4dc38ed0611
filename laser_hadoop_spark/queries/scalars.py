"""Scalar-function queries (SURVEY.md §2.8).

The reference's row-parse path is string manipulation: regex split,
concat join keys, case-insensitive compare, prefix tests, substring,
trim, printf ids, string->int casts, integer div/mod, JSON get
(citations per function in SURVEY.md §2.8). Exposed as column
expressions over the star schema, each with an exact DuckDB oracle.

Dialect care: DuckDB arrays are 1-indexed (Spark getItem is 0-indexed);
DuckDB CAST(double AS INT) rounds while Spark truncates — avoided by
using floor() on both sides; Spark split() is regex while DuckDB
string_split is literal — patterns kept literal-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           string_split(p_type, ' ')[1] AS type_head,
           len(string_split(p_type, ' ')) AS type_arity,
           starts_with(p_type, 'STANDARD') AS is_standard,
           substring(p_name, 1, 8) AS name_prefix,
           strpos(p_name, 'a') AS first_a,
           trim(concat('  ', p_brand, ' ')) AS brand_trim,
           printf('%05d', p_size) AS size_padded
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3-F7/P2: split, case-fold, prefix, substring, trim, printf."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.size(F.split(F.col("p_type"), " ")).cast("bigint").alias("type_arity"),
        F.col("p_type").startswith("STANDARD").alias("is_standard"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("first_a"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        F.format_string("%05d", F.col("p_size")).alias("size_padded"),
    )


@register(
    "q_string_key_concat",
    oracle="""
    SELECT concat_ws(':', l_returnflag, l_linestatus) AS status_key,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY 1
    """,
)
def q_string_key_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/F2: composite-key construction, CHR+":"+POS style.

    Reference joins on a concatenated "CHR:POS" string key
    (LASERInputCheckMapper.java:68,243); the engine prefers native
    multi-column join keys and keeps concat_ws for key display/export.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.concat_ws(":", "l_returnflag", "l_linestatus").alias("status_key")
        )
        .groupBy("status_key")
        .agg(F.count("*").alias("n_rows"))
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_linenumber * 3 + 2) AS arity,
           (l_linenumber * 3 + 2) % 3 AS arity_mod,
           CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_div7,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS roundtrip_key,
           CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS DECIMAL(18,6)) AS DOUBLE) AS charged,
           ABS(l_discount - 0.05) > 0.03 AS discount_outlier
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/F8/F9: arity arithmetic, modulo, integer division, casts.

    Reference: (fields.length - 2) % 3 and /3 locus-arity math
    (LASERInputCheckMapper.java:130,136), Integer.parseInt casts
    (LASERInputCheckMapper.java:285).
    """
    li = table(spark, sf_dir, "lineitem")
    arity = F.col("l_linenumber").cast("int") * 3 + 2
    return li.select(
        "l_orderkey",
        "l_linenumber",
        arity.alias("arity"),
        (arity % 3).alias("arity_mod"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("roundtrip_key"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("charged"),
        (F.abs(F.col("l_discount") - 0.05) > 0.03).alias("discount_outlier"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) AS order_dow,
           COUNT(*) AS n_orders,
           CAST(MAX(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE))) AS BIGINT) AS max_days_since
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: date/time functions — trunc, extract, datediff.

    No dates exist in the reference (stringly-typed text); required for
    the events/time-series closure. DOW convention aligned: DuckDB dow
    (Sunday=0) vs Spark dayofweek (Sunday=1) - 1.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("order_dow"),
            F.col("o_orderdate").cast("date").alias("od"),
        )
        .groupBy("order_month", "order_year", "order_dow")
        .agg(
            F.count("*").alias("n_orders"),
            F.max(F.datediff(F.col("od"), F.lit("1995-01-01").cast("date")))
            .cast("bigint")
            .alias("max_days_since"),
        )
    )


@register(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'sum'), 3) AS vec_sum,
           ROUND(sqrt(list_aggregate(list_transform(embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                'sum')), 3) AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: array ops — size, aggregate (fold), filter, transform.

    The seq-file per-locus triples (§1.1) become array columns; these
    are the JVM-side (codegen) array primitives used across the
    similarity operators instead of Python UDFs.
    """
    emb = table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 3
        ).alias("vec_sum"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            3,
        ).alias("l2_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity, 4) AS qty_from_map,
           ROUND(l_extendedprice, 4) AS price_from_map,
           2 AS n_keys
    FROM lineitem
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: map construction + element_at + cardinality.

    The reference's in-memory HashMaps (groups, reference sites —
    LASERInputCheckMapper.java:53-95) become map columns where embedded.
    The oracle states the expected *values*; map plumbing is Spark-side.
    """
    li = table(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("price"), F.col("l_extendedprice")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.element_at(m, "qty"), 4).alias("qty_from_map"),
        F.round(F.element_at(m, "price"), 4).alias("price_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_O,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (explicit list avoids the extra
    distinct-values job and keeps the plan static at scale)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 4))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )
