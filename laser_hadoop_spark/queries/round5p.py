"""Round-5 widening queries, sixteenth batch (SURVEY.md §2.13, X278-X282).

Spatial containment, 2x2 effect sizes, outlier testing, corpus
economics, and inequality:

- X278 point-in-polygon census: crossing-number ray casting in PURE
  integer arithmetic (sign-safe cross-multiplied edge tests) against
  a broadcast non-convex polygon — the geofence containment primitive.
- X279 odds ratio (2x2): purchase-conversion odds AUTOMOBILE vs
  BUILDING with Woolf's SE^2 — the epidemiology/experimentation
  effect size X77's z-test doesn't report.
- X280 Grubbs max-outlier statistic: G^2 = max(x - mean)^2 / s^2
  exactly, via |n*x - S| clearing the mean's denominator.
- X281 tokenizer fertility: chars-per-token and tokens-per-word by
  source — the corpus-economics table (how many tokens a byte budget
  buys) behind every pretraining cost estimate.
- X282 Theil index: the entropy-based inequality measure (top-coded
  sibling of Gini/X90) with per-row logs micro-rounded to integers
  (X108's fixed-point discipline), decomposed by market segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X278: point-in-polygon census -------------------------------------------

# non-convex hexagon in integer (lat, lon) degrees
_POLY = [(-30, -60), (10, -80), (40, -20), (25, 30), (-5, 70), (-35, 20)]
_EDGES = [
    (y1, x1, y2, x2)
    for (y1, x1), (y2, x2) in zip(_POLY, _POLY[1:] + _POLY[:1])
]


def _pip_cond(py: str, px: str, y1: int, x1: int, y2: int, x2: int) -> str:
    """Crossing-number edge test, integer-exact: the edge straddles the
    horizontal ray at py, and the intersection lies strictly right of
    px — the division-free cross-multiplied form, with the inequality
    direction fixed by the sign of (y2 - y1)."""
    straddle = f"(({y1} > {py}) != ({y2} > {py}))"
    lhs = f"(({px}) - {x1}) * {y2 - y1}"
    rhs = f"{x2 - x1} * (({py}) - {y1})"
    cross = f"({lhs} < {rhs})" if y2 - y1 > 0 else f"({lhs} > {rhs})"
    return f"(CASE WHEN {straddle} AND {cross} THEN 1 ELSE 0 END)"


@register(
    "q_point_in_polygon",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               (('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 6))
                    ::BIGINT % 120 - 60) AS lat,
               (('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 9, 6))
                    ::BIGINT % 360 - 180) AS lon
        FROM customer
    ),
    hits AS (
        SELECT id, lat, lon,
               ({" + ".join(_pip_cond("lat", "lon", *e) for e in _EDGES)})
                   % 2 AS inside
        FROM pts
    )
    SELECT CAST((lat + 60) // 30 AS BIGINT) AS lat_band,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(inside) AS BIGINT) AS n_inside,
           CAST(10000 * SUM(inside) // COUNT(*) AS BIGINT) AS inside_bp
    FROM hits
    GROUP BY 1
    """,
)
def q_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X278: point-in-polygon (geofence) census via integer ray casting.

    Which customers (X265's md5-derived integer coordinates) fall in a
    non-convex hexagonal geofence? The crossing-number test: a point
    is inside iff a horizontal ray crosses an odd number of edges.
    Each edge test is division-free — the intersection comparison is
    cross-multiplied with the inequality direction fixed per edge's
    (y2-y1) sign at BUILD time (the polygon is a literal), so the
    whole containment check is |edges| integer comparisons inlined in
    one codegen Project — no UDF, no geometry library, exact (no
    float epsilon cases). Census by 30-degree latitude band, with the
    band key shifted nonnegative ((lat+60) DIV 30) because BOTH
    engines' integer division truncates toward zero on negatives
    (probed: DuckDB // truncates too, it does not floor) — the
    repo-wide rule stands: divide nonnegative operands only.

    100 TB shape: scan-local per-point arithmetic (the polygon is a
    compile-time constant folded into the expression tree) + one tiny
    band aggregate.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        F.expr(
            "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 6),"
            " 16, 10) AS BIGINT) % 120 - 60"
        ).alias("lat"),
        F.expr(
            "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 9, 6),"
            " 16, 10) AS BIGINT) % 360 - 180"
        ).alias("lon"),
    )
    crossings = " + ".join(_pip_cond("lat", "lon", *e) for e in _EDGES)
    hits = pts.select(
        "id",
        "lat",
        F.expr(f"({crossings}) % 2").alias("inside"),
    )
    band = F.expr("CAST((lat + 60) DIV 30 AS BIGINT)").alias("lat_band")
    return hits.groupBy(band).agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum("inside").cast("bigint").alias("n_inside"),
        F.expr("CAST(10000 * SUM(inside) DIV COUNT(*) AS BIGINT)").alias(
            "inside_bp"
        ),
    )


# --- X279: odds ratio (2x2) --------------------------------------------------


@register(
    "q_odds_ratio",
    oracle="""
    WITH conv AS (
        SELECT c.c_custkey,
               c.c_mktsegment AS seg,
               CASE WHEN COUNT(o.o_orderkey) > 0 THEN 1 ELSE 0 END AS hit
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT'
        WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        GROUP BY 1, 2
    ),
    cells AS (
        SELECT
            SUM(CASE WHEN seg = 'AUTOMOBILE' AND hit = 1 THEN 1 ELSE 0 END) AS a,
            SUM(CASE WHEN seg = 'AUTOMOBILE' AND hit = 0 THEN 1 ELSE 0 END) AS b,
            SUM(CASE WHEN seg = 'BUILDING' AND hit = 1 THEN 1 ELSE 0 END) AS c,
            SUM(CASE WHEN seg = 'BUILDING' AND hit = 0 THEN 1 ELSE 0 END) AS d
        FROM conv
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
           CAST(1000 * CAST(a AS HUGEINT) * d // (CAST(b AS HUGEINT) * c)
                AS BIGINT) AS odds_ratio_milli,
           CAST(1000000 // a + 1000000 // b + 1000000 // c + 1000000 // d
                AS BIGINT) AS woolf_se2_micro
    FROM cells
    """,
)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X279: 2x2 odds ratio with Woolf's variance, exact integers.

    Are AUTOMOBILE customers more likely than BUILDING customers to
    have placed an urgent order? The odds ratio ad/bc is THE 2x2
    effect size (X77's z-test answers "is there a difference", X109's
    chi2 "is it independent" — this answers "how strong"), emitted in
    milli from one exact integer division; Woolf's log-OR variance
    1/a+1/b+1/c+1/d emits in micro via four truncating divisions
    (identical in both engines, positive operands). The per-customer
    conversion flag comes from one left-join aggregate.

    100 TB shape: the orders side filters at the scan (pushed
    predicate) and aggregates to customer grain map-side; the 2x2
    cells are one conditional-sum aggregate; the stat is 1-row math.
    """
    c = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .where(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    conv = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.when(F.count("o_orderkey") > 0, 1).otherwise(0).alias("hit")
        )
    )
    seg = F.col("c_mktsegment")
    cells = conv.agg(
        F.sum(F.when((seg == "AUTOMOBILE") & (F.col("hit") == 1), 1).otherwise(0)).alias("a"),
        F.sum(F.when((seg == "AUTOMOBILE") & (F.col("hit") == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when((seg == "BUILDING") & (F.col("hit") == 1), 1).otherwise(0)).alias("c"),
        F.sum(F.when((seg == "BUILDING") & (F.col("hit") == 0), 1).otherwise(0)).alias("d"),
    )
    return cells.select(
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        F.col("c").cast("bigint").alias("c"),
        F.col("d").cast("bigint").alias("d"),
        F.expr(
            "CAST(1000 * CAST(a AS DECIMAL(38,0)) * d"
            " DIV (CAST(b AS DECIMAL(38,0)) * c) AS BIGINT)"
        ).alias("odds_ratio_milli"),
        F.expr(
            "CAST(1000000 DIV a + 1000000 DIV b + 1000000 DIV c"
            " + 1000000 DIV d AS BIGINT)"
        ).alias("woolf_se2_micro"),
    )


# --- X280: Grubbs max-outlier statistic ---------------------------------------


@register(
    "q_grubbs",
    oracle="""
    WITH base AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS x
        FROM orders
    ),
    m AS (
        SELECT COUNT(*) AS n, SUM(x) AS s,
               SUM(CAST(x AS HUGEINT) * x) AS q,
               MAX(x) AS mx, MIN(x) AS mn
        FROM base
    ),
    dev AS (
        SELECT n, s, q, mx, mn,
               GREATEST(ABS(n * mx - CAST(s AS HUGEINT)),
                        ABS(n * mn - CAST(s AS HUGEINT))) AS maxdev_n
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(mx AS BIGINT) AS max_cents,
           CAST(mn AS BIGINT) AS min_cents,
           CAST(1000 * maxdev_n * maxdev_n * (n - 1)
                // (CAST(n AS HUGEINT) * (q * n - CAST(s AS HUGEINT) * s))
                AS BIGINT) AS g2_milli
    FROM dev
    """,
)
def q_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X280: Grubbs max-outlier statistic, exact integers.

    Is the most extreme order value a statistical outlier? G = max|x -
    mean| / s; the test compares G^2 against a t-distribution bound —
    this emits G^2 exactly in milli. Exactness: |x - S/n| clears the
    mean's denominator as |n*x - S| (the extreme deviation is at the
    max or the min — both are checked), and G^2 = maxdev_n^2 * (n-1) /
    (n * (Q*n - S^2)) after substituting the sample variance, one
    truncating division of nonnegative DECIMAL(38) terms. Compare X75
    (3-sigma outlier COUNT): this is the formal single-outlier test.

    100 TB shape: one moment aggregate (map-side combine: n, S, Q,
    max, min), then 1-row arithmetic.
    """
    base = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("x")
    )
    xd = F.col("x").cast("decimal(38,0)")
    m = base.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(xd * xd).alias("q"),
        F.max("x").alias("mx"),
        F.min("x").alias("mn"),
    )
    dev = m.withColumn(
        "maxdev_n",
        F.expr(
            "GREATEST(ABS(n * mx - CAST(s AS DECIMAL(38,0))),"
            " ABS(n * mn - CAST(s AS DECIMAL(38,0))))"
        ),
    )
    return dev.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("mx").cast("bigint").alias("max_cents"),
        F.col("mn").cast("bigint").alias("min_cents"),
        F.expr(
            "CAST(1000 * maxdev_n * maxdev_n * (n - 1)"
            " DIV (CAST(n AS DECIMAL(38,0))"
            "      * (q * n - CAST(s AS DECIMAL(38,0)) * s)) AS BIGINT)"
        ).alias("g2_milli"),
    )


# --- X281: tokenizer fertility ------------------------------------------------

_BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


@register(
    "q_tokenizer_fertility",
    oracle=r"""
    WITH t AS (
        SELECT source,
               LENGTH(text) AS n_chars,
               LENGTH(regexp_replace(text, '[^ ]', '', 'g')) + 1 AS n_words,
               LENGTH(regexp_replace(
                   text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 'T', 'g'))
                 - LENGTH(regexp_replace(
                     text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', '', 'g'))
                   AS n_tokens
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(1000 * SUM(n_chars) // SUM(n_tokens) AS BIGINT)
               AS chars_per_token_milli,
           CAST(1000 * SUM(n_tokens) // SUM(n_words) AS BIGINT)
               AS tokens_per_word_milli
    FROM t GROUP BY source
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X281: tokenizer fertility audit per source.

    How many tokens does a byte budget buy, per corpus source? The two
    ratios every pretraining cost model needs: chars/token (compression
    the tokenizer achieves — lower for code/non-English) and
    tokens/word (fertility — how much subword splitting inflates the
    sequence). Tokens are counted with the BPE-ish lexer rule (letter
    runs / single digits / single punctuation) by REPLACING each token
    with one sentinel char and differencing lengths — a pure-codegen
    token COUNT with no explode, no array materialization. Corpus text
    is space-separated (no other whitespace), so the word count is the
    space count + 1; ratios in milli by truncating division.

    100 TB shape: scan-local regex projection (each doc contributes 3
    integers map-side) + one tiny per-source aggregate. Compare L3
    (token stats via explode — that relation is the term index; this
    is the count-only audit at a fraction of the shuffle).
    """
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        F.length("text").alias("n_chars"),
        (
            F.length(F.regexp_replace("text", "[^ ]", "")) + 1
        ).alias("n_words"),
        (
            F.length(
                F.regexp_replace("text", "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]", "T")
            )
            - F.length(
                F.regexp_replace("text", "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]", "")
            )
        ).alias("n_tokens"),
    )
    return t.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.expr("CAST(1000 * SUM(n_chars) DIV SUM(n_tokens) AS BIGINT)").alias(
            "chars_per_token_milli"
        ),
        F.expr("CAST(1000 * SUM(n_tokens) DIV SUM(n_words) AS BIGINT)").alias(
            "tokens_per_word_milli"
        ),
    )


# --- X282: Theil inequality index ---------------------------------------------


@register(
    "q_theil_index",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS seg,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS x
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    lx AS (
        SELECT seg, x,
               CAST(FLOOR(LN(x) * 1000000 + 0.5) AS BIGINT) AS lnx_micro
        FROM base
    ),
    grp AS (
        SELECT seg, COUNT(*) AS n, SUM(x) AS s,
               SUM(CAST(x AS HUGEINT) * lnx_micro) AS xlnx
        FROM lx GROUP BY seg
    ),
    stacked AS (
        SELECT seg, n, s, xlnx FROM grp
        UNION ALL
        SELECT 'ALL', SUM(n), SUM(s), SUM(xlnx) FROM grp
    )
    SELECT seg,
           CAST(n AS BIGINT) AS n,
           CAST(xlnx // s
                + CAST(FLOOR(LN(n) * 1000000 + 0.5) AS BIGINT)
                - CAST(FLOOR(LN(s) * 1000000 + 0.5) AS BIGINT)
                AS BIGINT) AS theil_micro
    FROM stacked
    """,
)
def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X282: Theil inequality index of order values, by segment + ALL.

    T = (1/N) sum (x_i/mu) ln(x_i/mu) — the entropy-based inequality
    measure completing the concentration family (X90 Gini, X199
    Lorenz, X202 HHI): 0 = perfect equality, ln(N) = one order holds
    everything, and unlike Gini it decomposes additively by subgroup.
    Fixed-point discipline (X108): expand ln(x/mu) = ln(x) + ln(n) -
    ln(s); per-row ln(x) of an INTEGER micro-rounds to a bigint before
    the weighted sum, the two scalar logs micro-round once per group,
    and T_micro = sum(x*lnx)/s + ln(n) - ln(s) needs one truncating
    division of nonnegative terms.

    100 TB shape: scan-local ln + one (segment) aggregate with
    map-side combine; the ALL row reuses the 5 group rows, not the
    facts.
    """
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
    )
    lx = base.withColumn(
        "lnx_micro",
        F.floor(F.log(F.col("x").cast("double")) * 1000000 + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    grp = lx.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("lnx_micro")).alias(
            "xlnx"
        ),
    )
    stacked = grp.unionByName(
        grp.agg(
            F.lit("ALL").alias("seg"),
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.sum("xlnx").alias("xlnx"),
        )
    )
    ln_micro = (
        lambda col: F.floor(
            F.log(F.col(col).cast("double")) * 1000000 + F.lit(0.5)
        ).cast("bigint")
    )
    return stacked.select(
        "seg",
        F.col("n").cast("bigint").alias("n"),
        (
            F.expr("xlnx DIV s")
            + ln_micro("n")
            - ln_micro("s")
        ).cast("bigint").alias("theil_micro"),
    )
