"""Round-5 widening queries, ninth batch (SURVEY.md §2.13, X243-X247).

Temporal-relation algebra, resampling inference, and survey-sampling
design — plus two data-audit estimators:

- X243 Allen interval-relation census: the 13-relation interval
  algebra classifying consecutive same-customer order fulfillment
  windows — the temporal-join vocabulary (X7 range join, X53 overlap,
  X220 proration all special-case it) made explicit and counted.
- X244 deterministic sign-flip permutation test: X218's
  fanout-free resampling discipline applied to paired inference —
  32 md5 sign patterns evaluated as conditional-agg columns in ONE
  scan, exact integer p-value.
- X245 Neyman optimal allocation: stratified sampling design
  n_h ~ N_h*S_h with exact largest-remainder apportionment — the
  design step before X115/X210 draw the sample.
- X246 capture-recapture population audit: Chapman-corrected
  Lincoln-Petersen estimate of the true user population from two
  overlapping event-type sightings, checked against the exact count —
  the coverage estimator for any incomplete-detection pipeline.
- X247 Simpson's-paradox reversal census: aggregate association sign
  vs per-stratum signs via cross-multiplied integer numerators — the
  classic aggregation trap, detected exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X243: Allen interval-relation census -----------------------------------

_ALLEN_CASE = """
    CASE
      WHEN e1 < s2 THEN 'precedes'
      WHEN e1 = s2 THEN 'meets'
      WHEN s1 = s2 AND e1 = e2 THEN 'equals'
      WHEN s1 = s2 AND e1 < e2 THEN 'starts'
      WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
      WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
      WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
      WHEN s1 < s2 AND e1 > e2 THEN 'contains'
      WHEN s1 > s2 AND e1 < e2 THEN 'during'
      WHEN s1 < s2 AND e1 < e2 THEN 'overlaps'
      WHEN s2 < s1 AND e2 < e1 AND s1 < e2 THEN 'overlapped_by'
      WHEN e2 = s1 THEN 'met_by'
      ELSE 'preceded_by'
    END
"""


@register(
    "q_allen_census",
    oracle=f"""
    WITH iv AS (
        SELECT o.o_custkey AS ck, o.o_orderkey AS ok,
               CAST(o.o_orderdate AS DATE) AS s,
               MAX(CAST(l.l_shipdate AS DATE)) AS e
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ),
    seq AS (
        SELECT ck, s, e,
               ROW_NUMBER() OVER (PARTITION BY ck ORDER BY s, ok) AS rn
        FROM iv
    ),
    pairs AS (
        SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
        FROM seq a JOIN seq b ON b.ck = a.ck AND b.rn = a.rn + 1
    )
    SELECT {_ALLEN_CASE} AS relation, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1
    """,
)
def q_allen_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X243: Allen's interval algebra census over fulfillment windows.

    Each order's fulfillment interval is [orderdate, last shipdate];
    consecutive same-customer orders (by start date, orderkey
    tiebreak) are classified into Allen's 13 interval relations —
    the complete, mutually-exclusive vocabulary of temporal
    relationships. The census is the data-driven input to choosing a
    temporal-join strategy: a corpus that is 95% 'precedes' wants the
    as-of join (X3/J8), heavy 'overlaps' wants the interval join (J7).

    Pair order is fixed (earlier interval is LHS), so all 13 labels
    are reachable and the classification is deterministic — pure date
    comparisons, no arithmetic at all.

    100 TB shape: the interval build reuses the order-lineitem
    shuffle every TPC-H query pays; consecutive pairing is a
    rank + rn+1 self-equi-join per customer (X128's distributed-lead
    idiom — no global window), then a tiny census aggregate.
    """
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderdate").cast("date").alias("s"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    iv = (
        o.join(li, o.ok == li.l_orderkey)
        .groupBy("ck", "ok", "s")
        .agg(F.max("sd").alias("e"))
    )
    seq = iv.select(
        "ck",
        "s",
        "e",
        F.row_number()
        .over(Window.partitionBy("ck").orderBy("s", "ok"))
        .alias("rn"),
    )
    a = seq.select(
        F.col("ck"),
        F.col("rn"),
        F.col("s").alias("s1"),
        F.col("e").alias("e1"),
    )
    b = seq.select(
        F.col("ck").alias("bck"),
        (F.col("rn") - 1).alias("brn"),
        F.col("s").alias("s2"),
        F.col("e").alias("e2"),
    )
    pairs = a.join(
        b, (F.col("bck") == F.col("ck")) & (F.col("brn") == F.col("rn"))
    )
    return (
        pairs.select(F.expr(_ALLEN_CASE).alias("relation"))
        .groupBy("relation")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


# --- X244: deterministic sign-flip permutation test -------------------------

_PERM_R = 32  # sign patterns (replicates)


def _perm_sign_sql(r: int) -> str:
    """Sign for replicate r: +1/-1 from one md5 nibble of (custkey, r)."""
    return (
        f"CASE WHEN ('0x' || substring(md5(CAST(ck AS VARCHAR) || '_{r}'),"
        f" 1, 1))::BIGINT % 2 = 0 THEN 1 ELSE -1 END"
    )


@register(
    "q_permutation_test",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey AS ck,
               SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
                        THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS r95,
               SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
                        THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS r96,
               COUNT(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
                          THEN 1 END) AS n95,
               COUNT(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
                          THEN 1 END) AS n96
        FROM orders GROUP BY o_custkey
    ),
    paired AS (
        SELECT ck, r95 - r96 AS d FROM rev WHERE n95 > 0 AND n96 > 0
    ),
    sums AS (
        SELECT COUNT(*) AS n_pairs, SUM(d) AS t_obs,
               {", ".join(f"SUM(({_perm_sign_sql(r)}) * d) AS t{r}" for r in range(_PERM_R))}
        FROM paired
    )
    SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(t_obs AS BIGINT) AS t_obs,
           CAST({" + ".join(f"(CASE WHEN ABS(t{r}) >= ABS(t_obs) THEN 1 ELSE 0 END)" for r in range(_PERM_R))}
                AS BIGINT) AS n_as_extreme,
           CAST(10000 * ({" + ".join(f"(CASE WHEN ABS(t{r}) >= ABS(t_obs) THEN 1 ELSE 0 END)" for r in range(_PERM_R))} + 1)
                // {_PERM_R + 1} AS BIGINT) AS p_bp
    FROM sums
    """,
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X244: paired sign-flip permutation test, deterministic.

    Did per-customer revenue change between 1995 and 1996? For
    customers active in both years, d_i = rev95 - rev96 (exact
    centi); the permutation null flips each pair's sign. X218's
    100 TB bootstrap discipline: the 32 sign patterns are md5
    functions of (custkey, replicate), so all 32 permuted statistics
    are conditional-aggregate columns in the SAME single scan — the
    x32 resampled dataset never exists, and the randomness is
    bit-identical in both engines. p = (#{|T_r| >= |T_obs|} + 1) /
    (R + 1), the standard add-one permutation p-value, exact in bp.

    100 TB shape: one customer-shuffle aggregate builds the pairs;
    one 33-column aggregate evaluates the whole permutation
    distribution; the p-value arithmetic runs on one row.
    """
    o = table(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    rev = (
        o.select(
            F.col("o_custkey").alias("ck"), yr.alias("y"), centi.alias("c")
        )
        .groupBy("ck")
        .agg(
            F.sum(F.when(F.col("y") == 1995, F.col("c")).otherwise(0)).alias(
                "r95"
            ),
            F.sum(F.when(F.col("y") == 1996, F.col("c")).otherwise(0)).alias(
                "r96"
            ),
            F.count(F.when(F.col("y") == 1995, 1)).alias("n95"),
            F.count(F.when(F.col("y") == 1996, 1)).alias("n96"),
        )
    )
    paired = rev.where((F.col("n95") > 0) & (F.col("n96") > 0)).select(
        "ck", (F.col("r95") - F.col("r96")).alias("d")
    )

    def sign(r: int):
        return F.expr(
            f"CASE WHEN CAST(conv(substring(md5(CAST(ck AS STRING) || '_{r}'),"
            f" 1, 1), 16, 10) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END"
        )

    sums = paired.agg(
        F.count("*").alias("n_pairs"),
        F.sum("d").alias("t_obs"),
        *[
            F.sum(sign(r) * F.col("d")).alias(f"t{r}")
            for r in range(_PERM_R)
        ],
    )
    extreme = sum(
        [
            F.when(
                F.abs(F.col(f"t{r}")) >= F.abs(F.col("t_obs")), 1
            ).otherwise(0)
            for r in range(_PERM_R)
        ],
        F.lit(0),
    )
    return sums.select(
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("t_obs").cast("bigint").alias("t_obs"),
        extreme.cast("bigint").alias("n_as_extreme"),
        F.expr(
            f"CAST(10000 * ({'+'.join(f'(CASE WHEN ABS(t{r}) >= ABS(t_obs) THEN 1 ELSE 0 END)' for r in range(_PERM_R))} + 1)"
            f" DIV {_PERM_R + 1} AS BIGINT)"
        ).alias("p_bp"),
    )


# --- X245: Neyman optimal allocation ----------------------------------------

_NEYMAN_TOTAL = 1000  # sample budget to allocate


@register(
    "q_neyman_allocation",
    oracle=f"""
    WITH strata AS (
        SELECT c.c_mktsegment AS seg, COUNT(*) AS nh,
               SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS sx,
               SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
                   * CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS sxx
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment
    ),
    scored AS (
        SELECT seg, nh,
               CAST(FLOOR(SQRT(CAST(nh * sxx - sx * sx AS DOUBLE))) AS BIGINT)
                   AS w
        FROM strata
    ),
    tot AS (SELECT SUM(w) AS tw FROM scored),
    alloc AS (
        SELECT seg, nh, w,
               {_NEYMAN_TOTAL} * w // t.tw AS base,
               {_NEYMAN_TOTAL} * w % t.tw AS rem
        FROM scored CROSS JOIN tot t
    ),
    short AS (
        SELECT {_NEYMAN_TOTAL} - SUM(base) AS k FROM alloc
    ),
    ranked AS (
        SELECT seg, nh, w, base,
               ROW_NUMBER() OVER (ORDER BY rem DESC, seg) AS rr
        FROM alloc
    )
    SELECT seg, CAST(nh AS BIGINT) AS nh, CAST(w AS BIGINT) AS weight,
           CAST(base + CASE WHEN rr <= s.k THEN 1 ELSE 0 END AS BIGINT)
               AS n_alloc
    FROM ranked CROSS JOIN short s
    """,
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X245: Neyman optimal allocation with largest-remainder rounding.

    Allocates a 1000-draw sampling budget across market segments
    proportional to N_h * S_h (stratum size x stddev) — the
    variance-minimizing design for stratified estimation, the step
    BEFORE X115/X210 actually draw. The weight is the exact integer
    isqrt of the variance numerator nh*sxx - sx^2 (= nh^2 * var, so w
    = nh * sd in centi — IEEE sqrt is correctly rounded, FLOOR makes
    it an integer both engines agree on). Largest-remainder
    apportionment: floor allocations + one extra seat to the k
    largest remainders (seg-name tiebreak) — allocations sum to
    EXACTLY the budget, no float shares.

    100 TB shape: one broadcast-joined fact aggregate (segments are
    few); apportionment runs on a |strata|-row relation. The ranking
    window is over strata, not facts.
    """
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    strata = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(F.col("c_mktsegment").alias("seg"), centi.alias("x"))
        .groupBy("seg")
        .agg(
            F.count("*").alias("nh"),
            F.sum("x").alias("sx"),
            # x*x fits int64; the SUM and the nh*sxx/sx*sx products do
            # not — route through DECIMAL(38,0) (X174's power-sum
            # discipline; the oracle's HUGEINT arithmetic is exact too,
            # so both engines cast the same exact integer to double).
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias(
                "sxx"
            ),
        )
    )
    scored = strata.select(
        "seg",
        "nh",
        F.expr(
            "CAST(FLOOR(SQRT(CAST(CAST(nh AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))"
            " AS DOUBLE))) AS BIGINT)"
        ).alias("w"),
    )
    tot = scored.agg(F.sum("w").alias("tw"))
    alloc = scored.crossJoin(F.broadcast(tot)).select(
        "seg",
        "nh",
        "w",
        F.expr(f"{_NEYMAN_TOTAL} * w DIV tw").alias("base"),
        F.expr(f"{_NEYMAN_TOTAL} * w % tw").alias("rem"),
    )
    short = alloc.agg(
        (F.lit(_NEYMAN_TOTAL) - F.sum("base")).alias("k")
    )
    ranked = alloc.select(
        "seg",
        "nh",
        "w",
        "base",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), "seg"))
        .alias("rr"),
    )
    return ranked.crossJoin(F.broadcast(short)).select(
        "seg",
        F.col("nh").cast("bigint").alias("nh"),
        F.col("w").cast("bigint").alias("weight"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("k"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_alloc"),
    )


# --- X246: capture-recapture population audit -------------------------------


@register(
    "q_capture_recapture",
    oracle="""
    WITH s1 AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ),
    s2 AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    ),
    m AS (
        SELECT COUNT(*) AS overlap FROM s1 JOIN s2 USING (user_id)
    ),
    truth AS (SELECT COUNT(DISTINCT user_id) AS n_true FROM events)
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n1,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n2,
           CAST(m.overlap AS BIGINT) AS overlap,
           CAST(((SELECT COUNT(*) FROM s1) + 1)
                * ((SELECT COUNT(*) FROM s2) + 1)
                // (m.overlap + 1) - 1 AS BIGINT) AS n_hat_chapman,
           CAST(t.n_true AS BIGINT) AS n_true,
           CAST(10000 * (((SELECT COUNT(*) FROM s1) + 1)
                         * ((SELECT COUNT(*) FROM s2) + 1)
                         // (m.overlap + 1) - 1) // t.n_true AS BIGINT)
               AS coverage_ratio_bp
    FROM m CROSS JOIN truth t
    """,
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X246: Chapman capture-recapture estimate of the user population.

    Treats 'click' users and 'view' users as two incomplete sightings
    of the same population; Chapman's bias-corrected Lincoln-Petersen
    estimator N_hat = (n1+1)(n2+1)/(m+1) - 1 (exact truncating
    integer arithmetic) is checked against the exact distinct count —
    the estimator every incomplete-detection audit uses (how many
    duplicates did BOTH dedup passes miss, how many users does
    logging drop), here made hash-verifiable against its own ground
    truth. coverage_ratio_bp ~ 10000 means the two sightings'
    independence assumption holds.

    100 TB shape: two semi-aggregated distinct sets, one equi-join on
    user_id for the overlap, exact distinct for truth — all map-side
    combining aggregates; the estimator arithmetic is 1-row.
    """
    e = table(spark, sf_dir, "events")
    s1 = (
        e.where(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
    )
    s2 = (
        e.where(F.col("event_type") == "view").select("user_id").distinct()
    )
    n1 = s1.agg(F.count("*").alias("n1"))
    n2 = s2.agg(F.count("*").alias("n2"))
    m = s1.join(s2, "user_id").agg(F.count("*").alias("overlap"))
    truth = e.agg(F.countDistinct("user_id").alias("n_true"))
    return (
        m.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(truth))
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            F.col("overlap").cast("bigint").alias("overlap"),
            F.expr(
                "CAST((n1 + 1) * (n2 + 1) DIV (overlap + 1) - 1 AS BIGINT)"
            ).alias("n_hat_chapman"),
            F.col("n_true").cast("bigint").alias("n_true"),
            F.expr(
                "CAST(10000 * ((n1 + 1) * (n2 + 1) DIV (overlap + 1) - 1)"
                " DIV n_true AS BIGINT)"
            ).alias("coverage_ratio_bp"),
        )
    )


# --- X247: Simpson's-paradox reversal census --------------------------------

_SIMPSON_HIGH = 15_000_000  # "high-value order": > $150k in centi


@register(
    "q_simpson_reversals",
    oracle=f"""
    WITH base AS (
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS urgent,
               CASE WHEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                         > {_SIMPSON_HIGH} THEN 1 ELSE 0 END AS hi
        FROM orders
    ),
    cells AS (
        SELECT y,
               SUM(urgent * hi) AS a, SUM(urgent * (1 - hi)) AS b,
               SUM((1 - urgent) * hi) AS c, SUM((1 - urgent) * (1 - hi)) AS d
        FROM base GROUP BY y
    ),
    strata AS (
        SELECT y, a, b, c, d,
               CASE WHEN a * d > b * c THEN 1
                    WHEN a * d < b * c THEN -1 ELSE 0 END AS sgn
        FROM cells
    ),
    overall AS (
        SELECT CASE WHEN SUM(a) * SUM(d) > SUM(b) * SUM(c) THEN 1
                    WHEN SUM(a) * SUM(d) < SUM(b) * SUM(c) THEN -1
                    ELSE 0 END AS osgn
        FROM cells
    )
    SELECT s.y AS stratum_year,
           CAST(s.a AS BIGINT) AS n_urgent_hi,
           CAST(s.b AS BIGINT) AS n_urgent_lo,
           CAST(s.c AS BIGINT) AS n_other_hi,
           CAST(s.d AS BIGINT) AS n_other_lo,
           CAST(s.sgn AS BIGINT) AS stratum_sign,
           CAST(o.osgn AS BIGINT) AS overall_sign,
           CAST(CASE WHEN s.sgn * o.osgn = -1 THEN 1 ELSE 0 END AS BIGINT)
               AS reversed
    FROM strata s CROSS JOIN overall o
    """,
)
def q_simpson_reversals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X247: Simpson's-paradox reversal census, exactly verified.

    Association between order urgency and high order value, overall
    vs within each order-year stratum. The association sign is the
    sign of the odds-ratio numerator a*d - b*c (cross-multiplied — no
    probability, no division, no float), so 'the aggregate says
    positive but 1996 says negative' is an exact integer fact. The
    aggregation trap every dashboard drill-down needs flagged:
    a reversed=1 stratum means the pooled number misleads.

    100 TB shape: one conditional-aggregate scan builds the per-year
    2x2 cells (map-side combine, |years| rows); the overall cells are
    a re-aggregation of that tiny relation, broadcast back. One fact
    pass total.
    """
    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = o.select(
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("y"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("urgent"),
        F.when(centi > _SIMPSON_HIGH, 1).otherwise(0).alias("hi"),
    )
    cells = base.groupBy("y").agg(
        F.sum(F.col("urgent") * F.col("hi")).alias("a"),
        F.sum(F.col("urgent") * (1 - F.col("hi"))).alias("b"),
        F.sum((1 - F.col("urgent")) * F.col("hi")).alias("c"),
        F.sum((1 - F.col("urgent")) * (1 - F.col("hi"))).alias("d"),
    )
    sgn = (
        F.when(F.col("a") * F.col("d") > F.col("b") * F.col("c"), 1)
        .when(F.col("a") * F.col("d") < F.col("b") * F.col("c"), -1)
        .otherwise(0)
    )
    strata = cells.select("y", "a", "b", "c", "d", sgn.alias("sgn"))
    overall = cells.agg(
        F.when(
            F.sum("a") * F.sum("d") > F.sum("b") * F.sum("c"), 1
        )
        .when(F.sum("a") * F.sum("d") < F.sum("b") * F.sum("c"), -1)
        .otherwise(0)
        .alias("osgn")
    )
    return strata.crossJoin(F.broadcast(overall)).select(
        F.col("y").alias("stratum_year"),
        F.col("a").cast("bigint").alias("n_urgent_hi"),
        F.col("b").cast("bigint").alias("n_urgent_lo"),
        F.col("c").cast("bigint").alias("n_other_hi"),
        F.col("d").cast("bigint").alias("n_other_lo"),
        F.col("sgn").cast("bigint").alias("stratum_sign"),
        F.col("osgn").cast("bigint").alias("overall_sign"),
        F.when(F.col("sgn") * F.col("osgn") == -1, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("reversed"),
    )
