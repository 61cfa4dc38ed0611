"""Round-5 widening queries, twenty-first batch (SURVEY.md §2.13, X305-X309).

Psychometrics, inter-ranker agreement, geospatial indexing, stratified
epidemiology, and ordered-alternative testing:

- X305 Cronbach's alpha: internal-consistency reliability over the
  first 8 embedding dimensions as "items" — exact integer moment
  sums, one float at the end.
- X306 Kendall's W: concordance of three deterministic nation
  rankings (revenue, order count, customer count) — the doubled
  rank-sum trick keeps the statistic integer-exact.
- X307 geohash cell census: base32 geohash4 encoding as pure closed-
  form bit interleaving (X57's Morton trick + base32 alphabet) over
  X278's deterministic lat/lon — no geo library, no loop.
- X308 Mantel-Haenszel pooled odds ratio: X279's 2x2 stratified by
  order year with the MH weighting — the confounder-adjusted OR;
  per-stratum terms micro-round first (X197 discipline).
- X309 Jonckheere-Terpstra: ordered-alternative trend across the
  five order-priority groups via the global value census + one
  two-pass cumulative — NO per-group-pair joins (the textbook
  pairwise-U sum is reorganized into a single linear scan).

Reference parity note: engine extensions per SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.cumulative import ordered_cumsum
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X305: Cronbach's alpha ---------------------------------------------------

_CRON_K = 8


@register(
    "q_cronbach_alpha",
    oracle=f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding[1:{_CRON_K}],
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                             AS BIGINT)) AS v
        FROM embeddings
    ),
    cells AS (
        SELECT vec_id, UNNEST(generate_series(1, len(v))) AS item,
               UNNEST(v) AS x
        FROM e
    ),
    item_var AS (
        SELECT SUM(nv) AS sum_item_num FROM (
            SELECT item, COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS nv
            FROM cells GROUP BY item
        )
    ),
    totals AS (
        SELECT vec_id, SUM(x) AS t FROM cells GROUP BY vec_id
    ),
    tot_var AS (
        SELECT COUNT(*) AS n,
               COUNT(*) * SUM(t * t) - SUM(t) * SUM(t) AS tot_num
        FROM totals
    )
    SELECT CAST({_CRON_K} AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           CAST(sum_item_num AS BIGINT) AS sum_item_var_num,
           CAST(tot_num AS BIGINT) AS total_var_num,
           ROUND({_CRON_K} / ({_CRON_K} - 1.0)
                 * (1 - CAST(sum_item_num AS DOUBLE) / tot_num), 4) AS alpha
    FROM item_var CROSS JOIN tot_var
    """,
)
def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X305: Cronbach's alpha internal-consistency reliability.

    The psychometric workhorse: treat the first 8 embedding dimensions
    as scale items and each vector as a respondent; alpha =
    k/(k-1) * (1 - sum(item variances)/variance(total score)). Both
    variance families are carried as the EXACT integer numerators
    n*Sum(x^2) - Sum(x)^2 on milli-quantized values (the shared n^2
    denominators cancel in the ratio), so alpha is one float
    expression over two exact integers, rounded 4.

    100 TB: one scan-local slice+explode, one (item) aggregate
    bounded by k, one per-respondent total aggregate — all
    partial-aggregated, no windows.
    """
    emb = table(spark, sf_dir, "embeddings")
    fixed = F.transform(
        F.slice(F.col("embedding"), 1, _CRON_K),
        lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("bigint"),
    )
    cells = emb.select(
        "vec_id", F.posexplode(fixed).alias("item0", "x")
    ).select("vec_id", (F.col("item0") + 1).alias("item"), "x")
    item_num = (
        cells.groupBy("item")
        .agg(
            (
                F.count("*") * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x")
            ).alias("nv")
        )
        .agg(F.sum("nv").alias("sum_item_num"))
    )
    totals = cells.groupBy("vec_id").agg(F.sum("x").alias("t"))
    tot = totals.agg(
        F.count("*").alias("n"),
        (
            F.count("*") * F.sum(F.col("t") * F.col("t"))
            - F.sum("t") * F.sum("t")
        ).alias("tot_num"),
    )
    return item_num.crossJoin(F.broadcast(tot)).select(
        F.lit(_CRON_K).cast("bigint").alias("k"),
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_item_num").cast("bigint").alias("sum_item_var_num"),
        F.col("tot_num").cast("bigint").alias("total_var_num"),
        F.round(
            _CRON_K
            / (_CRON_K - 1.0)
            * (1 - F.col("sum_item_num").cast("double") / F.col("tot_num")),
            4,
        ).alias("alpha"),
    )


# --- X306: Kendall's W (coefficient of concordance) --------------------------


@register(
    "q_kendalls_w",
    oracle="""
    WITH met AS (
        SELECT c.c_nationkey AS nation,
               SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS rev,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT c.c_custkey) AS n_cust
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
    ),
    ranks AS (
        SELECT nation,
               ROW_NUMBER() OVER (ORDER BY rev DESC, nation) AS r1,
               ROW_NUMBER() OVER (ORDER BY n_orders DESC, nation) AS r2,
               ROW_NUMBER() OVER (ORDER BY n_cust DESC, nation) AS r3
        FROM met
    ),
    cnt AS (SELECT COUNT(*) AS n FROM ranks),
    sums AS (
        SELECT n,
               SUM((2 * (r1 + r2 + r3) - 3 * (n + 1))
                   * (2 * (r1 + r2 + r3) - 3 * (n + 1))) AS s4
        FROM ranks CROSS JOIN cnt GROUP BY n
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(s4 AS BIGINT) AS s4,
           ROUND(3.0 * s4 / (9 * (n * n * n - n)), 4) AS w
    FROM sums
    """,
)
def q_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X306: Kendall's coefficient of concordance over 3 rankings.

    Do revenue, order volume, and customer count rank the 25 nations
    the same way? W = 12*S / (m^2 (n^3 - n)) with S the squared
    deviation of rank sums from their mean m(n+1)/2. The doubled
    trick (2*R_i - m(n+1), integer because it clears the /2) keeps
    S4 = 4S an exact integer; W = 3*S4 / (m^2 (n^3-n)) is one float
    over integers, rounded 4. m=3 rankings, unique tiebreak by
    nation key (declared ranking, not a tie correction).

    100 TB: one fact aggregate to the 25-row nation relation; the
    three rankings are windows over 25 rows.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    met = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
            ).alias("rev"),
            F.count("*").alias("n_orders"),
            F.count_distinct("c_custkey").alias("n_cust"),
        )
    )
    ranks = met.select(
        "nation",
        F.row_number()
        .over(Window.orderBy(F.desc("rev"), "nation"))
        .alias("r1"),
        F.row_number()
        .over(Window.orderBy(F.desc("n_orders"), "nation"))
        .alias("r2"),
        F.row_number()
        .over(Window.orderBy(F.desc("n_cust"), "nation"))
        .alias("r3"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dev = 2 * (F.col("r1") + F.col("r2") + F.col("r3")) - 3 * (
        F.count("*").over(w_all) + 1
    )
    sums = ranks.select(dev.alias("dev")).agg(
        F.count("*").alias("n"), F.sum(F.col("dev") * F.col("dev")).alias("s4")
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("s4").cast("bigint").alias("s4"),
        F.round(
            3.0
            * F.col("s4")
            / (9 * (F.col("n") * F.col("n") * F.col("n") - F.col("n"))),
            4,
        ).alias("w"),
    )


# --- X307: geohash cell census ------------------------------------------------

_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash4_sql(lat: str, lon: str, shift: str, idiv: str) -> str:
    """Closed-form geohash4 (20 bits): quantize to 10 bits per axis,
    interleave lon-first (lon bit b -> position 2b+1), then map four
    5-bit groups MSB-first through the base32 alphabet. ``shift`` /
    ``idiv`` are the engine's right-shift and integer-division
    spellings with {x}/{n} and {a}/{b} placeholders (Spark spells
    integer division DIV, DuckDB spells it //)."""
    latq = "(" + idiv.format(a=f"(({lat}) + 90) * 1024", b="180") + ")"
    lonq = "(" + idiv.format(a=f"(({lon}) + 180) * 1024", b="360") + ")"
    terms = []
    for b in range(10):
        terms.append(f"(({shift.format(x=lonq, n=b)}) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"(({shift.format(x=latq, n=b)}) % 2) * {1 << (2 * b)}")
    v = "(" + " + ".join(terms) + ")"
    chars = [
        f"substring('{_GH_ALPHABET}', CAST(({shift.format(x=v, n=15 - 5 * i)}) % 32 AS INT) + 1, 1)"
        for i in range(4)
    ]
    return " || ".join(chars)


@register(
    "q_geohash_census",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               (('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 6))
                    ::BIGINT % 120 - 60) AS lat,
               (('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 9, 6))
                    ::BIGINT % 360 - 180) AS lon
        FROM customer
    )
    SELECT {_geohash4_sql("lat", "lon", "(({x}) >> {n})", "({a}) // ({b})")} AS geohash4,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM pts
    GROUP BY 1 ORDER BY n_points DESC, geohash4 LIMIT 50
    """,
)
def q_geohash_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X307: geohash4 cell census, closed-form bit interleaving.

    The standard geospatial index cell (base32 geohash, precision 4)
    computed with NO geo library and NO loop: each axis quantizes to
    10 bits by pure integer arithmetic, the 20-bit Morton interleave
    (X57's trick, lon-first per the geohash spec) is a sum of 20
    shift-and-mask terms folded by codegen into one projection, and
    the base32 chars are four substring probes of the alphabet
    literal. Census of X278's deterministic customer points per cell,
    top-50 densest. The same cell key is what a geo-bucketed join
    (X263 haversine radius) would shuffle on at scale.

    100 TB: scan-local encoding + one partial-aggregated census.
    """
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 6),
                16,
                10,
            ).cast("bigint")
            % 120
            - 60
        ).alias("lat"),
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 9, 6),
                16,
                10,
            ).cast("bigint")
            % 360
            - 180
        ).alias("lon"),
    )
    gh = F.expr(
        _geohash4_sql(
            "lat", "lon", "SHIFTRIGHT({x}, {n})", "({a}) DIV ({b})"
        )
    ).alias("geohash4")
    return (
        pts.select(gh)
        .groupBy("geohash4")
        .agg(F.count("*").cast("bigint").alias("n_points"))
        .orderBy(F.desc("n_points"), "geohash4")
        .limit(50)
    )


# --- X308: Mantel-Haenszel pooled odds ratio ---------------------------------


@register(
    "q_mantel_haenszel",
    oracle="""
    WITH base AS (
        SELECT YEAR(CAST(o.o_orderdate AS DATE)) AS stratum,
               CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
                   AS exposed,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS outcome
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ),
    cells AS (
        SELECT stratum,
               SUM(exposed * outcome) AS a,
               SUM(exposed * (1 - outcome)) AS b,
               SUM((1 - exposed) * outcome) AS c,
               SUM((1 - exposed) * (1 - outcome)) AS d,
               COUNT(*) AS nt
        FROM base GROUP BY stratum
    ),
    terms AS (
        SELECT stratum, a, b, c, d,
               CAST(ROUND(1000000.0 * a * d / nt) AS BIGINT) AS num_micro,
               CAST(ROUND(1000000.0 * b * c / nt) AS BIGINT) AS den_micro
        FROM cells
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(a) AS BIGINT) AS a_total,
           CAST(SUM(num_micro) AS BIGINT) AS num_sum_micro,
           CAST(SUM(den_micro) AS BIGINT) AS den_sum_micro,
           ROUND(CAST(SUM(num_micro) AS DOUBLE) / SUM(den_micro), 4)
               AS or_mh
    FROM terms
    """,
)
def q_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X308: Mantel-Haenszel pooled odds ratio across year strata.

    X279's single 2x2 (AUTOMOBILE vs BUILDING exposure, urgent-order
    outcome) confounds with time; MH pools the per-year 2x2 tables
    with weights a_i*d_i/n_i and b_i*c_i/n_i — the classic
    confounder-adjusted odds ratio. Each stratum's two terms
    micro-round FIRST (X197's fixed-point discipline), the pooled
    sums are exact integers, and the OR is one final division.

    100 TB: one fact join (dimension side broadcast), one
    partial-aggregated stratum census bounded by |years|, then
    constant-size math.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    base = (
        o.join(
            F.broadcast(
                c.where(
                    F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
                ).select("c_custkey", "c_mktsegment")
            ),
            o.o_custkey == F.col("c_custkey"),
        )
        .select(
            F.year(F.col("o_orderdate").cast("date")).alias("stratum"),
            (F.col("c_mktsegment") == "AUTOMOBILE")
            .cast("bigint")
            .alias("exposed"),
            (F.col("o_orderpriority") == "1-URGENT")
            .cast("bigint")
            .alias("outcome"),
        )
    )
    cells = base.groupBy("stratum").agg(
        F.sum(F.col("exposed") * F.col("outcome")).alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("outcome"))).alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("outcome")).alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("outcome"))).alias("d"),
        F.count("*").alias("nt"),
    )
    terms = cells.select(
        "a",
        F.round(1000000.0 * F.col("a") * F.col("d") / F.col("nt"))
        .cast("bigint")
        .alias("num_micro"),
        F.round(1000000.0 * F.col("b") * F.col("c") / F.col("nt"))
        .cast("bigint")
        .alias("den_micro"),
    )
    return terms.agg(
        F.count("*").cast("bigint").alias("n_strata"),
        F.sum("a").cast("bigint").alias("a_total"),
        F.sum("num_micro").cast("bigint").alias("num_sum_micro"),
        F.sum("den_micro").cast("bigint").alias("den_sum_micro"),
        F.round(
            F.sum("num_micro").cast("double") / F.sum("den_micro"), 4
        ).alias("or_mh"),
    )


# --- X309: Jonckheere-Terpstra ordered-alternative test ----------------------

_JT_GROUPS = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]


@register(
    "q_jonckheere",
    oracle="""
    WITH vals AS (
        SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS g,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders
    ),
    census AS (
        SELECT v,
               SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS c2,
               SUM(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS c3,
               SUM(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS c4,
               SUM(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS c5
        FROM vals GROUP BY v
    ),
    cum AS (
        SELECT v, c1, c2, c3, c4, c5,
               SUM(c1) OVER w AS k1, SUM(c2) OVER w AS k2,
               SUM(c3) OVER w AS k3, SUM(c4) OVER w AS k4
        FROM census
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    contrib AS (
        SELECT SUM(
                 c2 * (2 * (k1 - c1) + c1)
               + c3 * (2 * (k1 - c1) + c1 + 2 * (k2 - c2) + c2)
               + c4 * (2 * (k1 - c1) + c1 + 2 * (k2 - c2) + c2
                       + 2 * (k3 - c3) + c3)
               + c5 * (2 * (k1 - c1) + c1 + 2 * (k2 - c2) + c2
                       + 2 * (k3 - c3) + c3 + 2 * (k4 - c4) + c4)
               ) AS j2
        FROM cum
    ),
    sizes AS (
        SELECT SUM(cnt) AS nn, SUM(cnt * cnt) AS sq,
               SUM(cnt * cnt * (2 * cnt + 3)) AS cub
        FROM (SELECT g, COUNT(*) AS cnt FROM vals GROUP BY g)
    )
    SELECT CAST(j2 AS BIGINT) AS j2,
           CAST(nn AS BIGINT) AS n,
           ROUND((CAST(j2 AS DOUBLE) / 2 - (nn * nn - sq) / 4.0)
                 / SQRT((nn * nn * (2 * nn + 3) - cub) / 72.0), 4) AS z
    FROM contrib CROSS JOIN sizes
    """,
)
def q_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X309: Jonckheere-Terpstra test for an ordered trend in spend
    across the five priority groups.

    The ordered-alternative sibling of X258's Kruskal-Wallis: J sums
    the Mann-Whitney U over every ordered group pair. The textbook
    pairwise form is O(G^2) group-pair joins; reorganized here as ONE
    linear pass over the global value census — each distinct value's
    count in group h meets the cumulative below-counts of all lower
    groups g<h, with ties at half weight (J2 = 2J stays integer). The
    normal approximation z uses the exact integer group-size moments.

    100 TB: one value census shuffle + one two-pass cumulative over
    the distinct-value relation (ordered_cumsum — no single-partition
    fact window); group count G is a constant 5-wide projection.
    """
    o = table(spark, sf_dir, "orders")
    vals = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("v"),
    )
    census = vals.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("g") == i, 1).otherwise(0)).alias(f"c{i}")
            for i in range(1, 6)
        ]
    )
    cum = ordered_cumsum(
        census,
        order_by=["v"],
        values={f"c{i}": f"k{i}" for i in range(1, 5)},
    )

    def below(i: int) -> F.Column:
        # doubled below-count for group i at this value: 2*(strictly
        # below) + (ties at this value)
        return 2 * (F.col(f"k{i}") - F.col(f"c{i}")) + F.col(f"c{i}")

    lower = [below(1)]
    for i in (2, 3, 4):
        lower.append(lower[-1] + below(i))
    contrib = cum.agg(
        F.sum(
            F.col("c2") * lower[0]
            + F.col("c3") * lower[1]
            + F.col("c4") * lower[2]
            + F.col("c5") * lower[3]
        ).alias("j2")
    )
    sizes = (
        vals.groupBy("g")
        .agg(F.count("*").alias("cnt"))
        .agg(
            F.sum("cnt").alias("nn"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("sq"),
            F.sum(
                F.col("cnt") * F.col("cnt") * (2 * F.col("cnt") + 3)
            ).alias("cub"),
        )
    )
    # Variance moments in decimal(38,0): nn*nn*(2*nn+3) wraps int64 once
    # total orders pass ~1.66M (sf1) — DuckDB widens to HUGEINT, Spark
    # wraps silently. Same wide-decimal discipline as X340/X348.
    nn = F.col("nn").cast("decimal(38,0)")
    sq = F.col("sq").cast("decimal(38,0)")
    cub = F.col("cub").cast("decimal(38,0)")
    return contrib.crossJoin(F.broadcast(sizes)).select(
        F.col("j2").cast("bigint").alias("j2"),
        F.col("nn").cast("bigint").alias("n"),
        F.round(
            (
                F.col("j2").cast("double") / 2
                - (nn * nn - sq).cast("double") / 4.0
            )
            / F.sqrt((nn * nn * (2 * nn + 3) - cub).cast("double") / 72.0),
            4,
        ).alias("z"),
    )
