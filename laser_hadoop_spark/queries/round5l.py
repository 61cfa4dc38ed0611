"""Round-5 widening queries, twelfth batch (SURVEY.md §2.13, X258-X262).

k-sample inference, variance decomposition, sequence matching, and the
correlogram:

- X258 Kruskal-Wallis: the k-sample rank ANOVA (Mann-Whitney/X125's
  k-group generalization) with exact doubled tie-averaged ranks over
  distinct values — no fact-cardinality window, tie factor exact.
- X259 variance explained (eta-squared) by factor: SSB/SST per
  grouping factor through DECIMAL(38) sums — 'which dimension
  explains revenue variance' as an exact dashboard number.
- X260 event-sequence pattern match: ClickHouse-sequenceMatch-style
  ordered LIKE patterns over per-user event-type strings — funnel
  membership without k self-joins.
- X261 autocorrelation function (correlogram) at lags 1..14: X126's
  lag-1 generalized to the full short-horizon ACF via one
  calendar-shift self-join.
- X262 chi-squared standardized residuals: WHICH cells drive X109's
  significance — residual = (o*N - rt*ct) / isqrt(rt*ct*N), the
  single-isqrt exact form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X258: Kruskal-Wallis ---------------------------------------------------

_KW_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@register(
    "q_kruskal_wallis",
    oracle=f"""
    WITH base AS (
        SELECT CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS v,
               c.c_mktsegment AS seg
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    vals AS (
        SELECT v,
               {", ".join(
                   f"SUM(CASE WHEN seg = '{s}' THEN 1 ELSE 0 END) AS c{i}"
                   for i, s in enumerate(_KW_SEGS)
               )},
               COUNT(*) AS ct
        FROM base GROUP BY v
    ),
    cum AS (
        SELECT v, {", ".join(f"c{i}" for i in range(len(_KW_SEGS)))}, ct,
               SUM(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cumt
        FROM vals
    ),
    ranks AS (
        SELECT
            {", ".join(
                f"SUM(c{i} * (2 * cumt - ct + 1)) AS tr{i}"
                for i in range(len(_KW_SEGS))
            )},
            {", ".join(f"SUM(c{i}) AS n{i}" for i in range(len(_KW_SEGS)))},
            SUM(ct) AS n,
            SUM(CAST(ct AS HUGEINT) * ct * ct - ct) AS ties
        FROM cum
    ),
    h AS (
        SELECT n,
               12000000 * ({" + ".join(
                   f"CAST(tr{i} AS HUGEINT) * tr{i} // (4 * n{i})"
                   for i in range(len(_KW_SEGS))
               )}) // (n * (n + 1)) - 3000000 * (n + 1) AS h_micro,
               1000000 - 1000000 * ties // (CAST(n AS HUGEINT) * n * n - n)
                   AS tie_factor_micro
        FROM ranks
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST({len(_KW_SEGS) - 1} AS BIGINT) AS df,
           CAST(h_micro AS BIGINT) AS h_micro,
           CAST(tie_factor_micro AS BIGINT) AS tie_factor_micro,
           CAST(1000000 * h_micro // tie_factor_micro AS BIGINT)
               AS h_adj_micro
    FROM h
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X258: Kruskal-Wallis k-sample rank test, exactly verified.

    Do the five market segments draw order values from the same
    distribution? The rank ANOVA generalizing Mann-Whitney (X125) to
    k groups: tie-averaged ranks kept exact by doubling (2*avg_rank
    = 2*min_rank + c - 1, X125's trick), per-group rank sums from the
    distinct-value cumulative — the Spark plan runs ordered_cumsum's
    two-pass range-partitioned cumulative, never a fact window. The
    per-group squared-rank-sum divisions truncate (<1 each,
    identically on both engines); H and the exact tie factor
    1 - sum(t^3-t)/(N^3-N) emit in micro, with the tie-adjusted H
    from one more integer division.

    100 TB shape: one distinct-value aggregate (map-side combine),
    the two-pass cumulative, then 1-row arithmetic. Compare X109
    (independence), X198 (medians), X124/X125 (two-sample shapes).
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
        F.col("c_mktsegment").alias("seg"),
    )
    vals = base.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("seg") == s, 1).otherwise(0)).alias(f"c{i}")
            for i, s in enumerate(_KW_SEGS)
        ],
        F.count("*").alias("ct"),
    )
    cum = ordered_cumsum(vals, order_by=["v"], values={"ct": "cumt"})
    ranks = cum.agg(
        *[
            F.sum(
                F.col(f"c{i}") * (2 * F.col("cumt") - F.col("ct") + 1)
            ).alias(f"tr{i}")
            for i in range(len(_KW_SEGS))
        ],
        *[F.sum(f"c{i}").alias(f"n{i}") for i in range(len(_KW_SEGS))],
        F.sum("ct").alias("n"),
        F.sum(
            F.col("ct").cast("decimal(38,0)") * F.col("ct") * F.col("ct")
            - F.col("ct")
        ).alias("ties"),
    )
    # Spark's DIV on DECIMAL operands returns BIGINT and silently
    # wraps when the integral quotient exceeds int64 (probed) — so
    # every division whose quotient can outgrow int64 is spelled as
    # the exact decimal floor-division (a - a % b) / b, which stays
    # DECIMAL end-to-end and equals DuckDB's HUGEINT // for the
    # nonnegative operands here.
    terms = " + ".join(
        f"CAST((CAST(tr{i} AS DECIMAL(38,0)) * tr{i}"
        f" - CAST(tr{i} AS DECIMAL(38,0)) * tr{i} % (4 * n{i}))"
        f" / (4 * n{i}) AS DECIMAL(38,0))"
        for i in range(len(_KW_SEGS))
    )
    h = ranks.select(
        "n",
        F.expr(
            f"CAST(12000000 AS DECIMAL(38,0)) * ({terms})"
            f" DIV (n * (n + 1)) - 3000000 * (n + 1)"
        ).alias("h_micro"),
        F.expr(
            "1000000 - CAST(1000000 AS DECIMAL(38,0)) * ties"
            " DIV (CAST(n AS DECIMAL(38,0)) * n * n - n)"
        ).alias("tie_factor_micro"),
    )
    return h.select(
        F.col("n").cast("bigint").alias("n"),
        F.lit(len(_KW_SEGS) - 1).cast("bigint").alias("df"),
        F.col("h_micro").cast("bigint").alias("h_micro"),
        F.col("tie_factor_micro").cast("bigint").alias("tie_factor_micro"),
        F.expr(
            "CAST(1000000 * h_micro DIV tie_factor_micro AS BIGINT)"
        ).alias("h_adj_micro"),
    )


# --- X259: variance explained (eta-squared) by factor -----------------------


@register(
    "q_eta_squared",
    oracle="""
    WITH base AS (
        SELECT CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS x,
               CAST(year(CAST(o.o_orderdate AS DATE)) AS VARCHAR) AS fa,
               c.c_mktsegment AS fb
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    long AS (
        SELECT 'order_year' AS factor, fa AS g, x FROM base
        UNION ALL
        SELECT 'mktsegment', fb, x FROM base
    ),
    grp AS (
        SELECT factor, g, COUNT(*) AS ng, SUM(x) AS sg
        FROM long GROUP BY factor, g
    ),
    tot AS (
        SELECT factor, SUM(ng) AS n, SUM(sg) AS s,
               SUM(CAST(sg AS HUGEINT) * sg // ng) AS ssb_part
        FROM grp GROUP BY factor
    ),
    sq AS (
        SELECT factor, SUM(CAST(x AS HUGEINT) * x) AS sxx
        FROM long GROUP BY factor
    )
    SELECT t.factor,
           CAST(COUNT_G.k AS BIGINT) AS n_groups,
           CAST(10000 * (t.ssb_part - CAST(t.s AS HUGEINT) * t.s // t.n)
                // (q.sxx - CAST(t.s AS HUGEINT) * t.s // t.n) AS BIGINT)
               AS eta2_bp
    FROM tot t
    JOIN sq q ON q.factor = t.factor
    JOIN (SELECT factor, COUNT(*) AS k FROM grp GROUP BY factor) COUNT_G
      ON COUNT_G.factor = t.factor
    """,
)
def q_eta_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X259: variance explained (eta-squared) per grouping factor.

    Which dimension explains order-value variance — order year or
    market segment? eta^2 = SSB/SST with SSB = sum((Sg)^2/ng) - S^2/N
    and SST = sum(x^2) - S^2/N, all sums exact through
    HUGEINT/DECIMAL(38) with one truncating DIV per group (identical
    truncation both engines). The effect-size companion to the
    inference family: X109 says 'dependent', eta^2 says 'by how
    much' — near-zero eta^2 with a significant chi2 is the
    large-sample trap this pair of numbers exposes.

    100 TB shape: one stacked scan per factor (union of projections,
    map-side combine to |groups| rows); the x^2 sums ride the same
    aggregates; final arithmetic on |factors| rows.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
        F.year(F.col("o_orderdate").cast("date"))
        .cast("string")
        .alias("fa"),
        F.col("c_mktsegment").alias("fb"),
    )
    long = base.select(
        F.lit("order_year").alias("factor"), F.col("fa").alias("g"), "x"
    ).unionAll(
        base.select(F.lit("mktsegment"), F.col("fb"), "x")
    )
    grp = long.groupBy("factor", "g").agg(
        F.count("*").alias("ng"), F.sum("x").alias("sg")
    )
    # exact decimal floor-division (a - a % b) / b everywhere a
    # quotient can exceed int64 — Spark's decimal DIV returns BIGINT
    # and wraps silently (probed; same fix as q_kruskal_wallis)
    fd = (
        lambda a, b: f"CAST((({a}) - ({a}) % ({b})) / ({b})"
        f" AS DECIMAL(38,0))"
    )
    tot = grp.groupBy("factor").agg(
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum(
            F.expr(fd("CAST(sg AS DECIMAL(38,0)) * sg", "ng"))
        ).alias("ssb_part"),
        F.count("*").alias("k"),
    )
    sq = long.groupBy("factor").agg(
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx")
    )
    s2n = fd("CAST(s AS DECIMAL(38,0)) * s", "n")
    return tot.join(sq, "factor").select(
        "factor",
        F.col("k").cast("bigint").alias("n_groups"),
        F.expr(
            f"CAST(CAST(10000 AS DECIMAL(38,0)) * (ssb_part - {s2n})"
            f" DIV (sxx - {s2n}) AS BIGINT)"
        ).alias("eta2_bp"),
    )


# --- X260: event-sequence pattern match -------------------------------------

_SEQ_PATTERNS = [
    ("view_then_purchase", "%v%p%"),
    ("signup_click_purchase", "%s%c%p%"),
    ("error_then_purchase", "%e%p%"),
]


@register(
    "q_sequence_match",
    oracle=f"""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substring(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT pattern, CAST(n_users AS BIGINT) AS n_users,
           CAST(n_total AS BIGINT) AS n_total
    FROM (
        {" UNION ALL ".join(
            f"SELECT '{name}' AS pattern,"
            f" SUM(CASE WHEN seq LIKE '{pat}' THEN 1 ELSE 0 END) AS n_users,"
            f" COUNT(*) AS n_total FROM seqs"
            for name, pat in _SEQ_PATTERNS
        )}
    ) u
    """,
)
def q_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X260: ordered event-sequence pattern matching (sequenceMatch).

    Funnel membership without k self-joins: each user's event history
    collapses to an ordered type string (first letters, (ts,
    event_id) order), and 'view then later purchase' is the LIKE
    pattern %v%p% — the ClickHouse sequenceMatch idea expressed in
    portable SQL. Three patterns evaluate as conditional counts over
    ONE sequence relation; contrast X88's window funnel (which
    re-joins per stage) — this form pays the user shuffle once for
    any number of patterns.

    100 TB shape: one groupBy(user) with an ordered string aggregate
    (array_sort of (ts, event_id, char) structs — Spark's
    deterministic spelling of ORDER BY inside an aggregate), then a
    scan-local LIKE census. Sequence length is bounded by per-user
    activity; a terabyte-scale user would want the X8 token-window
    chunking first.
    """
    e = table(spark, sf_dir, "events")
    seqs = (
        e.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"),
                F.substring("event_type", 1, 1).alias("ch"),
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("rec")), lambda r: r["ch"]
                ),
                "",
            ).alias("seq")
        )
    )
    parts = [
        seqs.agg(
            F.lit(name).alias("pattern"),
            F.sum(
                F.when(F.col("seq").like(pat), 1).otherwise(0)
            ).alias("n_users"),
            F.count("*").alias("n_total"),
        )
        for name, pat in _SEQ_PATTERNS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "pattern",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_total").cast("bigint").alias("n_total"),
    )


# --- X261: autocorrelation function (correlogram) ---------------------------

_ACF_MAX_LAG = 14


@register(
    "q_acf",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    lags AS (SELECT UNNEST(generate_series(1, {_ACF_MAX_LAG})) AS lag),
    pairs AS (
        SELECT g.lag, a.rev AS x, b.rev AS y
        FROM daily a
        CROSS JOIN lags g
        JOIN daily b ON b.d = a.d + g.lag * INTERVAL 1 DAY
    ),
    s AS (
        SELECT lag, COUNT(*) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           ROUND(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                        * CAST(CAST(n AS HUGEINT) * syy - sy * sy
                               AS DOUBLE)), 4) AS r
    FROM s
    """,
)
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X261: autocorrelation function of daily revenue, lags 1..14.

    X126's lag-1 coefficient generalized to the correlogram — the
    weekly-seasonality fingerprint (a spike at lag 7 IS the weekly
    cycle X86/X192 measure differently). Lag semantics are
    calendar-day shifts (a self-join on d + lag), not row shifts, so
    date gaps shorten the pair set instead of silently misaligning
    it. Sums are exact through HUGEINT/DECIMAL(38); each r rounds
    once at 1e-4 from identical exact integers (X126's spelling).

    100 TB shape: the fact collapses to the calendar-bounded daily
    relation first; the 14-lag fanout and self-join run over
    |days| x 14 rows — trivially small at any corpus scale.
    """
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("rev")
        )
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("b.d")
            == F.expr("date_add(a.d, lag)"),
        )
        .select(
            "lag", F.col("a.rev").alias("x"), F.col("b.rev").alias("y")
        )
    )
    dec = lambda col: f"CAST({col} AS DECIMAL(38,0))"
    s = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum(F.expr(dec("x"))).alias("sx"),
        F.sum(F.expr(dec("y"))).alias("sy"),
        F.sum(F.expr(f"{dec('x')} * x")).alias("sxx"),
        F.sum(F.expr(f"{dec('y')} * y")).alias("syy"),
        F.sum(F.expr(f"{dec('x')} * y")).alias("sxy"),
    )
    return s.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.expr(
            "ROUND(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"
            " / SQRT(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx"
            " AS DOUBLE)"
            " * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)),"
            " 4)"
        ).alias("r"),
    )


# --- X262: chi-squared standardized residuals -------------------------------


@register(
    "q_chi2_residuals",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cells AS (SELECT seg, pri, COUNT(*) AS o FROM base GROUP BY seg, pri),
    rows_t AS (SELECT seg, SUM(o) AS rt FROM cells GROUP BY seg),
    cols_t AS (SELECT pri, SUM(o) AS ct FROM cells GROUP BY pri),
    n_t AS (SELECT SUM(o) AS n FROM cells)
    SELECT c.seg, c.pri, CAST(c.o AS BIGINT) AS observed,
           CAST(r.rt * ct.ct // t.n AS BIGINT) AS expected,
           CAST(1000 * (c.o * t.n - r.rt * ct.ct)
                // CAST(FLOOR(SQRT(CAST(r.rt * ct.ct * t.n AS DOUBLE)))
                        AS BIGINT) AS BIGINT) AS resid_milli
    FROM cells c
    JOIN rows_t r ON r.seg = c.seg
    JOIN cols_t ct ON ct.pri = c.pri
    CROSS JOIN n_t t
    """,
)
def q_chi2_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X262: standardized residuals of the segment x priority table.

    X109 says WHETHER segment and priority are dependent; the
    standardized residual (o - e)/sqrt(e) per cell says WHERE.
    Exact form: (o - e)/sqrt(e) with e = rt*ct/N rearranges to
    (o*N - rt*ct) / sqrt(rt*ct*N) — ONE isqrt of an exact integer
    (FLOOR(SQRT()) on an identical double both engines), everything
    else integral; |resid| > 2 (resid_milli beyond +-2000) flags a
    driving cell.

    100 TB shape: one conditional-agg fact pass to |seg|x|pri| cells;
    margins re-aggregate the tiny cell relation; all joins broadcast.
    """
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("pri"),
    )
    cells = base.groupBy("seg", "pri").agg(F.count("*").alias("o"))
    rows_t = cells.groupBy("seg").agg(F.sum("o").alias("rt"))
    cols_t = cells.groupBy("pri").agg(F.sum("o").alias("ct"))
    n_t = cells.agg(F.sum("o").alias("n"))
    return (
        cells.join(F.broadcast(rows_t), "seg")
        .join(F.broadcast(cols_t), "pri")
        .crossJoin(F.broadcast(n_t))
        .select(
            "seg",
            "pri",
            F.col("o").cast("bigint").alias("observed"),
            F.expr("CAST(rt * ct DIV n AS BIGINT)").alias("expected"),
            F.expr(
                "CAST(1000 * (o * n - rt * ct)"
                " DIV CAST(FLOOR(SQRT(CAST(rt * ct * n AS DOUBLE)))"
                " AS BIGINT) AS BIGINT)"
            ).alias("resid_milli"),
        )
    )
