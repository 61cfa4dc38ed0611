"""Round-5 widening queries, eighth batch (SURVEY.md §2.13, X238-X242).

Agreement, multiple testing, and information-theoretic drift — the
label-QA and experimentation-governance layer over the existing
two-sample (X124/X125/X198) and divergence (X197/X211) families:

- X238 Cohen's kappa: chance-corrected agreement between two
  deterministic document-quality raters — the inter-annotator QA
  gate every labeling pipeline needs, exact rational arithmetic.
- X239 Benjamini-Hochberg FDR gate: step-up multiple-testing control
  over per-user sign-balance tests with Chebyshev-conservative exact
  p-values — thousands of simultaneous metrics without alpha decay,
  BH rank scan via the two-pass cumulative operator (no global
  window).
- X240 Jensen-Shannon divergence: the symmetric, bounded drift
  measure between the two largest sources' token distributions
  (KL/X211's bounded sibling), same micro-ln fixed point.
- X241 transition conditional entropy: H(next | current) per state
  over the event stream — the information measure of X76's Markov
  matrix, with per-state uniformity ratio.
- X242 Cramer-von Mises two-sample: the integrated-ECDF companion of
  KS (X124) — sensitive to distribution-body shifts KS's single
  supremum misses; exact DECIMAL(38) integer statistic over distinct
  values, zero fact-cardinality windows.

Cross-engine discipline unchanged: centi-unit money bigints, one
fixed-point rounding per float, DIV == //, deterministic tiebreaks,
identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X238: Cohen's kappa ----------------------------------------------------

_KAPPA_CHARS = 300  # rater A: document length in chars
_KAPPA_WORDS = 55  # rater B: whitespace word count


@register(
    "q_cohens_kappa",
    oracle=f"""
    WITH rated AS (
        SELECT CASE WHEN n_chars >= {_KAPPA_CHARS} THEN 1 ELSE 0 END AS ra,
               CASE WHEN length(text) - length(replace(text, ' ', '')) + 1
                         >= {_KAPPA_WORDS} THEN 1 ELSE 0 END AS rb
        FROM documents
    ),
    cells AS (
        SELECT COUNT(*) AS n,
               SUM(ra * rb) AS n11,
               SUM(ra * (1 - rb)) AS n10,
               SUM((1 - ra) * rb) AS n01,
               SUM((1 - ra) * (1 - rb)) AS n00
        FROM rated
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           CAST(10000 * (n11 + n00) // n AS BIGINT) AS po_bp,
           CAST(10000 * ((n11 + n10) * (n11 + n01)
                         + (n00 + n01) * (n00 + n10)) // (n * n)
                AS BIGINT) AS pe_bp,
           CAST(1000000 * (n * (n11 + n00)
                           - ((n11 + n10) * (n11 + n01)
                              + (n00 + n01) * (n00 + n10)))
                // (n * n - ((n11 + n10) * (n11 + n01)
                             + (n00 + n01) * (n00 + n10)))
                AS BIGINT) AS kappa_micro
    FROM cells
    """,
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X238: Cohen's kappa between two deterministic quality raters.

    Rater A flags a document when n_chars >= 300; rater B when the
    whitespace word count >= 55. Kappa = (po - pe) / (1 - pe) kept as
    one exact rational: kappa_micro = 1e6 * (n*agree - cross) DIV
    (n^2 - cross) where cross = r1*c1 + r0*c0 — no float share ever
    exists, so the chance-corrected agreement is cross-engine exact.
    The inter-annotator QA gate for labeling pipelines: po_bp alone
    overstates agreement whenever the label marginals are skewed.

    100 TB shape: a single conditional-aggregate scan (five sums, one
    pass, map-side combine); the kappa arithmetic runs on a 1-row
    relation. Nothing shuffles but five bigints per task.
    """
    d = table(spark, sf_dir, "documents")
    words = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    rated = d.select(
        F.when(F.col("n_chars") >= _KAPPA_CHARS, 1).otherwise(0).alias("ra"),
        F.when(words >= _KAPPA_WORDS, 1).otherwise(0).alias("rb"),
    )
    cells = rated.agg(
        F.count("*").alias("n"),
        F.sum(F.col("ra") * F.col("rb")).alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).alias("n00"),
    )
    return cells.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n11").cast("bigint").alias("n11"),
        F.col("n10").cast("bigint").alias("n10"),
        F.col("n01").cast("bigint").alias("n01"),
        F.col("n00").cast("bigint").alias("n00"),
        F.expr("10000 * (n11 + n00) DIV n").cast("bigint").alias("po_bp"),
        F.expr(
            "CAST(10000 * ((n11 + n10) * (n11 + n01)"
            " + (n00 + n01) * (n00 + n10)) DIV (n * n) AS BIGINT)"
        ).alias("pe_bp"),
        F.expr(
            "CAST(1000000 * (n * (n11 + n00)"
            " - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)))"
            " DIV (n * n - ((n11 + n10) * (n11 + n01)"
            " + (n00 + n01) * (n00 + n10))) AS BIGINT)"
        ).alias("kappa_micro"),
    )


# --- X239: Benjamini-Hochberg FDR gate --------------------------------------

_BH_MIN_N = 20  # minimum informative events per user
_BH_ALPHA_BP = 500  # alpha = 5% in basis points


@register(
    "q_bh_fdr",
    oracle=f"""
    WITH cents AS (
        SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
        FROM events
    ),
    mu AS (SELECT SUM(c) // COUNT(*) AS mean_c FROM cents),
    per_user AS (
        SELECT user_id,
               SUM(CASE WHEN c > m.mean_c THEN 1 ELSE 0 END) AS k,
               SUM(CASE WHEN c <> m.mean_c THEN 1 ELSE 0 END) AS ne
        FROM cents CROSS JOIN mu m
        GROUP BY user_id
        HAVING SUM(CASE WHEN c <> m.mean_c THEN 1 ELSE 0 END) >= {_BH_MIN_N}
    ),
    pvals AS (
        SELECT user_id,
               CASE WHEN 2 * k = ne THEN 10000
                    ELSE LEAST(10000, 10000 * ne
                               // ((2 * k - ne) * (2 * k - ne)))
               END AS p_bp
        FROM per_user
    ),
    m AS (SELECT COUNT(*) AS m FROM pvals),
    grouped AS (
        SELECT p_bp, COUNT(*) AS cnt FROM pvals GROUP BY p_bp
    ),
    cum AS (
        SELECT p_bp, cnt,
               SUM(cnt) OVER (ORDER BY p_bp ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS rk
        FROM grouped
    )
    SELECT CAST(MIN(m.m) AS BIGINT) AS m,
           CAST(COALESCE(MAX(CASE WHEN p_bp * m.m <= {_BH_ALPHA_BP} * rk
                                  THEN rk END), 0) AS BIGINT) AS n_reject_bh,
           CAST(COALESCE(MAX(CASE WHEN p_bp * m.m <= {_BH_ALPHA_BP} * rk
                                  THEN p_bp END), 0) AS BIGINT)
               AS p_threshold_bp,
           CAST(COALESCE(SUM(CASE WHEN p_bp * m.m <= {_BH_ALPHA_BP}
                                  THEN cnt ELSE 0 END), 0) AS BIGINT)
               AS n_reject_bonferroni
    FROM cum CROSS JOIN m
    """,
)
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X239: Benjamini-Hochberg step-up FDR gate, exactly verified.

    Per-user sign test against the global mean event value: k of the
    user's ne informative events exceed it. The p-value is the
    Chebyshev bound p = min(1, ne / (2k - ne)^2) — conservative but
    EXACT as an integer-bp rational, so the whole multiple-testing
    procedure (which is usually float-soft) becomes hash-verifiable.
    BH step-up: reject the r smallest p-values where r is the largest
    rank with p_(r) * m <= alpha * r. Bonferroni count reported for
    contrast (BH >= Bonferroni always — a free internal check).

    100 TB shape: one fact shuffle (per-user aggregate); the BH rank
    scan runs over DISTINCT p-values through ordered_cumsum's
    range-partitioned two-pass cumulative — within a tie block only
    the largest rank matters for the step-up rule, so grouping by
    p-value first is lossless and the global-window spelling in the
    oracle never appears in the Spark plan. Scales to billions of
    simultaneous tests.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    e = table(spark, sf_dir, "events")
    cents = e.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
    )
    mu = cents.agg(F.expr("SUM(c) DIV COUNT(*)").alias("mean_c"))
    per_user = (
        cents.crossJoin(F.broadcast(mu))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("c") > F.col("mean_c"), 1).otherwise(0)).alias(
                "k"
            ),
            F.sum(F.when(F.col("c") != F.col("mean_c"), 1).otherwise(0)).alias(
                "ne"
            ),
        )
        .where(F.col("ne") >= _BH_MIN_N)
    )
    pvals = per_user.select(
        F.when(2 * F.col("k") == F.col("ne"), F.lit(10000))
        .otherwise(
            F.least(
                F.lit(10000),
                F.expr("10000 * ne DIV ((2 * k - ne) * (2 * k - ne))"),
            )
        )
        .alias("p_bp")
    )
    grouped = pvals.groupBy("p_bp").agg(F.count("*").alias("cnt"))
    cum = ordered_cumsum(grouped, order_by=["p_bp"], values={"cnt": "rk"})
    m = pvals.agg(F.count("*").alias("m"))
    sat = F.col("p_bp") * F.col("m") <= _BH_ALPHA_BP * F.col("rk")
    return (
        cum.crossJoin(F.broadcast(m))
        .agg(
            F.min("m").cast("bigint").alias("m"),
            F.coalesce(F.max(F.when(sat, F.col("rk"))), F.lit(0))
            .cast("bigint")
            .alias("n_reject_bh"),
            F.coalesce(F.max(F.when(sat, F.col("p_bp"))), F.lit(0))
            .cast("bigint")
            .alias("p_threshold_bp"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("p_bp") * F.col("m") <= _BH_ALPHA_BP,
                        F.col("cnt"),
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_reject_bonferroni"),
        )
    )


# --- X240: Jensen-Shannon divergence ----------------------------------------

_JS_VOCAB = 40


@register(
    "q_js_divergence",
    oracle=f"""
    WITH ranked_src AS (
        SELECT source, COUNT(*) AS dc FROM documents GROUP BY source
        ORDER BY dc DESC, source LIMIT 2
    ),
    pair AS (
        SELECT MIN(source) AS src_a, MAX(source) AS src_b FROM ranked_src
    ),
    toks AS (
        SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    gcnt AS (SELECT tok, COUNT(*) AS gc FROM toks GROUP BY tok),
    vocab AS (
        SELECT tok FROM gcnt ORDER BY gc DESC, tok LIMIT {_JS_VOCAB}
    ),
    cnts AS (
        SELECT t.tok,
               SUM(CASE WHEN t.source = p.src_a THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN t.source = p.src_b THEN 1 ELSE 0 END) AS cb
        FROM toks t JOIN vocab v ON v.tok = t.tok CROSS JOIN pair p
        WHERE t.source = p.src_a OR t.source = p.src_b
        GROUP BY t.tok
    ),
    tot AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM cnts),
    shares AS (
        SELECT 10000 * ca // t.ta AS p_bp, 10000 * cb // t.tb AS q_bp
        FROM cnts CROSS JOIN tot t
    ),
    terms AS (
        SELECT CASE WHEN p_bp > 0 THEN
                   p_bp * CAST(ROUND(LN(2.0 * p_bp / (p_bp + q_bp))
                                     * 1000000) AS BIGINT) // 10000
               ELSE 0 END AS tp,
               CASE WHEN q_bp > 0 THEN
                   q_bp * CAST(ROUND(LN(2.0 * q_bp / (p_bp + q_bp))
                                     * 1000000) AS BIGINT) // 10000
               ELSE 0 END AS tq
        FROM shares WHERE p_bp + q_bp > 0
    )
    SELECT p.src_a, p.src_b,
           CAST(COUNT(*) AS BIGINT) AS n_vocab_used,
           CAST((SUM(tp) + SUM(tq)) // 2 AS BIGINT) AS js_micro
    FROM terms CROSS JOIN pair p
    GROUP BY p.src_a, p.src_b
    """,
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X240: Jensen-Shannon divergence between the two largest sources.

    JS(p, q) = (KL(p||m) + KL(q||m)) / 2 with m the midpoint — the
    symmetric, ln(2)-bounded drift measure (KL/X211 is asymmetric and
    unbounded, useless as a dashboard number when a token vanishes
    from one side). Token shares over the global top-40 vocabulary in
    exact bp; each ln(2p/(p+q)) rounds once at 1e-6 (PSI/X197
    discipline) so both engines see identical bigints. Zero-share
    tokens contribute only through the present side — JS needs no
    smoothing, which is exactly why it's the production drift metric.

    100 TB shape: token counting is the scan-local explode +
    map-side-combining aggregate every text query here uses; the
    vocabulary is a top-k over the aggregated term table; the JS
    arithmetic runs on <= 40 rows. Source-pair selection is a 2-row
    broadcast.
    """
    d = table(spark, sf_dir, "documents")
    ranked_src = (
        d.groupBy("source")
        .agg(F.count("*").alias("dc"))
        .orderBy(F.desc("dc"), "source")
        .limit(2)
    )
    pair = ranked_src.agg(
        F.min("source").alias("src_a"), F.max("source").alias("src_b")
    )
    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("gc"))
        .orderBy(F.desc("gc"), "tok")
        .limit(_JS_VOCAB)
        .select("tok")
    )
    cnts = (
        toks.join(F.broadcast(pair))
        .where(
            (F.col("source") == F.col("src_a"))
            | (F.col("source") == F.col("src_b"))
        )
        .join(F.broadcast(vocab), "tok")
        .groupBy("tok")
        .agg(
            F.sum(
                F.when(F.col("source") == F.col("src_a"), 1).otherwise(0)
            ).alias("ca"),
            F.sum(
                F.when(F.col("source") == F.col("src_b"), 1).otherwise(0)
            ).alias("cb"),
        )
    )
    tot = cnts.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    shares = cnts.crossJoin(F.broadcast(tot)).select(
        F.expr("10000 * ca DIV ta").alias("p_bp"),
        F.expr("10000 * cb DIV tb").alias("q_bp"),
    )
    terms = shares.where(F.col("p_bp") + F.col("q_bp") > 0).select(
        F.when(
            F.col("p_bp") > 0,
            F.expr(
                "p_bp * CAST(ROUND(LN(2.0 * p_bp / (p_bp + q_bp))"
                " * 1000000) AS BIGINT) DIV 10000"
            ),
        )
        .otherwise(0)
        .alias("tp"),
        F.when(
            F.col("q_bp") > 0,
            F.expr(
                "q_bp * CAST(ROUND(LN(2.0 * q_bp / (p_bp + q_bp))"
                " * 1000000) AS BIGINT) DIV 10000"
            ),
        )
        .otherwise(0)
        .alias("tq"),
    )
    return (
        terms.crossJoin(F.broadcast(pair))
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").cast("bigint").alias("n_vocab_used"),
            F.expr("CAST((SUM(tp) + SUM(tq)) DIV 2 AS BIGINT)").alias(
                "js_micro"
            ),
        )
    )


# --- X241: transition conditional entropy -----------------------------------


@register(
    "q_transition_entropy",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    pairs AS (
        SELECT event_type AS cur, nxt FROM seq WHERE nxt IS NOT NULL
    ),
    cells AS (
        SELECT cur, nxt, COUNT(*) AS n_cn FROM pairs GROUP BY cur, nxt
    ),
    states AS (
        SELECT cur, SUM(n_cn) AS n_c, COUNT(*) AS k_next FROM cells
        GROUP BY cur
    ),
    terms AS (
        SELECT c.cur,
               c.n_cn * CAST(ROUND(LN(CAST(s.n_c AS DOUBLE) / c.n_cn)
                                   * 1000000) AS BIGINT) AS t
        FROM cells c JOIN states s ON s.cur = c.cur
    )
    SELECT s.cur, CAST(s.n_c AS BIGINT) AS n_c,
           CAST(s.k_next AS BIGINT) AS k_next,
           CAST(SUM(t.t) // s.n_c AS BIGINT) AS h_micro,
           CAST(ROUND(LN(CAST(s.k_next AS DOUBLE)) * 1000000) AS BIGINT)
               AS hmax_micro,
           CAST(CASE WHEN s.k_next = 1 THEN 10000
                ELSE LEAST(10000,
                     10000 * (SUM(t.t) // s.n_c)
                     // CAST(ROUND(LN(CAST(s.k_next AS DOUBLE)) * 1000000)
                             AS BIGINT))
                END AS BIGINT) AS uniformity_bp
    FROM terms t JOIN states s ON s.cur = t.cur
    GROUP BY s.cur, s.n_c, s.k_next
    """,
)
def q_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X241: conditional entropy H(next | current) per event state.

    The information content of X76's Markov transition matrix: per
    current state, H = -sum p(next|cur) ln p(next|cur) in micro-nats,
    computed as SUM(n_cn * ln(n_c/n_cn)) DIV n_c — counts stay
    integral, the single ln of a ratio of exact integers rounds once
    at 1e-6. uniformity_bp = H / ln(k) situates each state between
    fully deterministic (0) and uniformly random (10000) — the
    behavioral-predictability dashboard number.

    100 TB shape: one per-user window (partitioned, never global)
    produces transition pairs; everything after is a <= |types|^2-row
    relation. The lead window reuses the user shuffle that every
    sessionization query already pays.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .select(F.col("event_type").alias("cur"), "nxt")
    )
    cells = pairs.groupBy("cur", "nxt").agg(F.count("*").alias("n_cn"))
    states = cells.groupBy("cur").agg(
        F.sum("n_cn").alias("n_c"), F.count("*").alias("k_next")
    )
    terms = cells.join(F.broadcast(states), "cur").select(
        "cur",
        F.expr(
            "n_cn * CAST(ROUND(LN(CAST(n_c AS DOUBLE) / n_cn) * 1000000)"
            " AS BIGINT)"
        ).alias("t"),
    )
    hmax = F.expr(
        "CAST(ROUND(LN(CAST(k_next AS DOUBLE)) * 1000000) AS BIGINT)"
    )
    return (
        terms.groupBy("cur")
        .agg(F.sum("t").alias("ts_sum"))
        .join(F.broadcast(states), "cur")
        .select(
            "cur",
            F.col("n_c").cast("bigint").alias("n_c"),
            F.col("k_next").cast("bigint").alias("k_next"),
            F.expr("CAST(ts_sum DIV n_c AS BIGINT)").alias("h_micro"),
            hmax.alias("hmax_micro"),
            F.when(F.col("k_next") == 1, F.lit(10000))
            .otherwise(
                F.least(
                    F.lit(10000),
                    F.expr(
                        "10000 * (ts_sum DIV n_c)"
                        " DIV CAST(ROUND(LN(CAST(k_next AS DOUBLE))"
                        " * 1000000) AS BIGINT)"
                    ),
                )
            )
            .cast("bigint")
            .alias("uniformity_bp"),
        )
    )


# --- X242: Cramer-von Mises two-sample --------------------------------------


@register(
    "q_cvm_test",
    oracle="""
    WITH base AS (
        SELECT CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS v,
               CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS s1
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    vals AS (
        SELECT v, SUM(s1) AS c1, SUM(1 - s1) AS c2 FROM base GROUP BY v
    ),
    cum AS (
        SELECT c1, c2,
               SUM(c1) OVER w AS cum1, SUM(c2) OVER w AS cum2
        FROM vals
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM vals)
    SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
           CAST(CAST(SUM(CAST(c1 + c2 AS HUGEINT)
                    * (cum1 * t.n2 - cum2 * t.n1)
                    * (cum1 * t.n2 - cum2 * t.n1)) AS DECIMAL(38, 0))
                AS VARCHAR)
               AS t_scaled
    FROM cum CROSS JOIN tot t
    GROUP BY t.n1, t.n2
    """,
)
def q_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X242: Cramer-von Mises two-sample statistic, integer-exact.

    The integrated squared ECDF distance between BUILDING and
    MACHINERY order values — where KS (X124) takes the single largest
    gap, CvM sums the squared gap over every pooled observation, so
    body shifts that never produce one big gap still register.
    Evaluated over distinct values with multiplicity: t_scaled =
    sum over v of (c1+c2) * (cum1*n2 - cum2*n1)^2, an exact
    DECIMAL(38) integer = omega^2 * n1^2 * n2^2 * N (no division, no
    float; the accumulation is DECIMAL38/HUGEINT but the OUTPUT is
    VARCHAR — X133/X174/X364's wide-integer emission discipline, so
    the driver's hash never sees a Decimal-typed cell whose
    canonicalization differs across engines; driver-red in r07 when
    emitted as DECIMAL(38,0)).

    100 TB shape: same plan as KS — one distinct-value aggregate, the
    range-partitioned two-pass cumulative, a broadcast 1-row total;
    the oracle's single-partition window spelling never appears in
    the Spark plan.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum
    from laser_hadoop_spark.queries.round4c import _two_sample_values

    vals = _two_sample_values(spark, sf_dir)
    cum = ordered_cumsum(
        vals, order_by=["v"], values={"c1": "cum1", "c2": "cum2"}
    )
    tot = vals.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    diff = F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.sum(
                (F.col("c1") + F.col("c2")).cast("decimal(38,0)")
                * diff.cast("decimal(38,0)")
                * diff.cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .cast("string")
            .alias("t_scaled")
        )
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            "t_scaled",
        )
    )
