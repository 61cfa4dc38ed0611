"""Round-5 widening queries, twenty-sixth batch (SURVEY.md §2.13, X334-X338).

Inter-rater reliability, survival summarization, retrieval evaluation,
count-model fitting, and embedding-graph structure:

- X334 Krippendorff's alpha (nominal): per-user dominant behavior
  across three 10-day periods as the ratings; coincidence and
  expectation both carried as DOUBLED integers (m-1 divides 2 for
  m in {2,3}), missing periods handled natively — the general
  inter-rater statistic beyond X238's two-rater kappa.
- X335 restricted mean survival time (RMST): area under X224's
  Kaplan-Meier step curve up to a 14-day horizon — the "days of
  life expectancy gained" summary clinicians quote when hazards
  aren't proportional; step heights from the micro-log discipline.
- X336 exact average precision (area under the PR curve): the
  retrieval twin of X150's ROC AUC — per-relevant-rank precision
  micro-rounds on the two-pass global rank, deterministic total
  order (score DESC, event_id).
- X337 zero-inflated Poisson moment fit: closed-form method of
  moments (lambda = (S2-S1)/S1, pi = 1 - S1^2/(n(S2-S1)) — exact
  integer moment sums, two float divisions), fitted-vs-observed
  zero mass as the goodness check.
- X338 mutual top-1 neighbor census: reciprocal nearest-neighbor
  pairs over the embedding table (the dedup/alignment primitive:
  RNN pairs are the highest-precision merge candidates) with the
  L4 ROUND(sim,4)+id ranking discipline.

Reference parity note: engine extensions per SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.cumulative import ordered_cumsum
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X334: Krippendorff's alpha (nominal) ------------------------------------


@register(
    "q_krippendorff_alpha",
    oracle="""
    WITH cnts AS (
        SELECT user_id,
               CASE WHEN day(ts) <= 10 THEN 0
                    WHEN day(ts) <= 20 THEN 1 ELSE 2 END AS period,
               event_type, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2, 3
    ),
    ratings AS (
        SELECT user_id, period, event_type AS val
        FROM (SELECT user_id, period, event_type, cnt,
                     ROW_NUMBER() OVER (PARTITION BY user_id, period
                                        ORDER BY cnt DESC, event_type DESC)
                         AS rn
              FROM cnts)
        WHERE rn = 1
    ),
    per_val AS (
        SELECT user_id, val, COUNT(*) AS k
        FROM ratings GROUP BY user_id, val
    ),
    per_unit AS (
        SELECT user_id, SUM(k) AS m, SUM(k * k) AS sumk2
        FROM per_val GROUP BY user_id
    ),
    kept AS (SELECT * FROM per_unit WHERE m >= 2),
    obs AS (
        SELECT CAST(SUM((2 * (m * m - sumk2)) // (m - 1)) AS BIGINT) AS s_o2,
               CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(SUM(m) AS BIGINT) AS n
        FROM kept
    ),
    marg AS (
        SELECT CAST(SUM(nc * nc) AS BIGINT) AS sn2
        FROM (SELECT p.val, SUM(p.k) AS nc
              FROM per_val p JOIN kept k ON k.user_id = p.user_id
              GROUP BY p.val)
    )
    SELECT o.n_units, o.n AS n_ratings, o.s_o2,
           CAST(ROUND(1000000.0
                      * (1 - CAST((o.n - 1) * o.s_o2 AS DOUBLE)
                             / (2 * (o.n * o.n - m.sn2)))) AS BIGINT)
               AS alpha_micro
    FROM obs o CROSS JOIN marg m
    """,
)
def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X334: Krippendorff's alpha (nominal), exact doubled-integer form.

    Units = users, raters = three 10-day periods, rating = the user's
    modal event type that period (X107's deterministic mode, tie-break
    max type); a user inactive in a period is simply missing — the
    case alpha (unlike X238's kappa) is DEFINED for. Per unit with m
    ratings, the doubled disagreement coincidence 2(m^2 - sum k_c^2)/
    (m-1) is an exact integer for m in {2,3}; expected disagreement is
    n^2 - sum n_c^2 over the doubled... marginals are plain rating
    counts, so alpha = 1 - (n-1) S_o2 / (2 (n^2 - sum n_c^2)) needs
    ONE float division. The inter-rater reliability gate an annotation
    pipeline runs before trusting labels.

    100 TB: one (user, period, type) combine, two user-grain
    aggregates, 1-row output — no windows beyond the keyed mode rank.
    """
    e = table(spark, sf_dir, "events")
    period = (
        F.when(F.dayofmonth("ts") <= 10, 0)
        .when(F.dayofmonth("ts") <= 20, 1)
        .otherwise(2)
    )
    cnts = e.groupBy(
        "user_id", period.alias("period"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("user_id", "period").orderBy(
        F.desc("cnt"), F.desc("event_type")
    )
    ratings = (
        cnts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "period", F.col("event_type").alias("val"))
    )
    # per_val and kept feed BOTH the observed-disagreement branch and
    # the marginals branch — checkpoint so the mode-rank pipeline runs
    # once (the X12/graph lineage discipline).
    per_val = (
        ratings.groupBy("user_id", "val")
        .agg(F.count("*").alias("k"))
        .localCheckpoint(eager=True)
    )
    per_unit = per_val.groupBy("user_id").agg(
        F.sum("k").alias("m"), F.sum(F.col("k") * F.col("k")).alias("sumk2")
    )
    kept = per_unit.where(F.col("m") >= 2).localCheckpoint(eager=True)
    obs = kept.agg(
        F.sum(F.expr("(2 * (m * m - sumk2)) div (m - 1)"))
        .cast("bigint")
        .alias("s_o2"),
        F.count("*").cast("bigint").alias("n_units"),
        F.sum("m").cast("bigint").alias("n"),
    )
    marg = (
        per_val.join(kept.select("user_id"), "user_id")
        .groupBy("val")
        .agg(F.sum("k").alias("nc"))
        .agg(F.sum(F.col("nc") * F.col("nc")).cast("bigint").alias("sn2"))
    )
    o, n = F.col("s_o2"), F.col("n")
    return obs.crossJoin(F.broadcast(marg)).select(
        "n_units",
        n.alias("n_ratings"),
        "s_o2",
        F.round(
            F.lit(1000000.0)
            * (
                F.lit(1)
                - ((n - 1) * o).cast("double") / (2 * (n * n - F.col("sn2")))
            )
        )
        .cast("bigint")
        .alias("alpha_micro"),
    )


# --- X335: restricted mean survival time -------------------------------------

_RMST_TAU = 7


@register(
    "q_rmst",
    oracle=f"""
    WITH users AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d,
               MAX(CAST(ts AS DATE)) AS last_d,
               MIN(CASE WHEN event_type = 'error'
                        THEN CAST(ts AS DATE) END) AS err_d
        FROM events GROUP BY user_id
    ),
    durs AS (
        SELECT CASE WHEN err_d IS NOT NULL
                    THEN date_diff('day', first_d, err_d)
                    ELSE date_diff('day', first_d, last_d) END AS dur,
               CASE WHEN err_d IS NOT NULL THEN 1 ELSE 0 END AS churned
        FROM users
    ),
    per_t AS (
        SELECT dur, COUNT(*) AS n_here,
               CAST(SUM(churned) AS BIGINT) AS n_events
        FROM durs GROUP BY dur
    ),
    risk AS (
        SELECT dur, n_events,
               CAST(SUM(n_here) OVER (ORDER BY dur DESC) AS BIGINT)
                   AS n_at_risk
        FROM per_t
    ),
    terms AS (
        SELECT dur,
               CAST(ROUND(LN(CAST(n_at_risk - n_events AS DOUBLE)
                             / n_at_risk) * 1000000) AS BIGINT) AS term
        FROM risk
        WHERE n_events > 0 AND n_at_risk > n_events
    ),
    steps AS (
        SELECT dur,
               CAST(ROUND(EXP(CAST(SUM(term) OVER (ORDER BY dur) AS DOUBLE)
                              / 1000000.0) * 1000000) AS BIGINT) AS s_micro,
               LEAD(dur) OVER (ORDER BY dur) AS next_dur
        FROM terms
    ),
    within AS (SELECT * FROM steps WHERE dur < {_RMST_TAU}),
    agg AS (
        SELECT COUNT(*) AS n_steps,
               COALESCE(MIN(dur), {_RMST_TAU}) AS first_dur,
               COALESCE(SUM(s_micro
                            * (LEAST(COALESCE(next_dur, {_RMST_TAU}),
                                     {_RMST_TAU}) - dur)), 0) AS area
        FROM within
    )
    SELECT CAST({_RMST_TAU} AS BIGINT) AS tau_days,
           CAST(n_steps AS BIGINT) AS n_steps,
           CAST(1000000 * LEAST(first_dur, {_RMST_TAU}) + area AS BIGINT)
               AS rmst_micro_days
    FROM agg
    """,
)
def q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X335: restricted mean survival time (area under the KM curve).

    RMST(tau) = integral of X224's product-limit survival from 0 to
    tau = sum of step heights times step widths — the single-number
    survival summary that stays meaningful when hazards cross (where
    a median or hazard ratio misleads). Failure time = days from a
    user's first activity to their first 'error' event, censored at
    last activity when none occurred (X224's churn framing is
    degenerate at sf0.01 — nobody churns — so this uses the failure
    clock that has real events at every scale). Step heights come
    from the SAME micro-log discipline as X224 (each ln micro-rounds,
    the product is an integer sum, one EXP back out per step), widths
    are exact day gaps clamped at tau=7; the pre-first-event interval
    rides at survival 1.

    100 TB: identical plan shape to X224 — user-grain aggregate, then
    every window lives on the <= |distinct durations| relation.
    """
    e = table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_d"),
        F.max(F.col("ts").cast("date")).alias("last_d"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("ts").cast("date"))
        ).alias("err_d"),
    )
    durs = users.select(
        F.when(
            F.col("err_d").isNotNull(), F.datediff("err_d", "first_d")
        )
        .otherwise(F.datediff("last_d", "first_d"))
        .alias("dur"),
        F.when(F.col("err_d").isNotNull(), 1).otherwise(0).alias("churned"),
    )
    per_t = durs.groupBy("dur").agg(
        F.count("*").alias("n_here"),
        F.sum("churned").cast("bigint").alias("n_events"),
    )
    w_desc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_t.select(
        "dur",
        "n_events",
        F.sum("n_here").over(w_desc).cast("bigint").alias("n_at_risk"),
    )
    terms = risk.where(
        (F.col("n_events") > 0) & (F.col("n_at_risk") > F.col("n_events"))
    ).select(
        "dur",
        F.round(
            F.log(
                (F.col("n_at_risk") - F.col("n_events")).cast("double")
                / F.col("n_at_risk")
            )
            * 1000000
        )
        .cast("bigint")
        .alias("term"),
    )
    w_asc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    steps = terms.select(
        "dur",
        F.round(
            F.exp(F.sum("term").over(w_asc).cast("double") / F.lit(1000000.0))
            * 1000000
        )
        .cast("bigint")
        .alias("s_micro"),
        F.lead("dur").over(Window.orderBy("dur")).alias("next_dur"),
    )
    within = steps.where(F.col("dur") < _RMST_TAU)
    tau = F.lit(_RMST_TAU)
    agg = within.agg(
        F.count("*").cast("bigint").alias("n_steps"),
        F.coalesce(F.min("dur"), tau).alias("first_dur"),
        F.coalesce(
            F.sum(
                F.col("s_micro")
                * (
                    F.least(F.coalesce(F.col("next_dur"), tau), tau)
                    - F.col("dur")
                )
            ),
            F.lit(0),
        ).alias("area"),
    )
    return agg.select(
        tau.cast("bigint").alias("tau_days"),
        "n_steps",
        (F.lit(1000000) * F.least(F.col("first_dur"), tau) + F.col("area"))
        .cast("bigint")
        .alias("rmst_micro_days"),
    )


# --- X336: exact average precision -------------------------------------------


@register(
    "q_average_precision",
    oracle="""
    WITH scored AS (
        SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS score,
               event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel
        FROM events
    ),
    ranked AS (
        SELECT rel,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, event_id)
                    AS BIGINT) AS k,
               CAST(SUM(rel) OVER (ORDER BY score DESC, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cumrel
        FROM scored
    ),
    tot AS (SELECT CAST(SUM(rel) AS BIGINT) AS r,
                   CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
    terms AS (
        SELECT CAST(ROUND(1000000.0 * cumrel / k) AS BIGINT) AS term
        FROM ranked WHERE rel = 1
    )
    SELECT t.r AS n_pos,
           CAST(ROUND(CAST(SUM(term) AS DOUBLE) / t.r) AS BIGINT)
               AS ap_micro,
           CAST(ROUND(1000000.0 * t.r / t.n) AS BIGINT)
               AS prevalence_micro
    FROM terms CROSS JOIN tot t
    GROUP BY t.r, t.n
    """,
)
def q_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X336: exact average precision (area under the PR curve).

    The retrieval-side twin of X150's ROC AUC: AP = mean over relevant
    ranks of precision@k under the deterministic total order (score
    DESC, event_id) — the class-imbalance-honest metric (its baseline
    is the prevalence, reported beside it, where AUC's is always 0.5).
    Each precision@k is ONE float division micro-rounded on the
    two-pass global rank; the final mean is one more division.

    100 TB: ordered_cumsum's range-partitioned rank (zero
    single-partition windows), then a 1-row aggregate over the
    relevant rows only.
    """
    e = table(spark, sf_dir, "events")
    scored = e.select(
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("score"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("rel"),
    ).withColumn("negscore", -F.col("score"))
    ranked = ordered_cumsum(
        scored,
        order_by=["negscore", "event_id"],
        values={"rel": "cumrel"},
        row_number_col="k",
    ).select("rel", F.col("k").cast("bigint").alias("k"), "cumrel")
    tot = F.broadcast(
        ranked.agg(
            F.sum("rel").cast("bigint").alias("r"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    terms = ranked.where(F.col("rel") == 1).select(
        F.round(F.lit(1000000.0) * F.col("cumrel") / F.col("k"))
        .cast("bigint")
        .alias("term")
    )
    return (
        terms.crossJoin(tot)
        .groupBy("r", "n")
        .agg(F.sum("term").alias("s"))
        .select(
            F.col("r").alias("n_pos"),
            F.round(F.col("s").cast("double") / F.col("r"))
            .cast("bigint")
            .alias("ap_micro"),
            F.round(F.lit(1000000.0) * F.col("r") / F.col("n"))
            .cast("bigint")
            .alias("prevalence_micro"),
        )
    )


# --- X337: zero-inflated Poisson moment fit ----------------------------------


@register(
    "q_zip_fit",
    oracle="""
    WITH per_user AS (
        SELECT u.user_id,
               CAST(COALESCE(p.k, 0) AS BIGINT) AS k
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN (SELECT user_id, COUNT(*) AS k FROM events
                   WHERE event_type = 'purchase' GROUP BY user_id) p
          ON p.user_id = u.user_id
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(k) AS BIGINT) AS s1,
               CAST(SUM(k * k) AS BIGINT) AS s2,
               CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero
        FROM per_user
    )
    SELECT n, s1, s2, n_zero,
           CAST(ROUND(1000000.0 * (s2 - s1) / s1) AS BIGINT)
               AS lambda_micro,
           CAST(ROUND(1000000.0
                      * (1 - CAST(s1 * s1 AS DOUBLE) / (n * (s2 - s1))))
                AS BIGINT) AS pi_micro,
           CAST(ROUND(10000.0 * n_zero / n) AS BIGINT) AS observed_zero_bp,
           CAST(ROUND(10000.0
                      * ((1 - CAST(s1 * s1 AS DOUBLE) / (n * (s2 - s1)))
                         + (CAST(s1 * s1 AS DOUBLE) / (n * (s2 - s1)))
                           * EXP(-(CAST(s2 - s1 AS DOUBLE) / s1))))
                AS BIGINT) AS fitted_zero_bp
    FROM s
    """,
)
def q_zip_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X337: zero-inflated Poisson fit by closed-form moments.

    Per-user purchase counts (zeros included — the users the zero
    inflation models): method of moments gives lambda = (S2-S1)/S1
    and pi = 1 - S1^2/(n(S2-S1)) in closed form — no EM iteration
    anywhere. The fitted zero mass pi + (1-pi)e^-lambda against the
    observed zero share is the one-glance goodness check (a gap means
    the excess-zeros story is wrong). Moment sums are exact integers;
    lambda/pi are one float division each, the fitted zero one EXP of
    an identical double on both engines.

    100 TB: one user-grain aggregate, 1-row output.
    """
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("k")
    )
    s = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("s1"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("s2"),
        F.sum(F.when(F.col("k") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    pi_d = F.lit(1) - (s1 * s1).cast("double") / (n * (s2 - s1))
    lam_d = (s2 - s1).cast("double") / s1
    return s.select(
        "n",
        "s1",
        "s2",
        "n_zero",
        F.round(F.lit(1000000.0) * (s2 - s1) / s1)
        .cast("bigint")
        .alias("lambda_micro"),
        F.round(F.lit(1000000.0) * pi_d).cast("bigint").alias("pi_micro"),
        F.round(F.lit(10000.0) * F.col("n_zero") / n)
        .cast("bigint")
        .alias("observed_zero_bp"),
        F.round(
            F.lit(10000.0) * (pi_d + (F.lit(1) - pi_d) * F.exp(-lam_d))
        )
        .cast("bigint")
        .alias("fitted_zero_bp"),
    )


# --- X338: mutual top-1 neighbor census --------------------------------------


@register(
    "q_mutual_nn",
    tags=("pairs",),
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst, b.label AS dst_label,
               ROUND(list_cosine_similarity(a.v, b.v), 4) AS sim
        FROM e a JOIN e b ON b.vec_id <> a.vec_id
    ),
    top1 AS (
        SELECT src, dst, sim
        FROM (SELECT src, dst, sim,
                     ROW_NUMBER() OVER (PARTITION BY src
                                        ORDER BY sim DESC, dst) AS rn
              FROM scored)
        WHERE rn = 1
    ),
    mutual AS (
        SELECT a.src AS lo, a.dst AS hi, a.sim
        FROM top1 a JOIN top1 b ON b.src = a.dst AND b.dst = a.src
        WHERE a.src < a.dst
    )
    SELECT m.lo, m.hi, m.sim,
           CASE WHEN el.label = eh.label THEN 1 ELSE 0 END AS same_label
    FROM mutual m
    JOIN embeddings el ON el.vec_id = m.lo
    JOIN embeddings eh ON eh.vec_id = m.hi
    ORDER BY m.lo
    """,
)
def q_mutual_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X338: mutual (reciprocal) top-1 neighbor pairs over embeddings.

    A pair (a, b) is mutual when each is the other's single nearest
    neighbor by cosine — the highest-precision merge candidates in
    semantic dedup / bitext alignment (far stronger evidence than a
    one-sided threshold like L4's). Ranking follows the L4 discipline:
    ROUND(sim, 4) with the vec_id tiebreaker keeps the float ranking
    cross-engine stable; label agreement is reported per pair as the
    cluster-purity signal.

    100 TB: one side broadcasts per X157's grid; top-1 is a keyed
    window (|vectors| partitions); the mutuality check is a self
    equi-join of the |vectors|-row top-1 relation. At scale the pair
    generation passes through the IVF cell join (X2) first — the
    mutuality algebra is unchanged.
    """
    emb = table(spark, sf_dir, "embeddings")
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(dbl(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    left = emb.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("sv"),
        norm("embedding").alias("sn"),
    )
    right = emb.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("dv"),
        norm("embedding").alias("dn"),
    )
    dot = F.aggregate(
        F.zip_with(dbl(F.col("sv")), dbl(F.col("dv")), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        left.join(F.broadcast(right), F.col("dst") != F.col("src"))
        .select(
            "src",
            "dst",
            F.round(dot / (F.col("sn") * F.col("dn")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    top1 = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("src", "dst", "sim")
        .localCheckpoint(eager=True)
    )
    a, b = top1.alias("a"), top1.alias("b")
    mutual = (
        a.join(
            b,
            (F.col("b.src") == F.col("a.dst"))
            & (F.col("b.dst") == F.col("a.src")),
        )
        .where(F.col("a.src") < F.col("a.dst"))
        .select(
            F.col("a.src").alias("lo"),
            F.col("a.dst").alias("hi"),
            F.col("a.sim").alias("sim"),
        )
    )
    lab = emb.select("vec_id", "label")
    return (
        mutual.join(
            F.broadcast(lab.select(F.col("vec_id").alias("lo"), F.col("label").alias("ll"))),
            "lo",
        )
        .join(
            F.broadcast(lab.select(F.col("vec_id").alias("hi"), F.col("label").alias("lh"))),
            "hi",
        )
        .select(
            "lo",
            "hi",
            "sim",
            F.when(F.col("ll") == F.col("lh"), 1).otherwise(0).alias("same_label"),
        )
        .orderBy("lo")
    )
