"""Round-5 widening queries, fifth batch (SURVEY.md §2.13, X223-X227).

- X223 greedy set-cover corpus selection: 3 exactly-verified greedy
  max-coverage iterations (pick the source covering the most uncovered
  shingles) — the coverage-driven data-selection loop.
- X224 Kaplan-Meier survival (product-limit): the multiplicative
  sibling of X137's Nelson-Aalen, kept exact via the X197 fixed-point
  log discipline (cumulative log-survival in micro).
- X225 frequent triple itemsets: X62's market basket extended to
  3-itemsets at brand granularity — the A-priori candidate step.
- X226 sorted-neighborhood record linkage: the OTHER classic blocking
  strategy (X205 blocks by hash key; this sorts within a block and
  compares only rank-neighbors).
- X227 quantile treatment effect (QTE): per-arm deciles via the
  zero-fact-shuffle ordered_quantiles operator, differenced — the
  distributional completion of the X77/X182 experimentation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X223: greedy set-cover corpus selection -------------------------------


def _setcover_oracle() -> str:
    head = """
    WITH toks AS (
        SELECT source, string_split(text, ' ') AS t FROM documents
    ), flat AS (
        SELECT source,
               UNNEST(list_transform(generate_series(1, len(t) - 2),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   AS s
        FROM toks
    ), r1 AS (
        SELECT DISTINCT source, md5(s) AS sh FROM flat
    )"""
    steps = []
    for t in (1, 2, 3):
        prev = f"r{t}"
        steps.append(
            f"""
    w{t} AS (
        SELECT source, COUNT(*) AS c FROM {prev} GROUP BY source
        ORDER BY c DESC, source LIMIT 1
    )"""
        )
        if t < 3:
            steps.append(
                f"""
    cov{t} AS (
        SELECT DISTINCT x.sh FROM {prev} x JOIN w{t} USING (source)
    ),
    r{t + 1} AS (
        SELECT r.* FROM {prev} r
        WHERE NOT EXISTS (SELECT 1 FROM cov{t} c WHERE c.sh = r.sh)
    )"""
            )
    return (
        head
        + ","
        + ",".join(steps)
        + """
    SELECT 1 AS step, w1.source, CAST(w1.c AS BIGINT) AS n_new_covered,
           CAST(w1.c AS BIGINT) AS cum_covered
    FROM w1
    UNION ALL
    SELECT 2, w2.source, CAST(w2.c AS BIGINT), CAST(w1.c + w2.c AS BIGINT)
    FROM w1, w2
    UNION ALL
    SELECT 3, w3.source, CAST(w3.c AS BIGINT),
           CAST(w1.c + w2.c + w3.c AS BIGINT)
    FROM w1, w2, w3
    """
    )


@register("q_set_cover", oracle=_setcover_oracle())
def q_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X223: greedy set-cover corpus selection, three exactly-verified
    iterations.

    The coverage-driven data-selection loop: each round picks the
    SOURCE whose documents cover the most not-yet-covered 3-gram
    shingles (ties to source name), then removes everything it covers.
    This is the greedy (1-1/e)-approximation every corpus-dedup /
    budget-selection pipeline runs; three unrolled rounds under X50's
    verified-iteration discipline, reporting marginal and cumulative
    coverage per pick.

    100 TB: the live relation is (source, 16-byte shingle digest)
    DISTINCT — digests on the wire, never text; each round is one
    per-source count, a 1-row winner broadcast, and one anti-join that
    only ever SHRINKS the relation; lineage is truncated per round.
    """
    from laser_hadoop_spark.operators.dedup import word_shingles

    d = table(spark, sf_dir, "documents")
    r = (
        d.select("source", F.explode(word_shingles("text", 3)).alias("s"))
        .select("source", F.md5("s").alias("sh"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    winners = []
    for step in (1, 2, 3):
        w = (
            r.groupBy("source")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "source")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        winners.append(w)
        if step < 3:
            cov = r.join(F.broadcast(w.select("source")), "source").select("sh")
            r = r.join(cov, "sh", "left_anti").localCheckpoint(eager=True)
    w1, w2, w3 = (
        w.select(
            F.col("source").alias(f"s{i+1}"), F.col("c").alias(f"c{i+1}")
        )
        for i, w in enumerate(winners)
    )
    base = w1.crossJoin(w2).crossJoin(w3)
    rows = [
        base.select(
            F.lit(1).alias("step"),
            F.col("s1").alias("source"),
            F.col("c1").cast("bigint").alias("n_new_covered"),
            F.col("c1").cast("bigint").alias("cum_covered"),
        ),
        base.select(
            F.lit(2).alias("step"),
            F.col("s2").alias("source"),
            F.col("c2").cast("bigint").alias("n_new_covered"),
            (F.col("c1") + F.col("c2")).cast("bigint").alias("cum_covered"),
        ),
        base.select(
            F.lit(3).alias("step"),
            F.col("s3").alias("source"),
            F.col("c3").cast("bigint").alias("n_new_covered"),
            (F.col("c1") + F.col("c2") + F.col("c3"))
            .cast("bigint")
            .alias("cum_covered"),
        ),
    ]
    out = rows[0]
    for df in rows[1:]:
        out = out.unionByName(df)
    return out


# --- X224: Kaplan-Meier survival (product-limit) ---------------------------

_KM_CHURN_DAYS = 7


@register(
    "q_km_survival",
    oracle=f"""
    WITH users AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d,
               MAX(CAST(ts AS DATE)) AS last_d
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(last_d) AS m FROM users),
    durs AS (
        SELECT date_diff('day', first_d, last_d) AS dur,
               CASE WHEN date_diff('day', last_d, m) >= {_KM_CHURN_DAYS}
                    THEN 1 ELSE 0 END AS churned
        FROM users CROSS JOIN horizon
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
        SELECT dur, n_at_risk, n_events,
               CAST(ROUND(LN(CAST(n_at_risk - n_events AS DOUBLE)
                             / n_at_risk) * 1000000) AS BIGINT) AS term
        FROM risk
        WHERE n_events > 0 AND n_at_risk > n_events
    )
    SELECT CAST(dur AS BIGINT) AS duration_days, n_at_risk, n_events,
           CAST(SUM(term) OVER (ORDER BY dur) AS BIGINT) AS km_log_micro
    FROM terms
    """,
)
def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X224: Kaplan-Meier product-limit survival, fixed-point exact.

    The multiplicative sibling of X137's Nelson-Aalen cumulative
    hazard: per user, duration = days between first and last activity,
    "churned" if inactive >= 7 days before the corpus horizon (else
    censored at their duration). At each event time t: at-risk n_t =
    users with duration >= t, events d_t = churns at t; survival
    S(t) = prod(1 - d/n) is carried as the CUMULATIVE LOG in micro
    (each factor's single ln micro-rounds first — X197's fixed-point
    discipline — so the product is an integer sum no float ordering
    can flip). The terminal all-churn row (S=0, log undefined) is
    excluded by both engines.

    100 TB: one user aggregate (shuffle on user_id), then everything
    lives on the <= |distinct durations| relation — the at-risk counts
    are a reverse cumulative over the tiny per-duration table, never a
    per-user window.
    """
    e = table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_d"),
        F.max(F.col("ts").cast("date")).alias("last_d"),
    )
    horizon = users.agg(F.max("last_d").alias("m"))
    durs = users.crossJoin(F.broadcast(horizon)).select(
        F.datediff("last_d", "first_d").alias("dur"),
        F.when(
            F.datediff(F.col("m"), F.col("last_d")) >= _KM_CHURN_DAYS, 1
        )
        .otherwise(0)
        .alias("churned"),
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
        "n_at_risk",
        "n_events",
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
    return terms.select(
        F.col("dur").cast("bigint").alias("duration_days"),
        "n_at_risk",
        "n_events",
        F.sum("term").over(w_asc).cast("bigint").alias("km_log_micro"),
    )


# --- X225: frequent triple itemsets (A-priori step) ------------------------


# Bounded sweep variant (VERDICT_r11 item 5, q_damerau_pairs
# precedent): the DuckDB oracle's per-order triple self-join costs
# sum-over-orders C(brands,3) — 223 s at sf0.1, all oracle-side cost —
# so above driver scale BOTH sides restrict to the same deterministic
# md5 eighth-sample of orderkeys (first hex nibble in {0,1} => 1/8 of
# orders => 1/8 of the triple fanout). Support counts shrink but the
# top-20 ordering ties break deterministically (support DESC, then
# lexicographic), so the bounded hash match certifies the identical
# Spark kernel; the driver (sf0.01) always runs the full oracle.
_ITEMSET_SAMPLE_NIBBLES = ("0", "1")
_ITEMSET_SAMPLE_SQL = (
    "substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')"
)


def _itemset_triples_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_itemset_triples restricted to the deterministic md5 order sample."""
    sample = F.substring(
        F.md5(F.col("l_orderkey").cast("string")), 1, 1
    ).isin(*_ITEMSET_SAMPLE_NIBBLES)
    return _itemset_triples(spark, sf_dir, order_filter=sample)


@register(
    "q_itemset_triples",
    tags=("pairs",),
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    tri AS (
        SELECT a.b AS b1, bb.b AS b2, c.b AS b3, COUNT(*) AS support
        FROM ob a
        JOIN ob bb ON bb.ok = a.ok AND bb.b > a.b
        JOIN ob c ON c.ok = a.ok AND c.b > bb.b
        GROUP BY 1, 2, 3
    )
    SELECT b1, b2, b3, CAST(support AS BIGINT) AS support
    FROM tri
    ORDER BY support DESC, b1, b2, b3
    LIMIT 20
    """,
    bounded_fn=_itemset_triples_bounded,
    bounded_oracle=f"""
    -- MATERIALIZED is load-bearing: ob is referenced three times and
    -- DuckDB otherwise inlines the md5-filtered join into each —
    -- measured >180 s inlined vs 10.9 s materialized at sf0.1
    WITH ob AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE {_ITEMSET_SAMPLE_SQL}
    ),
    tri AS (
        SELECT a.b AS b1, bb.b AS b2, c.b AS b3, COUNT(*) AS support
        FROM ob a
        JOIN ob bb ON bb.ok = a.ok AND bb.b > a.b
        JOIN ob c ON c.ok = a.ok AND c.b > bb.b
        GROUP BY 1, 2, 3
    )
    SELECT b1, b2, b3, CAST(support AS BIGINT) AS support
    FROM tri
    ORDER BY support DESC, b1, b2, b3
    LIMIT 20
    """,
)
def q_itemset_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X225: frequent 3-itemsets at brand granularity — the A-priori
    candidate-generation step above X62's pair rules.

    Distinct brands per order, all ordered brand triples within an
    order (b1 < b2 < b3 so each set counts once), support counts,
    deterministic top-20 (support DESC, then lexicographic — ties at
    the cut cannot flip the result set).

    100 TB: the triple fanout is per-order C(brands,3) with brands
    bounded by order size — scan-local after ONE shuffle on orderkey
    that both self-joins reuse; the part dimension broadcasts. Above
    driver scale the sweep uses the registered bounded variant (same
    kernel, md5 eighth-sampled order domain on BOTH engines) because
    the oracle-side triple join dominates the sf0.1 sweep — see
    _ITEMSET_SAMPLE_SQL.
    """
    return _itemset_triples(spark, sf_dir)


def _itemset_triples(
    spark: SparkSession, sf_dir: str, order_filter=None
) -> DataFrame:
    """Shared kernel for the full + bounded forms: the only difference
    is an optional pre-filter on the lineitem order domain."""
    li = table(spark, sf_dir, "lineitem")
    if order_filter is not None:
        li = li.where(order_filter)
    p = table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
    )
    a, bb, c = ob.alias("a"), ob.alias("bb"), ob.alias("c")
    tri = (
        a.join(
            bb,
            (F.col("bb.ok") == F.col("a.ok")) & (F.col("bb.b") > F.col("a.b")),
        )
        .join(
            c,
            (F.col("c.ok") == F.col("a.ok")) & (F.col("c.b") > F.col("bb.b")),
        )
        .groupBy(
            F.col("a.b").alias("b1"),
            F.col("bb.b").alias("b2"),
            F.col("c.b").alias("b3"),
        )
        .agg(F.count("*").cast("bigint").alias("support"))
    )
    return tri.orderBy(F.desc("support"), "b1", "b2", "b3").limit(20)


# --- X226: sorted-neighborhood record linkage ------------------------------

_SN_WINDOW = 2
_SN_BAL_TOL = 50_000  # centi-units


@register(
    "q_sorted_neighborhood",
    oracle=f"""
    WITH r AS (
        SELECT c_custkey, c_nationkey, c_name, c_mktsegment,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_name, c_custkey) AS rk
        FROM customer
    ),
    pairs AS (
        SELECT a.c_nationkey AS nation,
               CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END
             + CASE WHEN ABS(a.bal - b.bal) <= {_SN_BAL_TOL} THEN 1 ELSE 0 END
             + CASE WHEN substring(a.c_name, 1, 6) = substring(b.c_name, 1, 6)
                    THEN 1 ELSE 0 END AS score
        FROM r a JOIN r b
          ON b.c_nationkey = a.c_nationkey
         AND b.rk - a.rk BETWEEN 1 AND {_SN_WINDOW}
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           COUNT(*) AS n_candidates,
           CAST(SUM(CASE WHEN score >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matches
    FROM pairs GROUP BY 1
    """,
)
def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X226: sorted-neighborhood record linkage census.

    The OTHER classic blocking strategy (X205 blocks on a hash key and
    compares everything inside a block): sort each nation block by
    name and compare only records within rank distance <= 2 — O(n*w)
    candidates instead of O(sum block^2). Agreement score over
    segment / balance-within-500 / 6-char name prefix; census of
    candidates and matches (score >= 2) per nation.

    100 TB: ONE shuffle on the block key serves the rank window and
    both sides of the neighbor self-join (reused exchange); candidate
    count is linear in rows x window, immune to block skew — exactly
    why sorted-neighborhood exists.
    """
    cust = table(spark, sf_dir, "customer")
    rk = F.row_number().over(
        Window.partitionBy("c_nationkey").orderBy("c_name", "c_custkey")
    )
    r = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_name",
        "c_mktsegment",
        F.expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)").alias("bal"),
        rk.alias("rk"),
    )
    a, b = r.alias("a"), r.alias("b")
    score = (
        F.when(F.col("a.c_mktsegment") == F.col("b.c_mktsegment"), 1)
        .otherwise(0)
        + F.when(
            F.abs(F.col("a.bal") - F.col("b.bal")) <= _SN_BAL_TOL, 1
        ).otherwise(0)
        + F.when(
            F.substring(F.col("a.c_name"), 1, 6)
            == F.substring(F.col("b.c_name"), 1, 6),
            1,
        ).otherwise(0)
    )
    pairs = a.join(
        b,
        (F.col("b.c_nationkey") == F.col("a.c_nationkey"))
        & (F.col("b.rk") - F.col("a.rk")).between(1, _SN_WINDOW),
    ).select(F.col("a.c_nationkey").alias("nation"), score.alias("score"))
    return pairs.groupBy(F.col("nation").cast("bigint").alias("nation")).agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.when(F.col("score") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_matches"),
    )


# --- X227: quantile treatment effect (QTE) ---------------------------------

_QTE_FRACTIONS = tuple((k, 10) for k in range(1, 10))


def _qte_oracle() -> str:
    arm = (
        "('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 6))::BIGINT % 2"
    )
    return f"""
    WITH v AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi,
               {arm} AS arm
        FROM orders
    ),
    r AS (
        SELECT arm, centi,
               ROW_NUMBER() OVER (PARTITION BY arm ORDER BY centi) AS rn,
               COUNT(*) OVER (PARTITION BY arm) AS n
        FROM v
    ),
    q AS (SELECT UNNEST(generate_series(1, 9)) AS num),
    qq AS (
        SELECT r.arm, q.num, MIN(r.centi) AS qv
        FROM r JOIN q ON 10 * r.rn >= q.num * r.n
        GROUP BY r.arm, q.num
    )
    SELECT CAST(c.num AS BIGINT) AS q_num, CAST(10 AS BIGINT) AS q_den,
           CAST(c.qv AS BIGINT) AS control_cents,
           CAST(t.qv AS BIGINT) AS treat_cents,
           CAST(t.qv - c.qv AS BIGINT) AS qte_cents
    FROM qq c JOIN qq t ON t.num = c.num AND t.arm = 1
    WHERE c.arm = 0
    """


@register("q_qte_deciles", oracle=_qte_oracle())
def q_qte_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X227: quantile treatment effect at the nine deciles.

    The distributional completion of the experimentation family (X77
    tests the mean via proportions, X182 de-noises it; QTE shows
    WHERE in the distribution an effect lives). Arms are an md5 parity
    split of customers (deterministic, both engines identical); each
    arm's deciles come from operators/cumulative.ordered_quantiles —
    the histogram-pruned two-scan operator with ZERO fact shuffles —
    then treat minus control per decile.

    100 TB: 2 arms x 2 pruned scans, no sort, no fact shuffle; the
    oracle is the definitional per-arm global rank, so hash equality
    proves the pruning lossless on a filtered (per-arm) relation too.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_quantiles

    o = table(spark, sf_dir, "orders").select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "centi"
        ),
        F.expr(
            "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 6), "
            "16, 10) AS BIGINT) % 2"
        ).alias("arm"),
    )
    qs = []
    for arm in (0, 1):
        q = ordered_quantiles(
            o.where(F.col("arm") == arm).select("centi"),
            value_col="centi",
            quantiles=_QTE_FRACTIONS,
        ).select(
            "q_num",
            F.col("quantile_value").alias(f"arm{arm}_q"),
        )
        qs.append(q)
    return (
        qs[0]
        .join(qs[1], "q_num")
        .select(
            F.col("q_num").cast("bigint").alias("q_num"),
            F.lit(10).cast("bigint").alias("q_den"),
            F.col("arm0_q").cast("bigint").alias("control_cents"),
            F.col("arm1_q").cast("bigint").alias("treat_cents"),
            (F.col("arm1_q") - F.col("arm0_q"))
            .cast("bigint")
            .alias("qte_cents"),
        )
    )
