"""Round-5 widening queries, thirteenth batch (SURVEY.md §2.13, X263-X267).

Log-likelihood inference, temporal shape matching, geodesic joins, and
two operational DQ censuses:

- X263 G-test of independence: the log-likelihood-ratio sibling of
  X109's Pearson chi-squared (additive over partitions, the LLR
  collocation scorer's ancestor), micro-ln fixed point.
- X264 temporal-profile cosine: which event types share hour-of-day
  shape — exact integer dot products over 24-bin profiles, isqrt
  norms.
- X265 haversine radius join: grid-blocked great-circle distance
  join over md5-synthesized coordinates — X204's planar grid join
  lifted to the sphere with micro-rounded trig.
- X266 time-tolerance event dedup: double-fired events (same user +
  type within 1 s, distinct ids) via the +-bucket band join — the
  at-least-once-delivery DQ census.
- X267 backlog aging: unshipped-order age buckets at a cutoff date —
  the fill-rate/aging dashboard, one conditional-agg pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X263: G-test of independence -------------------------------------------


@register(
    "q_g_test",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cells AS (SELECT seg, pri, COUNT(*) AS o FROM base GROUP BY seg, pri),
    rows_t AS (SELECT seg, SUM(o) AS rt FROM cells GROUP BY seg),
    cols_t AS (SELECT pri, SUM(o) AS ct FROM cells GROUP BY pri),
    n_t AS (SELECT SUM(o) AS n FROM cells),
    terms AS (
        SELECT c.o * CAST(ROUND(LN(CAST(c.o AS DOUBLE) * t.n
                                   / (r.rt * ct.ct)) * 1000000) AS BIGINT)
                   AS term
        FROM cells c
        JOIN rows_t r ON r.seg = c.seg
        JOIN cols_t ct ON ct.pri = c.pri
        CROSS JOIN n_t t
        WHERE c.o > 0
    )
    SELECT CAST((SELECT n FROM n_t) AS BIGINT) AS n,
           CAST((SELECT (COUNT(*) - 1) FROM rows_t)
                * (SELECT (COUNT(*) - 1) FROM cols_t) AS BIGINT) AS df,
           CAST(2 * SUM(term) AS BIGINT) AS g_micro
    FROM terms
    """,
)
def q_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X263: G-test (log-likelihood ratio) of independence.

    The LLR sibling of X109's Pearson chi-squared over the same
    segment x priority table: G = 2 * sum o * ln(o*N/(rt*ct)). G is
    ADDITIVE over table partitions (chi2 is not) — the property that
    lets G-statistics from per-shard contingency tables merge exactly
    in a reduce, and the scorer behind Dunning's LLR collocation
    measure (X101's PMI is its pointwise cousin). Each ln of an exact
    integer ratio micro-rounds once (X197 discipline); everything
    else is integer.

    100 TB shape: identical to X262 — one conditional-agg fact pass
    to |seg|x|pri| cells, margins re-aggregated from the cell
    relation, broadcast joins, 1-row output arithmetic.
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
    dfr = rows_t.agg((F.count("*") - 1).alias("dr"))
    dfc = cols_t.agg((F.count("*") - 1).alias("dc"))
    terms = (
        cells.where(F.col("o") > 0)
        .join(F.broadcast(rows_t), "seg")
        .join(F.broadcast(cols_t), "pri")
        .crossJoin(F.broadcast(n_t))
        .select(
            F.expr(
                "o * CAST(ROUND(LN(CAST(o AS DOUBLE) * n / (rt * ct))"
                " * 1000000) AS BIGINT)"
            ).alias("term"),
            "n",
        )
    )
    return (
        terms.groupBy("n")
        .agg(F.expr("CAST(2 * SUM(term) AS BIGINT)").alias("g_micro"))
        .crossJoin(F.broadcast(dfr))
        .crossJoin(F.broadcast(dfc))
        .select(
            F.col("n").cast("bigint").alias("n"),
            (F.col("dr") * F.col("dc")).cast("bigint").alias("df"),
            "g_micro",
        )
    )


# --- X264: temporal-profile cosine ------------------------------------------


@register(
    "q_profile_shape_cosine",
    oracle="""
    WITH hrs AS (
        SELECT event_type AS et,
               CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT)
                   AS hr
        FROM events
    ),
    prof AS (SELECT et, hr, COUNT(*) AS n FROM hrs GROUP BY et, hr),
    pairs AS (
        SELECT a.et AS type_a, b.et AS type_b,
               SUM(a.n * b.n) AS dot
        FROM prof a JOIN prof b ON b.hr = a.hr AND a.et < b.et
        GROUP BY a.et, b.et
    ),
    norms AS (
        SELECT et, CAST(FLOOR(SQRT(CAST(SUM(n * n) AS DOUBLE))) AS BIGINT)
                   AS nrm
        FROM prof GROUP BY et
    )
    SELECT p.type_a, p.type_b,
           CAST(p.dot AS BIGINT) AS dot,
           CAST(1000 * p.dot // (na.nrm * nb.nrm) AS BIGINT)
               AS cosine_milli
    FROM pairs p
    JOIN norms na ON na.et = p.type_a
    JOIN norms nb ON nb.et = p.type_b
    """,
)
def q_profile_shape_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X264: cosine similarity between event-type hour-of-day profiles.

    Which event types share temporal shape? Each type's 24-bin
    hour-of-day histogram is a vector; pairwise cosine = dot /
    (|a|*|b|) with exact integer dot products, IEEE-exact floored
    isqrt norms, one truncating DIV to milli. High cosine between
    'click' and 'view' but not 'error' says errors follow a different
    clock — the behavioral-fingerprint comparison X256 computes
    per-type concentration for. TZ-proof modular epoch hours (X201).

    100 TB shape: the fact collapses to <= |types| x 24 cells in one
    map-side-combining aggregate; the pair join and norms run over
    that tiny relation.
    """
    e = table(spark, sf_dir, "events")
    prof = (
        e.select(
            F.col("event_type").alias("et"),
            F.expr(
                "CAST((unix_micros(ts) % 86400000000) DIV 3600000000"
                " AS BIGINT)"
            ).alias("hr"),
        )
        .groupBy("et", "hr")
        .agg(F.count("*").alias("n"))
    )
    a = prof.alias("a")
    b = prof.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.hr") == F.col("a.hr"))
            & (F.col("a.et") < F.col("b.et")),
        )
        .groupBy(
            F.col("a.et").alias("type_a"), F.col("b.et").alias("type_b")
        )
        .agg(F.sum(F.col("a.n") * F.col("b.n")).alias("dot"))
    )
    norms = prof.groupBy("et").agg(
        F.expr(
            "CAST(FLOOR(SQRT(CAST(SUM(n * n) AS DOUBLE))) AS BIGINT)"
        ).alias("nrm")
    )
    na = norms.select(
        F.col("et").alias("type_a"), F.col("nrm").alias("na")
    )
    nb = norms.select(
        F.col("et").alias("type_b"), F.col("nrm").alias("nb")
    )
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("dot").cast("bigint").alias("dot"),
            F.expr("CAST(1000 * dot DIV (na * nb) AS BIGINT)").alias(
                "cosine_milli"
            ),
        )
    )


# --- X265: haversine radius join --------------------------------------------

_GEO_RADIUS_KM = 500
_EARTH_R_KM = 6371


@register(
    "q_haversine_join",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey AS id,
               (('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 6))
                    ::BIGINT % 120 - 60) AS lat,
               (('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 9, 6))
                    ::BIGINT % 360 - 180) AS lon
        FROM customer WHERE c_custkey % 10 = 0
    ),
    supp AS (
        SELECT s_suppkey AS id,
               (('0x' || substring(md5('s|' || CAST(s_suppkey AS VARCHAR)),
                 1, 6))::BIGINT % 120 - 60) AS lat,
               (('0x' || substring(md5('s|' || CAST(s_suppkey AS VARCHAR)),
                 9, 6))::BIGINT % 360 - 180) AS lon
        FROM supplier
    ),
    cgrid AS (
        SELECT id, lat, lon, (lat + 60) // 5 AS gy, (lon + 180) // 5 AS gx
        FROM cust
    ),
    sgrid AS (
        SELECT id, lat, lon, (lat + 60) // 5 AS gy, (lon + 180) // 5 AS gx
        FROM supp
    ),
    cand AS (
        SELECT c.id AS cust_id, s.id AS supp_id,
               c.lat AS clat, c.lon AS clon, s.lat AS slat, s.lon AS slon
        FROM cgrid c JOIN sgrid s
          ON s.gy BETWEEN c.gy - 1 AND c.gy + 1
         AND ((s.gx + 72) % 72) IN (((c.gx - 1 + 72) % 72),
                                    ((c.gx + 72) % 72),
                                    ((c.gx + 1 + 72) % 72))
    ),
    scored AS (
        SELECT cust_id, supp_id,
               CAST(ROUND(SIN(RADIANS(slat - clat) / 2)
                          * SIN(RADIANS(slat - clat) / 2) * 1000000000)
                    AS BIGINT)
               + CAST(ROUND(COS(RADIANS(clat)) * COS(RADIANS(slat))
                            * SIN(RADIANS(slon - clon) / 2)
                            * SIN(RADIANS(slon - clon) / 2) * 1000000000)
                      AS BIGINT) AS hav_nano
        FROM cand
    )
    SELECT cust_id, supp_id, CAST(hav_nano AS BIGINT) AS hav_nano
    FROM scored
    WHERE hav_nano <= CAST(ROUND(SIN({_GEO_RADIUS_KM} / 2.0
                                     / {_EARTH_R_KM})
                                 * SIN({_GEO_RADIUS_KM} / 2.0
                                       / {_EARTH_R_KM})
                                 * 1000000000) AS BIGINT)
    """,
)
def q_haversine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X265: grid-blocked haversine (great-circle) radius join.

    Customers to suppliers within 500 km over md5-synthesized integer
    degree coordinates (the driver schema has no geo columns; the
    OPERATOR is the point). X204's planar grid join lifted to the
    sphere: candidates come from a 5-degree grid equi-join over the
    3x3 neighborhood with LONGITUDE WRAPAROUND (the +-180 seam is
    modular, gx IN (gx-1,gx,gx+1) mod 72); the exact predicate is the
    haversine a-term, each trig factor micro-rounded once from
    identical integer degrees (X197's discipline for trig) and
    compared in nano units against the precomputed radius threshold —
    integers end to end after the rounds. 5 deg >= 500 km everywhere
    (a meridian degree is ~111 km), so blocking is lossless;
    latitudes are clamped to +-60 so no polar cell blowup.

    100 TB shape: candidates scale with local density (grid cells),
    never |C| x |S|; both sides hash on cell keys. A production skew
    fix (coastal megacities) is the X4 salted variant of the same
    grid keys.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey")
    cust = c.where(F.expr("c_custkey % 10 = 0")).select(
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
    supp = s.select(
        F.col("s_suppkey").alias("id"),
        F.expr(
            "CAST(conv(substring(md5('s|' || CAST(s_suppkey AS STRING)),"
            " 1, 6), 16, 10) AS BIGINT) % 120 - 60"
        ).alias("lat"),
        F.expr(
            "CAST(conv(substring(md5('s|' || CAST(s_suppkey AS STRING)),"
            " 9, 6), 16, 10) AS BIGINT) % 360 - 180"
        ).alias("lon"),
    )
    cg = cust.select(
        F.col("id").alias("cust_id"),
        F.col("lat").alias("clat"),
        F.col("lon").alias("clon"),
        F.expr("(lat + 60) DIV 5").alias("cgy"),
        F.expr("(lon + 180) DIV 5").alias("cgx"),
    )
    sg = supp.select(
        F.col("id").alias("supp_id"),
        F.col("lat").alias("slat"),
        F.col("lon").alias("slon"),
        F.expr("(lat + 60) DIV 5").alias("sgy"),
        F.expr("(lon + 180) DIV 5").alias("sgx"),
    )
    cand = cg.join(
        sg,
        F.col("sgy").between(F.col("cgy") - 1, F.col("cgy") + 1)
        & F.expr(
            "((sgx + 72) % 72) IN (((cgx - 1 + 72) % 72),"
            " ((cgx + 72) % 72), ((cgx + 1 + 72) % 72))"
        ),
    )
    hav = (
        "CAST(ROUND(SIN(RADIANS(slat - clat) / 2)"
        " * SIN(RADIANS(slat - clat) / 2) * 1000000000) AS BIGINT)"
        " + CAST(ROUND(COS(RADIANS(clat)) * COS(RADIANS(slat))"
        " * SIN(RADIANS(slon - clon) / 2)"
        " * SIN(RADIANS(slon - clon) / 2) * 1000000000) AS BIGINT)"
    )
    import math

    thr = round(
        math.sin(_GEO_RADIUS_KM / 2.0 / _EARTH_R_KM) ** 2 * 1e9
    )
    return (
        cand.select(
            "cust_id", "supp_id", F.expr(hav).alias("hav_nano")
        )
        .where(F.col("hav_nano") <= F.lit(int(thr)))
        .select(
            "cust_id",
            "supp_id",
            F.col("hav_nano").cast("bigint").alias("hav_nano"),
        )
    )


# --- X266: time-tolerance event dedup ---------------------------------------

_DOUBLE_FIRE_US = 1_000_000  # 1 second


@register(
    "q_double_fire_census",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS em
        FROM events
    ),
    bucketed AS (
        SELECT *, em // {_DOUBLE_FIRE_US} AS bkt FROM ev
    ),
    cand AS (
        SELECT a.user_id, a.event_type,
               a.event_id AS id_a, b.event_id AS id_b
        FROM bucketed a JOIN bucketed b
          ON b.user_id = a.user_id AND b.event_type = a.event_type
         AND b.bkt BETWEEN a.bkt - 1 AND a.bkt + 1
         AND b.event_id > a.event_id
         AND ABS(b.em - a.em) <= {_DOUBLE_FIRE_US}
    ),
    dupes AS (SELECT DISTINCT id_b FROM cand)
    SELECT ev.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN d.id_b IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_double_fired,
           CAST(10000 * SUM(CASE WHEN d.id_b IS NOT NULL THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS double_fire_bp
    FROM ev LEFT JOIN dupes d ON d.id_b = ev.event_id
    GROUP BY ev.event_type
    """,
)
def q_double_fire_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X266: double-fired event census (time-tolerance dedup).

    At-least-once delivery and client retries produce events that are
    identical except for id and a sub-second timestamp wobble. A pair
    is a double-fire when same (user, type) and |t_a - t_b| <= 1 s;
    the LATER event_id is the duplicate (keep-first). Candidates come
    from the +-1 second-bucket band join (X104's band idiom): two
    events within 1 s are always within one bucket of each other, so
    the blocking is lossless and nothing quadratic forms outside a
    user's same-second burst. The census per type feeds the ingest
    dashboard; the keep-set is the same relation anti-joined.

    100 TB shape: one (user, type, bucket) equi-join — co-partitioned
    both sides; the dupes relation carries only ids.
    """
    e = table(spark, sf_dir, "events")
    ev = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("em"),
    )
    bucketed = ev.withColumn(
        "bkt", F.expr(f"em DIV {_DOUBLE_FIRE_US}")
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.event_type") == F.col("a.event_type"))
        & F.col("b.bkt").between(F.col("a.bkt") - 1, F.col("a.bkt") + 1)
        & (F.col("b.event_id") > F.col("a.event_id"))
        & (
            F.abs(F.col("b.em") - F.col("a.em")) <= _DOUBLE_FIRE_US
        ),
    ).select(F.col("b.event_id").alias("id_b"))
    dupes = cand.distinct()
    return (
        ev.join(dupes, ev.event_id == dupes.id_b, "left")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(
                F.when(F.col("id_b").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_double_fired"),
            F.expr(
                "CAST(10000 * SUM(CASE WHEN id_b IS NOT NULL THEN 1"
                " ELSE 0 END) DIV COUNT(*) AS BIGINT)"
            ).alias("double_fire_bp"),
        )
    )


# --- X267: backlog aging ----------------------------------------------------

_AGING_CUTOFF = "1997-06-30"


@register(
    "q_backlog_aging",
    oracle=f"""
    WITH open_orders AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderstatus = 'O'
          AND CAST(o_orderdate AS DATE) <= DATE '{_AGING_CUTOFF}'
    ),
    aged AS (
        SELECT cents,
               CASE
                 WHEN DATE '{_AGING_CUTOFF}' - od <= 30 THEN '0-30'
                 WHEN DATE '{_AGING_CUTOFF}' - od <= 90 THEN '31-90'
                 WHEN DATE '{_AGING_CUTOFF}' - od <= 365 THEN '91-365'
                 ELSE '365+'
               END AS bucket
        FROM open_orders
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS value_cents
    FROM aged GROUP BY bucket
    """,
)
def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X267: open-order backlog aging at a cutoff date.

    Orders still open at the cutoff, bucketed by age (0-30, 31-90,
    91-365, 365+ days) with order-value totals — the aging report
    every fulfillment/AR dashboard carries (X83 measures latency of
    SHIPPED orders; this counts the ones that haven't). Pure date
    arithmetic and conditional aggregation; the status+date filters
    push to the parquet scan.

    100 TB shape: one filtered conditional-agg pass, 4-row output.
    """
    o = table(spark, sf_dir, "orders")
    cutoff = F.lit(_AGING_CUTOFF).cast("date")
    open_orders = o.where(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_orderdate").cast("date") <= cutoff)
    ).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.datediff(cutoff, F.col("o_orderdate").cast("date")).alias("age"),
    )
    bucket = (
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 90, "31-90")
        .when(F.col("age") <= 365, "91-365")
        .otherwise("365+")
    )
    return (
        open_orders.select(bucket.alias("bucket"), "cents")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("value_cents"),
        )
    )
