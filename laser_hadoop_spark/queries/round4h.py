"""Round-4 widening queries, eighth batch (SURVEY.md §2.12, X157-X161).

Embedding-space quality and planner-input shapes: a k-NN majority-vote
classifier composed from the L4 cosine kernel (the lazy-learning twin
of the Naive Bayes pipeline), lagged cross-correlation between two
event series (lead/lag indicator analysis), exact fixed-point norm
and per-dimension variance profiles of the embedding table (the
collapsed-dimension / scale-drift health checks every ANN index build
should run first), and a join-cardinality estimator from per-key
histograms — the number a planner (or a human choosing between
broadcast, salt, and AQE skew handling) actually needs.

Cross-engine discipline: cosine ranks on ROUND(sim, 4) with unique
tiebreakers (the L4 convention); everything else is exact integer
micro/centi fixed point with DECIMAL(38) products and one final IEEE
division where a float is reported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_knn_classify",
    tags=("pairs",),
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label,
               ROUND(list_cosine_similarity(q.v, c.v), 4) AS sim
        FROM e q JOIN e c ON c.vec_id >= 50
        WHERE q.vec_id < 50
    ),
    ranked AS (
        SELECT query_id, label, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, cand_id) AS rn
        FROM scored
    ),
    votes AS (
        SELECT query_id, label, COUNT(*) AS n_votes
        FROM ranked WHERE rn <= 5 GROUP BY query_id, label
    ),
    winner AS (
        SELECT query_id, label, n_votes,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY n_votes DESC, label) AS w
        FROM votes
    )
    SELECT query_id, label AS pred_label, CAST(n_votes AS BIGINT) AS n_votes
    FROM winner WHERE w = 1
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X157: 5-NN majority-vote classifier over the embedding table.

    The lazy-learning counterpart of the X72/X73 Naive Bayes pipeline:
    vectors 0..49 are queries, the rest the labeled index; each query
    takes the majority label of its 5 nearest neighbors by cosine.
    Ranking uses ROUND(sim, 4) with the unique cand_id tiebreaker (the
    L4 convention that keeps float ranking cross-engine stable), and
    the vote uses the deterministic (count DESC, label) mode tiebreak
    of X107. Plan: the 50-query side broadcasts against one
    repartitioned scan of the index, norms are hoisted out of the
    pair loop (one HOF fold per pair, not three — bit-identical
    arithmetic), ranking is the salted two-level top-k (no
    fixed-parallelism window), and the vote aggregate is 250 rows.
    Measured 2.41 s -> 0.82 s at sf0.1. At 100 TB the index side
    would first pass through the IVF cell join (X2) and the scoring
    fold through the Arrow BLAS kernel (operators/similarity.py) —
    the vote algebra is unchanged.
    """
    emb = table(spark, sf_dir, "embeddings")
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(dbl(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # Norms are per-VECTOR, not per-pair: computing them once on each
    # side before the cross join cuts the pair loop from three
    # interpreted HOF folds (dot + both norms — llm._cosine) to one,
    # with bit-identical arithmetic (same folds, same order, just
    # hoisted). 3x fewer lambda evals on the |index| x |queries| path.
    q = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm("embedding").alias("qn"),
    )
    cand = (
        emb.where(F.col("vec_id") >= 50)
        # PERF_NOTES small-file lesson: the one-file embeddings scan is
        # a single task; rebalance the raw rows before the per-pair fold
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("vec_id").alias("cand_id"),
            "label",
            "embedding",
            norm("embedding").alias("cn"),
        )
    )
    dot = F.aggregate(
        F.zip_with(dbl(F.col("embedding")), dbl(F.col("qv")), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cand.crossJoin(F.broadcast(q)).select(
        "query_id",
        "cand_id",
        "label",
        F.round(dot / (F.col("cn") * F.col("qn")), 4).alias("sim"),
    )
    # Two-level top-k: the single-level window partitions only by the
    # 50 query ids, so 50 tasks each sort |index| rows — a fixed
    # parallelism ceiling that ignores the cluster size. Level 1
    # takes the top 5 per (query, salt) with a deterministic 64-way
    # cand_id salt — 50 x 64 groups, each sort 1/64th the size — and
    # the global top 5 provably survives (at most 4 rows beat any
    # true top-5 row, so it is top-5 in ITS salt group too; the rank
    # order (sim desc, cand_id) is total, so local and global top-k
    # agree deterministically). Level 2 re-ranks 5 x 64 rows per
    # query. The X4 salting pattern applied to rank instead of join.
    local_w = Window.partitionBy("query_id", "__salt").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    local_top = (
        scored.withColumn("__salt", F.pmod(F.col("cand_id"), F.lit(64)))
        .withColumn("__lrn", F.row_number().over(local_w))
        .where(F.col("__lrn") <= 5)
        .drop("__salt", "__lrn")
    )
    votes = (
        local_top.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("n_votes"))
    )
    ww = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label")
    )
    return (
        votes.withColumn("w", F.row_number().over(ww))
        .where(F.col("w") == 1)
        .select(
            "query_id",
            F.col("label").alias("pred_label"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
        )
    )


@register(
    "q_cross_correlation",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS rev
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY event_type, CAST(ts AS DATE)
    ),
    p AS (SELECT day, rev FROM daily WHERE event_type = 'purchase'),
    c AS (SELECT day, rev FROM daily WHERE event_type = 'click'),
    lags AS (SELECT UNNEST(generate_series(-3, 3)) AS lag),
    joined AS (
        SELECT l.lag, p.rev AS x, c.rev AS y
        FROM lags l
        JOIN p ON TRUE
        JOIN c ON date_diff('day', p.day, c.day) = l.lag
    ),
    s AS (
        SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM joined GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS r
    FROM s
    """,
)
def q_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X158: lagged cross-correlation of two event-type series.

    Does click revenue LEAD purchase revenue? Pearson r between
    purchase[day] and click[day + lag] for lags -3..+3 — the
    lead/lag-indicator scan behind "which metric moves first"
    dashboards (X126's autocorrelation is the self-pair special
    case). The lag axis rides in as a 7-row explode joined against
    the calendar-bounded daily relations, power sums are exact
    bigints per lag, products go through DECIMAL(38) via the same
    final-division discipline as X144/X149. Fact-table work: one
    date-keyed aggregate; everything after is |days| x 7 rows.
    """
    e = table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("rev")
        )
    )
    p = daily.where(F.col("event_type") == "purchase").select("day", "rev")
    c = daily.where(F.col("event_type") == "click").select(
        F.col("day").alias("cday"), F.col("rev").alias("y")
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    joined = (
        p.crossJoin(F.broadcast(lags))
        .join(
            c,
            F.col("cday")
            == F.expr("date_add(day, lag)"),
        )
        .select("lag", F.col("rev").alias("x"), "y")
    )
    dec_prod = lambda a, b: F.sum(  # noqa: E731  (X144 overflow
        F.col(a).cast("decimal(38,0)") * F.col(b)
    )  # discipline: daily-revenue products wrap bigint around sf10)
    s = joined.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        dec_prod("x", "x").alias("sxx"),
        dec_prod("y", "y").alias("syy"),
        dec_prod("x", "y").alias("sxy"),
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    num = dec("n") * dec("sxy") - dec("sx") * dec("sy")
    den1 = dec("n") * dec("sxx") - dec("sx") * dec("sx")
    den2 = dec("n") * dec("syy") - dec("sy") * dec("sy")
    return s.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_days"),
        F.round(
            num.cast("double")
            / (F.sqrt(den1.cast("double")) * F.sqrt(den2.cast("double"))),
            6,
        ).alias("r"),
    )


_EMB_FIXED = """
    e AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5)
                             AS BIGINT)) AS v
        FROM embeddings
    )
"""


@register(
    "q_embedding_norm_stats",
    oracle="WITH "
    + _EMB_FIXED
    + """,
    norms AS (
        SELECT label,
               list_sum(list_transform(v, x -> x * x)) AS n2
        FROM e
    )
    SELECT label, COUNT(*) AS n_vecs,
           CAST(MIN(n2) AS BIGINT) AS min_norm2,
           CAST(MAX(n2) AS BIGINT) AS max_norm2,
           CAST(SUM(n2) // COUNT(*) AS BIGINT) AS avg_norm2
    FROM norms GROUP BY label
    """,
)
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X159: exact vector-norm profile per label.

    The first embedding-space health check before any ANN build: are
    norms uniform across labels (cosine vs dot-product choice), did a
    label's vectors collapse toward zero? Each component micro-fixed-
    points to a bigint FIRST, so every squared norm is an exact
    integer (64 dims x (1e6)^2 fits bigint with 5 orders to spare)
    and min/max/avg are hash-stable — no float summation anywhere.
    Scan-local per-vector math + one small aggregate; at 100 TB this
    is embarrassingly parallel over file splits.
    """
    emb = table(spark, sf_dir, "embeddings")
    fixed = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1_000_000 + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    n2 = F.aggregate(
        F.transform(fixed, lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    norms = emb.select("label", n2.alias("n2"))
    return norms.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.min("n2").cast("bigint").alias("min_norm2"),
        F.max("n2").cast("bigint").alias("max_norm2"),
        # sum through DECIMAL(38): 32k vectors x ~1e12 micro^2 norms
        # can pass bigint range; `div` truncates like DuckDB's // on
        # the HUGEINT its SUM produces
        F.expr(
            "CAST(SUM(CAST(n2 AS DECIMAL(38,0))) div COUNT(*) AS BIGINT)"
        ).alias("avg_norm2"),
    )


@register(
    "q_dims_variance",
    oracle="WITH "
    + _EMB_FIXED
    + """,
    cells AS (
        SELECT UNNEST(generate_series(1, len(v))) - 1 AS dim,
               UNNEST(v) AS x
        FROM e
    ),
    s AS (
        SELECT dim, COUNT(*) AS n, SUM(x) AS sx,
               SUM(CAST(x AS HUGEINT) * x) AS sxx
        FROM cells GROUP BY dim
    )
    SELECT CAST(dim AS INT) AS dim, CAST(n AS BIGINT) AS n,
           CAST(sx // n AS BIGINT) AS mean_micro,
           CAST((n * sxx - sx * sx) // (n * n) AS BIGINT) AS var_micro2
    FROM s
    """,
)
def q_dims_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X160: per-dimension mean/variance of the embedding space.

    The collapsed-dimension detector: a dimension whose variance is
    near zero carries no information (and a mean far from zero breaks
    inner-product assumptions) — the profile an IVF/PQ index build
    reads before choosing a rotation. Same micro-fixed-point trick as
    X159, so the population variance is the exact integer
    (n*sxx - sx^2) DIV n^2 per dimension — cross-multiplied, no mean
    subtraction in floats (X52's algebra). posexplode gives the
    (dim, component) cells; one aggregate keyed by the 64-value dim
    axis. DuckDB's UNNEST pairs the two lists positionally (both
    derive from v), matching posexplode.
    """
    emb = table(spark, sf_dir, "embeddings")
    fixed = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1_000_000 + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    cells = emb.select(F.posexplode(fixed).alias("dim", "x"))
    s = cells.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        # product through decimal: micro^2 cells wrap bigint sums at
        # ~100x the driver vector count
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    return s.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST(sx DIV n AS BIGINT)").alias("mean_micro"),
        # n*sxx overflows bigint at sf0.01 (32k rows x ~1e13 squares):
        # products in DECIMAL(38,0), truncating `div` to match DuckDB's
        # // on HUGEINT (numerator is a variance — never negative)
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * sxx"
            "      - CAST(sx AS DECIMAL(38,0)) * sx)"
            "     div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("var_micro2"),
    )


@register(
    "q_join_cardinality",
    oracle="""
    WITH a AS (
        SELECT l_orderkey AS k, COUNT(*) AS ca FROM lineitem GROUP BY l_orderkey
    ),
    b AS (
        SELECT o_orderkey AS k, COUNT(*) AS cb FROM orders GROUP BY o_orderkey
    ),
    j AS (SELECT a.k, ca, cb FROM a JOIN b ON b.k = a.k)
    SELECT COUNT(*) AS n_shared_keys,
           CAST(SUM(ca * cb) AS BIGINT) AS est_join_rows,
           CAST(MAX(ca * cb) AS BIGINT) AS max_key_rows,
           CAST(10000 * MAX(ca * cb) // SUM(ca * cb) AS BIGINT)
               AS top_key_share_bp
    FROM j
    """,
)
def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X161: exact join-output cardinality from per-key histograms.

    |A join B| = sum over shared keys of cnt_A(k) * cnt_B(k) — the
    number that decides broadcast vs shuffle vs salting BEFORE paying
    for the join, plus the hottest key's share (the X60 skew signal in
    join-output terms: top_key_share_bp near 10000 means one key
    produces the whole output and AQE skew-split or salting is
    mandatory). Two per-key counting aggregates and a key-histogram
    join — the histograms are |keys| rows, not |rows|, so at 100 TB
    this estimator costs two map-side aggregations while the join it
    sizes would cost a full shuffle. Lineitem-orders is 1:N so
    est_join_rows equals |lineitem| exactly — a free sanity check the
    oracle hash pins.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    a = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("ca")
    )
    b = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("cb")
    )
    j = a.join(b, "k").select((F.col("ca") * F.col("cb")).alias("kk"))
    return j.agg(
        F.count("*").alias("n_shared_keys"),
        F.sum("kk").cast("bigint").alias("est_join_rows"),
        F.max("kk").cast("bigint").alias("max_key_rows"),
        F.expr("CAST(10000 * MAX(kk) DIV SUM(kk) AS BIGINT)").alias(
            "top_key_share_bp"
        ),
    )
