"""Round-5 widening queries, twenty-eighth batch (SURVEY.md §2.13, X344-X348).

Corpus stitching, dedup blocking, storage-layout advice, financial
volatility, and one-pass profiling:

- X344 split-document stitch join: docs whose trailing 3-token
  shingle equals another's leading shingle — the continuation
  detector a curator runs to re-join documents a chunker split
  (L8/X8's inverse audit); pure equi-join on boundary shingles.
- X345 canopy-clustering census: McCallum/Nigam/Ungar's cheap-
  distance blocking pass over embeddings (hash-chosen centers, loose
  threshold) — the classic MapReduce-era pre-clustering that bounds
  X28/X68's expensive stage; reports per-canopy size/purity and the
  uncovered-point remainder.
- X346 sort-order (RLE-run) layout advisor: per candidate column,
  value-change runs in natural row order vs the distinct count a
  sort would compress to — the expected RLE gain that decides the
  table's sort key (X57's Z-order and X228's encoding advisor pick
  layouts; this one says WHICH column earns it); natural-order
  adjacency via the X128 rank+equi-join lead, no global window.
- X347 realized + Parkinson volatility: daily log-return realized
  vol and the weekly high/low range estimator, annualized — per-step
  logs micro-round before the exact square sums.
- X348 one-pass Pearson correlation matrix: all 6 pairs of the four
  lineitem measures from ONE scan's 14 exact wide-decimal moments —
  the profiling primitive behind feature selection (X233) and X52's
  single-pair regression.

Reference parity note: engine extensions per SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.cumulative import ordered_cumsum
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X344: split-document stitch join ----------------------------------------


@register(
    "q_doc_stitch",
    oracle="""
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents
    ),
    ends AS (
        SELECT doc_id, source,
               array_to_string(toks[-3:], ' ') AS tail3,
               array_to_string(toks[1:3], ' ') AS head3,
               len(toks) AS n_toks
        FROM t
        WHERE len(toks) >= 3
    )
    SELECT a.doc_id AS left_id, b.doc_id AS right_id,
           a.tail3 AS shingle,
           CAST(a.n_toks + b.n_toks AS BIGINT) AS stitched_tokens,
           CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS same_source
    FROM ends a JOIN ends b
      ON b.head3 = a.tail3 AND b.doc_id <> a.doc_id
    ORDER BY left_id, right_id
    """,
)
def q_doc_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X344: split-document stitch candidates via boundary shingles.

    A doc pair (a, b) is a stitch candidate when a's trailing 3-token
    shingle equals b's leading one — the signature a chunker (X8)
    leaves when it splits a document mid-stream. Re-joining such pairs
    before training removes artificial context breaks; the same-source
    flag separates true splits from cross-source coincidences. Pure
    equi-join on the boundary shingle (each doc contributes ONE head
    key and ONE tail key — never an n-gram explosion), so candidates
    scale with real matches, not with corpus size squared.

    100 TB: scan-local shingle extraction; one shuffle on the
    boundary-shingle key; skew-safe because a repeated boilerplate
    boundary fans out only within its own key.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # Docs shorter than one full shingle are excluded on BOTH sides (and in
    # the oracle): Spark's slice(toks, -3, 3) returns [] for len < 3 while
    # DuckDB's toks[-3:] returns the whole list, and an empty-string tail3
    # would fabricate stitch pairs between unrelated short docs.
    ends = d.select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.slice(toks, -3, 3)).alias("tail3"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("head3"),
        F.size(toks).alias("n_toks"),
    ).where(F.size(toks) >= 3)
    a = ends.alias("a")
    b = ends.select(
        F.col("doc_id").alias("b_id"),
        F.col("source").alias("b_source"),
        F.col("head3").alias("b_head3"),
        F.col("n_toks").alias("b_n_toks"),
    )
    return (
        a.join(
            b,
            (F.col("b_head3") == F.col("a.tail3"))
            & (F.col("b_id") != F.col("a.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("left_id"),
            F.col("b_id").alias("right_id"),
            F.col("a.tail3").alias("shingle"),
            (F.col("a.n_toks") + F.col("b_n_toks"))
            .cast("bigint")
            .alias("stitched_tokens"),
            F.when(F.col("a.source") == F.col("b_source"), 1)
            .otherwise(0)
            .alias("same_source"),
        )
        .orderBy("left_id", "right_id")
    )


# --- X345: canopy-clustering census ------------------------------------------

_CANOPY_T1 = 0.15


@register(
    "q_canopy_census",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    centers AS (SELECT * FROM e WHERE vec_id % 37 = 0),
    assign AS (
        SELECT c.vec_id AS center_id, c.label AS center_label,
               p.vec_id AS point_id, p.label AS point_label,
               ROUND(list_cosine_similarity(c.v, p.v), 4) AS sim
        FROM centers c JOIN e p ON p.vec_id <> c.vec_id
        WHERE ROUND(list_cosine_similarity(c.v, p.v), 4) >= {_CANOPY_T1}
    ),
    per_center AS (
        SELECT center_id,
               CAST(COUNT(*) AS BIGINT) AS canopy_size,
               CAST(SUM(CASE WHEN point_label = center_label
                             THEN 1 ELSE 0 END) AS BIGINT) AS same_label,
               CAST(ROUND(1000.0 * AVG(sim)) AS BIGINT) AS avg_sim_milli
        FROM assign GROUP BY center_id
    ),
    covered AS (SELECT COUNT(DISTINCT point_id) AS nc FROM assign),
    tot AS (SELECT COUNT(*) AS n FROM e)
    SELECT p.center_id, p.canopy_size, p.same_label, p.avg_sim_milli,
           CAST(t.n - c.nc AS BIGINT) AS uncovered_points
    FROM per_center p CROSS JOIN covered c CROSS JOIN tot t
    ORDER BY p.center_id
    """,
)
def q_canopy_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X345: canopy-clustering blocking census over embeddings.

    The McCallum-Nigam-Ungar pre-clustering pass: hash-chosen centers
    (vec_id % 37 — deterministic, ~sqrt(n) of them), every point
    joins every canopy within the LOOSE threshold (cosine >= 0.15,
    the L4 ROUND(sim,4) discipline). Canopies overlap by design —
    the expensive stage (X68's k-means, X28's semantic dedup) then
    runs only within canopies. The census reports what the blocking
    bought: per-canopy size, label purity, mean tightness, and the
    uncovered remainder that would need a fallback pass.

    100 TB: centers broadcast (they are ~sqrt(n)); assignment is one
    scan of the point set; the census is a |centers|-row aggregate.
    """
    emb = table(spark, sf_dir, "embeddings")
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(dbl(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    pts = emb.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("point_id"),
        F.col("label").alias("point_label"),
        F.col("embedding").alias("pv"),
        norm("embedding").alias("pn"),
    )
    centers = emb.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("center_id"),
        F.col("label").alias("center_label"),
        F.col("embedding").alias("cv"),
        norm("embedding").alias("cn"),
    )
    dot = F.aggregate(
        F.zip_with(dbl(F.col("cv")), dbl(F.col("pv")), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assign = (
        pts.join(F.broadcast(centers), F.col("point_id") != F.col("center_id"))
        .select(
            "center_id",
            "center_label",
            "point_id",
            "point_label",
            F.round(dot / (F.col("cn") * F.col("pn")), 4).alias("sim"),
        )
        .where(F.col("sim") >= _CANOPY_T1)
        .localCheckpoint(eager=True)
    )
    per_center = assign.groupBy("center_id").agg(
        F.count("*").cast("bigint").alias("canopy_size"),
        F.sum(
            F.when(F.col("point_label") == F.col("center_label"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("same_label"),
        F.round(F.lit(1000.0) * F.avg("sim")).cast("bigint").alias(
            "avg_sim_milli"
        ),
    )
    covered = assign.agg(F.countDistinct("point_id").alias("nc"))
    tot = emb.agg(F.count("*").alias("n"))
    return (
        per_center.crossJoin(F.broadcast(covered))
        .crossJoin(F.broadcast(tot))
        .select(
            "center_id",
            "canopy_size",
            "same_label",
            "avg_sim_milli",
            (F.col("n") - F.col("nc")).cast("bigint").alias("uncovered_points"),
        )
        .orderBy("center_id")
    )


# --- X346: sort-order (RLE-run) layout advisor -------------------------------


@register(
    "q_rle_advisor",
    oracle="""
    WITH rows_ AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_partkey AS VARCHAR) AS c_partkey,
               CAST(l_suppkey AS VARCHAR) AS c_suppkey,
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS c_shipdate,
               l_returnflag AS c_returnflag
        FROM lineitem
    ),
    nxt AS (
        SELECT c_partkey, c_suppkey, c_shipdate, c_returnflag,
               LEAD(c_partkey) OVER w AS n_partkey,
               LEAD(c_suppkey) OVER w AS n_suppkey,
               LEAD(c_shipdate) OVER w AS n_shipdate,
               LEAD(c_returnflag) OVER w AS n_returnflag
        FROM rows_
        WINDOW w AS (ORDER BY l_orderkey, l_linenumber)
    ),
    runs AS (
        SELECT
          SUM(CASE WHEN n_partkey IS NOT NULL
                    AND n_partkey <> c_partkey THEN 1 ELSE 0 END) + 1 AS r1,
          SUM(CASE WHEN n_suppkey IS NOT NULL
                    AND n_suppkey <> c_suppkey THEN 1 ELSE 0 END) + 1 AS r2,
          SUM(CASE WHEN n_shipdate IS NOT NULL
                    AND n_shipdate <> c_shipdate THEN 1 ELSE 0 END) + 1 AS r3,
          SUM(CASE WHEN n_returnflag IS NOT NULL
                    AND n_returnflag <> c_returnflag THEN 1 ELSE 0 END) + 1
              AS r4,
          COUNT(DISTINCT c_partkey) AS d1,
          COUNT(DISTINCT c_suppkey) AS d2,
          COUNT(DISTINCT c_shipdate) AS d3,
          COUNT(DISTINCT c_returnflag) AS d4
        FROM nxt
    )
    SELECT col_name,
           CAST(n_runs_natural AS BIGINT) AS n_runs_natural,
           CAST(n_runs_sorted AS BIGINT) AS n_runs_sorted,
           CAST((1000 * n_runs_natural) // n_runs_sorted AS BIGINT)
               AS rle_gain_milli
    FROM (
        SELECT 'l_partkey' AS col_name, r1 AS n_runs_natural,
               d1 AS n_runs_sorted FROM runs
        UNION ALL
        SELECT 'l_suppkey', r2, d2 FROM runs
        UNION ALL
        SELECT 'l_shipdate', r3, d3 FROM runs
        UNION ALL
        SELECT 'l_returnflag', r4, d4 FROM runs
    )
    ORDER BY col_name
    """,
)
def q_rle_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X346: sort-key advisor from RLE run counts, natural vs sorted.

    For each candidate sort column: how many value-change runs the
    column has in NATURAL row order (what RLE/dictionary encoding
    sees today) vs the distinct count (= the runs after sorting by
    that column — the best any sort can do). The ratio is the
    expected RLE compression gain of re-clustering on that column:
    the one number that decides a table's sort key, next to X57's
    Z-order layout and X228's encoding advisor. Natural-order
    adjacency comes from the X128 discipline — two-pass global rank
    plus an rn+1 equi-join — so there is NO single-partition window
    over the fact table; all four columns ride one lead join.

    100 TB: ordered_cumsum's range partitioning + one equi-join +
    one aggregate; distinct counts are partial-agg friendly.
    """
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_partkey", "l_suppkey", "l_shipdate", "l_returnflag"]
    rows = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_partkey").cast("string").alias("c_partkey"),
        F.col("l_suppkey").cast("string").alias("c_suppkey"),
        F.col("l_shipdate").cast("date").cast("string").alias("c_shipdate"),
        F.col("l_returnflag").alias("c_returnflag"),
    )
    # checkpoint the ranked relation: both sides of the lead join AND
    # the distinct census read it, so the two-pass rank runs once
    ranked = ordered_cumsum(
        rows, order_by=["l_orderkey", "l_linenumber"], row_number_col="rn"
    ).localCheckpoint(eager=True)
    a = ranked.alias("a")
    b = ranked.select(
        (F.col("rn") - 1).alias("rn_prev"),
        *[F.col(f"c{c[1:]}").alias(f"n{c[1:]}") for c in cols],
    )
    nxt = a.join(b, F.col("a.rn") == F.col("rn_prev"), "left")
    run_aggs, dist_aggs = [], []
    for c in cols:
        cc, nc = f"c{c[1:]}", f"n{c[1:]}"
        run_aggs.append(
            (
                F.sum(
                    F.when(
                        F.col(nc).isNotNull() & (F.col(nc) != F.col(cc)), 1
                    ).otherwise(0)
                )
                + 1
            ).alias(f"r_{c}")
        )
        # distinct counts never needed the lead join — census the base
        dist_aggs.append(F.countDistinct(cc).alias(f"d_{c}"))
    runs = nxt.agg(*run_aggs).crossJoin(F.broadcast(ranked.agg(*dist_aggs)))
    stacked = runs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"r_{c}").cast("bigint").alias("n_runs_natural"),
                        F.col(f"d_{c}").cast("bigint").alias("n_runs_sorted"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    return stacked.select(
        "col_name",
        "n_runs_natural",
        "n_runs_sorted",
        F.expr("CAST((1000 * n_runs_natural) div n_runs_sorted AS BIGINT)").alias(
            "rle_gain_milli"
        ),
    ).orderBy("col_name")


# --- X347: realized + Parkinson volatility -----------------------------------

_LN2 = 0.6931471805599453


@register(
    "q_volatility",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    nxt AS (
        SELECT rev, LEAD(rev) OVER (ORDER BY d) AS next_rev FROM daily
    ),
    rets AS (
        SELECT CAST(ROUND(1000000.0
                          * LN(CAST(next_rev AS DOUBLE) / rev)) AS BIGINT)
                   AS r
        FROM nxt WHERE next_rev IS NOT NULL
    ),
    rv AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               SUM(r * r) AS srr
        FROM rets
    ),
    weekly AS (
        SELECT date_trunc('week', d) AS wk, MAX(rev) AS h, MIN(rev) AS l
        FROM daily GROUP BY 1
    ),
    pk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
               SUM(t * t) AS spk
        FROM (SELECT CAST(ROUND(1000000.0
                                * LN(CAST(h AS DOUBLE) / l)) AS BIGINT) AS t
              FROM weekly WHERE h > l)
    )
    SELECT rv.n_days,
           CAST(ROUND(SQRT(252.0 * CAST(rv.srr AS DOUBLE) / rv.n_days))
                AS BIGINT) AS realized_vol_micro,
           pk.n_weeks,
           CAST(ROUND(SQRT(52.0 * CAST(pk.spk AS DOUBLE)
                           / (4 * {_LN2!r} * pk.n_weeks))) AS BIGINT)
               AS parkinson_vol_micro
    FROM rv CROSS JOIN pk
    """,
)
def q_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X347: annualized realized + Parkinson volatility of revenue.

    Realized vol = sqrt(252/n sum r^2) over daily log returns;
    Parkinson = sqrt(52 sum ln(H/L)^2 / (4 ln2 n)) over weekly
    high/low ranges — the range estimator that is ~5x more efficient
    per observation and needs no consecutive-day alignment. Each log
    micro-rounds FIRST so both square sums are exact integers; ln 2
    is a shared literal (X340's libm discipline). Day-over-day
    adjacency uses the X128 rank+equi-join lead — no global window
    over the daily relation.

    100 TB: one date-grain aggregate, the lead join on the tiny
    daily relation, 1-row outputs.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    ).localCheckpoint(eager=True)
    ranked = ordered_cumsum(
        daily, order_by=["d"], row_number_col="rn"
    ).localCheckpoint(eager=True)
    nxt = ranked.alias("a").join(
        ranked.select(
            (F.col("rn") - 1).alias("rn_prev"), F.col("rev").alias("next_rev")
        ),
        F.col("a.rn") == F.col("rn_prev"),
    )
    rets = nxt.select(
        F.round(
            F.lit(1000000.0)
            * F.log(F.col("next_rev").cast("double") / F.col("rev"))
        )
        .cast("bigint")
        .alias("r")
    )
    rv = rets.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
    )
    weekly = daily.groupBy(F.date_trunc("week", "d").alias("wk")).agg(
        F.max("rev").alias("h"), F.min("rev").alias("l")
    )
    pk = (
        weekly.where(F.col("h") > F.col("l"))
        .select(
            F.round(
                F.lit(1000000.0)
                * F.log(F.col("h").cast("double") / F.col("l"))
            )
            .cast("bigint")
            .alias("t")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_weeks"),
            F.sum(F.col("t") * F.col("t")).alias("spk"),
        )
    )
    return rv.crossJoin(F.broadcast(pk)).select(
        "n_days",
        F.round(
            F.sqrt(F.lit(252.0) * F.col("srr").cast("double") / F.col("n_days"))
        )
        .cast("bigint")
        .alias("realized_vol_micro"),
        "n_weeks",
        F.round(
            F.sqrt(
                F.lit(52.0)
                * F.col("spk").cast("double")
                / (4 * F.lit(_LN2) * F.col("n_weeks"))
            )
        )
        .cast("bigint")
        .alias("parkinson_vol_micro"),
    )


# --- X348: one-pass Pearson correlation matrix -------------------------------


@register(
    "q_corr_matrix",
    oracle="""
    WITH m AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price,
               CAST(ROUND(l_discount * 10000) AS BIGINT) AS disc,
               CAST(ROUND(l_tax * 10000) AS BIGINT) AS tax
        FROM lineitem
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(qty) AS s_q, SUM(price) AS s_p,
               SUM(disc) AS s_d, SUM(tax) AS s_t,
               SUM(qty * qty) AS s_qq, SUM(price * price) AS s_pp,
               SUM(disc * disc) AS s_dd, SUM(tax * tax) AS s_tt,
               SUM(qty * price) AS s_qp, SUM(qty * disc) AS s_qd,
               SUM(qty * tax) AS s_qt, SUM(price * disc) AS s_pd,
               SUM(price * tax) AS s_pt, SUM(disc * tax) AS s_dt
        FROM m
    )
    SELECT col_x, col_y,
           CAST(ROUND(1000000.0 * CAST(num AS DOUBLE)
                      / (SQRT(CAST(dx AS DOUBLE)) * SQRT(CAST(dy AS DOUBLE))))
                AS BIGINT) AS corr_micro
    FROM (
        SELECT 'qty' AS col_x, 'price' AS col_y,
               n * s_qp - s_q * s_p AS num,
               n * s_qq - s_q * s_q AS dx, n * s_pp - s_p * s_p AS dy
        FROM s
        UNION ALL
        SELECT 'qty', 'disc', n * s_qd - s_q * s_d,
               n * s_qq - s_q * s_q, n * s_dd - s_d * s_d FROM s
        UNION ALL
        SELECT 'qty', 'tax', n * s_qt - s_q * s_t,
               n * s_qq - s_q * s_q, n * s_tt - s_t * s_t FROM s
        UNION ALL
        SELECT 'price', 'disc', n * s_pd - s_p * s_d,
               n * s_pp - s_p * s_p, n * s_dd - s_d * s_d FROM s
        UNION ALL
        SELECT 'price', 'tax', n * s_pt - s_p * s_t,
               n * s_pp - s_p * s_p, n * s_tt - s_t * s_t FROM s
        UNION ALL
        SELECT 'disc', 'tax', n * s_dt - s_d * s_t,
               n * s_dd - s_d * s_d, n * s_tt - s_t * s_t FROM s
    )
    ORDER BY col_x, col_y
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X348: exact Pearson correlation matrix from ONE scan.

    All six pairwise correlations of the four lineitem measures
    (quantity, price cents, discount bp, tax bp) from a single pass's
    14 moment sums — the data-profiling primitive feature selection
    (X233) and X52's regression start from, generalized to the full
    matrix without rescanning per pair. Sums ride wide-decimal (the
    price*price sum overflows int64 at sf0.1); each correlation is
    ONE float expression over exact integers, micro-rounded.

    100 TB: one partial-aggregate scan; the 6-row matrix is built by
    exploding a literal array over the 1-row moment relation.
    """
    li = table(spark, sf_dir, "lineitem")
    m = li.select(
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price"),
        F.round(F.col("l_discount") * 10000).cast("bigint").alias("disc"),
        F.round(F.col("l_tax") * 10000).cast("bigint").alias("tax"),
    )
    dec = "decimal(38,0)"
    names = ["q", "p", "d", "t"]
    cols = {"q": "qty", "p": "price", "d": "disc", "t": "tax"}
    aggs = [F.count("*").cast("bigint").alias("n")]
    for x in names:
        aggs.append(F.sum(F.col(cols[x]).cast(dec)).alias(f"s_{x}"))
    for i, x in enumerate(names):
        for y in names[i:]:
            aggs.append(
                F.sum(F.col(cols[x]).cast(dec) * F.col(cols[y])).alias(
                    f"s_{x}{y}"
                )
            )
    s = m.agg(*aggs)
    pairs = [("q", "p"), ("q", "d"), ("q", "t"), ("p", "d"), ("p", "t"), ("d", "t")]
    label = {"q": "qty", "p": "price", "d": "disc", "t": "tax"}
    n = F.col("n")
    structs = []
    for x, y in pairs:
        num = n * F.col(f"s_{x}{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        dx = n * F.col(f"s_{x}{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")
        dy = n * F.col(f"s_{y}{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
        structs.append(
            F.struct(
                F.lit(label[x]).alias("col_x"),
                F.lit(label[y]).alias("col_y"),
                F.round(
                    F.lit(1000000.0)
                    * num.cast("double")
                    / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double")))
                )
                .cast("bigint")
                .alias("corr_micro"),
            )
        )
    return (
        s.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .orderBy("col_x", "col_y")
    )
