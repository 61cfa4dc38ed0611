"""Round-5 widening queries, seventeenth batch (SURVEY.md §2.13, X283-X287).

Keyword extraction, robust anomaly filtering, smoothing, distribution
diagnostics, and referential integrity:

- X283 RAKE keyword extraction: stopword-delimited candidate phrases
  scored by sum of word degree/frequency ratios — the classic
  unsupervised keyphrase extractor, via the gaps-and-islands idiom
  (no regex split ambiguity on adjacent stopwords).
- X284 Hampel filter: rolling 7-day median/MAD anomaly flags over the
  daily revenue series — the robust sibling of X132's rolling z-score
  (means break down exactly where outliers live).
- X285 Good-Turing smoothing: frequency-of-frequency table with the
  adjusted counts r* = (r+1) N_{r+1} / N_r — the count-discounting
  step of classical language modeling.
- X286 normal QQ table: exact empirical vigintiles (via the X166
  zero-fact-shuffle multi-quantile operator) paired against pinned
  standard-normal quantile literals — the normality diagnostic as a
  20-row table.
- X287 referential-integrity dashboard: orphan counts for every FK
  edge of the star schema in one stacked relation — J3's anti-join
  generalized to the whole-schema audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X283: RAKE keyword extraction --------------------------------------------

_RAKE_STOPWORDS = ("a", "the")
_RAKE_MAX_LEN = 4
_RAKE_TOP_K = 15


@register(
    "q_rake_keywords",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    ),
    words AS (
        SELECT doc_id, g.i AS pos, s[g.i] AS w
        FROM toks, UNNEST(generate_series(1, len(s))) AS g(i)
    ),
    nonstop AS (
        SELECT doc_id, pos, w,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM words
        WHERE w NOT IN {_RAKE_STOPWORDS!r}
    ),
    sized AS (
        SELECT doc_id, grp, pos, w,
               COUNT(*) OVER (PARTITION BY doc_id, grp) AS plen
        FROM nonstop
    ),
    wstats AS (
        SELECT w, COUNT(*) AS freq, SUM(plen) AS deg FROM sized GROUP BY w
    ),
    wscore AS (
        SELECT w, 1000 * deg // freq AS ws_milli FROM wstats
    ),
    pscore AS (
        SELECT s.doc_id, s.grp,
               STRING_AGG(s.w, ' ' ORDER BY s.pos) AS phrase,
               SUM(ws.ws_milli) AS score_milli
        FROM sized s JOIN wscore ws ON ws.w = s.w
        WHERE s.plen <= {_RAKE_MAX_LEN}
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT phrase,
               CAST(MIN(score_milli) AS BIGINT) AS score_milli,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM pscore GROUP BY phrase
    )
    SELECT phrase, score_milli, n_occurrences
    FROM ranked
    ORDER BY score_milli DESC, phrase
    LIMIT {_RAKE_TOP_K}
    """,
)
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X283: RAKE (Rapid Automatic Keyword Extraction) over the corpus.

    Candidate phrases are maximal stopword-free token runs; each word
    scores deg(w)/freq(w) (deg = sum of the lengths of phrases it
    appears in — co-occurrence degree; freq = its occurrence count)
    and a phrase scores the sum of its words' scores. Phrase runs are
    found with the gaps-and-islands idiom (pos - row_number over
    non-stop tokens) — a regex split would mis-handle ADJACENT
    stopwords ('x a a y': the second 'a' survives a ' a '-delimiter
    split). Scores in milli by truncating division; phrases longer
    than {_RAKE_MAX_LEN} words are dropped (standard RAKE cap); top
    {_RAKE_TOP_K} by (score, phrase) — fully deterministic.

    100 TB shape: the token explode is scan-local; ONE (doc, grp)
    shuffle builds phrases and lengths, the word-stats aggregate is
    map-side combining, the word-score join broadcasts (vocabulary
    sized), and the final top-k is a TakeOrdered, not a global window.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    )
    nw = Window.partitionBy("doc_id").orderBy("pos")
    nonstop = (
        words.where(~F.col("w").isin(*_RAKE_STOPWORDS))
        .withColumn("grp", F.col("pos") - F.row_number().over(nw))
    )
    pw = Window.partitionBy("doc_id", "grp")
    sized = nonstop.withColumn("plen", F.count("*").over(pw))
    wscore = (
        sized.groupBy("w")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("deg"))
        .select("w", F.expr("1000 * deg DIV freq").alias("ws_milli"))
    )
    pscore = (
        sized.where(F.col("plen") <= _RAKE_MAX_LEN)
        .join(F.broadcast(wscore), "w")
        .groupBy("doc_id", "grp")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, w))),"
                " x -> x.w), ' ')"
            ).alias("phrase"),
            F.sum("ws_milli").alias("score_milli"),
        )
    )
    ranked = pscore.groupBy("phrase").agg(
        F.min("score_milli").cast("bigint").alias("score_milli"),
        F.count("*").cast("bigint").alias("n_occurrences"),
    )
    return ranked.orderBy(
        F.col("score_milli").desc(), F.col("phrase")
    ).limit(_RAKE_TOP_K)


# --- X284: Hampel filter -------------------------------------------------------

# 10000 * 3 * 1.4826 (the MAD-to-sigma consistency constant) = 44478
_HAMPEL_K_X10K = 44478


@register(
    "q_hampel_filter",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
        FROM orders GROUP BY 1
    ),
    win AS (
        SELECT d, y,
               LIST(y) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING
                             AND CURRENT ROW) AS l
        FROM daily
    ),
    med AS (
        SELECT d, y, list_sort(l)[4] AS med, l
        FROM win WHERE len(l) = 7
    ),
    mad AS (
        SELECT d, y, med,
               list_sort(list_transform(l, v -> ABS(v - med)))[4] AS mad
        FROM med
    )
    SELECT d AS day, CAST(y AS BIGINT) AS y_cents,
           CAST(med AS BIGINT) AS med_cents,
           CAST(mad AS BIGINT) AS mad_cents
    FROM mad
    WHERE 10000 * ABS(y - med) > {_HAMPEL_K_X10K} * mad
    """,
)
def q_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X284: Hampel filter — rolling-median/MAD anomaly days.

    A day is anomalous when |y - med7| > 3 * 1.4826 * MAD7 (median and
    median-absolute-deviation over the trailing 7 days). The robust
    sibling of X132's rolling z-score: one planted spike inflates a
    rolling MEAN and its std enough to mask itself, but moves a median
    of 7 by at most one rank. Exactness: windows with exactly 7 days
    make both medians true middles (sorted[4], 1-based) — integer, no
    interpolation; the flag cross-multiplies the 3*1.4826 constant as
    the integer spec {_HAMPEL_K_X10K}/10000. Emits the anomalous days
    with their local statistics.

    100 TB shape: the fact scan reduces map-side to the
    calendar-bounded daily relation; the list window, sorts, and MAD
    transform run over 7-element arrays on |days| rows.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("y")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)  # calendar-bounded
    win = daily.select("d", "y", F.collect_list("y").over(w).alias("l"))
    med = win.where(F.size("l") == 7).select(
        "d", "y", "l", F.expr("array_sort(l)[3]").alias("med")
    )
    mad = med.select(
        "d", "y", "med",
        F.expr("array_sort(transform(l, v -> ABS(v - med)))[3]").alias("mad"),
    )
    return mad.where(
        10000 * F.abs(F.col("y") - F.col("med"))
        > _HAMPEL_K_X10K * F.col("mad")
    ).select(
        F.col("d").alias("day"),
        F.col("y").cast("bigint").alias("y_cents"),
        F.col("med").cast("bigint").alias("med_cents"),
        F.col("mad").cast("bigint").alias("mad_cents"),
    )


# --- X285: Good-Turing smoothing ----------------------------------------------


@register(
    "q_good_turing",
    oracle="""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents
    ),
    terms AS (
        SELECT UNNEST(list_transform(generate_series(1, len(t) - 2),
                                     i -> t[i] || ' ' || t[i+1] || ' '
                                          || t[i+2])) AS term
        FROM toks
    ),
    tc AS (
        SELECT term, COUNT(*) AS r FROM terms GROUP BY term
    ),
    ff AS (
        SELECT r, COUNT(*) AS n_r FROM tc GROUP BY r
    )
    SELECT CAST(a.r AS BIGINT) AS r,
           CAST(a.n_r AS BIGINT) AS n_r,
           CAST(COALESCE(1000 * (a.r + 1) * b.n_r // a.n_r, 0) AS BIGINT)
               AS r_star_milli
    FROM ff a LEFT JOIN ff b ON b.r = a.r + 1
    WHERE a.r <= 10
    """,
)
def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X285: Good-Turing frequency smoothing table over trigram types.

    The classical LM count-discounting step: for types seen r times,
    the adjusted count r* = (r+1) * N_{r+1} / N_r, where N_r is the
    number of DISTINCT types with frequency exactly r (the
    frequency-of-frequency table). The type unit is the word TRIGRAM
    (single words in this corpus's small vocabulary all have r >> 10,
    leaving the smoothing region empty — trigrams give the long-tailed
    spectrum Good-Turing exists for). Rows for r <= 10 (smoothing only
    matters for rare counts); a missing N_{r+1} yields r* = 0 — the
    standard boundary. Everything integer: one type count, one
    freq-of-freq count, a self-join on r+1, one truncating division.

    100 TB shape: trigrams assemble scan-locally (the zip_with shifted
    -views fold, NON-distinct — multiplicity is the point here); the
    type aggregate is the only corpus-sized shuffle (map-side
    combining); the freq-of-freq relation is tiny (distinct
    frequencies), self-joined broadcast.
    """
    d = table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    m = F.greatest(F.size(t) - 2, F.lit(0))
    sh = F.zip_with(
        F.zip_with(
            F.slice(t, 1, m),
            F.slice(t, 2, m),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        F.slice(t, 3, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tc = (
        d.select(F.explode(sh).alias("term"))
        .groupBy("term")
        .count()
        .withColumnRenamed("count", "r")
    )
    ff = tc.groupBy("r").agg(F.count("*").alias("n_r"))
    a, b = ff.alias("a"), ff.alias("b")
    return (
        a.where(F.col("a.r") <= 10)
        .join(F.broadcast(b), F.col("b.r") == F.col("a.r") + 1, "left")
        .select(
            F.col("a.r").cast("bigint").alias("r"),
            F.col("a.n_r").cast("bigint").alias("n_r"),
            F.coalesce(
                F.expr("1000 * (a.r + 1) * b.n_r DIV a.n_r"), F.lit(0)
            )
            .cast("bigint")
            .alias("r_star_milli"),
        )
    )


# --- X286: normal QQ table -----------------------------------------------------

# Phi^{-1}(i/20) in micro, i = 1..19 — pinned literals (the spec)
_QQ_Z_MICRO = [
    -1644854, -1281552, -1036433, -841621, -674490, -524401, -385320,
    -253347, -125661, 0, 125661, 253347, 385320, 524401, 674490,
    841621, 1036433, 1281552, 1644854,
]


@register(
    "q_qq_table",
    oracle=f"""
    WITH base AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders
    ),
    vals AS (SELECT v, COUNT(*) AS ct FROM base GROUP BY v),
    cum AS (
        SELECT v, SUM(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS cw
        FROM vals
    ),
    tot AS (SELECT COUNT(*) AS n FROM base),
    grid AS (
        SELECT UNNEST(generate_series(1, 19)) AS i
    )
    SELECT CAST(g.i AS BIGINT) AS vigintile,
           CAST([{", ".join(str(z) for z in _QQ_Z_MICRO)}][g.i] AS BIGINT)
               AS z_micro,
           CAST(MIN(c.v) AS BIGINT) AS sample_q_cents
    FROM grid g CROSS JOIN tot t
    JOIN cum c ON 20 * c.cw >= g.i * t.n
    GROUP BY g.i
    """,
)
def q_qq_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X286: normal QQ table — empirical vigintiles vs pinned normal
    quantiles.

    The normality diagnostic as data: the 19 exact empirical
    vigintiles of order value (smallest v with 20*cum >= i*n — the
    X166 lower-quantile spec) paired with Phi^-1(i/20) pinned as
    micro-integer literals, so the whole table is engine-exact with
    no erf evaluation anywhere. A straight line in (z, q) means
    normal; the heavy upper tail of order values shows as upward
    curvature. The Spark side reuses `ordered_quantiles` — all 19
    quantiles from ONE histogram pass + ONE pruned scan, zero fact
    shuffles (the oracle spells the same spec as a cumulative walk).

    100 TB shape: two scan-shaped passes total (histogram + crossing
    buckets), broadcast literals, 19-row output.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_quantiles

    base = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("v")
    )
    q = ordered_quantiles(
        base, value_col="v", quantiles=[(i, 20) for i in range(1, 20)]
    )
    z = F.array(*[F.lit(z) for z in _QQ_Z_MICRO])
    return q.select(
        F.col("q_num").cast("bigint").alias("vigintile"),
        F.element_at(z, F.col("q_num").cast("int"))
        .cast("bigint")
        .alias("z_micro"),
        F.col("quantile_value").cast("bigint").alias("sample_q_cents"),
    )


# --- X287: referential-integrity dashboard -------------------------------------

_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
]


@register(
    "q_fk_integrity",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{ct}.{ck}' AS fk_edge, '{pt}.{pk}' AS parent,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM {pt} p WHERE p.{pk} = c.{ck}
               ) THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        FROM {ct} c
        """
        for ct, ck, pt, pk in _FK_EDGES
    ),
)
def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X287: referential-integrity dashboard over every FK edge.

    J3's anti-join (the reference's cross-input violation gate,
    LASERInputCheckMapper.java:138-144) generalized to the whole star
    schema: for each of the eight FK edges, the child row
    count and the orphan count (child keys with no parent). One stacked
    result — the table a data-quality dashboard renders after every
    load. The events->customer edge is a SOFT contract (event traffic
    may legitimately precede customer registration); the dashboard
    reports it rather than asserting it, which is exactly why the
    orphan count is data, not a test.

    100 TB shape: each edge is one left-anti-shaped conditional count;
    dimension parents broadcast, and the one fact-fact edge
    (lineitem->orders) joins on the bucketed warehouse key when the
    warehouse layout (X5) is in use. Counts aggregate map-side.
    """
    parts = []
    for ct, ck, pt, pk in _FK_EDGES:
        child = table(spark, sf_dir, ct).select(F.col(ck))
        parent = table(spark, sf_dir, pt).select(F.col(pk)).distinct()
        orphans = child.join(
            parent, child[ck] == parent[pk], "left"
        ).agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0)).alias(
                "n_orphans"
            ),
        )
        parts.append(
            orphans.select(
                F.lit(f"{ct}.{ck}").alias("fk_edge"),
                F.lit(f"{pt}.{pk}").alias("parent"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("n_orphans").cast("bigint").alias("n_orphans"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
