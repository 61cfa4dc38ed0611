"""Round-4 widening queries, sixteenth batch (SURVEY.md §2.12,
X188-X190).

Curve geometry, text readability, and recursive changepoints: the
knee/elbow point of the rank-frequency curve via the max-distance-
from-chord rule with the distance CROSS-MULTIPLIED into an exact
integer (no sqrt, no division — the perpendicular distance shares a
constant denominator along one chord, so the doubled-triangle-area
numerator ranks identically), Flesch-style readability in pure
truncating integer arithmetic over regexp counts, and depth-2 binary
segmentation — X133's CUSUM statistic applied recursively, where both
child segments reuse the PARENT's cumulative relation with two
broadcast scalars instead of re-walking the series.

Cross-engine discipline: regexp classes shared verbatim, |a| via
ABS on DECIMAL/HUGEINT, argmax ties to the earliest index, wide
magnitudes emitted as strings (X133's convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_knee_point",
    oracle="""
    WITH toks AS (
        SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
    top_ AS (SELECT token, n FROM freq ORDER BY n DESC, token LIMIT 200),
    curve AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rn
        FROM top_
    ),
    ends AS (
        SELECT MIN(rn) AS x1, MAX(rn) AS x2,
               arg_min(n, rn) AS y1, arg_max(n, rn) AS y2
        FROM curve
    ),
    dist AS (
        SELECT c.rn, c.n,
               ABS((e.y2 - e.y1) * (c.rn - e.x1)
                   - (e.x2 - e.x1) * (c.n - e.y1)) AS d2a
        FROM curve c CROSS JOIN ends e
    ),
    best AS (
        SELECT rn, n, d2a,
               ROW_NUMBER() OVER (ORDER BY d2a DESC, rn) AS w
        FROM dist
    )
    SELECT CAST(rn AS BIGINT) AS knee_rank,
           CAST(n AS BIGINT) AS knee_freq,
           CAST(d2a AS BIGINT) AS doubled_area
    FROM best WHERE w = 1
    """,
)
def q_knee_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X188: knee/elbow of the rank-frequency curve (exact geometry).

    The automatic cut-point rule (Satopaa et al. 'kneedle' family,
    public method) over the top-200 (or full-vocabulary, if smaller)
    token ranks: the knee is the point furthest from the chord
    between the curve's ACTUAL endpoints (adaptive — a fixed rank-200
    endpoint would be NULL on a smaller vocabulary and kill every
    distance).
    Perpendicular distance = |cross product| / |chord|, and the chord
    is CONSTANT across candidates — so ranking by the doubled triangle
    area |(y2-y1)(x-x1) - (x2-x1)(y-y1)| is exact integer arithmetic
    with no sqrt or division anywhere; ties break to the earliest
    rank. The same rule picks k for X118's histograms or n_cells for
    the X2 IVF sweep. Curve = 200 rows off the type-frequency
    aggregate; everything after is constant-bounded.
    """
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    # top-200 via parallel TakeOrderedAndProject (the q_zipf_fit
    # spelling), THEN a row number over the <= 200-row result — a
    # global no-partition window over the full vocabulary would funnel
    # every token through one task
    top = freq.orderBy(F.col("n").desc(), "token").limit(200)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    curve = top.select("n", F.row_number().over(w).alias("rn"))
    # endpoints are ADAPTIVE (arg at max rank) — a fixed rank-200
    # endpoint is NULL whenever the vocabulary is smaller, silently
    # killing every distance (found by probing the committed corpus:
    # 31 types)
    ends = curve.agg(
        F.min("rn").alias("x1"),
        F.max("rn").alias("x2"),
        F.min_by("n", "rn").alias("y1"),
        F.max_by("n", "rn").alias("y2"),
    )
    dist = curve.crossJoin(F.broadcast(ends)).select(
        "rn",
        "n",
        F.abs(
            (F.col("y2") - F.col("y1")) * (F.col("rn") - F.col("x1"))
            - (F.col("x2") - F.col("x1")) * (F.col("n") - F.col("y1"))
        ).alias("d2a"),
    )
    bw = Window.orderBy(F.col("d2a").desc(), F.col("rn"))
    return (
        dist.withColumn("w", F.row_number().over(bw))
        .where(F.col("w") == 1)
        .select(
            F.col("rn").cast("bigint").alias("knee_rank"),
            F.col("n").cast("bigint").alias("knee_freq"),
            F.col("d2a").cast("bigint").alias("doubled_area"),
        )
    )


@register(
    "q_readability",
    oracle="""
    WITH m AS (
        SELECT source,
               len(string_split(text, ' ')) AS w,
               GREATEST(len(regexp_extract_all(text, '[.!?]')), 1) AS s,
               GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                   AS syl
        FROM documents
    ),
    agg AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(w) AS words, SUM(s) AS sentences, SUM(syl) AS syllables
        FROM m GROUP BY source
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(words AS BIGINT) AS words,
           CAST(sentences AS BIGINT) AS sentences,
           CAST(syllables AS BIGINT) AS syllables,
           CAST(100 * words // sentences AS BIGINT) AS wps_centi,
           CAST(100 * syllables // words AS BIGINT) AS spw_centi,
           CAST(206835 - 1015 * words // sentences
                - 84600 * syllables // words AS BIGINT) AS flesch_milli
    FROM agg
    """,
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X189: Flesch-style readability per source, pure integers.

    Flesch reading ease = 206.835 - 1.015*(words/sentence) -
    84.6*(syllables/word), published formula — here scaled x1000 with
    BOTH ratios as truncating integer divisions over corpus-level
    sums (per-doc ratios would each truncate; corpus sums divide
    once). Syllables use the standard vowel-group proxy
    ('[aeiouy]+' runs, floor 1) and sentences the terminal-punctuation
    count (floor 1) — the proxies are crude but DETERMINISTIC and
    spelled with the identical regex on both engines (regexp_count /
    len(regexp_extract_all)). Scan-local counts + one aggregate; a
    quality-filter consumer thresholds flesch_milli exactly like
    X162's rule flags.
    """
    d = table(spark, sf_dir, "documents")
    m = d.select(
        "source",
        F.size(F.split("text", " ")).alias("w"),
        F.greatest(F.regexp_count("text", F.lit("[.!?]")), F.lit(1)).alias(
            "s"
        ),
        F.greatest(
            F.regexp_count(F.lower("text"), F.lit("[aeiouy]+")), F.lit(1)
        ).alias("syl"),
    )
    agg = m.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("words"),
        F.sum("s").alias("sentences"),
        F.sum("syl").alias("syllables"),
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("words").cast("bigint").alias("words"),
        F.col("sentences").cast("bigint").alias("sentences"),
        F.col("syllables").cast("bigint").alias("syllables"),
        F.expr("CAST(100 * words DIV sentences AS BIGINT)").alias(
            "wps_centi"
        ),
        F.expr("CAST(100 * syllables DIV words AS BIGINT)").alias(
            "spw_centi"
        ),
        F.expr(
            "CAST(206835 - 1015 * words DIV sentences"
            " - 84600 * syllables DIV words AS BIGINT)"
        ).alias("flesch_milli"),
    )


@register(
    "q_binary_segmentation",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    cum AS (
        SELECT day, rev,
               ROW_NUMBER() OVER (ORDER BY day) AS rn,
               SUM(rev) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
        FROM daily
    ),
    tot AS (SELECT COUNT(*) AS n, SUM(rev) AS total FROM daily),
    l1 AS (
        SELECT rn, day, c,
               ROW_NUMBER() OVER (
                   ORDER BY ABS(t.n * c - rn * t.total) DESC, rn) AS w,
               ABS(t.n * c - rn * t.total) AS stat
        FROM cum CROSS JOIN tot t WHERE rn < t.n
    ),
    s1 AS (SELECT rn AS t1, day AS d1, c AS c1, stat FROM l1 WHERE w = 1),
    left_ AS (
        SELECT cum.rn, cum.day,
               ROW_NUMBER() OVER (
                   ORDER BY ABS(s.t1 * cum.c - cum.rn * s.c1) DESC,
                            cum.rn) AS w,
               ABS(s.t1 * cum.c - cum.rn * s.c1) AS stat
        FROM cum CROSS JOIN s1 s WHERE cum.rn < s.t1
    ),
    right_ AS (
        SELECT cum.rn, cum.day,
               ROW_NUMBER() OVER (
                   ORDER BY ABS((t.n - s.t1) * (cum.c - s.c1)
                                - (cum.rn - s.t1) * (t.total - s.c1)) DESC,
                            cum.rn) AS w,
               ABS((t.n - s.t1) * (cum.c - s.c1)
                   - (cum.rn - s.t1) * (t.total - s.c1)) AS stat
        FROM cum CROSS JOIN s1 s CROSS JOIN tot t
        WHERE cum.rn > s.t1 AND cum.rn < t.n
    )
    SELECT * FROM (
        SELECT 1 AS level, 'root' AS segment,
               CAST(t1 AS INT) AS split_rn, d1 AS split_day,
               CAST(stat AS VARCHAR) AS stat FROM s1
        UNION ALL
        SELECT 2, 'left', CAST(rn AS INT), day, CAST(stat AS VARCHAR)
        FROM left_ WHERE w = 1
        UNION ALL
        SELECT 2, 'right', CAST(rn AS INT), day, CAST(stat AS VARCHAR)
        FROM right_ WHERE w = 1
    )
    """,
)
def q_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X190: depth-2 binary segmentation (recursive CUSUM changepoints).

    X133 found ONE changepoint; real regime analysis recurses: split
    at the CUSUM argmax, then split each child the same way. The key
    scale property: the children never re-walk the series — a child's
    statistic |n'*c' - t'*total'| is pure algebra over the PARENT's
    cumulative relation plus two broadcast scalars (the split's rank
    and cumulative), so depth d costs d tiny argmax passes over ONE
    two-pass cumulative, not d cumulative rebuilds. All statistics
    are exact integers (HUGEINT/DECIMAL, emitted as strings per
    X133); argmax ties break to the earliest day. The cumulative runs
    over the calendar-bounded daily aggregate.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("rev")
    )
    cum = ordered_cumsum(
        daily, order_by=["day"], values={"rev": "c"}, row_number_col="rn"
    ).localCheckpoint(eager=False)
    tot = daily.agg(F.count("*").alias("n"), F.sum("rev").alias("total"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731

    def argmax(df: DataFrame, stat_col, keep_cols):
        from pyspark.sql.window import Window

        w = Window.orderBy(F.col("__stat").desc(), F.col("rn"))
        return (
            df.withColumn("__stat", stat_col)
            .withColumn("__w", F.row_number().over(w))
            .where(F.col("__w") == 1)
            .select(*keep_cols, F.col("__stat"))
        )

    l1_base = cum.crossJoin(F.broadcast(tot)).where(F.col("rn") < F.col("n"))
    s1 = argmax(
        l1_base,
        F.abs(dec("n") * F.col("c") - dec("rn") * F.col("total")),
        ["rn", "day", "c"],
    ).select(
        F.col("rn").alias("t1"),
        F.col("day").alias("d1"),
        F.col("c").alias("c1"),
        F.col("__stat").alias("stat1"),
    )
    left_base = cum.crossJoin(F.broadcast(s1)).where(F.col("rn") < F.col("t1"))
    left = argmax(
        left_base,
        F.abs(dec("t1") * F.col("c") - dec("rn") * F.col("c1")),
        ["rn", "day"],
    )
    right_base = (
        cum.crossJoin(F.broadcast(s1))
        .crossJoin(F.broadcast(tot))
        .where((F.col("rn") > F.col("t1")) & (F.col("rn") < F.col("n")))
    )
    right = argmax(
        right_base,
        F.abs(
            (dec("n") - F.col("t1")) * (F.col("c") - F.col("c1"))
            - (dec("rn") - F.col("t1")) * (F.col("total") - F.col("c1"))
        ),
        ["rn", "day"],
    )
    row1 = s1.select(
        F.lit(1).alias("level"),
        F.lit("root").alias("segment"),
        F.col("t1").cast("int").alias("split_rn"),
        F.col("d1").alias("split_day"),
        F.col("stat1").cast("string").alias("stat"),
    )
    row2 = left.select(
        F.lit(2).alias("level"),
        F.lit("left").alias("segment"),
        F.col("rn").cast("int").alias("split_rn"),
        F.col("day").alias("split_day"),
        F.col("__stat").cast("string").alias("stat"),
    )
    row3 = right.select(
        F.lit(2).alias("level"),
        F.lit("right").alias("segment"),
        F.col("rn").cast("int").alias("split_rn"),
        F.col("day").alias("split_day"),
        F.col("__stat").cast("string").alias("stat"),
    )
    return row1.unionByName(row2).unionByName(row3)
