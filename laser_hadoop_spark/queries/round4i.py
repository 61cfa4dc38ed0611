"""Round-4 widening queries, ninth batch (SURVEY.md §2.12, X162-X164).

Curation-rule and cohort-economics shapes: a Gopher-style document
quality rule suite (Rae et al. 2021's published filter family) as
pure cross-multiplied integer predicates, a confusion matrix for the
L3 language-ID heuristic against the labeled lang column (the eval
harness a production langid swap would be judged by), and a cohort
LTV curve (cumulative revenue per cohort age — the unit-economics
view X37's retention matrix prices).

Cross-engine discipline: every ratio rule is cross-multiplied to
integers (no division at all), counts are exact, the only windows
partition on cohort keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# Shared stopword list + its SQL spelling (queries/llm.py owns both;
# one source keeps the X162/X163 oracles in lockstep with L3/L4).
from laser_hadoop_spark.queries.llm import _STOP_SQL, _STOPWORDS


def _stop_sql_list() -> str:
    return _STOP_SQL


@register(
    "q_gopher_rules",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               string_split(text, ' ') AS words,
               len(string_split(text, ' ')) AS n_words,
               len(replace(text, ' ', '')) AS n_chars
        FROM documents
    ),
    f AS (
        SELECT doc_id, n_words,
               CASE WHEN n_words >= 50 AND n_words <= 100000
                    THEN 1 ELSE 0 END AS ok_word_count,
               CASE WHEN 3 * n_words <= n_chars AND n_chars <= 10 * n_words
                    THEN 1 ELSE 0 END AS ok_mean_word_len,
               CASE WHEN len(list_filter(words,
                        w -> w IN ({_stop_sql_list()}))) >= 2
                    THEN 1 ELSE 0 END AS ok_stopwords,
               CASE WHEN 5 * len(list_filter(words,
                        w -> regexp_matches(w, '^[0-9]+$'))) <= n_words
                    THEN 1 ELSE 0 END AS ok_numeric_ratio
        FROM m
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(ok_word_count AS INT) AS ok_word_count,
           CAST(ok_mean_word_len AS INT) AS ok_mean_word_len,
           CAST(ok_stopwords AS INT) AS ok_stopwords,
           CAST(ok_numeric_ratio AS INT) AS ok_numeric_ratio,
           CAST(ok_word_count * ok_mean_word_len * ok_stopwords
                * ok_numeric_ratio AS INT) AS passes_all
    FROM f
    """,
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X162: Gopher-style quality rule suite (published filter family).

    The rule family of Rae et al. 2021 (Gopher, public paper) adapted
    to the corpus: word-count bounds, mean-word-length bounds,
    minimum stopword evidence, and a numeric-token-ratio cap — each
    spelled as a CROSS-MULTIPLIED integer predicate (3*n <= chars <=
    10*n instead of 3 <= chars/n <= 10), so no division exists
    anywhere and no boundary document can flip between engines. All
    four flags plus the conjunction per document; downstream the
    curation pipeline (X7) consumes passes_all exactly like its
    quality-score gate. Scan-local codegen over one documents pass —
    at 100 TB the filter costs one projection.
    """
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_words = F.size(words)
    n_chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    n_digit = F.size(F.filter(words, lambda w: w.rlike("^[0-9]+$")))
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        ((n_words >= 50) & (n_words <= 100000)).cast("int").alias("ok_word_count"),
        ((3 * n_words <= n_chars) & (n_chars <= 10 * n_words))
        .cast("int")
        .alias("ok_mean_word_len"),
        (n_stop >= 2).cast("int").alias("ok_stopwords"),
        (5 * n_digit <= n_words).cast("int").alias("ok_numeric_ratio"),
    )
    return m.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        "ok_word_count",
        "ok_mean_word_len",
        "ok_stopwords",
        "ok_numeric_ratio",
        (
            F.col("ok_word_count")
            * F.col("ok_mean_word_len")
            * F.col("ok_stopwords")
            * F.col("ok_numeric_ratio")
        )
        .cast("int")
        .alias("passes_all"),
    )


@register(
    "q_langid_confusion",
    oracle=f"""
    WITH scored AS (
        SELECT lang AS labeled_lang,
               CASE WHEN 20 * len(list_filter(string_split(text, ' '),
                        w -> w IN ({_stop_sql_list()})))
                         >= len(string_split(text, ' '))
                    THEN 'en' ELSE 'other' END AS predicted_lang
        FROM documents
    )
    SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
    FROM scored GROUP BY labeled_lang, predicted_lang
    """,
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X163: confusion matrix for the L3 language-ID heuristic.

    Evaluates q_text_langid's marker-ratio classifier against the
    labeled lang column: (labeled, predicted) counts — the harness
    that would judge any production langid swap (fastText etc.)
    before it ships. The 5% threshold is cross-multiplied
    (20 * stopword_hits >= n_words) so the decision is pure integer —
    the float en_score of the display query never enters the
    comparison. One scan-local projection + one tiny aggregate.
    """
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    pred = F.when(20 * n_stop >= F.size(words), "en").otherwise("other")
    return (
        d.select(
            F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "q_cohort_ltv",
    oracle="""
    WITH cohort AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cd
        FROM events GROUP BY user_id
    ),
    sizes AS (SELECT cd, COUNT(*) AS n_users FROM cohort GROUP BY cd),
    spend AS (
        SELECT c.cd,
               date_diff('day', c.cd, CAST(e.ts AS DATE)) AS age,
               SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)) AS rev
        FROM events e JOIN cohort c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY c.cd, age
    ),
    cum AS (
        SELECT cd, age, rev,
               SUM(rev) OVER (PARTITION BY cd ORDER BY age
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_rev
        FROM spend
    )
    SELECT CAST(c.cd AS DATE) AS cohort_day, CAST(c.age AS INT) AS age_days,
           CAST(s.n_users AS BIGINT) AS n_users,
           CAST(c.cum_rev AS BIGINT) AS cum_rev_centi,
           CAST(c.cum_rev // s.n_users AS BIGINT) AS ltv_centi
    FROM cum c JOIN sizes s ON s.cd = c.cd
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X164: cohort LTV curve (cumulative revenue per cohort age).

    The unit-economics view on top of X37's retention matrix: users
    cohorted by first-activity DAY (the driver corpus spans one
    month, so month cohorts would collapse to a single row); purchase
    revenue bucketed by integer day age (datediff — identical on both
    engines); cumulative revenue and per-user LTV in exact centi per
    (cohort_day, age_days). The cumulative window partitions by
    cohort over the day-granular aggregate (|days|^2-bounded by the
    calendar span, not by fact cardinality); the only fact-table
    shuffles are the two user_id/day aggregates sharing one
    partitioning.
    """
    e = table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    cohort = e.groupBy("user_id").agg(F.min(day).alias("cd"))
    sizes = cohort.groupBy("cd").agg(F.count("*").alias("n_users"))
    spend = (
        e.where(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .groupBy("cd", F.datediff(day, F.col("cd")).alias("age"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("rev")
        )
    )
    w = (
        Window.partitionBy("cd")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = spend.select("cd", "age", F.sum("rev").over(w).alias("cum_rev"))
    return cum.join(sizes, "cd").select(
        F.col("cd").alias("cohort_day"),
        F.col("age").cast("int").alias("age_days"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("cum_rev").cast("bigint").alias("cum_rev_centi"),
        F.expr("CAST(cum_rev DIV n_users AS BIGINT)").alias("ltv_centi"),
    )
