"""Round-4 widening queries, closing batch (SURVEY.md §2.12,
X200-X202).

Vocabulary risk, operational rhythm, and market concentration: the
hapax/rare-token exposure per document (the OOV-risk audit a fixed
tokenizer vocabulary inherits — X176 sized the vocab, this shows
which documents fall off it), the weekday x hour activity heatmap
(the on-call staffing rhythm view), and the Herfindahl-Hirschman
concentration index of revenue by customer (the antitrust/portfolio
scalar whose curve form is X199's Lorenz points).

Cross-engine discipline: document frequencies on md5-free raw tokens
(equality only, no hash needed), shares in truncating bp with
squared-bp sums exact in DECIMAL/HUGEINT, weekday numbering pinned
(isodow == weekday()+1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_rare_token_exposure",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
        FROM documents
    ),
    df_ AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token
    ),
    per_doc AS (
        SELECT t.doc_id, COUNT(*) AS n_tokens,
               COUNT(DISTINCT CASE WHEN d.df = 1 THEN t.token END)
                   AS hapax_tokens,
               SUM(CASE WHEN d.df <= 3 THEN 1 ELSE 0 END) AS rare_tokens
        FROM toks t JOIN df_ d ON d.token = t.token
        GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(hapax_tokens AS BIGINT) AS hapax_tokens,
           CAST(10000 * rare_tokens // n_tokens AS BIGINT) AS rare_bp
    FROM per_doc
    """,
)
def q_rare_token_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X200: rare-token (OOV-risk) exposure per document.

    X176 sized the vocabulary; this shows WHICH documents fall off a
    fixed one: per doc, the count of hapax legomena (document
    frequency 1 — tokens no other document shares) and the share of
    tokens with df <= 3, in exact bp. High exposure marks documents a
    trained tokenizer will shred into bytes (or an embedding model
    will see as noise) — a curation signal complementary to X162's
    surface rules. Plan: one df aggregate over the exploded relation,
    one broadcast-eligible token-df join back, one per-doc aggregate —
    df values, not text, move through the join.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    df_ = toks.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df")
    )
    return (
        toks.join(df_, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            # hapax legomena are counted as TYPES (a doc repeating one
            # unique token 7x has hapax_tokens = 1, not 7)
            F.count_distinct(F.when(F.col("df") == 1, F.col("token")))
            .cast("bigint")
            .alias("hapax_tokens"),
            F.expr(
                "CAST(10000 * SUM(CASE WHEN df <= 3 THEN 1 ELSE 0 END)"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("rare_bp"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "hapax_tokens",
            "rare_bp",
        )
    )


@register(
    "q_weekday_hour_heatmap",
    oracle="""
    WITH cells AS (
        SELECT isodow(CAST(ts AS DATE)) AS dow,
               CAST(epoch_us(ts) % 86400000000 // 3600000000 AS INT)
                   AS hour_utc,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n) AS total FROM cells)
    SELECT CAST(c.dow AS INT) AS dow, c.hour_utc,
           CAST(c.n AS BIGINT) AS n_events,
           CAST(10000 * c.n // t.total AS BIGINT) AS share_bp
    FROM cells c CROSS JOIN tot t
    """,
)
def q_weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X201: weekday x hour activity heatmap.

    The on-call/staffing rhythm view: event counts and exact bp
    shares per (ISO weekday, UTC hour) cell — at most 168 rows out of
    any fact cardinality, one map-side-combining aggregate. The hour
    derives from epoch-microseconds modular arithmetic (NOT a
    session-TZ-dependent HOUR() call — the adversarial non-UTC session
    must agree with the oracle's naive arithmetic), and the weekday
    uses the pinned isodow == weekday()+1 numbering (X86/X171).
    """
    e = table(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.weekday(F.col("ts").cast("date")) + 1).alias("dow"),
        F.expr(
            "CAST(unix_micros(ts) % 86400000000 DIV 3600000000 AS INT)"
        ).alias("hour_utc"),
    ).agg(F.count("*").alias("n"))
    tot = cells.agg(F.sum("n").alias("total"))
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("dow").cast("int").alias("dow"),
        "hour_utc",
        F.col("n").cast("bigint").alias("n_events"),
        F.expr("CAST(10000 * n DIV total AS BIGINT)").alias("share_bp"),
    )


@register(
    "q_hhi_concentration",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(rev) AS total, COUNT(*) AS n FROM cust),
    shares AS (
        SELECT 10000 * c.rev // t.total AS share_bp
        FROM cust c CROSS JOIN tot t
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_customers,
           CAST(SUM(CAST(share_bp AS HUGEINT) * share_bp) AS BIGINT)
               AS hhi_bp2,
           CAST((SELECT 100000000 // n FROM tot) AS BIGINT)
               AS perfect_equality_bp2
    FROM shares
    """,
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X202: Herfindahl-Hirschman revenue concentration index.

    The antitrust/portfolio concentration scalar (public metric; the
    curve form is X199's Lorenz points, the inequality form X90's
    Gini): HHI = sum of squared revenue shares, here in squared basis
    points (monopoly = 1e8, perfect equality = 1e8/n — emitted as the
    reference line). Shares truncate to bp integers FIRST, so the
    squared sum is exact DECIMAL/HUGEINT arithmetic — no float
    squaring; per-customer truncation loss is bounded by n bp^2 and
    identical on both engines. One per-customer aggregate + one
    scalar pass.
    """
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("rev")
    )
    tot = cust.agg(F.sum("rev").alias("total"), F.count("*").alias("n"))
    shares = cust.crossJoin(F.broadcast(tot)).select(
        F.expr("10000 * rev DIV total").alias("share_bp"), "n"
    )
    return shares.agg(
        F.min("n").cast("bigint").alias("n_customers"),
        F.sum(F.col("share_bp").cast("decimal(38,0)") * F.col("share_bp"))
        .cast("bigint")
        .alias("hhi_bp2"),
        F.expr("CAST(100000000 DIV MIN(n) AS BIGINT)").alias(
            "perfect_equality_bp2"
        ),
    )
