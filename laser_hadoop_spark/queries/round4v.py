"""Round-4 widening queries, closing audit (SURVEY.md §2.12, X203).

The sketch-quality harness: X135's MinHash-LSH candidates scored
against the EXACT shingle Jaccard — per-pair estimator error
summarized in one hash-pinned row. The approximate stack (L2, X102,
X114, X135) ships estimators; this measures them on their own
candidates, cross-engine exact. Every band-collision pair provably
shares >= 1 shingle (equal min-hashes imply the argmin shingle is
shared), so the intersection join drops nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.queries.round4d import _minhash_band_sql, q_minhash_band_pairs
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_minhash_accuracy",
    oracle=f"""
    WITH pairs AS (SELECT * FROM ({_minhash_band_sql()}) q),
    toks2 AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh2 AS (
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(generate_series(1, len(t) - 2),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM toks2 WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
    inter AS (
        SELECT p.doc_a, p.doc_b, p.est_jaccard_bp, COUNT(*) AS i
        FROM pairs p
        JOIN sh2 a ON a.doc_id = p.doc_a
        JOIN sh2 b ON b.doc_id = p.doc_b AND b.s = a.s
        GROUP BY p.doc_a, p.doc_b, p.est_jaccard_bp
    ),
    err AS (
        SELECT ABS(x.est_jaccard_bp
                   - 10000 * x.i // (sa.n + sb.n - x.i)) AS e
        FROM inter x
        JOIN sizes sa ON sa.doc_id = x.doc_a
        JOIN sizes sb ON sb.doc_id = x.doc_b
    )
    SELECT COUNT(*) AS n_pairs,
           CAST(SUM(e) // COUNT(*) AS BIGINT) AS mean_abs_err_bp,
           CAST(MAX(e) AS BIGINT) AS max_abs_err_bp,
           CAST(SUM(CASE WHEN e <= 1250 THEN 1 ELSE 0 END) AS BIGINT)
               AS within_one_seed
    FROM err
    """,
)
def q_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X203: MinHash estimator accuracy on its own LSH candidates.

    The audit the approximate-dedup stack owes its users: for every
    X135 band-collision pair, |estimated - exact| Jaccard in bp, with
    the exact value from the definitional shingle-set intersection
    (10000*|A and B| DIV |A or B|). An 8-seed signature quantizes the
    estimate to 1250-bp steps, so `within_one_seed` counts pairs
    inside one quantum — the theoretically-expected band. Exactness:
    candidate shingles join on RAW shingle strings (set identity needs
    equality only); the summary row is pure integer arithmetic, so
    the estimator's measured error itself is hash-verified
    cross-engine. Scale shape: the intersection join is restricted to
    LSH candidates (never all pairs), and the per-doc shingle sets
    dedup scan-locally before exploding.
    """
    from laser_hadoop_spark.operators.dedup import word_shingles

    pairs = q_minhash_band_pairs(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    # word_shingles builds the identical space-joined trigram set via
    # zip_with slice views (~6x faster than element_at-in-transform,
    # per its docstring); short docs yield an empty array and drop at
    # the explode
    sh = (
        d.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.explode(word_shingles("text", 3)).alias("s"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b2"), F.col("s").alias("s_b"))
    inter = (
        pairs.join(a, "doc_a")
        .join(
            b,
            (F.col("doc_b") == F.col("doc_b2"))
            & (F.col("s") == F.col("s_b")),
        )
        .groupBy("doc_a", "doc_b", "est_jaccard_bp")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    err = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.abs(
                F.col("est_jaccard_bp")
                - F.expr("10000 * i DIV (na + nb - i)")
            ).alias("e")
        )
    )
    return err.agg(
        F.count("*").alias("n_pairs"),
        F.expr("CAST(SUM(e) DIV COUNT(*) AS BIGINT)").alias(
            "mean_abs_err_bp"
        ),
        F.max("e").cast("bigint").alias("max_abs_err_bp"),
        F.sum(F.when(F.col("e") <= 1250, 1).otherwise(0))
        .cast("bigint")
        .alias("within_one_seed"),
    )
