"""Round-4 widening queries, thirteenth batch (SURVEY.md §2.12,
X175-X179).

Incremental-ingest and two-period analytics shapes: dedup of a NEW
document batch against the EXISTING corpus (the daily-ingest path —
full-corpus dedup rebuilt from scratch is the 100 TB anti-pattern), a
vocabulary coverage curve (the tokenizer-sizing input), a
price-volume-mix revenue bridge (the finance waterfall, with the
decomposition residual emitted as an exact self-check column), a
customer value-decile migration matrix across adjacent years, and a
null-safe join semantics probe (<=> vs =).

Cross-engine discipline: md5 fingerprints for dedup keys, exact centi
units with truncating micro-divisions for the bridge effects, ntile
with unique tiebreakers, IS NOT DISTINCT FROM == eqNullSafe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_incremental_dedup",
    oracle=r"""
    WITH fp AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f
        FROM documents
    ),
    old AS (SELECT DISTINCT f FROM fp WHERE doc_id < 250),
    new_docs AS (SELECT doc_id, f FROM fp WHERE doc_id >= 250),
    flagged AS (
        SELECT n.doc_id,
               CASE WHEN o.f IS NOT NULL THEN 1 ELSE 0 END AS dup_of_old,
               CASE WHEN EXISTS (
                   SELECT 1 FROM new_docs p
                   WHERE p.f = n.f AND p.doc_id < n.doc_id
               ) THEN 1 ELSE 0 END AS dup_within_new
        FROM new_docs n LEFT JOIN old o ON o.f = n.f
    )
    SELECT doc_id, CAST(dup_of_old AS INT) AS dup_of_old,
           CAST(dup_within_new AS INT) AS dup_within_new,
           CAST(CASE WHEN dup_of_old = 0 AND dup_within_new = 0
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM flagged
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X175: dedup a NEW ingest batch against the EXISTING corpus.

    The daily-ingest path L1 (full-corpus dedup) does not cover: new
    documents (doc_id >= 250 stand in for today's batch) must be
    checked (a) against the historical fingerprint set — a broadcast
    or bloom-pruned semi-join against a SMALL digest table, never a
    rescan of the 100 TB corpus — and (b) against EARLIER documents
    in the same batch (first-seen wins, the X147 attribution rule).
    Both checks ride on the 16-byte whitespace-normalized md5 of
    q_text_fingerprint, so the historical side stores digests only.
    keep = clean on both axes; the within-batch check is one
    MIN(doc_id) aggregate + join, not the oracle's quadratic EXISTS.
    """
    from laser_hadoop_spark.operators.dedup import normalized_fingerprint

    d = table(spark, sf_dir, "documents")
    fp = d.select("doc_id", normalized_fingerprint("text").alias("f"))
    old = fp.where(F.col("doc_id") < 250).select("f").distinct()
    new_docs = fp.where(F.col("doc_id") >= 250)
    first_new = new_docs.groupBy("f").agg(F.min("doc_id").alias("first_id"))
    flagged = (
        new_docs.join(
            F.broadcast(old.withColumn("__in_old", F.lit(1))), "f", "left"
        )
        .join(first_new, "f")
        .select(
            "doc_id",
            F.coalesce("__in_old", F.lit(0)).cast("int").alias("dup_of_old"),
            (F.col("doc_id") > F.col("first_id"))
            .cast("int")
            .alias("dup_within_new"),
        )
    )
    return flagged.select(
        "doc_id",
        "dup_of_old",
        "dup_within_new",
        (
            (F.col("dup_of_old") == 0) & (F.col("dup_within_new") == 0)
        )
        .cast("int")
        .alias("keep"),
    )


@register(
    "q_vocab_coverage",
    oracle="""
    WITH toks AS (
        SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_types FROM freq),
    ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rn
        FROM freq
    ),
    ks AS (
        SELECT 10 AS k UNION ALL SELECT 100 UNION ALL
        SELECT 1000 UNION ALL SELECT 10000
    )
    SELECT CAST(ks.k AS BIGINT) AS vocab_k,
           CAST(MIN(t.n_types) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN r.rn <= ks.k THEN r.n ELSE 0 END) AS BIGINT)
               AS covered_tokens,
           CAST(10000 * SUM(CASE WHEN r.rn <= ks.k THEN r.n ELSE 0 END)
                // MIN(t.total) AS BIGINT) AS coverage_bp
    FROM ks CROSS JOIN ranked r CROSS JOIN tot t
    GROUP BY ks.k
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X176: vocabulary coverage curve (tokenizer-sizing input).

    What fraction of corpus token MASS do the top-k types cover, for
    k in {10, 100, 1k, 10k} — the curve that decides a tokenizer's
    vocabulary size (and predicts the OOV rate a fixed vocab leaves
    behind; Zipf X105 fits the same relation's slope). Ranking is
    (freq DESC, token) — a total order, so every k's coverage is
    deterministic. Plan: one token count aggregate, then the rank over
    the type relation (|types|, not |tokens|) runs through the
    two-pass operator — no single-partition window even at extreme
    type cardinality — and a 4-row k axis joins in.
    """
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    tot = freq.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_types")
    )
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    ranked = ordered_cumsum(
        freq,
        order_by=[F.col("n").desc(), F.col("token")],
        row_number_col="rn",
    ).select("n", "rn")
    ks = spark.createDataFrame([(10,), (100,), (1000,), (10000,)], ["k"])
    return (
        ks.crossJoin(ranked)
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("k").cast("bigint").alias("vocab_k"))
        .agg(
            F.min("n_types").cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("rn") <= F.col("k"), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("covered_tokens"),
            F.expr(
                "CAST(10000 * SUM(CASE WHEN rn <= k THEN n ELSE 0 END)"
                " DIV MIN(total) AS BIGINT)"
            ).alias("coverage_bp"),
        )
    )


@register(
    "q_price_volume_mix",
    oracle="""
    WITH yr AS (
        SELECT l_partkey AS part, YEAR(l_shipdate) AS y,
               SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev,
               SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS qty
        FROM lineitem GROUP BY l_partkey, YEAR(l_shipdate)
    ),
    pairs AS (
        SELECT a.part, a.y AS y0, a.rev AS rev0, a.qty AS qty0,
               b.rev AS rev1, b.qty AS qty1
        FROM yr a JOIN yr b ON b.part = a.part AND b.y = a.y + 1
        WHERE a.qty > 0 AND b.qty > 0
    ),
    fx AS (
        SELECT y0,
               SUM(rev1 - rev0) AS delta_rev,
               SUM((qty1 - qty0) * rev0 // qty0) AS volume_effect,
               SUM(rev1 * qty0 // qty1 - rev0) AS price_effect
        FROM pairs GROUP BY y0
    )
    SELECT CAST(y0 AS INT) AS year_from,
           CAST(delta_rev AS BIGINT) AS delta_rev_centi,
           CAST(volume_effect AS BIGINT) AS volume_effect_centi,
           CAST(price_effect AS BIGINT) AS price_effect_centi,
           CAST(delta_rev - volume_effect - price_effect AS BIGINT)
               AS residual_centi
    FROM fx
    """,
)
def q_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X177: price-volume revenue bridge across adjacent years.

    The finance waterfall: how much of each year-over-year revenue
    change came from selling MORE (volume at old unit price:
    (q1-q0) * rev0/q0) vs charging MORE (new volume at the unit-price
    delta: q1 * (p1-p0) = rev1*q0/q1 - rev0 after clearing). Both
    effects are truncating integer divisions in exact centi, so the
    bridge does not exactly close — and instead of hiding that, the
    RESIDUAL (delta - volume - price: truncation + cross-term mass)
    is emitted as an exact self-check column the oracle hash pins.
    Two-period self-join on the per-(part, year) aggregate, never on
    the fact table.
    """
    li = table(spark, sf_dir, "lineitem")
    yr = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.year("l_shipdate").alias("y"),
    ).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("rev"),
        F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint")).alias(
            "qty"
        ),
    )
    a, b = yr.alias("a"), yr.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.part") == F.col("a.part"))
            & (F.col("b.y") == F.col("a.y") + 1),
        )
        .where((F.col("a.qty") > 0) & (F.col("b.qty") > 0))
        .select(
            F.col("a.y").alias("y0"),
            F.col("a.rev").alias("rev0"),
            F.col("a.qty").alias("qty0"),
            F.col("b.rev").alias("rev1"),
            F.col("b.qty").alias("qty1"),
        )
    )
    fx = pairs.groupBy("y0").agg(
        F.sum(F.col("rev1") - F.col("rev0")).alias("delta_rev"),
        F.sum(
            F.expr("(qty1 - qty0) * rev0 DIV qty0")
        ).alias("volume_effect"),
        F.sum(F.expr("rev1 * qty0 DIV qty1 - rev0")).alias("price_effect"),
    )
    return fx.select(
        F.col("y0").cast("int").alias("year_from"),
        F.col("delta_rev").cast("bigint").alias("delta_rev_centi"),
        F.col("volume_effect").cast("bigint").alias("volume_effect_centi"),
        F.col("price_effect").cast("bigint").alias("price_effect_centi"),
        (F.col("delta_rev") - F.col("volume_effect") - F.col("price_effect"))
        .cast("bigint")
        .alias("residual_centi"),
    )


@register(
    "q_decile_migration",
    oracle="""
    WITH cy AS (
        SELECT o_custkey AS cust, YEAR(o_orderdate) AS y,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS spend
        FROM orders GROUP BY o_custkey, YEAR(o_orderdate)
    ),
    dec AS (
        SELECT cust, y,
               NTILE(10) OVER (PARTITION BY y ORDER BY spend, cust) AS d
        FROM cy
    )
    SELECT CAST(a.y AS INT) AS year_from,
           CAST(a.d AS INT) AS from_decile,
           CAST(b.d AS INT) AS to_decile,
           COUNT(*) AS n_customers
    FROM dec a JOIN dec b ON b.cust = a.cust AND b.y = a.y + 1
    GROUP BY a.y, a.d, b.d
    """,
)
def q_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X178: customer value-decile migration across adjacent years.

    The churn-risk transition matrix: each customer's spend decile in
    year Y vs Y+1 (only customers active in both). The oracle keeps
    DuckDB's NTILE(10) PARTITION BY y spelling; a per-year window
    would put EVERY customer of a year into one task, so the Spark
    side derives the per-year rank distributedly instead: one global
    row number over (y, spend, cust) via ordered_cumsum (parallel
    range shuffle), minus a per-year start offset computed by a
    triangular self-join over the tiny year-counts relation (the same
    no-SinglePartition offset discipline ordered_cumsum itself uses),
    then NTILE's closed form (closed_form_ntile) per year. The
    migration join is a two-period self-join on that same aggregate.
    The diagonal mass is retention; below-diagonal mass feeds the X78
    RFM interventions.
    """
    from laser_hadoop_spark.operators.cumulative import (
        closed_form_ntile,
        ordered_cumsum,
    )

    o = table(spark, sf_dir, "orders")
    cy = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.year("o_orderdate").alias("y"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("spend")
    )
    ranked = ordered_cumsum(
        cy, order_by=["y", "spend", "cust"], row_number_col="grn"
    )
    yc = cy.groupBy("y").agg(F.count("*").alias("n"))
    ya, yb = yc.alias("ya"), yc.alias("yb")
    offs = (
        ya.join(yb, F.col("yb.y") < F.col("ya.y"), "left")
        .groupBy(F.col("ya.y").alias("y"), F.col("ya.n").alias("n"))
        .agg(F.coalesce(F.sum(F.col("yb.n")), F.lit(0)).alias("off"))
    )
    dec = (
        ranked.join(F.broadcast(offs), "y")
        .withColumn("rn", F.col("grn") - F.col("off"))
        .select("cust", "y", closed_form_ntile("rn", "n", 10).alias("d"))
    )
    a, b = dec.alias("a"), dec.alias("b")
    return (
        a.join(
            b,
            (F.col("b.cust") == F.col("a.cust"))
            & (F.col("b.y") == F.col("a.y") + 1),
        )
        .groupBy(
            F.col("a.y").cast("int").alias("year_from"),
            F.col("a.d").cast("int").alias("from_decile"),
            F.col("b.d").cast("int").alias("to_decile"),
        )
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "q_null_safe_join",
    oracle="""
    WITH keyed AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN NULL
                    ELSE c_nationkey END AS k
        FROM customer
    ),
    dim AS (
        SELECT n_nationkey AS k, n_name FROM nation
        UNION ALL SELECT NULL, 'UNATTRIBUTED'
    ),
    ns AS (
        SELECT c.c_custkey, d.n_name
        FROM keyed c JOIN dim d ON c.k IS NOT DISTINCT FROM d.k
    ),
    eq AS (
        SELECT c.c_custkey FROM keyed c JOIN dim d ON c.k = d.k
    )
    SELECT (SELECT COUNT(*) FROM keyed WHERE k IS NULL) AS n_null_keys,
           (SELECT COUNT(*) FROM ns) AS nullsafe_matches,
           (SELECT COUNT(*) FROM eq) AS equality_matches,
           (SELECT COUNT(*) FROM ns WHERE n_name = 'UNATTRIBUTED')
               AS null_to_null_matches
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X179: null-safe equality join semantics (<=> vs =).

    The SQL null-handling family beyond q_null_semantics' aggregates:
    a nullable join key (negative-balance customers get NULL) joined
    to a dimension carrying an explicit NULL 'UNATTRIBUTED' row. The
    null-safe operator (Spark `eqNullSafe` / column<=>, DuckDB
    IS NOT DISTINCT FROM) matches NULL to NULL — the
    unattributed-bucket pattern every attribution pipeline needs —
    while plain `=` silently drops every NULL-keyed row. The single
    result row pins all four counts, so the hash check proves both
    engines agree on the three-valued-logic corner.
    """
    c = table(spark, sf_dir, "customer")
    keyed = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("k"),
    )
    n = table(spark, sf_dir, "nation")
    dim = n.select(
        F.col("n_nationkey").alias("k"), F.col("n_name")
    ).unionByName(
        n.sparkSession.createDataFrame(
            [(None, "UNATTRIBUTED")], "k int, n_name string"
        )
    )
    ns = keyed.join(F.broadcast(dim), keyed["k"].eqNullSafe(dim["k"]))
    eq = keyed.join(F.broadcast(dim), keyed["k"] == dim["k"])
    n_null = keyed.where(F.col("k").isNull()).agg(
        F.count("*").alias("n_null_keys")
    )
    agg_ns = ns.agg(
        F.count("*").alias("nullsafe_matches"),
        F.sum((F.col("n_name") == "UNATTRIBUTED").cast("bigint")).alias(
            "null_to_null_matches"
        ),
    )
    agg_eq = eq.agg(F.count("*").alias("equality_matches"))
    return (
        n_null.crossJoin(agg_ns)
        .crossJoin(agg_eq)
        .select(
            "n_null_keys",
            "nullsafe_matches",
            "equality_matches",
            "null_to_null_matches",
        )
    )
