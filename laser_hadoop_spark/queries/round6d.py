"""Round-6 batch 4 (X366-X369): Haar wavelet decomposition, LSH
s-curve calibration audit, Bloom-filter sizing advisor, and a DoReMi
exponentiated-gradient domain-reweighting step.

Two advisor-family members (X346 RLE advisor precedent: the engine
should tell the operator HOW to configure itself from the data), one
time-series representation (exact integer Haar — the multiresolution
sibling of SAX/LTTB), and one LLM-data-mixture update with the
audit-everything discipline: the LSH s-curve audit certifies the
b=4/r=2 banding of q_dedup_near against its textbook collision
probability on the corpus's own similarity distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.cumulative import ordered_cumsum
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X366: exact integer Haar wavelet decomposition ------------------------------

_HAAR_N = 2048  # 2^11 days
_HAAR_LEVELS = 11


@register(
    "q_haar_wavelet",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS rev
        FROM orders GROUP BY 1
    ),
    idxd AS (
        SELECT rev, ROW_NUMBER() OVER (ORDER BY d) - 1 AS i
        FROM daily QUALIFY ROW_NUMBER() OVER (ORDER BY d) <= {_HAAR_N}
    ),
    lev AS (
        SELECT l.l AS level, i // (1 << l.l) AS block,
               CASE WHEN (i // (1 << (l.l - 1))) % 2 = 0
                    THEN rev ELSE -rev END AS term
        FROM idxd CROSS JOIN
             (SELECT UNNEST(generate_series(1, {_HAAR_LEVELS})) AS l) l
    ),
    coeffs AS (
        SELECT level, block, SUM(term) AS detail
        FROM lev GROUP BY 1, 2
    )
    SELECT level,
           CAST(COUNT(*) AS BIGINT) AS n_coeffs,
           CAST(MAX(ABS(detail)) AS BIGINT) AS max_abs_detail,
           CAST(SUM(CAST(detail AS DECIMAL(38,0)) * detail) AS VARCHAR)
               AS energy
    FROM coeffs
    GROUP BY level
    ORDER BY level
    """,
)
def q_haar_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X366: unnormalized Haar wavelet decomposition of the daily
    revenue series (first 2^11 days), EXACT integers end-to-end — the
    multiresolution member of the series-representation family (X300
    LTTB downsamples, SAX symbolizes, Haar localizes energy by scale:
    level-l detail = first-half sum minus second-half sum of each
    2^l-day block, the change detector behind wavelet denoising and
    the classic OLAP approximate-query synopsis).

    No iteration: detail(l, j) is ONE signed aggregate — each day
    joins its (level, block) via integer shifts, sign from the
    half-block parity bit — so all 11 levels compute in a single
    explode + groupBy. Per-level energy rides as VARCHAR DECIMAL(38)
    (detail^2 sums pass int64 at the coarse levels).

    100 TB: daily aggregate is calendar-bounded; the 11x explode is
    over that bounded relation, never facts.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice")).cast("bigint")).alias("rev")
    )
    idxd = (
        ordered_cumsum(daily, order_by=["d"], row_number_col="rn")
        .where(F.col("rn") <= _HAAR_N)
        .select("rev", (F.col("rn") - 1).alias("i"))
    )
    lev = idxd.select(
        "rev",
        "i",
        F.explode(
            F.array(*[F.lit(l) for l in range(1, _HAAR_LEVELS + 1)])
        ).alias("level"),
    ).select(
        "level",
        F.expr("i DIV shiftleft(1, level)").alias("block"),
        F.when(
            F.expr("(i DIV shiftleft(1, level - 1)) % 2") == 0, F.col("rev")
        )
        .otherwise(-F.col("rev"))
        .alias("term"),
    )
    coeffs = lev.groupBy("level", "block").agg(F.sum("term").alias("detail"))
    return (
        coeffs.groupBy("level")
        .agg(
            F.count("*").cast("bigint").alias("n_coeffs"),
            F.max(F.abs("detail")).cast("bigint").alias("max_abs_detail"),
            F.sum(F.col("detail").cast("decimal(38,0)") * F.col("detail"))
            .cast("string")
            .alias("energy"),
        )
        .orderBy("level")
    )


# --- X367: MinHash-LSH s-curve calibration audit -----------------------------------

_SC_SEEDS = 8
_SC_BANDS = 4  # of 2 rows each — the q_dedup_near configuration


def _scurve_oracle() -> str:
    seeds = ", ".join(str(s) for s in range(_SC_SEEDS))
    band_rows = "\n        UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, s{2 * b} || '|' || s{2 * b + 1} AS bv"
        " FROM wide"
        for b in range(_SC_BANDS)
    )
    sig_cols = ",\n               ".join(
        f"MIN(CASE WHEN seed = {s} THEN mh END) AS s{s}" for s in range(_SC_SEEDS)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(generate_series(1, len(t) - 2),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    shd AS (SELECT doc_id, md5(shingle) AS g FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM shd a JOIN shd b ON b.g = a.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT x.doc_a, x.doc_b,
               x.i * 10000 // (sa.n + sb.n - x.i) AS j_bp
        FROM inter x
        JOIN sizes sa ON sa.doc_id = x.doc_a
        JOIN sizes sb ON sb.doc_id = x.doc_b
    ),
    sigs AS (
        SELECT doc_id, seed,
               MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
        FROM sh CROSS JOIN (SELECT UNNEST([{seeds}]) AS seed) s
        GROUP BY doc_id, seed
    ),
    wide AS (
        SELECT doc_id, {sig_cols}
        FROM sigs GROUP BY doc_id
    ),
    bands AS ({band_rows}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT t.j_bp,
               CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS is_cand,
               CAST(ROUND(1000000 * (1 - POWER(
                   1 - POWER(t.j_bp / 10000.0, 2), {_SC_BANDS})))
                   AS BIGINT) AS p_theory_micro
        FROM truth t
        LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    )
    SELECT CAST(j_bp // 1000 AS INT) AS j_decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(is_cand) AS BIGINT) AS n_candidates,
           CAST(1000000 * SUM(is_cand) // COUNT(*) AS BIGINT)
               AS measured_micro,
           CAST(SUM(p_theory_micro) // COUNT(*) AS BIGINT)
               AS theory_micro
    FROM scored
    GROUP BY 1
    ORDER BY 1
    """


@register("q_lsh_scurve_audit", oracle=_scurve_oracle())
def q_lsh_scurve_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X367: MinHash-LSH s-curve calibration audit — does q_dedup_near's
    b=4/r=2 banding hit its textbook collision probability
    1-(1-s^r)^b on THIS corpus's similarity distribution? For every
    co-shingle pair (ground truth exact Jaccard from the 3-gram
    census), the measured candidate rate per Jaccard decile is set
    against the mean theoretical curve (each pair's theory value
    micro-rounded BEFORE the integer average, so the comparison is
    hash-exact). The table a production dedup pipeline reads before
    trusting its recall — miscalibration here means the minhash family
    is broken or the banding misconfigured.

    100 TB: reuses the two relations the dedup pipeline already
    computes (shingle equi-join truth, band equi-join candidates);
    both are collision-bounded, never all-pairs. The audit itself
    runs on a SAMPLE at production scale (the decile table needs only
    statistical mass).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= 3
    )
    # the shingle relation feeds THREE consumers (exact-Jaccard census
    # twice via shd, minhash signatures once) and the signature table
    # feeds all four band projections — eager checkpoints stop each
    # reference from replaying the corpus explode (34 exchanges
    # pre-fix, 6 after; the operators/graph.py discipline)
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2),"
                    " i -> concat(element_at(t, i), ' ', element_at(t, i + 1),"
                    " ' ', element_at(t, i + 2)))"
                )
            ).alias("shingle"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    shd = sh.select("doc_id", F.md5("shingle").alias("g"))
    sizes = shd.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shd.select(F.col("doc_id").alias("doc_a"), "g")
    b = shd.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("g2"))
    inter = (
        a.join(b, (F.col("g") == F.col("g2")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    truth = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("i * 10000 DIV (na + nb - i)").alias("j_bp"),
        )
    )
    sigs = (
        sh.crossJoin(
            F.broadcast(
                spark.range(_SC_SEEDS).select(F.col("id").cast("int").alias("seed"))
            )
        )
        .groupBy("doc_id", "seed")
        .agg(
            F.min(
                F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), "shingle"))
            ).alias("mh")
        )
    )
    wide = sigs.groupBy("doc_id").agg(
        *[
            F.min(F.when(F.col("seed") == s, F.col("mh"))).alias(f"s{s}")
            for s in range(_SC_SEEDS)
        ]
    ).localCheckpoint(eager=True)
    bands = None
    for bi in range(_SC_BANDS):
        part = wide.select(
            "doc_id",
            F.lit(bi).alias("band"),
            F.concat(F.col(f"s{2 * bi}"), F.lit("|"), F.col(f"s{2 * bi + 1}")).alias(
                "bv"
            ),
        )
        bands = part if bands is None else bands.unionByName(part)
    ba = bands.select(F.col("doc_id").alias("doc_a"), "band", "bv")
    bb = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band2"),
        F.col("bv").alias("bv2"),
    )
    cand = (
        ba.join(
            bb,
            (F.col("band") == F.col("band2"))
            & (F.col("bv") == F.col("bv2"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
        .withColumn("is_cand", F.lit(1))
    )
    scored = truth.join(cand, ["doc_a", "doc_b"], "left").select(
        "j_bp",
        F.coalesce(F.col("is_cand"), F.lit(0)).alias("is_cand"),
        F.round(
            1000000
            * (
                1
                - F.pow(
                    1 - F.pow(F.col("j_bp") / 10000.0, 2), F.lit(_SC_BANDS)
                )
            )
        )
        .cast("bigint")
        .alias("p_theory_micro"),
    )
    return (
        scored.groupBy(F.expr("CAST(j_bp DIV 1000 AS INT)").alias("j_decile"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("is_cand").cast("bigint").alias("n_candidates"),
            F.expr("CAST(1000000 * SUM(is_cand) DIV COUNT(*) AS BIGINT)").alias(
                "measured_micro"
            ),
            F.expr("CAST(SUM(p_theory_micro) DIV COUNT(*) AS BIGINT)").alias(
                "theory_micro"
            ),
        )
        .orderBy("j_decile")
    )


# --- X368: Bloom-filter sizing advisor ----------------------------------------------

# ln-constant literals (micro), identical in both engines:
# -ln(0.01)/ln(2)^2 = 9.585059, -ln(0.001)/ln(2)^2 = 14.377589
_BLOOM_BITS_1PCT_MICRO = 9585059
_BLOOM_BITS_01PCT_MICRO = 14377589


@register(
    "q_bloom_advisor",
    oracle=f"""
    WITH ndvs AS (
        SELECT 'l_orderkey' AS col, COUNT(DISTINCT l_orderkey) AS ndv
        FROM lineitem
        UNION ALL
        SELECT 'l_partkey', COUNT(DISTINCT l_partkey) FROM lineitem
        UNION ALL
        SELECT 'l_suppkey', COUNT(DISTINCT l_suppkey) FROM lineitem
    )
    SELECT col, CAST(ndv AS BIGINT) AS ndv,
           CAST((ndv * {_BLOOM_BITS_1PCT_MICRO} + 999999) // 1000000
                AS BIGINT) AS m_bits_fpr1pct,
           CAST(((ndv * {_BLOOM_BITS_1PCT_MICRO} + 999999) // 1000000 + 7)
                // 8 AS BIGINT) AS bytes_fpr1pct,
           7 AS k_fpr1pct,
           CAST((ndv * {_BLOOM_BITS_01PCT_MICRO} + 999999) // 1000000
                AS BIGINT) AS m_bits_fpr01pct,
           10 AS k_fpr01pct
    FROM ndvs
    ORDER BY col
    """,
)
def q_bloom_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X368: Bloom-filter sizing advisor for the lineitem join keys —
    the X346 (RLE sort-key advisor) discipline applied to the
    bloom-pruned semi-join path (X?s q_bloom_semi_join consumes these
    filters): from each column's EXACT ndv, the optimal bit count
    m = ceil(-n ln p / ln^2 2) and hash count k = round(m/n ln 2) for
    1% and 0.1% target false-positive rates. The ln constants inline
    as shared micro literals, so the whole advisory is ceiling-division
    integer arithmetic — hash-exact. k is constant per target rate
    (6.64 -> 7 and 9.97 -> 10), so it ships as a literal; the m and
    byte columns are what a planner actually allocates.

    100 TB: three partial count-distincts over one scan — the same
    cost as the statistics pass every optimizer already runs.
    """
    li = table(spark, sf_dir, "lineitem")
    # ONE scan for all three ndvs (the per-column union form scanned
    # lineitem three times); Spark plans multi-distinct via Expand
    agg = li.agg(
        *[
            F.count_distinct(F.col(c)).alias(c)
            for c in ("l_orderkey", "l_partkey", "l_suppkey")
        ]
    )
    ndvs = agg.selectExpr(
        "stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey,"
        " 'l_suppkey', l_suppkey) AS (col, ndv)"
    )
    m1 = f"(ndv * {_BLOOM_BITS_1PCT_MICRO} + 999999) DIV 1000000"
    m01 = f"(ndv * {_BLOOM_BITS_01PCT_MICRO} + 999999) DIV 1000000"
    return ndvs.select(
        "col",
        F.col("ndv").cast("bigint").alias("ndv"),
        F.expr(f"CAST({m1} AS BIGINT)").alias("m_bits_fpr1pct"),
        F.expr(f"CAST(({m1} + 7) DIV 8 AS BIGINT)").alias("bytes_fpr1pct"),
        F.lit(7).alias("k_fpr1pct"),
        F.expr(f"CAST({m01} AS BIGINT)").alias("m_bits_fpr01pct"),
        F.lit(10).alias("k_fpr01pct"),
    ).orderBy("col")


# --- X369: DoReMi exponentiated-gradient mixture step --------------------------------

_DOREMI_LR_MILLI = 500  # learning rate 0.5


@register(
    "q_doremi_step",
    oracle=f"""
    WITH per_dom AS (
        SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS chars
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT SUM(n_docs) AS n, SUM(chars) AS c FROM per_dom
    ),
    losses AS (
        -- deterministic excess-loss proxy: how much LONGER the
        -- domain's mean doc is than the corpus mean, in milli
        -- (stands in for the per-domain excess loss a proxy model
        -- reports; the UPDATE below is the operator under test)
        SELECT p.source, p.n_docs,
               -- HUGEINT floor division (DuckDB's DECIMAL / and //
               -- both degrade to double — probed in X349)
               CAST(1000 * (CAST(p.chars AS HUGEINT) * t.n)
                    // (CAST(t.c AS HUGEINT) * p.n_docs) - 1000
                    AS BIGINT) AS excess_milli,
               CAST(10000 * p.n_docs // t.n AS BIGINT) AS old_share_bp
        FROM per_dom p CROSS JOIN tot t
    ),
    upd AS (
        SELECT source, old_share_bp, excess_milli,
               -- w * exp(lr * excess): exp micro-rounded per domain
               CAST(old_share_bp * CAST(ROUND(1000000 * EXP(
                    {_DOREMI_LR_MILLI} * excess_milli / 1000000.0))
                    AS BIGINT) AS BIGINT) AS w_raw
        FROM losses
    ),
    norm AS (SELECT SUM(w_raw) AS z FROM upd)
    SELECT u.source, u.old_share_bp, u.excess_milli,
           -- HUGEINT floor division (DECIMAL // degrades to double)
           CAST(10000 * CAST(u.w_raw AS HUGEINT) // n.z AS BIGINT)
               AS new_weight_bp
    FROM upd u CROSS JOIN norm n
    ORDER BY u.source
    """,
)
def q_doremi_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X369: one DoReMi-style exponentiated-gradient update of the
    training-mixture domain weights — the ITERATIVE data-mixture
    optimizer next to the static reweightings (X136 share clamp, X311
    temperature smoothing): w'_d proportional to w_d * exp(lr *
    excess_loss_d), renormalized. The excess-loss input here is a
    deterministic proxy (each domain's mean-doc-length gap vs the
    corpus, in milli — a real run feeds per-domain proxy-model excess
    losses into the SAME update); the operator under test is the
    update arithmetic: exp micro-rounded per domain BEFORE the integer
    multiply, renormalization one exact DECIMAL(38) floor division, so
    every weight is hash-checkable and the step is replayable.

    100 TB: one per-domain partial aggregate (domains are few); the
    update itself is arithmetic on the broadcast domain relation.
    """
    d = table(spark, sf_dir, "documents")
    # per_dom feeds both the totals and the per-domain rows — the
    # eager checkpoint (domains are few) keeps the corpus scan single
    per_dom = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("chars")
    ).localCheckpoint(eager=True)
    tot = per_dom.agg(F.sum("n_docs").alias("n"), F.sum("chars").alias("c"))
    dec = "decimal(38,0)"
    losses = per_dom.crossJoin(F.broadcast(tot)).select(
        "source",
        # Spark decimal DIV returns BIGINT; the quotient here is
        # milli-scaled (~1000), far inside int64
        F.expr(
            "CAST(1000 * (CAST(chars AS DECIMAL(38,0)) * n)"
            " DIV (CAST(c AS DECIMAL(38,0)) * n_docs) - 1000 AS BIGINT)"
        ).alias("excess_milli"),
        F.expr("CAST(10000 * n_docs DIV n AS BIGINT)").alias("old_share_bp"),
    )
    upd = losses.select(
        "source",
        "old_share_bp",
        "excess_milli",
        (
            F.col("old_share_bp")
            * F.round(
                1000000
                * F.exp(_DOREMI_LR_MILLI * F.col("excess_milli") / 1000000.0)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("w_raw"),
    )
    norm = upd.agg(F.sum("w_raw").alias("z"))
    return (
        upd.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "old_share_bp",
            "excess_milli",
            F.expr(
                "CAST(10000 * CAST(w_raw AS DECIMAL(38,0)) DIV z AS BIGINT)"
            ).alias("new_weight_bp"),
        )
        .orderBy("source")
    )
