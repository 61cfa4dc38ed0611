"""Round-5 widening queries, fourth batch (SURVEY.md §2.13, X218-X222).

- X218 deterministic Poisson bootstrap CI: THE distributed bootstrap
  (each row contributes an independent pseudo-Poisson(1) count per
  replicate, so no resampling pass over the data exists at all) made
  exactly verifiable by deriving the counts from md5 instead of an RNG.
- X219 Mann-Kendall trend test: the non-parametric trend detector
  (exact integer S statistic + tie-aware tau) that complements X145's
  Theil-Sen slope estimate.
- X220 revenue proration (interval-overlap allocation): the billing /
  recognition allocator — order revenue split across calendar months
  by day overlap, exact-by-telescoping integer cents.
- X221 zone-map (data-skipping) audit: per-block min/max pruning
  effectiveness, natural vs date-clustered layout — the measurement
  behind X57's Z-order layout choice.
- X222 canonical-survivor selection after transitive dedup: the final
  step of the near-dup pipeline (X12 clusters -> keep the best doc per
  cluster), with the per-source retention census a curation run reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import spread_scan, table

# --- X218: deterministic Poisson bootstrap CI ------------------------------

# Inverse-CDF thresholds for Poisson(1) scaled to the 24-bit hash space
# [0, 16^6): c = #{t : t <= u} gives P(c=k) = Poisson(1) pmf to within
# 2^-24. Both engines share these integer constants, so the "random"
# resample counts are identical bit-for-bit.
_POIS_T = (6171993, 12343986, 15429982, 16458648, 16715814, 16767247, 16775819)
_N_REPS = 32


def _pois_case(u_expr: str) -> str:
    """CASE expression mapping a 24-bit uniform to a Poisson(1) count."""
    branches = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"(CASE {branches} ELSE {len(_POIS_T)} END)"


def _pois_case_hex(s_expr: str) -> str:
    """_pois_case with the draw kept as its 6-char lowercase-hex digest
    slice: equal-width lowercase hex compares lexicographically exactly
    like the 24-bit number it spells, so the thresholds become string
    literals and the per-draw conv(…, 16, 10) disappears (round 12 —
    the q_relabel_test finding; the 32 radix conversions per row were
    the scan's second-biggest cost after md5 itself)."""
    branches = " ".join(
        f"WHEN {s_expr} < '{t:06x}' THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"(CASE {branches} ELSE {len(_POIS_T)} END)"


def _bootstrap_oracle() -> str:
    # 5 independent 24-bit uniforms per 128-bit digest: replicate r
    # reads hex chars [6*(r%5)+1 .. +6] of md5(key || '|' || r DIV 5)
    # — 7 md5 evaluations per row instead of 32 (same draws both
    # engines; the md5 work dominates the whole query)
    u = (
        "('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || '|' "
        "|| CAST(r // 5 AS VARCHAR)), 6 * (r % 5) + 1, 6))::BIGINT"
    )
    return f"""
    WITH base AS (
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    reps AS (SELECT UNNEST(generate_series(0, {_N_REPS - 1})) AS r),
    drawn AS (
        SELECT r, {_pois_case(u)} AS c, cents
        FROM base CROSS JOIN reps
    ),
    agg AS (
        SELECT r, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * cents) AS BIGINT) AS s
        FROM drawn GROUP BY r
    ),
    means AS (SELECT r, s // n AS mean FROM agg),
    ranked AS (
        SELECT mean, ROW_NUMBER() OVER (ORDER BY mean, r) AS rk FROM means
    ),
    pt AS (
        SELECT CAST(SUM(cents) // COUNT(*) AS BIGINT) AS point_mean FROM base
    )
    SELECT CAST(pt.point_mean AS BIGINT) AS point_mean_cents,
           CAST(MIN(CASE WHEN rk = 2 THEN mean END) AS BIGINT) AS ci_lo_cents,
           CAST(MIN(CASE WHEN rk = {_N_REPS - 1} THEN mean END) AS BIGINT)
               AS ci_hi_cents,
           CAST({_N_REPS} AS INT) AS n_replicates
    FROM ranked CROSS JOIN pt GROUP BY pt.point_mean
    """


@register("q_bootstrap_ci", oracle=_bootstrap_oracle())
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X218: deterministic Poisson-bootstrap confidence interval for the
    mean order value, exactly verified.

    The Poisson bootstrap is the ONLY bootstrap that works at 100 TB:
    instead of materializing B resamples, every row independently
    contributes a Poisson(1)-distributed count to each replicate, so
    all B replicate sums come out of ONE scan with map-side combine.
    Here the counts are derived from md5 via shared inverse-CDF integer
    thresholds (not an RNG), so both engines draw identical resamples
    and the whole "randomized" procedure is hash-verifiable. The CI is
    the 2nd/31st order statistic of the 32 replicate means (~94% CI).

    100 TB: the 32 replicates are 64 conditional-sum aggregate columns
    in a single scan-local pass — the x32 resample rows NEVER exist
    (X114's fanout-free discipline); everything after the first
    aggregate is a 32-row relation.
    """
    # The 32 per-replicate md5 draws dominate; a single-file scan runs
    # them in ONE task. Repartition the 16-byte projection first so the
    # hash work spreads across the cluster (q_minhash_signatures' fix;
    # measured 4.2 s -> sub-second at sf0.1 on 32 cores). Round 13:
    # spread_scan — hash partitioning on the unique key instead of
    # round-robin (no sortBeforeRepartition pass, deterministic under
    # retry), guarded no-op once the scan has >= cores splits.
    o = spread_scan(
        table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        "o_orderkey",
    )
    # Round 12: the 7 digests are PROJECTED once per row before the
    # aggregate (the q_relabel_test discipline — inline md5 inside each
    # of the 64 aggregate expressions defeats codegen subexpression
    # elimination across aggregates), and each draw stays a 6-char hex
    # SLICE compared against hex-literal thresholds (_pois_case_hex)
    # instead of a conv(…, 16, 10) radix conversion. Together:
    # 1.66 -> 0.95 s noop at sf0.1, identical draws.
    # Round 13: expressions built as SQL strings (the q_relabel_test
    # plan-build lesson — nested Column chains for 7 digests + 64 wide
    # aggregates are py4j-bound plan BUILD time inside the timed fn()).
    digests = [
        f"md5(concat(CAST(o_orderkey AS STRING), '|{j}')) AS m{j}"
        for j in range((_N_REPS + 4) // 5)
    ]
    base = o.selectExpr(
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents", *digests
    )
    aggs = [
        F.expr("COUNT(*) AS point_n"),
        F.expr("SUM(cents) AS point_s"),
    ]
    for r in range(_N_REPS):
        u = f"substring(m{r // 5}, {6 * (r % 5) + 1}, 6)"
        c = _pois_case_hex(u)
        aggs.append(F.expr(f"SUM({c}) AS n_{r}"))
        aggs.append(F.expr(f"SUM({c} * cents) AS s_{r}"))
    one = base.agg(*aggs)
    stack_args = ", ".join(f"'{r}', n_{r}, s_{r}" for r in range(_N_REPS))
    reps = one.selectExpr(
        "point_s DIV point_n AS point_mean",
        f"stack({_N_REPS}, {stack_args}) AS (r, n, s)",
    ).select(
        "point_mean",
        F.col("r").cast("int").alias("r"),
        F.expr("s DIV n").alias("mean"),
    )
    rk = F.row_number().over(Window.orderBy("mean", "r"))
    ranked = reps.select("point_mean", "mean", rk.alias("rk"))
    return (
        ranked.groupBy(
            F.col("point_mean").cast("bigint").alias("point_mean_cents")
        )
        .agg(
            F.min(F.when(F.col("rk") == 2, F.col("mean")))
            .cast("bigint")
            .alias("ci_lo_cents"),
            F.min(F.when(F.col("rk") == _N_REPS - 1, F.col("mean")))
            .cast("bigint")
            .alias("ci_hi_cents"),
        )
        .select(
            "point_mean_cents",
            "ci_lo_cents",
            "ci_hi_cents",
            F.lit(_N_REPS).cast("int").alias("n_replicates"),
        )
    )


# --- X219: Mann-Kendall trend test -----------------------------------------


@register(
    "q_mann_kendall",
    oracle="""
    WITH monthly AS (
        SELECT o_orderpriority AS grp,
               date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.grp,
               SUM(CASE WHEN b.rev > a.rev THEN 1 ELSE 0 END) AS n_concordant,
               SUM(CASE WHEN b.rev < a.rev THEN 1 ELSE 0 END) AS n_discordant,
               SUM(CASE WHEN b.rev = a.rev THEN 1 ELSE 0 END) AS n_tied
        FROM monthly a JOIN monthly b ON b.grp = a.grp AND b.m > a.m
        GROUP BY a.grp
    ),
    sizes AS (SELECT grp, COUNT(*) AS n_months FROM monthly GROUP BY grp)
    SELECT s.grp AS o_orderpriority,
           CAST(s.n_months AS BIGINT) AS n_months,
           CAST(p.n_concordant - p.n_discordant AS BIGINT) AS s_stat,
           CAST(p.n_concordant AS BIGINT) AS n_concordant,
           CAST(p.n_discordant AS BIGINT) AS n_discordant,
           CAST(p.n_tied AS BIGINT) AS n_tied,
           CAST(CASE WHEN p.n_concordant >= p.n_discordant
                     THEN (p.n_concordant - p.n_discordant) * 10000
                          // (s.n_months * (s.n_months - 1) // 2)
                     ELSE -((p.n_discordant - p.n_concordant) * 10000
                            // (s.n_months * (s.n_months - 1) // 2))
                END AS BIGINT) AS tau_bp
    FROM sizes s JOIN pairs p ON p.grp = s.grp
    """,
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X219: Mann-Kendall trend test, exact integers.

    The standard non-parametric monotone-trend detector over each
    priority class's monthly revenue series: S = #(later > earlier) -
    #(later < earlier) over all ordered month pairs, tau = S / C(n,2)
    in truncating bp (sign split so both engines truncate toward zero).
    Complements X145 (Theil-Sen estimates the slope; Mann-Kendall
    decides whether a trend exists at all) and is immune to outliers
    and the revenue scale.

    100 TB: the month-pair self-join is PER-GROUP over the bounded
    calendar series (n months, not n rows — C(84,2) pairs per group
    regardless of fact size); one shuffle builds the monthly relation,
    everything after is dimension-sized.
    """
    o = table(spark, sf_dir, "orders")
    cents = F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
    ).agg(F.sum(cents).alias("rev"))
    a, b = monthly.alias("a"), monthly.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.grp") == F.col("a.grp")) & (F.col("b.m") > F.col("a.m")),
        )
        .groupBy(F.col("a.grp").alias("grp"))
        .agg(
            F.sum(F.when(F.col("b.rev") > F.col("a.rev"), 1).otherwise(0)).alias(
                "n_concordant"
            ),
            F.sum(F.when(F.col("b.rev") < F.col("a.rev"), 1).otherwise(0)).alias(
                "n_discordant"
            ),
            F.sum(F.when(F.col("b.rev") == F.col("a.rev"), 1).otherwise(0)).alias(
                "n_tied"
            ),
        )
    )
    sizes = monthly.groupBy("grp").agg(F.count("*").alias("n_months"))
    s = F.col("n_concordant") - F.col("n_discordant")
    # integer DIV with explicit sign split (truncation toward zero on
    # both engines, negative-safe)
    tau = F.expr(
        "CASE WHEN n_concordant >= n_discordant "
        "THEN (n_concordant - n_discordant) * 10000 "
        "     DIV (n_months * (n_months - 1) DIV 2) "
        "ELSE -((n_discordant - n_concordant) * 10000 "
        "       DIV (n_months * (n_months - 1) DIV 2)) END"
    )
    return (
        sizes.join(pairs, "grp")
        .select(
            F.col("grp").alias("o_orderpriority"),
            F.col("n_months").cast("bigint").alias("n_months"),
            s.cast("bigint").alias("s_stat"),
            F.col("n_concordant").cast("bigint").alias("n_concordant"),
            F.col("n_discordant").cast("bigint").alias("n_discordant"),
            F.col("n_tied").cast("bigint").alias("n_tied"),
            tau.cast("bigint").alias("tau_bp"),
        )
    )


# --- X220: revenue proration (interval-overlap allocation) -----------------


@register(
    "q_revenue_proration",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS start_d,
               CAST(10 + o_orderkey % 50 AS BIGINT) AS dur,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    exploded AS (
        SELECT o_orderkey, start_d, dur, cents,
               CAST(UNNEST(generate_series(
                   date_trunc('month', start_d),
                   date_trunc('month', start_d + CAST(dur - 1 AS INT)),
                   INTERVAL 1 MONTH)) AS DATE) AS m
        FROM base
    ),
    alloc AS (
        SELECT m,
               cents * LEAST(dur, date_diff('day', start_d,
                                 CAST(m + INTERVAL 1 MONTH AS DATE))) // dur
             - cents * GREATEST(0, date_diff('day', start_d, m)) // dur
                   AS alloc_cents
        FROM exploded
    )
    SELECT m AS month, COUNT(*) AS n_orders,
           CAST(SUM(alloc_cents) AS BIGINT) AS alloc_revenue_cents
    FROM alloc GROUP BY 1
    """,
)
def q_revenue_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X220: interval-overlap revenue proration, exact by telescoping.

    The revenue-recognition allocator: each order's revenue is spread
    over a service interval [orderdate, orderdate + dur) (dur = 10 +
    orderkey % 50 days, deterministic) proportionally to the day
    overlap with each calendar month. Exactness trick: month k's
    allocation is cum(k) - cum(k-1) where cum(k) = cents *
    days_through_k DIV dur — the truncating divisions TELESCOPE, so
    per-order allocations sum to the order total exactly with no
    largest-remainder fixup pass.

    100 TB: scan-local explode bounded by months-per-interval (<= 3
    here), then one month-keyed aggregate with map-side combine — the
    same plan as any calendar rollup; no join, no window.
    """
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("start_d"),
        (F.lit(10) + F.col("o_orderkey") % 50).cast("bigint").alias("dur"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    exploded = base.select(
        "o_orderkey",
        "start_d",
        "dur",
        "cents",
        F.explode(
            F.expr(
                "sequence(trunc(start_d, 'MM'), "
                "trunc(date_add(start_d, CAST(dur AS INT) - 1), 'MM'), "
                "interval 1 month)"
            )
        ).alias("m"),
    )
    alloc = exploded.select(
        F.col("m"),
        (
            F.expr(
                "cents * LEAST(dur, CAST(datediff(add_months(m, 1), start_d) "
                "AS BIGINT)) DIV dur"
            )
            - F.expr(
                "cents * GREATEST(0, CAST(datediff(m, start_d) AS BIGINT)) "
                "DIV dur"
            )
        ).alias("alloc_cents"),
    )
    return alloc.groupBy(F.col("m").alias("month")).agg(
        F.count("*").alias("n_orders"),
        F.sum("alloc_cents").cast("bigint").alias("alloc_revenue_cents"),
    )


# --- X221: zone-map (data-skipping) audit ----------------------------------

_ZM_BLOCK = 512
_ZM_LO = "1996-01-01"
_ZM_HI = "1996-04-01"


def _zonemap_oracle() -> str:
    def layout(name: str, blk: str) -> str:
        return f"""
    SELECT '{name}' AS layout, n_blocks, n_prunable,
           CAST(n_prunable * 10000 // n_blocks AS BIGINT) AS prunable_bp,
           rows_scanned, rows_matching
    FROM (
        SELECT COUNT(*) AS n_blocks,
               CAST(SUM(CASE WHEN prunable THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_prunable,
               CAST(SUM(CASE WHEN prunable THEN 0 ELSE n END) AS BIGINT)
                   AS rows_scanned,
               CAST(SUM(n_match) AS BIGINT) AS rows_matching
        FROM (
            SELECT {blk} AS blk, COUNT(*) AS n,
                   SUM(CASE WHEN d >= DATE '{_ZM_LO}' AND d < DATE '{_ZM_HI}'
                            THEN 1 ELSE 0 END) AS n_match,
                   MAX(d) < DATE '{_ZM_LO}' OR MIN(d) >= DATE '{_ZM_HI}'
                       AS prunable
            FROM src GROUP BY 1
        )
    )"""

    return (
        """
    WITH src AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
    )"""
        + layout("natural", f"o_orderkey // {_ZM_BLOCK}")
        + "\n    UNION ALL"
        + layout(
            "date_clustered",
            "CAST(EXTRACT(YEAR FROM d) * 100 + EXTRACT(MONTH FROM d) AS BIGINT)",
        )
    )


@register("q_zonemap_audit", oracle=_zonemap_oracle())
def q_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X221: zone-map (min/max data-skipping) effectiveness audit.

    The measurement behind every clustering/layout decision (X57's
    Z-order, Delta/Iceberg file stats): per storage block, min/max of
    the filter column decide whether a scan with the predicate
    [1996-01-01, 1996-04-01) can SKIP the block entirely. Compares the
    natural (insertion-order, orderkey-blocked) layout — where dates
    are spread so ~nothing prunes — against a date-clustered layout
    (monthly blocks) where almost everything prunes; reports blocks,
    prunable share in bp, and rows actually scanned after pruning.

    100 TB: two block-keyed aggregates with map-side combine over one
    scan shape each; block stats relations are tiny (n/512 and <=
    n_months rows). This is the audit a table-layout optimizer runs
    before choosing a clustering key.
    """
    o = table(spark, sf_dir, "orders")
    src = o.select("o_orderkey", F.col("o_orderdate").cast("date").alias("d"))
    match = F.when(
        (F.col("d") >= F.lit(_ZM_LO)) & (F.col("d") < F.lit(_ZM_HI)), 1
    ).otherwise(0)

    def layout(name: str, blk) -> DataFrame:
        blocks = src.groupBy(blk.alias("blk")).agg(
            F.count("*").alias("n"),
            F.sum(match).alias("n_match"),
            (
                (F.max("d") < F.lit(_ZM_LO)) | (F.min("d") >= F.lit(_ZM_HI))
            ).alias("prunable"),
        )
        return blocks.agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.when(F.col("prunable"), 1).otherwise(0)).alias("n_prunable"),
            F.expr(
                "SUM(CASE WHEN prunable THEN 1 ELSE 0 END) * 10000 "
                "DIV COUNT(*)"
            ).alias("prunable_bp"),
            F.sum(F.when(F.col("prunable"), 0).otherwise(F.col("n")))
            .cast("bigint")
            .alias("rows_scanned"),
            F.sum("n_match").cast("bigint").alias("rows_matching"),
        ).select(
            F.lit(name).alias("layout"), "n_blocks", "n_prunable",
            "prunable_bp", "rows_scanned", "rows_matching",
        )

    nat = layout("natural", F.expr(f"o_orderkey DIV {_ZM_BLOCK}"))
    clu = layout(
        "date_clustered",
        F.expr("CAST(year(d) * 100 + month(d) AS BIGINT)"),
    )
    return nat.unionByName(clu)


# --- X222: canonical-survivor selection after transitive dedup -------------

_SURV_THRESHOLD = 0.8
_PACK = 100_000_000


@register(
    "q_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), shingles AS (
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(generate_series(1, len(t) - 2),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   AS shingle
        FROM toks
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
    ), cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), edges AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE n_common * 1.0 / (sa.n + sb.n - n_common) > {_SURV_THRESHOLD}
    ), sym AS (
        SELECT doc_a AS a, doc_b AS b FROM edges
        UNION SELECT doc_b, doc_a FROM edges
    ), walk AS (
        SELECT a AS node, a AS comp FROM sym
        UNION
        SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.node
    ), clus AS (
        SELECT node AS doc_id, MIN(comp) AS cid FROM walk GROUP BY node
    ), members AS (
        SELECT d.doc_id, d.source, COALESCE(c.cid, d.doc_id) AS cid,
               d.n_chars * {_PACK} + ({_PACK} - 1 - d.doc_id) AS packed
        FROM documents d LEFT JOIN clus c ON c.doc_id = d.doc_id
    ), winners AS (
        SELECT cid, {_PACK} - 1 - MAX(packed) % {_PACK} AS surv_id
        FROM members GROUP BY cid
    )
    SELECT m.source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN w.surv_id = m.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_survivors,
           CAST(SUM(CASE WHEN w.surv_id = m.doc_id THEN 0 ELSE 1 END)
                AS BIGINT) AS n_dropped
    FROM members m JOIN winners w ON w.cid = m.cid
    GROUP BY m.source
    """,
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X222: canonical-survivor selection after transitive dedup, with
    the per-source retention census.

    The last mile of the near-dup pipeline that X12 stops short of:
    3-gram Jaccard pairs -> connected components -> per cluster keep
    the HIGHEST-QUALITY member (longest text, ties to smallest id; the
    argmax is one integer MAX over packed n_chars*1e8 + (1e8 - id), no
    join-back), singletons survive by definition; census per source of
    kept vs dropped — the number a curation run actually reports.

    100 TB: clusters come from the banded pair-join (digests on the
    wire) + min-label propagation; the winner pick is ONE aggregate on
    the cluster key and the census one more on source — no step holds a
    cluster's texts in memory.
    """
    from laser_hadoop_spark.operators.dedup import ngram_jaccard_pairs
    from laser_hadoop_spark.operators.graph import dedup_clusters

    d = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, id_col="doc_id", text_col="text", n=3, threshold=_SURV_THRESHOLD
    )
    clusters = dedup_clusters(pairs).select("doc_id", "cluster_id")
    members = (
        d.select("doc_id", "source", "n_chars")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("cluster_id", "doc_id").alias("cid"),
            (
                F.col("n_chars") * _PACK + (F.lit(_PACK - 1) - F.col("doc_id"))
            ).alias("packed"),
        )
    )
    winners = members.groupBy("cid").agg(
        (F.lit(_PACK - 1) - F.max("packed") % _PACK).alias("surv_id")
    )
    kept = F.when(F.col("surv_id") == F.col("doc_id"), 1).otherwise(0)
    return (
        members.join(winners, "cid")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept).alias("n_survivors"),
            F.sum(1 - kept).alias("n_dropped"),
        )
    )
