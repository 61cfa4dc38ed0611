"""Round-5 widening queries, first batch (SURVEY.md §2.13, X204-X208).

New operator capability, each oracle-backed and integer-exact:

- X204 grid-blocked spatial join: 2D neighbor-cell candidate
  generation + exact integer squared-distance filter — the planar
  sibling of the 1D band join (X104) and the LSH band join (X135).
- X205 record-linkage scoring: Fellegi-Sunter-style blocked candidate
  pairs with integer agreement weights — entity resolution's core
  loop (blocking for recall, weighted field agreement for precision).
- X206 count-min sketch, exactly verified: deterministic md5 row
  hashes make the sketch itself a hash-checkable artifact, and the
  audit measures the one-sided overestimate against exact counts.
- X207 Bloom-filter false-positive-rate audit: deterministic k-bit
  membership over a probe population — pins the FPR the X51 pruned
  semi-join relies on.
- X208 exact embedding covariance (upper triangle, leading dims):
  micro-fixed-point cross-moments — the Gram/covariance building
  block under PCA (U5), exactly verified where the float PCA path is
  pytest-only.

Cross-engine discipline as ever: md5-derived integers via
conv/('0x'||…)::BIGINT (both engines see identical hex), money in
centi/micro bigints, DIV == //, unique tiebreakers, identical column
aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X204: grid-blocked spatial join ---------------------------------------

_GRID = 10_000  # coordinate domain [0, _GRID)
_RADIUS = 250  # join radius; cell width == radius


def _xy_spark(key: str):
    """Deterministic synthetic 2D point from a key column (md5-derived,
    identical in DuckDB): x from hex[1:8), y from hex[9:16)."""
    x = F.expr(
        f"CAST(conv(substring(md5(CAST({key} AS STRING)), 1, 7), 16, 10) "
        f"AS BIGINT) % {_GRID}"
    )
    y = F.expr(
        f"CAST(conv(substring(md5(CAST({key} AS STRING)), 9, 7), 16, 10) "
        f"AS BIGINT) % {_GRID}"
    )
    return x, y


@register(
    "q_grid_spatial_join",
    tags=("pairs",),
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 7))::BIGINT
                   % {_GRID} AS x,
               ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 9, 7))::BIGINT
                   % {_GRID} AS y
        FROM customer WHERE c_custkey % 5 = 0
    )
    SELECT a.id AS id_a, b.id AS id_b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         <= {_RADIUS * _RADIUS}
    """,
)
def q_grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X204: grid-blocked spatial (radius) join, exactly verified.

    Pairs of 2D points within Euclidean distance r, found WITHOUT the
    quadratic all-pairs the oracle spells: each point maps to a grid
    cell of width r; side A keeps its home cell, side B replicates to
    its 3x3 cell neighborhood, candidates come from a cell equi-join
    (a qualifying pair is found exactly once — A's home cell is one of
    B's nine), then the exact integer squared-distance filter. Points
    are md5-derived from c_custkey so the fixture is deterministic in
    both engines.

    100 TB shape: candidates scale with local density (points per
    cell), never n² — the planar analogue of X104's 1D band join; the
    replication factor is a constant 9. Skewed cells (urban hot spots)
    would salt the cell key exactly like X24's salted join.
    """
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") % 5 == 0)
    x, y = _xy_spark("c_custkey")
    pts = c.select(
        F.col("c_custkey").alias("id"), x.alias("x"), y.alias("y")
    )
    # cell id encoding: cx * K + cy with K > max neighbor cy — phantom
    # neighbor cells (cx or cy = -1 / max+1) never equal a home cell,
    # so the equi-join below only matches genuine 3x3 neighborhoods
    k_enc = _GRID // _RADIUS + 2

    def cell(cx: F.Column, cy: F.Column) -> F.Column:
        return (cx * k_enc + cy).cast("bigint")

    home = lambda v: F.expr(f"CAST({v} DIV {_RADIUS} AS BIGINT)")  # noqa: E731
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        cell(home("x"), home("y")).alias("__cell"),
    )
    dxy = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.explode(
            F.array(
                *[
                    cell(home("x") + F.lit(dx), home("y") + F.lit(dy))
                    for dx, dy in dxy
                ]
            )
        ).alias("__cell"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, "__cell")
        .where((F.col("id_a") < F.col("id_b")) & (d2 <= _RADIUS * _RADIUS))
        .select("id_a", "id_b", d2.cast("bigint").alias("dist2"))
    )


# --- X205: record-linkage (Fellegi-Sunter-style) scoring -------------------

_LINK_THRESHOLD = 30


@register(
    "q_record_linkage",
    tags=("pairs",),
    oracle=f"""
    WITH recs AS (
        SELECT c_custkey AS id, c_nationkey AS nk, c_mktsegment AS seg,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_centi,
               length(c_name) AS name_len
        FROM customer
    ),
    cand AS (
        SELECT a.id AS id_a, b.id AS id_b,
               (CASE WHEN a.seg = b.seg THEN 20 ELSE -5 END
              + CASE WHEN ABS(a.bal_centi - b.bal_centi) <= 10000
                     THEN 25 ELSE 0 END
              + CASE WHEN a.name_len = b.name_len THEN 10 ELSE 0 END
              + CASE WHEN a.bal_centi % 100 = b.bal_centi % 100
                     THEN 15 ELSE 0 END) AS score
        FROM recs a JOIN recs b
          ON a.nk = b.nk AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(score AS BIGINT) AS score
    FROM cand WHERE score >= {_LINK_THRESHOLD}
    """,
)
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X205: blocked record-linkage scoring (Fellegi-Sunter shape).

    Entity resolution's two-stage loop: candidate pairs from a
    blocking key (nation — recall stage, never all-pairs), then an
    integer agreement score summing per-field match weights
    (segment +20/-5, balance within $100 +25, name length +10,
    balance cents digits +15 — stand-ins for the log-likelihood-ratio
    weights a trained FS model produces), thresholded. All integer,
    hash-verified.

    100 TB shape: the self-join shuffles on the blocking key only;
    precision fields ride along as row payload. Skewed blocks would
    composite the key (nation x segment) or salt, same as X24.
    """
    c = table(spark, sf_dir, "customer")
    recs = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint").alias("bal_centi"),
        F.length("c_name").alias("name_len"),
    )
    a, b = recs.alias("a"), recs.alias("b")
    score = (
        F.when(F.col("a.seg") == F.col("b.seg"), 20).otherwise(-5)
        + F.when(
            F.abs(F.col("a.bal_centi") - F.col("b.bal_centi")) <= 10000, 25
        ).otherwise(0)
        + F.when(F.col("a.name_len") == F.col("b.name_len"), 10).otherwise(0)
        + F.when(
            F.col("a.bal_centi") % 100 == F.col("b.bal_centi") % 100, 15
        ).otherwise(0)
    )
    return (
        a.join(
            b,
            (F.col("a.nk") == F.col("b.nk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            score.cast("bigint").alias("score"),
        )
        .where(F.col("score") >= _LINK_THRESHOLD)
    )


# --- X206: count-min sketch, exactly verified ------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 256  # counters per row
_CMS_PROBES = 20  # audit keys: user_id < 20


@register(
    "q_countmin_audit",
    oracle=f"""
    WITH keyed AS (SELECT user_id AS k FROM events),
    seeds AS (SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS i),
    cells AS (
        SELECT i,
               ('0x' || substring(md5(CAST(i AS VARCHAR) || '|'
                                      || CAST(k AS VARCHAR)), 1, 7))::BIGINT
                   % {_CMS_W} AS h,
               COUNT(*) AS c
        FROM keyed CROSS JOIN seeds
        GROUP BY 1, 2
    ),
    probes AS (
        SELECT DISTINCT k FROM keyed WHERE k < {_CMS_PROBES}
    ),
    est AS (
        SELECT p.k,
               MIN(c.c) AS cms_est
        FROM probes p CROSS JOIN seeds s
        JOIN cells c
          ON c.i = s.i
         AND c.h = ('0x' || substring(md5(CAST(s.i AS VARCHAR) || '|'
                                          || CAST(p.k AS VARCHAR)), 1, 7))::BIGINT
                   % {_CMS_W}
        GROUP BY p.k
    ),
    exact AS (
        SELECT k, COUNT(*) AS exact_n FROM keyed
        WHERE k < {_CMS_PROBES} GROUP BY k
    )
    SELECT e.k AS user_id, x.exact_n, e.cms_est,
           CAST(e.cms_est - x.exact_n AS BIGINT) AS over_est
    FROM est e JOIN exact x ON x.k = e.k
    """,
)
def q_countmin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X206: count-min sketch build + point-query accuracy audit,
    exactly verified end-to-end.

    The mergeable frequency sketch with DETERMINISTIC md5 row hashes:
    the d x w counter matrix is one groupBy over (seed, bucket) —
    map-side combine shrinks each partition to <= d*w rows before the
    tiny shuffle, the sketch's defining scale property (the reduce
    moves d*w counters regardless of input rows). Point queries take
    min over the d probed cells; the audit joins exact counts for the
    probe keys and reports the one-sided overestimate (CMS never
    underestimates — the driver hash-check pins that invariant on
    real data).

    100 TB: identical plan — the shuffle moves 1024 counters per
    partition ceiling, and sketches from disjoint data merge by cell
    addition (same property X120 exercises for avg states).
    """
    e = table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(_CMS_D)])
    ).alias("i")
    hashed = e.select("k", seeds).select(
        "k",
        "i",
        F.expr(
            f"CAST(conv(substring(md5(concat(CAST(i AS STRING), '|', "
            f"CAST(k AS STRING))), 1, 7), 16, 10) AS BIGINT) % {_CMS_W}"
        ).alias("h"),
    )
    cells = hashed.groupBy("i", "h").agg(F.count("*").alias("c"))
    probes = e.where(F.col("k") < _CMS_PROBES)
    exact = probes.groupBy("k").agg(F.count("*").alias("exact_n"))
    probe_cells = exact.select("k", F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("i")).select(
        "k",
        "i",
        F.expr(
            f"CAST(conv(substring(md5(concat(CAST(i AS STRING), '|', "
            f"CAST(k AS STRING))), 1, 7), 16, 10) AS BIGINT) % {_CMS_W}"
        ).alias("h"),
    )
    est = (
        probe_cells.join(F.broadcast(cells), ["i", "h"])
        .groupBy("k")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        est.join(exact, "k")
        .select(
            F.col("k").alias("user_id"),
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).cast("bigint").alias("over_est"),
        )
    )


# --- X207: Bloom-filter FPR audit ------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_K = 3  # hash functions


@register(
    "q_bloom_fpr_audit",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    ),
    seeds AS (SELECT UNNEST(generate_series(0, {_BLOOM_K - 1})) AS i),
    bits AS (
        SELECT DISTINCT
               ('0x' || substring(md5(CAST(i AS VARCHAR) || '|'
                                      || CAST(k AS VARCHAR)), 1, 7))::BIGINT
                   % {_BLOOM_M} AS pos
        FROM members CROSS JOIN seeds
    ),
    probes AS (SELECT c_custkey AS k FROM customer),
    nonmembers AS (
        SELECT p.k FROM probes p
        WHERE NOT EXISTS (SELECT 1 FROM members m WHERE m.k = p.k)
    ),
    hits AS (
        SELECT n.k, COUNT(*) AS set_bits
        FROM nonmembers n CROSS JOIN seeds s
        JOIN bits b
          ON b.pos = ('0x' || substring(md5(CAST(s.i AS VARCHAR) || '|'
                                            || CAST(n.k AS VARCHAR)), 1, 7))::BIGINT
                     % {_BLOOM_M}
        GROUP BY n.k
    ),
    fp AS (
        SELECT COUNT(*) AS n_fp FROM hits WHERE set_bits = {_BLOOM_K}
    ),
    counts AS (
        SELECT (SELECT COUNT(*) FROM members) AS n_members,
               (SELECT COUNT(*) FROM nonmembers) AS n_nonmembers,
               (SELECT COUNT(*) FROM bits) AS n_set_bits,
               (SELECT n_fp FROM fp) AS n_false_pos
    )
    SELECT CAST(n_members AS BIGINT) AS n_members,
           CAST(n_nonmembers AS BIGINT) AS n_nonmembers,
           CAST(n_set_bits AS BIGINT) AS n_set_bits,
           CAST(n_false_pos AS BIGINT) AS n_false_pos,
           CAST(10000 * n_false_pos // n_nonmembers AS BIGINT) AS fpr_bp
    FROM counts
    """,
)
def q_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X207: Bloom-filter false-positive-rate audit, exactly verified.

    Builds an m=4096-bit, k=3 filter over the 'F'-status customer set
    with deterministic md5 bit positions, probes EVERY non-member
    customer, and reports the measured FPR in basis points — the
    empirical counterpart of (1-e^(-kn/m))^k that X51's bloom-pruned
    semi-join budgets against. The bit set is a <= m-row relation
    (broadcast); probing is k hash expressions + a broadcast semi-join
    per seed folded into one join + count — no driver-side bit array.

    100 TB: members aggregate to <= m distinct bits regardless of
    cardinality (the filter IS the reduction); probes stream scan-side
    with a broadcast of the m-row bit relation.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    members = (
        o.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    seeds = F.explode(F.array(*[F.lit(i) for i in range(_BLOOM_K)])).alias("i")

    def pos_expr() -> F.Column:
        return F.expr(
            f"CAST(conv(substring(md5(concat(CAST(i AS STRING), '|', "
            f"CAST(k AS STRING))), 1, 7), 16, 10) AS BIGINT) % {_BLOOM_M}"
        )

    bits = members.select("k", seeds).select(pos_expr().alias("pos")).distinct()
    probes = c.select(F.col("c_custkey").alias("k"))
    nonmembers = probes.join(members, "k", "left_anti")
    hits = (
        nonmembers.select("k", seeds)
        .select("k", pos_expr().alias("pos"))
        .join(F.broadcast(bits), "pos")
        .groupBy("k")
        .agg(F.count("*").alias("set_bits"))
    )
    n_fp = hits.where(F.col("set_bits") == _BLOOM_K).agg(
        F.count("*").alias("n_false_pos")
    )
    n_m = members.agg(F.count("*").alias("n_members"))
    n_nm = nonmembers.agg(F.count("*").alias("n_nonmembers"))
    n_b = bits.agg(F.count("*").alias("n_set_bits"))
    return (
        n_m.crossJoin(n_nm)
        .crossJoin(n_b)
        .crossJoin(F.broadcast(n_fp))
        .select(
            "n_members",
            "n_nonmembers",
            "n_set_bits",
            "n_false_pos",
            F.expr("10000 * n_false_pos DIV n_nonmembers")
            .cast("bigint")
            .alias("fpr_bp"),
        )
    )


# --- X208: exact embedding covariance (leading dims) -----------------------

_COV_DIMS = 8


@register(
    "q_embedding_covariance",
    oracle=f"""
    WITH dims AS (
        SELECT vec_id,
               UNNEST(generate_series(1, {_COV_DIMS})) AS d
        FROM embeddings
    ),
    vals AS (
        SELECT e.vec_id, d.d AS i,
               CAST(FLOOR(CAST(e.embedding[d.d] AS DOUBLE) * 1000 + 0.5)
                    AS BIGINT) AS v
        FROM embeddings e JOIN dims d ON d.vec_id = e.vec_id
    ),
    pairs AS (
        SELECT a.i, b.i AS j, a.vec_id, a.v AS va, b.v AS vb
        FROM vals a JOIN vals b
          ON b.vec_id = a.vec_id AND b.i >= a.i
    ),
    moments AS (
        SELECT i, j, COUNT(*) AS n,
               SUM(va) AS sa, SUM(vb) AS sb, SUM(va * vb) AS sab
        FROM pairs GROUP BY i, j
    )
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST((n * sab - sa * sb) // (n * n) AS BIGINT) AS cov_micro
    FROM moments
    """,
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X208: exact covariance matrix (upper triangle) of the leading
    embedding dimensions, milli-fixed-point (milli x milli = micro).

    The Gram/covariance building block under PCA (U5's float path is
    pytest-only; this pins the cross-moments exactly): each vector's
    first 8 dims quantize to 1e-3 fixed point (milli — chosen so
    n·Σab stays far inside bigint at every probed scale; |x| < 1), the (i, j <= i..8)
    upper triangle explodes scan-locally (36 pairs per row — a
    constant), and one groupBy((i, j)) accumulates n, Σa, Σb, Σab.
    cov = (nΣab - ΣaΣb) / n² in exact integer micro²-units (population
    covariance, floor division — identical on both engines).

    100 TB: the shuffle carries 36 partial-moment rows per partition
    (map-side combine), independent of vector count; full-width d
    would shuffle d(d+1)/2 cells — the standard tall-skinny Gram
    pattern where the reduce is O(d²), never O(n).
    """
    em = table(spark, sf_dir, "embeddings")
    vals = em.select(
        "vec_id",
        F.posexplode(F.slice(F.col("embedding"), 1, _COV_DIMS)).alias("i0", "x"),
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.floor(F.col("x").cast("double") * 1000 + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )
    a, b = vals.alias("a"), vals.alias("b")
    moments = (
        a.join(
            b,
            (F.col("b.vec_id") == F.col("a.vec_id"))
            & (F.col("b.i") >= F.col("a.i")),
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            F.count("*").alias("n"),
            F.sum("a.v").alias("sa"),
            F.sum("b.v").alias("sb"),
            F.sum(F.col("a.v") * F.col("b.v")).alias("sab"),
        )
    )
    return moments.select(
        F.col("i").cast("int"),
        F.col("j").cast("int"),
        F.expr("(n * sab - sa * sb) DIV (n * n)").cast("bigint").alias("cov_micro"),
    )
