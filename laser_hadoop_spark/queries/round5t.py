"""Round-5 widening queries, twentieth batch (SURVEY.md §2.13, X300-X304).

Time-series downsampling and motif mining, edit-distance record
linkage beyond Levenshtein, and graph truss decomposition:

- X300 LTTB downsampling (fixed-anchor variant): the standard
  visual-fidelity downsampler — per bucket, keep the point whose
  triangle area against the neighboring buckets' means is largest;
  areas are exact integers via cross-multiplication.
- X301 matrix-profile discords (STOMP diagonal form): for every
  m-length window of the daily series, the z-normalized distance to
  its nearest non-trivial neighbor — large values are discords
  (anomalies), computed via the diagonal sliding-dot-product trick.
- X302 Jaro similarity join: the record-linkage similarity Spark
  lacks natively (only levenshtein), as an Arrow-batched kernel
  verified bit-for-bit against DuckDB's jaro_similarity builtin.
- X303 Damerau-Levenshtein join: FULL (unrestricted) DL distance —
  adjacent transpositions cost 1 — verified against DuckDB's
  damerau_levenshtein (probed: 'CA'->'ABC' = 2, so unrestricted,
  not the OSA variant).
- X304 triangle-support census (k-truss step): per-edge triangle
  membership counts over X66's deterministic supplier graph — the
  support relation k-truss peeling iterates on.

Reference parity note: engine extensions per SURVEY.md §2.13.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X300: LTTB downsampling (fixed-anchor variant) --------------------------

_LTTB_BUCKETS = 60


@register(
    "q_lttb_downsample",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) // 100
                   AS v
        FROM orders GROUP BY 1
    ),
    pts AS (
        SELECT ROW_NUMBER() OVER (ORDER BY d) AS t, d, v,
               NTILE({_LTTB_BUCKETS}) OVER (ORDER BY d) AS bkt
        FROM daily
    ),
    bstat AS (
        SELECT bkt, SUM(t) AS sx, SUM(v) AS sy, COUNT(*) AS n
        FROM pts GROUP BY bkt
    ),
    mid AS (
        SELECT p.bkt, p.t, p.d, p.v,
               ABS(pr.sx * (p.v * nx.n - nx.sy)
                   + p.t * (nx.sy * pr.n - pr.sy * nx.n)
                   + nx.sx * (pr.sy - p.v * pr.n)) AS area2
        FROM pts p
        JOIN bstat pr ON pr.bkt = p.bkt - 1
        JOIN bstat nx ON nx.bkt = p.bkt + 1
    ),
    picked AS (
        SELECT bkt, t, d, v,
               ROW_NUMBER() OVER (PARTITION BY bkt
                                  ORDER BY area2 DESC, t) AS rnk
        FROM mid
    ),
    ends AS (
        SELECT bkt, t, d, v,
               ROW_NUMBER() OVER (PARTITION BY bkt
                   ORDER BY CASE WHEN bkt = 1 THEN t ELSE -t END) AS rnk
        FROM pts WHERE bkt IN (1, {_LTTB_BUCKETS})
    )
    SELECT CAST(bkt AS INT) AS bkt, CAST(t AS BIGINT) AS t, d,
           CAST(v AS BIGINT) AS v
    FROM (SELECT * FROM picked WHERE rnk = 1
          UNION ALL SELECT * FROM ends WHERE rnk = 1)
    ORDER BY bkt
    """,
)
def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X300: largest-triangle-three-buckets downsampling, fixed anchors.

    The visual-fidelity downsampler charting stacks use: split the
    daily revenue series into 60 equal-count buckets; in each interior
    bucket keep the point forming the LARGEST triangle against the
    neighboring buckets' mean points (the fixed-anchor LTTB variant —
    anchoring on bucket means instead of the previously selected point
    removes the sequential dependency, so every bucket selects
    independently). Triangle areas compare as exact integers: the
    2*area determinant with mean coordinates sx/n, sy/n is multiplied
    through by n_prev * n_next, clearing both denominators — no float
    enters the argmax. First/last buckets keep their first/last point
    (LTTB's endpoint convention).

    100 TB: the series is calendar-bounded; one fact shuffle builds
    it, the bucket stats are a 60-row relation joined back broadcast.
    """
    o = table(spark, sf_dir, "orders")
    cents = F.sum(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        ((cents - cents % 100) / 100).cast("bigint").alias("v")
    )
    w = Window.orderBy("d")
    pts = daily.select(
        F.row_number().over(w).alias("t"),
        "d",
        "v",
        F.ntile(_LTTB_BUCKETS).over(w).alias("bkt"),
    ).localCheckpoint(eager=True)
    bstat = pts.groupBy("bkt").agg(
        F.sum("t").alias("sx"), F.sum("v").alias("sy"), F.count("*").alias("n")
    )
    pr, nx = bstat.alias("pr"), bstat.alias("nx")
    p = pts.alias("p")
    # 2*area scaled by n_pr*n_nx (clearing both mean denominators):
    # |pr.sx*(v*nx.n - nx.sy) + t*(nx.sy*pr.n - pr.sy*nx.n)
    #  + nx.sx*(pr.sy - v*pr.n)| — the same expansion as the oracle,
    # so the integer argmax is identical by construction
    area2 = F.abs(
        F.col("pr.sx") * (F.col("p.v") * F.col("nx.n") - F.col("nx.sy"))
        + F.col("p.t")
        * (F.col("nx.sy") * F.col("pr.n") - F.col("pr.sy") * F.col("nx.n"))
        + F.col("nx.sx") * (F.col("pr.sy") - F.col("p.v") * F.col("pr.n"))
    )
    mid = (
        p.join(F.broadcast(pr), F.col("pr.bkt") == F.col("p.bkt") - 1)
        .join(F.broadcast(nx), F.col("nx.bkt") == F.col("p.bkt") + 1)
        .select(
            F.col("p.bkt").alias("bkt"),
            F.col("p.t").alias("t"),
            F.col("p.d").alias("d"),
            F.col("p.v").alias("v"),
            area2.alias("area2"),
        )
    )
    w_pick = Window.partitionBy("bkt").orderBy(F.desc("area2"), "t")
    picked = (
        mid.withColumn("rnk", F.row_number().over(w_pick))
        .where(F.col("rnk") == 1)
        .drop("area2", "rnk")
    )
    w_ends = Window.partitionBy("bkt").orderBy(
        F.when(F.col("bkt") == 1, F.col("t")).otherwise(-F.col("t"))
    )
    ends = (
        pts.where(F.col("bkt").isin(1, _LTTB_BUCKETS))
        .withColumn("rnk", F.row_number().over(w_ends))
        .where(F.col("rnk") == 1)
        .select("bkt", "t", "d", "v")
    )
    return (
        picked.unionByName(ends)
        .select(
            F.col("bkt").cast("int").alias("bkt"),
            F.col("t").cast("bigint").alias("t"),
            "d",
            F.col("v").cast("bigint").alias("v"),
        )
        .orderBy("bkt")
    )


# --- X301: matrix-profile discords (STOMP diagonal form) ---------------------

_MP_M = 5
_MP_TOP = 20


@register(
    "q_matrix_profile",
    oracle=f"""
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS t,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) // 100
                   AS v
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    nn AS (SELECT COUNT(*) AS n FROM daily),
    stats AS (
        SELECT t AS i,
               SUM(v) OVER (ORDER BY t
                   ROWS BETWEEN CURRENT ROW AND {_MP_M - 1} FOLLOWING) AS s,
               SUM(v * v) OVER (ORDER BY t
                   ROWS BETWEEN CURRENT ROW AND {_MP_M - 1} FOLLOWING) AS q
        FROM daily
    ),
    win AS (
        SELECT i, s, q, {_MP_M} * q - s * s AS var2
        FROM stats CROSS JOIN nn WHERE i <= n - {_MP_M} + 1
    ),
    prods AS (
        SELECT a.t - b.t AS delta, a.t AS u, a.v * b.v AS c
        FROM daily a JOIN daily b ON a.t > b.t + {_MP_M - 1}
    ),
    sxy AS (
        SELECT delta, u AS i,
               SUM(c) OVER (PARTITION BY delta ORDER BY u
                   ROWS BETWEEN CURRENT ROW AND {_MP_M - 1} FOLLOWING) AS dot,
               COUNT(*) OVER (PARTITION BY delta ORDER BY u
                   ROWS BETWEEN CURRENT ROW AND {_MP_M - 1} FOLLOWING) AS m_got
        FROM prods
    ),
    dists AS (
        SELECT x.i, x.i - x.delta AS j,
               CAST(ROUND(1000000.0 * 2 * {_MP_M}
                    * (1 - ({_MP_M} * x.dot - wi.s * wj.s)
                         / SQRT(CAST(wi.var2 AS DOUBLE) * wj.var2)))
                    AS BIGINT) AS d2_micro
        FROM sxy x
        JOIN win wi ON wi.i = x.i
        JOIN win wj ON wj.i = x.i - x.delta
        WHERE x.m_got = {_MP_M} AND wi.var2 > 0 AND wj.var2 > 0
    ),
    sym AS (
        SELECT i, d2_micro FROM dists
        UNION ALL
        SELECT j AS i, d2_micro FROM dists
    ),
    profile AS (
        SELECT i, MIN(d2_micro) AS nn_d2_micro FROM sym GROUP BY i
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(nn_d2_micro AS BIGINT) AS nn_d2_micro
    FROM profile ORDER BY nn_d2_micro DESC, i LIMIT {_MP_TOP}
    """,
)
def q_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X301: matrix-profile discords via the STOMP diagonal trick.

    For every length-5 window of the daily revenue series, the
    z-normalized Euclidean distance to its nearest NON-TRIVIAL
    neighbor (|i-j| >= m, so a window can't match its own overlap);
    the largest nearest-neighbor distances are discords — the
    subsequences unlike anything else in the series (Yeh et al.,
    Matrix Profile I). Sliding dot products group by DIAGONAL
    delta = i - j: within a diagonal they're a windowed sum of the
    elementwise product series — no per-pair recomputation. All
    inputs to the one float expression are exact integers (sliding
    sums in whole dollars); D^2 micro-rounds before the min.

    100 TB: the series is calendar-bounded (n ~ 2.4k regardless of
    fact scale), so the n^2/2 diagonal relation is ~3M rows whose
    windows partition by delta — embarrassingly parallel, one fact
    shuffle + one bounded diagonal shuffle.
    """
    o = table(spark, sf_dir, "orders")
    cents = F.sum(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    )
    w_t = Window.orderBy(F.col("d"))
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(((cents - cents % 100) / 100).cast("bigint").alias("v"))
        .select(F.row_number().over(w_t).alias("t"), "v")
        .localCheckpoint(eager=True)
    )
    nn = daily.agg(F.count("*").alias("n"))
    w_fwd = Window.orderBy("t").rowsBetween(0, _MP_M - 1)
    stats = daily.select(
        F.col("t").alias("i"),
        F.sum("v").over(w_fwd).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(w_fwd).alias("q"),
    )
    # 2.4k-row window-stats relation is probed twice (wi, wj) —
    # checkpoint so the sliding-sum subplan runs once
    win = (
        stats.crossJoin(F.broadcast(nn))
        .where(F.col("i") <= F.col("n") - _MP_M + 1)
        .select("i", "s", "q", (_MP_M * F.col("q") - F.col("s") * F.col("s")).alias("var2"))
        .localCheckpoint(eager=True)
    )
    a, b = daily.alias("a"), daily.alias("b")
    prods = a.join(
        F.broadcast(b), F.col("a.t") > F.col("b.t") + (_MP_M - 1)
    ).select(
        (F.col("a.t") - F.col("b.t")).alias("delta"),
        F.col("a.t").alias("u"),
        (F.col("a.v") * F.col("b.v")).alias("c"),
    )
    w_diag = Window.partitionBy("delta").orderBy("u").rowsBetween(0, _MP_M - 1)
    sxy = (
        prods.select(
            "delta",
            F.col("u").alias("i"),
            F.sum("c").over(w_diag).alias("dot"),
            F.count("*").over(w_diag).alias("m_got"),
        )
        .where(F.col("m_got") == _MP_M)
        .alias("x")
    )
    wi, wj = win.alias("wi"), win.alias("wj")
    corr_num = _MP_M * F.col("x.dot") - F.col("wi.s") * F.col("wj.s")
    d2 = F.round(
        1000000.0
        * 2
        * _MP_M
        * (
            1
            - corr_num
            / F.sqrt(F.col("wi.var2").cast("double") * F.col("wj.var2"))
        )
    ).cast("bigint")
    dists = (
        sxy.join(F.broadcast(wi), F.col("wi.i") == F.col("x.i"))
        .join(
            F.broadcast(wj),
            F.col("wj.i") == F.col("x.i") - F.col("x.delta"),
        )
        .where((F.col("wi.var2") > 0) & (F.col("wj.var2") > 0))
        .select(
            F.col("x.i").alias("pi"),
            (F.col("x.i") - F.col("x.delta")).alias("pj"),
            d2.alias("d2_micro"),
        )
    )
    sym = dists.select(F.col("pi").alias("i"), "d2_micro").unionByName(
        dists.select(F.col("pj").alias("i"), "d2_micro")
    )
    return (
        sym.groupBy("i")
        .agg(F.min("d2_micro").alias("nn_d2_micro"))
        .select(
            F.col("i").cast("bigint").alias("i"),
            F.col("nn_d2_micro").cast("bigint").alias("nn_d2_micro"),
        )
        .orderBy(F.desc("nn_d2_micro"), "i")
        .limit(_MP_TOP)
    )


# --- X302/X303: string-distance joins (Jaro, Damerau-Levenshtein) ------------


def _jaro_micro(s1: str, s2: str) -> int:
    """Textbook Jaro similarity, micro-rounded (matches DuckDB's
    jaro_similarity: MARTHA/MARHTA=0.944..., CRATE/TRACE=0.733...)."""
    if s1 == s2:
        return 1000000
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0
    window = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for a in range(l1):
        lo, hi = max(0, a - window), min(l2, a + window + 1)
        for bidx in range(lo, hi):
            if not m2[bidx] and s1[a] == s2[bidx]:
                m1[a] = m2[bidx] = True
                m += 1
                break
    if m == 0:
        return 0
    t = 0
    bidx = 0
    for a in range(l1):
        if m1[a]:
            while not m2[bidx]:
                bidx += 1
            if s1[a] != s2[bidx]:
                t += 1
            bidx += 1
    t //= 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    return round(1000000 * jaro)


def _damerau(s1: str, s2: str) -> int:
    """FULL (unrestricted) Damerau-Levenshtein — transposition of
    adjacent chars costs 1 even with edits in between ('CA'->'ABC'
    = 2, matching DuckDB's damerau_levenshtein probe)."""
    l1, l2 = len(s1), len(s2)
    maxdist = l1 + l2
    da: dict[str, int] = {}
    d = [[0] * (l2 + 2) for _ in range(l1 + 2)]
    d[0][0] = maxdist
    for a in range(l1 + 1):
        d[a + 1][0] = maxdist
        d[a + 1][1] = a
    for bidx in range(l2 + 1):
        d[0][bidx + 1] = maxdist
        d[1][bidx + 1] = bidx
    for a in range(1, l1 + 1):
        db = 0
        for bidx in range(1, l2 + 1):
            k = da.get(s2[bidx - 1], 0)
            lcol = db
            if s1[a - 1] == s2[bidx - 1]:
                cost = 0
                db = bidx
            else:
                cost = 1
            d[a + 1][bidx + 1] = min(
                d[a][bidx] + cost,
                d[a + 1][bidx] + 1,
                d[a][bidx + 1] + 1,
                d[k][lcol] + (a - k - 1) + 1 + (bidx - lcol - 1),
            )
        da[s1[a - 1]] = a
    return d[l1 + 1][l2 + 1]


# Round 13: the pandas UDF wrappers are MODULE-LEVEL — F.pandas_udf
# construction (py4j + function pickling) measured ~0.1 s per call
# when rebuilt inside each query fn, inside the bench's timed fn().
@F.pandas_udf(LongType())
def _jaro_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    return pd.Series(
        [_jaro_micro(a, b) for a, b in zip(s1, s2)], dtype="int64"
    )


@F.pandas_udf(IntegerType())
def _dl_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    return pd.Series(
        [_damerau(a, b) for a, b in zip(s1, s2)], dtype="int32"
    )


def _scored_blocked_pairs(
    spark: SparkSession,
    sf_dir: str,
    scored: DataFrame,
    blocking_cols: tuple[str, ...] = ("p_brand",),
    part_filter=None,
) -> DataFrame:
    """Blocked pair relation pruned THROUGH the scored dictionary.

    `blocking_cols` is the record-linkage blocking discipline as a
    parameter: every listed part column becomes an equi-join key, so
    candidates are quadratic in BLOCK size, not corpus size; when
    blocks are too big, add independent attributes to the key (the
    round-7 probe: brand-only blocks ~800 rows at sf0.1 vs 16 under
    (brand, size), candidate pairs down ~2500x, growth exponent 1.75
    vs 0.35 — see PERF_NOTES).

    Round-8 restructure of the `pairs ⨝ broadcast(scored)` shape: the
    left side expands against the broadcast ≥/≤-threshold dictionary
    slice FIRST (each record grows only to its qualifying partner
    names), and only then equi-joins the right side on
    (blocking_cols…, s2=p_name). The all-candidate pair relation —
    sum-of-block² rows that the old spelling streamed through the
    broadcast probe just to discard — never exists; every joined row
    already passes the similarity threshold, so the second join's
    output IS the answer (modulo the k1<k2 dedup residual). The join
    key also gains the name column: (brand) 25 distinct keys →
    (brand, name) ~1600, so block skew drops and parallelism rises.
    Measured sf0.1 (PERF_NOTES round 8): q_jaro_pairs compute 4.9 →
    1.8 s noop-sink (2.8x); part-x10 probe constant 2.6x down at the
    same output-bound exponent.

    100 TB: the dictionary stays broadcast-size (vocab² slice); both
    part-scale sides meet in one shuffle equi-join on
    (blocking_cols…, name) whose output is threshold-pruned by
    construction. When the name vocabulary ever grows corpus-like,
    project distinct names off the blocked relation first (see
    _name_vocab_pairs) — the decomposition, not this join, is what
    assumes a dictionary."""
    p = table(spark, sf_dir, "part")
    if part_filter is not None:
        p = p.where(part_filter)
    cols = list(blocking_cols)
    a = p.select(*cols, F.col("p_partkey").alias("k1"), F.col("p_name").alias("s1"))
    b = p.select(*cols, F.col("p_partkey").alias("k2"), F.col("p_name").alias("s2"))
    return (
        a.join(F.broadcast(scored), "s1")
        .join(b, cols + ["s2"])
        .where(F.col("k1") < F.col("k2"))
    )


def _name_vocab_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All ordered pairs of DISTINCT part names — the string-kernel's
    entire input under the dictionary decomposition.

    p_name draws from a small vocabulary (64 distinct values at every
    sf), so the expensive string kernel needs to score only vocab²
    combinations — a quantity bounded by the dictionary, NOT the
    corpus. The per-record pair relation then gets its scores via a
    broadcast hash join (pure JVM), which replaced a per-pair Python
    kernel that was 78% of the round-5 bench (132 s at sf0.1; the
    kernel ran 8M times for 4,096 distinct inputs). When vocab² ever
    rivals the pair count, project distinct (s1, s2) off the blocked
    pair relation instead; same join-back."""
    p = table(spark, sf_dir, "part")
    names = p.select(F.col("p_name").alias("s1")).distinct()
    return names.crossJoin(names.select(F.col("s1").alias("s2")))


_JARO_MIN_MICRO = 750000


@register(
    "q_jaro_pairs",
    tags=("pairs",),
    oracle=f"""
    SELECT a.p_partkey AS k1, b.p_partkey AS k2,
           CAST(ROUND(1000000 * jaro_similarity(a.p_name, b.p_name))
                AS BIGINT) AS jaro_micro
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE ROUND(1000000 * jaro_similarity(a.p_name, b.p_name))
          >= {_JARO_MIN_MICRO}
    ORDER BY k1, k2
    """,
)
def q_jaro_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X302: Jaro similarity join (brand-blocked), Arrow kernel.

    Spark ships levenshtein only; Jaro is the record-linkage
    similarity the Fellegi-Sunter stack (X205) actually weights
    name fields with. Implemented as an Arrow-batched pandas UDF of
    the textbook algorithm (match window floor(max/2)-1, half the
    unaligned matches are transpositions), micro-rounded — the
    oracle is DuckDB's BUILTIN jaro_similarity, so the hash match
    certifies the kernel against an independent implementation.

    100 TB: the kernel scores only the vocab² dictionary (corpus-size-
    independent, see _name_vocab_pairs); the blocked pair relation —
    the part that grows — is pure JVM and pruned BEFORE it expands:
    each record joins the broadcast ≥-threshold dictionary slice to
    its qualifying partner names, then one (brand, name) equi-join
    materializes only true matches (_scored_blocked_pairs). Residual
    scaling is the OUTPUT itself (within-block matches are inherently
    quadratic in block size); see PERF_NOTES for the measured bound.
    """

    scored = (
        _name_vocab_pairs(spark, sf_dir)
        .select("s1", "s2", _jaro_udf("s1", "s2").alias("jaro_micro"))
        .where(F.col("jaro_micro") >= _JARO_MIN_MICRO)
    )
    # Round 13: pin the 1.17M-row join output (lazily) before the
    # declared output sort — orderBy's range-boundary sampling job
    # otherwise re-executes the whole dictionary+join subtree a second
    # time (measured 1.59 -> 1.33 s noop at sf0.1). Lazy: the sampling
    # job materializes the checkpoint, the sort's shuffle map reads it.
    return (
        _scored_blocked_pairs(spark, sf_dir, scored)
        .select("k1", "k2", "jaro_micro")
        .localCheckpoint(eager=False)
        .orderBy("k1", "k2")
    )


@register(
    "q_jaro_blocked",
    tags=("pairs",),
    oracle=f"""
    SELECT a.p_partkey AS k1, b.p_partkey AS k2,
           CAST(ROUND(1000000 * jaro_similarity(a.p_name, b.p_name))
                AS BIGINT) AS jaro_micro
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE ROUND(1000000 * jaro_similarity(a.p_name, b.p_name))
          >= {_JARO_MIN_MICRO}
    ORDER BY k1, k2
    """,
)
def q_jaro_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X477: Jaro similarity join under the FINER (brand, size) key —
    the round-6 verdict's blocking_cols demo (item 5).

    Same Arrow dictionary kernel and threshold as q_jaro_pairs; the
    only change is the blocking key, passed through
    _scored_blocked_pairs' blocking_cols parameter. Standard record-linkage discipline: when
    blocks are too big, add independent attributes to the key until
    block sizes are bounded — true duplicate part listings agree on
    size, so (brand, size) trades a little recall for a ~2500x cut in
    candidate pairs (avg block 800 -> 16 at sf0.1; output 1.17M ->
    23k). The oracle spells the identical finer key, so the hash match
    verifies the parameterized blocking end-to-end; q_jaro_pairs keeps
    the coarse key oracle-checked, proving the refactor didn't move
    it.

    100 TB: candidates are sum-of-block² — bounded blocks mean the
    join scales with the DATA, not the square of the hottest block;
    measured part-x10-with-attribute-diversity exponent in PERF_NOTES
    round 7 (coarse key stays ~quadratic on the same probe data).
    """

    scored = (
        _name_vocab_pairs(spark, sf_dir)
        .select("s1", "s2", _jaro_udf("s1", "s2").alias("jaro_micro"))
        .where(F.col("jaro_micro") >= _JARO_MIN_MICRO)
    )
    # Same lazy pin before the declared sort as q_jaro_pairs (the
    # sampling job otherwise re-runs the dictionary+join subtree).
    return (
        _scored_blocked_pairs(
            spark, sf_dir, scored, blocking_cols=("p_brand", "p_size")
        )
        .select("k1", "k2", "jaro_micro")
        .localCheckpoint(eager=False)
        .orderBy("k1", "k2")
    )


_DAMERAU_MAX = 4

# Bounded sweep variant (VERDICT_r08 item 3): the full DuckDB oracle
# runs the O(len²) DP once per brand-blocked candidate pair — ~40 min
# at sf0.1 — so above driver scale BOTH sides restrict to the same
# deterministic md5 block sample of partkeys (first hex nibble of
# md5(partkey) in {0,1} => 1/8 of rows => 1/64 of candidate pairs,
# engine-agnostic and partitioning-independent). The Spark kernel under
# test is IDENTICAL — same dictionary decomposition, same pruned
# expansion join, only the part relation is pre-filtered — so the
# bounded hash match still certifies the full-DL kernel and the
# blocking join end-to-end at sf0.1. Used by check_oracles --bounded;
# the driver (sf0.01) always runs the full oracle above.
_DAMERAU_SAMPLE_NIBBLES = ("0", "1")
_DAMERAU_SAMPLE_SQL = (
    "substring(md5(CAST(p_partkey AS VARCHAR)), 1, 1) IN ('0', '1')"
)


def _damerau_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vocab²-bounded full-DL scores (shared by full + bounded forms)."""

    return (
        _name_vocab_pairs(spark, sf_dir)
        .select("s1", "s2", _dl_udf("s1", "s2").alias("dl"))
        .where(F.col("dl") <= _DAMERAU_MAX)
    )


def _damerau_pairs_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_damerau_pairs restricted to the deterministic md5 block sample."""
    sample = F.substring(
        F.md5(F.col("p_partkey").cast("string")), 1, 1
    ).isin(*_DAMERAU_SAMPLE_NIBBLES)
    return (
        _scored_blocked_pairs(
            spark, sf_dir, _damerau_scored(spark, sf_dir), part_filter=sample
        )
        .select("k1", "k2", F.col("dl").cast("bigint").alias("dl"))
        .orderBy("k1", "k2")
    )


@register(
    "q_damerau_pairs",
    tags=("pairs",),
    oracle=f"""
    SELECT a.p_partkey AS k1, b.p_partkey AS k2,
           CAST(damerau_levenshtein(a.p_name, b.p_name) AS BIGINT) AS dl
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE damerau_levenshtein(a.p_name, b.p_name) <= {_DAMERAU_MAX}
    ORDER BY k1, k2
    """,
    bounded_fn=_damerau_pairs_bounded,
    bounded_oracle=f"""
    WITH ps AS (SELECT * FROM part WHERE {_DAMERAU_SAMPLE_SQL})
    SELECT a.p_partkey AS k1, b.p_partkey AS k2,
           CAST(damerau_levenshtein(a.p_name, b.p_name) AS BIGINT) AS dl
    FROM ps a JOIN ps b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE damerau_levenshtein(a.p_name, b.p_name) <= {_DAMERAU_MAX}
    ORDER BY k1, k2
    """,
)
def q_damerau_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X303: Damerau-Levenshtein distance join (brand-blocked).

    FULL (unrestricted) DL — an adjacent transposition costs 1 even
    with intervening edits, via the dictionary-of-last-positions DP
    (Lowrance-Wagner), NOT the simpler optimal-string-alignment
    variant ('CA'->'ABC': full DL 2, OSA 3 — DuckDB's builtin was
    probed to return 2). Typo-tolerant matching for transposed
    keystrokes that plain levenshtein (X35) over-penalizes. The
    oracle is DuckDB's independent builtin.

    100 TB: same dictionary decomposition and pruned-expansion join as
    X302 — the DP kernel runs vocab² times (corpus-size-independent),
    the growing pair relation is JVM-only and expands through the
    broadcast ≤-threshold dictionary slice before the (brand, name)
    equi-join (_scored_blocked_pairs). Above driver scale the sweep
    uses the registered bounded variant (same kernel, md5-sampled
    part relation on BOTH engines) because DuckDB's oracle-side DP is
    quadratic in block size — see _DAMERAU_SAMPLE_SQL.
    """
    return (
        _scored_blocked_pairs(spark, sf_dir, _damerau_scored(spark, sf_dir))
        .select("k1", "k2", F.col("dl").cast("bigint").alias("dl"))
        .orderBy("k1", "k2")
    )


# --- X304: triangle-support census (k-truss step) ----------------------------

_TRUSS_K = 4


@register(
    "q_triangle_support",
    oracle=f"""
    WITH s AS (SELECT s_suppkey AS node FROM supplier),
    cnt AS (SELECT COUNT(*) AS n FROM s),
    raw AS (
        SELECT node AS src, (node * 7 + 3) % n AS dst FROM s CROSS JOIN cnt
        UNION ALL
        SELECT node, (node * 13 + 5) % n FROM s CROSS JOIN cnt
        UNION ALL
        SELECT node, (node * 3 + 1) % n FROM s CROSS JOIN cnt
        UNION ALL
        SELECT node, (node + 1) % n FROM s CROSS JOIN cnt
        UNION ALL
        SELECT node, (node * 2 + 1) % n FROM s CROSS JOIN cnt
    ),
    e AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM raw WHERE src <> dst
    ),
    tris AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    sup AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support
        FROM (
            SELECT x AS a, y AS b FROM tris
            UNION ALL SELECT y, z FROM tris
            UNION ALL SELECT x, z FROM tris
        ) GROUP BY a, b
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, support,
           CASE WHEN support >= {_TRUSS_K - 2} THEN 1 ELSE 0 END AS in_truss
    FROM sup ORDER BY support DESC, a, b
    """,
)
def q_triangle_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X304: per-edge triangle support — the k-truss peeling relation.

    Over a 5-rule densified variant of X66's deterministic supplier
    graph (the 2-rule original is triangle-free at every test scale —
    probed; the ring + three hash chords create them), each enumerated oriented
    triangle (x<y<z from the ordered edge join) credits all three of
    its edges; an edge with support >= k-2 survives the first k-truss
    peel (k=4 here). X66 counts triangles globally and X215 peels
    2-cores by degree; truss decomposition peels by SUPPORT — this is
    its inner census, the relation each peel iteration recomputes.

    100 TB: the ordered edge-join triangle enumeration shuffles on
    edge keys (the standard distributed pattern); support is one
    partial-aggregated count over the 3-way edge projection.
    """
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node")
    )
    cnt = s.agg(F.count("*").alias("n"))
    sn = s.crossJoin(F.broadcast(cnt))

    def rule(expr) -> DataFrame:
        return sn.select(
            F.col("node").alias("src"), (expr % F.col("n")).alias("dst")
        )

    raw = (
        rule(F.col("node") * 7 + 3)
        .unionByName(rule(F.col("node") * 13 + 5))
        .unionByName(rule(F.col("node") * 3 + 1))
        .unionByName(rule(F.col("node") + 1))
        .unionByName(rule(F.col("node") * 2 + 1))
    )
    e = (
        raw.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tris = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    edges3 = (
        tris.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionByName(tris.select(F.col("y").alias("a"), F.col("z").alias("b")))
        .unionByName(tris.select(F.col("x").alias("a"), F.col("z").alias("b")))
    )
    sup = edges3.groupBy("a", "b").agg(
        F.count("*").cast("bigint").alias("support")
    )
    return sup.select(
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        "support",
        F.when(F.col("support") >= _TRUSS_K - 2, 1).otherwise(0).alias("in_truss"),
    ).orderBy(F.desc("support"), "a", "b")
