"""Round-6 batch 1 (X349-X355): HLL register audit, link prediction, exact
Katz walks, grid-blocked DBSCAN core census, character-class entropy,
label propagation, and historical VaR / expected shortfall.

Design notes shared by the batch:
- The HLL register audit (X349) pins the sketch MATH itself, not a
  library: hashes come from the md5-hex-to-bigint idiom both engines
  share (conv(substring(md5 ..)) / '0x' || substr), so registers and
  the estimate are engine-neutral integers and the DuckDB oracle
  certifies the sketch end-to-end — the HLL member of the audit
  family X206 (count-min) and X216 (KMV) already anchor. The rows-only
  approx queries (q_approx_count_distinct, q_wau_hll, q_hll_sketch)
  keep covering Spark's built-in sketches.
- Graph ops (X350 resource-allocation link prediction, X351 Katz) run
  over the X66-style deterministic supplier hash graph (ring + two
  hash chords, undirected, deduped) — reference-free, reproducible at
  every sf, and dense enough to have 2-hop structure.
- All money flows through exact centi units; every division that can
  exceed int64 goes through DECIMAL(38,0) with the (a - a%b)/b
  floor-division spelling (the q_kruskal_wallis discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# Engine-neutral md5 -> bigint (the q_naive_bayes_score idiom):
#   Spark : conv(substring(md5(x), 1, 15), 16, 10)  -> bigint
#   DuckDB: CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)


def _md5i(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _md5i_sql(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


# --- X349: HyperLogLog register audit -----------------------------------------

_HLL_REGS = 64  # 2^6 registers
_HLL_RHO_CAP = 49
# alpha_64 * m^2 with alpha_64 = 0.709: numerator of the raw estimate,
# kept exact through DECIMAL(38,0) with scale 2^50 on the register sum
_HLL_POW50 = 1 << 50


def _rho_sql(hexexpr: str) -> str:
    """Leading-zero-bit count + 1 over a 12-hex-char (48-bit) suffix,
    in portable string ops: 4 bits per leading '0' char, plus a nibble
    lookup for the first non-zero hex digit. Identical spelling both
    engines (regexp_extract + CASE)."""
    lead = f"length(regexp_extract({hexexpr}, '^(0*)', 1))"
    first = f"substring({hexexpr}, {lead} + 1, 1)"
    nib = (
        f"(CASE {first} WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        "WHEN '' THEN 0 ELSE 0 END)"
    )
    return f"LEAST(4 * {lead} + {nib} + 1, {_HLL_RHO_CAP})"


@register(
    "q_hll_audit",
    oracle=f"""
    WITH vals AS (
        SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS k FROM lineitem
    ),
    hashed AS (
        SELECT k,
               {_md5i_sql("k")} % {_HLL_REGS} AS reg,
               {_rho_sql("substring(md5(k), 17, 12)")} AS rho
        FROM vals
    ),
    regs AS (
        SELECT j.j AS reg, COALESCE(MAX(h.rho), 0) AS m
        FROM (SELECT UNNEST(generate_series(0, {_HLL_REGS - 1})) AS j) j
        LEFT JOIN hashed h ON h.reg = j.j
        GROUP BY j.j
    ),
    s AS (
        -- HUGEINT bit-shift keeps every 2^(50-m) and the sum exact
        -- (DECIMAL // in DuckDB degrades to double and rounds)
        SELECT SUM(CAST(1 AS HUGEINT) << (50 - m)) AS ssum
        FROM regs
    ),
    est AS (
        SELECT CAST(CAST(709 AS HUGEINT) * {_HLL_REGS * _HLL_REGS}
                    * {_HLL_POW50} // (1000 * ssum) AS BIGINT) AS hll_est
        FROM s
    ),
    ex AS (SELECT COUNT(*) AS exact_distinct FROM vals)
    SELECT r.reg, CAST(r.m AS INT) AS m,
           e.hll_est, CAST(x.exact_distinct AS BIGINT) AS exact_distinct
    FROM regs r CROSS JOIN est e CROSS JOIN ex x
    ORDER BY r.reg
    """,
)
def q_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X349: HyperLogLog registers + raw estimate, exactly verified.

    Textbook HLL over the distinct part keys: 64 md5-bucketed
    registers, rho = leading-zero bits of a 48-bit md5 suffix + 1
    (portable string spelling), raw estimate alpha_64 * m^2 / sum
    2^-M_j. The register sum is kept EXACT by scaling with 2^50
    (every 2^(50-M_j) is an integer, the sum fits DECIMAL(38,0)), so
    the estimate is one integer floor-division — no float harmonic
    mean to diverge between engines. Output: the 64 registers, the
    estimate, the true distinct count. q_wau_hll / q_approx_count_
    distinct stay rows-only on Spark's built-in sketch; this pins the
    algorithm itself, so a 100 TB HLL rollup can be trusted from its
    register table alone (registers merge by MAX — the additive state
    ST23 folds in streaming).

    100 TB: one distinct-projection shuffle, then a 64-row census —
    register construction is scan-local arithmetic on md5 hex.
    """
    # Round 12: distinct on the 8-byte l_partkey BEFORE the string cast
    # (the cast is injective, so the distinct set is identical — the
    # former spelling shuffled 600k strings instead of longs), and the
    # ~20k-row distinct-key table is pinned: `hashed` and the
    # exact-distinct count both consume it, and without the checkpoint
    # the lineitem distinct ran twice. 1.55 -> 0.83 s noop at sf0.1.
    vals = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .distinct()
        .select(F.col("l_partkey").cast("string").alias("k"))
        .localCheckpoint(eager=True)
    )
    hashed = vals.select(
        (_md5i(F.col("k")) % _HLL_REGS).alias("reg"),
        F.expr(_rho_sql("substring(md5(k), 17, 12)")).alias("rho"),
    )
    regs = (
        spark.range(_HLL_REGS)
        .select(F.col("id").cast("bigint").alias("reg"))
        .join(hashed, "reg", "left")
        .groupBy("reg")
        .agg(F.coalesce(F.max("rho"), F.lit(0)).alias("m"))
    )
    dec = "decimal(38,0)"
    # 2^(50-m) is exact for m <= 49: shiftleft on bigint, then the
    # 64-term sum widens into decimal(38,0)
    s = regs.agg(
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 50 - m) AS DECIMAL(38,0))")
        ).alias("ssum_raw")
    )
    est = s.select(
        F.expr(
            f"CAST((CAST(709 AS DECIMAL(38,0)) * {_HLL_REGS * _HLL_REGS}"
            f" * {_HLL_POW50}"
            f" - (CAST(709 AS DECIMAL(38,0)) * {_HLL_REGS * _HLL_REGS}"
            f" * {_HLL_POW50}) % (1000 * ssum_raw))"
            f" / (1000 * ssum_raw) AS BIGINT)"
        ).alias("hll_est")
    )
    ex = vals.agg(F.count("*").cast("bigint").alias("exact_distinct"))
    return (
        regs.select("reg", F.col("m").cast("int").alias("m"))
        .crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(ex))
        .orderBy("reg")
    )


# --- deterministic supplier hash graph (X66 lineage) ---------------------------


def _hash_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected deduped edge list over supplier nodes: ring + two
    hash chords — deterministic at every sf, identically spelled in
    the oracles (pure modular arithmetic, no engine hash).

    The edge list is eagerly localCheckpoint-ed (the operators/graph.py
    discipline): graph queries reference it 3-6 times (both directions,
    degree census, per-step joins), and without the checkpoint every
    reference replays the build — measured 54 exchanges in the Katz
    plan vs 8 after (the count-agg SinglePartition on the DIMENSION-
    sized node table multiplied into the plan)."""
    s = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("node"))
    n = s.agg(F.count("*").alias("n"))
    sn = s.crossJoin(F.broadcast(n))

    def rule(expr) -> DataFrame:
        return sn.select(F.col("node").alias("a"), (expr % F.col("n")).alias("b"))

    raw = (
        rule(F.col("node") + 1)
        .unionByName(rule(F.col("node") * 7 + 3))
        .unionByName(rule(F.col("node") * 13 + 5))
    )
    return (
        raw.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


_GRAPH_SQL = """
    nodes AS (SELECT s_suppkey AS node FROM supplier),
    cnt AS (SELECT COUNT(*) AS n FROM nodes),
    raw AS (
        SELECT node AS a, (node + 1) % n AS b FROM nodes CROSS JOIN cnt
        UNION ALL
        SELECT node, (node * 7 + 3) % n FROM nodes CROSS JOIN cnt
        UNION ALL
        SELECT node, (node * 13 + 5) % n FROM nodes CROSS JOIN cnt
    ),
    edges AS (
        SELECT DISTINCT LEAST(a, b) AS x, GREATEST(a, b) AS y
        FROM raw WHERE a <> b
    )
"""

_RA_TOP = 100


@register(
    "q_resource_alloc",
    oracle=f"""
    WITH {_GRAPH_SQL},
    und AS (
        SELECT x AS u, y AS v FROM edges
        UNION ALL SELECT y, x FROM edges
    ),
    deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
    wedge AS (
        SELECT a.v AS z, LEAST(a.u, b.u) AS p, GREATEST(a.u, b.u) AS q
        FROM und a JOIN und b ON a.v = b.v AND a.u < b.u
    ),
    scored AS (
        SELECT w.p, w.q,
               CAST(SUM(1000000 // d.d) AS BIGINT) AS ra_micro,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM wedge w JOIN deg d ON d.u = w.z
        GROUP BY w.p, w.q
    ),
    flagged AS (
        SELECT s.p, s.q, s.ra_micro, s.n_common,
               CASE WHEN e.x IS NULL THEN 0 ELSE 1 END AS is_edge
        FROM scored s LEFT JOIN edges e ON e.x = s.p AND e.y = s.q
    )
    SELECT p, q, ra_micro, n_common, is_edge
    FROM flagged
    ORDER BY ra_micro DESC, p, q
    LIMIT {_RA_TOP}
    """,
)
def q_resource_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X350: resource-allocation link-prediction index (Zhou-Lu-Zhang).

    For every node pair sharing >= 1 common neighbor, RA = sum over
    common neighbors z of 1/deg(z) — the strongest of the classical
    local link-prediction indices, and (unlike Adamic-Adar's 1/ln deg)
    EXACT in integer micro units, so the oracle pins it bit-for-bit.
    Pairs come from the wedge join (two edges sharing an endpoint) —
    candidates scale with sum(deg^2), never all-pairs; existing edges
    are flagged, not dropped (RA over existing edges is the
    edge-strength variant).

    100 TB: one degree census (broadcast), one wedge self-join
    shuffled on the shared endpoint — the standard distributed wedge
    enumeration; skew bounds are the max-degree hubs, the same bound
    every triangle/LSH-bucket op in this repo documents.
    """
    edges = _hash_graph(spark, sf_dir)
    und = edges.select(F.col("x").alias("u"), F.col("y").alias("v")).unionByName(
        edges.select(F.col("y").alias("u"), F.col("x").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    a = und.select(F.col("u").alias("u1"), F.col("v").alias("z"))
    b = und.select(F.col("u").alias("u2"), F.col("v").alias("z2"))
    wedge = (
        a.join(b, (F.col("z") == F.col("z2")) & (F.col("u1") < F.col("u2")))
        .select(
            "z",
            F.col("u1").alias("p"),
            F.col("u2").alias("q"),
        )
    )
    scored = (
        wedge.join(
            F.broadcast(deg.select(F.col("u").alias("z"), "d")), "z"
        )
        .groupBy("p", "q")
        .agg(
            F.sum(F.expr("1000000 DIV d")).cast("bigint").alias("ra_micro"),
            F.count("*").cast("bigint").alias("n_common"),
        )
    )
    flagged = scored.join(
        edges.select(
            F.col("x").alias("p"), F.col("y").alias("q"), F.lit(1).alias("is_edge")
        ),
        ["p", "q"],
        "left",
    ).select(
        "p",
        "q",
        "ra_micro",
        "n_common",
        F.coalesce(F.col("is_edge"), F.lit(0)).alias("is_edge"),
    )
    return flagged.orderBy(F.desc("ra_micro"), "p", "q").limit(_RA_TOP)


# --- X351: exact Katz centrality (3 unrolled walk steps) -----------------------

_KATZ_TOP = 100


@register(
    "q_katz_centrality",
    oracle=f"""
    WITH {_GRAPH_SQL},
    und AS (
        SELECT x AS u, y AS v FROM edges
        UNION ALL SELECT y, x FROM edges
    ),
    p1 AS (SELECT v, COUNT(*) AS w FROM und GROUP BY v),
    p2 AS (
        SELECT e.v AS v, SUM(p.w) AS w
        FROM und e JOIN p1 p ON p.v = e.u GROUP BY e.v
    ),
    p3 AS (
        SELECT e.v AS v, SUM(p.w) AS w
        FROM und e JOIN p2 p ON p.v = e.u GROUP BY e.v
    )
    SELECT p1.v AS node,
           CAST(16 * p1.w + 4 * COALESCE(p2.w, 0) + COALESCE(p3.w, 0)
                AS BIGINT) AS katz_q64,
           CAST(p1.w AS BIGINT) AS walks1,
           CAST(COALESCE(p2.w, 0) AS BIGINT) AS walks2,
           CAST(COALESCE(p3.w, 0) AS BIGINT) AS walks3
    FROM p1 LEFT JOIN p2 ON p2.v = p1.v LEFT JOIN p3 ON p3.v = p1.v
    ORDER BY katz_q64 DESC, node
    LIMIT {_KATZ_TOP}
    """,
)
def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X351: Katz centrality, 3-step truncation, INTEGER-exact.

    Katz(v) = sum_k beta^k * (# walks of length k ending at v); with
    beta = 1/4 and the sum truncated at k=3, scaling by 4^3 makes the
    score a pure bigint: katz_q64 = 16*w1 + 4*w2 + w3 (w1 = degree).
    Walk counts come from two sparse matrix-vector joins over the edge
    list — the X50 exactly-verified-iteration discipline applied to a
    centrality no other query covers (PageRank is the FLOAT random
    walk, rows-only; HITS is the bipartite pair; Katz is the damped
    walk census, exact here).

    100 TB: each step is one equi-join of the edge list with a
    node-indexed vector + a partial-aggregated sum — the standard
    distributed SpMV; three steps, three bounded shuffles.
    """
    edges = _hash_graph(spark, sf_dir)
    und = edges.select(F.col("x").alias("u"), F.col("y").alias("v")).unionByName(
        edges.select(F.col("y").alias("u"), F.col("x").alias("v"))
    )
    p1 = und.groupBy("v").agg(F.count("*").alias("w1"))
    p2 = (
        und.join(
            F.broadcast(p1.select(F.col("v").alias("u"), F.col("w1").alias("pw"))),
            "u",
        )
        .groupBy("v")
        .agg(F.sum("pw").alias("w2"))
    )
    p3 = (
        und.join(
            F.broadcast(p2.select(F.col("v").alias("u"), F.col("w2").alias("pw"))),
            "u",
        )
        .groupBy("v")
        .agg(F.sum("pw").alias("w3"))
    )
    out = (
        p1.join(p2, "v", "left")
        .join(p3, "v", "left")
        .select(
            F.col("v").alias("node"),
            (
                16 * F.col("w1")
                + 4 * F.coalesce(F.col("w2"), F.lit(0))
                + F.coalesce(F.col("w3"), F.lit(0))
            )
            .cast("bigint")
            .alias("katz_q64"),
            F.col("w1").cast("bigint").alias("walks1"),
            F.coalesce(F.col("w2"), F.lit(0)).cast("bigint").alias("walks2"),
            F.coalesce(F.col("w3"), F.lit(0)).cast("bigint").alias("walks3"),
        )
    )
    return out.orderBy(F.desc("katz_q64"), "node").limit(_KATZ_TOP)


# --- X352: DBSCAN core/border/noise census (grid-blocked) ----------------------

_DB_EPS = 400
_DB_MINPTS = 4
_DB_RANGE = 10000
_DB_TOP = 200


@register(
    "q_dbscan_core",
    tags=("pairs",),
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               {_md5i_sql("'x|' || CAST(c_custkey AS VARCHAR)")} % {_DB_RANGE} AS x,
               {_md5i_sql("'y|' || CAST(c_custkey AS VARCHAR)")} % {_DB_RANGE} AS y
        FROM customer
    ),
    nb AS (
        SELECT a.id, COUNT(*) AS n_nb
        FROM pts a JOIN pts b
          ON b.id <> a.id
         AND ABS(a.x - b.x) <= {_DB_EPS} AND ABS(a.y - b.y) <= {_DB_EPS}
        GROUP BY a.id
    ),
    core AS (SELECT id FROM nb WHERE n_nb >= {_DB_MINPTS}),
    labeled AS (
        SELECT p.id, COALESCE(n.n_nb, 0) AS n_nb,
               CASE WHEN n.n_nb >= {_DB_MINPTS} THEN 'core'
                    WHEN EXISTS (
                        SELECT 1 FROM core c JOIN pts q ON q.id = c.id
                        WHERE c.id <> p.id
                          AND ABS(p.x - q.x) <= {_DB_EPS}
                          AND ABS(p.y - q.y) <= {_DB_EPS}
                    ) THEN 'border'
                    ELSE 'noise' END AS label
        FROM pts p LEFT JOIN nb n ON n.id = p.id
    )
    SELECT id, CAST(n_nb AS BIGINT) AS n_nb, label
    FROM labeled
    ORDER BY n_nb DESC, id
    LIMIT {_DB_TOP}
    """,
)
def q_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X352: DBSCAN's core/border/noise classification, grid-blocked.

    The expensive half of DBSCAN — epsilon-neighborhood counting and
    point classification — in the L-infinity metric (integer-exact:
    |dx| <= eps AND |dy| <= eps). Points live on a synthetic md5 2D
    grid per customer. The Spark plan never goes quadratic: space is
    cut into eps-sized cells, each point joins only the 3x3 cell
    block around it (one side exbodes its 9 neighbor cell keys; the
    join is a cell-key equi-join), and the true distance filter runs
    inside the matched block. The DuckDB oracle is the QUADRATIC
    definition — the hash match proves the grid blocking lossless,
    the same certificate style as q_embedding_threshold's grid matmul.
    (Full DBSCAN additionally merges core points into components —
    q_dedup_survivors' connected-components operator composes on top
    of the core-adjacency relation this query certifies.)

    100 TB: neighbor work is sum over cells of |cell| * |3x3 block| —
    density-bounded, the standard spatial-join discipline (X300's
    grid join, applied to clustering).
    """
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (_md5i(F.concat(F.lit("x|"), F.col("c_custkey").cast("string"))) % _DB_RANGE)
        .alias("x"),
        (_md5i(F.concat(F.lit("y|"), F.col("c_custkey").cast("string"))) % _DB_RANGE)
        .alias("y"),
    )
    cellx = F.floor(F.col("x") / _DB_EPS)
    celly = F.floor(F.col("y") / _DB_EPS)
    # side B: each point registered under its own cell. Round 12: the
    # cell key is a packed LONG (cellx*100 + celly — injective: celly
    # spans [-1, 26] << 100), not a concat_ws string: 8-byte join keys,
    # no per-row string building (guide §2.3 narrower types).
    b = pts.select(
        F.col("id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        (cellx * 100 + celly).alias("cell"),
    )
    # side A: each point probes its 9 surrounding cells
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    a = pts.select(
        "id",
        "x",
        "y",
        F.explode(
            F.array(
                *[(cellx + dx) * 100 + (celly + dy) for dx, dy in offsets]
            )
        ).alias("cell"),
    )
    # Round 12: the matched id-pairs are pinned (1.4M x 16 B at sf0.1)
    # — nb's count and near_core's semi-join both consume them, and
    # without the checkpoint the whole grid join executed TWICE (the
    # plan scanned customer 7x; measured 2.78 -> 2.15 s noop at
    # sf0.1). Ids only: the coordinates never outlive the distance
    # filter (guide §2.4 remove shuffles outright / §5 cache the
    # cheap-to-store, expensive-to-recompute side).
    matched = (
        a.join(b, "cell")
        .where(
            (F.col("b_id") != F.col("id"))
            & (F.abs(F.col("x") - F.col("bx")) <= _DB_EPS)
            & (F.abs(F.col("y") - F.col("by")) <= _DB_EPS)
        )
        .select("id", "b_id")
        .localCheckpoint(eager=True)
    )
    nb = matched.groupBy("id").agg(F.count("*").alias("n_nb"))
    core_ids = nb.where(F.col("n_nb") >= _DB_MINPTS).select(
        F.col("id").alias("core_id")
    )
    # border = non-core with a core point in range: reuse the matched
    # relation (neighbor pairs already carry both endpoints)
    near_core = (
        matched.join(
            F.broadcast(core_ids), F.col("b_id") == F.col("core_id"), "left_semi"
        )
        .select("id")
        .distinct()
        .withColumn("has_core_nb", F.lit(1))
    )
    labeled = (
        pts.select("id")
        .join(nb, "id", "left")
        .join(near_core, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_nb"), F.lit(0)).cast("bigint").alias("n_nb"),
            F.when(F.col("n_nb") >= _DB_MINPTS, "core")
            .when(F.col("has_core_nb") == 1, "border")
            .otherwise("noise")
            .alias("label"),
        )
    )
    return labeled.orderBy(F.desc("n_nb"), "id").limit(_DB_TOP)


# --- X353: per-document character-class entropy --------------------------------

_ENT_CLASSES = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [" "]
_ENT_TOP = 100


def _ln_micro_sql(expr: str) -> str:
    return f"CAST(ROUND(1000000 * LN({expr})) AS BIGINT)"


def _entropy_oracle() -> str:
    cnt_defs = ", ".join(
        f"length(t) - length(replace(t, '{c}', '')) AS c_{i}"
        for i, c in enumerate(_ENT_CLASSES)
    )
    known = " + ".join(f"c_{i}" for i in range(len(_ENT_CLASSES)))
    names = [f"c_{i}" for i in range(len(_ENT_CLASSES))] + ["c_other"]
    terms = " + ".join(
        f"(CASE WHEN {n} > 0 THEN {n} * ({_ln_micro_sql('total')}"
        f" - {_ln_micro_sql(n)}) ELSE 0 END)"
        for n in names
    )
    return f"""
    WITH base AS (
        SELECT doc_id, lower(text) AS t, length(text) AS total
        FROM documents WHERE length(text) > 0
    ),
    cnts AS (SELECT doc_id, total, {cnt_defs} FROM base),
    wide AS (SELECT *, total - ({known}) AS c_other FROM cnts)
    SELECT doc_id,
           CAST(({terms}) // total AS BIGINT) AS entropy_micro,
           CAST(total AS BIGINT) AS n_chars
    FROM wide
    ORDER BY entropy_micro DESC, doc_id
    LIMIT {_ENT_TOP}
    """


@register("q_char_entropy", oracle=_entropy_oracle())
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X353: character-class Shannon entropy per document (nats,
    micro-fixed-point) — the classic statistical quality filter the
    length/punct/stopword suite (L3) lacks: machine-generated or
    binary-leak text scores far from natural-language entropy.

    Class counts (a-z, space, other) come from the replace-and-
    difference idiom — 28 scan-local codegen expressions, NO per-char
    explode. Each ln is micro-rounded BEFORE the integer combine
    (X253's discipline), so H = sum(cnt * (ln N - ln cnt)) / N is one
    integer per doc and the oracle matches exactly.

    100 TB: zero shuffles before the final top-k (TakeOrdered) — the
    entropy is a pure per-row projection.
    """
    d = table(spark, sf_dir, "documents").where(F.length("text") > 0)
    t = F.lower(F.col("text"))
    total = F.length("text")
    cnt_cols = [
        (F.length(t) - F.length(F.regexp_replace(t, f"[{c}]" if c != " " else " ", "")))
        .alias(f"c_{i}")
        for i, c in enumerate(_ENT_CLASSES)
    ]
    base = d.select(F.col("doc_id"), total.alias("total"), *cnt_cols)
    known = sum(F.col(f"c_{i}") for i in range(len(_ENT_CLASSES)))
    base = base.withColumn("c_other", F.col("total") - known)
    ln_micro_total = F.expr(_ln_micro_sql("total"))

    def term(cname: str) -> F.Column:
        cnt = F.col(cname)
        return F.when(
            cnt > 0,
            cnt * (ln_micro_total - F.expr(_ln_micro_sql(cname))),
        ).otherwise(F.lit(0))

    names = [f"c_{i}" for i in range(len(_ENT_CLASSES))] + ["c_other"]
    h_scaled = sum(term(n) for n in names)
    # h_scaled <= total * ln_micro(total) — comfortably inside bigint
    # at any realistic doc length, so plain integer DIV is exact
    out = base.select(
        "doc_id",
        F.floor(h_scaled / F.col("total")).cast("bigint").alias("entropy_micro"),
        F.col("total").cast("bigint").alias("n_chars"),
    )
    return out.orderBy(F.desc("entropy_micro"), "doc_id").limit(_ENT_TOP)


# --- X354: deterministic label propagation (2 unrolled rounds) -----------------

_LP_TOP = 100


@register(
    "q_label_prop",
    oracle=f"""
    WITH {_GRAPH_SQL},
    und AS (
        SELECT x AS u, y AS v FROM edges
        UNION ALL SELECT y, x FROM edges
    ),
    l0 AS (SELECT node, node AS lab FROM nodes),
    l1 AS (
        SELECT e.u AS node, MIN(l.lab) AS lab
        FROM und e JOIN l0 l ON l.node = e.v
        GROUP BY e.u
    ),
    l2 AS (
        SELECT e.u AS node, MIN(l.lab) AS lab
        FROM und e JOIN l1 l ON l.node = e.v
        GROUP BY e.u
    ),
    census AS (
        SELECT lab, CAST(COUNT(*) AS BIGINT) AS community_size
        FROM l2 GROUP BY lab
    )
    SELECT lab, community_size
    FROM census
    ORDER BY community_size DESC, lab
    LIMIT {_LP_TOP}
    """,
)
def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X354: label propagation, 2 unrolled MIN-rule rounds + community
    census — the deterministic skeleton of LPA community detection
    (the async random-order variant is nondeterministic by design;
    the synchronous MIN-label rule is its exactly-verifiable core and
    the same update connected-components converges with). Two rounds
    over the hash graph: every node takes the minimum label among its
    neighbors; communities are the label census after round 2.
    q_dedup_survivors runs this rule TO convergence (components);
    this pins the per-round operator itself, census included, so an
    iterative caller can checkpoint-verify any intermediate round.

    100 TB: each round is one edge-list equi-join + partial-aggregated
    MIN — the SpMV shape (X351); the label relation shuffles on node
    id (broadcast here because the node table is dimension-sized).
    """
    s = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("node"))
    edges = _hash_graph(spark, sf_dir)
    und = edges.select(F.col("x").alias("u"), F.col("y").alias("v")).unionByName(
        edges.select(F.col("y").alias("u"), F.col("x").alias("v"))
    )
    l0 = s.select("node", F.col("node").alias("lab"))
    l1 = (
        und.join(F.broadcast(l0.select(F.col("node").alias("v"), "lab")), "v")
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("lab").alias("lab"))
    )
    l2 = (
        und.join(F.broadcast(l1.select(F.col("node").alias("v"), "lab")), "v")
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("lab").alias("lab"))
    )
    census = l2.groupBy("lab").agg(
        F.count("*").cast("bigint").alias("community_size")
    )
    return census.orderBy(F.desc("community_size"), "lab").limit(_LP_TOP)


# --- X355: historical VaR + expected shortfall ---------------------------------


@register(
    "q_var_es",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority AS pri, o_orderdate AS d,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
        FROM orders GROUP BY 1, 2
    ),
    rets AS (
        SELECT pri,
               (rev - LAG(rev) OVER w) * 10000 // LAG(rev) OVER w AS ret_bp
        FROM daily WINDOW w AS (PARTITION BY pri ORDER BY d)
        QUALIFY LAG(rev) OVER w IS NOT NULL
    ),
    var_ AS (
        SELECT pri,
               CAST(quantile_disc(ret_bp, 0.05) AS BIGINT) AS var_bp,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM rets GROUP BY pri
    ),
    es AS (
        SELECT r.pri,
               CAST(SUM(r.ret_bp) // COUNT(*) AS BIGINT) AS es_bp
        FROM rets r JOIN var_ v ON v.pri = r.pri
        WHERE r.ret_bp <= v.var_bp
        GROUP BY r.pri
    )
    SELECT v.pri, v.var_bp, e.es_bp, v.n_days
    FROM var_ v JOIN es e ON e.pri = v.pri
    ORDER BY v.pri
    """,
)
def q_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X355: historical 95% value-at-risk + expected shortfall per
    priority class — the tail-risk pair (X347's realized volatility is
    the dispersion number; VaR/ES are the regulatory tail numbers, and
    ES is the coherent one). Day-over-day revenue returns in exact
    truncating basis points; VaR = the exact 5th-percentile return
    (percentile_disc — a real order statistic, no interpolation to
    diverge between engines), ES = the truncating integer mean of the
    returns at or below it.

    100 TB: one daily (pri, date) partial aggregate; returns are a
    per-priority lag window over the calendar-bounded series; the
    quantile is percentile_disc on that same bounded relation.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderdate").alias("d")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev"))
    w = Window.partitionBy("pri").orderBy("d")
    prev = F.lag("rev").over(w)
    rets = (
        daily.select(
            "pri", ((F.col("rev") - prev) * 10000).alias("num"), prev.alias("den")
        )
        .where(F.col("den").isNotNull())
        .select("pri", F.expr("num DIV den").alias("ret_bp"))
    )
    var_ = rets.groupBy("pri").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY ret_bp)")
        .cast("bigint")
        .alias("var_bp"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    es = (
        rets.join(F.broadcast(var_.select("pri", "var_bp")), "pri")
        .where(F.col("ret_bp") <= F.col("var_bp"))
        .groupBy("pri")
        .agg(F.expr("CAST(SUM(ret_bp) DIV COUNT(*) AS BIGINT)").alias("es_bp"))
    )
    return (
        var_.join(es, "pri")
        .select("pri", "var_bp", "es_bp", "n_days")
        .orderBy("pri")
    )
