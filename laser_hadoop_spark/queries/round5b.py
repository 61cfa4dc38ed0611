"""Round-5 widening queries, second batch (SURVEY.md §2.13, X209-X213).

- X209 ranked-retrieval quality metrics: MRR and P@5 for a
  token-overlap ranking against same-source relevance labels — the
  evaluation loop every retrieval stack (X122 BM25) needs, in exact
  integer basis points.
- X210 deterministic weighted sampling: per-stratum k-smallest by
  integer priority hash DIV weight — reproducible
  weight-proportional-ish selection where seeded samplers are
  rows-only by nature (X13/X115's weighted sibling).
- X211 KL divergence between per-source token distributions and the
  corpus, over the global top-50 vocabulary — the drift measure
  behind DSIR-style selection (X155), PSI's (X197) information-theory
  sibling, same ROUND(LN(ratio)*1e6) fixed-point discipline.
- X212 BPE pair-merge training steps, exactly verified: three
  unrolled merge iterations (count adjacent symbol pairs, pick the
  argmax with deterministic tie-break, re-segment via string
  replacement over a bracket-delimited symbol representation) — the
  tokenizer-training inner loop as a distributed query.
- X213 multi-source key reconciliation census: presence bitmask
  across three independent relations via one tagged-union aggregate —
  N-way full-outer reconciliation with a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X209: ranked-retrieval quality metrics --------------------------------

_N_QUERIES = 8


@register(
    "q_retrieval_metrics",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
        FROM documents
    ),
    meta AS (SELECT doc_id, source FROM documents),
    q AS (
        SELECT t.doc_id AS qid, t.tok, m.source AS qsrc
        FROM toks t JOIN meta m ON m.doc_id = t.doc_id
        WHERE t.doc_id < {_N_QUERIES}
    ),
    scored AS (
        SELECT q.qid, d.doc_id AS did, COUNT(*) AS score
        FROM q JOIN toks d ON d.tok = q.tok AND d.doc_id <> q.qid
        GROUP BY q.qid, d.doc_id
    ),
    ranked AS (
        SELECT s.qid, s.did, s.score,
               ROW_NUMBER() OVER (PARTITION BY s.qid
                                  ORDER BY s.score DESC, s.did) AS rk,
               CASE WHEN m.source = (SELECT DISTINCT qsrc FROM q q2
                                     WHERE q2.qid = s.qid)
                    THEN 1 ELSE 0 END AS rel
        FROM scored s JOIN meta m ON m.doc_id = s.did
    )
    SELECT qid AS query_id,
           COUNT(*) AS n_retrieved,
           CAST(COALESCE(MIN(CASE WHEN rel = 1 THEN rk END), 0) AS BIGINT)
               AS first_rel_rank,
           CAST(COALESCE(10000 // MIN(CASE WHEN rel = 1 THEN rk END), 0)
                AS BIGINT) AS mrr_bp,
           CAST(SUM(CASE WHEN rk <= 5 AND rel = 1 THEN 1 ELSE 0 END) * 2000
                AS BIGINT) AS p_at5_bp
    FROM ranked GROUP BY qid
    """,
)
def q_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X209: ranked-retrieval quality metrics (MRR, P@5), exact.

    Evaluates a token-overlap retrieval ranking (score = |shared
    distinct tokens|, ties broken by doc_id) against same-source
    relevance labels: per query, the rank of the first relevant hit,
    reciprocal rank in basis points (10000 DIV rank — integer, so
    cross-engine exact), and precision@5 in bp. Ranking is defined
    over retrieved docs (score >= 1) — the standard IR convention.

    100 TB shape: candidate scoring is a token equi-join (posting-list
    intersection, never query x corpus); the per-query ranking window
    partitions on query_id — parallel across queries, bounded by each
    query's retrieved-set size (BM25/X122's plan shape; two-level
    salted top-k as in X157 when one query retrieves the world).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    meta = d.select("doc_id", "source")
    q = (
        toks.where(F.col("doc_id") < _N_QUERIES)
        .withColumnRenamed("doc_id", "qid")
        .join(
            meta.withColumnRenamed("doc_id", "qid").withColumnRenamed(
                "source", "qsrc"
            ),
            "qid",
        )
    )
    scored = (
        q.alias("q")
        .join(
            toks.select(
                F.col("doc_id").alias("did"), F.col("tok").alias("dtok")
            ),
            (F.col("dtok") == F.col("tok")) & (F.col("did") != F.col("qid")),
        )
        .groupBy("qid", "qsrc", "did")
        .agg(F.count("*").alias("score"))
    )
    ranked = scored.join(
        meta.select(F.col("doc_id").alias("did"), F.col("source").alias("dsrc")),
        "did",
    ).select(
        "qid",
        "did",
        "score",
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.col("score").desc(), "did"))
        .alias("rk"),
        F.when(F.col("dsrc") == F.col("qsrc"), 1).otherwise(0).alias("rel"),
    )
    first_rel = F.min(F.when(F.col("rel") == 1, F.col("rk")))
    return ranked.groupBy(F.col("qid").alias("query_id")).agg(
        F.count("*").alias("n_retrieved"),
        F.coalesce(first_rel, F.lit(0)).cast("bigint").alias("first_rel_rank"),
        F.coalesce(
            F.expr("10000 DIV min(CASE WHEN rel = 1 THEN rk END)"), F.lit(0)
        )
        .cast("bigint")
        .alias("mrr_bp"),
        (F.sum(F.when((F.col("rk") <= 5) & (F.col("rel") == 1), 1).otherwise(0)) * 2000)
        .cast("bigint")
        .alias("p_at5_bp"),
    )


# --- X210: deterministic weighted sample -----------------------------------

_SAMPLE_K = 10


@register(
    "q_weighted_sample",
    oracle=f"""
    WITH recs AS (
        SELECT c_custkey AS id, c_mktsegment AS seg,
               GREATEST(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT), 1) AS w,
               ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                   AS h
        FROM customer
    ),
    ranked AS (
        SELECT seg, id, h // w AS priority,
               ROW_NUMBER() OVER (PARTITION BY seg
                                  ORDER BY h // w, id) AS rk
        FROM recs
    )
    SELECT seg, id, CAST(priority AS BIGINT) AS priority, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_SAMPLE_K}
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X210: deterministic weighted sampling (per-stratum k smallest
    priority = hash DIV weight).

    Weight-biased reproducible selection: a 60-bit md5 priority
    divided by the row's integer weight makes heavy rows
    proportionally likelier to rank early, with NO RNG state — the
    sample is a pure function of the data, stable under re-runs,
    insertion order, and partitioning (the property X139's hash split
    relies on; seeded samplers like X13's sampleBy are rows-only by
    nature). Ties broken by id.

    100 TB: one window partitioned by stratum; at extreme stratum
    cardinality skew the two-level salted top-k (X157) substitutes.
    """
    c = table(spark, sf_dir, "customer")
    recs = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("seg"),
        F.greatest(
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint"),
            F.lit(1),
        ).alias("w"),
        F.expr(
            "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 15), 16, 10) "
            "AS BIGINT)"
        ).alias("h"),
    )
    ranked = recs.select(
        "seg",
        "id",
        F.expr("h DIV w").alias("priority"),
        F.row_number()
        .over(Window.partitionBy("seg").orderBy(F.expr("h DIV w"), F.col("id")))
        .alias("rk"),
    )
    return ranked.where(F.col("rk") <= _SAMPLE_K).select(
        "seg", "id", F.col("priority").cast("bigint"), F.col("rk").cast("int")
    )


# --- X211: KL divergence of per-source token distributions -----------------

_KL_VOCAB = 50


@register(
    "q_kl_divergence",
    oracle=f"""
    WITH toks AS (
        SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    gcnt AS (SELECT tok, COUNT(*) AS gc FROM toks GROUP BY tok),
    vocab AS (
        SELECT tok, gc FROM gcnt ORDER BY gc DESC, tok LIMIT {_KL_VOCAB}
    ),
    gtot AS (SELECT SUM(gc) AS gt FROM vocab),
    src AS (
        SELECT t.source, t.tok, COUNT(*) AS sc
        FROM toks t JOIN vocab v ON v.tok = t.tok
        GROUP BY t.source, t.tok
    ),
    stot AS (SELECT source, SUM(sc) AS st FROM src GROUP BY source),
    terms AS (
        SELECT s.source,
               10000 * s.sc // t.st AS p_bp,
               10000 * v.gc // g.gt AS q_bp
        FROM src s
        JOIN stot t ON t.source = s.source
        JOIN vocab v ON v.tok = s.tok
        CROSS JOIN gtot g
    )
    SELECT source,
           COUNT(*) AS n_vocab_present,
           CAST(SUM(CASE WHEN p_bp > 0 AND q_bp > 0
                    THEN p_bp * CAST(ROUND(LN(CAST(p_bp AS DOUBLE) / q_bp)
                                           * 1000000) AS BIGINT) // 10000
                    ELSE 0 END) AS BIGINT) AS kl_micro
    FROM terms GROUP BY source
    """,
)
def q_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X211: KL(source || corpus) over the global top-50 vocabulary.

    The distribution-shift measure behind DSIR-style data selection
    (X155) and ingest drift monitoring (X194): per-source token shares
    vs corpus shares in basis points, each term
    p * ln(p/q) in micro units via the PSI (X197) fixed-point
    discipline — shares are exact integer bp, the single float (ln of
    a ratio of identical small integers) rounds at 1e-6 before any
    arithmetic, so both engines see the same bigint.

    100 TB: token counting is the wordcount shuffle on token strings;
    the vocabulary is a 50-row broadcast; everything after is per
    (source, token) integer arithmetic.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    glob = toks.groupBy("tok").agg(F.count("*").alias("gc"))
    vocab = glob.orderBy(F.col("gc").desc(), "tok").limit(_KL_VOCAB)
    gtot = vocab.agg(F.sum("gc").alias("gt"))
    src = (
        toks.join(F.broadcast(vocab.select("tok")), "tok")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("sc"))
    )
    stot = src.groupBy("source").agg(F.sum("sc").alias("st"))
    terms = (
        src.join(stot, "source")
        .join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(gtot))
        .select(
            "source",
            F.expr("10000 * sc DIV st").alias("p_bp"),
            F.expr("10000 * gc DIV gt").alias("q_bp"),
        )
    )
    term = F.when(
        (F.col("p_bp") > 0) & (F.col("q_bp") > 0),
        F.expr(
            "p_bp * CAST(ROUND(LN(CAST(p_bp AS DOUBLE) / q_bp) * 1000000, 0) "
            "AS BIGINT) DIV 10000"
        ),
    ).otherwise(F.lit(0))
    return terms.groupBy("source").agg(
        F.count("*").alias("n_vocab_present"),
        F.sum(term).cast("bigint").alias("kl_micro"),
    )


# --- X212: BPE pair-merge training steps -----------------------------------

_BPE_PAT = r"\[([^\]]*)\]"


def _bpe_oracle() -> str:
    """Three unrolled merge iterations in DuckDB (X50's unrolled-loop
    discipline). Symbols live in a bracket-delimited representation
    ('[c][a][t]'), so a pair replacement '[a][b]' -> '[ab]' can never
    match inside a multi-char symbol and disjoint adjacent occurrences
    never share characters (one replace() pass == BPE's left-to-right
    greedy merge)."""
    steps = []
    prev = "w0"
    for t in (1, 2, 3):
        steps.append(
            f"""
    s{t} AS (
        SELECT word, freq,
               regexp_extract_all(repr, '{_BPE_PAT}', 1) AS syms
        FROM {prev}
    ),
    e{t} AS (
        SELECT freq, syms,
               UNNEST(generate_series(1, len(syms) - 1)) AS i
        FROM s{t} WHERE len(syms) >= 2
    ),
    p{t} AS (
        SELECT syms[i] AS pa, syms[i + 1] AS pb, SUM(freq) AS cnt
        FROM e{t} GROUP BY 1, 2
    ),
    t{t} AS (SELECT pa, pb, cnt FROM p{t} ORDER BY cnt DESC, pa, pb LIMIT 1),
    w{t} AS (
        SELECT w.word, w.freq,
               replace(w.repr, '[' || t.pa || '][' || t.pb || ']',
                       '[' || t.pa || t.pb || ']') AS repr
        FROM {prev} w CROSS JOIN t{t} t
    )"""
        )
        prev = f"w{t}"
    return (
        """
    WITH words AS (
        SELECT tok AS word, COUNT(*) AS freq FROM (
            SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
        ) WHERE length(tok) >= 2 GROUP BY tok
    ),
    w0 AS (
        SELECT word, freq,
               array_to_string(
                   list_transform(generate_series(1, length(word)),
                                  i -> '[' || word[i] || ']'), '') AS repr
        FROM words
    ),"""
        + ",".join(steps)
        + """
    SELECT 1 AS step, pa AS pair_a, pb AS pair_b,
           CAST(cnt AS BIGINT) AS merged_count FROM t1
    UNION ALL SELECT 2, pa, pb, CAST(cnt AS BIGINT) FROM t2
    UNION ALL SELECT 3, pa, pb, CAST(cnt AS BIGINT) FROM t3
    """
    )


@register("q_bpe_merges", oracle=_bpe_oracle())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X212: BPE tokenizer-training merge steps, exactly verified.

    Three unrolled iterations of the byte-pair-encoding inner loop
    over the corpus word-frequency table: count adjacent symbol pairs
    (weighted by word frequency), merge the argmax pair (ties broken
    lexicographically — deterministic), re-segment every word by
    string replacement over a bracket-delimited symbol representation
    ('[c][a][t]'; '[a][b]' -> '[ab]' cannot match inside a symbol and
    one replace pass equals BPE's left-to-right greedy merge), repeat.
    The oracle unrolls the identical three iterations in SQL (X50's
    exactly-verified-iteration discipline).

    100 TB: the word-frequency table is the wordcount reduce; each
    iteration is one pair-count aggregate over it (rows ~ vocabulary,
    not corpus) + a 1-row broadcast — the distributed shape of a real
    BPE trainer's first merges, where corpus scale collapses into
    vocab scale after the first aggregate.
    """
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    w = words.select(
        "word",
        "freq",
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.concat(
                    F.lit("["), F.col("word").substr(i, F.lit(1)), F.lit("]")
                ),
            ),
        ).alias("repr"),
    ).localCheckpoint(eager=True)
    out = []
    for step in (1, 2, 3):
        syms = F.regexp_extract_all(F.col("repr"), F.lit(_BPE_PAT), F.lit(1))
        e = w.select(
            "freq", syms.alias("syms")
        ).where(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("pa"),
                        F.element_at("syms", i + 1).alias("pb"),
                    ),
                )
            ).alias("pr"),
        )
        pairs = e.groupBy(
            F.col("pr.pa").alias("pa"), F.col("pr.pb").alias("pb")
        ).agg(F.sum("freq").alias("cnt"))
        top = pairs.orderBy(F.col("cnt").desc(), "pa", "pb").limit(1)
        out.append(
            top.select(
                F.lit(step).alias("step"),
                F.col("pa").alias("pair_a"),
                F.col("pb").alias("pair_b"),
                F.col("cnt").cast("bigint").alias("merged_count"),
            )
        )
        if step < 3:
            w = (
                w.crossJoin(F.broadcast(top))
                .select(
                    "word",
                    "freq",
                    F.replace(
                        F.col("repr"),
                        F.concat(
                            F.lit("["), F.col("pa"), F.lit("]["), F.col("pb"), F.lit("]")
                        ),
                        F.concat(F.lit("["), F.col("pa"), F.col("pb"), F.lit("]")),
                    ).alias("repr"),
                )
                .localCheckpoint(eager=True)
            )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


# --- X213: multi-source key reconciliation census --------------------------


@register(
    "q_multisource_reconcile",
    oracle="""
    WITH tagged AS (
        SELECT c_custkey AS k, 1 AS tag FROM customer
        UNION ALL
        SELECT DISTINCT o_custkey, 2 FROM orders
        UNION ALL
        SELECT DISTINCT user_id, 4 FROM events
    ),
    masks AS (
        SELECT k, SUM(DISTINCT tag) AS mask FROM tagged GROUP BY k
    )
    SELECT CAST(mask AS INT) AS presence_mask,
           COUNT(*) AS n_keys,
           CAST(MIN(k) AS BIGINT) AS example_key
    FROM masks GROUP BY mask
    """,
)
def q_multisource_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X213: N-way key reconciliation census (presence bitmask).

    Which keys exist in which systems — the data-ops reconciliation
    report (customer master vs order fact vs event stream) — WITHOUT
    chained full-outer joins: each source emits (key, tag-bit), one
    aggregate ORs the bits per key, a second tiny aggregate counts
    keys per presence combination. Two shuffles total regardless of
    source count, vs N-1 full-outer shuffles for the join spelling.

    100 TB: the tagged union is scan-local; the per-key aggregate
    combines map-side (each partition emits each key once per tag).
    """
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.lit(1).alias("tag")
    )
    o = (
        table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .select("k", F.lit(2).alias("tag"))
    )
    e = (
        table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("k"))
        .distinct()
        .select("k", F.lit(4).alias("tag"))
    )
    masks = (
        c.unionByName(o)
        .unionByName(e)
        .groupBy("k")
        .agg(F.sum_distinct(F.col("tag")).alias("mask"))
    )
    return masks.groupBy(F.col("mask").cast("int").alias("presence_mask")).agg(
        F.count("*").alias("n_keys"),
        F.min("k").cast("bigint").alias("example_key"),
    )
