"""Round-5 widening queries, twenty-second batch (SURVEY.md §2.13, X310-X314).

LLM training-data operators: embedding-space contamination, mixture
temperature scaling, context-window packing economics, n-gram
continuation tables, and sketch-fidelity auditing:

- X310 embedding contamination: X14's token-overlap contamination in
  EMBEDDING space — train vectors within cosine 0.95 of any eval
  vector, the semantic leak the n-gram check misses.
- X311 temperature-scaled mixture weights: w_s proportional to
  n_s^alpha (alpha=1/2) — the multilingual-LM sampling smoother
  (up-weights tail sources), exact in fixed point.
- X312 packing-boundary audit: the concatenate-and-chunk packing
  every pretraining pipeline runs, audited exactly per context
  length — chunk counts, boundary-split docs, terminal waste — from
  ONE two-pass cumulative, no packing simulation.
- X313 n-gram continuation table: top-3 next tokens per bigram
  prefix — the backoff-LM / autocomplete table, built scan-local.
- X314 sign-sketch fidelity: how well 64-bit sign sketches (X45's
  1-bit quantization) preserve cosine — exact Pearson r between
  sketch agreement and true cosine over a deterministic pair sample
  (the measured-accuracy discipline of X203/X217).

Reference parity note: engine extensions per SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.cumulative import ordered_cumsum
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

_EMB_MILLI_SQL = """
    e AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                             AS BIGINT)) AS v
        FROM embeddings
    )
"""


def _emb_milli(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("bigint"),
        ).alias("v"),
    )


# --- X310: embedding-space contamination -------------------------------------

_CONTAM_COS_MICRO = 350000


@register(
    "q_embedding_contamination",
    tags=("pairs",),
    oracle="WITH "
    + _EMB_MILLI_SQL
    + f""",
    prep AS (
        SELECT vec_id, label, v,
               list_inner_product(
                   list_transform(v, x -> CAST(x AS DOUBLE)),
                   list_transform(v, x -> CAST(x AS DOUBLE))) AS q
        FROM e
    ),
    pairs AS (
        SELECT t.vec_id AS train_id, ev.vec_id AS eval_id,
               CAST(ROUND(1000000
                    * list_inner_product(
                          list_transform(t.v, x -> CAST(x AS DOUBLE)),
                          list_transform(ev.v, x -> CAST(x AS DOUBLE)))
                    / SQRT(t.q * ev.q)) AS BIGINT) AS cos_micro
        FROM prep t JOIN prep ev
          ON t.label <> 0 AND ev.label = 0
    )
    SELECT train_id,
           CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           CAST(MAX(cos_micro) AS BIGINT) AS max_cos_micro,
           CAST(MIN(eval_id) AS BIGINT) AS first_eval_id
    FROM pairs WHERE cos_micro >= {_CONTAM_COS_MICRO}
    GROUP BY train_id ORDER BY train_id
    """,
)
def q_embedding_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X310: train/eval contamination in embedding space.

    X14 flags benchmark leakage by token overlap; paraphrased leaks
    survive that check but not this one — any train vector (labels
    1-9) within cosine 0.35 of an eval vector (label 0) is flagged
    (threshold tuned to the synthetic clusters' geometry — cross-label
    cosines top out near 0.49 here; real-embedding deployments set
    ~0.95)
    with its hit count and closest-match score. Cosines are one float
    expression over exact integer dot products and norms
    (milli-quantized dims), micro-rounded BEFORE the threshold so the
    boundary can't flip between engines.

    100 TB: the eval set is benchmark-sized by nature — it
    BROADCASTS; the train corpus streams through scan-locally with
    no shuffle until the per-train-vector hit aggregate. (The
    quadratic oracle is the test-scale certificate; the plan itself
    is linear in the train side.)
    """
    e = _emb_milli(spark, sf_dir)
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    prep = e.select(
        "vec_id",
        "label",
        "v",
        F.aggregate(
            F.zip_with(dbl(F.col("v")), dbl(F.col("v")), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("q"),
    )
    t = prep.where(F.col("label") != 0).alias("t")
    ev = prep.where(F.col("label") == 0).alias("ev")
    dot = F.aggregate(
        F.zip_with(
            dbl(F.col("t.v")), dbl(F.col("ev.v")), lambda a, b: a * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos_micro = F.round(
        1000000 * dot / F.sqrt(F.col("t.q") * F.col("ev.q"))
    ).cast("bigint")
    pairs = t.join(F.broadcast(ev)).select(
        F.col("t.vec_id").alias("train_id"),
        F.col("ev.vec_id").alias("eval_id"),
        cos_micro.alias("cos_micro"),
    )
    return (
        pairs.where(F.col("cos_micro") >= _CONTAM_COS_MICRO)
        .groupBy("train_id")
        .agg(
            F.count("*").cast("bigint").alias("n_eval_hits"),
            F.max("cos_micro").cast("bigint").alias("max_cos_micro"),
            F.min("eval_id").cast("bigint").alias("first_eval_id"),
        )
        .orderBy("train_id")
    )


# --- X311: temperature-scaled mixture weights --------------------------------


@register(
    "q_temperature_mixture",
    oracle="""
    WITH src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    powed AS (
        SELECT source, n_docs, n_tokens,
               CAST(ROUND(1000000 * SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                   AS pow_micro
        FROM src
    ),
    tot AS (SELECT SUM(pow_micro) AS t, SUM(n_tokens) AS tok FROM powed)
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens * 10000 // tok AS BIGINT) AS raw_share_bp,
           CAST(pow_micro * 10000 // t AS BIGINT) AS temp_share_bp
    FROM powed CROSS JOIN tot ORDER BY source
    """,
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X311: temperature-scaled sampling weights, alpha = 1/2.

    The multilingual/multi-source smoothing every large LM mixture
    uses (sample source s proportional to n_s^alpha): alpha < 1
    up-weights tail sources so low-resource data isn't drowned.
    Each source's n_tokens^0.5 micro-rounds once; the normalized
    shares are integer basis points against the exact integer total —
    reported next to the raw (alpha=1) shares so the table shows what
    the temperature moved. X136's DSIR reweighting targets a
    DISTRIBUTION; this is the simpler power-law knob.

    100 TB: one partial-aggregated source census (bounded by
    |sources|), then constant-size arithmetic.
    """
    d = table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    # |sources|-row relation probed twice (total + shares) —
    # checkpoint so the fact-scale token census runs once
    powed = src.select(
        "*",
        F.round(1000000 * F.sqrt(F.col("n_tokens").cast("double")))
        .cast("bigint")
        .alias("pow_micro"),
    ).localCheckpoint(eager=True)
    tot = powed.agg(
        F.sum("pow_micro").alias("t"), F.sum("n_tokens").alias("tok")
    )
    raw = F.col("n_tokens") * 10000
    tmp = F.col("pow_micro") * 10000
    return (
        powed.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            ((raw - raw % F.col("tok")) / F.col("tok"))
            .cast("bigint")
            .alias("raw_share_bp"),
            ((tmp - tmp % F.col("t")) / F.col("t"))
            .cast("bigint")
            .alias("temp_share_bp"),
        )
        .orderBy("source")
    )


# --- X312: packing-boundary audit --------------------------------------------

_PACK_CONTEXTS = (512, 1024, 2048, 4096)


@register(
    "q_pack_boundaries",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n,
               SUM(n) OVER (ORDER BY doc_id) AS cend
        FROM toks
    ),
    ctx AS (SELECT UNNEST(ARRAY{list(_PACK_CONTEXTS)}) AS l),
    audited AS (
        SELECT c.l, t.n, t.cend - t.n AS cstart, t.cend
        FROM cum t CROSS JOIN ctx c
    )
    SELECT CAST(l AS BIGINT) AS context_len,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST((SUM(n) + l - 1) // l AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN n > 0
                          AND cstart // l < (cend - 1) // l
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
           CAST(((SUM(n) + l - 1) // l) * l - SUM(n) AS BIGINT)
               AS waste_tokens
    FROM audited GROUP BY l ORDER BY l
    """,
)
def q_pack_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X312: concatenate-and-chunk packing economics, audited exactly.

    The packing every pretraining pipeline actually runs (concatenate
    docs in corpus order, slice into fixed context windows) has two
    costs: terminal padding waste and documents SPLIT across a chunk
    boundary (whose truncated halves train on broken context). Both
    are closed-form from one global token cumulative: doc [start,end)
    crosses a boundary iff start DIV L < (end-1) DIV L. Audited at
    four context lengths from the SAME cumulative — no packing
    simulation, no per-L pass. X44 packs sequences; this prices the
    packing before you run it.

    100 TB: one scan-local token count, one two-pass cumulative
    (ordered_cumsum — no single-partition window), then a 4-wide
    literal cross join and a 4-row aggregate.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n")
    )
    cum = ordered_cumsum(toks, order_by=["doc_id"], values={"n": "cend"})
    ctx = _ctx_lengths(spark)
    audited = cum.crossJoin(F.broadcast(ctx)).select(
        "l", "n", (F.col("cend") - F.col("n")).alias("cstart"), "cend"
    )
    ln = F.col("l")
    total = F.sum("n")
    chunks = (total + ln - 1) - (total + ln - 1) % ln
    split = F.sum(
        F.when(
            (F.col("n") > 0)
            & (
                F.col("cstart") - F.col("cstart") % ln
                < (F.col("cend") - 1) - (F.col("cend") - 1) % ln
            ),
            1,
        ).otherwise(0)
    )
    return (
        audited.groupBy("l")
        .agg(
            total.cast("bigint").alias("total_tokens"),
            (chunks / ln).cast("bigint").alias("n_chunks"),
            split.cast("bigint").alias("n_split_docs"),
            (chunks - total).cast("bigint").alias("waste_tokens"),
        )
        .select(
            F.col("l").cast("bigint").alias("context_len"),
            "total_tokens",
            "n_chunks",
            "n_split_docs",
            "waste_tokens",
        )
        .orderBy("context_len")
    )


def _ctx_lengths(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(int(lv),) for lv in _PACK_CONTEXTS], "l bigint"
    )


# --- X313: n-gram continuation table -----------------------------------------

_CONT_TOP = 3
_CONT_MIN = 2
_CONT_LIMIT = 100


@register(
    "q_ngram_continuations",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    ),
    tris AS (
        SELECT s[g.i] AS w1, s[g.i + 1] AS w2, s[g.i + 2] AS w3
        FROM toks, UNNEST(generate_series(1, len(s) - 2)) AS g(i)
    ),
    counts AS (
        SELECT w1, w2, w3, COUNT(*) AS c FROM tris GROUP BY 1, 2, 3
    ),
    ranked AS (
        SELECT w1, w2, w3, c,
               ROW_NUMBER() OVER (PARTITION BY w1, w2
                                  ORDER BY c DESC, w3) AS rnk,
               SUM(c) OVER (PARTITION BY w1, w2) AS prefix_total
        FROM counts
    )
    SELECT w1, w2, w3, CAST(c AS BIGINT) AS c,
           CAST(rnk AS INT) AS rnk,
           CAST(prefix_total AS BIGINT) AS prefix_total
    FROM ranked
    WHERE rnk <= {_CONT_TOP} AND c >= {_CONT_MIN}
    ORDER BY prefix_total DESC, w1, w2, rnk
    LIMIT {_CONT_LIMIT}
    """,
)
def q_ngram_continuations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X313: trigram continuation table (backoff-LM / autocomplete).

    For each bigram prefix, the top-3 next tokens with counts and the
    prefix total — the continuation-count relation behind Kneser-Ney
    backoff (X285 Good-Turing discounts these same counts) and every
    autocomplete ranker. Trigrams extract scan-locally by array
    slicing (no self-join on position); one count aggregate, one
    per-prefix ranking window.

    100 TB: shuffle keys are (w1,w2,w3) hash — partial-aggregated
    counts, then a per-prefix window whose partitions are
    vocabulary-bounded.
    """
    d = table(spark, sf_dir, "documents")
    tris = d.select(
        F.explode(
            F.expr(
                # Guard: sequence(1, 0) DESCENDS in Spark ([1, 0]) and the
                # transform would then hit element_at(..., 0); docs with
                # fewer than 3 tokens must produce zero trigrams.
                "transform(CASE WHEN size(split(text, ' ')) >= 3"
                "               THEN sequence(1, size(split(text, ' ')) - 2)"
                "               ELSE array() END,"
                " i -> struct(element_at(split(text, ' '), i) as w1,"
                "            element_at(split(text, ' '), i + 1) as w2,"
                "            element_at(split(text, ' '), i + 2) as w3))"
            )
        ).alias("t")
    ).select("t.w1", "t.w2", "t.w3")
    counts = tris.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c"))
    w_rank = Window.partitionBy("w1", "w2").orderBy(F.desc("c"), "w3")
    w_tot = Window.partitionBy("w1", "w2")
    ranked = counts.select(
        "w1",
        "w2",
        "w3",
        "c",
        F.row_number().over(w_rank).alias("rnk"),
        F.sum("c").over(w_tot).alias("prefix_total"),
    )
    return (
        ranked.where((F.col("rnk") <= _CONT_TOP) & (F.col("c") >= _CONT_MIN))
        .select(
            "w1",
            "w2",
            "w3",
            F.col("c").cast("bigint").alias("c"),
            F.col("rnk").cast("int").alias("rnk"),
            F.col("prefix_total").cast("bigint").alias("prefix_total"),
        )
        .orderBy(F.desc("prefix_total"), "w1", "w2", "rnk")
        .limit(_CONT_LIMIT)
    )


# --- X314: sign-sketch fidelity audit ----------------------------------------

_SKETCH_STRIDE = 137


@register(
    "q_sign_sketch_fidelity",
    oracle="WITH "
    + _EMB_MILLI_SQL
    + f""",
    prep AS (
        SELECT vec_id, v,
               list_inner_product(
                   list_transform(v, x -> CAST(x AS DOUBLE)),
                   list_transform(v, x -> CAST(x AS DOUBLE))) AS q
        FROM e
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(ROUND(1000000
                    * list_inner_product(
                          list_transform(a.v, x -> CAST(x AS DOUBLE)),
                          list_transform(b.v, x -> CAST(x AS DOUBLE)))
                    / SQRT(a.q * b.q)) AS BIGINT) AS x,
               CAST(len(list_filter(
                   list_zip(a.v, b.v),
                   z -> (z[1] >= 0) = (z[2] >= 0))) AS BIGINT) AS y
        FROM prep a JOIN prep b
          ON b.vec_id = a.vec_id + {_SKETCH_STRIDE}
        WHERE a.q > 0 AND b.q > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(y) AS BIGINT) AS sum_agree,
           ROUND((COUNT(*) * SUM(CAST(x AS DOUBLE) * y)
                  - SUM(CAST(x AS DOUBLE)) * SUM(y))
                 / SQRT((COUNT(*) * SUM(CAST(x AS DOUBLE) * x)
                         - SUM(CAST(x AS DOUBLE)) * SUM(x))
                        * (COUNT(*) * SUM(CAST(y AS DOUBLE) * y)
                           - SUM(CAST(y AS DOUBLE)) * SUM(y))), 4)
               AS pearson_r
    FROM pairs
    """,
)
def q_sign_sketch_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X314: does the 1-bit sign sketch preserve cosine ordering?

    X45 quantizes embeddings to int8; the cheaper 1-bit sign sketch
    (sim-hash's storage form) keeps only sign bits and estimates
    similarity by agreement count. This audit measures the fidelity
    CLAIM instead of assuming it: over a deterministic pair sample
    (vec_id stride 137 — X203's measured-accuracy discipline), the
    exact Pearson correlation between true cosine (micro, from
    integer dot products) and sign-agreement count. Moment sums are
    pinned by the micro/integer inputs; r is one float, rounded 4.

    100 TB: the stride join is an equi-join on a computed key; all
    else is one pair-grain aggregate.
    """
    e = _emb_milli(spark, sf_dir)
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    prep = e.select(
        "vec_id",
        "v",
        F.aggregate(
            F.zip_with(dbl(F.col("v")), dbl(F.col("v")), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("q"),
    )
    a, b = prep.alias("a"), prep.alias("b")
    dot = F.aggregate(
        F.zip_with(dbl(F.col("a.v")), dbl(F.col("b.v")), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    agree = F.size(
        F.filter(
            F.zip_with(
                F.col("a.v"),
                F.col("b.v"),
                lambda x, y: (x >= 0) == (y >= 0),
            ),
            lambda z: z,
        )
    ).cast("bigint")
    pairs = (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + _SKETCH_STRIDE)
        .where((F.col("a.q") > 0) & (F.col("b.q") > 0))
        .select(
            F.round(1000000 * dot / F.sqrt(F.col("a.q") * F.col("b.q")))
            .cast("bigint")
            .alias("x"),
            agree.alias("y"),
        )
    )
    n = F.count("*")
    sx = F.sum(F.col("x").cast("double"))
    sy = F.sum(F.col("y").cast("double"))
    sxy = F.sum(F.col("x").cast("double") * F.col("y"))
    sxx = F.sum(F.col("x").cast("double") * F.col("x"))
    syy = F.sum(F.col("y").cast("double") * F.col("y"))
    return pairs.agg(
        n.cast("bigint").alias("n_pairs"),
        F.sum("y").cast("bigint").alias("sum_agree"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            4,
        ).alias("pearson_r"),
    )
