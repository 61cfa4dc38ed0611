"""Embedding similarity search operators (SURVEY.md §2.11 L4).

Brute-force cosine is the exactness baseline; random-hyperplane LSH
bucketing is the scale path (candidate generation becomes an equi-join
on bucket id, so the pairwise work is bounded per bucket instead of
O(n^2) global).

All vector math is JVM-side codegen (zip_with/aggregate) — no Python in
the scoring loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two numeric array columns, computed in double."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    return F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm_expr(a: Column) -> Column:
    da = F.transform(a, lambda x: x.cast("double"))
    return F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))


def brute_force_topk(
    df: DataFrame,
    query: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors for every query row (queries broadcast).

    Output: (query_id, id, cosine_sim, rank). Scales as |df| x |query|
    cosine evaluations with no shuffle of df; right-size k and the query
    set, or switch to ann_lsh_topk when |query| is large.
    """
    q = F.broadcast(
        query.select(
            F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__qv")
        )
    )
    sim = cosine_expr(F.col(vec_col), F.col("__qv"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        df.crossJoin(q)
        .where(F.col(id_col) != F.col("__qid"))
        .select(
            F.col("__qid").alias("query_id"),
            F.col(id_col),
            sim.alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def brute_force_pairs_blocked(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    threshold: float,
    out_a: str = "vec_a",
    out_b: str = "vec_b",
    out_sim: str = "cosine_sim",
    round_to: int = 4,
) -> DataFrame:
    """All-pairs cosine above threshold, broadcast-matmul style.

    One side is materialized as a (n, dim) float64 matrix and broadcast
    to every task; mapInPandas then scores each Arrow batch of the other
    side against it with a single BLAS matmul — thousands of times
    faster than per-pair array expressions. The i<j triangle is kept by
    id comparison.

    Scale envelope: the broadcast side must fit in executor memory
    (~1M x 128 dims = 0.5 GB). Beyond that, block BOTH sides: add a
    block id, self-join block pairs, and run this kernel per block pair
    — or switch to ann_lsh_topk for approximate retrieval.
    """
    import pandas as pd

    sc = df.sparkSession.sparkContext
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)

    def score(batches):
        ref_ids, ref = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ ref.T  # (batch, n)
            qids = pdf[id_col].to_numpy()
            bi, bj = np.nonzero(sims > threshold)
            keep = qids[bi] < ref_ids[bj]
            yield pd.DataFrame(
                {
                    out_a: qids[bi[keep]],
                    out_b: ref_ids[bj[keep]],
                    out_sim: np.round(sims[bi[keep], bj[keep]], round_to),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        score, f"{out_a} long, {out_b} long, {out_sim} double"
    )


def hyperplane_bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane, packed into a long."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(w)) for w in plane])
        bit = F.when(dot_expr(F.col(vec_col), plane_arr) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit.cast("bigint")
    return bucket


def ann_lsh_topk(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 2,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate all-pairs top-k via multi-table random-hyperplane LSH.

    Standard sign-LSH banding: each of n_tables tables hashes a vector
    to a bucket from n_planes hyperplane signs; vectors sharing ANY
    table's bucket are candidates (OR-amplification — recall
    1-(1-p^n_planes)^n_tables for per-plane agreement p). Exact cosine
    runs only on candidates; candidate generation is an equi-join on
    (table, bucket) — never a cross join.

    Tuning: more planes/table -> smaller buckets -> less pairwise work,
    lower per-table recall; more tables buys the recall back at the
    cost of candidate-union size. Deterministic for a fixed seed.
    """
    first = df.select(vec_col).first()
    dim = len(first[0])
    rng = np.random.RandomState(seed)
    tables = [rng.normal(size=(n_planes, dim)) for _ in range(n_tables)]
    bucket_entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                hyperplane_bucket_expr(vec_col, planes).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), F.explode(bucket_entries).alias("tb")
    ).select(id_col, vec_col, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "table", "bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "table", "bucket"
    )
    candidates = (
        a.join(b, on=["table", "bucket"])
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])  # union over tables
    )
    sim = cosine_expr(F.col("va"), F.col("vb"))
    w = Window.partitionBy("id_a").orderBy(F.col("cosine_sim").desc(), F.col("id_b"))
    return (
        candidates.select("id_a", "id_b", F.round(sim, 4).alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
