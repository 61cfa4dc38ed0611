"""Bloom-filter pruned semi-join — scale path for selective key lookups.

The reference's one lookup strategy is a distributed-cache HashMap
probed per record (LASERInputCheckMapper.java:53-72): the build side
must fit in every mapper's heap, and every fact row pays a hash probe.
The Spark-first restatement of that idea at 100 TB is a Bloom filter:

1. build a fixed-size bitmap over the dim keys with one aggregation
   (`explode` k hash positions -> per-word `bit_or` -> one map row);
2. broadcast the single-row bitmap and test membership with pure
   codegen expressions on the fact scan (no shuffle of the fact side,
   no Python);
3. run the exact semi-join only on the survivors, killing the false
   positives.

The win over a plain semi-join: the fact-side shuffle carries only
rows that pass the bitmap (false-positive rate ~ (1-e^{-kn/m})^k),
instead of every fact row. Spark's own `spark.sql.optimizer.
runtimeFilter.bloomFilter` does this inside AQE for some shapes; this
operator makes the plan explicit, tunable, and available to DataFrame
pipelines on any join shape.

Everything is deterministic (xxhash64 with fixed seeds), so results
are reproducible across retries and engines agree on semantics (the
bitmap only prunes; the residual join fixes semantics exactly).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["auto_bloom_params", "build_bloom", "might_contain",
           "bloom_semi_join"]

# Bitmap size clamps for auto-sizing: never below one cache line's worth
# of words (keeps the probe math trivially correct for tiny dims), never
# above 16 MiB (a broadcast every executor must hold; above ~2^27 bits a
# plain broadcast-hash semi-join of the dim keys is the better plan).
_MIN_BITS = 1 << 10
_MAX_BITS = 1 << 27


def auto_bloom_params(n_keys: int, target_fpp: float = 0.01) -> tuple[int, int]:
    """Size a Bloom filter for ``n_keys`` at a target false-positive rate.

    Standard optima: ``m = -n ln p / (ln 2)^2`` bits and
    ``k = (m/n) ln 2`` hashes. m is rounded up to a multiple of 64
    (whole words) and clamped to [2^10, 2^27]; k is clamped to [1, 8]
    because each extra hash adds a full codegen probe to EVERY fact row
    — past 8 the probe cost beats the shuffle savings it buys.
    ``n_keys`` may be an estimate (approx_count_distinct): a few percent
    of error moves the achieved fpp marginally, never correctness,
    because the residual join removes all false positives anyway.
    """
    if n_keys < 1:
        n_keys = 1
    if not 0.0 < target_fpp < 1.0:
        raise ValueError("target_fpp must be in (0, 1)")
    m = -n_keys * math.log(target_fpp) / (math.log(2) ** 2)
    n_bits = min(max((int(m) + 63) // 64 * 64, _MIN_BITS), _MAX_BITS)
    k = round(n_bits / n_keys * math.log(2))
    return n_bits, min(max(k, 1), 8)


def build_bloom(keys: DataFrame, key_col: str, *, n_bits: int = 1 << 20,
                n_hashes: int = 5) -> DataFrame:
    """Aggregate a key column into a single-row Bloom bitmap.

    Returns a 1-row DataFrame with one column ``__bloom_bitmap``
    (collision-proof name: the fact side may own ``bloom``): a DENSE
    ``array<bigint>`` of ``n_bits/64`` words, so each probe is one O(1)
    array index. Density matters: a ``map<int,bigint>`` bitmap probes
    via Spark's GetMapValue, which LINEARLY SCANS the map per lookup —
    measured ~20x slower end-to-end at sf0.1. The densification here is
    a broadcast left-join of ``spark.range(n_words)`` onto the sparse
    per-word ``bit_or`` aggregate — every step stays in codegen, and
    nothing touches the driver; the array broadcasts at ``n_bits/8``
    bytes (128 KiB at the default 2^20 bits).
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(n_bits))
            for seed in range(n_hashes)
        ]
    )
    sparse = (
        keys.select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    dense = (
        keys.sparkSession.range(n_bits // 64)
        .join(F.broadcast(sparse), F.col("id") == F.col("word_idx"), "left")
        .select("id", F.coalesce("word", F.lit(0)).alias("word"))
        .groupBy()
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("id", "word"))),
                lambda s: s["word"],
            ).alias("__bloom_bitmap")
        )
    )
    return dense


def might_contain(key: Column, bloom: Column, *, n_bits: int = 1 << 20,
                  n_hashes: int = 5) -> Column:
    """Membership-test expression against a ``build_bloom`` bitmap.

    Pure codegen: k (hash, O(1) array-index, bitwise-and) probes AND-ed
    together against the dense word array. No false negatives; false
    positives are removed by the caller's residual join.
    """
    tests = []
    for seed in range(n_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))
        word = bloom.getItem((pos / 64).cast("int"))  # 0-based array index
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        tests.append(F.coalesce(word, F.lit(0)).bitwiseAND(bit) != 0)
    return reduce(lambda a, b: a & b, tests)


def bloom_semi_join(facts: DataFrame, dim_keys: DataFrame, fact_col: str,
                    dim_col: str, *, n_bits: int | None = 1 << 20,
                    n_hashes: int = 5,
                    target_fpp: float = 0.01) -> DataFrame:
    """Semi-join ``facts`` to ``dim_keys`` with a Bloom pre-filter.

    Exactly equivalent to ``facts.join(dim, fact_col == dim_col,
    "left_semi")`` — the bitmap only prunes the fact side before the
    exact residual semi-join. At scale the pruned fact side is what
    enters the join's exchange, so shuffle bytes drop by the filter's
    selectivity while the broadcast cost is one dense array<bigint> bitmap
    (~n_bits/8 bytes).

    ``n_bits=None`` auto-sizes: one tiny extra aggregation
    (approx_count_distinct over the dim keys, the same driver-gate
    collect the reference's own job-planning step pays —
    TRACEJobGenerator.java:17-115 sizes batches from a count) feeds
    ``auto_bloom_params`` so the bitmap hits ``target_fpp`` instead of
    a fixed 2^20 guess that over-probes tiny dims and under-filters
    huge ones.
    """
    if n_bits is None:
        n_keys = dim_keys.agg(
            F.approx_count_distinct(dim_col).alias("n")
        ).collect()[0]["n"]
        n_bits, n_hashes = auto_bloom_params(n_keys, target_fpp)
    bloom = build_bloom(dim_keys.select(dim_col), dim_col,
                        n_bits=n_bits, n_hashes=n_hashes)
    pruned = (
        facts.join(F.broadcast(bloom))
        .where(might_contain(F.col(fact_col), F.col("__bloom_bitmap"),
                             n_bits=n_bits, n_hashes=n_hashes))
        .drop("__bloom_bitmap")
    )
    return pruned.join(
        dim_keys.select(F.col(dim_col).alias("__bloom_dim_key")).distinct(),
        F.col(fact_col) == F.col("__bloom_dim_key"),
        "left_semi",
    )
