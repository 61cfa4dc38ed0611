"""Sequence packing for LLM training (SURVEY.md §2.12 X44).

Packs documents into fixed-token-budget training sequences (the
"example packing" step that turns a curated corpus into context-window
sized model inputs) using deterministic greedy first-fit-in-order
packing within hash shards.

Why this shape at 100 TB: packing is inherently sequential (bin state
depends on every earlier document), so a single global greedy pass
cannot be parallelized. Sharding by hash(id) % n_shards makes each
shard an independent sequential problem — shards pack in parallel, the
packing quality loss vs a global pass is negligible (any shard large
enough to matter has the same token-length distribution), and shard
count scales with the cluster, not the data. The per-shard pass is an
applyInPandas kernel: genuinely stateful iteration is the documented
use for Python here (same policy as grouped PCA), and it touches only
(id, n_tokens) pairs — 16 bytes/row, never document bodies.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "shard INT, doc_id BIGINT, n_tokens BIGINT, bin_id BIGINT, bin_fill BIGINT"
)


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 128,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, bin_id) so that each bin's total
    token count never exceeds `budget` — except a single document
    larger than the budget, which gets a bin of its own (the caller
    truncates or splits those downstream).

    Greedy rule (deterministic, engine-independent): docs are packed in
    ascending id order within their shard; a doc opens a new bin iff
    adding it would overflow the current bin. bin_fill carries the
    running total so callers can compute padding waste without a
    re-aggregate.
    """

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_id, fill = 0, 0
        bins, fills = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > budget:
                bin_id += 1
                fill = 0
            fill += n
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = bins
        pdf["bin_fill"] = fills
        return pdf[["shard", "doc_id", "n_tokens", "bin_id", "bin_fill"]]

    # Shard on id modulo (engine-independent, so the DuckDB oracle can
    # restate it exactly). Swap in pmod(xxhash64(id), n) for clustered
    # id spaces — same plan, but hash families differ per engine so the
    # check degrades to rows-only.
    sized = df.select(
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
    )
    return sized.groupBy("shard").applyInPandas(_pack, _OUT_SCHEMA)
