"""End-to-end pretraining-data pipeline (SURVEY.md §2.11 composition).

The full LLM analogue of the reference's multi-step workflow
(validate → chunk → batch → report, §3.1-3.3): one composed lazy plan
taking a raw documents table to training-ready chunks:

    1. curation       — exact dedup + quality + language filters
                        (plans/curation.curation_plan)
    2. decontamination — drop docs overlapping the benchmark split
                        (operators/dedup.contamination_overlap)
    3. mixture sampling — per-source quotas (operators/sampling)
    4. chunking       — sliding token windows (operators/text.token_chunks)
    5. token accounting — per-source chunk/token totals, the pipeline's
                        "counters" (observable via validation.observed_counters)

Scale shape: stage 1 shuffles 16-byte fingerprints once; stage 2
broadcasts the benchmark shingle-hash set; stage 3 is one window on the
source key; stage 4-5 are scan-local until the final tiny aggregate.
No stage keeps per-document state outside its shuffle partition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.dedup import contamination_overlap
from laser_hadoop_spark.operators.sampling import quota_sample
from laser_hadoop_spark.operators.text import token_chunks, token_count_ws
from laser_hadoop_spark.plans.curation import curation_plan


@dataclass
class PretrainResult:
    chunks: DataFrame = field(repr=False)
    source_stats: DataFrame = field(repr=False)


def pretrain_stage_prefixes(
    documents: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    max_benchmark_overlap: float = 0.2,
    docs_per_source: int = 20,
    chunk_size: int = 64,
    chunk_stride: int = 48,
    **curation_kwargs,
) -> dict[str, DataFrame]:
    """Ordered lazy prefixes of the pretrain pipeline, one per stage.

    The SINGLE source of the stage construction (ADVICE r9: the probe
    script hand-duplicated these slices): pretrain_plan is assembled
    from the last prefixes of THIS dict, so a per-stage probe and the
    registered pipeline are the same computation by construction. Keys:

    - ``p1_curation``      — curation_plan output (stage 1)
    - ``p2_decontaminate`` — after the benchmark-overlap anti-join
    - ``p3_quota_sample``  — after the per-source quota sample
    - ``p4_chunking``      — the chunk table (PretrainResult.chunks)
    - ``p5_source_stats``  — the accounting aggregate (.source_stats)
    """
    curated = curation_plan(
        documents, id_col=id_col, text_col=text_col, **curation_kwargs
    )
    contaminated = contamination_overlap(
        curated,
        benchmark,
        id_col=id_col,
        text_col=text_col,
        min_overlap=max_benchmark_overlap,
    ).select(id_col)
    clean = curated.join(contaminated, on=id_col, how="left_anti")
    sampled = quota_sample(
        clean, strata_col=source_col, n_per_stratum=docs_per_source, order_col=id_col
    )
    chunks = sampled.select(
        id_col,
        source_col,
        F.explode(
            token_chunks(text_col, size=chunk_size, stride=chunk_stride)
        ).alias("c"),
    ).select(
        id_col,
        source_col,
        F.col("c.chunk_start").alias("chunk_start"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
    stats = chunks.groupBy(source_col).agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum(token_count_ws("chunk_text")).alias("n_tokens"),
    )
    return {
        "p1_curation": curated,
        "p2_decontaminate": clean,
        "p3_quota_sample": sampled,
        "p4_chunking": chunks,
        "p5_source_stats": stats,
    }


def pretrain_plan(
    documents: DataFrame,
    benchmark: DataFrame,
    **kwargs,
) -> PretrainResult:
    """Compose curation → decontamination → sampling → chunking lazily.

    Returns the chunk table (one row per training chunk) and the
    per-source accounting aggregate; nothing executes until the caller
    acts. Benchmark docs must NOT appear in `documents`. Assembled
    from pretrain_stage_prefixes — one construction site, no drift.
    """
    stages = pretrain_stage_prefixes(documents, benchmark, **kwargs)
    return PretrainResult(
        chunks=stages["p4_chunking"], source_stats=stages["p5_source_stats"]
    )
