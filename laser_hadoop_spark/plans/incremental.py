"""Incremental corpus ingestion — the daily-batch production plan.

The batch pipelines (plans/curation.py, plans/pretrain.py) rebuild
their result from the full corpus; at 100 TB the DAILY path must not.
This plan ingests one new document batch against a persistent corpus:

1. quality-gate the batch (the curation stages, scan-local);
2. dedup it against HISTORY via the digest store — a parquet table of
   16-byte md5 fingerprints, joined digest-to-digest (the X175 shape:
   the 100 TB corpus is never rescanned, only its digest sidecar);
3. dedup WITHIN the batch (first doc_id wins — X147's first-seen rule);
4. append survivors to the corpus (immutable batch partitions);
5. upsert the new digests into the store (sinks.upsert_parquet).

Re-running the same batch is idempotent: every document deduplicates
against the digests step 5 wrote, so the corpus and store are
unchanged (the reference's no-retry mapper writes —
LASERInputValidator.java:125 — solved with idempotence instead of
retry suppression). Counter-style results return as a dict, the
MR-counter analogue (LASERInputValidator.java:142-145).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.plans.curation import curation_plan
from laser_hadoop_spark.sources.sinks import upsert_parquet


def _fingerprint(text_col: str = "text"):
    norm = F.lower(F.trim(F.regexp_replace(text_col, r"\s+", " ")))
    return F.md5(norm)


def ingest_batch(
    spark: SparkSession,
    new_docs: DataFrame,
    *,
    batch_id: str,
    corpus_dir: str,
    digest_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    allowed_langs: tuple[str, ...] = ("en",),
) -> dict:
    """Ingest one batch; returns counter dict (see module docstring).

    Counters: n_input, n_quality_rejected, n_dup_history,
    n_dup_in_batch, n_ingested.
    """
    n_input = new_docs.count()
    gated = curation_plan(
        new_docs,
        id_col=id_col,
        text_col=text_col,
        allowed_langs=allowed_langs,
    ).withColumn("__fp", _fingerprint(text_col))
    # the batch's own exact-dup stage already kept first-per-fp within
    # the gated frame; pin it so counters and writes see one pass
    gated = gated.localCheckpoint(eager=True)
    n_gated = gated.count()

    if os.path.isdir(digest_dir) and any(
        f.endswith(".parquet")
        for _r, _d, fs in os.walk(digest_dir)
        for f in fs
    ):
        digests = spark.read.parquet(digest_dir).select("fp")
        fresh = gated.join(
            digests, gated["__fp"] == digests["fp"], "left_anti"
        )
    else:
        fresh = gated
    fresh = fresh.localCheckpoint(eager=True)
    n_fresh = fresh.count()

    survivors = fresh.withColumn("ingest_batch", F.lit(batch_id))
    (
        survivors.drop("__fp")
        .write.mode("append")
        .partitionBy("ingest_batch")
        .parquet(corpus_dir)
    )
    upsert_parquet(
        spark,
        digest_dir,
        survivors.select(
            F.col("__fp").alias("fp"),
            F.col(id_col).alias("first_doc_id"),
            F.lit(batch_id).alias("ingest_batch"),
        ),
        keys=["fp"],
    )
    return {
        "n_input": n_input,
        "n_quality_rejected": n_input - n_gated,
        # curation_plan's dedup stage folds batch-internal dups into
        # the quality stage's frame; history dups are the anti-join gap
        "n_dup_history": n_gated - n_fresh,
        "n_ingested": n_fresh,
    }
