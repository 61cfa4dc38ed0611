"""Incremental corpus ingestion — the daily-batch production plan.

The batch pipelines (plans/curation.py, plans/pretrain.py) rebuild
their result from the full corpus; at 100 TB the DAILY path must not.
This plan ingests one new document batch against a persistent corpus:

1. quality-gate the batch (the curation stages, scan-local);
2. dedup WITHIN the batch (first doc_id wins — X147's first-seen rule);
3. dedup against HISTORY via the digest store — a parquet table of
   16-byte md5 fingerprints, joined digest-to-digest (the X175 shape:
   the 100 TB corpus is never rescanned, only its digest sidecar);
4. overwrite the batch's OWN corpus partition (dynamic partition
   overwrite — not append, see below);
5. upsert the new digests into the store (sinks.upsert_parquet —
   atomic tmp+rename swap).

Crash-idempotence (the engine's answer to the reference's retry
suppression, ``mapred.map.max.attempts=1`` at
``LASERInputValidator.java:125``): the corpus write lands FIRST as a
dynamic overwrite of the ``ingest_batch=<id>`` partition, the digest
upsert SECOND as an atomic swap. A retry after a crash at any
boundary converges: before the corpus commit, the retry rewrites the
partition from scratch; between the two writes, the retry overwrites
the partition with identical content (no duplicates — overwrite, not
append) and then lands the digests; after both, every document
deduplicates against the store and the empty survivor set touches
neither table. Counter-style results return as a dict, the MR-counter
analogue (``LASERInputValidator.java:142-145``).

Scale note: sinks.upsert_parquet rewrites the whole digest store per
batch — the atomic-swap merge primitive, right for the modest store
sizes this engine tests and WRONG at corpus-cardinality; production
would partition the store by fingerprint prefix and merge only the
touched partitions (upsert_parquet's own docstring makes the same
point for fact-scale mutation). The plan's join/gate structure is
unchanged by that swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.dedup import normalized_fingerprint
from laser_hadoop_spark.plans.curation import curation_plan
from laser_hadoop_spark.sources.sinks import has_parquet_files, upsert_parquet


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

    Counters: n_input, n_quality_rejected, n_dup_in_batch,
    n_dup_history, n_ingested.
    """
    n_input = new_docs.count()
    # quality only — dedup is handled explicitly below so the
    # in-batch-duplicate and quality-reject counters stay separate
    gated = curation_plan(
        new_docs,
        id_col=id_col,
        text_col=text_col,
        allowed_langs=allowed_langs,
        dedup_strategy="none",
    ).withColumn("__fp", normalized_fingerprint(text_col))
    gated = gated.localCheckpoint(eager=True)
    n_gated = gated.count()

    first = gated.groupBy("__fp").agg(F.min(id_col).alias("__first_id"))
    in_batch = (
        gated.join(first, "__fp")
        .where(F.col(id_col) == F.col("__first_id"))
        .drop("__first_id")
    )
    in_batch = in_batch.localCheckpoint(eager=True)
    n_unique = in_batch.count()

    if has_parquet_files(digest_dir):
        digests = spark.read.parquet(digest_dir).select("fp")
        fresh = in_batch.join(
            digests, in_batch["__fp"] == digests["fp"], "left_anti"
        )
    else:
        fresh = in_batch
    fresh = fresh.localCheckpoint(eager=True)
    n_fresh = fresh.count()

    survivors = fresh.withColumn("ingest_batch", F.lit(batch_id))
    # dynamic overwrite of THIS batch's partition: a retry replaces its
    # own partition instead of appending duplicates (idempotence
    # contract above); other batches' partitions are untouched. The
    # mode is a WRITER option, not a session conf — a session-level
    # set would silently change overwrite semantics for every later
    # partitioned write in the same session (round-4 advice).
    (
        survivors.drop("__fp")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
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
        "n_dup_in_batch": n_gated - n_unique,
        "n_dup_history": n_unique - n_fresh,
        "n_ingested": n_fresh,
    }
