"""End-to-end pipelines: the reference's three workflow entry points
re-expressed as composed DataFrame plans (SURVEY.md §3).

Where the reference hand-rolls an IR of JSON job-descriptor files
between MR jobs (LASERInputValidator.java:103-111,158-182), here each
"step" is a DataFrame the next step consumes — the logical plan IS the
descriptor. Phase gates (fail-fast validation) remain explicit driver
actions on tiny aggregates, reproducing the reference's early-exit
behavior (§4: Catalyst won't short-circuit, so we gate phases).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.operators import validation as V
from laser_hadoop_spark.operators.chunking import (
    assign_chunks,
    chunk_counts,
    range_batches,
)
from laser_hadoop_spark.sources import readers


@dataclass
class LaserValidationResult:
    """The counters the LASER driver reads back
    (LASERInputValidator.java:142-155)."""

    individuals: int
    total_sites: int
    shared_sites: int
    n_chunks: int
    chunked_seq: DataFrame = field(repr=False)
    chunk_stats: DataFrame = field(repr=False)


def laser_validate_and_chunk(
    spark: SparkSession,
    *,
    seq_path: str,
    site_path: str,
    groups_path: str,
    reference_site_path: str,
    chunk_size: int = 100,
    min_shared_loci: int = V.MIN_SHARED_LOCI,
) -> LaserValidationResult:
    """Entry point 1 (LASERInputValidator.run, §3.1), Spark-first.

    validate groups/seq/site -> membership check -> chunk assignment ->
    shared-loci broadcast join count -> gates. One pass per input; the
    reference runs the same stages sequentially inside a single map task
    (LASERInputCheckMapper.java:272-302).
    """
    groups = readers.read_groups(spark, groups_path)
    V.gate(V.validate(groups, V.groups_constraints()), "groups")

    seq = readers.read_seq(spark, seq_path).cache()
    try:
        V.gate(V.validate(seq, V.seq_constraints()), "seq")

        # SEQ_INCONSISTENT_ARITY: all rows agree on locus count (A5 gate)
        arities = V.arity_consistency_violations(seq)
        if arities.count() > 0:
            raise V.ValidationError(
                "SEQ_INCONSISTENT_ARITY: "
                + V.ERROR_MESSAGES["SEQ_INCONSISTENT_ARITY"]
            )

        # SEQ_SAMPLE_NOT_IN_GROUP (J3 broadcast anti join)
        missing = V.membership_violations(
            seq.select(F.col("ind_id").alias("sample_id")), groups
        )
        n_missing = missing.count()
        if n_missing:
            raise V.ValidationError(
                f"SEQ_SAMPLE_NOT_IN_GROUP: {n_missing} samples not in groups"
            )

        individuals = seq.count()
        if individuals == 0:  # LASERInputValidator.java:147-150
            raise V.ValidationError("SEQ_EMPTY: " + V.ERROR_MESSAGES["SEQ_EMPTY"])

        site = readers.read_site(spark, site_path)
        ref_site = readers.read_site(spark, reference_site_path)

        # J4: site rows == seq locus arity
        if not V.scalar_consistency_check(
            site, F.count("*"), seq, F.min(F.size("loci")).cast("long")
        ):
            raise V.ValidationError(
                "SITE_COUNT_MISMATCH: " + V.ERROR_MESSAGES["SITE_COUNT_MISMATCH"]
            )

        # J1+A2: shared-loci count — broadcast join on (chr,pos) with the
        # case-folded allele residual (LASERInputCheckMapper.java:239-251)
        counts = (
            site.alias("s")
            .join(
                F.broadcast(ref_site.alias("r")),
                on=["chr", "pos"],
                how="left",
            )
            .agg(
                F.count("*").alias("total_sites"),
                F.sum(
                    F.when(
                        (F.lower(F.col("s.ref")) == F.lower(F.col("r.ref")))
                        & (F.lower(F.col("s.alt")) == F.lower(F.col("r.alt"))),
                        1,
                    ).otherwise(0)
                ).alias("shared_sites"),
            )
            .collect()[0]
        )
        total_sites, shared_sites = counts["total_sites"], int(counts["shared_sites"])
        if shared_sites <= min_shared_loci:  # LASERInputValidator.java:152-155
            raise V.ValidationError(
                f"SHARED_LOCI_TOO_FEW: {shared_sites} <= {min_shared_loci}"
            )

        # W1: chunk assignment (deterministic by ind_id)
        chunked = assign_chunks(seq, "ind_id", chunk_size)
        stats = chunk_counts(chunked)
        n_chunks = stats.count()
        return LaserValidationResult(
            individuals=individuals,
            total_sites=total_sites,
            shared_sites=shared_sites,
            n_chunks=n_chunks,
            chunked_seq=chunked,
            chunk_stats=stats,
        )
    finally:
        seq.unpersist()


@dataclass
class TraceValidationResult:
    individuals: int
    total_loci: int
    shared_loci: int
    fmt: str

    def metadata(self) -> dict:
        """The study-meta JSON payload (TRACEInputValidator.java:240-247)."""
        return {
            "Individuals": self.individuals,
            "Total loci": self.total_loci,
            "Shared loci": self.shared_loci,
            "Format": self.fmt,
        }


def trace_validate(
    spark: SparkSession,
    *,
    vcf_paths: list[str],
    groups_path: str,
    reference_site_path: str,
    fmt: str = "vcf",
    min_shared_loci: int = V.MIN_SHARED_LOCI,
) -> TraceValidationResult:
    """Entry point 2 (TRACEInputValidator.run, §3.2), Spark-first.

    Per-file VCF validation (format dispatch S8), union (SO1), grouped
    per-batch counters merged with a distinct-consistency check
    (TRACEInputValidator.java:221-233), shared-loci gate.
    """
    if fmt in readers.UNSUPPORTED_FORMATS or fmt != "vcf":
        # UNKNOWN_FORMAT / unimplemented dispatch, reference parity
        readers.read_dispatch(spark, fmt, vcf_paths[0])
    groups = readers.read_groups(spark, groups_path)
    V.gate(V.validate(groups, V.groups_constraints()), "groups")

    per_file = []
    for i, path in enumerate(vcf_paths):
        vcf = readers.read_vcf(spark, path, melt=True)
        per_file.append(vcf.withColumn("batch", F.lit(i)))
    study = per_file[0]
    for other in per_file[1:]:
        study = study.unionByName(other)
    study = study.cache()
    try:
        # per-batch individual counts + cross-file consistency (A3/A5)
        batch_counts = study.groupBy("batch").agg(
            F.countDistinct("sample_id").alias("individuals")
        )
        distinct_counts = [r["individuals"] for r in batch_counts.collect()]
        if not distinct_counts or min(distinct_counts) == 0:
            raise V.ValidationError(
                "VCF_NO_SAMPLES: " + V.ERROR_MESSAGES["VCF_NO_SAMPLES"]
            )
        if len(set(distinct_counts)) > 1:  # TRACEInputValidator.java:230-233
            raise V.ValidationError(
                "VCF_INCONSISTENT_INDIVIDUALS: "
                + V.ERROR_MESSAGES["VCF_INCONSISTENT_INDIVIDUALS"]
            )
        individuals = distinct_counts[0]

        missing = V.membership_violations(study.select("sample_id").distinct(), groups)
        if missing.count():
            raise V.ValidationError(
                "VCF_SAMPLE_NOT_IN_GROUP: "
                + V.ERROR_MESSAGES["VCF_SAMPLE_NOT_IN_GROUP"]
            )

        ref_site = readers.read_site(spark, reference_site_path)
        loci = study.select("chr", "pos", "ref", "alt").distinct()
        counts = (
            loci.alias("s")
            .join(F.broadcast(ref_site.alias("r")), on=["chr", "pos"], how="left")
            .agg(
                F.count("*").alias("total"),
                F.sum(
                    F.when(
                        (F.lower(F.col("s.ref")) == F.lower(F.col("r.ref")))
                        & (F.lower(F.col("s.alt")) == F.lower(F.col("r.alt"))),
                        1,
                    ).otherwise(0)
                ).alias("shared"),
            )
            .collect()[0]
        )
        total_loci, shared_loci = counts["total"], int(counts["shared"])
        if shared_loci <= min_shared_loci:
            raise V.ValidationError(
                f"SHARED_LOCI_TOO_FEW: {shared_loci} <= {min_shared_loci}"
            )
        return TraceValidationResult(individuals, total_loci, shared_loci, fmt)
    finally:
        study.unpersist()


def trace_job_descriptors(
    spark: SparkSession,
    *,
    n_individuals: int,
    batch_size: int,
    reference: str,
    study_vcf: str,
    reference_pc: str,
    dim: int = 4,
    dim_high: int = 20,
) -> DataFrame:
    """Entry point 3 (TRACEJobGenerator.run, §3.3): paired vcf2geno +
    study-PCA descriptors per [start,end] batch
    (TRACEJobGenerator.java:52-93) — as a DataFrame, not driver loops.
    """
    base = spark.range(n_individuals).toDF("i")
    batches = range_batches(base, batch_size)
    vcf2geno = batches.select(
        "batch_id",
        F.lit("vcf2geno").alias("kind"),
        F.to_json(
            F.struct(
                F.col("batch_id").alias("batch"),
                F.col("start_ind").alias("start"),
                F.col("end_ind").alias("end"),
                F.lit(reference).alias("reference"),
                F.lit(study_vcf).alias("study_vcf"),
            )
        ).alias("payload"),
        "start_ind",
        "end_ind",
    )
    study_pca = batches.select(
        "batch_id",
        F.lit("study_pca").alias("kind"),
        F.to_json(
            F.struct(
                F.col("batch_id").alias("batch"),
                F.col("start_ind").alias("start"),
                F.col("end_ind").alias("end"),
                F.lit(reference).alias("reference"),
                F.lit(reference_pc).alias("reference_pc"),
                F.lit(dim).alias("dim"),
                F.lit(dim_high).alias("dim_high"),
            )
        ).alias("payload"),
        "start_ind",
        "end_ind",
    )
    return vcf2geno.unionByName(study_pca)
