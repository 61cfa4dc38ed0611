"""Genetics QC operators over the melted VCF relation (S3 read_vcf).

The reference (statgen/LASER-Hadoop) is a population-genetics engine:
its validators count genotypes and gate on consistency
(LASERInputValidator.java:135-155, TRACEInputValidator.java:221-233)
but never compute the standard variant-QC statistics a geneticist runs
FIRST on any callset. These are that trio — the bcftools-stats /
PLINK --hardy surface, expressed as Spark aggregates over the long
(variant x sample) relation S3 produces:

- Ts/Tv ratio: transitions (A<->G, C<->T purine/pyrimidine-preserving
  substitutions) vs transversions. Random errors push the ratio toward
  0.5 (there are 2x more possible transversions); real human callsets
  sit ~2.0-2.1 genome-wide — THE first-glance callset sanity number.
- het/hom census per sample: heterozygosity far off cohort norms flags
  contamination or inbreeding; the missing-call count flags bad DNA.
- per-variant call rate: variants genotyped in too few samples get
  filtered before any association test.

All three are conditional-count aggregates: scan-local genotype
classification (pure codegen string equality), one shuffle each, exact
integers with bp/milli ratios by truncating division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRANSITIONS = [("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")]


def tstv_census(vcf_long: DataFrame) -> DataFrame:
    """Transition/transversion census over distinct biallelic SNPs.

    Input: the melted VCF relation (one row per variant x sample); the
    variant set is recovered by the (chr, pos, ref, alt) distinct —
    cheap map-side because every sample row of a variant carries the
    same key. Only single-base A/C/G/T ref AND alt qualify (indels and
    multiallelics are excluded, as in bcftools stats). Returns one row:
    n_snps, n_ts, n_tv, tstv_milli = 1000 * ts / tv.
    """
    variants = (
        vcf_long.select("chr", "pos", "ref", "alt")
        .where(
            F.col("ref").isin("A", "C", "G", "T")
            & F.col("alt").isin("A", "C", "G", "T")
            & (F.col("ref") != F.col("alt"))
        )
        .distinct()
    )
    is_ts = F.lit(False)
    for r, a in _TRANSITIONS:
        is_ts = is_ts | ((F.col("ref") == r) & (F.col("alt") == a))
    return variants.agg(
        F.count("*").cast("bigint").alias("n_snps"),
        F.sum(F.when(is_ts, 1).otherwise(0)).cast("bigint").alias("n_ts"),
        F.sum(F.when(is_ts, 0).otherwise(1)).cast("bigint").alias("n_tv"),
        F.expr(
            "CAST(1000 * SUM(CASE WHEN ref IN ('A','G') AND alt IN ('A','G')"
            " OR ref IN ('C','T') AND alt IN ('C','T') THEN 1 ELSE 0 END)"
            " DIV SUM(CASE WHEN ref IN ('A','G') AND alt IN ('A','G')"
            " OR ref IN ('C','T') AND alt IN ('C','T') THEN 0 ELSE 1 END)"
            " AS BIGINT)"
        ).alias("tstv_milli"),
    )


def het_hom_census(vcf_long: DataFrame) -> DataFrame:
    """Per-sample genotype census: hom-ref / het / hom-alt / missing
    counts plus het_hom_milli = 1000 * het / hom_alt (PLINK's --het
    flavor of the ratio). Unphased and phased separators both count
    ('0/1' and '0|1'); anything with a '.' is missing.
    """
    gt = F.translate(F.col("gt"), "|", "/")
    return (
        vcf_long.groupBy("sample_id")
        .agg(
            F.sum(F.when(gt == "0/0", 1).otherwise(0)).cast("bigint").alias("n_hom_ref"),
            F.sum(F.when(gt.isin("0/1", "1/0"), 1).otherwise(0)).cast("bigint").alias("n_het"),
            F.sum(F.when(gt == "1/1", 1).otherwise(0)).cast("bigint").alias("n_hom_alt"),
            F.sum(F.when(gt.contains("."), 1).otherwise(0)).cast("bigint").alias("n_missing"),
        )
        .withColumn(
            "het_hom_milli",
            F.when(
                F.col("n_hom_alt") > 0,
                F.expr("CAST(1000 * n_het DIV n_hom_alt AS BIGINT)"),
            ).otherwise(F.lit(None).cast("bigint")),
        )
    )


def call_rate(vcf_long: DataFrame, *, min_call_bp: int = 9000) -> DataFrame:
    """Per-variant call rate with a pass/fail gate.

    call_rate_bp = 10000 * called / total per (chr, pos); variants
    under ``min_call_bp`` (default 90%) are the standard pre-association
    exclusion set. One shuffle on the variant key, map-side combining.
    """
    called = F.when(F.col("gt").contains("."), 0).otherwise(1)
    return (
        vcf_long.groupBy("chr", "pos")
        .agg(
            F.count("*").cast("bigint").alias("n_samples"),
            F.sum(called).cast("bigint").alias("n_called"),
        )
        .withColumn(
            "call_rate_bp",
            F.expr("CAST(10000 * n_called DIV n_samples AS BIGINT)"),
        )
        .withColumn("passes", F.col("call_rate_bp") >= min_call_bp)
    )
