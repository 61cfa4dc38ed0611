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


def _dosage() -> F.Column:
    """ALT-allele dosage 0/1/2 from GT, NULL for missing — phased and
    unphased both count (the |-to-/ translate used across this module)."""
    gt = F.translate(F.col("gt"), "|", "/")
    return (
        F.when(gt == "0/0", 0)
        .when(gt.isin("0/1", "1/0"), 1)
        .when(gt == "1/1", 2)
        .otherwise(F.lit(None).cast("int"))
    )


def hardy_weinberg(vcf_long: DataFrame) -> DataFrame:
    """X325: Hardy-Weinberg equilibrium chi-square per variant
    (PLINK --hardy). Genotype counts nAA/nAa/naa per (chr, pos) give
    allele counts nA = 2nAA + nAa, na = 2naa + nAa; expected counts
    under HWE are nA^2/4n, nA*na/2n, na^2/4n. Each (O-E)^2/E term
    micro-rounds from exact integer counts (the engine's fixed-point
    discipline), chi2_micro is their integer sum. Monomorphic variants
    (nA or na zero) carry no test and are excluded, as PLINK does.
    Departure flags genotyping error or population structure — the
    standard pre-GWAS variant filter after call rate.
    """
    gt = F.translate(F.col("gt"), "|", "/")
    counts = vcf_long.groupBy("chr", "pos").agg(
        F.sum(F.when(gt == "0/0", 1).otherwise(0)).alias("naa_ref"),
        F.sum(F.when(gt.isin("0/1", "1/0"), 1).otherwise(0)).alias("nhet"),
        F.sum(F.when(gt == "1/1", 1).otherwise(0)).alias("nalt"),
    )
    n = F.col("naa_ref") + F.col("nhet") + F.col("nalt")
    na_ = 2 * F.col("naa_ref") + F.col("nhet")
    nb_ = 2 * F.col("nalt") + F.col("nhet")

    def term(obs: F.Column, exp: F.Column) -> F.Column:
        d = obs - exp
        return F.round(1000000.0 * d * d / exp).cast("bigint")

    e_aa = na_ * na_ / (4.0 * n)
    e_ab = na_ * nb_ / (2.0 * n)
    e_bb = nb_ * nb_ / (4.0 * n)
    return (
        counts.where((na_ > 0) & (nb_ > 0))
        .select(
            "chr",
            "pos",
            F.col("naa_ref").cast("bigint").alias("n_hom_ref"),
            F.col("nhet").cast("bigint").alias("n_het"),
            F.col("nalt").cast("bigint").alias("n_hom_alt"),
            F.expr(
                "CAST(10000 * LEAST(2 * naa_ref + nhet, 2 * nalt + nhet)"
                " DIV (2 * (naa_ref + nhet + nalt)) AS BIGINT)"
            ).alias("maf_bp"),
            (
                term(F.col("naa_ref"), e_aa)
                + term(F.col("nhet"), e_ab)
                + term(F.col("nalt"), e_bb)
            ).alias("hwe_chi2_micro"),
        )
    )


def ld_r2(vcf_long: DataFrame, *, max_dist: int = 100000) -> DataFrame:
    """X326: pairwise linkage-disequilibrium r^2 between nearby
    variants (PLINK --r2). Dosage vectors (0/1/2, missing dropped
    PAIRWISE — the standard convention) correlate exactly: with
    x,y <= 2 every moment sum is a small integer and
    r^2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)(n*Syy - Sy^2)) needs
    one float division, reported in bp. Pairs are windowed by
    position (same chr, 0 < pos_b - pos_a <= max_dist) — the
    banded-candidate discipline (X35) that keeps the quadratic stage
    bounded by the LD window, exactly as PLINK's --ld-window does.
    """
    d = vcf_long.select(
        "chr", "pos", "sample_id", _dosage().alias("g")
    ).where(F.col("g").isNotNull())
    a = d.alias("a")
    b = d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.chr") == F.col("b.chr"))
        & (F.col("a.sample_id") == F.col("b.sample_id"))
        & (F.col("b.pos") > F.col("a.pos"))
        & (F.col("b.pos") - F.col("a.pos") <= max_dist),
    ).select(
        F.col("a.chr").alias("chr"),
        F.col("a.pos").alias("pos_a"),
        F.col("b.pos").alias("pos_b"),
        F.col("a.g").alias("x"),
        F.col("b.g").alias("y"),
    )
    moms = pairs.groupBy("chr", "pos_a", "pos_b").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = n * F.col("sxy") - sx * sy
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    return moms.where((vx > 0) & (vy > 0)).select(
        "chr",
        "pos_a",
        "pos_b",
        n.cast("bigint").alias("n_pairs"),
        F.round(10000.0 * cov * cov / (vx.cast("double") * vy))
        .cast("bigint")
        .alias("r2_bp"),
    )


def maf_spectrum(vcf_long: DataFrame, *, n_bins: int = 10) -> DataFrame:
    """X327: folded minor-allele-frequency spectrum — the population-
    genetics summary whose shape diagnoses demography and callset
    artifacts (an excess of singletons/rare bins flags genotyping
    error). Per-variant MAF in bp from exact allele counts, binned
    into ``n_bins`` equal slices of [0, 50%]; integer bin key via
    truncating division, capped so MAF exactly 0.5 lands in the top
    bin.
    """
    gt = F.translate(F.col("gt"), "|", "/")
    counts = vcf_long.groupBy("chr", "pos").agg(
        F.sum(F.when(gt == "0/0", 2).when(gt.isin("0/1", "1/0"), 1).otherwise(0)).alias("na_"),
        F.sum(F.when(gt == "1/1", 2).when(gt.isin("0/1", "1/0"), 1).otherwise(0)).alias("nb_"),
    )
    tot = F.col("na_") + F.col("nb_")
    maf_bp = F.expr("CAST(10000 * LEAST(na_, nb_) DIV (na_ + nb_) AS BIGINT)")
    bin_w = 5000 // n_bins
    return (
        counts.where(tot > 0)
        .select(
            F.least(
                (maf_bp - maf_bp % bin_w) / bin_w, F.lit(n_bins - 1)
            )
            .cast("int")
            .alias("maf_bin"),
        )
        .groupBy("maf_bin")
        .agg(F.count("*").cast("bigint").alias("n_variants"))
        .orderBy("maf_bin")
    )


def ibs_kinship(vcf_long: DataFrame) -> DataFrame:
    """X328: pairwise identity-by-state similarity matrix (PLINK
    --genome's IBS component) — the relatedness screen run before any
    association study (cryptic duplicates/relatives inflate test
    statistics). For each sample pair, over variants where BOTH are
    called: mean of (2 - |gi - gj|) / 2, reported as exact
    ibs_bp = 10000 * Sum(2 - |gi-gj|) DIV (2 * n_shared). The
    sample-pair join is keyed on the variant (chr, pos) — the
    standard transpose-and-join; the quadratic stage is bounded by
    the cohort size, which is orders below the variant count.
    """
    d = vcf_long.select(
        "chr", "pos", "sample_id", _dosage().alias("g")
    ).where(F.col("g").isNotNull())
    a = d.alias("a")
    b = d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.chr") == F.col("b.chr"))
        & (F.col("a.pos") == F.col("b.pos"))
        & (F.col("a.sample_id") < F.col("b.sample_id")),
    ).select(
        F.col("a.sample_id").alias("s1"),
        F.col("b.sample_id").alias("s2"),
        (2 - F.abs(F.col("a.g") - F.col("b.g"))).alias("ibs"),
    )
    return pairs.groupBy("s1", "s2").agg(
        F.count("*").cast("bigint").alias("n_shared"),
        F.expr("CAST(10000 * SUM(ibs) DIV (2 * COUNT(*)) AS BIGINT)").alias(
            "ibs_bp"
        ),
    )
