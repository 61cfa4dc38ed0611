"""Validation gates: the engine form of the reference's error-counter
system (SURVEY.md §1.2, §5).

The reference defines 30 typed error conditions
(MapReduceError.java:2-33), increments counters in mappers, and the
driver fails on the first nonzero counter
(LASERInputValidator.java:135-140; TRACEInputValidator.java:214-219)
plus numeric gates (individuals==0 at :147-150, sharedLoci<=100 at
:152-155).

Engine form: a constraint is (name, violation-count DataFrame expr);
``validate`` evaluates all constraints in ONE pass per input DataFrame
(single scan, conditional-count aggregation — the same shape as A2) and
returns a tidy violations DataFrame. ``gate`` raises on any violation,
reproducing the driver's fail-fast scan with readable messages.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Error catalogue: the 30 reference conditions (MapReduceError.java:2-33)
# consolidated into engine-form names. Mapping (reference enum -> engine):
#   SEQ/SITE/VCF_FILE_IS_NOT_GZIP        -> sources.readers sniffing assert (S7)
#   FILE_FORMAT_NOT_SUPPORTED            -> UNKNOWN_FORMAT
#   GROUPS_FILE_{TOO_MANY,MISSING}_COLUMNS -> GROUP_FILE_INVALID_ROW (!=2)
#   SEQ_FILE_{TOO_FEW,MISSING}_COLUMNS   -> SEQ_INVALID_ARITY (2+3k rule)
#   SEQ_FILE_INCONSISTENT_COLUMNS        -> SEQ_INCONSISTENT_ARITY
#   SEQ_SAMPLE_NOT_IN_GROUP              -> SEQ_SAMPLE_NOT_IN_GROUP
#   SITE_FILE_TOO_FEW_COLUMNS            -> SITE_ROW_TOO_SHORT
#   SITE_FILE_HEADER_NO_{CHR,POS,ID,REF,ALT} -> SITE_HEADER_INVALID
#                                          (per-column detail in message)
#   SITE_FILE_LOCI_NOT_IN_SEQ            -> SITE_COUNT_MISMATCH (J4 gate)
#   VCF_SAMPLE_NOT_IN_GROUP              -> VCF_SAMPLE_NOT_IN_GROUP
#   VCF_NO_HEADER / VCF_HEADER_NO_*      -> readers.read_vcf header check
#   VCF_HEADER_NO_SAMPLES                -> VCF_NO_SAMPLES
# Message templates mirror MapReduceError.java:35-69 in spirit.
ERROR_MESSAGES: dict[str, str] = {
    "GROUP_FILE_INVALID_ROW": "groups row does not have exactly 2 columns",
    "SEQ_SAMPLE_NOT_IN_GROUP": "seq sample id missing from groups map",
    "SEQ_INVALID_ARITY": "seq row field count is not 2 + 3*n_loci",
    "SEQ_INCONSISTENT_ARITY": "seq rows disagree on locus count",
    "SEQ_EMPTY": "study contains 0 individuals",
    "SITE_HEADER_INVALID": "site file header is not CHR POS ID REF ALT",
    "SITE_ROW_TOO_SHORT": "site row has fewer than 5 columns",
    "SITE_COUNT_MISMATCH": "site row count != seq locus arity",
    "VCF_SAMPLE_NOT_IN_GROUP": "vcf sample id missing from groups map",
    "VCF_NO_SAMPLES": "vcf declares zero sample columns",
    "VCF_INCONSISTENT_INDIVIDUALS": "vcf files disagree on individual count",
    "SHARED_LOCI_TOO_FEW": "shared loci with reference panel <= threshold",
    "UNKNOWN_FORMAT": "declared genotype format is not supported",
}

MIN_SHARED_LOCI = 100  # LASERInputValidator.java:152; TRACEInputValidator.java:235


class ValidationError(RuntimeError):
    """Raised by gate() — the engine analogue of WorkflowContext.error."""


@dataclass(frozen=True)
class Constraint:
    """One named violation predicate evaluated per row."""

    name: str
    violation: Column  # boolean expr: True == this row violates

    def counter(self) -> Column:
        return F.sum(self.violation.cast("long")).alias(self.name)


def validate(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate all constraints in one scan; tidy (error, n_violations).

    Same physical shape as the reference's counter increments (all
    conditions checked in the same map pass) but returned as data.
    """
    wide = df.agg(*[c.counter() for c in constraints])
    stack_args: list[Column] = []
    for c in constraints:
        stack_args.extend([F.lit(c.name), F.col(c.name)])
    return wide.select(
        F.stack(F.lit(len(constraints)), *stack_args).alias("error", "n_violations")
    )


def gate(violations: DataFrame, extra_context: str = "") -> None:
    """Fail on the first nonzero violation count with a typed message.

    Mirrors the driver's first-error scan (LASERInputValidator.java:135-140):
    the violations DataFrame is tiny (one row per constraint), so the
    collect is a metadata-sized action.
    """
    for row in violations.where(F.col("n_violations") > 0).collect():
        msg = ERROR_MESSAGES.get(row["error"], row["error"])
        raise ValidationError(
            f"{row['error']}: {msg} ({row['n_violations']} rows)"
            + (f" [{extra_context}]" if extra_context else "")
        )


# --- prebuilt constraint sets for the domain formats -------------------------


def groups_constraints() -> list[Constraint]:
    """Groups file: exactly 2 columns per row
    (LASERInputCheckMapper.java:84-93)."""
    return [
        Constraint("GROUP_FILE_INVALID_ROW", F.col("n_fields") != 2),
    ]


def seq_constraints() -> list[Constraint]:
    """Seq matrix: field count = 2 + 3k (LASERInputCheckMapper.java:124-134)."""
    return [
        Constraint(
            "SEQ_INVALID_ARITY",
            (F.col("n_fields") < 5) | ((F.col("n_fields") - 2) % 3 != 0),
        ),
    ]


def check_site_header(header_cols: list[str]) -> DataFrame | None:
    """Site header equality check (LASERInputCheckMapper.java:203-235).

    Driver-side (the header is one line); returns None if valid, else
    raises with the per-column mismatch the reference reports.
    """
    expected = ["CHR", "POS", "ID", "REF", "ALT"]
    got = [c.upper().lstrip("#") for c in header_cols[:5]]
    if len(header_cols) < 5:
        raise ValidationError(
            f"SITE_ROW_TOO_SHORT: {ERROR_MESSAGES['SITE_ROW_TOO_SHORT']}"
        )
    if got != expected:
        raise ValidationError(
            f"SITE_HEADER_INVALID: {ERROR_MESSAGES['SITE_HEADER_INVALID']} "
            f"(got {header_cols[:5]})"
        )
    return None


def membership_violations(
    df: DataFrame, groups: DataFrame, key: str = "sample_id", group_key: str = "sample_id"
) -> DataFrame:
    """J3 as a validation op: rows whose key is NOT in groups.

    Reference: SEQ_SAMPLE_NOT_IN_GROUP / VCF_SAMPLE_NOT_IN_GROUP
    (LASERInputCheckMapper.java:138-144; TRACEInputCheckMapper.java:170-176).
    groups is small -> broadcast anti join, no shuffle of the fact side.
    """
    g = F.broadcast(groups.select(F.col(group_key).alias(key)).distinct())
    return df.join(g, on=key, how="left_anti")


def arity_consistency_violations(df: DataFrame, arity_col: str = "n_fields") -> DataFrame:
    """A5 gate: all rows must agree on arity (TreeSet-cardinality==1,
    LASERInputCheckMapper.java:170-174). Returns the offending arities."""
    counts = df.groupBy(arity_col).agg(F.count("*").alias("n_rows"))
    total = counts.count()
    return counts.limit(0) if total <= 1 else counts


def scalar_consistency_check(
    left: DataFrame, left_expr: Column, right: DataFrame, right_expr: Column
) -> bool:
    """J4 gate: two datasets agree on one scalar
    (LASERInputCheckMapper.java:254-258)."""
    a = left.agg(left_expr.alias("v"))
    b = right.agg(right_expr.alias("v2"))
    row = a.crossJoin(b).select((F.col("v") == F.col("v2")).alias("ok")).collect()[0]
    return bool(row["ok"])


def observed_counters(
    df: DataFrame, constraints: list[Constraint]
) -> tuple[DataFrame, "Observation"]:
    """Attach violation counters to a pipeline WITHOUT a second pass.

    The exact Spark analogue of the reference's MapReduce counter
    channel (enum LASERInputValidator.java:21-26, incremented in
    mappers and read by the driver after one job): `df.observe`
    accumulates the counter expressions as a side channel of whatever
    action the RETURNED DataFrame runs — validation metrics cost zero
    extra scans, where `validate()` is a separate aggregation job.

    Usage:
        out, obs = observed_counters(df, seq_constraints())
        out.write.parquet(...)       # one pass: writes AND counts
        gate_observed(obs)           # driver-side counter scan
    """
    from pyspark.sql import Observation

    obs = Observation("validation_counters")
    counters = [c.counter().alias(c.name) for c in constraints]
    return df.observe(obs, *counters), obs


def gate_observed(obs: "Observation", timeout_s: float = 60.0) -> dict:
    """Driver-side gate on observed counters (the reference's first-
    nonzero-error scan, LASERInputValidator.java:135-140)."""
    metrics = obs.get  # blocks until the observed action completes
    bad = {k: v for k, v in metrics.items() if v}
    if bad:
        raise ValidationError(f"validation counters nonzero: {bad}")
    return metrics
