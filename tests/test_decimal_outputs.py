"""Corpus-wide ban on Decimal-typed OUTPUT columns (VERDICT_r07 items 2+3).

Round 7's only driver-red (`q_cvm_test`, X242) emitted a DECIMAL(38,0)
column: rows and schema matched but the value hash didn't, because the
driver's canonicalization of a Decimal cell differs between its Spark
fetch and its DuckDB-via-pandas fetch in a way the (then
Decimal->float) local harness was structurally blind to. The corpus
discipline for exact wide integers is VARCHAR emission (X133
q_cusum_changepoint, X174 q_higher_moments, X364 q_cholesky2, and now
X242); DECIMAL is fine INSIDE a query (overflow-safe accumulation) but
must never reach the output schema.

These tests enforce the ban mechanically:

1. `test_no_decimal_output_columns_corpus_wide` — plan-only analysis
   (``fn(spark, sf_dir).schema``; no job execution beyond what query
   construction itself needs) over every registered query.
2. `test_strict_harness_catches_decimal_divergence` — the round-8
   harness regression: a Decimal-vs-int (and Decimal-vs-string) value
   divergence must FAIL locally now that ``_canon`` is decimal-strict
   (it previously collapsed Decimal via ``float()``, erasing exactly
   the axis the driver distinguishes).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import types as T

from laser_hadoop_spark import registry

# Queries allowed to emit DecimalType output columns. Must stay empty
# unless a future entry carries driver-green evidence for its decimal
# column (none does; r07's only decimal emitter was driver-RED).
DECIMAL_OUTPUT_WHITELIST: set[str] = set()


def test_no_decimal_output_columns_corpus_wide(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    for name, spec in sorted(registry.specs().items()):
        schema = spec.fn(spark, sf_dir).schema
        bad = [f.name for f in schema.fields if isinstance(f.dataType, T.DecimalType)]
        if bad and name not in DECIMAL_OUTPUT_WHITELIST:
            offenders[name] = bad
    assert not offenders, (
        "Decimal-typed OUTPUT columns (cast to bigint when provably "
        f"< 2^63, else to string): {offenders}"
    )


def test_strict_harness_catches_decimal_divergence():
    """("d", digits) never equals ("i", n), ("f", x) or ("s", digits)."""
    from laser_hadoop_spark.testing import _canon

    d = _canon(Decimal("52189494461514"))
    assert d == ("d", "52189494461514")
    assert d != _canon(52189494461514)
    assert d != _canon(52189494461514.0)
    assert d != _canon("52189494461514")
    # scale-0 vs trailing-fraction spellings of the same number agree,
    # and non-integral decimals normalize away trailing zeros
    assert _canon(Decimal("42.00")) == ("d", "42")
    assert _canon(Decimal("1.50")) == ("d", "1.5")
    assert _canon(Decimal("1.50")) != _canon(1.5)
    # a Decimal inside a float-typed COLUMN still coerces to the float
    # axis (pandas column semantics, matching the driver)
    assert _canon(Decimal("2.5"), float_col=True) == ("f", 2.5)


def test_cvm_t_scaled_is_string_and_exact(spark):
    """Pin q_cvm_test's fixed-corpus value (VERDICT_r07 item 1).

    sf0.01 is the driver's scale; the exact statistic there is
    t_scaled = 52,189,494,461,514 (VERDICT_r07 "What's wrong" #1),
    now emitted as a string on both engines.
    """
    row = registry.get("q_cvm_test").fn(spark, "/root/testdata/sf0.01").collect()[0]
    assert isinstance(row["t_scaled"], str)
    assert row["t_scaled"] == "52189494461514"
