"""Unit/property tests for round-4f operators (X144-X151): the HLL
rolling-WAU accuracy gate and an adversarial pure-Python check of the
clamped-balance Lindley closed form (the oracle proves it on the
driver's events; this proves it on reset-heavy synthetic walks)."""

from __future__ import annotations

from laser_hadoop_spark.registry import get
from laser_hadoop_spark.testing import duckdb_connect  # noqa: F401  (parity with sibling test modules)


def test_wau_hll_within_5pct_of_exact(spark, sf_dir):
    """X151's contract: per-day HLL estimate within 5% of X87's exact
    sliding COUNT(DISTINCT), for every full window day."""
    exact = {
        r["window_day"]: r["wau"]
        for r in get("q_rolling_active_users").fn(spark, sf_dir).collect()
    }
    approx = {
        r["window_day"]: r["wau_approx"]
        for r in get("q_wau_hll").fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx), "window-day axes must agree"
    assert exact, "fixture must produce at least one full window"
    for day, n in exact.items():
        err = abs(approx[day] - n) / n
        assert err <= 0.05, f"{day}: exact={n} approx={approx[day]} err={err:.3f}"


def _lindley_reference(deltas: list[int]) -> list[int]:
    """The definitional fold: b_t = max(0, b_{t-1} + d_t)."""
    b, out = 0, []
    for d in deltas:
        b = max(0, b + d)
        out.append(b)
    return out


def test_clamped_balance_closed_form_on_adversarial_walks(spark):
    """The two-window closed form b_t = cum_t - min(0, min_prefix(cum))
    must equal the sequential fold on walks engineered to clamp often:
    deep dives below zero, exact touches of zero, long recoveries,
    and an all-negative walk that pins the balance at 0 throughout."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    walks = {
        1: [-5, -7, 3, 10, -100, 4, 4, -8, 50, -50, -1, 2],
        2: [10, -10, -10, 10, 0, -1, 1, -1, 1],
        3: [-1] * 20,
        4: [1000, -1, -999, -1, 7, -3, -4, 9],
    }
    rows = [
        (uid, i, d) for uid, ds in walks.items() for i, d in enumerate(ds)
    ]
    df = spark.createDataFrame(rows, ["user_id", "rn", "delta"]).repartition(5)
    w = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("delta").over(w)
    got_df = df.select(
        "user_id",
        "rn",
        (cum - F.least(F.lit(0), F.min(cum).over(w))).alias("b"),
    ).toPandas()
    got = {
        uid: list(g.sort_values("rn")["b"])
        for uid, g in got_df.groupby("user_id")
    }
    for uid, ds in walks.items():
        assert got[uid] == _lindley_reference(ds), f"walk {uid} diverges"
    assert isinstance(got_df, pd.DataFrame)


def test_ordered_weighted_quantile_against_python_reference(spark):
    """Histogram pruning must agree with the definitional sorted walk
    for medians and other num/den quantiles, including all-equal
    values (one bucket), single-row inputs, and weight mass
    concentrated on the bucket boundary value."""
    from laser_hadoop_spark.operators.cumulative import ordered_weighted_quantile

    cases = [
        ([(10, 1)] * 9, 1, 2),
        ([(4096, 5), (4095, 5)], 1, 2),  # straddles a bucket boundary
        ([(1, 1)], 1, 2),
        ([(v, (v % 7) + 1) for v in range(0, 20000, 13)], 1, 2),
        ([(v, (v % 7) + 1) for v in range(0, 20000, 13)], 3, 4),
        ([(v, 1) for v in range(100)], 1, 100),
    ]
    for rows, num, den in cases:
        df = spark.createDataFrame(rows, ["v", "w"]).repartition(4)
        got = ordered_weighted_quantile(
            df, value_col="v", weight_col="w", num=num, den=den
        ).collect()[0]
        tot = sum(w for _, w in rows)
        cw, expect = 0, None
        for v, w in sorted(rows):
            cw += w
            if den * cw >= num * tot:
                expect = v
                break
        assert (got["quantile_value"], got["total_weight"]) == (expect, tot), (
            rows[:3],
            num,
            den,
        )


def test_ordered_quantiles_multi_point_reference(spark):
    """Multi-quantile pruning must agree with the definitional sorted
    walk at every fraction, weighted and unweighted, including
    fractions whose crossing points share one bucket and fractions in
    distinct buckets."""
    from laser_hadoop_spark.operators.cumulative import ordered_quantiles

    rows = [(v, (v % 5) + 1) for v in range(0, 30000, 7)]
    fracs = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]
    for weighted in (True, False):
        df = spark.createDataFrame(rows, ["v", "w"]).repartition(6)
        got = {
            (r["q_num"], r["q_den"]): (r["quantile_value"], r["total_weight"])
            for r in ordered_quantiles(
                df,
                value_col="v",
                quantiles=fracs,
                weight_col="w" if weighted else None,
            ).collect()
        }
        tot = sum((w if weighted else 1) for _, w in rows)
        for num, den in fracs:
            cw, expect = 0, None
            for v, w in sorted(rows):
                cw += w if weighted else 1
                if den * cw >= num * tot:
                    expect = v
                    break
            assert got[(num, den)] == (expect, tot), (num, den, weighted)
