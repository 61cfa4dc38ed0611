"""Round-8 regression tests for the round-7 ADVICE items.

- q_jaro_blocked exercised WITH CONTENT at local scale (its sf0.001
  oracle green was vacuous: 0 rows on both engines, so a broken finer
  blocking key would also have passed);
- the vendored protobuf tree must not shadow sibling google.*
  distributions (vendor/ sits at the FRONT of sys.path).
"""

from __future__ import annotations

import subprocess
import sys
import textwrap


def test_jaro_blocked_finer_key_with_content(spark, tmp_path):
    """A fixture where the (brand, size) key provably matters: two
    near-identical names share brand+size (must pair), a third shares
    the brand and the name but NOT the size (the finer key must drop
    it — under q_jaro_pairs' coarse brand key it would survive), and
    the emitted score must equal DuckDB's independent jaro_similarity."""
    import duckdb

    from laser_hadoop_spark import registry

    rows = [
        (1, "almond antique blue royal", "Brand#11", 7),
        (2, "almond antique blue regal", "Brand#11", 7),  # pairs with 1
        (3, "almond antique blue royal", "Brand#11", 9),  # same name, other size
        (4, "midnight crimson keyless x", "Brand#11", 7),  # same block, dissimilar
    ]
    spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_size int"
    ).write.parquet(str(tmp_path / "part.parquet"))

    out = registry.get("q_jaro_blocked").fn(spark, str(tmp_path)).collect()
    assert [(r["k1"], r["k2"]) for r in out] == [(1, 2)]
    expected = duckdb.sql(
        "SELECT CAST(ROUND(1000000 * jaro_similarity("
        "'almond antique blue royal', 'almond antique blue regal')) AS BIGINT)"
    ).fetchone()[0]
    assert out[0]["jaro_micro"] == expected
    # sanity: the coarse brand key WOULD have kept (1,3) — the finer
    # key's exclusion above is doing real work, not vacuously passing
    coarse = registry.get("q_jaro_pairs").fn(spark, str(tmp_path)).collect()
    assert (1, 3) in [(r["k1"], r["k2"]) for r in coarse]


def test_vendored_protobuf_does_not_shadow_google_namespace(tmp_path):
    """vendor/google must be a pkgutil-style namespace package: with
    vendor/ first on sys.path AND another google.* distribution on the
    path, BOTH google.protobuf and the sibling package import."""
    other = tmp_path / "site"
    pkg = other / "google" / "fakecloud"
    pkg.mkdir(parents=True)
    (other / "google" / "__init__.py").write_text(
        "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n"
    )
    (pkg / "__init__.py").write_text("X = 42\n")
    code = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {str(other)!r})
        sys.path.insert(0, "/root/repo/vendor")
        import google.protobuf, google.fakecloud
        assert google.fakecloud.X == 42
        assert "vendor" in google.protobuf.__file__
        print("ok")
        """
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60
    )
    assert res.returncode == 0, res.stderr
    assert res.stdout.strip() == "ok"
