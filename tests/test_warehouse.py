"""Bucketed-warehouse staleness guard (round-3 verdict item 2).

The bucketed table name folds a size+mtime fingerprint of the source
parquet (warehouse._source_fingerprint), so regenerating the parquet
under an sf_dir must yield a NEW bucketed table rather than silently
reusing stale bucketed data while the oracle reads the live files.
"""

from __future__ import annotations

import os

from laser_hadoop_spark import warehouse
from laser_hadoop_spark.tables import table


def _write_single_parquet(df, dest: str) -> None:
    """Write df as a single parquet FILE at dest (driver testdata layout)."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    try:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "p"))
        part = glob.glob(os.path.join(tmp, "p", "part-*.parquet"))[0]
        shutil.copyfile(part, dest)
    finally:
        shutil.rmtree(tmp)


def test_regenerated_source_invalidates_bucketed_table(spark, sf_dir, tmp_path):
    # stage a private sf_dir with real lineitem/orders
    staged = str(tmp_path / "sf")
    os.makedirs(staged)
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    _write_single_parquet(li, os.path.join(staged, "lineitem.parquet"))
    _write_single_parquet(o, os.path.join(staged, "orders.parquet"))

    names1 = warehouse.ensure_bucketed_facts(spark, staged, n_buckets=4)
    n_before = spark.table(names1["lineitem"]).count()
    assert n_before == li.count()

    # "regenerate" the source: half the rows, different size+mtime
    li_half = table(spark, staged, "lineitem").limit(n_before // 2)
    rows_half = li_half.count()
    _write_single_parquet(li_half, os.path.join(staged, "lineitem.parquet"))

    names2 = warehouse.ensure_bucketed_facts(spark, staged, n_buckets=4)
    try:
        # the fingerprinted name must change, and the bucketed table must
        # reflect the regenerated source, matching what an oracle reading
        # the live files would see
        assert names2["lineitem"] != names1["lineitem"]
        assert spark.table(names2["lineitem"]).count() == rows_half
        # idempotent re-ensure keeps the same (fresh) name
        names3 = warehouse.ensure_bucketed_facts(spark, staged, n_buckets=4)
        assert names3 == names2
    finally:
        for n in set(names1.values()) | set(names2.values()):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
