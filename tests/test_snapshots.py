"""S18 snapshot tables: commit protocol, time travel, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from laser_hadoop_spark.sources import snapshots


@pytest.fixture()
def base(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 10).alias("v")
    )


def test_append_and_time_travel(spark, base):
    v1 = snapshots.write_snapshot(_df(spark, 0, 5), base)
    v2 = snapshots.write_snapshot(_df(spark, 5, 8), base)
    assert (v1, v2) == (1, 2)
    assert snapshots.read_snapshot(spark, base).count() == 8
    # pinned old version still reads exactly its own rows
    assert snapshots.read_snapshot(spark, base, version=1).count() == 5
    assert snapshots.snapshot_versions(base) == [1, 2]


def test_overwrite_is_logical_truncate(spark, base):
    snapshots.write_snapshot(_df(spark, 0, 5), base)
    snapshots.write_snapshot(_df(spark, 100, 102), base, mode="overwrite")
    latest = snapshots.read_snapshot(spark, base)
    assert sorted(r["id"] for r in latest.collect()) == [100, 101]
    # time travel across the overwrite still sees the old data
    assert snapshots.read_snapshot(spark, base, version=1).count() == 5


def test_uncommitted_data_is_invisible(spark, base):
    snapshots.write_snapshot(_df(spark, 0, 5), base)
    # simulate a crashed writer: data files landed, no manifest
    orphan = os.path.join(base, "data", "snap-deadbeef0000")
    _df(spark, 50, 60).write.parquet(orphan)
    assert snapshots.read_snapshot(spark, base).count() == 5
    # vacuum deletes the orphan landing directory
    out = snapshots.vacuum(base)
    assert out["removed_data_files"] > 0
    assert not os.path.exists(orphan)
    assert snapshots.read_snapshot(spark, base).count() == 5


def test_vacuum_retires_unreferenced_versions(spark, base):
    snapshots.write_snapshot(_df(spark, 0, 5), base)
    snapshots.write_snapshot(_df(spark, 0, 3), base, mode="overwrite")
    out = snapshots.vacuum(base, keep_versions=1)
    assert out["removed_manifests"] == 1
    assert snapshots.snapshot_versions(base) == [2]
    # v1's files are gone, v2 still fully readable
    assert snapshots.read_snapshot(spark, base).count() == 3
    with pytest.raises(FileNotFoundError):
        snapshots.read_snapshot(spark, base, version=1)


def test_vacuum_keeps_referenced_append_chain(spark, base):
    snapshots.write_snapshot(_df(spark, 0, 5), base)
    snapshots.write_snapshot(_df(spark, 5, 8), base)  # append: v2 refs v1 files
    out = snapshots.vacuum(base, keep_versions=1)
    # v1's manifest retired, but its FILES survive (v2 references them)
    assert out["removed_manifests"] == 1
    assert out["removed_data_files"] == 0
    assert snapshots.read_snapshot(spark, base).count() == 8


def test_schema_recorded_and_missing_version_raises(spark, base):
    with pytest.raises(FileNotFoundError):
        snapshots.read_snapshot(spark, base)
    snapshots.write_snapshot(_df(spark, 0, 2), base)
    with pytest.raises(FileNotFoundError):
        snapshots.read_snapshot(spark, base, version=9)
    man = snapshots._read_manifest(base, 1)
    names = [f["name"] for f in man["schema"]["fields"]]
    assert names == ["id", "v"]
