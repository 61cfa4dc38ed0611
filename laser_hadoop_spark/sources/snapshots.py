"""S18: manifest-committed snapshot tables (time travel + vacuum).

A minimal lakehouse-style table format over plain parquet, built on
the same commit-protocol idea as Delta/Iceberg (public designs): the
MANIFEST is the commit point. Writers first land immutable data files
under ``data/``, then publish a versioned manifest that lists every
live file; readers resolve a manifest (latest or a pinned version) and
read exactly those files. Consequences, all load-bearing at 100 TB:

- **Snapshot isolation**: a reader that resolved v7 keeps reading v7's
  file list even while a writer lands v8 — no torn reads, ever.
- **Crash safety**: data files without a manifest are invisible; a
  writer that dies mid-landing leaves garbage, not corruption. Commit
  is one atomic rename of a single small JSON file.
- **O(manifest) planning**: the read path never lists the data
  directory (object-store LIST at 100 TB is both slow and eventually
  consistent); the manifest carries file paths + row counts.
- **Time travel**: every append/overwrite is a new manifest; old
  versions stay readable until ``vacuum`` retires them.

The reference has a faint ancestor of this: job-descriptor JSON files
naming their input chunks (LASERInputValidator.java:158-182) — the
descriptor, not the directory state, defines the job's input. This
module generalizes that to a table abstraction.

Append-mode scalability note: an append commit reuses the previous
manifest's file list verbatim and adds the new files — cost is
O(live files), not O(data). Production formats segment the manifest
(Iceberg manifest lists) once file counts reach millions; the JSON
here is the single-segment special case, and ``compact_parquet``
(sinks.py) is the antidote to file-count growth.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _manifest_path(base_dir: str, version: int) -> str:
    return os.path.join(base_dir, _MANIFEST_DIR, f"v{version:06d}.json")


def snapshot_versions(base_dir: str) -> list[int]:
    """All committed versions, ascending. Uncommitted data is invisible."""
    mdir = os.path.join(base_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(base_dir: str, version: int) -> dict:
    with open(_manifest_path(base_dir, version)) as f:
        return json.load(f)


def write_snapshot(
    df: DataFrame,
    base_dir: str,
    *,
    mode: str = "append",
) -> int:
    """Commit ``df`` as a new snapshot version; returns the version.

    mode='append' keeps the previous version's files live and adds the
    new ones; mode='overwrite' starts the file list fresh (logical
    truncate — old files stay on disk for time travel until vacuum).

    Commit protocol: (1) write parquet to a unique uncommitted
    directory under data/ via Spark's committer, (2) enumerate the
    written files, (3) publish the manifest with os.replace (atomic on
    POSIX). A crash before (3) leaves an orphan directory that no
    reader ever sees and vacuum later deletes.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(os.path.join(base_dir, _MANIFEST_DIR), exist_ok=True)
    landing = os.path.join(
        base_dir, _DATA_DIR, f"snap-{uuid.uuid4().hex[:12]}"
    )
    df.write.mode("error").parquet(landing)
    new_files = sorted(
        os.path.join(landing, f)
        for f in os.listdir(landing)
        if f.endswith(".parquet")
    )
    versions = snapshot_versions(base_dir)
    prev = versions[-1] if versions else None
    live: list[str] = []
    if mode == "append" and prev is not None:
        live.extend(_read_manifest(base_dir, prev)["files"])
    live.extend(os.path.relpath(p, base_dir) for p in new_files)
    version = (prev + 1) if prev is not None else 1
    manifest = {
        "version": version,
        "mode": mode,
        "parent": prev,
        "committed_at": time.time(),
        "schema": df.schema.jsonValue(),
        "files": live,
        "n_files": len(live),
    }
    tmp = _manifest_path(base_dir, version) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(base_dir, version))
    return version


def read_snapshot(
    spark: SparkSession,
    base_dir: str,
    *,
    version: int | None = None,
) -> DataFrame:
    """Read a committed snapshot (latest when version is None).

    Loads exactly the manifest's file list — never a directory glob —
    so concurrent writers and uncommitted garbage are invisible, and
    planning cost is the manifest read, not an object-store LIST.
    """
    versions = snapshot_versions(base_dir)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots in {base_dir}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"snapshot v{version} not found in {base_dir}; have {versions}"
        )
    manifest = _read_manifest(base_dir, version)
    paths = [os.path.join(base_dir, p) for p in manifest["files"]]
    if not paths:
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(manifest["schema"])
        )
    return spark.read.parquet(*paths)


def vacuum(base_dir: str, *, keep_versions: int = 1) -> dict[str, int]:
    """Retire old manifests and delete data files nothing references.

    Keeps the newest ``keep_versions`` manifests; every data file not
    referenced by a KEPT manifest is deleted — including uncommitted
    landing directories from crashed writers. Returns counts. The
    safety property: a file is deleted only when no surviving manifest
    lists it, so every remaining version stays fully readable.
    """
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    versions = snapshot_versions(base_dir)
    keep = set(versions[-keep_versions:])
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_read_manifest(base_dir, v)["files"])
    removed_manifests = 0
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(base_dir, v))
            removed_manifests += 1
    removed_files = 0
    data_root = os.path.join(base_dir, _DATA_DIR)
    if os.path.isdir(data_root):
        for snap in os.listdir(data_root):
            snap_dir = os.path.join(data_root, snap)
            if not os.path.isdir(snap_dir):
                continue
            for name in os.listdir(snap_dir):
                rel = os.path.relpath(os.path.join(snap_dir, name), base_dir)
                if name.endswith(".parquet") and rel not in referenced:
                    os.remove(os.path.join(snap_dir, name))
                    removed_files += 1
            if not any(
                n.endswith(".parquet") for n in os.listdir(snap_dir)
            ):
                # only bookkeeping files (_SUCCESS, .crc) remain
                import shutil

                shutil.rmtree(snap_dir)
    return {
        "removed_manifests": removed_manifests,
        "removed_data_files": removed_files,
        "kept_versions": len(keep),
    }
