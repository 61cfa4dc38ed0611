"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) for the
reference's gzip seq format.

The reference schedules exactly one map task per (non-splittable) gzip
seq file and parses lines imperatively
(LASERInputValidator.java:114-126 one-file-one-task;
LASERInputCheckMapper.java:105-136 the `[\\t ]` split + 2-ID/3-per-locus
layout). `read_seq` (readers.py:78) already expresses that parse
declaratively over `spark.read.text`; this module exposes the SAME
relation through Spark 4's Python DataSource API instead, making the
format a first-class `spark.read.format("laser_seq")` source:

- `partitions()` returns one InputPartition per FILE — the honest unit
  of parallelism for gzip (not splittable), and exactly the
  reference's scheduling model, now stated to Spark's planner instead
  of hand-rolled.
- `read(partition)` streams one file line-by-line (gzip or plain,
  sniffed by magic bytes, like the reference which reads the bytes it
  is handed) and yields typed rows; memory is O(line), never O(file).
- Schema matches read_seq: (pop_id, ind_id, loci
  array<struct<v1,v2,v3>>, n_fields) — arity violations surface via
  n_fields for the validation gate rather than failing the scan.

At 100 TB the file-per-partition model is the scan's real shape for
gzip inlets: parallelism = file count, so the ingest contract is "many
medium gz files" (the chunked gzip SINK, sinks.py:28, produces exactly
that). For splittable needs, land to parquet first (S14).

Usage:
    from laser_hadoop_spark.sources.pydatasource import register
    register(spark)
    df = spark.read.format("laser_seq").load("/data/seq/*.gz")
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SEQ_SCHEMA = (
    "pop_id string, ind_id string, "
    "loci array<struct<v1: double, v2: double, v3: double>>, "
    "n_fields int"
)


class _SeqFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _open_maybe_gzip(path: str) -> io.TextIOBase:
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8")
    return open(path, encoding="utf-8")


def _parse_line(line: str):
    """LASERInputCheckMapper.java:105-136: split on tab-or-space; fields
    0-1 are pop/ind ids, then 3 doubles per locus. Non-numeric values
    become None inside the struct (permissive, like the text-parsing
    model ANSI-off Spark casts give read_seq)."""
    import re

    fields = re.split(r"[\t ]", line.rstrip("\n"))  # Spark split("[\t ]") semantics
    n = len(fields)
    if n < 5:
        loci = []
    else:
        def num(s: str):
            try:
                return float(s)
            except ValueError:
                return None

        loci = [
            (num(fields[i]), num(fields[i + 1]), num(fields[i + 2]))
            for i in range(2, n - 2, 3)
        ]
    return (
        fields[0] if n >= 1 else None,
        fields[1] if n >= 2 else None,
        loci,
        n,
    )


class LaserSeqReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("laser_seq requires a path (load(<glob>))")
        self._paths = sorted(_glob.glob(path)) or [path]

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per file: gzip is not splittable, and this is
        # the reference's one-task-per-batch-file scheduling expressed
        # through the planner instead of hand-rolled job setup
        return [_SeqFilePartition(p) for p in self._paths]

    def read(self, partition: _SeqFilePartition) -> Iterator[tuple]:
        with _open_maybe_gzip(partition.path) as f:
            for line in f:
                # blank lines are EMITTED (pop_id='', n_fields=1), not
                # skipped — exact relation parity with read_seq, whose
                # spark.read.text produces a row per blank line too
                yield _parse_line(line)


class LaserSeqStreamReader(SimpleDataSourceStreamReader):
    """Streaming drop-dir ingest of seq files with exactly-once offsets.

    The reference's ingest loop polls an SFTP landing directory and
    consumes whole files (SURVEY §2.1 S6/S13); this is that contract as
    a Structured Streaming SOURCE. The offset is the NAME of the last
    consumed file (the lexicographic high-water mark), not a positional
    count: a batch consumes exactly the files strictly greater than the
    checkpointed name, so a file landing with an earlier name than the
    mark can never SHIFT the slice (the positional scheme silently
    skipped one file and double-read another on replay — round-8 fix).
    Late earlier-named files are deterministically ignored instead; the
    drop-dir contract is monotone file names (timestamp/sequence
    prefixes — the convention every landing zone already follows; the
    chunked gzip sink's part-numbered output satisfies it).
    `readBetweenOffsets` replays the exact (start, end] name interval
    after restart, giving exactly-once delivery from a plain directory
    with no side database.
    """

    def __init__(self, options: dict):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("laser_seq streaming requires a path (directory)")

    def _files(self) -> list[str]:
        import os

        return sorted(
            f for f in os.listdir(self._dir) if not f.startswith(("_", "."))
        )

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _rows(self, names: list[str]) -> list[tuple]:
        # materialized (not a generator): the simple-stream contract
        # pickles the batch for replay-on-failure; SimpleDataSourceStreamReader
        # reads on the driver by design, sized for control-plane-rate
        # sources (file drops), not firehoses
        import os

        out: list[tuple] = []
        for name in names:
            with _open_maybe_gzip(os.path.join(self._dir, name)) as f:
                out.extend(_parse_line(line) for line in f)
        return out

    def read(self, start: dict):
        new = [n for n in self._files() if n > start["last"]]
        end = {"last": new[-1]} if new else dict(start)
        # a LIST iterator: the runner advances it (iterator contract)
        # AND pickles it into the prefetch cache (generators can't)
        return iter(self._rows(new)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        names = [n for n in self._files() if start["last"] < n <= end["last"]]
        return iter(self._rows(names))


class LaserSeqDataSource(DataSource):
    """spark.read.format("laser_seq") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "laser_seq"

    def schema(self) -> str:
        return SEQ_SCHEMA

    def reader(self, schema) -> LaserSeqReader:
        return LaserSeqReader(self.options)

    def simpleStreamReader(self, schema) -> LaserSeqStreamReader:
        return LaserSeqStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the laser_seq format on this session."""
    spark.dataSource.register(LaserSeqDataSource)
