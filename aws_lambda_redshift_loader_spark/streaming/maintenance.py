"""Table maintenance: small-file compaction for micro-batch sinks.

The reference's whole batching design exists to amortize per-load cost
(batch cadence guidance README.md:652-653) — but any micro-batch sink
still accretes files over time (one or more per epoch), and at 100 TB
the small-file problem is what kills scan performance (every file is a
task + a footer read). `compact` rewrites a parquet table to
~target-sized files and atomically swaps it in, the maintenance
companion to sinks.fan_out's `epoch=<id>` layout.

Scale notes: sizing uses the file listing only (driver metadata, no data
read); the rewrite is one distributed repartition-write. The swap is two
renames (atomic per directory on HDFS/local; on S3 a real deployment
swaps a table-format pointer — Delta/Iceberg commit — instead)."""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


@dataclass(frozen=True)
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _data_files(fs, hpath):
    out = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if status.isFile() and not name.startswith("_") and not name.startswith("."):
            out.append((name, status.getLen()))
        elif status.isDirectory():
            sub_fs_files = _data_files(fs, status.getPath())
            out.extend(sub_fs_files)
    return out


def _partition_keys(fs, hpath, jvm) -> list[str]:
    """Hive-style partition column names, in directory order, by walking
    the first `key=value` directory chain (the same layout Spark's
    partition inference reads). Empty list = unpartitioned."""
    keys: list[str] = []
    cur = hpath
    while True:
        sub = [
            s.getPath()
            for s in fs.listStatus(cur)
            if s.isDirectory() and "=" in s.getPath().getName()
        ]
        if not sub:
            return keys
        keys.append(sub[0].getName().split("=", 1)[0])
        cur = sub[0]


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> CompactionStats:
    """Rewrite the parquet table at ``path`` into ⌈total/target⌉ files
    and swap the directory in. Returns before/after stats.

    Hive-partitioned layouts (e.g. fan_out's ``epoch=<id>`` dirs) are
    preserved: partition keys are detected from the directory names and
    the rewrite uses ``partitionBy`` so partition columns stay directory
    metadata (pruning keeps working) instead of being flattened into
    data columns.

    Consistency: the swap is two directory renames (atomic each on
    HDFS/local, but there is a reader-visible window between them where
    the table path does not exist — a concurrent reader can get a
    path-not-found and should retry). A real S3 deployment swaps a
    table-format pointer (Delta/Iceberg commit) instead, which closes
    that window."""
    fs, hpath, jvm = _fs(spark, path)
    files = _data_files(fs, hpath)
    total = sum(size for _, size in files)
    n_target = max(1, math.ceil(total / target_file_bytes))
    if len(files) <= n_target:
        return CompactionStats(len(files), len(files), total)

    pkeys = _partition_keys(fs, hpath, jvm)
    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._compact_tmp")
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._compact_old")
    fs.delete(tmp, True)
    fs.delete(old, True)
    # repartition (round-robin) spreads rows evenly across the target
    # files; coalesce would skip the shuffle but can leave skewed files.
    # Partitioned layout: repartition on the partition columns so each
    # output directory gets whole shuffle partitions (one file per
    # partition-value at typical epoch sizes, never a file per task).
    df = spark.read.parquet(path)
    if pkeys:
        from pyspark.sql import functions as F

        writer = (
            df.repartition(n_target, *[F.col(k) for k in pkeys])
            .write.partitionBy(*pkeys)
        )
    else:
        writer = df.repartition(n_target).write
    writer.parquet(tmp.toString())
    if not fs.rename(hpath, old):
        raise IOError(f"compaction swap failed: could not move {path} aside")
    if not fs.rename(tmp, hpath):
        fs.rename(old, hpath)  # roll back
        raise IOError(f"compaction swap failed: could not move new data into {path}")
    fs.delete(old, True)
    after = _data_files(fs, hpath)
    return CompactionStats(len(files), len(after), total)
