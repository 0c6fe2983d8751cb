"""Small-file compaction (the maintenance companion to micro-batch
sinks: many epochs → many small files → compact to target-sized ones
with an atomic directory swap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_lambda_redshift_loader_spark.streaming.maintenance import compact


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "table")
    # 32 tiny files, as 32 micro-batch epochs would leave behind.
    spark.range(0, 3200).withColumn("v", F.col("id") * 2).repartition(32).write.parquet(path)
    before = spark.read.parquet(path)
    before_rows = sorted(tuple(r) for r in before.collect())

    stats = compact(spark, path, target_file_bytes=10 * 1024 * 1024)

    assert stats.files_before == 32
    assert stats.files_after < stats.files_before
    after = spark.read.parquet(path)
    assert sorted(tuple(r) for r in after.collect()) == before_rows


def test_compact_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "small")
    spark.range(0, 10).coalesce(1).write.parquet(path)
    stats = compact(spark, path)
    assert stats.files_before == stats.files_after == 1


def test_compact_preserves_hive_partitions(spark, tmp_path):
    """Compacting a partitioned layout (fan_out's epoch=<id> dirs) must
    keep partition columns as directories, not flatten them into data."""
    import os

    path = str(tmp_path / "ptable")
    df = spark.range(0, 20000).withColumn("epoch", (F.col("id") % 3).cast("bigint"))
    # Many small files per partition: one per (epoch, repartition slice).
    df.repartition(8).write.partitionBy("epoch").parquet(path)
    before = spark.read.parquet(path)
    before_rows = sorted((r.id, r.epoch) for r in before.collect())

    stats = compact(spark, path, target_file_bytes=64 * 1024)
    assert stats.files_after < stats.files_before

    # Layout still hive-partitioned: epoch=* dirs exist, pruning works.
    subdirs = sorted(d for d in os.listdir(path) if d.startswith("epoch="))
    assert subdirs == ["epoch=0", "epoch=1", "epoch=2"]
    after = spark.read.parquet(path)
    assert sorted((r.id, r.epoch) for r in after.collect()) == before_rows
    # Partition pruning: a filter on epoch reads only that directory.
    plan = after.filter(F.col("epoch") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "epoch=1" in plan or "PartitionFilters" in plan
