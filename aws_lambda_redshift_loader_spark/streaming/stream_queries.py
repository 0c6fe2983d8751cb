"""Structured Streaming queries over the `events` fixture (SURVEY §2.9).

The live counterpart of operators.windows_sql: the same windowed
aggregation expressions run through `readStream` → memory sink, proving
the batch/stream unification (one plan, two execution modes). The
tumbling-window stream shares its DuckDB oracle with the batch query —
complete-mode output over a finite source equals the batch answer.

The ingestion-side streaming machinery (tri-threshold batcher, ledger,
replay) lives in streaming.batcher / .ledger / .replay.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import dec
from ..plans.registry import register
from ..session import normalize_nanos, tune

_COUNTER = itertools.count()


def _run_stream(spark: SparkSession, sf_dir: str, agg_builder) -> DataFrame:
    """Run a finite streaming query over events.parquet to completion via a
    memory sink (complete mode), return the result table."""
    tune(spark)
    # Raw on-disk schema (ts arrives as int64 nanos under nanosAsLong);
    # normalize_nanos converts it exactly like the batch path.
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file source wants a directory: point it at sf_dir and glob-filter
    # down to events.parquet (the P2 filename-filter primitive, reused).
    stream = normalize_nanos(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        # maxFilesPerTrigger exercises real micro-batching (T1 analog).
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )
    name = f"stream_result_{next(_COUNTER)}"
    q = (
        agg_builder(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "stream_tumbling_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 streaming tumbling windows, for real: readStream → watermarked
    1-hour windows → complete-mode memory sink. Over the finite fixture the
    final state equals the batch tumbling aggregation, so the same oracle
    applies — the strongest check a streaming query can get.

    Scale: this exact query with a kafka/file source and a Delta/JDBC
    `foreachBatch` sink is the production shape; watermark bounds state.
    """

    def agg(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(dec("value")).cast("double").alias("sum_value"),
            )
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )

    return _run_stream(spark, sf_dir, agg)


@register("stream_dedup_dropduplicates", None)  # state op → rows-only check
def stream_dedup_dropduplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 file-level dedup as a streaming state op: `dropDuplicates` on the
    event id with a watermark bounding state — the exactly-once ingest gate
    the reference implements with the DynamoDB ledger (index.js:247-306).
    Result: per-type counts after streaming dedup (equals batch distinct
    counts on the finite fixture)."""

    def agg(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", "1 hour")
            .dropDuplicates(["event_id"])
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"))
        )

    return _run_stream(spark, sf_dir, agg)
