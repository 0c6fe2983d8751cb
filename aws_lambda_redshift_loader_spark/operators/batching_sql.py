"""Micro-batch trigger semantics as declarative SQL (SURVEY.md §2.9 T1-T3).

The reference decides batch flushes with three thresholds checked on every
incoming file event (processPendingBatch, index.js:602-813):

- T1 count:  pendingEntryCount >= batchSize          (index.js:663-670)
- T2 bytes:  sum(entry sizes)  >= batchSizeBytes     (index.js:684-691)
- T3 age:    now - min(writeDates) > batchTimeoutSecs (index.js:674-682)

The *live* implementation is streaming.batcher (stateful, exact reference
semantics incl. the sample's 2+2+1-open golden outcome). These queries are
the batch-mode / backfill form: given a history of file-arrival events,
assign every file to the batch it would have landed in — pure window
functions, so the assignment runs at any scale as one shuffle per prefix.

The `events` fixture stands in for file arrivals: event_type ≡ s3Prefix
(the per-prefix routing key), ts ≡ writeDate, and a derived integer byte
size ≡ object size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..plans.registry import register
from ..session import table

BATCH_SIZE = 100  # files per batch (T1)
BATCH_BYTES = 250_000  # bytes per batch (T2)
GAP_SECONDS = 600  # age/idle gap (T3, sessionized form)


def _files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → file-arrival ledger rows (prefix, file, write ts, size)."""
    return table(spark, sf_dir, "events").select(
        F.col("event_type").alias("s3Prefix"),
        F.col("event_id").alias("file_id"),
        F.col("ts"),
        # floor() before the int cast: DuckDB CAST(double AS BIGINT) rounds
        # while Spark truncates — floor() makes both exact and identical.
        F.floor(F.col("value") * 100).cast("bigint").alias("size"),
    )


_FILES_CTE = """
files AS (
  SELECT event_type AS s3Prefix, event_id AS file_id, ts,
         CAST(floor(value * 100) AS BIGINT) AS size
  FROM events
)
"""


@register(
    "count_trigger_batches",
    f"""
    WITH {_FILES_CTE},
    numbered AS (
      SELECT *, row_number() OVER (PARTITION BY s3Prefix
                                   ORDER BY ts ASC, file_id ASC) AS rn
      FROM files
    )
    SELECT s3Prefix,
           CAST(floor((rn - 1) / {BATCH_SIZE}) AS BIGINT) AS batch_seq,
           COUNT(*) AS n_files,
           CAST(SUM(size) AS BIGINT) AS batch_bytes,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS batch_opened
    FROM numbered
    GROUP BY s3Prefix, CAST(floor((rn - 1) / {BATCH_SIZE}) AS BIGINT)
    """,
)
def count_trigger_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 count trigger (index.js:663-670) in backfill form: files are
    numbered per prefix in arrival order; every `batchSize` files close a
    batch. The per-batch aggregates are the reference's A1 (size sum),
    A2 (entry count), A3 (min writeDate = batch open time)."""
    w = W.partitionBy("s3Prefix").orderBy(F.col("ts").asc(), F.col("file_id").asc())
    return (
        _files(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("batch_seq", F.floor((F.col("rn") - 1) / BATCH_SIZE).cast("bigint"))
        .groupBy("s3Prefix", "batch_seq")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("size").cast("bigint").alias("batch_bytes"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("batch_opened"),
        )
    )


@register(
    "bytes_trigger_batches",
    f"""
    WITH {_FILES_CTE},
    cum AS (
      SELECT *, SUM(size) OVER (PARTITION BY s3Prefix
                                ORDER BY ts ASC, file_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum_bytes
      FROM files
    )
    SELECT s3Prefix,
           CAST(floor((cum_bytes - size) / {BATCH_BYTES}) AS BIGINT) AS batch_seq,
           COUNT(*) AS n_files,
           CAST(SUM(size) AS BIGINT) AS batch_bytes
    FROM cum
    GROUP BY s3Prefix, CAST(floor((cum_bytes - size) / {BATCH_BYTES}) AS BIGINT)
    """,
)
def bytes_trigger_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 byte-size trigger (index.js:684-691) in backfill form: a file
    joins the batch indexed by how many `batchSizeBytes` thresholds the
    running total had already crossed *before* it arrived (the reference
    flushes once the open batch's sum crosses the limit, so the crossing
    file still lands in the closing batch — hence `cum_bytes - size`).

    All-integer running sums keep the assignment exact at any parallelism.
    """
    w = (
        W.partitionBy("s3Prefix")
        .orderBy(F.col("ts").asc(), F.col("file_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        _files(spark, sf_dir)
        .withColumn("cum_bytes", F.sum("size").over(w))
        .withColumn(
            "batch_seq",
            F.floor((F.col("cum_bytes") - F.col("size")) / BATCH_BYTES).cast("bigint"),
        )
        .groupBy("s3Prefix", "batch_seq")
        .agg(F.count("*").alias("n_files"), F.sum("size").cast("bigint").alias("batch_bytes"))
    )


@register(
    "age_trigger_sessions",
    f"""
    WITH {_FILES_CTE},
    gaps AS (
      SELECT *,
             CASE WHEN lag(ts) OVER (PARTITION BY s3Prefix ORDER BY ts ASC, file_id ASC)
                       IS NULL THEN 1
                  WHEN date_part('epoch', date_trunc('second', ts)) -
                       date_part('epoch', date_trunc('second',
                           lag(ts) OVER (PARTITION BY s3Prefix
                                         ORDER BY ts ASC, file_id ASC)))
                       > {GAP_SECONDS} THEN 1
                  ELSE 0 END AS new_batch
      FROM files
    )
    SELECT s3Prefix,
           CAST(SUM(new_batch) OVER (PARTITION BY s3Prefix
                                     ORDER BY ts ASC, file_id ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS batch_seq,
           file_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS write_date
    FROM gaps
    """,
)
def age_trigger_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 age trigger (index.js:674-682) in its scalable batch-mode form:
    gaps-and-islands sessionization — a quiet period longer than the
    timeout starts a new batch. (The live streaming batcher implements the
    exact `now - min(writeDates) > timeout` sweep; see streaming.batcher.)
    """
    order = [F.col("ts").asc(), F.col("file_id").asc()]
    w_lag = W.partitionBy("s3Prefix").orderBy(*order)
    w_cum = (
        W.partitionBy("s3Prefix").orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    files = _files(spark, sf_dir)
    gaps = files.withColumn(
        "new_batch",
        F.when(F.lag("ts").over(w_lag).isNull(), 1)
        .when(
            F.unix_timestamp(F.date_trunc("second", "ts"))
            - F.unix_timestamp(F.date_trunc("second", F.lag("ts").over(w_lag)))
            > GAP_SECONDS,
            1,
        )
        .otherwise(0),
    )
    return gaps.select(
        "s3Prefix",
        F.sum("new_batch").over(w_cum).cast("bigint").alias("batch_seq"),
        "file_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("write_date"),
    )
