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
    WITH RECURSIVE {_FILES_CTE},
    cum AS (
      SELECT *,
             SUM(size) OVER (PARTITION BY s3Prefix ORDER BY ts ASC, file_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
             row_number() OVER (PARTITION BY s3Prefix
                                ORDER BY ts ASC, file_id ASC) AS rn
      FROM files
    ),
    heads(s3Prefix, head_rn, batch_seq, base) AS (
      SELECT s3Prefix, 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM (SELECT DISTINCT s3Prefix FROM files)
      UNION ALL
      SELECT s.s3Prefix, s.first_cross + 1, s.batch_seq + 1, s.cross_c
      FROM (
        SELECT h.s3Prefix, h.batch_seq,
               MIN(CASE WHEN c.c - h.base >= {BATCH_BYTES} THEN c.rn END) AS first_cross,
               MIN(CASE WHEN c.c - h.base >= {BATCH_BYTES} THEN c.c END) AS cross_c,
               MAX(c.rn) AS last_rn
        FROM heads h JOIN cum c ON c.s3Prefix = h.s3Prefix AND c.rn >= h.head_rn
        GROUP BY h.s3Prefix, h.batch_seq, h.base
      ) s
      WHERE s.first_cross IS NOT NULL AND s.first_cross < s.last_rn
    ),
    assigned AS (
      SELECT c.s3Prefix, c.rn, c.size, MAX(h.batch_seq) AS batch_seq
      FROM cum c JOIN heads h ON h.s3Prefix = c.s3Prefix AND h.head_rn <= c.rn
      GROUP BY c.s3Prefix, c.rn, c.size
    )
    SELECT s3Prefix, batch_seq, COUNT(*) AS n_files,
           CAST(SUM(size) AS BIGINT) AS batch_bytes
    FROM assigned GROUP BY s3Prefix, batch_seq
    """,
)
def bytes_trigger_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 byte-size trigger (index.js:684-691) in backfill form, with the
    reference's exact reset-on-flush semantics: a file joins the open
    batch, and once the batch's accumulated size crosses
    `batchSizeBytes` the batch closes WITH that file and the accumulator
    resets to zero — overshoot does NOT carry into the next batch (the
    pre-r3 floor-of-global-cumsum form shifted every later boundary).

    Segment-recursive assignment can't be a plain window function, so
    each prefix's ledger runs through an Arrow-batched applyInPandas
    with a numpy searchsorted loop (O(batches · log files) per prefix).
    That mirrors the reference's own concurrency model — per-prefix
    sequential (its DynamoDB conditional update serializes a prefix),
    parallel across prefixes — so the shape is as distributed as the
    semantics allow. The oracle is a recursive CTE over batch heads,
    validated against a direct simulation of index.js:684-691.
    """
    return assign_bytes_batches(_files(spark, sf_dir), BATCH_BYTES)


def assign_bytes_batches(files: DataFrame, limit: int) -> DataFrame:
    """Reset-on-flush byte batching over a (s3Prefix, file_id, ts, size)
    ledger — the reusable core of bytes_trigger_batches (and the unit
    test target for the reference counterexample: uniform 90-byte files
    with a 100-byte limit must yield 2-file batches)."""
    schema = "s3Prefix string, batch_seq bigint, n_files bigint, batch_bytes bigint"

    def assign(pdf):
        # Defined in-builder: pickled by value so executors never need to
        # import this module on the worker side.
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["ts", "file_id"], kind="mergesort")
        cum = pdf["size"].to_numpy(dtype=np.int64).cumsum()
        n = len(cum)
        seqs = np.empty(n, dtype=np.int64)
        start, base, seq = 0, 0, 0
        while start < n:
            close = int(np.searchsorted(cum, base + limit, side="left"))
            close = min(close, n - 1)
            seqs[start : close + 1] = seq
            base = int(cum[close])
            start, seq = close + 1, seq + 1
        out = pd.DataFrame(
            {"s3Prefix": pdf["s3Prefix"].to_numpy(), "batch_seq": seqs, "size": pdf["size"].to_numpy()}
        )
        g = out.groupby("batch_seq", sort=True)
        return pd.DataFrame(
            {
                "s3Prefix": g["s3Prefix"].first(),
                "batch_seq": g["batch_seq"].first(),
                "n_files": g["size"].count().astype("int64"),
                "batch_bytes": g["size"].sum().astype("int64"),
            }
        )

    return files.groupBy("s3Prefix").applyInPandas(assign, schema)


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
