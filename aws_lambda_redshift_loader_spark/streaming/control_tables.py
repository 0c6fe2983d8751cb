"""Control-plane state as DataFrames (SURVEY §1.3 Spark mapping).

The reference keeps batches / processed files / notifications in DynamoDB
and queries them via key lookups + one GSI (§3.3). Here the same records
become DataFrames with the StructTypes from SURVEY §1.3 — DynamoDB
`L[M]` → ArrayType(StructType), `NS` → ArrayType(TimestampType) — so the
operational queries are ordinary Spark SQL, and the state checkpoints to
parquet for restart recovery (the reference's durability analog).

Scale: control tables are tiny (1 row per batch/file-event), so these are
driver-built DataFrames; persistence is a single-partition parquet write.
The *query* surface over them is identical at any scale — point a
DataFrame at the parquet checkpoint and the §3.3 filters run distributed.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

UTC = dt.timezone.utc

BATCH_SCHEMA = T.StructType(
    [
        T.StructField("s3Prefix", T.StringType(), False),
        T.StructField("batchId", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField(
            "entries",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("file", T.StringType(), False),
                        T.StructField("size", T.LongType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("writeDates", T.ArrayType(T.TimestampType()), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("lastUpdate", T.TimestampType(), True),
        T.StructField("errorMessage", T.StringType(), True),
    ]
)

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("loadFile", T.StringType(), False),
        T.StructField("receiveDateTime", T.TimestampType(), True),
        T.StructField("timesReceived", T.LongType(), True),
        T.StructField("batchId", T.StringType(), True),
        T.StructField("previousBatches", T.ArrayType(T.StringType()), True),
    ]
)

NOTIFICATION_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType(), False),
        T.StructField("batchId", T.StringType(), False),
        T.StructField("s3Prefix", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def _ts(epoch: float | None) -> dt.datetime | None:
    return None if epoch is None else dt.datetime.fromtimestamp(epoch, tz=UTC)


def batches_df(spark: SparkSession, pipeline) -> DataFrame:
    """All batch rows across prefixes → the LambdaRedshiftBatches table."""
    rows = [
        (
            b.s3_prefix,
            b.batch_id,
            b.status,
            [(e.file, e.size) for e in b.entries],
            [_ts(w) for w in b.write_dates],
            b.size,
            _ts(b.last_update) if b.last_update else None,
            b.error_message,
        )
        for b in pipeline._all_batches()
    ]
    return spark.createDataFrame(rows, BATCH_SCHEMA)


def ledger_df(spark: SparkSession, pipeline) -> DataFrame:
    rows = [
        (
            r.load_file,
            _ts(r.receive_date_time),
            r.times_received,
            r.batch_id,
            r.previous_batches,
        )
        for r in pipeline.ledger.rows.values()
    ]
    return spark.createDataFrame(rows, LEDGER_SCHEMA)


def notifications_df(spark: SparkSession, pipeline) -> DataFrame:
    rows = [
        (n.subject, n.batch_id, n.s3_prefix, n.status, n.error, _ts(n.ts))
        for n in pipeline.notifications.rows
    ]
    return spark.createDataFrame(rows, NOTIFICATION_SCHEMA)


def checkpoint(spark: SparkSession, pipeline, path: str) -> None:
    """Durability analog of DynamoDB: one parquet write per control table."""
    batches_df(spark, pipeline).coalesce(1).write.mode("overwrite").parquet(f"{path}/batches")
    ledger_df(spark, pipeline).coalesce(1).write.mode("overwrite").parquet(f"{path}/processed_files")
    notifications_df(spark, pipeline).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/notifications"
    )
