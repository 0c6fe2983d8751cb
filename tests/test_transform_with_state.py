"""Spark 4 `transformWithStateInPandas` form of the count-trigger batcher
(SURVEY §2.9 T1/T4/T5): the successor API to `applyInPandasWithState`
(used by stream_stateful_batcher) with explicitly-named state variables
and the RocksDB state store — the shape new Spark 4 deployments write.
Semantics are identical to the applyInPandasWithState form, so the test
asserts the same closed-batch output the shared SQL oracle defines.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_lambda_redshift_loader_spark.session import normalize_nanos, tune
from aws_lambda_redshift_loader_spark.streaming.stream_queries import BATCH_SIZE

from conftest import SF_SMOKE

OUT_SCHEMA = T.StructType(
    [
        T.StructField("s3Prefix", T.StringType()),
        T.StructField("batch_seq", T.LongType()),
        T.StructField("n_files", T.LongType()),
        T.StructField("batch_bytes", T.LongType()),
    ]
)


def test_transform_with_state_batcher_matches_batch_assignment(spark, tmp_path):
    try:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )
    except ImportError:
        pytest.skip("transformWithState API not in this pyspark")
    # The transformWithState driver worker speaks protobuf to the JVM
    # (pyspark/sql/streaming/proto/StateMessage_pb2); without
    # google.protobuf the query crashes at state-schema validation with
    # STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. The container ships
    # no protobuf and installs are unavailable, so this is an
    # environment gate, exactly like the (since unblocked) AVRO one —
    # the applyInPandasWithState form (stream_stateful_batcher) is the
    # covered equivalent.
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "google.protobuf absent: transformWithState driver worker "
            "cannot start (verified: STREAMING_PYTHON_RUNNER_"
            "INITIALIZATION_FAILURE from StateMessage_pb2 import)"
        )

    tune(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        raw_schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
        stream = normalize_nanos(
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(SF_SMOKE)
        )
        files = stream.select(
            F.col("event_type").alias("s3Prefix"),
            F.col("event_id").alias("file_id"),
            F.col("ts"),
            F.floor(F.col("value") * 100).cast("bigint").alias("size"),
        )

        class BatcherProcessor(StatefulProcessor):
            # T1 count trigger + T4 lock + T5 rotation as named ValueState.
            def init(self, handle: StatefulProcessorHandle) -> None:
                self.state = handle.getValueState(
                    "open_batch", "seq LONG, pending_n LONG, pending_bytes LONG"
                )

            def handleInputRows(self, key, rows, timerValues):
                seq, pending_n, pending_bytes = (
                    self.state.get() if self.state.exists() else (0, 0, 0)
                )
                closed = []
                pdf = pd.concat(list(rows)).sort_values(["ts", "file_id"])
                for size in pdf["size"]:
                    pending_n += 1
                    pending_bytes += int(size)
                    if pending_n >= 100:  # BATCH_SIZE (inline: pickled by value)
                        closed.append((key[0], seq, pending_n, pending_bytes))
                        seq, pending_n, pending_bytes = seq + 1, 0, 0
                self.state.update((seq, pending_n, pending_bytes))
                yield pd.DataFrame(
                    closed, columns=["s3Prefix", "batch_seq", "n_files", "batch_bytes"]
                )

            def close(self) -> None:
                pass

        out = files.groupBy("s3Prefix").transformWithStateInPandas(
            BatcherProcessor(), OUT_SCHEMA, "append", "processingTime"
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("tws_batches")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r.s3Prefix, r.batch_seq): (r.n_files, r.batch_bytes)
            for r in spark.table("tws_batches").collect()
        }
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    # Expected: the deterministic batch assignment (same fold the shared
    # oracle of stream_stateful_batcher defines), full batches only.
    from pyspark.sql.window import Window as W

    ev = normalize_nanos(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    w = W.partitionBy("event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    want_rows = (
        ev.select(
            F.col("event_type").alias("s3Prefix"),
            F.floor(F.col("value") * 100).cast("bigint").alias("size"),
            ((F.row_number().over(w) - 1) / BATCH_SIZE).cast("bigint").alias("batch_seq"),
        )
        .groupBy("s3Prefix", "batch_seq")
        .agg(F.count("*").alias("n_files"), F.sum("size").alias("batch_bytes"))
        .filter(F.col("n_files") == BATCH_SIZE)
        .collect()
    )
    want = {(r.s3Prefix, r.batch_seq): (r.n_files, r.batch_bytes) for r in want_rows}
    assert got == want and len(got) > 0
