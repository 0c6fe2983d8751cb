"""T3 age trigger in its exact distributed-streaming form: per-prefix
state with a processing-time timeout (`applyInPandasWithState` +
GroupStateTimeout.ProcessingTimeTimeout). The reference sweeps the age
check on EVERY incoming event, even ones for other prefixes
(index.js:233) — here a micro-batch carrying only prefix B events fires
prefix A's expired timeout, flushing A's pending batch exactly like that
sweep."""

from __future__ import annotations

import time

import pandas as pd

from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("prefix", T.StringType()),
        T.StructField("n_files", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("reason", T.StringType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.LongType()),
    ]
)
COUNT_THRESHOLD = 5  # high enough that only the timeout can flush here


def test_age_timeout_flushes_on_other_prefix_event(spark, tmp_path):
    # Defined inside the test: cloudpickle must serialize the worker fn
    # by VALUE (test modules are not importable on executors).
    threshold = COUNT_THRESHOLD

    def _fold(key, pdfs, state):
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [{"prefix": key[0], "n_files": n, "total_bytes": total, "reason": "timeout"}]
            )
            return
        rows = pd.concat(list(pdfs))
        n, total = state.get if state.exists else (0, 0)
        n += len(rows)
        total += int(rows["size"].sum())
        if n >= threshold:
            state.remove()
            yield pd.DataFrame(
                [{"prefix": key[0], "n_files": n, "total_bytes": total, "reason": "count"}]
            )
        else:
            state.update((n, total))
            state.setTimeoutDuration(1)  # ms — expires before the next batch
            yield pd.DataFrame(
                {"prefix": pd.Series(dtype="object"), "n_files": pd.Series(dtype="int64"),
                 "total_bytes": pd.Series(dtype="int64"), "reason": pd.Series(dtype="object")}
            )

    src = str(tmp_path / "files")
    schema = "prefix STRING, file STRING, size LONG"
    # Micro-batch 1: two prefix-A file events (below the count threshold).
    spark.createDataFrame([("A", "f1", 10), ("A", "f2", 20)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes → deterministic file->batch order
    # Micro-batch 2: one prefix-B event; must sweep A's expired timer.
    spark.createDataFrame([("B", "g1", 7)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream.groupBy("prefix")
        .applyInPandasWithState(
            _fold, OUT_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("timeout_test")
        .start()
    )
    # Poll, don't processAllAvailable(): timer-driven empty batches keep
    # the query "busy" and processAllAvailable can block indefinitely.
    rows = {}
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            rows = {r.prefix: r for r in spark.table("timeout_test").collect()}
            if len(rows) == 2:
                break
            time.sleep(2)
    finally:
        q.stop()

    # Both pending batches flushed by AGE with no further data events for
    # their prefix — natively, where the reference needs the cron
    # trigger-file sweep (createS3TriggerFile.js) to force the same check.
    assert set(rows) == {"A", "B"}, f"expected both prefixes flushed, got {rows}"
    assert rows["A"].reason == "timeout"
    assert rows["A"].n_files == 2 and rows["A"].total_bytes == 30
    assert rows["B"].reason == "timeout"
    assert rows["B"].n_files == 1 and rows["B"].total_bytes == 7
