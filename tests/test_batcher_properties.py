"""Property-based tests for the tri-threshold batcher: whatever the
event sequence and threshold mix, no file is lost or duplicated, flush
decisions exactly match the T1/T2/T3 rules, and arrival order is
preserved — invariants the reference relies on DynamoDB CAS for."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_lambda_redshift_loader_spark.sources.routing import LoadConfig
from aws_lambda_redshift_loader_spark.streaming.batcher import LOCKED, Batcher

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5_000),  # file size
        st.floats(min_value=0.0, max_value=300.0),  # seconds since previous
    ),
    max_size=60,
)
thresholds = st.tuples(
    st.integers(min_value=0, max_value=7),  # batch_size (0 = disabled)
    st.integers(min_value=0, max_value=8_000),  # batch_size_bytes
    st.integers(min_value=0, max_value=200),  # batch_timeout_secs
)


@settings(max_examples=200, deadline=None)
@given(events, thresholds)
def test_batcher_invariants(evs, th):
    size_th, bytes_th, age_th = th
    cfg = LoadConfig(
        s3_prefix="p", batch_size=size_th, batch_size_bytes=bytes_th,
        batch_timeout_secs=age_th,
    )
    b = Batcher(cfg)
    now = 1_000_000.0
    submitted = []
    for i, (size, dt) in enumerate(evs):
        now += dt
        name = f"f{i}"
        submitted.append(name)
        flushed = b.add_file(name, size, now)
        if flushed is not None:
            # A flush must be justified by at least one enabled threshold,
            # evaluated exactly as processPendingBatch does
            # (index.js:663-691).
            age = now - flushed.created
            assert (
                (size_th and flushed.entry_count >= size_th)
                or (bytes_th and flushed.size >= bytes_th)
                or (age_th and age > age_th)
            ), f"unjustified flush: n={flushed.entry_count} sz={flushed.size} age={age}"
            assert flushed.status == LOCKED
            assert flushed.entries, "flushed an empty batch"

    # Conservation: every submitted file appears exactly once, in order.
    all_files = [e.file for batch in b.all_batches() for e in batch.entries]
    assert all_files == submitted

    # Aggregate consistency per batch (A1/A2 counters).
    for batch in b.all_batches():
        assert batch.size == sum(e.size for e in batch.entries)
        assert batch.entry_count == len(batch.entries)
        assert len(batch.write_dates) == len(batch.entries)

    # If a count threshold is enabled, no open batch may sit at/over it
    # (it would have flushed on the triggering event).
    if size_th and b.current is not None:
        assert b.current.entry_count < size_th


@settings(max_examples=50, deadline=None)
@given(events)
def test_batcher_no_thresholds_never_flushes(evs):
    """All triggers disabled (0) → everything stays in one open batch,
    matching the reference's 'no configured thresholds' behavior."""
    b = Batcher(LoadConfig(s3_prefix="p"))
    now = 0.0
    for i, (size, dt) in enumerate(evs):
        now += dt
        assert b.add_file(f"f{i}", size, now) is None
    assert len(b.history) == 0


def test_bytes_batches_reset_on_flush(spark):
    """Reference T2 counterexample (index.js:684-691): the accumulator
    resets on every flush, so uniform 90-byte files under a 100-byte
    limit form 2-file batches forever — a floor-of-global-cumsum
    assignment would drift (file 3 -> seq 1, file 4 -> seq 2, ...)."""
    from datetime import datetime, timedelta

    from aws_lambda_redshift_loader_spark.operators.batching_sql import (
        assign_bytes_batches,
    )

    t0 = datetime(2024, 1, 1)
    rows = [("p", f"f{i:02d}", t0 + timedelta(seconds=i), 90) for i in range(6)]
    files = spark.createDataFrame(rows, "s3Prefix string, file_id string, ts timestamp, size long")
    got = sorted(
        tuple(r) for r in assign_bytes_batches(files, 100).collect()
    )
    assert got == [("p", 0, 2, 180), ("p", 1, 2, 180), ("p", 2, 2, 180)]


def test_bytes_batches_crossing_file_included_and_overshoot_dropped(spark):
    """The crossing file lands in the closing batch, and its overshoot
    does not leak into the next batch's budget."""
    from datetime import datetime, timedelta

    from aws_lambda_redshift_loader_spark.operators.batching_sql import (
        assign_bytes_batches,
    )

    t0 = datetime(2024, 1, 1)
    sizes = [10, 250, 30, 40, 40]  # limit 100: [10,250] closes, [30,40,40] open
    rows = [("p", f"f{i}", t0 + timedelta(seconds=i), s) for i, s in enumerate(sizes)]
    files = spark.createDataFrame(rows, "s3Prefix string, file_id string, ts timestamp, size long")
    got = sorted(tuple(r) for r in assign_bytes_batches(files, 100).collect())
    assert got == [("p", 0, 2, 260), ("p", 1, 3, 110)]
