"""Round-17 property pins.

1. Hull-store CUSUM exactness on an adversarial synthetic stream:
   constant-value runs force (a) exactly-mean-sloped collinear walk
   segments (the argmax-tie class the strict hull must survive) and
   (b) heavily duplicated event timestamps (the duplicated-percentile
   -bounds class _ensure_event_ts_split must tolerate). The
   store-served answer must equal the batch detector bit-for-bit.
2. Hull-store replay idempotence: re-ingesting an epoch overwrites to
   the identical resolved answer (the store-kind contract every other
   store pins).
3. The hull is a real compression on large cells: collinear runs
   collapse to endpoints (guards the chain degenerating to keep-all).
"""

from __future__ import annotations

import datetime

import pytest

from conftest import SF_ORACLE


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string,"
        " value double, ts timestamp",
    )


def _synthetic_rows():
    """One event type, three regimes: flat at 3.00, flat at 9.00, flat
    at 3.00 again — the middle regime shifts the mean so the flat runs
    are exactly-mean-sloped for crafted values, and every run shares
    ONE timestamp per 5 events (heavy ts duplication)."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day, val, k in [(0, 3.0, 20), (1, 9.0, 20), (2, 3.0, 20)]:
        for i in range(k):
            ts = t0 + datetime.timedelta(days=day, seconds=i // 5)
            rows.append((eid % 7, eid, "m", val, ts))
            eid += 1
    return rows


def test_hull_store_equals_batch_on_tie_heavy_stream(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_lambda_redshift_loader_spark.operators.windows_sql import (
        _cusum_select,
    )
    from aws_lambda_redshift_loader_spark.streaming.stream_queries import (
        _cusum_from_store,
        ingest_cusum_epoch,
    )

    rows = _synthetic_rows()
    ev = _mk_events(spark, rows)
    store = str(tmp_path / "store")
    # Three ts-range epochs with a boundary INSIDE day 1 (epoch split
    # finer than the day grain — the cross-epoch merge must stitch).
    ingest_cusum_epoch(spark, ev.filter(F.col("event_id") < 30), 0, store)
    ingest_cusum_epoch(
        spark,
        ev.filter((F.col("event_id") >= 30) & (F.col("event_id") < 45)),
        1,
        store,
    )
    ingest_cusum_epoch(spark, ev.filter(F.col("event_id") >= 45), 2, store)
    got = {
        r["event_type"]: r.asDict()
        for r in _cusum_from_store(spark, store).collect()
    }

    # Batch reference: naive per-type CUSUM in Python.
    vs = sorted(rows, key=lambda r: (r[4], r[1]))
    v_c = [int(r[3] * 100) for r in vs]
    s, n = sum(v_c), len(v_c)
    mean = s // n
    best = None
    run = 0
    for i, r in enumerate(vs):
        run += v_c[i]
        a = abs(run - (i + 1) * mean)
        key = (a, -r[4].timestamp(), -r[1])
        if best is None or key > best[0]:
            best = (key, r[1], a)
    assert set(got) == {"m"}
    g = got["m"]
    assert g["n_events"] == n
    assert g["mean_c"] == mean
    assert g["max_abs_cusum"] == best[2]
    assert g["cp_event_id"] == best[1]


def test_hull_store_replay_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_lambda_redshift_loader_spark.streaming.stream_queries import (
        _cusum_from_store,
        ingest_cusum_epoch,
    )

    ev = _mk_events(spark, _synthetic_rows())
    store = str(tmp_path / "store")
    ingest_cusum_epoch(spark, ev.filter(F.col("event_id") < 30), 0, store)
    ingest_cusum_epoch(spark, ev.filter(F.col("event_id") >= 30), 1, store)
    first = sorted(
        tuple(r) for r in _cusum_from_store(spark, store).collect()
    )
    # Replay epoch 1 (same frozen batch) — overwrite must be a no-op.
    ingest_cusum_epoch(spark, ev.filter(F.col("event_id") >= 30), 1, store)
    again = sorted(
        tuple(r) for r in _cusum_from_store(spark, store).collect()
    )
    assert first == again


def test_hull_compresses_collinear_runs(spark, tmp_path):
    """Collinear walk segments must collapse to their endpoints: each
    synthetic (type, day) cell is one flat-value run of 20 events, so
    its hull is exactly the run's endpoints (≤ 2-3 vertices), not the
    20 points. (The sf fixture's cells are 2-10 events each, where a
    hull legitimately keeps most points — compression is a large-cell
    property, so it is pinned on a large synthetic cell.)"""
    from aws_lambda_redshift_loader_spark.streaming.stream_queries import (
        ingest_cusum_epoch,
    )

    ev = _mk_events(spark, _synthetic_rows())
    store = str(tmp_path / "store")
    ingest_cusum_epoch(spark, ev, 0, store)
    hull_rows = spark.read.parquet(f"{store}/hull").count()
    # 3 cells x 20 events = 60 points; flat runs keep endpoints only.
    assert hull_rows <= 9, f"hull kept {hull_rows} of 60 collinear points"


def test_spend_store_replay_and_merge(spark, tmp_path):
    """The additive spend store must (a) be replay-idempotent and
    (b) resolve identically however users/days are split across
    epochs — including a user and a day split MID-DAY across epochs
    (the algebra is pure addition, so arrival order is free)."""
    import datetime

    from pyspark.sql import functions as F

    from aws_lambda_redshift_loader_spark.streaming.stream_queries import (
        _spend_store_ux,
        ingest_spend_epoch,
    )

    t0 = datetime.date(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append(
            (
                i % 5,
                "purchase",
                float(i % 7) + 0.25,
                t0 + datetime.timedelta(days=i % 4),
            )
        )
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, day date"
    )
    one = str(tmp_path / "one")
    ingest_spend_epoch(spark, ev, 0, one)
    whole = sorted(tuple(r) for r in _spend_store_ux(spark, one).collect())

    split = str(tmp_path / "split")
    # Adversarial split: odd/even row interleave (same user+day lands
    # in BOTH epochs — the sums must merge).
    evi = ev.withColumn(
        "rn", F.monotonically_increasing_id()
    )
    ingest_spend_epoch(spark, evi.filter("rn % 2 = 0").drop("rn"), 0, split)
    ingest_spend_epoch(spark, evi.filter("rn % 2 = 1").drop("rn"), 1, split)
    merged = sorted(
        tuple(r) for r in _spend_store_ux(spark, split).collect()
    )
    assert whole == merged

    # Replay epoch 1 — overwrite must be a no-op.
    ingest_spend_epoch(spark, evi.filter("rn % 2 = 1").drop("rn"), 1, split)
    again = sorted(
        tuple(r) for r in _spend_store_ux(spark, split).collect()
    )
    assert merged == again


def test_valcount_store_replay_and_merge(spark, tmp_path):
    """The value-count store is pure addition: any epoch split of the
    corpus resolves to the same distinct-value counts, and replaying
    an epoch is a no-op."""
    from aws_lambda_redshift_loader_spark.streaming.stream_queries import (
        _valcount_per,
        ingest_valcount_epoch,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )
    one = str(tmp_path / "one")
    ingest_valcount_epoch(spark, docs, 0, one)
    whole = sorted(tuple(r) for r in _valcount_per(spark, one).collect())

    split = str(tmp_path / "split")
    ingest_valcount_epoch(spark, docs.filter("doc_id % 3 = 0"), 0, split)
    ingest_valcount_epoch(spark, docs.filter("doc_id % 3 = 1"), 1, split)
    ingest_valcount_epoch(spark, docs.filter("doc_id % 3 = 2"), 2, split)
    merged = sorted(tuple(r) for r in _valcount_per(spark, split).collect())
    assert whole == merged

    ingest_valcount_epoch(spark, docs.filter("doc_id % 3 = 1"), 1, split)
    again = sorted(tuple(r) for r in _valcount_per(spark, split).collect())
    assert merged == again


def test_mwu_equals_naive_python(spark):
    """The banded distinct-value MWU must equal a naive Python
    rank-sum computed straight from the definition (pairwise wins +
    half-ties) — a shared-formula-bug guard independent of the DuckDB
    oracle, which mirrors the same CTE algebra."""
    from aws_lambda_redshift_loader_spark.operators.windows_sql import (
        _mwu_from_counts,
        _quality_split_counts,
    )

    per = {
        r["v"]: (r["n1v"], r["n2v"])
        for r in _quality_split_counts(spark, SF_ORACLE).collect()
    }
    got = _mwu_from_counts(
        spark,
        spark.createDataFrame(
            [(v, a, b) for v, (a, b) in per.items()],
            "v long, n1v long, n2v long",
        ),
    ).collect()[0]

    xs, ys = [], []
    for v, (a, b) in per.items():
        xs += [v] * a
        ys += [v] * b
    u2 = 0  # 2*U1 = 2*wins + ties, computed from sorted merge
    ys_sorted = sorted(ys)
    import bisect

    for x in xs:
        lo = bisect.bisect_left(ys_sorted, x)
        hi = bisect.bisect_right(ys_sorted, x)
        u2 += 2 * lo + (hi - lo)
    assert got["n_train"] == len(xs)
    assert got["n_val"] == len(ys)
    assert got["u_x2"] == u2
    n = len(xs) + len(ys)
    from collections import Counter

    t = sum(c**3 - c for c in Counter(xs + ys).values())
    assert got["tie_term"] == t


def test_winsorized_equals_naive_python(spark):
    """The banded winsorized mean must equal the naive definition:
    exact ceil-quantile thresholds over the sorted values, clamp,
    floor-divide."""
    import math

    from aws_lambda_redshift_loader_spark.operators.windows_sql import (
        _quality_split_counts,
        _winsorized_from_counts,
    )

    per = [
        (r["v"], r["n1v"], r["n2v"])
        for r in _quality_split_counts(spark, SF_ORACLE).collect()
    ]
    got = {
        r["split"]: r.asDict()
        for r in _winsorized_from_counts(
            spark,
            spark.createDataFrame(per, "v long, n1v long, n2v long"),
        ).collect()
    }
    for split, idx in (("train", 1), ("val", 2)):
        vals = sorted(
            v for v, *counts in per for _ in range(counts[idx - 1])
        )
        n = len(vals)
        lo = vals[math.ceil(0.05 * n) - 1] if n else 0
        hi = vals[math.ceil(0.95 * n) - 1] if n else 0
        s = sum(min(max(v, lo), hi) for v in vals)
        g = got[split]
        assert g["n_docs"] == n
        assert g["lo_q"] == lo, (split, g["lo_q"], lo)
        assert g["hi_q"] == hi, (split, g["hi_q"], hi)
        assert g["wins_mean_q"] == ((s - (s % n)) // n if n else 0)


def test_poisson_cuts_match_recomputation():
    """The bootstrap's precomputed Poisson(1) CDF cut points must
    equal a from-scratch recomputation (guards a typo in the literal
    table — the operator's determinism rests on these constants)."""
    import math

    from aws_lambda_redshift_loader_spark.operators.text import _POIS1_CUTS

    cdf, term = 0.0, math.exp(-1.0)
    for k, cut in enumerate(_POIS1_CUTS):
        cdf += term
        assert cut == math.floor(cdf * (1 << 60)), k
        term /= k + 1


def test_hull_store_equals_naive_on_random_walks(spark, tmp_path):
    """Randomized end-to-end pin: random-valued walks (with heavy
    duplication so collinear runs and argmax ties occur) through the
    hull ingest + store reader must equal the naive per-type CUSUM —
    the flat-run test's generalization."""
    import datetime
    import random

    from pyspark.sql import functions as F

    from aws_lambda_redshift_loader_spark.streaming.stream_queries import (
        _cusum_from_store,
        ingest_cusum_epoch,
    )

    rng = random.Random(1701)
    t0 = datetime.datetime(2024, 3, 1)
    for trial in range(4):
        rows = []
        eid = 0
        for day in range(3):
            for i in range(25):
                # values from a tiny support -> frequent exact ties
                val = rng.choice([1.0, 1.0, 2.0, 5.0, 5.0, 9.0])
                ts = t0 + datetime.timedelta(days=day, seconds=i // 4)
                rows.append((eid % 5, eid, "m", val, ts))
                eid += 1
        ev = _mk_events(spark, rows)
        store = str(tmp_path / f"store{trial}")
        cut = rng.randrange(10, 65)
        ingest_cusum_epoch(spark, ev.filter(F.col("event_id") < cut), 0, store)
        ingest_cusum_epoch(spark, ev.filter(F.col("event_id") >= cut), 1, store)
        got = _cusum_from_store(spark, store).collect()[0].asDict()

        vs = sorted(rows, key=lambda r: (r[4], r[1]))
        v_c = [int(r[3] * 100) for r in vs]
        s, n = sum(v_c), len(v_c)
        mean = s // n
        best, run = None, 0
        for i, r in enumerate(vs):
            run += v_c[i]
            a = abs(run - (i + 1) * mean)
            key = (a, -r[4].timestamp(), -r[1])
            if best is None or key > best[0]:
                best = (key, r[1], a)
        assert got["n_events"] == n and got["mean_c"] == mean, trial
        assert got["max_abs_cusum"] == best[2], trial
        assert got["cp_event_id"] == best[1], trial
