"""Randomized equivalence tests for the round-13 operators — the hash
gates prove them on the driver fixtures; these pin the LOSSLESSNESS /
semantics claims on adversarial random inputs (bucket-boundary
timestamps, heavy shingle overlap, identical points) that a fixed
corpus may never exercise."""

from __future__ import annotations

import random

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def spark():
    from aws_lambda_redshift_loader_spark.session import get_spark

    return get_spark("r13-props")


def _write_documents(spark, path: str, texts: list[str]) -> str:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    return path


def _pairs(df) -> dict:
    return {
        (r["doc_a"], r["doc_b"]): (r["n_common"], round(r["jaccard"], 9))
        for r in df.collect()
    }


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_ppjoin_plus_equals_ppjoin_on_random_corpora(spark, tmp_path, seed):
    """All four PPJoin+ prunes (prefix/length/positional/suffix) must be
    lossless on ANY corpus — generate overlapping random token docs
    (shared cores + noise, duplicate docs, a short doc) and require the
    suffix-filtered plan to emit the identical pair set as ppjoin."""
    from aws_lambda_redshift_loader_spark.plans.registry import load_all

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    cores = [
        [rng.choice(vocab) for _ in range(rng.randint(8, 20))] for _ in range(4)
    ]
    texts = []
    for _ in range(18):
        core = list(rng.choice(cores))
        # mutate a little so Jaccard straddles the 0.5 threshold
        for _ in range(rng.randint(0, 4)):
            core[rng.randrange(len(core))] = rng.choice(vocab)
        texts.append(" ".join(core))
    texts.append(texts[0])  # exact duplicate (jaccard 1.0)
    texts.append("w0 w1 w2")  # short doc (prefix = whole doc)
    sf = _write_documents(spark, str(tmp_path), texts)

    qs = load_all()
    base = _pairs(qs["ppjoin_jaccard_pairs"].fn(spark, sf))
    plus = _pairs(qs["ppjoin_plus_jaccard_pairs"].fn(spark, sf))
    assert plus == base
    assert base, "degenerate test: no pairs above threshold"


def test_interval_overlap_grid_equals_naive(spark, tmp_path):
    """The grid-bucketized interval join (equi-join on the hour grid +
    emit-once at the max(start) bucket) must equal the naive semantic
    join for intervals engineered to hit the tricky cases: timestamps
    exactly ON bucket boundaries, zero-length intervals, multi-bucket
    sessions, several incidents inside one session."""
    import numpy as np

    from aws_lambda_redshift_loader_spark.plans.registry import load_all

    rng = random.Random(13)
    base_us = 1_700_000_000_000_000  # fixed epoch anchor (µs)
    hour = 3_600 * 1_000_000
    rows = []
    eid = 0

    def add(user, t_us, typ):
        nonlocal eid
        rows.append((user, eid, typ, t_us, 1.0))
        eid += 1

    for user in range(1, 6):
        t = base_us + user * hour  # user sessions start ON a boundary
        for _ in range(rng.randint(3, 8)):
            add(user, t, "view")
            t += rng.randint(0, 50 * 60) * 1_000_000  # may exceed gap
        add(user, t, "purchase")
    # error bursts: one exactly on an hour boundary, one spanning
    # buckets, one singleton (zero-length incident)
    for k, t0 in enumerate(
        [base_us + 2 * hour, base_us + 3 * hour + 59 * 60 * 1_000_000,
         base_us + 5 * hour + 123]
    ):
        t = t0
        for _ in range(k + 1):
            add(99, t, "error")
            t += 2 * 60 * 1_000_000
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "event_type", "ts_us", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts_us"], unit="us")
    spark.createDataFrame(
        pdf[["user_id", "event_id", "event_type", "ts", "value"]]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from aws_lambda_redshift_loader_spark.operators.relational import (
        INCIDENT_GAP_US,
        IOJ_SESSION_GAP_US,
        _US_PER_DAY,
    )

    got = {
        (
            r["user_id"], r["session_id"], r["incident_start_us"],
            r["incident_end_us"], r["n_errors"], r["overlap_us"],
        )
        for r in load_all()["interval_overlap_incidents"]
        .fn(spark, str(tmp_path))
        .collect()
    }

    # Naive reference in pandas: same islands semantics, cross-check join.
    def islands(df, keycol, gap):
        out = []
        for key, grp in df.sort_values(["ts_us", "event_id"]).groupby(keycol):
            sid, prev = 0, None
            for _, r in grp.iterrows():
                if prev is None or r["ts_us"] - prev > gap:
                    sid += 1
                prev = r["ts_us"]
                out.append((key, sid, r["ts_us"]))
        return pd.DataFrame(out, columns=[keycol, "iid", "ts_us"])

    sess = (
        islands(pdf, "user_id", IOJ_SESSION_GAP_US)
        .groupby(["user_id", "iid"])["ts_us"]
        .agg(["min", "max"])
        .reset_index()
    )
    errs = pdf[pdf["event_type"] == "error"].copy()
    errs["day"] = errs["ts_us"] // _US_PER_DAY
    inc = (
        islands(errs, "day", INCIDENT_GAP_US)
        .groupby(["day", "iid"])["ts_us"]
        .agg(["min", "max", "count"])
        .reset_index()
    )
    expected = set()
    for _, s in sess.iterrows():
        for _, i in inc.iterrows():
            if s["min"] <= i["max"] and i["min"] <= s["max"]:
                expected.add(
                    (
                        int(s["user_id"]), int(s["iid"]), int(i["min"]),
                        int(i["max"]), int(i["count"]),
                        int(min(s["max"], i["max"]) - max(s["min"], i["min"])),
                    )
                )
    assert got == expected
    assert expected, "degenerate test: no overlaps produced"
