"""Round-18 optimization property pins.

The r18 round replaced interpreted Catalyst higher-order expressions
with vectorized numpy twins (guide §4.2) in the CDC/winnowing family.
These tests pin the numpy kernels against naive Python re-implementations
of the ORIGINAL recurrences, independent of both Spark and DuckDB — so
the oracle gate (engine-vs-engine) and this gate (kernel-vs-math) fail
independently if either side drifts.
"""

from __future__ import annotations

import random
import string

from aws_lambda_redshift_loader_spark.functions.scalar import (
    ROLL_B,
    ROLL_P,
    make_kr_gram_hasher,
)


def _naive_gram_hashes(text: str, k: int) -> list[int]:
    """The original rolling_hash_expr recurrence, verbatim."""
    codes = [ord(c) for c in text]
    out = []
    for i in range(len(codes) - k + 1):
        acc = 0
        for j in range(i, i + k):
            acc = (acc * ROLL_B + codes[j]) % ROLL_P
        out.append(acc)
    return out


def test_kr_kernel_matches_recurrence():
    rng = random.Random(1234)
    alphabet = string.printable + "äöüß中日√"
    for k in (8, 16):
        gram_hashes = make_kr_gram_hasher(k)
        for _ in range(40):
            n = rng.randint(k, 2500)
            t = "".join(rng.choice(alphabet) for _ in range(n))
            assert list(gram_hashes(t)) == _naive_gram_hashes(t, k)
        # shorter than k → empty, same as a sequence(1, n-k+1) with n<k
        assert list(gram_hashes("x" * (k - 1))) == []


def test_kr_kernel_power_cache_growth():
    """The on-demand power-table growth must not corrupt earlier
    results: hash a long doc after a short one and vice versa."""
    gram_hashes = make_kr_gram_hasher(8)
    short = "abcdefghij" * 2
    long = "klmnopqrstuv" * 400
    a1 = list(gram_hashes(short))
    b1 = list(gram_hashes(long))
    assert a1 == _naive_gram_hashes(short, 8)
    assert b1 == _naive_gram_hashes(long, 8)
    # repeat after the cache grew
    assert list(gram_hashes(short)) == a1
    assert list(gram_hashes(long)) == b1


def _naive_winnow(text: str, k: int, w: int) -> set[int]:
    """The original window-SQL semantics: per position, min of the next
    w gram hashes (shorter at the tail), then DISTINCT."""
    gh = _naive_gram_hashes(text, k)
    return {min(gh[i : i + w]) for i in range(len(gh))}


def test_winnow_tail_windows_match_sql_semantics():
    """The numpy sliding-min splits full windows from the shortening
    tail; pin against the naive per-position min for lengths around the
    window-size boundary (m < w, m == w, m > w)."""
    import numpy as np

    from aws_lambda_redshift_loader_spark.operators.text import WINNOW_K, WINNOW_W

    gram_hashes = make_kr_gram_hasher(WINNOW_K)
    rng = random.Random(99)
    for n in [WINNOW_K, WINNOW_K + 1, WINNOW_K + WINNOW_W - 1,
              WINNOW_K + WINNOW_W, WINNOW_K + WINNOW_W + 1, 200, 1000]:
        t = "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))
        gh = gram_hashes(t)
        m = len(gh)
        full = (
            np.lib.stride_tricks.sliding_window_view(gh, WINNOW_W).min(axis=1)
            if m >= WINNOW_W
            else np.empty(0, dtype=np.int64)
        )
        tail = np.minimum.accumulate(gh[max(m - WINNOW_W + 1, 0):][::-1])[::-1]
        got = set(np.unique(np.concatenate((full, tail))).tolist())
        assert got == _naive_winnow(t, WINNOW_K, WINNOW_W), n


def test_bucket_topg_lexsort_matches_row_loop():
    """r18: the whole-matrix lexsort that replaced the per-row Python
    loops in the gann bucket kernels (similarity._gann_edges /
    stream_queries gann delta) must reproduce the original recurrence
    exactly — per row, top-k by (cos DESC, dst ASC) with self masked to
    -inf. Heavy ties on purpose: cosines are drawn from a tiny
    quantized set so the id tie-break decides most slots."""
    import numpy as np

    rng = random.Random(99)
    for trial in range(30):
        n = rng.randrange(2, 40)
        g = rng.choice([1, 3, 8, n, n + 5])
        ids = np.array(
            sorted(rng.sample(range(1000), n)), dtype="int64"
        )
        rng.shuffle(ids)
        cos = np.array(
            [[rng.choice([0.0, 0.25, 0.5, 1.0]) for _ in range(n)] for _ in range(n)]
        )
        # original recurrence
        want = []
        for i in range(n):
            row = cos[i].copy()
            row[i] = -np.inf
            order = np.lexsort((ids, -row))
            for j in order[: min(g, n - 1)]:
                want.append((ids[i], ids[j], row[j]))
        # vectorized twin (the shipped expression)
        c = cos.copy()
        np.fill_diagonal(c, -np.inf)
        k = min(g, n - 1)
        order2 = np.lexsort((np.broadcast_to(ids, c.shape), -c), axis=-1)[:, :k]
        got = list(
            zip(
                np.repeat(ids, k),
                ids[order2].ravel(),
                np.take_along_axis(c, order2, axis=1).ravel(),
            )
        )
        assert [(int(a), int(b), float(x)) for a, b, x in got] == [
            (int(a), int(b), float(x)) for a, b, x in want
        ], f"trial {trial} n={n} g={g}"


def test_shuffle_partitions_derive_from_execution_width(monkeypatch):
    """The session default shuffle parallelism must track the pinned core
    count ($SPARK_GRAFT_CPUS), not a local[32] constant, so the driver's
    lower-core-count scaling runs get a proportionate default."""
    import os

    from aws_lambda_redshift_loader_spark.session import _shuffle_partitions

    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    assert _shuffle_partitions() == "8"
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    assert _shuffle_partitions() == "32"
    # unset / wildcard fall back to the host width, never a literal
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "*")
    assert _shuffle_partitions() == str(os.cpu_count() or 8)
    monkeypatch.delenv("SPARK_GRAFT_CPUS")
    assert _shuffle_partitions() == str(os.cpu_count() or 8)
