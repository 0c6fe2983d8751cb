"""Round-16 property pins.

1. ``_waterfill`` max-min-fairness invariants under hypothesis on
   random (lang, n_tokens) frames: caps respected, budget never
   exceeded, every uncapped language gets the identical integer share,
   and no capped language gets less than an uncapped one.
2. ``curriculum_budget_selection``'s banded plan equals the naive
   per-language quality-order prefix recomputed in Python.
3. ``cusum_changepoint_events``'s day-banded distributed prefix sum
   equals the naive per-type CUSUM recomputed in Python.
4. ``vocab_coverage_curve`` / ``copurchase_node_jaccard`` output
   invariants (monotone coverage, Jaccard bounds, rank ordering).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import SF_ORACLE

alloc_rows = st.lists(
    st.tuples(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
        st.integers(min_value=1, max_value=10_000_000),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(alloc_rows)
def test_waterfill_invariants_random(rows):
    from aws_lambda_redshift_loader_spark.operators.text import (
        BUDGET_MAX_EPOCHS,
        BUDGET_MULT,
        _waterfill,
    )
    from aws_lambda_redshift_loader_spark.session import get_spark

    spark = get_spark("r16-props")
    sizes = spark.createDataFrame(rows, "lang string, n_tokens long")
    out = {r["lang"]: r.asDict() for r in _waterfill(sizes).collect()}
    assert set(out) == {lang for lang, _ in rows}
    total = sum(n for _, n in rows)
    budget = BUDGET_MULT * total
    for lang, n in rows:
        r = out[lang]
        assert r["cap_tokens"] == BUDGET_MAX_EPOCHS * n
        assert 0 <= r["alloc_tokens"] <= r["cap_tokens"]
        assert r["capped"] == (1 if r["alloc_tokens"] >= r["cap_tokens"] else 0)
    # budget never exceeded
    assert sum(r["alloc_tokens"] for r in out.values()) <= budget
    # max-min fairness: every uncapped language holds the identical
    # integer share, and no capped language is below any uncapped one
    # (a cap only ever REMOVES allocation).
    uncapped = [r["alloc_tokens"] for r in out.values() if not r["capped"]]
    capped = [r["alloc_tokens"] for r in out.values() if r["capped"]]
    assert len(set(uncapped)) <= 1
    if uncapped and capped:
        assert max(capped) <= uncapped[0]


def test_budget_selection_equals_naive_prefix(spark):
    from aws_lambda_redshift_loader_spark.operators.text import (
        WARMUP_FRAC_DIV,
        _pack_tokens,
        _warmup_window_frame,
        _waterfill,
        curriculum_budget_selection,
    )
    from aws_lambda_redshift_loader_spark.operators.relational import table
    from pyspark.sql import functions as F

    win = [r.asDict() for r in _warmup_window_frame(spark, SF_ORACLE).collect()]
    toks = _pack_tokens(table(spark, SF_ORACLE, "documents"))
    sizes = toks.groupBy("lang").agg(
        F.sum("n_tokens").cast("bigint").alias("n_tokens")
    )
    alloc = {
        r["lang"]: r["alloc_tokens"] // WARMUP_FRAC_DIV
        for r in _waterfill(sizes).collect()
    }
    expected = {}
    by_lang: dict[str, list] = {}
    for r in win:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (-r["window_quality_q"], r["bucket"], r["seq_id"]))
        cum = 0
        for r in rows:
            if cum >= alloc[lang]:
                break
            cum += r["fill_tokens"]
            expected[(lang, r["bucket"], r["seq_id"])] = (
                cum,
                1 if cum > alloc[lang] else 0,
            )
    got = {
        (r["lang"], r["bucket"], r["seq_id"]): r.asDict()
        for r in curriculum_budget_selection(spark, SF_ORACLE).collect()
    }
    assert set(got) == set(expected), (
        f"selection mismatch: only-spark={set(got) - set(expected)} "
        f"only-naive={set(expected) - set(got)}"
    )
    for k, (cum, straddles) in expected.items():
        assert got[k]["straddles"] == straddles, (k, cum, got[k])
    # both branches genuinely fire on the fixture
    n_windows = {lang: len(rows) for lang, rows in by_lang.items()}
    n_sel = {}
    for (lang, _, _) in got:
        n_sel[lang] = n_sel.get(lang, 0) + 1
    assert any(n_sel[lang] == n_windows[lang] for lang in n_sel), "no full-selection lang"
    assert any(n_sel[lang] < n_windows[lang] for lang in n_sel), "no strict-prefix lang"
    assert any(r["straddles"] == 1 for r in got.values()), "no straddling window"


def test_cusum_banded_equals_naive(spark):
    from aws_lambda_redshift_loader_spark.operators.windows_sql import (
        cusum_changepoint_events,
    )
    from aws_lambda_redshift_loader_spark.session import table
    from pyspark.sql import functions as F

    ev = (
        table(spark, SF_ORACLE, "events")
        .filter(F.col("value") >= 0)
        .select(
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("us"),
            F.floor(F.col("value") * 100).cast("bigint").alias("v_c"),
        )
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r)
    expected = {}
    for t, rows in by_type.items():
        rows.sort(key=lambda r: (r["us"], r["event_id"]))
        n = len(rows)
        s = sum(r["v_c"] for r in rows)
        mean = s // n  # all v_c >= 0 -> floor == trunc
        run, best = 0, None
        for i, r in enumerate(rows, start=1):
            run += r["v_c"]
            a = abs(run - i * mean)
            if best is None or a > best[0]:
                best = (a, r["event_id"])
        expected[t] = {
            "n_events": n,
            "mean_c": mean,
            "cp_event_id": best[1],
            "max_abs_cusum": best[0],
        }
    got = {
        r["event_type"]: r.asDict()
        for r in cusum_changepoint_events(spark, SF_ORACLE).collect()
    }
    assert set(got) == set(expected)
    for t in expected:
        for k, v in expected[t].items():
            assert got[t][k] == v, (t, k, v, got[t][k])


def test_coverage_curve_monotone(spark):
    from aws_lambda_redshift_loader_spark.operators.text import (
        vocab_coverage_curve,
    )

    rows = sorted(
        (r.asDict() for r in vocab_coverage_curve(spark, SF_ORACLE).collect()),
        key=lambda r: r["rank"],
    )
    assert rows and rows[0]["rank"] == 1
    prev_cum, prev_cov, prev_cnt = 0, 0, None
    for r in rows:
        assert r["cum_f"] == prev_cum + r["token_count"]
        assert r["coverage_ppm"] >= prev_cov
        assert r["coverage_ppm"] <= 1_000_000
        if prev_cnt is not None:
            assert r["token_count"] <= prev_cnt  # head is frequency-sorted
        prev_cum, prev_cov, prev_cnt = r["cum_f"], r["coverage_ppm"], r["token_count"]


def test_node_jaccard_bounds(spark):
    from aws_lambda_redshift_loader_spark.operators.relational import (
        copurchase_node_jaccard,
    )

    rows = sorted(
        (r.asDict() for r in copurchase_node_jaccard(spark, SF_ORACLE).collect()),
        key=lambda r: r["rank"],
    )
    assert rows
    prev = None
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert 1 <= r["common_n"] <= min(r["deg_a"], r["deg_b"])
        expect = r["common_n"] * 1_000_000 // (
            r["deg_a"] + r["deg_b"] - r["common_n"]
        )
        assert r["jaccard_ppm"] == expect
        assert 0 < r["jaccard_ppm"] <= 1_000_000
        if prev is not None:
            assert (
                (prev["jaccard_ppm"], ) >= (r["jaccard_ppm"], )
            ), "rank order broken"
        prev = r
