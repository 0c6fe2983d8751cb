"""Round-15 property pins.

1. ``sequence_packing_budget_plan`` invariants on the fixture corpus:
   no window holds more than PACK_FRAG_BUDGET document fragments, token
   volume is conserved vs the unbudgeted split plan, and the emitted
   coordinates tile each (lang, bucket) stream exactly (each doc starts
   where the previous one ended plus the declared budget padding).
2. The same invariants under hypothesis on random (doc_id, lang,
   n_tokens) frames — including docs longer than the window, exact
   boundary hits, and ids crossing bucket boundaries.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import SF_ORACLE


def _check_budget_invariants(rows, C, B):
    """rows: list of dicts with lang, bucket, doc_id, n_tokens,
    first_seq, first_off, last_seq, pad_before."""
    # windows never exceed the fragment budget
    frag_count: dict[tuple, int] = {}
    for r in rows:
        for seq in range(r["first_seq"], r["last_seq"] + 1):
            k = (r["lang"], r["bucket"], seq)
            frag_count[k] = frag_count.get(k, 0) + 1
    over = {k: v for k, v in frag_count.items() if v > B}
    assert not over, f"windows over fragment budget {B}: {over}"

    # coordinates tile the stream: start == prev end + pad_before
    by_grp: dict[tuple, list] = {}
    for r in rows:
        by_grp.setdefault((r["lang"], r["bucket"]), []).append(r)
    for grp in by_grp.values():
        grp.sort(key=lambda r: r["doc_id"])
        end_p = 0
        for r in grp:
            start = r["first_seq"] * C + r["first_off"]
            assert start == end_p + r["pad_before"], (
                r["doc_id"], start, end_p, r["pad_before"])
            assert r["last_seq"] == (start + r["n_tokens"] - 1) // C
            # padding only ever skips to the NEXT window boundary
            assert 0 <= r["pad_before"] < C
            end_p = start + r["n_tokens"]


def test_budget_plan_invariants_fixture(spark):
    from aws_lambda_redshift_loader_spark.operators.text import (
        PACK_FRAG_BUDGET,
        PACK_SEQ_LEN,
        sequence_packing_budget_plan,
        sequence_packing_plan,
    )

    plan = sequence_packing_budget_plan(spark, SF_ORACLE)
    rows = [r.asDict() for r in plan.collect()]
    assert rows
    _check_budget_invariants(rows, PACK_SEQ_LEN, PACK_FRAG_BUDGET)
    # at least one budget trip on the fixture (else the test is vacuous)
    assert any(r["pad_before"] > 0 for r in rows)

    # token conservation vs the unbudgeted split plan
    base = sequence_packing_plan(spark, SF_ORACLE)
    assert (
        sum(r["n_tokens"] for r in rows)
        == sum(r["n_tokens"] for r in base.select("n_tokens").collect())
    )


pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),  # doc_id
        st.sampled_from(["en", "de"]),
        st.integers(min_value=1, max_value=1400),  # n_tokens (spans > C)
    ),
    min_size=1,
    max_size=50,
    unique_by=lambda t: t[0],
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(pack_rows)
def test_budget_plan_invariants_random(rows):
    from aws_lambda_redshift_loader_spark.operators.text import (
        PACK_BUCKET,
        PACK_FRAG_BUDGET,
        PACK_SEQ_LEN,
    )
    from aws_lambda_redshift_loader_spark.session import get_spark

    spark = get_spark("r15-props")
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "n_tokens"]).astype(
            {"doc_id": "int64", "n_tokens": "int64"}
        ),
        "doc_id bigint, lang string, n_tokens bigint",
    )
    # drive the same Arrow fold the registered query uses, on an
    # arbitrary token frame (bypasses the tokenizer)
    from aws_lambda_redshift_loader_spark.operators import text as T

    toks = df.withColumn(
        "bucket", F.expr(f"doc_id div {PACK_BUCKET}").cast("bigint")
    )
    plan = T._budget_pack_fold(toks)
    out = [r.asDict() for r in plan.collect()]
    assert len(out) == len(rows)
    _check_budget_invariants(out, PACK_SEQ_LEN, PACK_FRAG_BUDGET)
    assert sum(r["n_tokens"] for r in out) == sum(n for _, _, n in rows)
