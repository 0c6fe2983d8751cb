"""Semantic property tests for the round-6 dedup operators, on synthetic
data (the oracle tests prove cross-engine parity; these prove the
operators' CONTRACTS hold independent of the TPC-H fixtures).

- fuzzy_match_names claims EXACT edit-distance<=1 pair recall via
  deletion neighborhoods: every substitution/insertion/deletion pair
  must be found, and no dist>=2 pair may survive the verify stage.
- duplicated_spans claims every cross-doc shared run of >= SPAN_K tokens
  becomes one MAXIMAL span, and unique text yields nothing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _fuzzy_pairs(spark, names):
    """Run the fuzzy operator's exact logic over an in-memory customer
    table (monkeypatch-free: we rebuild the plan through the registry fn
    by materializing a parquet fixture)."""
    import tempfile

    from aws_lambda_redshift_loader_spark.operators.relational import fuzzy_match_names

    tmp = tempfile.mkdtemp(prefix="fuzzy_fixture_")
    spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "c_custkey BIGINT, c_name STRING"
    ).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    out = fuzzy_match_names(spark, tmp)
    return {(r.key_a, r.key_b): r.dist for r in out.collect()}


def test_fuzzy_finds_every_dist1_pair_kind(spark):
    names = [
        "alpha bravo",    # 0: base
        "alpha bravx",    # 1: substitution at the end       -> dist 1 to 0
        "alpha brav",     # 2: deletion at the end           -> dist 1 to 0,1
        "xlpha bravo",    # 3: substitution at position 1    -> dist 1 to 0
        "aalpha bravo",   # 4: insertion at position 2       -> dist 1 to 0
        "totally different string",  # 5: no pair at all
        "alpha bravo",    # 6: exact duplicate               -> dist 0 to 0
    ]
    got = _fuzzy_pairs(spark, names)
    for pair, dist in [((0, 1), 1), ((0, 2), 1), ((1, 2), 1), ((0, 3), 1),
                       ((0, 4), 1), ((0, 6), 0), ((1, 6), 1)]:
        assert got.get(pair) == dist, f"missing/wrong {pair}: {got}"
    assert not any(5 in p for p in got), "dist>=2 pair leaked through verify"
    assert all(d <= 1 for d in got.values())


def test_duplicated_spans_maximal_and_silent_on_unique(spark):
    import tempfile

    from aws_lambda_redshift_loader_spark.operators.dedup import SPAN_K, duplicated_spans

    shared = " ".join(f"tok{i}" for i in range(SPAN_K + 4))  # 12-token run
    docs = [
        (0, f"aa bb cc {shared} dd ee"),
        (1, f"zz yy {shared} xx ww vv uu"),
        (2, "entirely unique content with no repeats at all " * 3),
    ]
    tmp = tempfile.mkdtemp(prefix="spans_fixture_")
    spark.createDataFrame(docs, "doc_id BIGINT, text STRING").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/documents.parquet")
    rows = {
        r.doc_id: (r.span_start, r.span_len)
        for r in duplicated_spans(spark, tmp).collect()
    }
    # Doc 0: shared run starts after 3 tokens, doc 1 after 2; both spans
    # must be MAXIMAL (exactly the 12 shared tokens, merged from 5
    # overlapping shingles — not 5 separate spans).
    assert rows[0] == (3, SPAN_K + 4)
    assert rows[1] == (2, SPAN_K + 4)
    assert 2 not in rows, "unique doc reported a duplicated span"


def test_duplicated_spans_requires_k_tokens(spark):
    import tempfile

    from aws_lambda_redshift_loader_spark.operators.dedup import SPAN_K, duplicated_spans

    short_shared = " ".join(f"s{i}" for i in range(SPAN_K - 1))  # one short
    docs = [(0, f"a b {short_shared}"), (1, f"{short_shared} c d")]
    tmp = tempfile.mkdtemp(prefix="spans_short_")
    spark.createDataFrame(docs, "doc_id BIGINT, text STRING").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/documents.parquet")
    assert duplicated_spans(spark, tmp).count() == 0
