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


def test_cdc_boundaries_resync_after_prefix_insert(spark):
    """THE content-defined-chunking property: prepend bytes to a document
    and the chunk set re-synchronizes after at most ~one chunk — unlike
    fixed-size blocks where every block shifts. Chunk a doc and a
    prefix-shifted copy; all chunks except the first O(1) must be
    byte-identical (same content hashes)."""
    from aws_lambda_redshift_loader_spark.operators import dedup as D
    from pyspark.sql import functions as F

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carry small lanterns across a quiet wooden bridge "
        "and every sentence here only exists to give the rolling hash "
        "enough entropy to cut several content defined boundaries in it "
        "one two three four five six seven eight nine ten eleven twelve"
    ) * 4
    shifted = "PREFIX INSERTED TEXT " + base
    df = spark.createDataFrame(
        [(1, base, "en", "t", len(base)), (2, shifted, "en", "t", len(shifted))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = f"/tmp/cdc_resync_{abs(hash(base)) % 10**8}"
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    # cdc_chunks reports only duplicated chunks — which is exactly the
    # re-synchronized suffix: chunks shared by doc 1 and doc 2.
    rep = D.cdc_chunks(spark, tmp).filter(F.col("n_docs") == 2).collect()
    # Count doc-1's total chunks to bound the non-shared head.
    from aws_lambda_redshift_loader_spark.functions.scalar import (
        ROLL_B,
        ROLL_P,
    )

    def chunks_of(text: str) -> list[str]:
        t = text.lower()
        cs = [ord(c) for c in t]
        w, d = D.CDC_W, D.CDC_DIV
        gh = []
        for i in range(len(cs) - w + 1):
            acc = 0
            for j in range(i, i + w):
                acc = (acc * ROLL_B + cs[j]) % ROLL_P
            gh.append(acc)
        starts = [0] + [i + w for i, h in enumerate(gh) if h % d == 0]
        starts = [s for s in starts if s < len(t)]
        return [t[a:b] for a, b in zip(starts, starts[1:] + [len(t)])]

    c1, c2 = chunks_of(base), chunks_of(shifted)
    shared = set(c1) & set(c2)
    # Re-sync: every DISTINCT chunk of the base except at most the head
    # chunk (and its tail counterpart) must also appear in the shifted
    # copy — the boundaries realign on content after the insertion.
    assert len(set(c1) - shared) <= 2, (sorted(set(c1) - shared), len(shared))
    # And the Spark+oracle report sees those shared chunks as cross-doc
    # duplicates (sanity that the distributed chunker agrees with the
    # reference implementation above).
    reported = {r.chunk_hash for r in rep}
    import hashlib

    expected = {hashlib.md5(c.encode()).hexdigest() for c in shared}
    assert expected <= reported, "distributed chunker missed re-synced chunks"


def test_rolling_hash_unicode_parity(spark, tmp_path):
    """The rolling-hash family (winnowing, CDC) must agree with the
    DuckDB oracle on NON-ASCII text too: Spark's split('')+ascii() and
    DuckDB's string_split('')+unicode() both decode full codepoints
    (incl. non-BMP emoji — no UTF-16 surrogate splitting), so the
    codepoint arrays and every downstream hash are identical. Guarded
    here because the committed fixtures are ASCII and would never catch
    a regression in this."""
    import duckdb
    from aws_lambda_redshift_loader_spark.operators.dedup import cdc_chunks
    from aws_lambda_redshift_loader_spark.operators.text import (
        winnowing_fingerprints,
    )
    from aws_lambda_redshift_loader_spark.plans.registry import QUERIES

    docs = [
        (1, "héllo wörld ünïcode tést crème brûlée façade naïve " * 8, "fr", "t", 0),
        (2, "日本語のテキストと绝对中文内容が混ざった文書です。" * 12, "ja", "t", 0),
        (3, "emoji 🎉 inside 🚀 the 🌍 stream " * 10, "en", "t", 0),
        (4, "héllo wörld ünïcode tést crème brûlée façade naïve " * 8, "fr", "t", 0),
    ]
    df = spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s, _ in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "uni")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(repr(r[i]) for i in order) for r in rows)

    from aws_lambda_redshift_loader_spark.operators import dedup as D

    for name, fn in (
        ("winnowing_fingerprints", winnowing_fingerprints),
        ("cdc_chunks", cdc_chunks),
        # token-grain hashing: md5 over UTF-8 token bytes + \s+ norm —
        # docs 1 and 4 are identical, so minhash must emit their pair
        ("simhash_docs", D.simhash_docs),
        ("minhash_lsh_pairs", D._minhash_pairs_plan),
    ):
        sdf = fn(spark, d)
        res = con.execute(QUERIES[name].oracle)
        a = norm([tuple(r) for r in sdf.collect()], sdf.columns)
        b = norm(res.fetchall(), [x[0] for x in res.description])
        assert a == b, f"{name} diverged on unicode text"
        assert len(a) > 0
    D._PAIRS_MEMO.clear()  # don't leak the tiny test corpus's pair memo


def test_cc_local_and_distributed_paths_agree(spark):
    """connected_components' size-gated union-find fast path and the
    Pregel min-label loop must compute the identical fixpoint; the gate
    would otherwise hide loop regressions at fixture scale."""
    from aws_lambda_redshift_loader_spark.operators import dedup

    pairs = spark.createDataFrame(
        # two components {1,2,3,9} and {5,7}, plus a self-contained chain
        [(1, 2), (2, 3), (3, 9), (5, 7), (10, 11), (11, 12)],
        "doc_a bigint, doc_b bigint",
    )
    local = {
        (r["node"], r["cluster_id"])
        for r in dedup.connected_components(spark, pairs, "doc_a", "doc_b").collect()
    }
    old = dedup.CC_LOCAL_EDGE_MAX
    dedup.CC_LOCAL_EDGE_MAX = -1  # force the distributed loop
    try:
        dist = {
            (r["node"], r["cluster_id"])
            for r in dedup.connected_components(spark, pairs, "doc_a", "doc_b").collect()
        }
    finally:
        dedup.CC_LOCAL_EDGE_MAX = old
    expected = {(1, 1), (2, 1), (3, 1), (9, 1), (5, 5), (7, 5), (10, 10), (11, 10), (12, 10)}
    assert local == expected
    assert dist == expected


def test_pair_graph_memo_builds_once(spark):
    """The shared pair-graph memo must build on the FIRST consumer and
    cache-hit on every later one within a (session, corpus) — the
    architecture bench.py's memo_events labels rely on."""
    from aws_lambda_redshift_loader_spark.operators import dedup
    from aws_lambda_redshift_loader_spark.plans.registry import load_all

    sf = "/root/testdata/sf0.001"
    specs = load_all()
    dedup._PAIRS_MEMO.clear()
    dedup._CC_MEMO.clear()
    del dedup.MEMO_EVENTS[:]
    specs["minhash_lsh_pairs"].fn(spark, sf).count()
    specs["dedup_connected_components"].fn(spark, sf).count()
    specs["dedup_cluster_keep_best"].fn(spark, sf).count()
    assert dedup.MEMO_EVENTS.count("pairs_build") == 1
    assert dedup.MEMO_EVENTS.count("cc_build") == 1
    assert "pairs_hit" in dedup.MEMO_EVENTS or "cc_hit" in dedup.MEMO_EVENTS


def test_kcore_frames_path_equals_driver_path(spark):
    """kcore_token_graph's size-gated driver peel and the distributed
    per-round frames path must produce identical per-round stats (the
    CC union-find equivalence contract applied to the peel loop)."""
    from aws_lambda_redshift_loader_spark.operators import text as tx

    from conftest import SF_SMOKE

    fast = {tuple(r) for r in tx.kcore_token_graph(spark, SF_SMOKE).collect()}
    old = tx.KCORE_LOCAL_EDGE_MAX
    tx.KCORE_LOCAL_EDGE_MAX = -1  # force the distributed frames path
    try:
        frames = {tuple(r) for r in tx.kcore_token_graph(spark, SF_SMOKE).collect()}
    finally:
        tx.KCORE_LOCAL_EDGE_MAX = old
    assert fast == frames and len(fast) == tx.KCORE_ROUNDS + 1
