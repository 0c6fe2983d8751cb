"""Sketch-contract checks for the two-table KMV overlap estimator and
the standing cluster-size histogram served from the incremental store."""

from __future__ import annotations

from conftest import SF_ORACLE


def test_kmv_join_distinct_sketch_contract(spark):
    from aws_lambda_redshift_loader_spark.operators.sketches import kmv_join_distinct

    [r] = kmv_join_distinct(spark, SF_ORACLE).collect()
    # structural: overlap can never exceed either exact side or the union
    assert r.exact_overlap <= min(r.exact_users_click, r.exact_users_view)
    assert r.kmv_overlap_est <= r.kmv_union_est
    assert 0 <= r.rho
    assert 0 <= r.jaccard_ppm <= 1_000_000
    # KMV union estimate: within 4/sqrt(k) of truth on this fixture
    # (k=64 -> 50%; the fixture sits far inside it — this guards sign/
    # off-by-one slips in the (K-1)*2^60/kth estimator, not tightness)
    exact_union = (
        r.exact_users_click + r.exact_users_view - r.exact_overlap
    )
    assert abs(r.kmv_union_est - exact_union) <= max(4, exact_union // 2)


def test_stream_cluster_sizes_adds_up(spark):
    from aws_lambda_redshift_loader_spark.streaming.stream_queries import (
        _ensure_doc_split,  # noqa: F401 — module import exercises registration
    )
    from aws_lambda_redshift_loader_spark.plans.registry import QUERIES

    rows = QUERIES["stream_cluster_sizes"].fn(spark, SF_ORACLE).collect()
    n_docs = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    )
    covered = sum(r.n_docs_in for r in rows)
    for r in rows:
        assert r.size >= 2  # stored clusters are multi-doc by construction
        assert r.n_docs_in == r.size * r.n_clusters
        assert r.n_singletons == n_docs - covered


def test_bloom_join_prune_lossless_and_pruning(spark):
    from aws_lambda_redshift_loader_spark.operators.sketches import bloom_join_prune

    [r] = bloom_join_prune(spark, SF_ORACLE).collect()
    # no false negatives: the pruned join must lose nothing
    assert r.n_join_rows_pruned == r.n_join_rows
    # the filtered build side must actually prune on this fixture
    assert r.n_survivors < r.n_customers
    assert r.pruned_ppm == (r.n_customers - r.n_survivors) * 1_000_000 // r.n_customers


def test_dataset_split_assign_partitions_corpus(spark):
    from aws_lambda_redshift_loader_spark.operators.text import (
        SPLIT_TRAIN_LT,
        dataset_split_assign,
    )

    rows = dataset_split_assign(spark, SF_ORACLE).collect()
    n_total = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    # splits partition the corpus exactly
    assert sum(r.n_docs for r in rows) == n_total
    assert {r.split for r in rows} <= {"train", "val", "test"}
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, {})[r.split] = r
    for lang, d in per_lang.items():
        lang_total = sum(r.n_docs for r in d.values())
        for r in d.values():
            assert r.frac_ppm == r.n_docs * 1_000_000 // lang_total
        # train must dominate (binomial wobble can't flip 80/10/10
        # ordering at fixture sizes)
        assert d["train"].n_docs > max(
            (d[s].n_docs for s in ("val", "test") if s in d), default=0
        )
