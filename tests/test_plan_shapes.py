"""Physical-plan regression tests: the properties that make these
queries scale (pushdown, pruning, broadcast strategy, map-side top-k)
are asserted directly on .explain output, so a refactor that silently
degrades the plan — not just the answer — fails CI.

These complement tests/test_bucketing.py (zero-Exchange co-located
join) and tests/test_sorted_write.py (data-skipping layout).
"""

from __future__ import annotations

import pytest

from aws_lambda_redshift_loader_spark.plans.registry import load_all

from conftest import SF_SMOKE

SPECS = load_all()


def _formatted(spark, name):
    df = SPECS[name].fn(spark, SF_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _formatted(spark, "pricing_summary")
    # The shipdate predicate must reach the parquet scan...
    assert "PushedFilters:" in plan and "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]
    # ...and the scan must not read all 16 lineitem columns.
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert read_schema.count(",") < 10, f"column pruning lost: {read_schema}"


def test_revenue_by_nation_all_dimensions_broadcast(spark):
    plan = _formatted(spark, "revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "a dimension fell off the broadcast path"


def test_semi_join_stays_semi(spark):
    plan = _formatted(spark, "semi_join_active_customers")
    assert "LeftSemi" in plan


def test_tfidf_topk_limits_before_shuffle(spark):
    # WindowGroupLimit must appear BELOW the rank exchange too (map-side
    # partial top-k), not only after it.
    plan = _formatted(spark, "tfidf_top_terms")
    assert plan.count("WindowGroupLimit") >= 2, "map-side rank limit missing"


def test_longest_prefix_route_broadcasts_config_side(spark):
    # Non-equi startswith theta join against a KB config table: a
    # BroadcastNestedLoopJoin is the right plan; a shuffled cartesian is not.
    plan = _formatted(spark, "longest_prefix_route")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def _analyzed(spark, name):
    # Post-analysis, pre-optimization plan: explicit broadcast()/hint()
    # calls survive here as ResolvedHint nodes, so this is the one place
    # a forced-broadcast anti-pattern is mechanically detectable (the
    # optimizer folds hints into join nodes later).
    df = SPECS[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().analyzed().toString()


@pytest.mark.parametrize("name", ["ngram_jaccard_pairs", "minhash_lsh_pairs"])
def test_dedup_verify_never_hints_broadcast(spark, name):
    # The verify step must not broadcast a one-row-per-document sizes
    # table (unbounded at corpus scale → driver OOM). n_shingles rides on
    # the candidate rows instead; no hint of any kind is acceptable here.
    assert "ResolvedHint" not in _analyzed(spark, name)


def test_bloom_probe_broadcasts_only_bounded_bitsets(spark):
    # The only legitimate broadcasts in the bloom probe are the K
    # bit-position tables, each <= BLOOM_M rows by construction — all K
    # must be present (dropping one degrades the probe to a shuffle).
    # The ground-truth membership join (unbounded build-key cardinality)
    # must carry no hint: no ResolvedHint subtree may mention the
    # membership flag column.
    from aws_lambda_redshift_loader_spark.operators.sketches import BLOOM_K

    plan = _analyzed(spark, "bloom_filter_probe")
    assert plan.count("ResolvedHint") == BLOOM_K
    for subtree in _hint_subtrees(plan):
        assert "is_member_flag" not in subtree, (
            "broadcast hint reattached to the unbounded membership join:\n" + subtree
        )


def _hint_subtrees(plan: str) -> list[str]:
    # A node's subtree in Spark's tree rendering is the run of following
    # lines with strictly greater indentation (indent = chars before the
    # node name, counting the +-/:- connector prefix).
    lines = plan.splitlines()

    def indent(line: str) -> int:
        stripped = line.lstrip(" :+-")
        return len(line) - len(stripped)

    subtrees = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line:
            continue
        depth = indent(line)
        block = [line]
        for nxt in lines[i + 1 :]:
            if indent(nxt) <= depth:
                break
            block.append(nxt)
        subtrees.append("\n".join(block))
    return subtrees


def test_cms_only_probe_prunes_candidate_scan(spark):
    # The sketch-only heavy-hitters form: the only per-token aggregate is
    # the candidate DISTINCT over a doc_id-pruned scan (pushdown must
    # reach parquet); the full-corpus side touches nothing keyed on token.
    from aws_lambda_redshift_loader_spark.operators.sketches import CMS_CAND_DOCS

    plan = _formatted(spark, "heavy_hitters_cms_only")
    assert f"LessThan(doc_id,{CMS_CAND_DOCS})" in plan, "candidate scan not pruned"
    # The sketch build aggregates on `bucket` (bounded WIDTH), never on a
    # raw token column: no exact per-token count anywhere in this plan.
    aggs = [ln for ln in plan.splitlines() if "Keys [1]: [token" in ln]
    # Only the candidate-distinct (pruned side) may key on token.
    assert len(aggs) <= 2, f"unexpected token-keyed aggregates:\n" + "\n".join(aggs)


@pytest.mark.parametrize(
    "name",
    ["pricing_summary", "langid_heuristic", "gopher_quality_rules", "token_count"],
)
def test_scan_queries_have_no_python_in_row_path(spark, name):
    # These operators advertise JVM-only row paths; a sneaky Python UDF
    # would show up as BatchEvalPython / ArrowEvalPython.
    plan = _formatted(spark, name)
    assert "EvalPython" not in plan, f"{name} fell off the codegen path"


def test_funnel_has_no_window_or_join(spark):
    # The funnel is two hash aggregates (per-user conditional MINs + the
    # global fold) — a window or self-join here would be the slow shape.
    plan = _formatted(spark, "funnel_conversion")
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_ccnet_sorts_only_the_sample(spark):
    # Tertile calibration must sort ONLY the hash-gated sample: the Sort
    # feeding the row_number window sits above the md5-gate Filter, and
    # the full-corpus bucketing side carries no Sort at all.
    plan = _formatted(spark, "ccnet_bucket")
    assert "pmod" in plan or "%" in plan  # the sample gate survived
    # exactly one ranking window (over the sample), none over the corpus
    assert plan.count("row_number") == 1


@pytest.mark.parametrize("name", ["line_dedup_fraction", "dedup_cluster_keep_best"])
def test_round5_dedup_queries_never_hint_broadcast(spark, name):
    # Same invariant as the other dedup paths: per-doc/per-line aggregate
    # tables are unbounded — no forced broadcasts anywhere.
    assert "ResolvedHint" not in _analyzed(spark, name)


def test_document_chunking_is_map_only(spark):
    # The chunking transform must stay embarrassingly parallel: tokenize,
    # explode a per-doc index sequence, slice — any Exchange here means a
    # needless full-corpus shuffle at the widest point of the pipeline.
    df = SPECS["document_chunking"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "document_chunking grew a shuffle"


def test_mad_outliers_broadcasts_group_stats(spark):
    # The per-group median/MAD join-backs are |groups|-row frames: they
    # must broadcast, never shuffle the event stream a third time.
    plan = _formatted(spark, "mad_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cdc_chunking_shuffles_only_the_report(spark):
    # Rabin chunking is map-only per document; the only exchanges allowed
    # are the report aggregate's two-phase COUNT(DISTINCT doc_id) pair
    # (partial on (chunk_hash, doc_id), final on chunk_hash) — both at
    # chunk-report grain. A third exchange means chunking itself grew a
    # corpus shuffle.
    df = SPECS["cdc_chunks"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 2, f"cdc_chunks grew extra shuffles ({n_exchanges})"


def test_bm25_broadcasts_query_side(spark):
    # Query terms / IDF / corpus stats are broadcast by definition-of-
    # tiny; the corpus postings stream must never sort-merge against them.
    plan = _formatted(spark, "bm25_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "bm25 query side fell off broadcast"


def test_zorder_key_is_pure_codegen(spark):
    # The Morton key must be whole-stage-codegen integer arithmetic —
    # no Python, no UDF — and the extents join a 1-row broadcast.
    plan = _formatted(spark, "zorder_layout_audit")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_mmr_single_shuffle_epilogue(spark):
    # Pool construction (broadcast queries + per-query window) plus ONE
    # groupBy-query exchange into the Arrow greedy; a second corpus-wide
    # exchange means the pool stopped bounding the epilogue.
    plan = _formatted(spark, "mmr_diverse_topk")
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan
    assert plan.count("SortMergeJoin") == 0


def test_cosine_neardup_verifies_in_bucket_groups(spark):
    # The verify stage must be the per-(table,bucket) Arrow GEMM — one
    # grouped exchange — not the old id-pair self-join + per-pair fold
    # (which moved the O(T*N*occupancy) candidate set through three
    # shuffles). A SortMergeJoin or a zip_with in this plan means the
    # slow shape crept back.
    plan = _formatted(spark, "embedding_cosine_neardup")
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan
    assert "SortMergeJoin" not in plan
    assert "zip_with" not in plan, "per-pair fold verify reappeared"


def test_mmr_ann_and_rrf_are_bounded_epilogues(spark):
    # The IVF-pooled MMR must end in the same Arrow greedy group-map as
    # the brute-force variant; the RRF fusion must stay a join+window
    # over two top-k lists (no corpus-wide sort-merge anywhere).
    plan = _formatted(spark, "mmr_ann_topk")
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan
    plan = _formatted(spark, "hybrid_rrf_topk")
    assert "CartesianProduct" not in plan


def _scored_build_plan(spark, builder):
    # The scorer frames are session-memoized (localCheckpoint), so the
    # consumer queries' physical plans show only an RDD scan; the plan
    # properties live in the BUILD plan, asserted here directly.
    df = builder(spark, SF_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_dsir_weight_table_broadcasts(spark):
    # The 512-row bucket weight table must join the gram stream as a
    # broadcast; a shuffled join would move the whole gram set twice.
    # Both the exact top-K and the scalable form consume this one
    # memoized frame, so the build plan is the single place to lock.
    from aws_lambda_redshift_loader_spark.operators.text import _dsir_scored_plan

    plan = _scored_build_plan(spark, _dsir_scored_plan)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_nb_scorer_weight_table_broadcasts(spark):
    # Same contract for the learned NB scorer's 512-row weight table
    # (its consumers see only the memoized scan).
    from aws_lambda_redshift_loader_spark.operators.text import _nb_scored_plan

    plan = _scored_build_plan(spark, _nb_scored_plan)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_calibration_scorers_weight_table_broadcasts(spark):
    # The curve epilogue (decile stats join over the memoized scorer
    # frames) must stay broadcast-shaped and cartesian-free; the NB
    # weight-table broadcast itself is locked on the build plan by
    # test_nb_scorer_weight_table_broadcasts.
    plan = _formatted(spark, "quality_calibration_scorers")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_has_no_cartesian(spark):
    # Cosine pair generation must stay LSH-bucketed (the group-local GEMM
    # path) — no cartesian/nested-loop pair enumeration anywhere.
    plan = _formatted(spark, "semantic_dedup_clusters")
    assert "CartesianProduct" not in plan


def test_token_savings_broadcasts_labels(spark):
    # Cluster labels are edge-list-sized; the corpus-side join must
    # broadcast them, never shuffle the tokenized corpus.
    plan = _formatted(spark, "dedup_token_savings")
    assert "BroadcastHashJoin" in plan


def test_calibration_curve_no_cartesian(spark):
    # Scorer and gate join on doc_id; the only single-partition stage is
    # the documented global ntile (one row per doc).
    plan = _formatted(spark, "quality_calibration_curve")
    assert "CartesianProduct" not in plan


def test_banded_rank_has_no_single_partition_exchange(spark):
    # The banded global rank is the 100 TB rewrite of an unpartitioned
    # row_number window: its plan must contain a PARTITIONED window and
    # zero single-partition exchanges (the exact form funnels every row
    # through one task — that shape regressing back in is the bug).
    from pyspark.sql import functions as F

    from aws_lambda_redshift_loader_spark.operators.text import (
        _banded_rank,
        _doc_surprisal,
    )

    scored = _doc_surprisal(spark, SF_SMOKE).select(
        "doc_id",
        (F.col("surprisal_q").cast("double") / F.col("n_tokens")).alias("s"),
    )
    df, _n = _banded_rank(scored, "s", "r_s")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    base = scored._jdf.queryExecution().explainString(mode)
    assert "Window" in plan
    # The scored frame itself carries one SinglePartition exchange (the
    # 1-row corpus-total scalar aggregate); the banded rank must add NONE
    # — its window exchange is hashpartitioning on _band.
    assert plan.count("SinglePartition") == base.count("SinglePartition")
    assert "hashpartitioning(_band" in plan


def test_scorer_disagreement_scalable_windows_only_survivors(spark):
    # The one global (unpartitioned) window the scalable form keeps is
    # the final pick over the O(K) sketch-threshold survivors; every
    # corpus-scale rank window must be partitioned by _band. The exact
    # form has three unpartitioned window funnels — regressing to more
    # than one here is the bug. (SinglePartition exchanges from 1-row
    # scalar aggregates inside the cached scorer plans are fine.)
    import re

    plan = _formatted(spark, "scorer_disagreement_scalable")
    lines = plan.splitlines()
    win_args = []
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window", line.strip()):
            win_args.append(" ".join(l.strip() for l in lines[i : i + 4]))
    assert win_args, "no Window nodes found"
    unpartitioned = [
        a for a in win_args if "_bs" not in a and "_bn" not in a and "_band" not in a
    ]
    assert len(unpartitioned) <= 1, f"{len(unpartitioned)} global windows"


def test_calibration_scalable_has_no_global_window(spark):
    # The ntile-from-banded-rank rewrite must contain NO unpartitioned
    # window at all — bucket assignment is closed-form arithmetic over
    # the banded rank.
    import re

    plan = _formatted(spark, "quality_calibration_scalable")
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window", line.strip()):
            args = " ".join(l.strip() for l in lines[i : i + 4])
            assert "_band" in args, f"unpartitioned window: {args[:160]}"


def test_equidepth_scalable_windows_are_banded(spark):
    # Every window in the banded equi-depth plan must partition by
    # (event_type, _band) — the exact form's one-task-per-group sort is
    # precisely what this rewrite removes.
    import re

    plan = _formatted(spark, "value_histogram_equidepth_scalable")
    lines = plan.splitlines()
    found = 0
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window", line.strip()):
            args = " ".join(l.strip() for l in lines[i : i + 4])
            assert "_band" in args, f"unbanded window: {args[:160]}"
            found += 1
    assert found >= 1


def test_ks_scalable_windows_are_banded(spark):
    # The banded ECDF must carry NO unpartitioned window — the global
    # running counts come from band offsets + partitioned running sums.
    import re

    plan = _formatted(spark, "ks_two_sample_scalable")
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window", line.strip()):
            args = " ".join(l.strip() for l in lines[i : i + 4])
            assert "_band" in args, f"unbanded window: {args[:160]}"


def test_rfm_scalable_windows_are_banded(spark):
    # All three RFM axis ranks must run under band-partitioned windows.
    import re

    plan = _formatted(spark, "rfm_segmentation_scalable")
    lines = plan.splitlines()
    found = 0
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window", line.strip()):
            args = " ".join(l.strip() for l in lines[i : i + 4])
            assert "_band" in args, f"unbanded window: {args[:160]}"
            found += 1
    assert found >= 3


def test_filtered_topk_scores_via_broadcast_only(spark):
    # Pre-filter vector search: the label predicate rides the broadcast
    # scoring join — the corpus must never shuffle (no SortMergeJoin)
    # and never fall into an unconstrained cartesian.
    plan = _formatted(spark, "embedding_filtered_topk")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_join_prune_broadcasts_bitset_probes(spark):
    # The probe-side pre-filter joins against <= BLOOM_M bit positions:
    # every bloom-position join must be a broadcast, never a shuffle of
    # the customer side.
    plan = _formatted(spark, "bloom_join_prune")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kmv_join_distinct_uses_distributed_sort_limit(spark):
    # The per-side KMV sketch is orderBy().limit(K): Spark must plan a
    # limit (TakeOrderedAndProject or Global/LocalLimit pair), never a
    # full global Sort with no limit below the sketch joins.
    plan = _formatted(spark, "kmv_join_distinct")
    assert ("TakeOrderedAndProject" in plan) or ("GlobalLimit" in plan)


def test_dataset_split_assign_is_map_plus_one_agg(spark):
    # Hash-split assignment is map-only + one (lang, split) aggregate:
    # no join wider than the one-row-per-language broadcast, no window.
    plan = _formatted(spark, "dataset_split_assign")
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


# ---- round-11 TPC-H-shape contracts --------------------------------------


@pytest.mark.parametrize("name", ["returned_item_ranking", "large_order_customers"])
def test_global_topk_is_take_ordered(spark, name):
    # The global top-k must be TakeOrderedAndProject (per-partition heap +
    # driver merge), never a single-partition global Sort + Limit.
    plan = _formatted(spark, name)
    assert "TakeOrderedAndProject" in plan


def test_disjunctive_predicates_push_per_side(spark):
    # Q19's OR-of-ANDs must split per side and reach BOTH parquet scans
    # as pushed Or(...) filters (quantity bands to lineitem, brand/size
    # to part) — losing either turns the scan into a full read.
    plan = _formatted(spark, "disjunctive_part_revenue")
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters:" in ln and "Or(" in ln
    ]
    assert any("l_quantity" in ln for ln in pushed), "lineitem OR bands not pushed"
    assert any("p_brand" in ln for ln in pushed), "part OR conjunctions not pushed"


def test_waiting_suppliers_semi_and_anti(spark):
    # Q21's correlated EXISTS / NOT EXISTS must decorrelate to a semi and
    # an anti join (a rewrite through aggregation or a cartesian fails).
    plan = _formatted(spark, "waiting_supplier_ranking")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_idle_balance_scalar_and_anti(spark):
    # Q22's scalar threshold is a one-row broadcast (BroadcastNestedLoop
    # is the correct join for a 1-row cross), and the recency test an
    # anti join; neither may degrade to a cartesian.
    plan = _formatted(spark, "idle_balance_customers")
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["volume_shipping_pairs", "market_share_by_year"])
def test_star_joins_never_cartesian(spark, name):
    # The star shapes must plan hash joins on every edge — a missed join
    # condition shows up as a cartesian.
    plan = _formatted(spark, name)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_minhash_estimate_error_never_hints_broadcast(spark):
    # Same rule as the dedup verify plans: the signature and shingle
    # frames are doc-grain (unbounded) — no forced broadcast anywhere.
    assert "ResolvedHint" not in _analyzed(spark, "minhash_estimate_error")


def test_banded_group_median_windows_are_banded(spark):
    # The MAD family's 100 TB rewrite: the only window in a banded
    # per-group median must partition by (group, _band) — an
    # event_type-only window is the one-task-per-group sort the rewrite
    # exists to remove (round-11 verdict watch item 1).
    import re

    from pyspark.sql import functions as F

    from aws_lambda_redshift_loader_spark.operators.windows_sql import (
        _banded_group_median,
    )
    from aws_lambda_redshift_loader_spark.session import table

    ev = table(spark, SF_SMOKE, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    df = _banded_group_median(
        ev, "event_type", "v", "event_id", "med", checkpoint=False
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    found = 0
    for i, line in enumerate(lines):
        if re.match(r"^\(?\d*\)? ?\*?\(?\d*\)? ?Window", line.strip()) or "Window" in line.split("(")[0]:
            args = " ".join(l.strip() for l in lines[i : i + 4])
            assert "_band" in args, f"unbanded window: {args[:160]}"
            found += 1
    assert found >= 1


def test_waiting_supplier_windowed_single_fact_pass(spark):
    # The one-window Q21 rewrite exists to stop re-referencing the
    # lineitem exchange three times: the plan must carry exactly one
    # Window, no cartesian, no anti/semi self-join pair, and the
    # supplier dim must broadcast.
    plan = _formatted(spark, "waiting_supplier_ranking_windowed")
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan
    assert "LeftAnti" not in plan, "rewrite regressed to the anti-join form"
    assert "BroadcastHashJoin" in plan


def test_late_order_semi_join_not_cartesian(spark):
    # Q4 shape: the EXISTS carries a cross-table date comparison — the
    # planner must keep the key equality as the join condition (hash
    # semi join) with the date predicate as a residual, never degrade
    # to a nested-loop over the fact table.
    plan = _formatted(spark, "late_order_priority_counts")
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


@pytest.mark.parametrize(
    "name",
    ["min_cost_supplier", "product_profit_by_nation", "supplier_count_by_part"],
)
def test_round12_stars_broadcast_dimensions(spark, name):
    # The round-12 TPC-H shapes keep every dimension on the broadcast
    # side; a cartesian or a shuffled dim join means a join condition
    # (or a hint) got lost.
    plan = _formatted(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ppjoin_windows_are_per_document(spark):
    # PPJoin's only window is the per-document rarity rank — a global
    # (unpartitioned) window here would sort the whole shingle stream
    # in one task.
    import re

    plan = _formatted(spark, "ppjoin_jaccard_pairs")
    lines = plan.splitlines()
    found = 0
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window", line.strip()):
            args = " ".join(l.strip() for l in lines[i : i + 4])
            assert "doc_id" in args, f"non-per-doc window: {args[:160]}"
            found += 1
    assert found >= 1
    assert "CartesianProduct" not in plan


def test_ewma_single_window_pass(spark):
    # All 16 lag expressions share one window spec — the plan must carry
    # exactly ONE Window operator (per-lag windows would rescan the
    # partition 16 times).
    plan = _formatted(spark, "ewma_smoothed_values")
    n_windows = sum(
        1 for line in plan.splitlines() if line.strip().lstrip("(*0123456789) ").startswith("Window")
    )
    assert n_windows == 1, f"expected one Window operator, saw {n_windows}"


def test_interval_overlap_no_cartesian(spark):
    # The grid-bucketized interval join exists to avoid the cross-join
    # shape — the plan must contain no cartesian/nested-loop join.
    plan = _formatted(spark, "interval_overlap_incidents")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_graph_ann_beam_rounds_broadcast_candidates(spark):
    # Each beam round probes the corpus-sided embedding lookup with a
    # BROADCAST of the (candidates x query-vector) frame; a shuffle of
    # the corpus per round is the regression this pins. The edge list is
    # localCheckpointed, so the remaining joins in the final plan are
    # the per-round scoring joins.
    plan = _formatted(spark, "embedding_graph_ann_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "a beam-round scoring join fell off the broadcast path"
    )


def test_hier_graph_ann_beam_rounds_broadcast_candidates(spark):
    # The hierarchical search inherits the flat query's contract on
    # BOTH layers: every upper- and base-round scoring join broadcasts
    # the frontier frame against the corpus-sided lookup (both edge
    # lists are localCheckpointed, so these are the only joins left in
    # the final plan).
    plan = _formatted(spark, "embedding_graph_ann_hier_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "a beam-round scoring join fell off the broadcast path"
    )


def test_sequence_packing_prefix_sum_is_two_level(spark):
    # The packing plan's running sum must never sort a whole language
    # domain in one task: the doc-grain window partitions by
    # (lang, _bkt); the only lang-only window is the bucket-offset
    # pass, whose input is the bucket-grain totals frame (corpus /
    # PACK_BUCKET rows). Assert every window over the doc-grain frame
    # carries _bkt in its partitioning.
    import re

    from aws_lambda_redshift_loader_spark.operators.text import _pack_plan

    df = _pack_plan(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    doc_grain_windows = 0
    for i, line in enumerate(lines):
        head = line.strip()
        if re.match(r"^\(?\d*\)? ?\*?\(?\d*\)? ?Window", head) or "Window" in head.split("(")[0]:
            args = " ".join(l.strip() for l in lines[i : i + 4])
            if "n_tokens" in args and "_cum_in" in args:
                assert "_bkt" in args, f"domain-wide doc window: {args[:160]}"
                doc_grain_windows += 1
    assert doc_grain_windows >= 1


def test_budget_pack_fold_groups_by_lang_and_bucket(spark):
    # The fragment-budget fold must stay BLOCK-ALIGNED: the Arrow
    # kernel's exchange hashes on (lang, bucket), never lang alone — a
    # lang-only grouping would put a whole domain's sequential fold in
    # one task.
    plan = _formatted(spark, "sequence_packing_budget_plan")
    assert "FlatMapGroupsInPandas" in plan
    seen = False
    for chunk in plan.split("Arguments: ")[1:]:
        head = chunk.split("\n")[0]
        if "hashpartitioning" in head and "lang" in head:
            assert "bucket" in head, f"lang-only fold exchange: {head[:160]}"
            seen = True
    assert seen, "no (lang, bucket) exchange found for the fold"


@pytest.mark.parametrize(
    "name",
    [
        "label_propagation_copurchase",
        "community_modularity",
        "association_rules_lift",
        "data_budget_allocation",
    ],
)
def test_round15_graph_queries_no_cartesian(spark, name):
    # Basket self-joins key on l_orderkey; LPA/modularity label lookups
    # key on node ids; allocator cross-joins are 1-row broadcast
    # scalars. None of these may degrade to a real cartesian.
    plan = _formatted(spark, name)
    assert "CartesianProduct" not in plan, f"{name} went cartesian"


@pytest.mark.parametrize(
    "name", ["association_rules_lift", "copurchase_pairs"]
)
def test_rules_topk_is_take_ordered(spark, name):
    # Global top-k must plan TakeOrderedAndProject (per-partition top-K
    # + driver merge); the rank window runs only over the K-row result.
    # A bare global row_number funnels every scored pair into one task
    # (the 10x WindowExec single-partition warning, r15).
    # (r16: renamed — this redefinition of test_global_topk_is_take_ordered
    # was SHADOWING the round-11 parametrization at module scope, so
    # returned_item_ranking / large_order_customers silently stopped
    # being collected.)
    df = SPECS[name].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, f"{name}: top-k lost the TakeOrdered path"


def test_range_search_has_no_window(spark):
    # The radius query's epilogue is a threshold filter over the scored
    # candidates — a rank window sneaking in would re-introduce the
    # per-query sort the range form exists to avoid.
    plan = _formatted(spark, "embedding_range_search")
    assert "Window" not in plan, "range search grew a window"


def test_budget_selection_windows_are_banded(spark):
    # curriculum_budget_selection's window-grain ranking must partition
    # by (lang, band) — a window partitioned by lang alone is the
    # one-task-per-language funnel the banded rewrite exists to avoid.
    plan = _formatted(spark, "curriculum_budget_selection")
    import re as _re

    for spec in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        parts = [p.strip().split("#")[0] for p in spec.split(",")]
        if "lang" in parts:
            assert "band" in parts, (
                f"budget-selection window partitions by lang alone: {spec}"
            )


def test_cusum_windows_are_day_banded(spark):
    # The CUSUM running sums must partition by (event_type, _day) — the
    # distributed-prefix-sum shape; event_type alone is a funnel.
    plan = _formatted(spark, "cusum_changepoint_events")
    import re as _re

    for spec in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        parts = [p.strip().split("#")[0] for p in spec.split(",")]
        if "event_type" in parts:
            assert "_day" in parts, (
                f"cusum window partitions by type alone: {spec}"
            )


def test_mwu_rank_walk_is_value_banded(spark):
    # The Mann–Whitney cumulative-count windows must partition by the
    # value band (vb) — a windowspec with no partition key is the
    # global one-task rank funnel the banding exists to avoid.
    plan = _formatted(spark, "mann_whitney_quality_ab")
    import re as _re

    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected a windowed cumulative count in the MWU plan"
    for spec in specs:
        parts = [p.strip().split("#")[0] for p in spec.split(",")]
        assert "vb" in parts, f"MWU window is not value-banded: {spec}"


def test_experiment_family_no_cartesian_blowup(spark):
    # The experiment readouts build on broadcast-scalar cross joins
    # (1-row span/pool frames) — a real CartesianProduct or a
    # non-broadcast nested loop means a frame that should be scalar
    # is not.
    for name in (
        "cuped_adjusted_ab",
        "welch_t_ab",
        "diff_in_differences",
        "permutation_test_ab",
        "bootstrap_quality_ci",
    ):
        plan = _formatted(spark, name)
        assert "CartesianProduct" not in plan, name


def test_srm_check_is_pure_aggregate(spark):
    # The guardrail must be scan → distinct → aggregate: no join, no
    # window, no sort anywhere.
    plan = _formatted(spark, "srm_check")
    assert "Join" not in plan
    assert "windowspecdefinition" not in plan
    assert "Sort" not in plan.replace("SortAggregate", "")


def test_lpa_rounds_broadcast_labels(spark):
    # r18 (guide §3.1): under the GRAPH_BCAST_MAX_NODES guard every
    # round's edge⋈label join must be a map-side broadcast — the edge
    # frame is never shuffled inside the loop. One BroadcastHashJoin
    # per round, zero sort-merge/shuffled-hash joins in the rounds plan.
    from aws_lambda_redshift_loader_spark.operators import relational as rel

    eu = spark.createDataFrame(
        [(i, (i * 7 + 1) % 97, 1) for i in range(97)]
        + [((i * 7 + 1) % 97, i, 1) for i in range(97)],
        "src long, dst long, w long",
    )
    plan_df = rel._lpa_label_rounds_plan(eu)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = plan_df._jdf.queryExecution().explainString(mode)
    assert plan.count("BroadcastHashJoin") >= rel.LPA_ROUNDS, plan[:800]
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # r18 N3 (guide §2.4): the in-plan repartition("src") re-establishes
    # hash(src) partitioning, which satisfies BOTH per-round aggregates
    # (src ⊆ (src,label); alias-propagated through the broadcast join
    # and the partial aggregate) — so the rounds tree must carry exactly
    # one Exchange per round subtree (the reused repartition) and no
    # aggregate exchange: 8 → 4 tree Exchanges at LPA_ROUNDS=4.
    tree = plan.split("\n\n", 1)[0]
    n_exchange = tree.count("+- Exchange") + tree.count(":- Exchange")
    assert n_exchange == rel.LPA_ROUNDS, f"{n_exchange} exchanges\n{tree}"


def test_ppr_rounds_broadcast_node_frames(spark):
    # r18 (guide §3.1): the PPR loop broadcasts the node-grain rank and
    # contribution frames under the same guard — the only per-round
    # exchange left is the groupBy(dst) propagation transfer. Both join
    # flavors (edges⋈ranks inner, seeds⋈contribs left) must plan
    # broadcast; the edge list must never sort-merge inside the loop.
    from aws_lambda_redshift_loader_spark.operators import relational as rel

    df = SPECS["ppr_copurchase_parts"].fn(spark, SF_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert plan.count("BroadcastHashJoin") >= 2 * rel.PPR_ITERS, plan[:800]
    assert "SortMergeJoin" not in plan
