#!/usr/bin/env python
"""Recall@TOP_K sweep for every ANN index family against the exact
brute-force ground truth, recorded to ANN_RECALL.json. Run at sf0.01
(default $SPARK_GRAFT_RECALL_SF_DIR) — the same corpus the driver's
correctness gate uses, so the numbers describe the verified queries.

Recall here = |approx ∩ exact| / |exact| over the (query, neighbor)
pair sets of the first N_QUERIES queries. MMR rows are judged on
DIVERSITY-ADJUSTED recall too (its objective intentionally trades tail
relevance for spread): mmr_recall counts picks inside the exact top-K,
pool_recall counts picks inside the exact top-POOL (the honest bound —
MMR can only pick what its pool contains).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_RECALL_SF_DIR", "/root/testdata/sf0.01")
    from aws_lambda_redshift_loader_spark.plans.registry import load_all
    from aws_lambda_redshift_loader_spark.session import get_spark

    spark = get_spark("ann-recall")
    specs = load_all()

    def pairs(name):
        return {
            (r.query_id, r.neighbor_id) for r in specs[name].fn(spark, sf_dir).collect()
        }

    exact = pairs("embedding_topk_bruteforce")
    results: dict[str, float] = {}
    for name in (
        "embedding_ann_lsh",
        "embedding_ivf_topk",
        "embedding_pq_topk",
        "embedding_opq_topk",
        "embedding_ivfpq_topk",
        "embedding_sq8_topk",
        "ann_refine_topk",
        "embedding_multiprobe_lsh",
        # round-12: the mid-stream-refreshed IVF geometry — probes the
        # epoch-maintained store whose quantizer retrained on the
        # ingested prefix (vs embedding_ivf_topk's full-corpus train)
        "stream_incremental_ivf_refresh",
        # round-14: refresh epoch derived from the measured drift
        # series instead of a fixed constant (fires at the same epoch
        # as the fixed variant on this fixture — the recall delta is 0
        # BY MEASUREMENT, which is itself the point)
        "stream_incremental_ivf_drift_refresh",
        # round-13: graph-traversal ANN (beam over the cell-local kNN
        # graph) — the non-quantization index family member
        "embedding_graph_ann_topk",
        # round-14: the HNSW layer hierarchy — sparse upper graph seeds
        # the base beam, fewer base rounds at equal beam
        "embedding_graph_ann_hier_topk",
    ):
        results[name] = round(len(exact & pairs(name)) / len(exact), 4)

    # MMR variants: top-K recall plus the pool-membership rate.
    from aws_lambda_redshift_loader_spark.operators.similarity import (
        MMR_POOL,
        TOP_K,
    )

    # Exact top-POOL pairs (the widest pool either MMR variant could
    # use); the registered brute-force query is top-K only, so compute
    # the wider ranking directly.
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from aws_lambda_redshift_loader_spark.operators.similarity import (
        N_QUERIES,
        _dot,
        _quantize,
    )
    from aws_lambda_redshift_loader_spark.session import table

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize("embedding").alias("e")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    cosine = _dot(F.col("qe"), F.col("e")).cast("double") / (
        F.sqrt(_dot(F.col("qe"), F.col("qe")).cast("double"))
        * F.sqrt(_dot(F.col("e"), F.col("e")).cast("double"))
    )
    scored = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id")).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cosine.alias("cos")
    )
    wp = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    exact_pool = {
        (r.query_id, r.neighbor_id)
        for r in scored.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= MMR_POOL)
        .collect()
    }
    for name in ("mmr_diverse_topk", "mmr_ann_topk"):
        got = pairs(name)
        results[f"{name}.topk_recall"] = round(len(exact & got) / len(exact), 4)
        results[f"{name}.pool_membership"] = round(
            len(exact_pool & got) / len(got), 4
        )

    # Hybrid RRF: top-k recall of the fused ranking (items are doc/vec
    # ids — same space in the fixtures).
    rrf = {
        (r.query_id, r.item_id)
        for r in specs["hybrid_rrf_topk"].fn(spark, sf_dir).collect()
    }
    results["hybrid_rrf_topk.topk_recall"] = round(len(exact & rrf) / len(exact), 4)
    # Mean NDCG@K of the LSH ranking (the registered hash-gated metric).
    ndcg_rows = specs["ndcg_eval_lsh"].fn(spark, sf_dir).collect()
    results["ndcg_eval_lsh.mean_ndcg"] = round(
        sum(r.ndcg for r in ndcg_rows) / len(ndcg_rows), 4
    )

    # Graph-ANN scored-candidate accounting (round-14): the hierarchy's
    # whole claim is BETTER recall at FEWER scored pairs, so the count
    # is a standing instrument, not a one-off. Re-runs both searches
    # with a count action per beam round (instrument-only cost).
    from aws_lambda_redshift_loader_spark.operators import similarity as S

    ids_c, cent_c = S._kmeans_centroids(spark, emb, S.IVF_TRAIN_ITERS)
    edges_f = S._gann_edges(
        S._probe_assign(emb, ids_c, cent_c, S.GANN_BUILD_PROBE)
    ).localCheckpoint(eager=True)
    upper = emb.filter(F.col("vec_id") % S.GANN_UPPER_MOD == 0)
    edges_u = S._gann_edges(
        S._probe_assign(upper, ids_c, cent_c, S.GANN_BUILD_PROBE)
    ).localCheckpoint(eager=True)
    wq = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("node").asc()
    )

    def counted_beam(frontier, edg, rounds, beam):
        total, scored = 0, None
        for _ in range(rounds):
            cands = (
                frontier.unionByName(
                    edg.join(F.broadcast(frontier), edg.src == frontier.node)
                    .select("query_id", F.col("dst").alias("node"))
                )
                .dropDuplicates(["query_id", "node"])
                .localCheckpoint(eager=True)
            )
            total += cands.count()
            scored = S._gann_pair_scores(cands, emb).localCheckpoint(eager=True)
            frontier = (
                scored.withColumn("rk", F.row_number().over(wq))
                .filter(F.col("rk") <= beam)
                .select("query_id", "node")
            )
        return total, scored

    def entry_frontier(pool):
        e0 = pool.agg(F.min("vec_id").alias("m")).collect()[0]["m"]
        return (
            emb.filter(F.col("vec_id") < N_QUERIES)
            .select(F.col("vec_id").alias("query_id"))
            .withColumn("node", F.lit(int(e0)).cast("bigint"))
        )

    flat_n, _ = counted_beam(
        entry_frontier(emb), edges_f, S.GANN_ROUNDS, S.GANN_BEAM
    )
    u_n, uscored = counted_beam(
        entry_frontier(upper), edges_u, S.GANN_UPPER_ROUNDS, S.GANN_UPPER_BEAM
    )
    seeds = (
        uscored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= S.GANN_SEEDS)
        .select("query_id", "node")
    )
    b_n, _ = counted_beam(seeds, edges_f, S.GANN_HIER_ROUNDS, S.GANN_BEAM)
    results["embedding_graph_ann_topk.scored_pairs"] = flat_n
    results["embedding_graph_ann_hier_topk.scored_pairs"] = u_n + b_n

    # Drift-threshold operating curve (round-14): the refresh trigger's
    # threshold choice, priced — for each candidate threshold the fired
    # step R follows from the (already deterministic) drift series
    # WITHOUT re-streaming, and the recall is the R-prefix geometry's
    # probe recall. Turns INC_IVF_DRIFT_COS_Q into a measured operating
    # point instead of a constant taken on faith.
    from aws_lambda_redshift_loader_spark.operators.similarity import (
        _probe_postings,
    )
    from aws_lambda_redshift_loader_spark.streaming.stream_queries import (
        _drift_refresh_step,
        _ivf_range_geometry,
    )
    import aws_lambda_redshift_loader_spark.operators.similarity as _sim

    geo_cache: dict[int, float] = {}
    q_emb = emb.filter(F.col("vec_id") < N_QUERIES)
    for thr in (850000, 900000, 930000, 960000):
        old_thr = _sim.INC_IVF_DRIFT_COS_Q
        _sim.INC_IVF_DRIFT_COS_Q = thr
        try:
            R = _drift_refresh_step(spark, sf_dir)
        finally:
            _sim.INC_IVF_DRIFT_COS_Q = old_thr
        if R not in geo_cache:
            ids_r, cent_r = _ivf_range_geometry(spark, sf_dir, R)
            from aws_lambda_redshift_loader_spark.operators.similarity import (
                _assign_cells,
            )

            postings_r = _assign_cells(emb, ids_r, cent_r)
            scored_r = _probe_postings(spark, postings_r, q_emb, ids_r, cent_r)
            wr = W.partitionBy("query_id").orderBy(
                F.col("cosine").desc(), F.col("neighbor_id").asc()
            )
            got_r = {
                (r.query_id, r.neighbor_id)
                for r in scored_r.withColumn(
                    "rk", F.row_number().over(wr)
                )
                .filter(F.col("rk") <= TOP_K)
                .collect()
            }
            geo_cache[R] = round(len(exact & got_r) / len(exact), 4)
        results[f"drift_curve.thr_{thr}.fired_step"] = R
        results[f"drift_curve.thr_{thr}.recall"] = geo_cache[R]

    out = {
        "sf_dir": sf_dir,
        "top_k": TOP_K,
        "n_exact_pairs": len(exact),
        "recall": results,
        "note": (
            "recall@top_k vs exact brute force; MMR rows also report the "
            "fraction of picks inside the exact top-POOL (diversity trades "
            "tail relevance by design); hybrid RRF blends lexical hits so "
            "its dense-recall is low BY DESIGN; LSH's high mean-NDCG vs "
            "its 0.62 recall says what it does return is ordered right; "
            ".scored_pairs rows count beam-round candidate scorings — the "
            "hierarchical entry must beat the flat build's recall at FEWER "
            "of them"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ANN_RECALL.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["recall"], sort_keys=True))


if __name__ == "__main__":
    main()
