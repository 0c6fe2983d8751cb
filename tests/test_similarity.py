"""ANN quality checks: the LSH path is approximate, so instead of an
oracle hash-match it gets a recall bound against the exact brute-force
top-k, plus structural invariants (k per query, self-exclusion)."""

from __future__ import annotations

from aws_lambda_redshift_loader_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    embedding_ann_lsh,
    embedding_cosine_neardup,
    embedding_ivf_topk,
    embedding_topk_bruteforce,
)

from conftest import SF_ORACLE


def test_lsh_recall_against_bruteforce(spark):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_topk_bruteforce(spark, SF_ORACLE).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in embedding_ann_lsh(spark, SF_ORACLE).collect()
    }
    # 8 tables x 4-bit bands: measured recall ≈ 0.68 on the sf0.001
    # fixture; the floor guards against the bucketing breaking (all
    # vectors in one bucket, zero overlap, or a band-probability bug).
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall collapsed: {recall:.3f}"
    # LSH must actually restrict candidates: per query at most TOP_K rows.
    per_query = {}
    for q, _ in approx:
        per_query[q] = per_query.get(q, 0) + 1
    assert all(v <= TOP_K for v in per_query.values())


def test_ivf_recall_against_bruteforce(spark):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_topk_bruteforce(spark, SF_ORACLE).collect()
    }
    rows = embedding_ivf_topk(spark, SF_ORACLE).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    # 4-of-16 cells probed: measured recall 0.94 on the sf0.001 fixture.
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"IVF recall collapsed: {recall:.3f}"
    assert len(rows) == N_QUERIES * TOP_K  # nprobe cells still fill top-k here


def test_bruteforce_topk_shape(spark):
    rows = embedding_topk_bruteforce(spark, SF_ORACLE).collect()
    assert len(rows) == N_QUERIES * TOP_K
    assert all(r.query_id != r.neighbor_id for r in rows)
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)


def test_neardup_pairs_ordered_and_thresholded(spark):
    rows = embedding_cosine_neardup(spark, SF_ORACLE).collect()
    assert len(rows) > 0  # fixture-calibrated threshold must fire
    assert all(r.keep_id < r.dup_id for r in rows)
    assert all(r.cosine >= 0.35 for r in rows)


def test_neardup_recall_against_allpairs(spark):
    """ADVICE r2: the neardup oracle shares the LSH bucket condition, so
    a recall collapse would pass the hash check — this test compares the
    LSH-fed operator against the registered exact all-pairs form."""
    from aws_lambda_redshift_loader_spark.operators.similarity import (
        embedding_cosine_neardup_exact,
    )

    truth = {
        (r.keep_id, r.dup_id)
        for r in embedding_cosine_neardup_exact(spark, SF_ORACLE).collect()
    }
    got = {
        (r.keep_id, r.dup_id)
        for r in embedding_cosine_neardup(spark, SF_ORACLE).collect()
    }
    assert got <= truth  # exact-precision: every emitted pair is real
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"LSH neardup recall collapsed: {recall:.3f}"


def test_ivf_kmeans_trained_recall_not_worse_than_seeded(spark):
    """The trained coarse quantizer (IVF_TRAIN_ITERS Lloyd rounds) must
    probe at least as well as the raw first-K-vectors seeding it
    replaced (quantizer recall: exact top-k neighbors whose cell lands
    in the query's probed set)."""
    import numpy as np
    from pyspark.sql import functions as F

    from aws_lambda_redshift_loader_spark.operators.similarity import (
        IVF_NPROBE,
        IVF_TRAIN_ITERS,
        _assign_cells,
        _kmeans_centroids,
        _quantize,
    )
    from aws_lambda_redshift_loader_spark.session import table

    emb = table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", _quantize("embedding").alias("e")
    )
    exact = {}
    for r in embedding_topk_bruteforce(spark, SF_ORACLE).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    def quantizer_recall(iters):
        ids, cent = _kmeans_centroids(spark, emb, iters)
        cell_of = {
            r.vec_id: r.cell
            for r in _assign_cells(emb, ids, cent).select("vec_id", "cell").collect()
        }
        norms = np.sqrt((cent * cent).sum(axis=1))
        hit = tot = 0
        for qr in emb.filter(F.col("vec_id") < N_QUERIES).collect():
            v = np.array(qr.e, dtype=np.float64)
            cos = (cent @ v) / (np.sqrt(v @ v) * norms)
            probed = set(ids[np.lexsort((ids, -cos))[:IVF_NPROBE]].tolist())
            for n in exact[qr.vec_id]:
                tot += 1
                hit += cell_of[n] in probed
        return hit / tot

    seeded = quantizer_recall(0)
    trained = quantizer_recall(IVF_TRAIN_ITERS)
    assert trained >= seeded, (
        f"k-means training reduced IVF recall: {trained:.3f} < {seeded:.3f}"
    )


def test_pq_recall_against_bruteforce(spark):
    from aws_lambda_redshift_loader_spark.operators.similarity import embedding_pq_topk

    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_topk_bruteforce(spark, SF_ORACLE).collect()
    }
    rows = embedding_pq_topk(spark, SF_ORACLE).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    # ADC over seeded 16-entry codebooks + PQ_R=50 exact re-rank: the
    # floor guards encoding/LUT breakage (e.g. wrong subspace slicing
    # collapses all codes to one entry and recall to ~chance).
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"PQ recall collapsed: {recall:.3f}"
    assert len(rows) == N_QUERIES * TOP_K


def test_ivfpq_recall_against_bruteforce(spark):
    from aws_lambda_redshift_loader_spark.operators.similarity import embedding_ivfpq_topk

    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_topk_bruteforce(spark, SF_ORACLE).collect()
    }
    rows = embedding_ivfpq_topk(spark, SF_ORACLE).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    # Compression (residual PQ) stacks its loss on cell pruning, so the
    # floor sits below plain IVF's; it guards composite breakage (wrong
    # residual sign, LUT misindexing) which collapses recall to ~chance.
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF-PQ recall collapsed: {recall:.3f}"
    assert len(rows) == N_QUERIES * TOP_K


def test_opq_recall_not_worse_than_pq(spark):
    """OPQ's claim is that the learned orthogonal transform makes the PQ
    codebooks fit better: on this fixture the variance-balancing
    permutation measures 0.82 recall vs plain PQ's 0.76. Assert OPQ >=
    PQ so a permutation-derivation bug (which would scramble subspaces
    arbitrarily and land well below PQ) can't ship silently."""
    from aws_lambda_redshift_loader_spark.operators.similarity import (
        embedding_opq_topk,
        embedding_pq_topk,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_topk_bruteforce(spark, SF_ORACLE).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in embedding_pq_topk(spark, SF_ORACLE).collect()
    }
    rows = embedding_opq_topk(spark, SF_ORACLE).collect()
    opq = {(r.query_id, r.neighbor_id) for r in rows}
    pq_recall = len(exact & pq) / len(exact)
    opq_recall = len(exact & opq) / len(exact)
    assert opq_recall >= pq_recall, (
        f"OPQ recall {opq_recall:.3f} fell below plain PQ {pq_recall:.3f}"
    )
    assert len(rows) == N_QUERIES * TOP_K


def test_mmr_structure_and_diversity(spark):
    """MMR invariants: K picks per query, no repeats, pick 1 == the
    relevance argmax, and the selection is diversity-aware — across the
    query set it must diverge from plain top-k somewhere (the fixture
    has near-dup embeddings, so pure-relevance top-5 contains redundant
    members MMR swaps out)."""
    from aws_lambda_redshift_loader_spark.operators.similarity import (
        MMR_K,
        mmr_diverse_topk,
    )

    rows = mmr_diverse_topk(spark, SF_ORACLE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == N_QUERIES
    exact_top = {}
    for r in embedding_topk_bruteforce(spark, SF_ORACLE).collect():
        exact_top.setdefault(r.query_id, {})[r.rank] = r.neighbor_id
    for q, picks in by_q.items():
        assert len(picks) == MMR_K
        ids = [p.neighbor_id for p in picks]
        assert len(set(ids)) == MMR_K  # no repeats
        first = min(picks, key=lambda p: p.mmr_rank)
        assert first.neighbor_id == exact_top[q][1]  # pick 1 = argmax rel
    diverged = any(
        {p.neighbor_id for p in by_q[q]} != set(exact_top[q].values()) for q in by_q
    )
    assert diverged, "MMR never diverged from pure top-k — diversity term inert?"


def test_sq8_recall_and_code_bounds(spark):
    """SQ8 floor: training-free scalar quantization must beat the
    trained-codebook PQ families on recall (8 bits PER DIMENSION vs 8
    subvector codes), and its reconstructed values must stay inside the
    x255-scaled per-dimension [min, max] envelope — a wrong range or a
    division slip shows up as an out-of-envelope reconstruction."""
    from pyspark.sql import functions as F

    from aws_lambda_redshift_loader_spark.operators.similarity import (
        embedding_sq8_topk,
        _quantize,
        _sq8_recon,
    )
    from aws_lambda_redshift_loader_spark.session import table

    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_topk_bruteforce(spark, SF_ORACLE).collect()
    }
    rows = embedding_sq8_topk(spark, SF_ORACLE).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"SQ8 recall collapsed: {recall:.3f}"
    assert len(rows) == N_QUERIES * TOP_K

    # Envelope check against the query's ACTUAL reconstructed values
    # (_sq8_recon is the exact frame embedding_sq8_topk scores): every
    # reconstructed r_d must lie in [mn_d*255, mx_d*255], where mn/mx
    # come from an independent aggregate over the quantized ints — a
    # division or range slip inside the recon expression now fails here
    # instead of only (maybe) dropping recall.
    emb = table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", _quantize("embedding").alias("e")
    )
    viol = (
        _sq8_recon(emb)
        .select(F.posexplode("r").alias("dim", "rv"))
        .join(
            emb.select(F.posexplode("e").alias("dim", "v"))
            .groupBy("dim")
            .agg(F.min("v").alias("mn"), F.max("v").alias("mx")),
            "dim",
        )
        .filter(
            (F.col("rv") < F.col("mn") * 255) | (F.col("rv") > F.col("mx") * 255)
        )
        .count()
    )
    assert viol == 0, f"SQ8 reconstruction escaped its envelope: {viol} values"


def test_filtered_topk_respects_filter(spark):
    from aws_lambda_redshift_loader_spark.operators.similarity import (
        embedding_filtered_topk,
    )
    from aws_lambda_redshift_loader_spark.session import table

    rows = embedding_filtered_topk(spark, SF_ORACLE).collect()
    labels = {
        r.vec_id: r.label
        for r in table(spark, SF_ORACLE, "embeddings").select("vec_id", "label").collect()
    }
    per_query = {}
    for r in rows:
        # the filter contract: every neighbor shares the query's label,
        # the query's own label column is consistent, no self-match
        assert labels[r.neighbor_id] == r.label == labels[r.query_id]
        assert r.neighbor_id != r.query_id
        per_query.setdefault(r.query_id, []).append(r.rank)
    assert len(per_query) == N_QUERIES
    for ranks in per_query.values():
        # contiguous ranks from 1 (each label has >= TOP_K members here)
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= TOP_K


def test_ann_recall_eval_consistent_with_plans(spark):
    from aws_lambda_redshift_loader_spark.operators.similarity import (
        ann_recall_eval,
        embedding_sq8_topk,
    )

    rows = ann_recall_eval(spark, SF_ORACLE).collect()
    assert len(rows) == N_QUERIES
    # recompute hits from the two underlying plans — the query must
    # agree with its own inputs, not just be in-range
    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_topk_bruteforce(spark, SF_ORACLE).collect()
    }
    sq8 = {
        (r.query_id, r.neighbor_id)
        for r in embedding_sq8_topk(spark, SF_ORACLE).collect()
    }
    for r in rows:
        want = len({p for p in exact & sq8 if p[0] == r.query_id})
        assert r.hits == want
        assert r.recall_ppm == (r.hits * 1_000_000) // TOP_K


def test_multiprobe_recall_dominates_single_probe(spark):
    from aws_lambda_redshift_loader_spark.operators.similarity import (
        embedding_multiprobe_lsh,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_topk_bruteforce(spark, SF_ORACLE).collect()
    }
    single = {
        (r.query_id, r.neighbor_id)
        for r in embedding_ann_lsh(spark, SF_ORACLE).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in embedding_multiprobe_lsh(spark, SF_ORACLE).collect()
    }
    r1 = len(exact & single) / len(exact)
    rm = len(exact & multi) / len(exact)
    # Multi-probe sees a strict superset of the single-probe candidate
    # buckets (home + perturbations), so recall can only match or beat
    # it; measured 0.96 vs 0.68 on the sf0.001 fixture.
    assert rm >= r1, f"multi-probe recall {rm:.3f} below single-probe {r1:.3f}"
    assert rm >= 0.8, f"multi-probe recall collapsed: {rm:.3f}"
