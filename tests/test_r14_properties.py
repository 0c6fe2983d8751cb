"""Round-14 ADVICE regression pins.

1. ``_banded_group_median`` with a caller-supplied boundaries dict that
   MISSES groups: the geometry join is LEFT with an empty-array default,
   so uncovered groups still get their exact median (r13 shipped an
   inner join that silently dropped them).
2. ``_skyline3d_coords`` chunks its per-batch dominance matrix along the
   dominator axis; the chunked reduction must equal the brute-force
   frontier on inputs large enough to cross a chunk boundary.
3. ``scorer_auc_eval`` on a one-class corpus emits ZERO rows in BOTH
   engines (AUC is undefined; zero-division behavior differs
   cross-engine, so the degenerate input is filtered identically).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_banded_median_missing_group_boundaries(spark):
    from aws_lambda_redshift_loader_spark.operators.windows_sql import (
        _banded_group_median,
    )

    rows = [("a", v) for v in [5, 1, 9, 3, 7]] + [
        ("b", v) for v in [10, 40, 20]
    ] + [("c", v) for v in [2, 2, 8, 8]]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "g": [g for g, _ in rows],
                "v": [v for _, v in rows],
                "tid": range(len(rows)),
            }
        ).astype({"v": "int64", "tid": "int64"}),
        "g string, v bigint, tid bigint",
    )
    # Boundaries cover ONLY group 'a' — 'b' and 'c' must fall back to a
    # single band (any geometry is exact), not silently drop.
    med = _banded_group_median(
        df, "g", "v", "tid", "med", boundaries={"a": [4, 8]}, checkpoint=False
    )
    got = {r["g"]: r["med"] for r in med.collect()}
    assert got == {"a": 5, "b": 20, "c": 2}


def test_skyline3d_chunked_dominance_matches_bruteforce(spark):
    from aws_lambda_redshift_loader_spark.operators.relational import (
        _skyline3d_coords,
    )

    rng = np.random.default_rng(14)
    k = 5000  # > the 4096 chunk width: the loop must take two blocks
    pts = rng.integers(0, 1_000_000, size=(k, 3)).astype("float64")
    pdf = pd.DataFrame({"p": pts[:, 0], "x": pts[:, 1], "d": pts[:, 2]})
    df = spark.createDataFrame(pdf).coalesce(1)

    got = {
        (r["p"], r["x"], r["d"]) for r in _skyline3d_coords(df).collect()
    }

    # Brute force over the per-(x, d)-cell min-p reduction.
    g = pdf.groupby(["x", "d"], as_index=False)["p"].min()
    arr = g[["p", "x", "d"]].to_numpy()
    P, X, D = arr[:, 0:1], arr[:, 1:2], arr[:, 2:3]
    dom = (
        (P.T <= P) & (X.T <= X) & (D.T >= D)
        & ((P.T < P) | (X.T < X) | (D.T > D))
    )
    want = {tuple(r) for r in arr[~dom.any(axis=1)]}
    assert got == want


def test_auc_one_class_corpus_empty_both_engines(spark, tmp_path):
    import duckdb

    from aws_lambda_redshift_loader_spark.plans.registry import load_all

    spec = load_all()["scorer_auc_eval"]
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["the and of words", "more the text", "of and the"],
            "lang": ["en", "en", "en"],  # one class only: n_neg = 0
            "source": ["s"] * 3,
            "n_chars": [16, 13, 10],
        }
    )
    spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    assert spec.fn(spark, str(tmp_path)).count() == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    assert len(con.execute(spec.oracle).fetchall()) == 0


def test_adaptive_ppjoin_both_tails_equal(spark):
    """The adaptive entry's oracle only gates the tail the density pick
    actually runs — this pins BOTH tails to the same pair set on the
    same candidates, so the switch provably cannot change the answer."""
    from aws_lambda_redshift_loader_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _hashed_shingles,
        _ppjoin_candidates,
        _ppjoin_verify_rejoin,
        _ppjoin_verify_suffix,
    )

    sf = "/root/testdata/sf0.001"
    sh = _hashed_shingles(spark, sf)
    withdf, sizes, cands = _ppjoin_candidates(sh, JACCARD_THRESHOLD)
    cands = cands.localCheckpoint(eager=True)
    suffix = {
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in _ppjoin_verify_suffix(
            withdf, sizes, cands, JACCARD_THRESHOLD
        ).collect()
    }
    rejoin = {
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in _ppjoin_verify_rejoin(
            withdf.select("doc_id", "shingle"), sizes, cands
        ).collect()
    }
    assert suffix == rejoin and suffix, "verify tails disagree"


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _spark():
    from aws_lambda_redshift_loader_spark.session import get_spark

    return get_spark("r14-props")


pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),  # doc_id (dedup below)
        st.sampled_from(["en", "de", "fr"]),
        st.integers(min_value=1, max_value=2000),  # n_tokens
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pack_rows)
def test_packing_two_level_equals_reference(rows):
    """The two-level distributed prefix sum must equal the naive
    per-domain running sum on ANY (doc_id, lang, n_tokens) frame —
    including ids crossing bucket boundaries, sparse ids, and domains
    missing from some buckets."""
    import pandas as pd

    from aws_lambda_redshift_loader_spark.operators.text import _pack_plan_frame

    spark = _spark()
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "n_tokens"]).astype(
            {"doc_id": "int64", "n_tokens": "int64"}
        ),
        "doc_id bigint, lang string, n_tokens bigint",
    )
    got = {
        (r["doc_id"], r["startpos"])
        for r in _pack_plan_frame(df).collect()
    }
    ref = {}
    cum: dict[str, int] = {}
    for doc_id, lang, n in sorted(rows):
        ref[(doc_id, cum.get(lang, 0))] = True
        cum[lang] = cum.get(lang, 0) + n
    assert got == {k for k in ref}


emb_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),
        st.lists(st.integers(min_value=-50, max_value=50), min_size=4, max_size=4),
    ),
    min_size=20,
    max_size=60,
    unique_by=lambda t: t[0],
).filter(lambda rows: all(any(v != 0 for v in e) for _, e in rows))


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(emb_rows, st.integers(min_value=0, max_value=3))
def test_gann_store_equals_batch_graph_random(rows, split_seed):
    """The incremental edge store's resolved graph must equal the batch
    multi-probe kNN graph on RANDOM small embedding sets under an
    arbitrary 3-way id split — the subset-prune losslessness argument,
    exercised beyond the fixtures."""
    import pandas as pd

    from aws_lambda_redshift_loader_spark.operators.similarity import (
        GANN_BUILD_PROBE,
        IVF_TRAIN_ITERS,
        _gann_edges,
        _kmeans_centroids,
        _probe_assign,
    )
    from aws_lambda_redshift_loader_spark.streaming.stream_queries import (
        _gann_delta_edges,
    )
    from pyspark.sql import functions as F

    spark = _spark()
    # tile the 4 generated components to the engine's DIM (64) and
    # relabel ids contiguously (the quantizer seeds from vec_id <
    # IVF_CELLS, which a sparse random id set might otherwise miss)
    from aws_lambda_redshift_loader_spark.operators.similarity import DIM

    rows = [
        (k, (e * (DIM // len(e)))[:DIM])
        for k, (_, e) in enumerate(sorted(rows))
    ]
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [i for i, _ in rows], "e": [e for _, e in rows]}
        ),
        "vec_id bigint, e array<bigint>",
    )
    ids, cent = _kmeans_centroids(spark, emb, IVF_TRAIN_ITERS)
    batch_graph = {
        (r["src"], r["dst"])
        for r in _gann_edges(
            _probe_assign(emb, ids, cent, GANN_BUILD_PROBE)
        ).collect()
    }

    # arbitrary ordered 3-way split by (id + seed) mod 3 rank order
    ordered = sorted(rows)
    cuts = [len(ordered) // 3, 2 * len(ordered) // 3]
    parts = [
        ordered[: cuts[0]],
        ordered[cuts[0] : cuts[1]],
        ordered[cuts[1] :],
    ]
    if split_seed % 2:  # uneven alternative split
        parts = [ordered[:5], ordered[5:7], ordered[7:]]
    from pyspark.sql.window import Window as W

    all_deltas = []
    probed_epochs = []
    for k, part in enumerate(parts):
        if not part:
            probed_epochs.append(None)
            continue
        pdfk = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": [i for i, _ in part], "e": [e for _, e in part]}
            ),
            "vec_id bigint, e array<bigint>",
        )
        probed = _probe_assign(pdfk, ids, cent, GANN_BUILD_PROBE).withColumn(
            "epoch", F.lit(k)
        )
        probed_epochs.append(probed)
        members = None
        for j in range(k + 1):
            if probed_epochs[j] is not None:
                members = (
                    probed_epochs[j]
                    if members is None
                    else members.unionByName(probed_epochs[j])
                )
        all_deltas.append(_gann_delta_edges(members, k))
    cands = all_deltas[0]
    for d in all_deltas[1:]:
        cands = cands.unionByName(d)
    w = W.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst").asc())
    from aws_lambda_redshift_loader_spark.operators.similarity import GANN_DEG

    knn = (
        cands.dropDuplicates(["src", "dst"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GANN_DEG)
        .select("src", "dst")
    )
    resolved = {
        (r["src"], r["dst"])
        for r in knn.unionByName(
            knn.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .dropDuplicates(["src", "dst"])
        .collect()
    }
    assert resolved == batch_graph
