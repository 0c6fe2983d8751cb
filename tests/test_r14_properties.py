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
