"""Property test for the banded global rank — the exactness claim
(_banded_rank equals an unpartitioned row_number for ANY score
distribution, including heavy ties and adversarial clustering around
the approximate band boundaries) is the whole reason the rewrite is
safe, so it gets pinned directly rather than only via the two
registered queries' oracles."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _spark():
    from aws_lambda_redshift_loader_spark.session import get_spark

    return get_spark("banded-rank-prop")


scores = st.lists(
    st.one_of(
        st.integers(min_value=-5, max_value=5),  # heavy ties
        st.integers(min_value=-(10**9), max_value=10**9),
    ),
    min_size=1,
    max_size=120,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(scores)
def test_banded_rank_equals_global_row_number(vals):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from aws_lambda_redshift_loader_spark.operators.text import _banded_rank

    spark = _spark()
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(len(vals)), "s": [float(v) for v in vals]}
        ).astype({"doc_id": "int64"}),
        "doc_id bigint, s double",
    )
    ranked, total = _banded_rank(df, "s", "r")
    got = {r["doc_id"]: r["r"] for r in ranked.collect()}
    exact = {
        r["doc_id"]: r["r"]
        for r in df.withColumn(
            "r",
            F.row_number()
            .over(W.orderBy(F.col("s").asc(), F.col("doc_id").asc()))
            .cast("bigint"),
        ).collect()
    }
    assert total == len(vals)
    assert got == exact
