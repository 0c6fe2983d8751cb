"""Property test for the banded per-group median — the r13 rewrite's
two claims pinned directly: (1) the single-action relational target
derivation equals the rank-method median for ANY value distribution
(heavy ties included), and (2) ANY boundary geometry is correct
(boundaries shape balance, never the answer) — including degenerate
(empty), misaligned, and folded-from-elsewhere boundary sets, which is
what makes _fold_boundaries safe."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _spark():
    from aws_lambda_redshift_loader_spark.session import get_spark

    return get_spark("banded-median-prop")


groups = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.one_of(
            st.integers(min_value=-3, max_value=3),  # heavy ties
            st.integers(min_value=-(10**9), max_value=10**9),
        ),
    ),
    min_size=1,
    max_size=100,
)

geoms = st.sampled_from(["approx", "empty", "constant", "shifted"])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(groups, geoms)
def test_banded_group_median_exact_under_any_geometry(rows, geom):
    import pandas as pd

    from aws_lambda_redshift_loader_spark.operators.windows_sql import (
        _banded_group_median,
        _group_quantile_bands,
    )

    spark = _spark()
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
    present = sorted({g for g, _ in rows})
    if geom == "approx":
        boundaries = None
    elif geom == "empty":
        boundaries = {g: [] for g in present}
    elif geom == "constant":
        boundaries = {g: [0] for g in present}
    else:  # boundaries that belong to a different distribution entirely
        boundaries = {g: [10**8 * k for k in range(1, 5)] for g in present}
    med = _banded_group_median(
        df, "g", "v", "tid", "med", boundaries=boundaries, checkpoint=False
    )
    got = {r["g"]: r["med"] for r in med.collect()}
    exact = {}
    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        vs.sort()
        exact[g] = vs[(len(vs) + 1) // 2 - 1]  # rank-method median
    assert got == exact
