"""Local mirror of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle on the same parquet, compare
row-count, column names, and (order-insensitively) every value exactly.

Exact comparison is intentional — the engine's determinism strategy
(DECIMAL sums, quantized embeddings, fixed-order double expressions,
cross-engine md5 hashing) is supposed to make values bit-identical, and
this test is where that strategy is enforced.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from aws_lambda_redshift_loader_spark.plans.registry import load_all
from aws_lambda_redshift_loader_spark.session import TABLES

from conftest import SF_ORACLE

SPECS = load_all()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(rows, colnames):
    """Rows → sorted list of value-repr tuples in column-name order."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, name):
    from aws_lambda_redshift_loader_spark.session import release_persisted

    spec = SPECS[name]
    sdf = spec.fn(spark, SF_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    release_persisted()  # drop the query's own deferred persist()s

    con = _duck(SF_ORACLE)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[0]}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_ORACLE)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
