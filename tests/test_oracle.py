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
import re

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


# ---- typed-schema leg -----------------------------------------------------
# fetchall()+repr is blind to engine-side TYPE leaks: DuckDB fetches
# HUGEINT (window SUMs), DECIMAL, and INT32 (unnest) all as plain Python
# numbers, so values compare equal locally while the DRIVER's typed hash
# (arrow-side) fails — exactly the r14 sequence_packing_plan red pair.
# So every oracle's DESCRIBE types must canonically equal the Spark
# dtypes, modulo ONLY the documented driver-tolerated pairs below.


def _canon_spark(dt: str) -> str:
    dt = dt.strip().lower()
    m = re.match(r"decimal\((\d+),(\d+)\)$", dt)
    if m:
        return f"dec(s={m.group(2)})"
    m = re.match(r"array<(.*)>$", dt)
    if m:
        return f"arr<{_canon_spark(m.group(1))}>"
    if dt.startswith("struct<"):
        return "struct"
    return {
        "bigint": "i64", "int": "i32", "integer": "i32", "smallint": "i16",
        "tinyint": "i8", "double": "f64", "float": "f32", "string": "str",
        "boolean": "bool", "date": "date", "timestamp": "ts",
        "timestamp_ntz": "ts", "binary": "bin",
    }.get(dt, dt)


def _canon_duck(dt: str) -> str:
    dt = dt.strip()
    m = re.match(r"DECIMAL\((\d+),(\d+)\)$", dt)
    if m:
        return f"dec(s={m.group(2)})"
    if dt.endswith("[]"):
        return f"arr<{_canon_duck(dt[:-2])}>"
    if dt.startswith("STRUCT"):
        return "struct"
    return {
        "BIGINT": "i64", "HUGEINT": "dec(s=0)", "INTEGER": "i32",
        "SMALLINT": "i16", "TINYINT": "i8", "DOUBLE": "f64", "FLOAT": "f32",
        "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
        "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
        "TIMESTAMP_NS": "ts", "BLOB": "bin",
    }.get(dt, dt)


# (query, column) pairs proven driver-hash-tolerated across 14 green
# rounds (spark int vs duck BIGINT — both engines fetch plain ints).
# Do NOT widen this list for a new query; cast the oracle instead.
_TYPE_ALLOWLIST = {
    ("string_functions", "text_len"),
    ("window_ranking_family", "rnk"),
    ("window_ranking_family", "drnk"),
    ("window_topk_per_group", "rn"),
}


def _assert_types_match(name, spark_dtypes, con, oracle):
    duck_types = {
        r[0]: r[1] for r in con.execute(f"DESCRIBE {oracle}").fetchall()
    }
    leaks = []
    for col, sdt in spark_dtypes:
        if col not in duck_types or (name, col) in _TYPE_ALLOWLIST:
            continue
        a, b = _canon_spark(sdt), _canon_duck(duck_types[col])
        if a != b:
            leaks.append(f"{col}: spark={sdt} duck={duck_types[col]} ({a} vs {b})")
    assert not leaks, (
        f"{name}: oracle type leak (driver's typed hash WILL differ even "
        f"if values match — CAST in the oracle): {leaks}"
    )


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, name):
    from aws_lambda_redshift_loader_spark.session import release_persisted

    spec = SPECS[name]
    sdf = spec.fn(spark, SF_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    release_persisted()  # drop the query's own deferred persist()s

    con = _duck(SF_ORACLE)
    _assert_types_match(name, sdf.dtypes, con, spec.oracle)
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
