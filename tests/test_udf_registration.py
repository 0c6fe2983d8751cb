"""SURVEY §2.10 registration surface: the engine keeps every hot path
UDF-free (see tests/test_plan_shapes.py), but the extension surface the
survey row names — ``spark.udf.register`` reachable from SQL, the
equivalent of ``CREATE [TEMPORARY] FUNCTION`` — must exist and work.
The reference's analogous extension points are the arbitrary presql /
postsql hooks (index.js:1103-1105,1227-1229) and copyOptions passthrough
(index.js:1202-1204).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from aws_lambda_redshift_loader_spark.session import register_tables

from conftest import SF_SMOKE


def test_python_udf_register_and_sql_call(spark):
    # Row-at-a-time Python UDF registered by name and called through SQL —
    # the CREATE TEMPORARY FUNCTION equivalent. Fine off the hot path.
    spark.udf.register("strip_len", lambda s: len(s.strip()) if s else 0, "int")
    register_tables(spark, SF_SMOKE)
    got = spark.sql(
        "SELECT doc_id, strip_len(text) AS n FROM documents ORDER BY doc_id LIMIT 5"
    ).collect()
    want = (
        spark.table("documents")
        .select("doc_id", F.length(F.trim("text")).cast("int").alias("n"))
        .orderBy("doc_id")
        .limit(5)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pandas_udf_register_and_sql_call(spark):
    # Arrow-batched form of the same surface — what a user SHOULD register.
    @pandas_udf("double")
    def vec_norm_price(p: pd.Series) -> pd.Series:
        return p / 1000.0

    spark.udf.register("vec_norm_price", vec_norm_price)
    register_tables(spark, SF_SMOKE)
    got = spark.sql(
        "SELECT o_orderkey, vec_norm_price(o_totalprice) AS np "
        "FROM orders ORDER BY o_orderkey LIMIT 5"
    ).collect()
    want = (
        spark.table("orders")
        .select("o_orderkey", (F.col("o_totalprice") / 1000.0).alias("np"))
        .orderBy("o_orderkey")
        .limit(5)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_schema_of_json_infers_props_shape(spark):
    # F8 completeness: schema_of_json drives from_json schema discovery.
    row = spark.sql("SELECT schema_of_json('{\"k\": 42}') AS s").head()
    assert row.s == "STRUCT<k: BIGINT>"


def test_python_udtf_register_and_sql_call(spark):
    # §2.10's table-function surface: a Python UDTF registered by name
    # and lateral-joined in SQL (Spark 3.5+).
    try:
        from pyspark.sql.functions import udtf
    except ImportError:
        import pytest

        pytest.skip("udtf not in this pyspark")

    @udtf(returnType="pos INT, word STRING")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    rows = spark.sql(
        "SELECT t.pos, t.word FROM (SELECT 'a b c' AS s), LATERAL split_words(s) t"
    ).collect()
    assert [(r.pos, r.word) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]
