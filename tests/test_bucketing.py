"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the shuffle entirely — the physical plan has no Exchange. This
is the 'repartition()/bucketing for co-located joins' lever the engine
recommends for repeated fact-fact joins at 100 TB (SCALE.md): pay the
shuffle once at write time, never at query time."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = spark.range(0, 10_000).selectExpr(
        "id AS o_orderkey", "id % 500 AS o_custkey", "cast(id * 1.5 as double) AS o_total"
    )
    items = spark.range(0, 30_000).selectExpr(
        "id % 10000 AS l_orderkey", "cast(id % 7 as double) AS l_qty"
    )
    # Tables are path-based (option("path")), so the static warehouse dir
    # is irrelevant; only the metastore entry lives in the session.
    for name, df, key in [("b_orders", orders, "o_orderkey"), ("b_items", items, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "b_orders", "b_items"
    for name in ("b_orders", "b_items"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t_orders, t_items = bucketed_tables
    # Disable broadcast so the join strategy decision is about shuffles.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            f"""
            SELECT o.o_custkey, COUNT(*) AS n, SUM(i.l_qty) AS qty
            FROM {t_orders} o JOIN {t_items} i ON i.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey
            """
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # The join itself must be exchange-free: both sides arrive
        # pre-partitioned by bucket. (The groupBy on o_custkey may still
        # exchange — different key.)
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert joined.count() == 500  # answers still correct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
