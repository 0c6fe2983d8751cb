#!/usr/bin/env python
"""Benchmark: run the full registered query inventory at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Materialization uses the noop sink — full execution of every operator,
zero driver-side collection cost, which is what a warehouse write would
look like (the reference's COPY analog).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_lambda_redshift_loader_spark.plans.registry import load_all
from aws_lambda_redshift_loader_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # 62 queries in one JVM accumulate broadcasts / memory-sink tables /
    # AQE state; a small heap GC-thrashes the alphabetical tail. The box
    # has 128 GiB — give the bench session real headroom.
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("bench")

    specs = load_all()
    timings: dict[str, float] = {}
    # Warm the JVM + file-system caches once with the flagship query so
    # per-query numbers measure the operators, not session startup.
    specs["pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Also warm the Python worker daemon (one-time ~10 s cost otherwise
    # billed to whichever Arrow/pandas query happens to run first).
    import pandas as _pd

    spark.range(32).mapInPandas(
        lambda it: ( _pd.DataFrame({"id": pdf["id"]}) for pdf in it ), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name in sorted(specs):
        print(f"# bench running {name}", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"# bench error in {name}: {exc}", file=sys.stderr)
        # Drop per-query litter (cached rels, memory-sink temp views) so
        # later queries measure operators, not accumulated heap pressure.
        spark.catalog.clearCache()
        for tbl in spark.catalog.listTables():
            if tbl.name.startswith("stream_result_"):
                spark.catalog.dropTempView(tbl.name)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_runtime_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
