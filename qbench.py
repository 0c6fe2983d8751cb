#!/usr/bin/env python
"""Isolated per-query measurement + plan capture (optimization tooling).

Usage:
    python qbench.py [--sf-dir DIR] [--repeat N] [--no-warm]
                     [--explain-dir DIR] name [name ...]

Runs each named registered query against the noop sink (guide §1.4) on the
same session shape bench.py uses, printing per-run seconds plus any memo
events the run emitted (so a cache-hit run is never mistaken for the
standalone cost).  With --explain-dir, also writes
``<dir>/<name>.txt`` containing ``explain("formatted")`` for each query.

This is measurement tooling only: it never persists results and shares
bench.py's warmers so isolated numbers are comparable to BENCH_DETAIL rows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_lambda_redshift_loader_spark.plans.registry import load_all
from aws_lambda_redshift_loader_spark.session import get_spark, release_persisted


def warm(spark) -> None:
    """Same session-shape warmers as bench.py (flagship scan, Python
    worker daemon, grouped-Arrow, broadcast machinery, PPJoin shapes)."""
    import pandas as _pd
    from pyspark.sql import functions as _F

    specs = load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs["pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).mapInPandas(
        lambda it: (_pd.DataFrame({"id": pdf["id"]}) for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()
    spark.range(64).withColumn("g", _F.col("id") % 4).groupBy("g").applyInPandas(
        lambda pdf: _pd.DataFrame({"g": [int(pdf["g"].iloc[0])], "n": [len(pdf)]}),
        schema="g long, n long",
    ).write.format("noop").mode("overwrite").save()
    spark.range(64).join(_F.broadcast(spark.range(8)), "id").write.format(
        "noop"
    ).mode("overwrite").save()
    from aws_lambda_redshift_loader_spark.functions.scalar import hex_hash64 as _hh64
    from aws_lambda_redshift_loader_spark.operators import dedup as _dd

    _tinydocs = spark.range(32).select(
        _F.col("id").alias("doc_id"),
        _F.concat_ws(
            " ",
            *[
                _F.concat(_F.lit(f"w{j}x"), (_F.col("id") % (j + 2)))
                for j in range(8)
            ],
        ).alias("text"),
    )
    _tsh = _dd._shingles_of(_tinydocs).select(
        "doc_id", _hh64(_F.col("shingle")).alias("shingle")
    )
    _tw, _ts, _tc = _dd._ppjoin_candidates(_tsh, _dd.JACCARD_THRESHOLD)
    _dd._ppjoin_verify_suffix(_tw, _ts, _tc, _dd.JACCARD_THRESHOLD).write.format(
        "noop"
    ).mode("overwrite").save()
    from aws_lambda_redshift_loader_spark.streaming.stream_queries import (
        warm_stream_shapes,
    )

    warm_stream_shapes(spark)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("qbench")
    specs = load_all()
    from aws_lambda_redshift_loader_spark.operators import dedup as _dedup

    names: list[str] = []
    for n in args.names:
        if n in specs:
            names.append(n)
        else:
            hits = sorted(k for k in specs if k.startswith(n))
            if not hits:
                raise SystemExit(f"unknown query: {n}")
            names.extend(hits)

    if not args.no_warm:
        warm(spark)

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)

    for name in names:
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"qbench:{name}#{i}")
            n_events = len(_dedup.MEMO_EVENTS)
            t0 = time.perf_counter()
            df = specs[name].fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            ev = _dedup.MEMO_EVENTS[n_events:]
            print(f"{name}\trun{i}\t{dt:.3f}s\t{','.join(ev)}", flush=True)
            if args.explain_dir and i == 0:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as fh:
                    fh.write(buf.getvalue())
            release_persisted()
            spark.catalog.clearCache()
            for tbl in spark.catalog.listTables():
                if tbl.name.startswith("stream_result_"):
                    spark.catalog.dropTempView(tbl.name)
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
