"""Write-path layout for data skipping: repartitionByRange +
sortWithinPartitions produces files whose per-file key ranges are
disjoint, so a point/range predicate prunes row groups via parquet
min/max stats instead of scanning — the layout lever SCALE.md
prescribes for 100 TB fact tables keyed by date/id."""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def test_range_partitioned_sorted_write_has_disjoint_file_ranges(spark, tmp_path):
    df = spark.range(0, 200_000).selectExpr("id AS k", "id % 97 AS v")
    out = str(tmp_path / "sorted")
    (
        df.repartitionByRange(8, "k")
        .sortWithinPartitions("k")
        .write.parquet(out)
    )
    ranges = []
    for fn in os.listdir(out):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, fn)).metadata
        col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["k"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(col_idx).statistics
            mins.append(stats.min)
            maxs.append(stats.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 8
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges {hi1} >= {lo2}"

    # And the skipping pays off: a narrow range predicate reads back
    # correctly through the pruned scan.
    got = spark.read.parquet(out).filter("k BETWEEN 1000 AND 1009").count()
    assert got == 10
