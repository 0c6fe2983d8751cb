"""Z-order layout audit: beyond the oracle hash (bucket zone maps match
DuckDB), assert the layout CLAIM — interleaved keys bound BOTH dimensions
per bucket, where a single-column sort leaves the other dimension's
per-bucket span at ~full width."""

from __future__ import annotations

from aws_lambda_redshift_loader_spark.operators.relational import (
    ZORDER_BUCKETS,
    zorder_layout_audit,
)

from conftest import SF_ORACLE


def test_zorder_bounds_both_dimensions(spark):
    rows = zorder_layout_audit(spark, SF_ORACLE).collect()
    assert len(rows) == ZORDER_BUCKETS
    ck_lo = min(r.custkey_min for r in rows)
    ck_hi = max(r.custkey_max for r in rows)
    d_lo = min(r.date_min for r in rows)
    d_hi = max(r.date_max for r in rows)
    ck_span = max(ck_hi - ck_lo, 1)
    d_span = max(d_hi - d_lo, 1)
    # Mean per-bucket span fraction on each dim. A perfect single-dim
    # sort gives ~1/BUCKETS on its own dim and ~1.0 on the other; z-order
    # trades to a middle ground where BOTH are well below full width —
    # that's the property that makes zone maps prune on either predicate.
    ck_frac = sum((r.custkey_max - r.custkey_min) / ck_span for r in rows) / len(rows)
    d_frac = sum((r.date_max - r.date_min) / d_span for r in rows) / len(rows)
    assert ck_frac < 0.6, f"custkey mean span fraction {ck_frac:.3f} — no clustering"
    assert d_frac < 0.6, f"date mean span fraction {d_frac:.3f} — no clustering"
    # And every bucket is populated (ntile guarantees near-even sizes).
    assert all(r.n_rows > 0 for r in rows)
