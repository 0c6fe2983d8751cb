"""Query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as a named
query builder ``(spark, sf_dir) -> DataFrame`` plus (when the semantics are
ANSI-SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables. The driver hash-compares the two at sf=0.01, so:

- every computed column is aliased IDENTICALLY on both sides;
- float aggregates go through DECIMAL so both engines produce bit-identical
  doubles (double SUM order is nondeterministic under parallelism);
- timestamps are emitted as 'yyyy-MM-dd HH:mm:ss' strings or DATEs, with the
  Spark session pinned to UTC (session.tune).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so registrations run, then return QUERIES."""
    # Imports are inside the function so `import plans.registry` stays cheap
    # and circular-import-free; modules register on import.
    from ..operators import (  # noqa: F401
        batching_sql,
        dedup,
        multimodal,
        relational,
        similarity,
        text,
        windows_sql,
    )
    from ..streaming import stream_queries  # noqa: F401

    return QUERIES
