"""Prefix routing: hive-wildcard transform, prefix shortening, config
resolution, filename filtering (reference P2-P5).

Two forms of each rule:
- pure-Python (driver-side, for per-event control flow — mirrors the
  reference's per-Lambda-invocation logic and its unit fixtures,
  test/testCommon.js:8-27);
- DataFrame (set-oriented, for routing millions of files in one pass —
  the longest_prefix_route query in operators.relational).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

def parse_suppression_list(val: str | bool | None) -> list[str] | None:
    """SuppressWildcardExpansionPrefixList env parsing
    (getWildcardPrefixSuppressionList, common.js:56-67 + fixture
    test/testCommon.js:10-13): ``"*"`` (or True) → suppress everything;
    otherwise split on commas/whitespace."""
    if not val:
        return None
    if val is True or val == "*":
        return ["*"]
    return [p for p in re.split(r"[ ,]+", val) if p]


def transform_hive_style_prefix(prefix: str, suppress: list[str] | bool | None = None) -> str:
    """`name=value` path segments → `name=*` (transformHiveStylePrefix,
    common.js:36-54), unless the prefix is suppressed.

    ``suppress`` mirrors SuppressWildcardExpansionPrefixList
    (common.js:39-41): EXACT membership (`suppressionList.includes`),
    not a startswith test — a suppressed prefix exempts only itself,
    never its sub-paths (reference fixtures test/testCommon.js:15-26).
    ``True`` or ``["*"]`` suppresses everything. Segment rewrite matches
    the reference's `replace(/\\=(.*)/, "=*")`: anything from the first
    '=' onward becomes '=*' in any segment containing '='."""
    suppress = parse_suppression_list(suppress) if isinstance(suppress, (str, bool)) else suppress
    suppress = suppress or []
    if "*" in suppress or prefix in suppress:
        return prefix
    parts = [
        f"{seg.split('=', 1)[0]}=*" if "=" in seg else seg for seg in prefix.split("/")
    ]
    return "/".join(parts)


def shorten_prefix(prefix: str) -> str | None:
    """Drop the last `/` segment (shortenPrefix, common.js:28-34);
    None once nothing is left to shorten."""
    if "/" not in prefix:
        return None
    return prefix.rsplit("/", 1)[0]


def resolve_config(prefix: str, configs: dict[str, "LoadConfig"]) -> "LoadConfig | None":
    """Longest-prefix config match by successive shortening (resolveConfig
    loop, index.js:131-170). Driver-side: the config dict is tiny."""
    p: str | None = prefix
    while p is not None:
        if p in configs:
            return configs[p]
        p = shorten_prefix(p)
    return None


def filename_filter(key: str, pattern: str | None) -> bool:
    """filenameFilterRegex gate with the reference's fail-open semantics
    (index.js:212-234): a *malformed* regex must INCLUDE the file (the
    reference logs and proceeds rather than dropping data)."""
    if not pattern:
        return True
    try:
        compiled = re.compile(pattern)
    except re.error:
        return True  # fail-open: never drop data on a bad config regex
    return compiled.search(key) is not None


def filename_filter_col(key: Column, pattern: str | None) -> Column:
    """DataFrame form of filename_filter; fail-open handled at plan build
    time (pattern validated driver-side, where the config lives)."""
    if not pattern:
        return F.lit(True)
    try:
        re.compile(pattern)
    except re.error:
        return F.lit(True)
    return key.rlike(pattern)


@dataclass
class ClusterSink:
    """One load target (reference `loadClusters` entry, setup.js:28-43):
    endpoint+table for a JDBC warehouse, or a path for a lakehouse table."""

    target_table: str
    jdbc_url: str | None = None  # None → parquet/Delta path sink
    path: str | None = None
    column_list: list[str] | None = None  # P7 ordered column projection
    presql: str | None = None
    postsql: str | None = None
    truncate_target: bool = False
    # Free-form DataFrameWriter options (the sink half of the reference's
    # copyOptions passthrough, index.js:1202-1204): JDBC tuning such as
    # batchsize/isolationLevel, or parquet codec for path sinks. Applied
    # verbatim to every write this sink performs.
    writer_options: dict[str, str] = field(default_factory=dict)


@dataclass
class LoadConfig:
    """Per-prefix load spec (reference config item, common.js:148-163,
    config.json.commented). The §1.1 surface minus AWS plumbing."""

    s3_prefix: str
    data_format: str = "CSV"  # CSV | JSON | AVRO | PARQUET | ORC
    csv_delimiter: str = "|"
    ignore_csv_header: bool = False
    json_path: str | None = None
    column_list: list[str] | None = None  # P7 ordered projection (index.js:1157-1161)
    filename_filter_regex: str | None = None
    # Streaming-only pushdown variant: a GLOB (Hadoop pathGlobFilter), NOT a
    # regex — unmatched files are skipped at listing time, never opened. A
    # regex fed to pathGlobFilter silently drops everything (the inverse of
    # P2's fail-open contract), so the two filters are separate fields.
    filename_filter_glob: str | None = None
    batch_size: int = 0  # T1 count trigger; 0 = disabled
    batch_size_bytes: int = 0  # T2 bytes trigger; 0 = disabled
    batch_timeout_secs: int = 0  # T3 age trigger; 0 = disabled
    schema: str | None = None  # DDL string; None = infer (CSV/JSON only)
    sinks: list[ClusterSink] = field(default_factory=list)  # S5 fan-out
    current_batch: str | None = None  # rotated by the batcher (T5)
    # COPY `MAXERROR N` analog (copyOptions passthrough, index.js:1202-1204;
    # Redshift fails the load once the malformed-row count REACHES N, with
    # N=0 meaning any error fails). None = Spark's default permissive
    # parse; an int = count malformed CSV/JSON rows against the budget —
    # under it they are dropped (and available for audit), at or over it
    # the load fails atomically. Requires `schema`.
    max_error: int | None = None
    # Free-form Spark reader options — the general copyOptions passthrough
    # (index.js:1202-1204). Redshift COPY options map onto Spark reader
    # options the user supplies verbatim, e.g. DATEFORMAT → dateFormat,
    # NULL AS → nullValue, QUOTE → quote, ESCAPE → escape, ENCODING →
    # encoding, TRIMBLANKS → ignoreTrailingWhiteSpace. Applied after the
    # structured fields above, so an explicit option wins over defaults.
    reader_options: dict[str, str] = field(default_factory=dict)
    # Explicit compression directive (index.js:1196-1199: GZIP | BZIP2 |
    # LZOP | NONE appended to COPY). Spark auto-detects codecs by
    # extension, so the directive's contract here is the reference's
    # error-on-mismatch: declared codec must match every file's extension
    # or the load fails before any bytes are read. None = auto-detect.
    compression: str | None = None
