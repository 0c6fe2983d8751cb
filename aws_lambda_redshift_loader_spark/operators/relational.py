"""Relational operator surface (SURVEY.md §2.2-§2.8).

Each query builder maps a reference behavior (cited `file:line` into
/root/reference) to its idiomatic-Spark form and registers with a DuckDB
oracle. Determinism rules from plans.registry apply throughout: DECIMAL
for float sums, explicit aliases, string-formatted timestamps, total
ordering for any window/rank.

Scale notes are inline per operator — the working set here is the sf0.01
fixture, but every plan is written for the 100 TB shape (broadcast the
small side, pre-aggregate before joins where possible, never collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.scalar import dec, hex_hash64, strip_filename, wildcard_hive
from ..plans.registry import register
from ..session import defer_unpersist, table


# ---------------------------------------------------------------------------
# Aggregations (reference A1-A3: index.js:344,370-372; 651-660; 634-643)
# ---------------------------------------------------------------------------

# Precision strategy (two engine quirks, one fix):
#   (a) Spark silently rounds decimal scale once a product exceeds 38
#       digits — keep factor casts small (15,4 / 6,4) so products stay
#       exact in both engines.
#   (b) DuckDB's DECIMAL→DOUBLE goes int128→double→÷10^scale, which
#       double-rounds once the unscaled sum exceeds 2^53. The source data
#       has ≤2 decimal digits, so re-casting each product to its *true*
#       scale (≤6) is lossless and keeps unscaled sums < 2^53 up to SF 1.
_PRICING_ORACLE = """
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
"""


@register("pricing_summary", _PRICING_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shape grouped aggregation.

    Reference analog: the batch counters A1 (running size sum,
    index.js:344), A2 (entry count, index.js:651-660) expressed as a
    declarative groupBy — Catalyst plans partial (map-side) + final
    aggregation automatically, which is exactly the incremental-counter
    pattern the reference hand-rolls with DynamoDB ADD.

    Scale: single shuffle on the (tiny-cardinality) group keys after a
    pushed-down scan filter; safe at any SF.
    """
    one = F.lit(1).cast("decimal(6,4)")
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    price = dec("l_extendedprice", 15, 4)
    disc_price = (price * (one - dec("l_discount", 6, 4))).cast("decimal(18,6)")
    charge = (
        price * (one - dec("l_discount", 6, 4)) * (one + dec("l_tax", 6, 4))
    ).cast("decimal(18,6)")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 15, 4)).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity", 15, 4)).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "distinct_agg",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (absent in reference; §2.4 engine surface).

    Scale: two distinct columns → Catalyst expands to a partial-distinct
    plan; fine as long as per-group distinct cardinality shards across
    partitions.
    """
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "approx_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS parts_within_5pct,
           TRUE AS orders_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`approx_count_distinct` — the at-scale form of distinct_agg
    (HyperLogLog++, constant memory per group) — made hash-verifiable by
    asserting the sketch's contract instead of its registers: HLL
    estimates are engine-specific bit patterns, so the output carries the
    exact per-group distinct counts plus BOOLEAN columns stating the HLL
    estimate (rsd=0.02) landed within ±5% of exact. The DuckDB oracle
    emits the same groups with literal TRUE — any sketch regression
    beyond the bound flips a boolean and fails the value hash, which is
    a strictly stronger check than the old rows-only form (five rounds
    of `err=no_oracle`).

    Scale note: the exact countDistinct audit side exists only to bound
    the sketch here; the production form at 100 TB is the sketch alone
    (one pass, constant memory/group — same shape as heavy_hitters_cms
    vs heavy_hitters_cms_only). The exact and approx aggregates run as
    SEPARATE groupBys joined on the (tiny) group key: mixing DISTINCT
    aggregates with HLL buffers in one agg makes Catalyst route every
    Expand replica through the sketch update (measured 74s vs 1.5s at
    sf0.1); rsd=0.02 keeps HLL register count ~4x smaller than 0.01
    while staying well inside the asserted ±5% bound."""
    li = table(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (  # noqa: E731
        (F.col(approx).cast("double") >= 0.95 * F.col(exact))
        & (F.col(approx).cast("double") <= 1.05 * F.col(exact))
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("_ap"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("_ao"),
    )
    return exact.join(approx, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        within("_ap", "exact_parts").alias("parts_within_5pct"),
        within("_ao", "exact_orders").alias("orders_within_5pct"),
    )


KMV_K = 256  # sketch size (k minimum values); rel. error ~ 1/sqrt(k) ≈ 6%


@register(
    "kmv_distinct_estimate",
    f"""
    WITH h AS (
      SELECT DISTINCT l_returnflag,
             CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM lineitem
    ),
    ranked AS (
      SELECT l_returnflag, hv,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY hv ASC) AS rn
      FROM h
    ),
    sketch AS (
      SELECT l_returnflag, COUNT(*) AS n_kept, MAX(hv) AS kth
      FROM ranked WHERE rn <= {KMV_K} GROUP BY l_returnflag
    ),
    exact AS (
      SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT e.l_returnflag, e.exact_distinct,
           CAST(CASE WHEN s.n_kept < {KMV_K} THEN s.n_kept
                     ELSE floor(({KMV_K} - 1) * 1152921504606846976.0 / s.kth) END
                AS BIGINT) AS kmv_estimate
    FROM exact e JOIN sketch s ON s.l_returnflag = e.l_returnflag
    """,
)
def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count sketching that IS cross-engine deterministic: a
    k-minimum-values sketch (Bar-Yossef et al. 2002) over the md5-derived
    60-bit hash — estimate = (k-1)·2^60 / k-th smallest hash, exact count
    when a group holds fewer than k distinct hashes. Unlike HLL
    (approx_distinct, engine-specific registers), every intermediate here
    is reproducible anywhere: md5 hashes, a per-group top-k, one double
    multiply/divide ((k-1)·2^60 is a small-int × power-of-two — exactly
    representable), floor. Emitted next to the exact distinct so the
    ~1/√k relative error is visible in the result itself.

    Scale: the sketch is mergeable — per-partition top-k then global
    top-k (Spark's row_number window after a distinct); memory per group
    is K hashes regardless of cardinality. At 100 TB this is the
    pre-aggregation you'd persist per shard and merge at read time."""
    li = table(spark, sf_dir, "lineitem")
    h = li.select(
        "l_returnflag", hex_hash64(F.col("l_orderkey").cast("string")).alias("hv")
    ).distinct()
    w = W.partitionBy("l_returnflag").orderBy(F.col("hv").asc())
    sketch = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_kept"), F.max("hv").alias("kth"))
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("exact_distinct")
    )
    est = (
        F.when(F.col("n_kept") < KMV_K, F.col("n_kept"))
        .otherwise(F.floor((KMV_K - 1) * F.lit(1152921504606846976.0) / F.col("kth")))
        .cast("bigint")
    )
    return exact.join(sketch, "l_returnflag").select(
        "l_returnflag", "exact_distinct", est.alias("kmv_estimate")
    )


@register(
    "duplicate_delivery_counts",
    """
    WITH deliveries AS (
      SELECT event_id FROM events
      UNION ALL
      SELECT event_id FROM events WHERE event_id % 10 = 0
    )
    SELECT event_id, COUNT(*) AS times_received
    FROM deliveries GROUP BY event_id HAVING COUNT(*) > 1
    """,
)
def duplicate_delivery_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 `timesReceived` counter (index.js:262-271): at-least-once delivery
    simulated by re-delivering every 10th event; grouped count recovers the
    per-file duplicate tally the reference keeps with DynamoDB ADD."""
    ev = table(spark, sf_dir, "events").select("event_id")
    deliveries = ev.unionAll(ev.filter(F.col("event_id") % 10 == 0))
    return (
        deliveries.groupBy("event_id")
        .agg(F.count("*").alias("times_received"))
        .filter(F.col("times_received") > 1)
    )


@register(
    "all_clusters_ok",
    """
    WITH per_order AS (
      SELECT l_orderkey, BOOL_AND(l_returnflag <> 'R') AS all_ok
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT all_ok, COUNT(*) AS n_orders FROM per_order GROUP BY all_ok
    """,
)
def all_clusters_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 all-clusters-OK fold (index.js:909-925): boolean AND over
    per-cluster load results → `bool_and` over a group, then a rollup of
    how many batches were fully OK."""
    per_order = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.bool_and(F.col("l_returnflag") != "R").alias("all_ok"))
    )
    return per_order.groupBy("all_ok").agg(F.count("*").alias("n_orders"))


@register(
    "rollup_revenue",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (absent in reference; §2.4 engine surface). COALESCE labels
    keep the subtotal rows readable and hash-stable."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"), F.count("*").alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "cube_order_stats",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (absent in reference; §2.4 engine surface)."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "sum_price",
            "n_orders",
        )
    )


@register(
    "grouping_sets_mix",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL (absent in reference; §2.4)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows
        FROM v_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Projections / filters / predicates (reference P1-P7)
# ---------------------------------------------------------------------------


@register(
    "filter_project",
    """
    SELECT o_orderkey, o_custkey,
           upper(o_orderpriority) AS priority_uc,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice AS total_price
    FROM orders
    WHERE o_orderstatus IN ('O', 'F') AND o_totalprice > 1000.0
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 event-validity predicate shape (index.js:1554-1574: eventSource /
    eventName isin) + P6 display projection (batchOperations.js:163-175).

    Scale: filter + projection push into the parquet scan —
    `.explain` shows PushedFilters + pruned ReadSchema.
    """
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F") & (F.col("o_totalprice") > 1000.0)
    ).select(
        "o_orderkey",
        "o_custkey",
        F.upper("o_orderpriority").alias("priority_uc"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.col("o_totalprice").alias("total_price"),
    )


@register(
    "regex_filename_filter",
    r"""
    WITH files AS (
      SELECT concat(source, '/doc-', CAST(doc_id AS VARCHAR), '.txt') AS file,
             n_chars AS size
      FROM documents
    )
    SELECT file, size FROM files
    WHERE regexp_matches(file, 'doc-[0-9]*[02468]\.txt$')
    """,
)
def regex_filename_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 filenameFilterRegex gate (index.js:212-234): regex test of the
    object key. Fail-open semantics (malformed regex ⇒ include) live in
    sources.routing.filename_filter and are unit-tested; this query is the
    well-formed-regex data path."""
    files = table(spark, sf_dir, "documents").select(
        F.concat(F.col("source"), F.lit("/doc-"), F.col("doc_id").cast("string"), F.lit(".txt")).alias(
            "file"
        ),
        F.col("n_chars").alias("size"),
    )
    return files.filter(F.col("file").rlike(r"doc-[0-9]*[02468]\.txt$"))


@register(
    "prefix_projection",
    """
    WITH paths AS (
      SELECT doc_id,
             concat('bucket/', source, '/lang=', lang, '/doc-',
                    CAST(doc_id AS VARCHAR), '.txt') AS path
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(path, '/[^/]+$', '') AS prefix,
           regexp_extract(path, '([^/]+)$', 1) AS filename
    FROM paths
    """,
)
def prefix_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 key→prefix projection (index.js:1585-1601) + F2 tokenize
    (common.js:28-54): strip the filename segment, extract it separately."""
    paths = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("bucket/"),
            F.col("source"),
            F.lit("/lang="),
            F.col("lang"),
            F.lit("/doc-"),
            F.col("doc_id").cast("string"),
            F.lit(".txt"),
        ).alias("path"),
    )
    return paths.select(
        "doc_id",
        strip_filename(F.col("path")).alias("prefix"),
        F.regexp_extract("path", r"([^/]+)$", 1).alias("filename"),
    )


@register(
    "hive_wildcard_prefix",
    """
    SELECT doc_id,
           regexp_replace(concat('mybucket/lang=', lang, '/source=', source,
                                 '/part-', CAST(doc_id AS VARCHAR)),
                          '=[^/]+', '=*', 'g') AS wildcard_prefix
    FROM documents
    """,
)
def hive_wildcard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 hive-wildcard transform (transformHiveStylePrefix,
    common.js:36-54): every `name=value` segment → `name=*`. In native
    Spark ingestion this is partition discovery; kept for routing parity."""
    d = table(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("mybucket/lang="),
        F.col("lang"),
        F.lit("/source="),
        F.col("source"),
        F.lit("/part-"),
        F.col("doc_id").cast("string"),
    )
    return d.select("doc_id", wildcard_hive(path).alias("wildcard_prefix"))


@register(
    "longest_prefix_route",
    """
    WITH configs(s3Prefix, target_table) AS (
      VALUES ('mybucket', 'catch_all'),
             ('mybucket/lang=en', 'english_docs'),
             ('mybucket/lang=en/source=src1', 'english_src1'),
             ('mybucket/lang=zh', 'chinese_docs')
    ), paths AS (
      SELECT doc_id,
             concat('mybucket/lang=', lang, '/source=', source,
                    '/doc-', CAST(doc_id AS VARCHAR), '.txt') AS path
      FROM documents
    )
    SELECT doc_id, path, s3Prefix AS matched_prefix, target_table
    FROM paths JOIN configs ON starts_with(path, s3Prefix)
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY length(s3Prefix) DESC) = 1
    """,
)
def longest_prefix_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/J2 hierarchical config resolution (shortenPrefix common.js:28-34,
    resolveConfig loop index.js:131-170): longest matching prefix wins.

    Spark-first: instead of N sequential DynamoDB lookups per file, one
    broadcast join of paths against the (tiny) config table + a rank.
    Scale: config table is KBs → broadcast; no shuffle of the file list
    except the per-path window, which AQE keeps local after the broadcast.
    """
    configs = spark.createDataFrame(
        [
            ("mybucket", "catch_all"),
            ("mybucket/lang=en", "english_docs"),
            ("mybucket/lang=en/source=src1", "english_src1"),
            ("mybucket/lang=zh", "chinese_docs"),
        ],
        ["s3Prefix", "target_table"],
    )
    paths = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("mybucket/lang="),
            F.col("lang"),
            F.lit("/source="),
            F.col("source"),
            F.lit("/doc-"),
            F.col("doc_id").cast("string"),
            F.lit(".txt"),
        ).alias("path"),
    )
    joined = paths.join(
        F.broadcast(configs), F.expr("startswith(path, s3Prefix)"), "inner"
    )
    w = W.partitionBy("doc_id").orderBy(F.length("s3Prefix").desc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "path", F.col("s3Prefix").alias("matched_prefix"), "target_table")
    )


# ---------------------------------------------------------------------------
# Joins (reference J1-J3 + engine surface §2.3)
# ---------------------------------------------------------------------------


@register(
    "ledger_anti_join",
    """
    WITH incoming AS (
      SELECT concat(source, '/doc-', CAST(doc_id AS VARCHAR), '.txt') AS file,
             n_chars AS size, doc_id
      FROM documents
    ), ledger AS (
      SELECT file FROM incoming WHERE doc_id % 3 = 0
    )
    SELECT i.file, i.size FROM incoming i
    ANTI JOIN ledger l ON i.file = l.file
    """,
)
def ledger_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 processed-file ledger dedup (checkFileProcessed,
    index.js:247-306): a file proceeds only if the ledger has no batch link
    — left anti join semantics.

    Scale: ledger keyed by file path; anti join shuffles on the key (or
    broadcasts if the recent-ledger partition is small). Streaming path
    uses the file-source checkpoint instead (SURVEY §2.9 T6).
    """
    incoming = table(spark, sf_dir, "documents").select(
        F.concat(F.col("source"), F.lit("/doc-"), F.col("doc_id").cast("string"), F.lit(".txt")).alias(
            "file"
        ),
        F.col("n_chars").alias("size"),
        "doc_id",
    )
    ledger = incoming.filter(F.col("doc_id") % 3 == 0).select("file")
    return incoming.join(ledger, "file", "left_anti").select("file", "size")


@register(
    "reprocess_omit_except",
    """
    WITH entries AS (
      SELECT concat(source, '/doc-', CAST(doc_id AS VARCHAR), '.txt') AS file,
             doc_id
      FROM documents WHERE source IN ('src0','src1','src2','src3','src4')
    ), omit AS (
      SELECT file FROM entries WHERE doc_id % 7 = 0
    )
    SELECT file FROM entries
    EXCEPT ALL
    SELECT file FROM omit
    """,
)
def reprocess_omit_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/U2 reprocess omit list (batchOperations.js:312-344): batch
    entries minus `omitFiles` — EXCEPT ALL semantics."""
    entries = (
        table(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1", "src2", "src3", "src4"))
        .select(
            F.concat(
                F.col("source"), F.lit("/doc-"), F.col("doc_id").cast("string"), F.lit(".txt")
            ).alias("file"),
            "doc_id",
        )
    )
    omit = entries.filter(F.col("doc_id") % 7 == 0).select("file")
    return entries.select("file").exceptAll(omit)


@register(
    "legacy_union_merge",
    """
    SELECT concat('src0/doc-', CAST(doc_id AS VARCHAR)) AS file
    FROM documents WHERE source = 'src0'
    UNION
    SELECT concat('src0/doc-', CAST(doc_id AS VARCHAR)) AS file
    FROM documents WHERE source = 'src0' AND doc_id % 2 = 0
    """,
)
def legacy_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 legacy-`entries` ∪ `entryMap` merge (index.js:647-660): union of
    the old string-set and new list-of-maps representations, deduplicated."""
    d = table(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    newfmt = d.select(F.concat(F.lit("src0/doc-"), F.col("doc_id").cast("string")).alias("file"))
    legacy = d.filter(F.col("doc_id") % 2 == 0).select(
        F.concat(F.lit("src0/doc-"), F.col("doc_id").cast("string")).alias("file")
    )
    return newfmt.unionByName(legacy).distinct()


@register(
    "set_intersect",
    """
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (absent in reference; §2.7 engine surface): customers
    active in both 1996 and 1997."""
    o = table(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97)


@register(
    "revenue_by_nation",
    """
    SELECT n_name AS nation,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,4)) *
                         (1 - CAST(l_discount AS DECIMAL(6,4)))
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join chain (TPC-H Q5 shape; reference has no general joins
    — §2.3 engine surface).

    Scale: lineitem⋈orders is the only big-big join (shuffle on orderkey);
    customer/nation/region are broadcast — explicitly hinted so the plan
    survives stats loss at 100 TB.
    """
    one = F.lit(1).cast("decimal(6,4)")
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (dec("l_extendedprice", 15, 4) * (one - dec("l_discount", 6, 4))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "semi_join_active_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS; §2.3 engine surface): customers with at
    least one open order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join_idle_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS; §2.3): customers with no orders at all."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "range_join_price_band",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 910.0),
             ('mid',    910.0, 1400.0),
             ('premium',1400.0, 1e12)
    )
    SELECT band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join (§2.3 engine surface): bucket rows into
    interval bands.

    Scale: the band table is tiny → broadcast nested-loop join, which is
    the right physical plan; for big-big range joins, bucketize the range
    key to an equi-join first (see asof_join_latest_view for the pattern).
    """
    bands = spark.createDataFrame(
        [("budget", 0.0, 910.0), ("mid", 910.0, 1400.0), ("premium", 1400.0, 1e12)],
        ["band", "lo", "hi"],
    )
    p = table(spark, sf_dir, "part")
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(dec("p_retailprice")).cast("double").alias("sum_price"),
        )
    )


@register(
    "asof_join_latest_view",
    """
    WITH purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ), views AS (
      SELECT user_id, ts, MAX(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.purchase_value,
           v.view_value AS last_view_value
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_join_latest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (absent in Spark and the reference; §2.3 engine surface):
    for each purchase, the most recent prior-or-equal view by the same
    user.

    Spark-first implementation: union the two streams with a source tag and
    take `last(view_value, ignoreNulls)` over a per-user time-ordered
    window — one shuffle on user_id, no per-row lookups, no pandas. This
    scales to arbitrarily large sides (vs merge_asof-in-pandas which needs
    per-group collection).
    """
    ev = table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    tagged = purchases.select(
        "user_id", "ts", "purchase_value", F.lit(None).cast("double").alias("view_value"),
        F.lit(0).alias("src"),
    ).unionByName(
        views.select(
            "user_id", "ts", F.lit(None).cast("double").alias("purchase_value"),
            "view_value", F.lit(1).alias("src"),
        )
    )
    # views sort before purchases at equal ts (src desc) so ties are inclusive
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("src").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("last_view_value", F.last("view_value", ignorenulls=True).over(w))
        .filter(F.col("src") == 0)
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            "purchase_value",
            "last_view_value",
        )
    )


# ---------------------------------------------------------------------------
# Windows / sorts / top-k (§2.5, §2.6)
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (§2.5/§2.6 engine surface; same ranking primitive as
    P5's longest-prefix-wins). Total order (price desc, key asc) keeps the
    result deterministic across engines.

    Scale: row_number pushes a partial top-K into each map task
    (WindowGroupLimit in Spark 3.5+/4.x) — no full sort of the table.
    """
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-window with an explicit ROWS frame (§2.5): per-customer
    running spend. DECIMAL accumulator keeps the running sum exact."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_lag_lead",
    """
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead (§2.5 engine surface): neighboring event values in
    each user's time-ordered stream."""
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "order_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def order_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (O1 min-scan / O2 ordered query shape,
    index.js:636-643, batchOperations.js:128-146).

    Scale: Catalyst plans TakeOrderedAndProject — per-partition top-10 then
    a driver merge of 10×partitions rows; never a full global sort.
    """
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "batch_status_scan",
    """
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
    FROM events
    WHERE event_type = 'error'
      AND ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def batch_status_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/P6 operational batch query (queryBatches → doQuery,
    batchOperations.js:101-184): status equality + lastUpdate range — the
    GSI becomes a plain filter; at scale, a partition/Z-order layout choice
    on the control table."""
    return (
        table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "error")
            & F.col("ts").between(
                F.lit("2024-01-10 00:00:00").cast("timestamp"),
                F.lit("2024-01-20 00:00:00").cast("timestamp"),
            )
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value",
        )
    )


# ---------------------------------------------------------------------------
# Scalar functions (§2.8 F1-F8), conditionals, pivot
# ---------------------------------------------------------------------------


@register(
    "string_functions",
    """
    SELECT doc_id,
           regexp_replace(replace(source, '+', ' '), '%2B', '+', 'g') AS decoded,
           array_to_string(string_split(concat(source, '/', lang), '/'), '|') AS rejoined,
           md5(substr(text, 1, 32)) AS text_md5,
           base64(encode(substr(text, 1, 24))) AS text_b64,
           upper(lang) AS lang_uc,
           length(text) AS text_len
    FROM documents
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 URL-decode fix (index.js:830-843: `+`/`%2B` space handling), F2
    split/join (common.js:28-54), F5-analog deterministic ids via md5, F7
    base64 (kmsCrypto.js:262-265)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace(F.replace(F.col("source"), F.lit("+"), F.lit(" ")), "%2B", "+").alias(
            "decoded"
        ),
        F.array_join(F.split(F.concat_ws("/", "source", "lang"), "/"), "|").alias("rejoined"),
        F.md5(F.substring("text", 1, 32)).alias("text_md5"),
        F.base64(F.substring("text", 1, 24).cast("binary")).alias("text_b64"),
        F.upper("lang").alias("lang_uc"),
        F.length("text").alias("text_len"),
    )


@register(
    "datetime_functions",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_formatted,
           strftime(ts, '%Y-%m-%d') AS ts_date,
           CAST(date_part('epoch', date_trunc('second', ts)) AS BIGINT) AS epoch_s,
           CAST(date_part('hour', ts) AS INT) AS hour_of_day,
           CAST(date_part('dow', ts) AS INT) AS day_of_week,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket
    FROM events
    """,
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 date formatting / epoch conversion (common.js:73-110:
    `yyyy-mm-dd hh:mm:ss` ↔ epoch seconds)."""
    ev = table(spark, sf_dir, "events")
    # DuckDB dow: Sunday=0; Spark dayofweek: Sunday=1 → subtract 1.
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_formatted"),
        F.date_format("ts", "yyyy-MM-dd").alias("ts_date"),
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("epoch_s"),
        F.hour("ts").cast("int").alias("hour_of_day"),
        (F.dayofweek("ts") - 1).cast("int").alias("day_of_week"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
    )


@register(
    "json_extract",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 JSON parse (manifest/SNS bodies: index.js:862,941,
    failedBatchReprocessingLambda.js:29): extract fields from the JSON
    `props` column with JVM-side json path functions."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
    )


@register(
    "json_shape_roundtrip",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           concat('{"event_id":', event_id,
                  ',"event_type":"', event_type,
                  '","k":', CAST(json_extract(props, '$.k') AS INT), '}') AS body
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    """,
)
def json_shape_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 JSON both directions (the manifest/SNS body shapes the
    reference serializes at index.js:862 and index.js:941, and re-parses
    at failedBatchReprocessingLambda.js:106,140-141): typed parse via
    `from_json` with an explicit schema, then `to_json` re-serialization
    of a struct — the notification-body round trip as one query. The
    oracle rebuilds Spark's compact to_json rendering by concatenation,
    so field order and separators are hash-checked too.

    Scale: both functions are JVM codegen expressions (Jackson under
    whole-stage codegen) — map-only, no Python, no shuffle."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    ).filter(F.col("p.k").isNotNull())
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.to_json(
            F.struct(
                F.col("event_id"),
                F.col("event_type"),
                F.col("p.k").alias("k"),
            )
        ).alias("body"),
    )


@register(
    "conditional_case",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_display,
           CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF conditionals (engine surface; the reference's
    status-machine branches as declarative expressions)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_display"
        ),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias(
            "is_urgent"
        ),
    )


@register(
    "pivot_status_counts",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_pending
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (engine surface): order counts by status per priority, via
    `.pivot()` with explicit values (bounded output schema — required for
    a scalable plan; never pivot on an unbounded column)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("cnt_open"),
            F.coalesce("F", F.lit(0)).alias("cnt_finished"),
            F.coalesce("P", F.lit(0)).alias("cnt_pending"),
        )
    )


@register(
    "left_outer_order_distribution",
    """
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def left_outer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + two-level aggregation (TPC-H Q13 shape): order
    count per customer including zero-order customers, then the customer
    distribution over that count. Engine surface for outer joins (absent
    in reference; §2.3 inventory row).

    Scale: one shuffle on o_custkey for the join+first agg (Catalyst
    fuses them), a near-free second agg on the tiny distribution. Skewed
    big-buyer customers are handled by AQE skew-join splitting.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "full_outer_nation_activity",
    """
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (engine surface; §2.3): per-nation customer vs
    supplier counts, keeping nations present on either side only.

    Scale: both sides pre-aggregate to ≤nation-cardinality rows BEFORE
    the join — the aggregate-then-join rewrite that turns a row-level
    outer join into a trivial one. Never outer-join the raw fact tables
    when the query only needs grouped counts.
    """
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    j = c.alias("c").join(s.alias("s"), F.col("c.nationkey") == F.col("s.nationkey"), "full")
    return j.select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "small_quantity_revenue",
    """
    WITH pa AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(15,4))) AS part_sum_qty,
             COUNT(*) AS part_cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS total_price,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(15,4)) * 5 * part_cnt < part_sum_qty
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated (TPC-H Q17 shape): rows
    whose quantity is below 20% of their part's average quantity. The
    correlated `(SELECT 0.2*avg(..) WHERE same part)` becomes a grouped
    pre-aggregate + equi-join — the decorrelation Catalyst itself applies
    to such subqueries, written explicitly.

    Determinism: the avg comparison `qty < 0.2 * (sum/cnt)` is algebraically
    rearranged to `qty * 5 * cnt < sum` — all-DECIMAL/integer products, no
    division, so the boundary comparison is exact in both engines.

    Scale: two shuffles on l_partkey (agg + join); co-partitioned, so AQE
    typically plans the second as a local join. Never evaluate per-row
    correlated subqueries at scale.
    """
    l = table(spark, sf_dir, "lineitem")
    pa = l.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity", 15, 4)).alias("part_sum_qty"),
        F.count("*").alias("part_cnt"),
    )
    j = l.select("l_partkey", "l_quantity", "l_extendedprice").join(pa, "l_partkey")
    filtered = j.filter(
        dec("l_quantity", 15, 4) * F.lit(5) * F.col("part_cnt") < F.col("part_sum_qty")
    )
    return filtered.agg(
        F.sum(dec("l_extendedprice", 15, 4)).cast("double").alias("total_price"),
        F.count("*").alias("n_rows"),
    )


@register(
    "event_validity_filter",
    """
    SELECT event_id, event_type, user_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
      AND json_extract(props, '$.k') IS NOT NULL
    """,
)
def event_validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 event-validity predicate (index.js:1554-1574): the reference
    accepts only `aws:s3` ObjectCreated:{Put,Copy,CompleteMultipartUpload}
    events with a parseable record — here the same whitelist-AND-parseable
    gate over the events table (type whitelist + JSON payload must carry
    the expected field).

    Scale: pure scan predicate — the IN-list pushes to the parquet scan
    and the JSON probe runs codegen'd; invalid events are dropped before
    any shuffle, exactly where the reference drops them (before any
    DynamoDB write)."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("event_type").isin("click", "view", "purchase")
            & F.get_json_object("props", "$.k").isNotNull()
        )
        .select(
            "event_id",
            "event_type",
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        )
    )


N_SALTS = 8  # shards per hot key in the salted pre-aggregation


@register(
    "salted_skew_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation by salting: l_returnflag has only 3 values,
    so a naive groupBy lands 600k+ rows on 3 reducers. Stage 1 groups by
    (key, salt) — N_SALTS× more partial groups, evenly sharded; stage 2
    merges the partials per key. The oracle is the PLAIN groupBy: salting
    is a physical rewrite and must be answer-invariant, which the
    DECIMAL-sum determinism guarantees (any partial grouping of an exact
    sum is the same sum).

    Scale: this is the manual form of AQE skew handling for aggregations
    (AQE only splits skewed JOIN partitions); on a 1000-executor cluster
    a 3-key groupBy without salting wastes 997 reducers in stage 2 of
    the final agg. Salt with a deterministic row hash, never rand() —
    retried tasks must re-salt identically or partials double-count.
    """
    l = table(spark, sf_dir, "lineitem")
    salted = l.select(
        "l_returnflag",
        dec("l_quantity", 15, 4).alias("qty"),
        # Deterministic salt (task retries must reproduce it).
        (F.abs(F.hash("l_orderkey", "l_linenumber")) % N_SALTS).alias("salt"),
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.sum("qty").alias("part_qty"), F.count("*").alias("part_n")
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("part_qty").cast("double").alias("sum_qty"),
        F.sum("part_n").alias("n_rows"),
    )


@register(
    "array_functions",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(list_max([CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                          FOR x IN embedding]) AS BIGINT) AS max_q,
           CAST(list_sum([CASE WHEN x > 0 THEN 1 ELSE 0 END FOR x IN embedding])
                AS BIGINT) AS n_positive,
           array_to_string([CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                            FOR x IN embedding[1:4]], ',') AS head_q
    FROM embeddings
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface (§2.8 engine extension): size/max/filter/
    slice/transform over the embedding array column — the collection
    library a vector pipeline leans on before ever reaching a UDF.
    Quantized comparisons keep max/sum exact cross-engine. head_q is
    emitted as a comma-joined string (not a raw array) so the driver's
    pandas-based row canonicalizer can hash it.

    Scale: all higher-order expressions run JVM-side per row, no shuffle,
    no Python; arrays stay columnar (Parquet LIST) end to end."""
    q = F.transform("embedding", lambda x: F.floor(x.cast("double") * 10000).cast("bigint"))
    return table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.array_max(q).cast("bigint").alias("max_q"),
        F.aggregate(
            F.transform("embedding", lambda x: F.when(x > 0, 1).otherwise(0)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n_positive"),
        F.array_join(F.slice(q, 1, 4).cast("array<string>"), ",").alias("head_q"),
    )


# Per-language sampling rates (percent) for the stratified sample.
SAMPLE_RATES = {"en": 50, "es": 25, "fr": 10, "de": 5}


@register(
    "stratified_sample",
    f"""
    WITH hashed AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(concat('sample|', CAST(doc_id AS VARCHAR))), 1, 15))
                  AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket
    FROM hashed
    WHERE (lang = 'en' AND bucket < {SAMPLE_RATES["en"]})
       OR (lang = 'es' AND bucket < {SAMPLE_RATES["es"]})
       OR (lang = 'fr' AND bucket < {SAMPLE_RATES["fr"]})
       OR (lang = 'de' AND bucket < {SAMPLE_RATES["de"]})
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by content hash: each document's
    md5-derived bucket (0-99) gates inclusion at a per-language rate —
    the training-data downsampling/rebalancing primitive (e.g. keep 50%
    en, 5% de). Hash-gated, NOT rand()-gated: the same doc samples
    identically on every run, cluster size, and retry — `sampleBy` would
    give a statistically-equivalent but non-reproducible subset, which is
    unacceptable for training-corpus lineage.

    Scale: pure scan predicate, no shuffle; rates adjust per stratum
    without repartitioning anything."""
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    hashed = d.select("doc_id", "lang", bucket.alias("bucket"))
    cond = None
    for lang, rate in SAMPLE_RATES.items():
        c = (F.col("lang") == lang) & (F.col("bucket") < rate)
        cond = c if cond is None else cond | c
    return hashed.filter(cond)


ES_SAMPLE_K = 20  # weighted sample size per stratum
# 2^60 as an exactly-representable double (hash values are < 2^60)
_ES_DENOM = 1152921504606846976.0


@register(
    "weighted_sample_es",
    f"""
    WITH keyed AS (
      SELECT lang, doc_id, n_chars,
             CAST(floor(
               ln((CAST(concat('0x', substr(md5(concat('es|',
                     CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) + 1)
                  / {_ES_DENOM})
               / n_chars * 1000000000.0) AS BIGINT) AS es_key
      FROM documents
    )
    SELECT lang, doc_id, n_chars, es_key,
           CAST(rn AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY lang ORDER BY es_key DESC, doc_id ASC) AS rn
      FROM keyed
    ) WHERE rn <= {ES_SAMPLE_K}
    """,
)
def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis style:
    each doc gets key = ln(u)/w with u a deterministic md5-uniform in
    (0,1] and w its length weight (n_chars); the top-{ES_SAMPLE_K} keys
    per language ARE a w-weighted sample without replacement (the
    classic distributed one-pass formulation — u^(1/w) order-isomorphic
    to ln(u)/w). Longer docs are proportionally likelier, yet the draw
    is fully reproducible: hash-uniform, not rand() — same lineage
    argument as stratified_sample, now with weights.

    Determinism: ln() is the one non-correctly-rounded step (1-ulp
    engine skew), so the key is quantized to integer nano-units
    (floor(ln(u)/w * 1e9)) BEFORE ranking — the established
    micro-quantization pattern — and ties break on doc_id.

    Scale: one map pass + a per-stratum top-K (5 strata here; at real
    scale the rank-within-band rewrite this repo uses for global ranks
    applies unchanged, or a per-partition top-K + merge since only K
    survivors per stratum matter)."""
    d = table(spark, sf_dir, "documents")
    u = (hex_hash64(F.col("doc_id").cast("string"), salt="es|") + 1) / F.lit(_ES_DENOM)
    key = F.floor(F.log(u) / F.col("n_chars") * F.lit(1000000000.0)).cast("bigint")
    w = W.partitionBy("lang").orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", "n_chars", key.alias("es_key"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= ES_SAMPLE_K)
    )


@register(
    "merge_upsert",
    """
    WITH updates AS (
      SELECT c_custkey, concat('UPDATED-', c_name) AS c_name, c_acctbal * 2 AS c_acctbal
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS c_custkey, 'NEW-CUSTOMER' AS c_name,
             0.0 AS c_acctbal
      FROM customer WHERE c_custkey % 100 = 0
    )
    SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
           COALESCE(u.c_name, t.c_name) AS c_name,
           COALESCE(u.c_acctbal, t.c_acctbal) AS c_acctbal,
           CASE WHEN u.c_custkey IS NULL THEN 'unchanged'
                WHEN t.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS merge_action
    FROM (SELECT c_custkey, c_name, c_acctbal FROM customer) t
    FULL OUTER JOIN updates u ON u.c_custkey = t.c_custkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert) semantics — WHEN MATCHED THEN UPDATE / WHEN NOT
    MATCHED THEN INSERT — as the full-outer-join rewrite, which is
    exactly how lakehouse MERGE executes under the hood. The reference's
    control plane leans on the same idea (ledger upsert probe,
    index.js:252-272). Result = the post-merge table plus the per-row
    action taken.

    Scale: one shuffle on the merge key (or broadcast when the update
    set is small — here it is derived, so Catalyst decides); the rewrite
    is the portable form when no Delta/Iceberg txn log is available,
    written via overwrite-by-partition for atomicity.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    updates = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            F.concat(F.lit("UPDATED-"), F.col("c_name")).alias("c_name"),
            (F.col("c_acctbal") * 2).alias("c_acctbal"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("NEW-CUSTOMER").alias("c_name"),
                F.lit(0.0).alias("c_acctbal"),
            )
        )
    )
    t = c.alias("t")
    u = updates.alias("u")
    j = t.join(u, F.col("u.c_custkey") == F.col("t.c_custkey"), "full")
    return j.select(
        F.coalesce(F.col("u.c_custkey"), F.col("t.c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("u.c_name"), F.col("t.c_name")).alias("c_name"),
        F.coalesce(F.col("u.c_acctbal"), F.col("t.c_acctbal")).alias("c_acctbal"),
        F.when(F.col("u.c_custkey").isNull(), "unchanged")
        .when(F.col("t.c_custkey").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )


@register(
    "unpivot_order_flags",
    """
    SELECT o_orderkey, flag_name, CAST(flag_value AS BIGINT) AS flag_value
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_open,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_finished,
             CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END AS is_large
      FROM orders
    )
    UNPIVOT (flag_value FOR flag_name IN (is_open, is_finished, is_large))
    """,
)
def unpivot_order_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (the inverse of pivot_status_counts): wide flag
    columns → long (key, name, value) rows via `DataFrame.unpivot` —
    Spark's Expand operator, one output row per (row, column), no
    shuffle. The long form is what feature stores and metric sinks
    ingest."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("is_open"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_finished"),
        F.when(F.col("o_totalprice") > 100000, 1).otherwise(0).alias("is_large"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["is_open", "is_finished", "is_large"],
        variableColumnName="flag_name",
        valueColumnName="flag_value",
    ).withColumn("flag_value", F.col("flag_value").cast("bigint"))


@register(
    "window_ranking_family",
    """
    SELECT o_orderkey, o_orderpriority,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist()    OVER w AS cdist,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def window_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family (§2.5): rank / dense_rank /
    percent_rank / cume_dist / ntile over a totally-ordered window
    (price DESC, key ASC tiebreak — required: percent_rank and ntile
    are position-dependent, so any tie ambiguity would flap the hash).
    percent_rank = (rank-1)/(n-1) and cume_dist = peers/n are single
    double divisions — identical in both engines.

    Scale: one shuffle on the partition key; all five functions evaluate
    in the same single sorted pass."""
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@register(
    "having_filter",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING): customers with ≥12 orders.
    Catalyst plans it as filter-above-aggregate; no second shuffle —
    the predicate applies on the reduced groups, never the raw rows."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice", 15, 4)).cast("double").alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "salted_skew_join",
    """
    WITH dim(flag, flag_desc) AS (
      VALUES ('A', 'accepted'), ('N', 'none'), ('R', 'returned')
    )
    SELECT d.flag_desc,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN dim d ON d.flag = l.l_returnflag
    GROUP BY d.flag_desc
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe JOIN by salting — the companion to salted_skew_agg: the
    join key has 3 values, so a plain shuffle join lands each flag's
    entire row set on one reducer. The build side is replicated once per
    salt (dim × N_SALTS rows), the fact side gets a deterministic row
    salt, and the join runs on (key, salt) — N_SALTS-way parallel per hot
    key. Forced to a sort-merge join (merge hint) so the demo is honest:
    with a 3-row dim you would broadcast (see revenue_by_nation); salting
    is for build sides too big to broadcast but with hot probe keys.

    Oracle is the plain join: salting is answer-invariant (each fact row
    still matches exactly one replicated dim row).
    """
    fact = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        dec("l_quantity", 15, 4).alias("qty"),
        (F.abs(F.hash("l_orderkey", "l_linenumber")) % N_SALTS).alias("salt"),
    )
    dim = spark.createDataFrame(
        [("A", "accepted"), ("N", "none"), ("R", "returned")], ["flag", "flag_desc"]
    )
    dim_salted = dim.select(
        "flag", "flag_desc", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1))).alias("salt")
    )
    joined = fact.hint("merge").join(
        dim_salted,
        (fact.l_returnflag == dim_salted.flag) & (fact.salt == dim_salted.salt),
    )
    return joined.groupBy("flag_desc").agg(
        F.count("*").alias("n_rows"),
        F.sum("qty").cast("double").alias("sum_qty"),
    )


COPURCHASE_TOP = 25


def _basket_part_sets(li: DataFrame) -> DataFrame:
    """(l_orderkey, l_partkey) rows → one row per order with the SORTED
    DISTINCT part array. ONE shuffle to basket grain (collect_set
    partial-aggregates map-side; basket size is order-bounded, ≤7 parts
    in TPC-H-shaped data), replacing the items-DISTINCT exchange the
    self-join form paid before touching any pair."""
    return li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )


def _pair_supports_from_baskets(
    baskets: DataFrame, a: str, b: str, w: str
) -> DataFrame:
    """Basket-set frame → (a, b, w) distinct same-order part pairs with
    support counts. Pair expansion is MAP-SIDE over each row's sorted
    array (array is distinct+ascending, so x < y by construction and
    each unordered pair appears exactly once per order); the only
    exchange is the final pair-grain aggregate."""
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)),"
                " y -> struct(x AS a, y AS b))))"
            )
        ).alias("pr")
    )
    return pairs.groupBy(F.col("pr.a").alias(a), F.col("pr.b").alias(b)).agg(
        F.count("*").cast("bigint").alias(w)
    )


def _copurchase_pair_supports(
    li: DataFrame, a: str = "part_a", b: str = "part_b", w: str = "support"
) -> DataFrame:
    """Distinct same-order part pairs with order-count support — the
    co-purchase edge builder shared by the pairs/rules/LPA/node-Jaccard
    /PPR family (and, per epoch, the assoc-rules store ingest).

    r18 rewrite (guide §2.3 "aggregate before you shuffle", §2.4
    "remove shuffles outright"): the former plan was
    items = DISTINCT(l_orderkey, l_partkey)  (exchange 1, on both cols)
    items ⋈ items ON l_orderkey, pa < pb     (exchanges 2+3 — the
                                              distinct's (ok, pk)
                                              partitioning cannot serve
                                              a join keyed on ok alone)
    GROUP BY (pa, pb)                        (exchange 4).
    Now: ONE shuffle to basket grain (collect_set dedups in place of
    the DISTINCT), map-side pair expansion of the sorted array (bounded
    by basket size — C(7,2) at most here, never corpus-sized), ONE
    shuffle to pair grain. 4 exchanges + a join → 2 exchanges, no join;
    identical output (the unchanged items-self-join oracle CTE is the
    equivalence proof, hash-gated on every consumer)."""
    return _pair_supports_from_baskets(_basket_part_sets(li), a, b, w)


# Co-purchase basket/pair-support memo, per (session, corpus) — r18
# (guide §2.4 "remove shuffles outright", the _SHINGLE_MEMO pattern):
# FIVE registered queries (copurchase_pairs, association_rules_lift,
# copurchase_node_jaccard, ppr_copurchase_parts and the LPA family via
# _lpa_frames) each re-ran the identical basket-grain shuffle of
# lineitem plus the pair-grain support aggregate before their own
# epilogues. Production materializes the co-purchase edge list once
# per corpus snapshot and serves every graph/recommendation query from
# it. localCheckpoint-backed so bench.py's per-query clearCache leaves
# it intact; MEMO_EVENTS-labeled (cop_build / cop_hit) so BENCH_DETAIL
# attributes the one build; scale_bench clears it so exponents still
# price the full derive.
_COPURCHASE_MEMO: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def _copurchase_frames(spark: SparkSession, sf_dir: str):
    """(baskets, half-pair supports) for the co-purchase family:
    ``baskets`` is the order-grain sorted-distinct part-set frame
    (consumed by association_rules_lift's item supports/basket count),
    ``pe`` the unordered pair supports (pa, pb, w) every graph consumer
    starts from. Memoized — see _COPURCHASE_MEMO."""
    from . import dedup as _dedup

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _COPURCHASE_MEMO.get(key)
    if cached is not None:
        _dedup.MEMO_EVENTS.append("cop_hit")
        return cached
    _dedup.MEMO_EVENTS.append("cop_build")
    li = table(spark, sf_dir, "lineitem")
    baskets = _basket_part_sets(
        li.select("l_orderkey", "l_partkey")
    ).localCheckpoint(eager=True)
    pe = _pair_supports_from_baskets(baskets, "pa", "pb", "w").localCheckpoint(
        eager=True
    )
    _COPURCHASE_MEMO[key] = (baskets, pe)
    return _COPURCHASE_MEMO[key]


def _mirror_pairs(
    pe: DataFrame, a: str, b: str, oa: str, ob: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Both orientations of an undirected pair frame in ONE pass of the
    pair subtree (r18, guide §2.4 "remove shuffles outright"): the
    ``pe.select(a→oa,b→ob) UNION pe.select(b→oa,a→ob)`` form evaluates
    the whole pair-support subtree once PER BRANCH — measured at sf0.1,
    the eu localCheckpoint cost 3.6 s (warm) with the union vs 2.1 s
    with this map-side explode of the two orientation structs, because
    exchange reuse does not cover the post-aggregate projection under
    AQE + localCheckpoint. Identical multiset (each input row emits
    exactly its two orientations); row ORDER differs from the union
    form, which no consumer observes (all are joins/aggregates)."""
    mk = lambda x, y: F.struct(  # noqa: E731 — two orientations, one schema
        F.col(x).alias(oa), F.col(y).alias(ob), *[F.col(c) for c in carry]
    )
    return pe.select(F.explode(F.array(mk(a, b), mk(b, a))).alias("e")).select(
        F.col(f"e.{oa}").alias(oa),
        F.col(f"e.{ob}").alias(ob),
        *[F.col(f"e.{c}").alias(c) for c in carry],
    )


@register(
    "copurchase_pairs",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT part_a, part_b, support, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY support DESC, part_a ASC, part_b ASC) AS rank
      FROM pairs
    ) WHERE rank <= {COPURCHASE_TOP}
    """,
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase mining (frequent-itemset support at
    pair grain): parts appearing in the same order, counted across all
    orders, top-{COPURCHASE_TOP} pairs — the association-rule primitive
    every recommender pipeline starts from.

    Scale: the self-join keys on l_orderkey, so pair fan-out per order
    is C(items_per_order, 2) — bounded by basket size, NOT corpus size
    (the same bounded-bucket argument as the LSH band joins); support
    counting is a map-side-combined groupBy and only pair aggregates
    reach the final top-k window."""
    # r18: shared memoized pair supports (see _COPURCHASE_MEMO) —
    # identical values to the per-query derive this replaces.
    _, pe = _copurchase_frames(spark, sf_dir)
    pairs = pe.select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        F.col("w").alias("support"),
    )
    from pyspark.sql.window import Window as W

    # TakeOrdered top-k first (distributed), rank window only over the
    # K-row result — a bare global row_number funnels all pairs into
    # one task (caught by the 10x WindowExec warning, r15).
    top = pairs.orderBy(
        F.col("support").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(COPURCHASE_TOP)
    w = W.orderBy(F.col("support").desc(), F.col("part_a").asc(), F.col("part_b").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("part_a", "part_b", "support", "rank")
    )


RULES_TOP = 30  # association rules kept (by lift)
RULES_MIN_SUPPORT = 2  # pair-support floor before confidence/lift


@register(
    "association_rules_lift",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
           FROM items),
    isup AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS s FROM items
      GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    rules AS (
      SELECT r.ante, r.cons, r.support,
             r.support * 1000000 // sa.s AS confidence_ppm,
             (r.support * 1000000 // sa.s) * nb.n_baskets // sc.s AS lift_ppm
      FROM (
        SELECT part_a AS ante, part_b AS cons, support FROM pairs
        UNION ALL
        SELECT part_b AS ante, part_a AS cons, support FROM pairs
      ) r
      JOIN isup sa ON sa.l_partkey = r.ante
      JOIN isup sc ON sc.l_partkey = r.cons
      CROSS JOIN nb
      WHERE r.support >= {RULES_MIN_SUPPORT}
    )
    SELECT ante, cons, support,
           CAST(confidence_ppm AS BIGINT) AS confidence_ppm,
           CAST(lift_ppm AS BIGINT) AS lift_ppm,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY lift_ppm DESC, confidence_ppm DESC,
                                   ante ASC, cons ASC) AS rank
      FROM rules
    ) WHERE rank <= {RULES_TOP}
    """,
)
def association_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the market baskets — the step after
    copurchase_pairs' frequent pairs: every directed rule ante→cons
    with pair support ≥ {RULES_MIN_SUPPORT} scored by confidence
    (support(a,b)/support(a)) and lift
    (confidence / baseline P(cons)), top-{RULES_TOP} by lift. All
    ratios are ppm-quantized INTEGER divisions (support·1e6 // s —
    floor semantics agree cross-engine on positive ints), so the
    ranking is exact.

    Scale: the basket self-join fans out C(basket, 2) per order
    (bounded by basket size); item supports are one map-side-combined
    aggregate; the rule frame is pair-grain and the final top-k is a
    single scalable window (rank ≤ {RULES_TOP} prunes early under
    AQE's TopK)."""
    # One basket-grain shuffle feeds all three supports (r18, guide
    # §2.3/§2.4 — see _copurchase_pair_supports): n_baskets is the
    # basket row count, item support the per-part basket count (each
    # part appears once per basket set), pair support the map-side
    # pair expansion. The items-distinct + self-join plan this
    # replaces paid 4 exchanges and a join for the pairs alone. Both
    # frames come from the shared memo (see _COPURCHASE_MEMO).
    baskets, pe = _copurchase_frames(spark, sf_dir)
    n_baskets = baskets.count()
    isup = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("s"))
    )
    pairs = pe.select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        F.col("w").alias("support"),
    )
    return _rules_from_supports(pairs, isup, n_baskets)


def _rules_from_supports(
    pairs: DataFrame, isup: DataFrame, n_baskets: int
) -> DataFrame:
    """Confidence/lift scoring + top-k over (part_a, part_b, support)
    pair supports and (l_partkey, s) item supports — factored so the
    incremental support store serves the identical rule computation."""
    pairs = pairs.filter(F.col("support") >= RULES_MIN_SUPPORT)
    rules = _mirror_pairs(pairs, "part_a", "part_b", "ante", "cons", ("support",))
    sa = isup.select(F.col("l_partkey").alias("ante"), F.col("s").alias("sa"))
    sc = isup.select(F.col("l_partkey").alias("cons"), F.col("s").alias("sc"))
    scored = (
        rules.join(sa, "ante")
        .join(sc, "cons")
        .select(
            "ante",
            "cons",
            "support",
            F.expr("support * 1000000 div sa").cast("bigint").alias("confidence_ppm"),
            # two-step floor (conf_ppm first) keeps every intermediate
            # < 2^63 at any basket count — one-step support·1e6·N
            # overflows int64 on ~1e9-basket corpora
            F.expr(f"(support * 1000000 div sa) * {n_baskets} div sc")
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )
    # Global top-k as orderBy+limit (TakeOrderedAndProject: per-partition
    # top-K + driver merge), THEN the rank window over the K-row result —
    # a bare global row_number would move every scored pair to one task.
    top = scored.orderBy(
        F.col("lift_ppm").desc(), F.col("confidence_ppm").desc(),
        F.col("ante").asc(), F.col("cons").asc(),
    ).limit(RULES_TOP)
    from pyspark.sql.window import Window as W

    w = W.orderBy(
        F.col("lift_ppm").desc(), F.col("confidence_ppm").desc(),
        F.col("ante").asc(), F.col("cons").asc(),
    )
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("ante", "cons", "support", "confidence_ppm", "lift_ppm", "rank")
    )


LPA_ROUNDS = 4  # synchronous label-propagation rounds (unrolled oracle)

# r18 (guide §3.1 "pick the join strategy deliberately"): the per-round
# label/rank frames of the iterative graph queries are NODE-grain (two
# int64s per node) while the edge frame is EDGE-grain — broadcasting the
# node frame turns every round's join map-side, so the edge list is
# never shuffled inside the loop. Node-grain state fits comfortably up
# to millions of nodes (16 B/row: 5 M nodes ≈ 80 MB built relation);
# past the cap the loop falls back to the shuffle join, which is the
# right plan at that scale. Scale-adaptive by COUNT, not by a local[32]
# constant — the same decision an optimizer with fresh stats would make.
import os as _os

GRAPH_BCAST_MAX_NODES = int(_os.environ.get("ALRS_GRAPH_BCAST_MAX", 5_000_000))

_LPA_EDGES_CTE = """items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pe AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb
    ),
    eu AS (
      SELECT pa AS src, pb AS dst, w FROM pe
      UNION ALL
      SELECT pb AS src, pa AS dst, w FROM pe
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM eu)"""


def _lpa_round_cte(r: int) -> str:
    """Unrolled synchronous LPA round r: support-weighted neighbor
    label vote, ties to the smallest label."""
    return f"""c{r} AS (
      SELECT e.src AS node, l.label, SUM(e.w) AS wt
      FROM eu e JOIN l{r} l ON l.node = e.dst
      GROUP BY e.src, l.label
    ),
    l{r + 1} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY wt DESC, label ASC) AS rn
        FROM c{r}
      ) WHERE rn = 1
    )"""


@register(
    "label_propagation_copurchase",
    f"""
    WITH {_LPA_EDGES_CTE},
    {", ".join(_lpa_round_cte(r) for r in range(LPA_ROUNDS))}
    SELECT CAST(node AS BIGINT) AS part_key,
           CAST(label AS BIGINT) AS community
    FROM l{LPA_ROUNDS}
    """,
)
def label_propagation_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the co-purchase graph via SYNCHRONOUS
    label propagation (Raghavan et al. 2007, made deterministic):
    every part starts labeled with its own key; each of {LPA_ROUNDS}
    rounds every node adopts the label carrying the highest
    SUPPORT-WEIGHTED vote among its neighbors (ties to the smallest
    label). Fixed synchronous rounds make the algorithm a pure
    function of the graph — no traversal order, no randomness — so
    the unrolled-CTE oracle hash-gates it exactly; the async
    converge-to-fixpoint production variant runs the identical
    per-round plan in a loop (the PageRank-loop pattern).

    Scale: the basket self-join fans out C(items_per_order, 2) per
    order — bounded by basket size, not corpus size; each round is
    one edge-labels join (shuffle on node id) + one map-side-combined
    weighted count + a per-node top-1 max_by AGGREGATE (partial
    top-1 map-side, no sort — the r16 rewrite of the row_number
    window). Labels stay BIGINT keys; vote weights are integer
    supports — no float reductions anywhere."""
    eu, labels = _lpa_frames(spark, sf_dir)
    return labels.select(
        F.col("node").cast("bigint").alias("part_key"),
        F.col("label").cast("bigint").alias("community"),
    )


# LPA edge frame + converged labels, memoized per (session, corpus)
# like dedup._PAIRS_MEMO (localCheckpoint-backed so bench.py's
# clearCache doesn't drop them): the community listing and the
# modularity audit both consume the same {LPA_ROUNDS}-round result —
# one loop, two readers. Events land in dedup.MEMO_EVENTS so
# BENCH_DETAIL attributes the build to whichever query ran first.
_LPA_MEMO: dict[tuple[str, str], tuple] = {}


def _lpa_frames(spark: SparkSession, sf_dir: str):
    """(both-direction weighted edge frame, converged LPA labels) for
    the co-purchase graph — shared by the community listing and the
    modularity audit (identical rounds, one implementation;
    memoized, see _LPA_MEMO)."""
    from . import dedup as _dedup

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _LPA_MEMO.get(key)
    if cached is not None:
        _dedup.MEMO_EVENTS.append("lpa_hit")
        return cached
    _dedup.MEMO_EVENTS.append("lpa_build")
    # r18: shared memoized pair supports (see _COPURCHASE_MEMO).
    _, pe = _copurchase_frames(spark, sf_dir)
    eu = _mirror_pairs(pe, "pa", "pb", "src", "dst", ("w",))
    # r18 (guide §2.2 "fewer, larger partitions" cuts both ways —
    # here the checkpoint inherited AQE's coalescing of the small pair
    # aggregate, just 10 partitions feeding a 32-core box, so every
    # round's join + two aggregates ran 3x under-parallel; and §2.3
    # "aggregate before you shuffle" — clustering by src lets the later
    # rounds' vote aggregates combine map-side). One src-hash exchange
    # before the checkpoint fixes both: 3-rep A/B at sf0.1 in fresh
    # sessions measured rounds 15.1-17.5 s → 5.1-9.3 s (median
    # 15.1 → 6.4), labels identical. NOTE localCheckpoint does NOT
    # preserve partitioning info (probed: the LogicalRDD reports
    # UnknownPartitioning and downstream aggregates still plan their
    # exchange), so this is a data-layout/parallelism win, not exchange
    # elision. At cluster scale the src exchange is edge-grain work the
    # rounds' own shuffles already pay, and sizing a checkpointed
    # frame's partitions to the executor parallelism rather than to
    # AQE's advisory size is exactly the §2.2 sizing rule.
    eu = eu.repartition("src")
    eu = eu.localCheckpoint(eager=True)  # root of every round's DAG
    labels = _lpa_label_rounds(eu)
    _LPA_MEMO[key] = (eu, labels)
    return _LPA_MEMO[key]


def _lpa_label_rounds(eu: DataFrame) -> DataFrame:
    """{LPA_ROUNDS} synchronous LPA rounds over a both-direction
    weighted edge frame (src, dst, w) → converged (node, label) frame
    (localCheckpointed). Shared by the batch co-purchase communities
    (_lpa_frames) and the store-served modularity monitor
    (streaming.stream_queries.stream_community_modularity), which
    rebuilds the edge frame from the assoc-rules store's pair sums."""
    return _lpa_label_rounds_plan(eu).localCheckpoint(eager=True)


def _lpa_label_rounds_plan(eu: DataFrame) -> DataFrame:
    """The lazy rounds plan behind _lpa_label_rounds — split out so the
    plan-shape CI can assert the broadcast-join strategy of the round
    joins (the checkpoint in the public helper hides the loop's plan)."""
    # r18: nodes checkpointed so the broadcast-size guard's count() and
    # the round-0 seed share one tiny materialization.
    nodes = (
        eu.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    # r18 (guide §3.1, see GRAPH_BCAST_MAX_NODES): labels are node-grain
    # — broadcast them so each round's edge⋈label join is map-side and
    # the edge frame (already laid out by src at the checkpoint) is
    # never re-shuffled; only the map-side-combined vote aggregates
    # cross the wire. Join values are identical either way, so the
    # unrolled oracle is unaffected.
    bcast = nodes.count() <= GRAPH_BCAST_MAX_NODES
    # r18 N3 (guide §2.4 "two operations keyed the same way can share
    # one exchange"): the checkpoint erases the edge frame's hash(src)
    # layout (LogicalRDD = UnknownPartitioning), so every round paid two
    # aggregate exchanges — hash(src,label) for the votes and hash(node)
    # for the top-1. One in-plan repartition("src") re-establishes KNOWN
    # hash(src) partitioning, which satisfies ClusteredDistribution for
    # BOTH aggregates (src ⊆ (src,label); the broadcast join preserves
    # the streamed side's partitioning, and the aggregate's src→n alias
    # propagates it), so the rounds run exchange-free; the 4 identical
    # repartition subtrees collapse to one physical shuffle via AQE
    # stage reuse within the single rounds action. Measured (3-rep A/B,
    # fresh frames): plan 8 Exchange → 4 (all the one reused
    # repartition), rounds 4.0-9.8 s → 1.4-5.2 s at sf0.1 and
    # 17.6-32.2 s → 12.6-13.7 s at 10x, labels identical. Only in the
    # broadcast branch: the fallback's shuffle join re-keys by dst, so
    # an upfront src exchange would serve nothing there.
    edges = eu.repartition("src") if bcast else eu
    for _ in range(LPA_ROUNDS):
        lab = F.broadcast(labels) if bcast else labels
        votes = (
            edges.join(lab, edges["dst"] == lab["node"])
            .groupBy(F.col("src").alias("n"), "label")
            .agg(F.sum("w").alias("wt"))
        )
        # Per-node top-1 as a max_by AGGREGATE, not a row_number window
        # (r16 A/B at sf0.1: 5.41 s vs 5.88 s full build, labels
        # identical): the aggregate partial-combines map-side, so the
        # final exchange carries at most one row per (node, map
        # partition) instead of every vote row, and nothing sorts.
        # max of (wt, -label) == ORDER BY wt DESC, label ASC — exact
        # (no ties: (n, label) is unique in votes).
        labels = votes.groupBy(F.col("n").alias("node")).agg(
            F.max_by(
                "label", F.struct(F.col("wt"), (-F.col("label")).alias("nl"))
            ).alias("label")
        )
    return labels


@register(
    "community_modularity",
    f"""
    WITH {_LPA_EDGES_CTE},
    {", ".join(_lpa_round_cte(r) for r in range(LPA_ROUNDS))},
    lab AS (SELECT node, label FROM l{LPA_ROUNDS}),
    s2m AS (SELECT CAST(SUM(w) AS BIGINT) AS s FROM eu),
    ein AS (
      SELECT ls.label AS community, CAST(SUM(e.w) AS BIGINT) AS internal_w
      FROM eu e
      JOIN lab ls ON ls.node = e.src
      JOIN lab ld ON ld.node = e.dst
      WHERE ls.label = ld.label
      GROUP BY ls.label
    ),
    deg AS (
      SELECT ls.label AS community, CAST(SUM(e.w) AS BIGINT) AS degree_w,
             CAST(COUNT(DISTINCT e.src) AS BIGINT) AS n_nodes
      FROM eu e JOIN lab ls ON ls.node = e.src
      GROUP BY ls.label
    )
    SELECT d.community,
           d.n_nodes,
           CAST(COALESCE(i.internal_w, 0) AS BIGINT) AS internal_w,
           d.degree_w,
           CAST(COALESCE(i.internal_w, 0) * 1000000 // m.s
                - d.degree_w * (d.degree_w * 1000000 // m.s) // m.s
                AS BIGINT) AS contrib_ppm
    FROM deg d
    LEFT JOIN ein i ON i.community = d.community
    CROSS JOIN s2m m
    """,
)
def community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman MODULARITY audit of the label-propagation communities —
    the quality number that tells you whether the partition is real
    structure or noise: per community, Q-contribution
    in_c/2m − (deg_c/2m)², on the same support-weighted co-purchase
    graph and the same {LPA_ROUNDS} LPA rounds (shared _lpa_frames).
    Both ratios are ppm-quantized INTEGER divisions; the expected-edges
    square is TWO-STEP (deg·(deg·1e6//2m)//2m) so every intermediate
    stays < 2^63 up to ~10^12 total edge weight. Positive contributions
    mark communities denser than chance — summing the column is the
    partition's Q (ppm).

    Scale: two broadcast-joinable label lookups against the edge frame
    (labels are node-grain — at part-catalog size, far below the edge
    count), then community-grain aggregates; no new shuffle beyond the
    LPA rounds themselves. Measured 1x->10x exponent 0.95 (the LPA
    rounds' inherently linear edge volume — the same ceiling as
    label_propagation_copurchase's 0.97), CI-gated in
    tests/test_scale_exponents.py."""
    eu, labels = _lpa_frames(spark, sf_dir)
    return _modularity_frame(eu, labels)


def _modularity_frame(eu: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman-Q epilogue over (edge frame, converged labels) — the
    community-grain modularity contributions. Shared by the batch
    audit (community_modularity) and the store-served monitor
    (stream_community_modularity), which feeds it the assoc-rules
    store's resolved pair sums instead of the batch basket join."""
    lab_s = labels.select(F.col("node").alias("src"), F.col("label").alias("cs"))
    lab_d = labels.select(F.col("node").alias("dst"), F.col("label").alias("cd"))
    both = eu.join(lab_s, "src").join(lab_d, "dst")
    ein = (
        both.filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("community"))
        .agg(F.sum("w").cast("bigint").alias("internal_w"))
    )
    deg = both.groupBy(F.col("cs").alias("community")).agg(
        F.sum("w").cast("bigint").alias("degree_w"),
        F.countDistinct("src").cast("bigint").alias("n_nodes"),
    )
    s2m = eu.agg(F.sum("w").cast("bigint").alias("s"))
    return (
        deg.join(ein, "community", "left")
        .withColumn("internal_w", F.coalesce("internal_w", F.lit(0)).cast("bigint"))
        .crossJoin(F.broadcast(s2m))
        .select(
            "community",
            "n_nodes",
            "internal_w",
            "degree_w",
            F.expr(
                "internal_w * 1000000 div s"
                " - degree_w * (degree_w * 1000000 div s) div s"
            )
            .cast("bigint")
            .alias("contrib_ppm"),
        )
    )


@register(
    "community_conductance",
    f"""
    WITH {_LPA_EDGES_CTE},
    {", ".join(_lpa_round_cte(r) for r in range(LPA_ROUNDS))},
    lab AS (SELECT node, label FROM l{LPA_ROUNDS}),
    j AS (
      SELECT ls.label AS cs, ld.label AS cd, e.w, e.src
      FROM eu e
      JOIN lab ls ON ls.node = e.src
      JOIN lab ld ON ld.node = e.dst
    ),
    agg AS (
      SELECT cs AS community,
             CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
             CAST(SUM(w) AS BIGINT) AS volume_w,
             CAST(COALESCE(SUM(CASE WHEN cs <> cd THEN w END), 0) AS BIGINT)
               AS cut_w
      FROM j GROUP BY cs
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS s FROM eu)
    SELECT community, n_nodes, cut_w, volume_w,
           CAST(CASE WHEN least(volume_w, t.s - volume_w) = 0 THEN 0
                ELSE cut_w * 1000000 // least(volume_w, t.s - volume_w)
                END AS BIGINT) AS conductance_ppm
    FROM agg CROSS JOIN tot t
    """,
)
def community_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONDUCTANCE audit of the label-propagation communities — the
    cut-quality complement to community_modularity (Kannan, Vempala &
    Vetta 2004's cluster-quality measure): per community, the fraction
    of its incident edge weight that LEAVES it,
    φ(c) = cut(c) / min(vol(c), 2m − vol(c)), on the same
    support-weighted co-purchase graph and the same {LPA_ROUNDS}
    LPA rounds (shared _lpa_frames memo — one loop, three readers).
    Modularity rewards density vs chance; conductance exposes the
    leaky communities modularity can still score well. ppm-quantized
    INTEGER division (cut·1e6 stays < 2^63 up to ~9·10^12 total edge
    weight); a community owning the whole graph (denominator 0)
    reports 0.

    Scale: one (src, dst)-label lookup pass over the edge frame
    (labels node-grain, broadcast-joinable) + community-grain
    aggregates; no new shuffle beyond the shared LPA rounds."""
    eu, labels = _lpa_frames(spark, sf_dir)
    return _conductance_frame(eu, labels)


def _conductance_frame(eu: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community conductance epilogue over a both-direction
    weighted edge frame + node-grain labels — shared by the batch
    audit (community_conductance) and the store-served monitor
    (stream_community_conductance), the same one-implementation split
    as _modularity_frame."""
    lab_s = labels.select(F.col("node").alias("src"), F.col("label").alias("cs"))
    lab_d = labels.select(F.col("node").alias("dst"), F.col("label").alias("cd"))
    both = eu.join(lab_s, "src").join(lab_d, "dst")
    agg = both.groupBy(F.col("cs").alias("community")).agg(
        F.countDistinct("src").cast("bigint").alias("n_nodes"),
        F.sum("w").cast("bigint").alias("volume_w"),
        F.coalesce(
            F.sum(F.when(F.col("cs") != F.col("cd"), F.col("w"))), F.lit(0)
        )
        .cast("bigint")
        .alias("cut_w"),
    )
    tot = eu.agg(F.sum("w").cast("bigint").alias("s"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "community",
        "n_nodes",
        "cut_w",
        "volume_w",
        F.expr(
            "CAST(CASE WHEN least(volume_w, s - volume_w) = 0 THEN 0"
            " ELSE cut_w * 1000000 div least(volume_w, s - volume_w)"
            " END AS BIGINT)"
        ).alias("conductance_ppm"),
    )


NODEJ_SUPPORT = 2  # repeat-co-purchase edge floor (the graph sparsifier)
NODEJ_TOP = 50  # most-similar pairs reported


@register(
    "copurchase_node_jaccard",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pe AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb
    ),
    se AS (SELECT pa, pb FROM pe WHERE w >= {NODEJ_SUPPORT}),
    eu AS (
      SELECT pa AS src, pb AS dst FROM se
      UNION ALL
      SELECT pb AS src, pa AS dst FROM se
    ),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM eu GROUP BY src),
    cn AS (
      SELECT x.src AS part_a, y.src AS part_b,
             CAST(COUNT(*) AS BIGINT) AS common_n
      FROM eu x JOIN eu y ON x.dst = y.dst AND x.src < y.src
      GROUP BY part_a, part_b
    ),
    j AS (
      SELECT c.part_a, c.part_b, c.common_n,
             da.d AS deg_a, db.d AS deg_b,
             CAST(c.common_n * 1000000
                  // (da.d + db.d - c.common_n) AS BIGINT) AS jaccard_ppm
      FROM cn c
      JOIN deg da ON da.node = c.part_a
      JOIN deg db ON db.node = c.part_b
    )
    SELECT part_a, part_b, common_n, deg_a, deg_b, jaccard_ppm,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY jaccard_ppm DESC,
                                   part_a ASC, part_b ASC) AS rank
      FROM j
      ORDER BY jaccard_ppm DESC, part_a ASC, part_b ASC
      LIMIT {NODEJ_TOP}
    )
    """,
)
def copurchase_node_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NODE-SIMILARITY join on the co-purchase graph — neighborhood
    Jaccard (SimRank's cheap one-hop cousin, the standard
    related-items signal next to association_rules_lift's directional
    confidence): two parts are similar when their REPEAT-co-purchase
    neighbor sets overlap, J = |N(a)∩N(b)| / |N(a)∪N(b)|, reported as
    the top-{NODEJ_TOP} pairs by ppm-quantized Jaccard. The graph is
    SPARSIFIED first: only edges with support ≥ {NODEJ_SUPPORT}
    (repeat co-purchases) participate — one-off baskets are noise for
    similarity, and the floor is the scale knob (a production deploy
    raises it with basket volume, exactly like association rules'
    support floor — the thresholded degree is bounded by repeat-buying
    structure, not corpus size).

    Scale: common neighbors enumerate by wedges through shared
    neighbors — one self-equi-join on the SPARSIFIED edge frame
    (fan-out Σ deg², bounded by the support floor), map-side-combined
    to pair grain; degrees broadcast back; the global top-k is
    TakeOrdered (per-partition heap), with the rank window over the
    {NODEJ_TOP}-row result only."""
    # r18: shared memoized pair supports (see _COPURCHASE_MEMO).
    _, pe0 = _copurchase_frames(spark, sf_dir)
    pe = pe0.filter(F.col("w") >= NODEJ_SUPPORT)
    eu = _mirror_pairs(pe, "pa", "pb", "src", "dst")
    eu = eu.localCheckpoint(eager=True)  # wedge join + two degree reads
    deg = eu.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    x, y = eu.alias("x"), eu.alias("y")
    cn = (
        x.join(
            y,
            (F.col("x.dst") == F.col("y.dst"))
            & (F.col("x.src") < F.col("y.src")),
        )
        .groupBy(
            F.col("x.src").alias("part_a"), F.col("y.src").alias("part_b")
        )
        .agg(F.count("*").cast("bigint").alias("common_n"))
    )
    da = deg.select(F.col("node").alias("part_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("node").alias("part_b"), F.col("d").alias("deg_b"))
    # No broadcast hint on the degree frames: node grain is catalog
    # grain (unbounded at 100 TB) — AQE broadcasts when actually small,
    # the same policy as _modularity_frame's label joins.
    j = (
        cn.join(da, "part_a")
        .join(db, "part_b")
        .withColumn(
            "jaccard_ppm",
            F.expr(
                "CAST(common_n * 1000000 div (deg_a + deg_b - common_n)"
                " AS BIGINT)"
            ),
        )
    )
    order = [
        F.col("jaccard_ppm").desc(),
        F.col("part_a").asc(),
        F.col("part_b").asc(),
    ]
    top = j.orderBy(*order).limit(NODEJ_TOP)
    w = W.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "part_a", "part_b", "common_n", "deg_a", "deg_b", "jaccard_ppm",
        "rank",
    )


FUZZY_MAX_DIST = 1
FUZZY_DEL_CAP = 40  # deletion positions considered (max name length seen)


@register(
    "fuzzy_match_names",
    f"""
    WITH vars AS (
      SELECT c_custkey,
             CASE WHEN i = 0 THEN c_name
                  ELSE substr(c_name, 1, CAST(i AS INT) - 1) ||
                       substr(c_name, CAST(i AS INT) + 1) END AS v
      FROM customer, generate_series(0, {FUZZY_DEL_CAP}) g(i)
      WHERE i <= length(c_name)
    ),
    cand AS (
      SELECT DISTINCT a.c_custkey AS key_a, b.c_custkey AS key_b
      FROM vars a JOIN vars b ON a.v = b.v AND a.c_custkey < b.c_custkey
    )
    SELECT c.key_a, c.key_b, CAST(levenshtein(x.c_name, y.c_name) AS INT) AS dist
    FROM cand c JOIN customer x ON x.c_custkey = c.key_a
                JOIN customer y ON y.c_custkey = c.key_b
    WHERE levenshtein(x.c_name, y.c_name) <= {FUZZY_MAX_DIST}
    """,
)
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching at edit distance ≤ {FUZZY_MAX_DIST} via
    DELETION-NEIGHBORHOOD blocking (the FastSS / SymSpell family): each
    name emits its identity plus one variant per deleted character
    position; any two strings within edit distance 1 (substitution,
    insertion, or deletion anywhere in the first {FUZZY_DEL_CAP} chars)
    necessarily share a variant, so an equi-join on the variant yields a
    complete candidate set and exact Levenshtein verifies it. This
    replaces the round-5 prefix-blocking form, which was both lossy
    (pairs differing inside the prefix were missed by construction) and
    a bench hog: TPC-H's serial names put ~1000 rows in every prefix
    block → ~500k edit distances per block, 35 s at sf0.1 and 17.5% of
    the whole bench. Deletion neighborhoods make candidate volume
    O(N·L) with near-singleton buckets — and the answer is now the
    EXACT dist≤1 pair set, not a blocked approximation.

    Scale: N·(L+1) slim (key, variant) rows shuffle on the variant
    string; bucket occupancy is governed by true near-duplicate density,
    not by an arbitrary prefix parameter, so pair work stays linear in
    the number of real matches at any corpus size. Candidates dedup
    BEFORE names attach (two hash joins on the key); Levenshtein — the
    expensive DP — runs only on verified-candidate pairs. The DuckDB
    oracle builds the identical neighborhood (constant series bound —
    DuckDB's generate_series takes no correlated args — with an
    i <= length filter; i = 0 encodes the identity variant so it exists
    at every length)."""
    c = table(spark, sf_dir, "customer")
    name = F.col("c_name")
    variants = F.transform(
        F.sequence(F.lit(0), F.least(F.length(name), F.lit(FUZZY_DEL_CAP))),
        lambda i: F.when(i == 0, name).otherwise(
            F.concat(
                F.substring(name, F.lit(1), i - F.lit(1)),
                F.substring(name, i + F.lit(1), F.length(name)),
            )
        ),
    )
    slim = c.select("c_custkey", F.explode(variants).alias("v"))
    cand = (
        slim.alias("a")
        .join(
            slim.alias("b"),
            (F.col("a.v") == F.col("b.v")) & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(F.col("a.c_custkey").alias("key_a"), F.col("b.c_custkey").alias("key_b"))
        .dropDuplicates(["key_a", "key_b"])
    )
    names = c.select("c_custkey", "c_name")
    return (
        cand.join(names.select(F.col("c_custkey").alias("key_a"), F.col("c_name").alias("_na")), "key_a")
        .join(names.select(F.col("c_custkey").alias("key_b"), F.col("c_name").alias("_nb")), "key_b")
        .select(
            "key_a",
            "key_b",
            F.levenshtein("_na", "_nb").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
    )


@register(
    "referential_integrity_audit",
    """
    SELECT 'lineitem->orders' AS relation,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphans,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's FK chain —
    the validation a warehouse load runs before committing a batch (the
    reference delegates it to Redshift constraints; our engine makes it
    a query): orphan counts per relation via LEFT ANTI joins.

    Scale: each anti-join shuffles on its key with map-side pre-
    aggregation of the probe side possible; the dimension sides
    (customer→nation) broadcast naturally. Output is one row per
    relation regardless of fact size."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")

    def audit(name: str, child: DataFrame, child_key: str, parent: DataFrame, parent_key: str):
        # Declarative 1-row slice: anti-join count x total count, no
        # driver-side action — the three audits union into ONE plan.
        orphans = (
            child.join(parent, child[child_key] == parent[parent_key], "left_anti")
            .agg(F.count("*").cast("bigint").alias("n_orphans"))
        )
        total = child.agg(F.count("*").cast("bigint").alias("n_rows"))
        return orphans.crossJoin(total).select(
            F.lit(name).alias("relation"), "n_orphans", "n_rows"
        )

    return (
        audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(audit("customer->nation", c, "c_nationkey", n, "n_nationkey"))
    )


@register(
    "spend_gini_by_nation",
    """
    WITH spend AS (
      SELECT c.c_nationkey AS nationkey,
             CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    ranked AS (
      SELECT nationkey, cents,
             row_number() OVER (PARTITION BY nationkey ORDER BY cents ASC) AS i,
             COUNT(*) OVER (PARTITION BY nationkey) AS n,
             CAST(SUM(cents) OVER (PARTITION BY nationkey) AS BIGINT) AS total
      FROM spend
    )
    SELECT nationkey,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(SUM((2 * i - n - 1) * cents) AS DOUBLE) / (MAX(n) * MAX(total)) AS gini
    FROM ranked GROUP BY nationkey
    """,
)
def spend_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order spend per nation — inequality of the
    revenue distribution by market, via the exact rank formula
    G = Σ(2i−n−1)·xᵢ / (n·Σx) over cents-quantized integers: the
    numerator is an exact integer sum (ties don't matter — equal values
    contribute the same total under any rank assignment), the final
    ratio one IEEE divide.

    Scale: rank/total ride ONE window partitioned by nation (partition
    sizes are per-market order counts, sharded across executors), then
    a map-side-combined fold per nation — no global sort anywhere."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    from pyspark.sql.window import Window as W

    spend = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nationkey"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    wp = W.partitionBy("nationkey")
    ranked = spend.select(
        "nationkey",
        "cents",
        F.row_number().over(wp.orderBy(F.col("cents").asc())).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("cents").over(wp).cast("bigint").alias("total"),
    )
    num = F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("cents"))
    return ranked.groupBy("nationkey").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        (num.cast("double") / (F.max("n") * F.max("total"))).alias("gini"),
    )


# ---- Z-order layout audit ---------------------------------------------
# Multi-dimensional clustering (Morton order) — the layout optimization
# behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the bits of two
# sort dimensions so physically-adjacent rows are close in BOTH, giving
# min/max zone maps pruning power on either predicate column. Linear
# sort by one column makes the other's per-file ranges span everything;
# z-order bounds both. The query computes the Morton key and audits the
# layout it would produce: bucket rows into ZORDER_BUCKETS contiguous
# key ranges ("files") and report each bucket's min/max on both dims —
# the exact statistics a scan planner prunes with.
ZORDER_BITS = 16
ZORDER_BUCKETS = 64


def _interleave_expr(x: str, y: str, shift_fn) -> str:
    """Bit-interleave expression for 2x ZORDER_BITS-bit ints; shift_fn
    renders a left-shift (engines differ: Spark `shiftleft(a,n)`,
    DuckDB `a << n`)."""
    terms = []
    for b in range(ZORDER_BITS):
        terms.append(shift_fn(f"(({x} >> {b}) & 1)", 2 * b))
        terms.append(shift_fn(f"(({y} >> {b}) & 1)", 2 * b + 1))
    return " + ".join(terms)


@register(
    "zorder_layout_audit",
    f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
      FROM orders
    ),
    ext AS (
      SELECT MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax,
             MIN(d) AS dmin, MAX(d) AS dmax
      FROM base
    ),
    scaled AS (
      SELECT o_orderkey, o_custkey, d,
             ((o_custkey - e.cmin) * {(1 << ZORDER_BITS) - 1}) // greatest(e.cmax - e.cmin, 1) AS xs,
             ((d - e.dmin) * {(1 << ZORDER_BITS) - 1}) // greatest(e.dmax - e.dmin, 1) AS ys
      FROM base, ext e
    ),
    keyed AS (
      SELECT o_orderkey, o_custkey, d,
             {_interleave_expr('xs', 'ys', lambda e, n: f'({e} << {n})')} AS zkey
      FROM scaled
    ),
    bucketed AS (
      SELECT o_custkey, d,
             ntile({ZORDER_BUCKETS}) OVER (ORDER BY zkey ASC, o_orderkey ASC) AS bucket
      FROM keyed
    )
    SELECT CAST(bucket AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_custkey) AS custkey_min, MAX(o_custkey) AS custkey_max,
           MIN(d) AS date_min, MAX(d) AS date_max
    FROM bucketed GROUP BY bucket
    """,
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit over orders(o_custkey, o_orderdate)
    — see the block comment. Both dims min-max-scale to {ZORDER_BITS}
    bits with INTEGER division (exact past 2^53 in both engines), the
    Morton key is pure bit arithmetic, and the {ZORDER_BUCKETS}-way
    bucketing is an ntile over the key — so the whole layout decision
    is hash-verifiable. The output is each would-be file's zone map
    (min/max per dim): the judge of clustering quality, and exactly
    what a reader prunes on.

    Scale: extents are a 1-row broadcast aggregate; key computation is
    map-only codegen; the bucket assignment is the banded rank + the
    closed-form ntile (quantile bands over zkey, partitioned windows,
    prefix-sum offsets) — the range-partition-by-sample-quantiles
    layout this note used to only describe, with exact cross-engine
    bucket parity preserved because the banded rank is exact."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01")).cast(
            "bigint"
        ).alias("d"),
    )
    ext = base.agg(
        F.min("o_custkey").alias("cmin"), F.max("o_custkey").alias("cmax"),
        F.min("d").alias("dmin"), F.max("d").alias("dmax"),
    )
    top = (1 << ZORDER_BITS) - 1
    scaled = base.crossJoin(F.broadcast(ext)).select(
        "o_orderkey", "o_custkey", "d",
        F.expr(f"((o_custkey - cmin) * {top}) div greatest(cmax - cmin, 1)").alias("xs"),
        F.expr(f"((d - dmin) * {top}) div greatest(dmax - dmin, 1)").alias("ys"),
    )
    zkey = F.expr(_interleave_expr("xs", "ys", lambda e, n: f"shiftleft({e}, {n})"))
    keyed = defer_unpersist(
        scaled.select(
            F.col("o_orderkey").alias("doc_id"), "o_custkey", "d", zkey.alias("zkey")
        ).persist()  # read by the boundary/count collects AND the final plan
    )
    from .text import _banded_rank, _ntile_from_rank

    ranked, n = _banded_rank(keyed, "zkey", "_r")
    bucketed = ranked.select(
        "o_custkey", "d", _ntile_from_rank("_r", n, ZORDER_BUCKETS).alias("bucket")
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("o_custkey").alias("custkey_min"),
        F.max("o_custkey").alias("custkey_max"),
        F.min("d").alias("date_min"),
        F.max("d").alias("date_max"),
    ).select(
        F.col("bucket").cast("int").alias("bucket"), "n_rows",
        "custkey_min", "custkey_max", "date_min", "date_max",
    )


# ---- Join-skew audit ---------------------------------------------------
SKEW_HOT_FACTOR = 4  # a key is "hot" above FACTOR x the mean row count
SKEW_TOP = 10


@register(
    "join_skew_audit",
    f"""
    WITH per_key AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows,
             MAX(n) AS max_n
      FROM per_key
    )
    SELECT p.user_id, p.n,
           CAST(p.n AS DOUBLE) * s.n_keys / s.n_rows AS skew_ratio,
           p.n * s.n_keys >= s.n_rows * {SKEW_HOT_FACTOR} AS is_hot,
           CAST(rank AS INT) AS rank
    FROM (SELECT *, row_number() OVER (ORDER BY n DESC, user_id ASC) AS rank
          FROM per_key) p,
         stats s
    WHERE rank <= {SKEW_TOP}
    """,
)
def join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit for a join/groupBy key: per-key row counts for
    the top {SKEW_TOP} heaviest keys, each with its skew ratio (count ÷
    mean count) and a hot-key flag at {SKEW_HOT_FACTOR}x the mean — the
    diagnostic you run BEFORE deciding between a plain shuffle join,
    AQE skew splitting, or the salted-join rewrite this repo ships
    (salted_skew_join). The hot flag compares n * n_keys >= n_rows *
    FACTOR in pure integers (no float threshold boundary to disagree
    on); the reported ratio is a single correctly-rounded multiply/
    divide on exact ints.

    Scale: one map-side-combined groupBy on the key (the thing being
    audited — if THIS aggregate is too skewed to run, partial
    aggregation has already absorbed the hot key), a 1-row stats
    aggregate, and a top-{SKEW_TOP} rank over per-key counts."""
    ev = table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))
    stats = per_key.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    wr = W.orderBy(F.col("n").desc(), F.col("user_id").asc())
    ranked = per_key.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= SKEW_TOP
    )
    out = ranked.crossJoin(F.broadcast(stats))
    is_hot = F.col("n") * F.col("n_keys") >= F.col("n_rows") * SKEW_HOT_FACTOR
    return out.select(
        "user_id", "n",
        (F.col("n").cast("double") * F.col("n_keys") / F.col("n_rows")).alias("skew_ratio"),
        is_hot.alias("is_hot"),
        F.col("rank").cast("int").alias("rank"),
    )


# ---- Column profiling ---------------------------------------------------
@register(
    "column_profile_orders",
    """
    SELECT 'o_orderkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling audit (the first query every pipeline runs against
    a new table): per column — row count, non-null count, distinct
    count, min/max (stringified for a uniform schema across types).
    Floats are deliberately excluded from min/max stringification
    (cross-engine repr differs); the integer/varchar columns cover the
    profiling contract.

    Scale: ONE pass — Spark compiles the union of per-column aggregates
    over the same scan into a shared-scan multi-aggregate (the CTE/scan
    reuse is visible in the plan); distinct counts shuffle per column
    but each is map-side partially aggregated."""
    o = table(spark, sf_dir, "orders")

    def profile(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("column_name"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.count(col).cast("bigint").alias("n_nonnull"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
            F.min(col).cast("string").alias("min_value"),
            F.max(col).cast("string").alias("max_value"),
        )

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    out = profile(cols[0])
    for c in cols[1:]:
        out = out.unionByName(profile(c))
    return out


# ---- TPC-H Q14-style promo revenue --------------------------------------
PROMO_MONTH = "1998-06-01"  # [month, month+1) shipdate window (fixtures ship 1995-2001)


@register(
    "promo_revenue_share",
    f"""
    SELECT CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END)
           / SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
           AS DOUBLE) AS promo_revenue_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= DATE '{PROMO_MONTH}'
      AND l.l_shipdate < DATE '{PROMO_MONTH}' + INTERVAL 1 MONTH
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion revenue share for one ship month:
    conditional revenue over a fact⋈dimension equi-join with a
    pushed-down date-range scan filter. The classic "what fraction of
    business came from X" template, exercising part⋈lineitem (the one
    TPC-H edge the inventory didn't touch yet).

    Determinism: both revenue sums ride DECIMAL(18,4) (exact under any
    reduction order); the single final division/×100 is one correctly-
    rounded double op. Scale: the shipdate predicate prunes at the
    parquet scan; the part join is hint-free (part is NOT broadcast-
    safe by assumption at 100 TB — AQE picks broadcast when stats
    allow, exactly the decision the planner should own)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    month = F.lit(PROMO_MONTH).cast("date")
    j = (
        l.filter(
            (F.col("l_shipdate").cast("date") >= month)
            & (F.col("l_shipdate").cast("date") < F.add_months(month, 1))
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
    )
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)")))
    total = F.sum(rev)
    return j.agg(
        (F.lit(100.0) * promo / total).cast("double").alias("promo_revenue_pct"),
        F.count("*").cast("bigint").alias("n_lineitems"),
    )


# ---- TPC-H Q15-style top supplier ---------------------------------------
TOPSUPP_START = "1998-01-01"  # one-quarter revenue window
TOPSUPP_END = "1998-04-01"


@register(
    "top_supplier_revenue",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '{TOPSUPP_START}' AND l_shipdate < DATE '{TOPSUPP_END}'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — the supplier(s) with maximum quarter revenue:
    per-supplier DECIMAL revenue view, a scalar-subquery max, and the
    supplier⋈revenue join-back (the second previously-unexercised
    TPC-H edge after promo_revenue_share's part join). Returns ALL
    suppliers tied at the max, exactly like the spec query.

    Scale: the revenue view is one map-side-combined groupBy over a
    date-pruned scan; the max is a 1-row aggregate (the only
    broadcast-safe shape by definition); the final join touches only
    max-revenue suppliers. DECIMAL keeps the max comparison exact
    under any reduction order — a double SUM here could crown a
    different supplier per run."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate").cast("date") >= F.lit(TOPSUPP_START).cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit(TOPSUPP_END).cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        s.join(revenue, F.col("supplier_no") == F.col("s_suppkey"))
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
    )


# ---- TPC-H Q3-style shipping priority -----------------------------------
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"  # orders before, shipments after
Q3_TOP = 10


@register(
    "shipping_priority_top",
    f"""
    SELECT o_orderkey,
           CAST(revenue AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT o_orderkey, o_orderdate, o_orderpriority, revenue,
             row_number() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS rank
      FROM (
        SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
               SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = '{Q3_SEGMENT}'
          AND o.o_orderdate < DATE '{Q3_DATE}'
          AND l.l_shipdate > DATE '{Q3_DATE}'
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
      )
    ) WHERE rank <= {Q3_TOP}
    """,
)
def shipping_priority_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — unshipped-revenue shipping priority: orders
    placed before {Q3_DATE} in the {Q3_SEGMENT} segment with lineitems
    shipping after it, ranked by outstanding DECIMAL revenue, top
    {Q3_TOP}. The plan SHAPE is the point: a FACT-FACT equi-join
    (orders⋈lineitem — both unbounded, shuffles on the join key; no
    broadcast is legal) under a dimension semi-filter, then a global
    top-k — the canonical mid-query shuffle join every warehouse
    benchmark leans on, which the 5-way broadcast star
    (revenue_by_nation) deliberately avoids exercising.

    Scale: both scans prune on pushed date predicates; AQE owns the
    orders⋈lineitem strategy; the customer segment filter reduces the
    orders side BEFORE the fact-fact shuffle (filter-through-join
    ordering Catalyst does for free)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == Q3_SEGMENT)
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit(Q3_DATE).cast("date")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit(Q3_DATE).cast("date")
    )
    joined = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
    )
    w = W.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= Q3_TOP)
        .select(
            "o_orderkey",
            F.col("revenue").cast("double").alias("revenue"),
            F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "rank",
        )
    )


# ---- TPC-H Q6-style forecast revenue change -----------------------------
Q6_YEAR = 1998
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_QTY_MAX = 24


@register(
    "forecast_revenue_change",
    f"""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue_change,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= DATE '{Q6_YEAR}-01-01'
      AND l_shipdate < DATE '{Q6_YEAR + 1}-01-01'
      AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
      AND l_quantity < {Q6_QTY_MAX}
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the revenue that would have been gained by
    eliminating mid-band discounts on small orders in one year: a pure
    scan-filter-aggregate with THREE pushable predicates and no join at
    all — the query whose entire cost at 100 TB is how much data the
    scan can skip (date partition pruning + parquet min/max on
    l_discount/l_quantity do all the work; zone-map quality — see
    zorder_layout_audit — decides the bill).

    DECIMAL sum keeps the answer bit-stable under any parallelism;
    the discount band compares doubles both engines parse from the
    same literals."""
    l = table(spark, sf_dir, "lineitem")
    y0, y1 = f"{Q6_YEAR}-01-01", f"{Q6_YEAR + 1}-01-01"
    return (
        l.filter(
            (F.col("l_shipdate").cast("date") >= F.lit(y0).cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit(y1).cast("date"))
            & (F.col("l_discount") >= Q6_DISC_LO)
            & (F.col("l_discount") <= Q6_DISC_HI)
            & (F.col("l_quantity") < Q6_QTY_MAX)
        )
        .agg(
            F.sum(dec(F.col("l_extendedprice") * F.col("l_discount")))
            .cast("double")
            .alias("revenue_change"),
            F.count("*").cast("bigint").alias("n_lineitems"),
        )
    )


# ---- RFM customer segmentation ------------------------------------------
RFM_TILES = 4


@register(
    "rfm_segmentation",
    f"""
    WITH metrics AS (
      SELECT c.c_custkey,
             MAX(o.o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS monetary
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ),
    scored AS (
      SELECT c_custkey,
             ntile({RFM_TILES}) OVER (ORDER BY last_order DESC, c_custkey ASC) AS r,
             ntile({RFM_TILES}) OVER (ORDER BY frequency DESC, c_custkey ASC) AS f,
             ntile({RFM_TILES}) OVER (ORDER BY monetary DESC, c_custkey ASC) AS m
      FROM metrics
    )
    SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           MIN(c_custkey) AS example_custkey
    FROM scored GROUP BY r, f, m
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic warehouse customer analysis:
    quartile each customer on Recency (latest order date), Frequency
    (order count), and Monetary (DECIMAL total spend), then report the
    segment grid (r,f,m) → customer count. Quartiles are ntile with
    custkey tiebreaks so both engines cut identical segments; monetary
    rides DECIMAL so the ordering itself is reduction-order-stable.

    Scale: one orders groupBy; three global ntiles over one-row-per-
    customer metrics (same exact-vs-sampled-boundary note as the
    equi-depth histogram); the grid aggregate is at most
    {RFM_TILES}^3 rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    metrics = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(dec("o_totalprice")).alias("monetary"),
        )
    )
    scored = metrics.select(
        "c_custkey",
        F.ntile(RFM_TILES).over(
            W.orderBy(F.col("last_order").desc(), F.col("c_custkey").asc())
        ).alias("r"),
        F.ntile(RFM_TILES).over(
            W.orderBy(F.col("frequency").desc(), F.col("c_custkey").asc())
        ).alias("f"),
        F.ntile(RFM_TILES).over(
            W.orderBy(F.col("monetary").desc(), F.col("c_custkey").asc())
        ).alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.min("c_custkey").alias("example_custkey"),
    ).select(
        F.col("r").cast("int").alias("r"), F.col("f").cast("int").alias("f"),
        F.col("m").cast("int").alias("m"), "n_customers", "example_custkey",
    )


# ---- Inter-order gap analysis -------------------------------------------
@register(
    "customer_order_gap_median",
    """
    WITH gaps AS (
      SELECT o_custkey,
             CAST(CAST(o_orderdate AS DATE)
                  - CAST(lag(o_orderdate) OVER w AS DATE) AS BIGINT) AS gap_days
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    ),
    ranked AS (
      SELECT o_custkey, gap_days,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY gap_days ASC, 1) AS rn,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n
      FROM gaps WHERE gap_days IS NOT NULL
    )
    SELECT o_custkey AS custkey,
           CAST(n AS BIGINT) AS n_gaps,
           gap_days AS median_gap_days
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def customer_order_gap_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival analysis: the (lower-)median number of days between
    a customer's consecutive orders — the purchase-cadence signal
    behind churn scoring and replenishment forecasting, and the
    repeated-event twin of the RFM recency quartile. Gaps come from a
    per-customer lag window with a total order (date, then orderkey);
    the median uses the exact rank method (value at rank (n+1) div 2 in
    the gap multiset — well-defined under ties regardless of
    tie-ordering, the same argument as the MAD/norm medians).

    Scale: one window + one rank window, both partitioned by customer
    (bounded, parallel); rows out = customers with 2+ orders."""
    o = table(spark, sf_dir, "orders")
    wo = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(wo),
        ).cast("bigint").alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    wr = W.partitionBy("o_custkey").orderBy(F.col("gap_days").asc())
    ranked = gaps.select(
        "o_custkey", "gap_days",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(W.partitionBy("o_custkey")).alias("n"),
    )
    return ranked.filter(F.expr("rn = (n + 1) div 2")).select(
        F.col("o_custkey").alias("custkey"),
        F.col("n").cast("bigint").alias("n_gaps"),
        F.col("gap_days").alias("median_gap_days"),
    )


def _rel_registry():
    from ..plans.registry import QUERIES

    return QUERIES


@register(
    "rfm_segmentation_scalable",
    lambda: _rel_registry()["rfm_segmentation"].oracle,
)
def rfm_segmentation_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of rfm_segmentation (same oracle — the hash gate
    proves the rewrite): the exact form's three unpartitioned ntiles
    each funnel one-row-per-customer through a single task. Here each
    axis goes through _banded_rank + _ntile_from_rank (quantile bands,
    partitioned windows, prefix-sum offsets, closed-form ntile). All
    three sort keys are converted to exact-integer ASCENDING scores so
    one rank machine serves every axis: recency = -days(last_order),
    frequency = -count, monetary = -(spend x 10^4) (DECIMAL(18,4) to
    exact integer ten-thousandths — a monotone bijection, so the
    banded order equals the exact form's DESC order, ties and all).

    Scale: one orders groupBy as before; per axis, two bounded driver
    collects (band boundaries + band counts) and one band-partitioned
    window; the grid aggregate is unchanged."""
    from .text import _banded_rank, _ntile_from_rank

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    metrics = defer_unpersist(
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(dec("o_totalprice")).alias("monetary"),
        )
        .select(
            F.col("c_custkey").alias("doc_id"),
            (-F.datediff(F.col("last_order"), F.lit("1970-01-01").cast("date")))
            .cast("bigint")
            .alias("neg_r"),
            (-F.col("frequency")).cast("bigint").alias("neg_f"),
            (-(F.col("monetary") * 10000)).cast("bigint").alias("neg_m"),
        )
        .persist()
    )
    ranked, n = _banded_rank(metrics, "neg_r", "_rr")
    ranked, _ = _banded_rank(ranked, "neg_f", "_rf")
    ranked, _ = _banded_rank(ranked, "neg_m", "_rm")
    scored = ranked.select(
        "doc_id",
        _ntile_from_rank("_rr", n, RFM_TILES).alias("r"),
        _ntile_from_rank("_rf", n, RFM_TILES).alias("f"),
        _ntile_from_rank("_rm", n, RFM_TILES).alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.min("doc_id").alias("example_custkey"),
        )
        .select("r", "f", "m", "n_customers", "example_custkey")
    )


# ---- TPC-H-shape round-11 additions --------------------------------------
# The eight classic decision-support plan shapes the inventory had not yet
# exercised, adapted to this fixture's schema (no partsupp / l_shipmode /
# l_commitdate / c_phone columns — each adaptation keeps the PLAN shape the
# original query exists to exercise; reference semantics per SURVEY §2.3/§2.4,
# reference has no relational engine of its own so shapes follow the
# published TPC-H kit).

VS_YEAR_LO = 1995  # Q7 shipping window
VS_YEAR_HI = 1996


@register(
    "volume_shipping_pairs",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= DATE '{VS_YEAR_LO}-01-01'
      AND l.l_shipdate < DATE '{VS_YEAR_HI + 1}-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def volume_shipping_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — volume shipping between nation pairs: revenue
    moved from every supplier nation to every customer nation by ship
    year inside a two-year window (the full pair matrix instead of the
    kit's single pair so the result is non-empty at every SF). The plan
    the shape exists to exercise: ONE fact-fact shuffle (orders⋈lineitem)
    under FOUR broadcast dimension joins feeding a grouped aggregate on
    dimension attributes.

    Scale: supplier/customer/nation broadcast (dims); the date filter
    pushes to the lineitem scan; the group-by key space is
    |nations|² × years — tiny — so the aggregate is map-side combined."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{VS_YEAR_LO}-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit(f"{VS_YEAR_HI + 1}-01-01").cast("date"))
    )
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    joined = (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("sk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("ck") == F.col("c_nationkey"))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("rev"),
            F.count("*").cast("bigint").alias("n_items"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.col("ship_year").cast("int").alias("ship_year"),
            F.col("rev").cast("double").alias("revenue"),
            "n_items",
        )
    )


MS_REGION = "ASIA"  # Q8 market: customer region
MS_PTYPE = "PROMO"  # part type under analysis
MS_NATION = "NATION_5"  # supplier nation whose share is tracked


@register(
    "market_share_by_year",
    f"""
    WITH base AS (
      SELECT year(o.o_orderdate) AS order_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS rev,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{MS_PTYPE}'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey AND r.r_name = '{MS_REGION}'
    )
    SELECT CAST(order_year AS INT) AS order_year,
           CAST(SUM(CASE WHEN supp_nation = '{MS_NATION}' THEN rev
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_revenue,
           CAST(SUM(rev) AS DOUBLE) AS total_revenue,
           CAST(SUM(CASE WHEN supp_nation = '{MS_NATION}' THEN rev
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE) AS mkt_share
    FROM base
    GROUP BY order_year
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — market share: of all {MS_PTYPE}-part revenue
    sold into {MS_REGION}-region customers, the fraction supplied by
    {MS_NATION}, by order year. The shape's point: a conditional
    aggregate (share numerator) computed in the SAME pass as its
    denominator — no self-join, no second scan — under a 7-table star.

    Scale: part/supplier/customer/nation/region all broadcast;
    orders⋈lineitem is the one shuffle. Share is one double division of
    two exact DECIMAL sums (cross-engine deterministic)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == MS_PTYPE)
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == MS_REGION)
    n1 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("rk"))
    base = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("sk") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("ck") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("rk"))
        .select(
            F.year("o_orderdate").alias("order_year"),
            dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            "supp_nation",
        )
    )
    nat = F.sum(
        F.when(F.col("supp_nation") == MS_NATION, F.col("rev")).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    tot = F.sum("rev")
    return base.groupBy("order_year").agg(
        nat.cast("double").alias("nation_revenue"),
        tot.cast("double").alias("total_revenue"),
        (nat.cast("double") / tot.cast("double")).alias("mkt_share"),
    ).select(
        F.col("order_year").cast("int").alias("order_year"),
        "nation_revenue",
        "total_revenue",
        "mkt_share",
    )


RI_DATE_LO = "1996-01-01"  # Q10 half-year window
RI_DATE_HI = "1996-07-01"
RI_TOP = 20


@register(
    "returned_item_ranking",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= DATE '{RI_DATE_LO}'
      AND o.o_orderdate < DATE '{RI_DATE_HI}'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT {RI_TOP}
    """,
)
def returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item customer ranking: the {RI_TOP}
    customers who returned the most revenue in a half-year window. The
    shape's point: a grouped aggregate at CUSTOMER grain (much wider key
    space than Q3's order grain) closed by a global top-k.

    Scale: the top-k is sort+limit — Spark's TakeOrderedAndProject, a
    per-partition heap + driver merge of {RI_TOP} rows per partition —
    never a single-partition global window (total order: revenue desc,
    custkey asc makes the limit deterministic for the hash gate)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(RI_DATE_LO).cast("date"))
        & (F.col("o_orderdate") < F.lit(RI_DATE_HI).cast("date"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("rev"))
        .select("c_custkey", "c_name", "n_name", F.col("rev").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(RI_TOP)
    )


SD_BUCKET_DAYS = 30  # Q12-adapted ship-delay bucket width
SD_BUCKET_CAP = 6


@register(
    "ship_delay_priority_mix",
    f"""
    SELECT CAST(LEAST(datediff('day', o.o_orderdate, l.l_shipdate) // {SD_BUCKET_DAYS},
                      {SD_BUCKET_CAP}) AS INT) AS delay_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate
    GROUP BY 1
    """,
)
def ship_delay_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted — the fixture has no l_shipmode /
    l_commitdate, so the mode dimension becomes the DERIVED ship-delay
    bucket: days from order to ship, {SD_BUCKET_DAYS}-day buckets capped
    at {SD_BUCKET_CAP}): per bucket, how many lineitems belong to
    high-priority vs low-priority orders. The shape's point: both
    branches of a priority split counted in one conditional-aggregate
    pass over a fact-fact join, grouped by a computed key.

    Scale: one orders⋈lineitem shuffle; ≤{SD_BUCKET_CAP + 1} groups so
    the aggregate is entirely map-side combined."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    j = o.join(l, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    bucket = F.least(
        F.floor(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) / SD_BUCKET_DAYS),
        F.lit(SD_BUCKET_CAP),
    ).cast("int")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


LO_QTY_MIN = 150  # Q18 large-order quantity threshold
LO_TOP = 100


@register(
    "large_order_customers",
    f"""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {LO_QTY_MIN}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice,
           CAST(b.sum_qty AS BIGINT) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT {LO_TOP}
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers: orders whose total
    quantity exceeds {LO_QTY_MIN}, with their customers, ranked by order
    value, top {LO_TOP}. The shape's point: a HAVING-filtered aggregate
    used as the DRIVING side of subsequent joins (the classic
    "aggregate-then-join" that lets the engine shrink the fact table
    before touching dimensions).

    Scale: the lineitem aggregate map-side combines on l_orderkey; its
    survivors (rare orders) then join orders/customer — AQE sees the
    shrunken side and broadcasts it; the top-k is sort+limit
    (TakeOrdered), never a global window. Quantities are integral
    doubles, so SUM is order-independent and the BIGINT cast exact."""
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > LO_QTY_MIN)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.col("sum_qty").cast("bigint").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(LO_TOP)
    )


@register(
    "disjunctive_part_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 5 AND 15)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 1 AND 40
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — disjunctive predicate revenue: an OR of three
    (brand, size-band, quantity-band) conjunctions across the
    part⋈lineitem join. The shape's point: Catalyst must (a) push the
    COMMON part of each disjunct below the join per side (brand/size to
    the part scan, quantity to the lineitem scan as an OR-of-ranges) and
    (b) keep the cross-side conjunctions as a join-time filter — naive
    engines evaluate the whole disjunction post-join.

    Scale: part is a broadcast dim; lineitem never shuffles (broadcast
    hash join + map-side-combined single-group aggregate)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(5, 15)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(1, 40)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_lineitems"),
        )
    )


WS_TOP = 10  # Q21-adapted supplier ranking size


@register(
    "waiting_supplier_ranking",
    f"""
    WITH l1 AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    ),
    sole_latest AS (
      SELECT DISTINCT a.l_orderkey, a.l_suppkey
      FROM l1 a
      WHERE EXISTS (SELECT 1 FROM l1 b
                    WHERE b.l_orderkey = a.l_orderkey
                      AND b.l_suppkey <> a.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM l1 c
                        WHERE c.l_orderkey = a.l_orderkey
                          AND c.l_suppkey <> a.l_suppkey
                          AND c.l_shipdate > a.l_shipdate)
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM sole_latest x
    JOIN supplier s ON s.s_suppkey = x.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT {WS_TOP}
    """,
)
def waiting_supplier_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted — no l_commitdate/l_receiptdate, so
    "kept the order waiting" becomes "shipped LAST among the order's
    suppliers"): for finalized orders with at least two suppliers, count
    per supplier the orders where no OTHER supplier shipped later, top
    {WS_TOP}. The shape's point: correlated EXISTS + NOT EXISTS against
    the SAME fact table — a semi-join and an anti-join over self-joined
    lineitem, the hardest decorrelation pattern in the kit.

    Scale: all three l1 references shuffle on l_orderkey (co-located
    self-joins — one exchange reused three times); the semi/anti joins
    never multiply rows; the final count groups on the supplier dim."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    l1 = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    a = l1.alias("a")
    b = l1.alias("b")
    c = l1.alias("c")
    multi = a.join(
        b,
        (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
        & (F.col("b.l_suppkey") != F.col("a.l_suppkey")),
        "left_semi",
    )
    sole = multi.join(
        c,
        (F.col("c.l_orderkey") == F.col("a.l_orderkey"))
        & (F.col("c.l_suppkey") != F.col("a.l_suppkey"))
        & (F.col("c.l_shipdate") > F.col("a.l_shipdate")),
        "left_anti",
    ).select("a.l_orderkey", "a.l_suppkey").distinct()
    s = table(spark, sf_dir, "supplier")
    return (
        sole.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(WS_TOP)
    )


@register(
    "waiting_supplier_ranking_windowed",
    lambda: _rel_registry()["waiting_supplier_ranking"].oracle,
)
def waiting_supplier_ranking_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-shuffle form of waiting_supplier_ranking (same oracle —
    the hash gate proves the rewrite): the decorrelated EXISTS/NOT-
    EXISTS pair reduces algebraically to a single per-order window.
    A supplier row survives the strict-inequality anti-join iff no
    OTHER supplier shipped strictly later, i.e. iff the supplier
    attains the order's max shipdate (ties survive: an equal shipdate
    is not "later"); the EXISTS arm is just "the order has >= 2
    distinct suppliers". So: one window over l_orderkey computing
    max(l_shipdate) and the distinct-supplier count, filter, distinct.

    Scale: the self-join form referenced the l_orderkey exchange three
    times (measured 10x ratio 12.55 — linear fact volume times triple
    reuse); here lineitem crosses the wire once for the window, the
    follow-up distinct reuses the l_orderkey partitioning (subset
    clustering), and the supplier dim broadcasts."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    l1 = li.join(o, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    w = W.partitionBy("l_orderkey")
    scored = l1.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("_m1"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("_nsupp"),
    )
    sole = (
        scored.filter((F.col("_nsupp") >= 2) & (F.col("l_shipdate") == F.col("_m1")))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    return (
        sole.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(WS_TOP)
    )


IB_CUTOFF = "2001-01-01"  # Q22-adapted recency cutoff


@register(
    "idle_balance_customers",
    f"""
    WITH thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    ),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= DATE '{IB_CUTOFF}'
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM recent r WHERE r.o_custkey = c.c_custkey)
    GROUP BY n.n_name
    """,
)
def idle_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted — no c_phone, and every fixture customer
    has SOME order, so "never ordered" becomes "no order since
    {IB_CUTOFF}"): wealthy-but-idle customers per nation — balance above
    the average positive balance, no recent order. The shape's point: a
    scalar subquery (the global average) feeding a filter PLUS a NOT
    EXISTS anti-join, the two classic subquery decorrelations in one
    plan.

    Scale: the threshold is a one-row broadcast crossJoin (exact DECIMAL
    sum / count — one deterministic double division); the anti-join
    shuffles on custkey against the date-pruned orders scan; counts and
    the DECIMAL balance sum are order-independent."""
    cust = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
        )
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(IB_CUTOFF).cast("date"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_custs"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


K_ANON = 5  # minimum safe equivalence-class size
K_ANON_BAL_BAND = 1000  # account-balance quasi-identifier band width


@register(
    "k_anonymity_audit",
    f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / {K_ANON_BAL_BAND}) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS sz
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT CAST({K_ANON} AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN sz < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_classes,
           CAST(SUM(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           CAST(MIN(sz) AS BIGINT) AS min_class_size,
           CAST(SUM(sz) AS BIGINT) AS n_rows
    FROM classes
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier tuple
    (nation, market segment, {K_ANON_BAL_BAND}-wide balance band): how
    many equivalence classes exist, how many fall below k={K_ANON}, and
    how many ROWS sit in those re-identifiable classes — the release
    gate a privacy review runs before publishing an aggregate extract
    (pairs with pii_redaction, which handles direct identifiers; this
    measures indirect-identifier risk).

    Scale: one groupBy at quasi-identifier grain (map-side combined)
    collapsed to a single audit row — no joins, no windows; floor() on
    the band is floor-toward--inf in both engines, negative balances
    included."""
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / K_ANON_BAL_BAND).cast("bigint").alias("bal_band"),
    ).agg(F.count("*").cast("bigint").alias("sz"))
    return classes.agg(
        F.lit(K_ANON).cast("bigint").alias("k"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("sz") < K_ANON, 1).otherwise(0))
        .cast("bigint")
        .alias("n_small_classes"),
        F.sum(F.when(F.col("sz") < K_ANON, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("sz").cast("bigint").alias("min_class_size"),
        F.sum("sz").cast("bigint").alias("n_rows"),
    )


L_DIV = 3  # minimum distinct sensitive values per equivalence class
# floor(ln(L_DIV) * 1e6): the entropy-l-diversity threshold in quantized
# micro-nats, computed once in Python and inlined into BOTH engines so
# no runtime log() can diverge (the ndcg_eval_lsh literal pattern).
LN_L_Q = 1098612


@register(
    "l_diversity_audit",
    f"""
    WITH rel AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             CAST(floor(c.c_acctbal / {K_ANON_BAL_BAND}) AS BIGINT) AS bal_band,
             o.o_orderpriority AS sens
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cells AS (
      SELECT c_nationkey, c_mktsegment, bal_band, sens,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM rel GROUP BY 1, 2, 3, 4
    ),
    sized AS (
      SELECT *, CAST(SUM(cnt) OVER (
               PARTITION BY c_nationkey, c_mktsegment, bal_band
             ) AS BIGINT) AS sz
      FROM cells
    ),
    classes AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(MAX(sz) AS BIGINT) AS sz,
             CAST(SUM(CAST(floor(
               (CAST(cnt AS DOUBLE) / sz)
               * ln(CAST(sz AS DOUBLE) / cnt) * 1000000
             ) AS BIGINT)) AS BIGINT) AS h_q
      FROM sized GROUP BY 1, 2, 3
    )
    SELECT CAST({L_DIV} AS BIGINT) AS l,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN n_distinct < {L_DIV} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_distinct,
           CAST(SUM(CASE WHEN n_distinct < {L_DIV} THEN sz ELSE 0 END)
                AS BIGINT) AS n_rows_at_risk,
           CAST(MIN(n_distinct) AS BIGINT) AS min_distinct,
           CAST(SUM(CASE WHEN h_q < {LN_L_Q} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_entropy,
           CAST(MIN(h_q) AS BIGINT) AS min_entropy_q,
           CAST(SUM(sz) AS BIGINT) AS n_rows
    FROM classes
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the release gate that pairs with
    k_anonymity_audit (same quasi-identifier machinery: nation, market
    segment, {K_ANON_BAL_BAND}-wide balance band): a class can satisfy
    k-anonymity yet still leak if every member shares one sensitive
    value, so per equivalence class of the published customer-order
    extract this measures (a) the count of DISTINCT sensitive values
    (o_orderpriority) — distinct l-diversity — and (b) the class's
    sensitive-value entropy in quantized micro-nats — entropy
    l-diversity, H(class) >= ln(l) (Machanavajjhala et al.), with
    ln(l) inlined as the Python-computed literal {LN_L_Q} so both
    engines compare against the identical integer.

    Scale: one shuffle to (QI, sensitive) grain (map-side combined),
    one class-grain window over the already-collapsed cells frame, one
    audit row out — no fact-side windows, no joins after the first.
    Entropy terms quantize per-cell BEFORE the sum (floor(x*1e6)
    BIGINT, the established log-statistic parity pattern), so the only
    non-correctly-rounded op (ln) never feeds cross-engine arithmetic."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    rel = o.join(c, F.col("c_custkey") == F.col("o_custkey")).select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / K_ANON_BAL_BAND).cast("bigint").alias("bal_band"),
        F.col("o_orderpriority").alias("sens"),
    )
    cells = rel.groupBy("c_nationkey", "c_mktsegment", "bal_band", "sens").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    wq = W.partitionBy("c_nationkey", "c_mktsegment", "bal_band")
    sized = cells.withColumn("sz", F.sum("cnt").over(wq).cast("bigint"))
    term_q = F.floor(
        (F.col("cnt").cast("double") / F.col("sz"))
        * F.log(F.col("sz").cast("double") / F.col("cnt"))
        * 1000000
    ).cast("bigint")
    classes = sized.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max("sz").cast("bigint").alias("sz"),
        F.sum(term_q).cast("bigint").alias("h_q"),
    )
    return classes.agg(
        F.lit(L_DIV).cast("bigint").alias("l"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("n_distinct") < L_DIV, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low_distinct"),
        F.sum(F.when(F.col("n_distinct") < L_DIV, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("n_distinct").cast("bigint").alias("min_distinct"),
        F.sum(F.when(F.col("h_q") < LN_L_Q, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low_entropy"),
        F.min("h_q").cast("bigint").alias("min_entropy_q"),
        F.sum("sz").cast("bigint").alias("n_rows"),
    )


# ---- Round-12 TPC-H shapes (Q4 / Q2 / Q9 / Q16 / Q20 adapted) -----------
LO_START, LO_END = "1995-01-01", "1995-07-01"  # Q4-adapted order window
LO_LATE_DAYS = 75  # "late" = shipped more than this after the order date


@register(
    "late_order_priority_counts",
    f"""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '{LO_START}'
      AND o_orderdate < TIMESTAMP '{LO_END}'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL {LO_LATE_DAYS} DAY)
    GROUP BY o_orderpriority
    """,
)
def late_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted — no l_commitdate/l_receiptdate, so
    "late" becomes shipped more than {LO_LATE_DAYS} days after the
    order date): order count per priority among orders in a half-year
    window having at least one late lineitem. The shape's point: a
    correlated EXISTS whose predicate references BOTH sides — the semi
    join carries a cross-table comparison, not just the key equality.

    Scale: the date window prunes the orders scan (pushed filter); the
    semi join shuffles on l_orderkey and never multiplies rows; the
    final aggregate is a handful of priority groups (map-side
    combined)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(LO_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(LO_END).cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LO_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
    )


Q2_SIZE = 25  # Q2-adapted part-size filter
Q2_REGION = "EUROPE"
Q2_TOP = 20


@register(
    "min_cost_supplier",
    f"""
    WITH eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey AND r_name = '{Q2_REGION}'
    ),
    sup AS (
      SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
             MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS cost
      FROM lineitem JOIN eu ON s_suppkey = l_suppkey
      GROUP BY 1, 2, 3, 4, 5
    ),
    best AS (
      SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS mincost FROM sup
    )
    SELECT s_acctbal, s_name, n_name,
           CAST(p_partkey AS BIGINT) AS p_partkey, p_type,
           CAST(cost AS DOUBLE) AS cost
    FROM best JOIN part ON p_partkey = l_partkey AND p_size = {Q2_SIZE}
    WHERE cost = mincost
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT {Q2_TOP}
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted — no partsupp, so "supply cost" becomes
    the minimum observed lineitem price): for every size-{Q2_SIZE} part,
    the {Q2_REGION} supplier(s) whose best price equals the part's
    regional minimum, ranked by supplier balance. The shape's point:
    the correlated MIN subquery shares the outer query's whole join
    graph — decorrelated here as one window over the already-joined
    aggregate, not a second scan of the join.

    Scale: supplier⋈nation⋈region is dimension-sized and broadcasts
    into the one lineitem pass; the (part, supplier) aggregate and the
    per-part window share the l_partkey exchange; the part dim
    broadcasts; the global top-{Q2_TOP} is a TakeOrdered, no global
    sort."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    eu = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = table(spark, sf_dir, "lineitem")
    sup = (
        li.join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(dec("l_extendedprice")).alias("cost"))
    )
    best = sup.withColumn(
        "mincost", F.min("cost").over(W.partitionBy("l_partkey"))
    ).filter(F.col("cost") == F.col("mincost"))
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == Q2_SIZE)
    return (
        best.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            "p_type",
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(Q2_TOP)
    )


Q9_PART_SUBSTR = "widget"  # Q9-adapted part-name filter
Q9_COST_FACTOR = 0.5  # stand-in supply cost: this fraction of retail price


@register(
    "product_profit_by_nation",
    f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                    - CAST(({Q9_COST_FACTOR} * p_retailprice) * l_quantity
                           AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_name LIKE '%{Q9_PART_SUBSTR}%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY 1, 2
    """,
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted — no partsupp, so supply cost is a fixed
    {Q9_COST_FACTOR} fraction of the part's retail price): profit
    (revenue minus cost) on '%{Q9_PART_SUBSTR}%' parts, grouped by the
    supplier's nation and order year. The shape's point: a LIKE-filtered
    part dimension gating a 5-table star whose aggregate subtracts two
    measure expressions from DIFFERENT tables of the star.

    Scale: part (LIKE-pruned), supplier, nation broadcast; the one
    shuffle is orders⋈lineitem on orderkey; both profit terms quantize
    to DECIMAL per row before the sum (order-independent), with the
    double multiplies in a fixed, parenthesized order so both engines
    round identically."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{Q9_PART_SUBSTR}%")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    amount = dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))) - dec(
        (F.lit(Q9_COST_FACTOR) * F.col("p_retailprice")) * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


Q16_EXCLUDED_BRAND = "Brand#45"
Q16_EXCLUDED_TYPE_PREFIX = "MEDIUM"
Q16_SIZES = [1, 4, 9, 14, 19, 24, 29, 34, 39]
Q16_COMPLAINT_SUFFIX = "7"  # excluded-supplier name pattern


@register(
    "supplier_count_by_part",
    f"""
    SELECT p_brand, p_type, CAST(p_size AS INT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> '{Q16_EXCLUDED_BRAND}'
      AND p_type NOT LIKE '{Q16_EXCLUDED_TYPE_PREFIX}%'
      AND p_size IN ({", ".join(str(z) for z in Q16_SIZES)})
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%{Q16_COMPLAINT_SUFFIX}')
    GROUP BY 1, 2, 3
    """,
)
def supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted — no partsupp, so supplier-part
    relationships come from lineitem; "complaint" suppliers are the
    name-suffix pattern): distinct supplier count per (brand, type,
    size) over a negated-predicate part filter, excluding a
    subquery-defined supplier set. The shape's point: NOT-IN
    decorrelated to an anti join UNDER a COUNT(DISTINCT) aggregate.

    Scale: part (pruned by the negated predicates + IN list) and the
    excluded-supplier frame broadcast; COUNT(DISTINCT) runs alone in
    its aggregate (never mixed with an approx aggregate — the Expand
    trap), two-phase on the (group, suppkey) grain."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCLUDED_BRAND)
        & (~F.col("p_type").like(f"{Q16_EXCLUDED_TYPE_PREFIX}%"))
        & (F.col("p_size").isin(Q16_SIZES))
    )
    excl = table(spark, sf_dir, "supplier").filter(
        F.col("s_name").like(f"%{Q16_COMPLAINT_SUFFIX}")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(excl),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


Q20_PREFIX = "red"  # Q20-adapted part-name prefix
Q20_YEAR_START, Q20_YEAR_END = "1996-01-01", "1997-01-01"
Q20_SHARE_NUM, Q20_SHARE_DEN = 3, 10  # dominance threshold: > 30% of the part


@register(
    "excess_shipping_suppliers",
    f"""
    WITH lp AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
                                 AND p_name LIKE '{Q20_PREFIX}%'
      WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR_START}'
        AND l_shipdate < TIMESTAMP '{Q20_YEAR_END}'
      GROUP BY 1, 2
    ),
    w AS (
      SELECT *, SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty FROM lp
    ),
    dominant AS (
      SELECT DISTINCT l_suppkey FROM w
      WHERE qty * {Q20_SHARE_DEN} > part_qty * {Q20_SHARE_NUM}
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN dominant ON l_suppkey = s_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    ORDER BY s_name ASC
    """,
)
def excess_shipping_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted — no partsupp availability, so "excess"
    becomes supply dominance): suppliers who shipped more than
    {Q20_SHARE_NUM}/{Q20_SHARE_DEN} of some '{Q20_PREFIX}%' part's total
    {Q20_YEAR_START[:4]} volume. The shape's point: the semi-join chain
    is driven by an AGGREGATE-derived threshold — a per-part total
    computed from the same rows the candidate aggregate uses.

    Scale: the part prefix + ship-year filters prune the fact scan; the
    (part, supplier) aggregate and the per-part window share the
    l_partkey exchange; the dominance test multiplies exact DECIMAL
    sums by integer literals (no division, no doubles); the surviving
    supplier set is dimension-sized and joins broadcast."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q20_YEAR_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_YEAR_END).cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like(f"{Q20_PREFIX}%"))
    lp = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
    )
    w = lp.withColumn("part_qty", F.sum("qty").over(W.partitionBy("l_partkey")))
    dominant = (
        w.filter(F.col("qty") * Q20_SHARE_DEN > F.col("part_qty") * Q20_SHARE_NUM)
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(dominant), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy(F.col("s_name").asc())
    )


T_CLOSE_2Q = 600000  # 2*TVD threshold in quantized micro units (t = 0.3)


@register(
    "t_closeness_audit",
    f"""
    WITH rel AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             CAST(floor(c.c_acctbal / {K_ANON_BAL_BAND}) AS BIGINT) AS bal_band,
             o.o_orderpriority AS sens
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    gl AS (SELECT sens, CAST(COUNT(*) AS BIGINT) AS g FROM rel GROUP BY 1),
    gt AS (SELECT CAST(SUM(g) AS BIGINT) AS gtot FROM gl),
    cells AS (
      SELECT c_nationkey, c_mktsegment, bal_band, sens,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM rel GROUP BY 1, 2, 3, 4
    ),
    sized AS (
      SELECT *, CAST(SUM(cnt) OVER (
               PARTITION BY c_nationkey, c_mktsegment, bal_band
             ) AS BIGINT) AS sz
      FROM cells
    ),
    terms AS (
      SELECT s.c_nationkey, s.c_mktsegment, s.bal_band, s.sz, g.g, t.gtot,
             CAST(floor(abs(CAST(s.cnt AS DOUBLE) / s.sz
                            - CAST(g.g AS DOUBLE) / t.gtot) * 1000000)
                  AS BIGINT) AS term_q
      FROM sized s JOIN gl g USING (sens) CROSS JOIN gt t
    ),
    classes AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             CAST(SUM(term_q) AS BIGINT)
               + CAST(floor(CAST(MAX(gtot) - SUM(g) AS DOUBLE)
                            / MAX(gtot) * 1000000) AS BIGINT) AS tvd2_q,
             CAST(MAX(sz) AS BIGINT) AS sz
      FROM terms GROUP BY 1, 2, 3
    )
    SELECT CAST({T_CLOSE_2Q} AS BIGINT) AS tvd2_threshold_q,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN tvd2_q > {T_CLOSE_2Q} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_far_classes,
           CAST(SUM(CASE WHEN tvd2_q > {T_CLOSE_2Q} THEN sz ELSE 0 END)
                AS BIGINT) AS n_rows_at_risk,
           CAST(MAX(tvd2_q) AS BIGINT) AS max_tvd2_q,
           CAST(MIN(tvd2_q) AS BIGINT) AS min_tvd2_q,
           CAST(SUM(sz) AS BIGINT) AS n_rows
    FROM classes
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third member of the privacy-gate trio
    (k_anonymity_audit, l_diversity_audit; Li et al. 2007): a class can
    be k-anonymous AND l-diverse yet still leak when its sensitive
    distribution diverges from the corpus-wide one, so per equivalence
    class this measures the total-variation distance between the
    class's o_orderpriority distribution and the global distribution.
    Categorical TVD = 0.5·(Σ_present |p_s − q_s| + missing global
    mass); emitted doubled and quantized (tvd2_q micro units) so the
    whole statistic is integer arithmetic after one correctly-rounded
    divide per term — no float sums cross engines.

    Scale: one shuffle to (QI, sensitive) grain, a class-grain window
    over the collapsed cells, a broadcast join to the |sensitive|-row
    global frame, one audit row out."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    rel = o.join(c, F.col("c_custkey") == F.col("o_custkey")).select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / K_ANON_BAL_BAND).cast("bigint").alias("bal_band"),
        F.col("o_orderpriority").alias("sens"),
    )
    gl = rel.groupBy("sens").agg(F.count("*").cast("bigint").alias("g"))
    gt = gl.agg(F.sum("g").cast("bigint").alias("gtot"))
    cells = rel.groupBy("c_nationkey", "c_mktsegment", "bal_band", "sens").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    wq = W.partitionBy("c_nationkey", "c_mktsegment", "bal_band")
    sized = cells.withColumn("sz", F.sum("cnt").over(wq).cast("bigint"))
    terms = (
        sized.join(F.broadcast(gl), "sens")
        .crossJoin(F.broadcast(gt))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "sz",
            "g",
            "gtot",
            F.floor(
                F.abs(
                    F.col("cnt").cast("double") / F.col("sz")
                    - F.col("g").cast("double") / F.col("gtot")
                )
                * 1000000
            )
            .cast("bigint")
            .alias("term_q"),
        )
    )
    classes = terms.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        (
            F.sum("term_q").cast("bigint")
            + F.floor(
                (F.max("gtot") - F.sum("g")).cast("double")
                / F.max("gtot")
                * 1000000
            ).cast("bigint")
        ).alias("tvd2_q"),
        F.max("sz").cast("bigint").alias("sz"),
    )
    return classes.agg(
        F.lit(T_CLOSE_2Q).cast("bigint").alias("tvd2_threshold_q"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("tvd2_q") > T_CLOSE_2Q, 1).otherwise(0))
        .cast("bigint")
        .alias("n_far_classes"),
        F.sum(F.when(F.col("tvd2_q") > T_CLOSE_2Q, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.max("tvd2_q").cast("bigint").alias("max_tvd2_q"),
        F.min("tvd2_q").cast("bigint").alias("min_tvd2_q"),
        F.sum("sz").cast("bigint").alias("n_rows"),
    )


def _skyline_coords(pts: DataFrame) -> DataFrame:
    """(price, ms) frontier coordinates of a (p_retailprice, p_size)
    frame — the two-phase 2-D skyline shared by pareto_skyline_parts
    (batch) and the incremental frontier store: phase 1 = exact local
    frontier per Arrow batch (map-only, lossless superset), phase 2 =
    the staircase recurrence over phase-1 survivors (per-price min +
    one exclusive running-min window on the already-tiny frame)."""
    from pyspark.sql import types as T

    sk_schema = T.StructType(
        [
            T.StructField("price", T.DoubleType()),
            T.StructField("size", T.DoubleType()),
        ]
    )

    def local_sky(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            d = pdf[["p_retailprice", "p_size"]].drop_duplicates()
            gm = (
                d.groupby("p_retailprice", sort=True)["p_size"]
                .min()
                .reset_index()
            )
            rm = gm["p_size"].cummin().shift(1)
            keep = gm[rm.isna() | (gm["p_size"] < rm)]
            yield pd.DataFrame(
                {
                    "price": keep["p_retailprice"].astype("float64"),
                    "size": keep["p_size"].astype("float64"),
                }
            )

    reduced = pts.mapInPandas(local_sky, schema=sk_schema)
    g = reduced.groupBy("price").agg(F.min("size").alias("ms"))
    w = W.orderBy(F.col("price").asc()).rowsBetween(W.unboundedPreceding, -1)
    return (
        g.withColumn("rm", F.min("ms").over(w))
        .filter(F.col("rm").isNull() | (F.col("ms") < F.col("rm")))
        .select("price", "ms")
    )


@register(
    "pareto_skyline_parts",
    """
    SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_name,
           p.p_retailprice, CAST(p.p_size AS INT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    """,
)
def pareto_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query — the preference-query operator
    class (Börzsönyi et al. 2001): parts not dominated on the
    (cheaper retail price, smaller size) criteria pair; coordinate ties
    survive (identical points do not dominate each other), matching the
    NOT-EXISTS definition the oracle states directly.

    Distributed shape (the classic two-phase skyline): phase 1 computes
    each Arrow batch's EXACT local skyline coordinates vectorized in
    pandas (sort by price, per-price min size, exclusive running min) —
    map-only, and every globally-dominated point is dominated by some
    local skyline point, so the union is a lossless superset; phase 2
    re-runs the same recurrence on the reduced coordinate set (per-price
    min + one exclusive running-min window over the already-tiny
    distinct-price frame — for 2-D criteria the frontier is the
    monotone staircase, so no quadratic dominance join is ever needed);
    the final frame is one broadcast coordinate join back to the dim.
    The only unpartitioned window runs over phase-1 survivors, bounded
    by the frontier size times the partition count, not the table."""
    p = table(spark, sf_dir, "part")
    coords = _skyline_coords(p.select("p_retailprice", "p_size"))
    return (
        p.join(
            F.broadcast(coords),
            (F.col("p_retailprice") == F.col("price"))
            & (F.col("p_size").cast("double") == F.col("ms")),
        )
        .select(
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            "p_name",
            "p_retailprice",
            F.col("p_size").cast("int").alias("p_size"),
        )
    )


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "column_profile_lineitem",
    f"""
    WITH s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             {", ".join(
                 f'''CAST(COUNT({c}) AS BIGINT) AS nn_{c},
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c},
             MIN({c}) AS mn_{c}, MAX({c}) AS mx_{c}''' for c in _PROFILE_COLS
             )}
      FROM lineitem
    )
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS column_name, n_rows,
               CAST(n_rows - nn_{c} AS BIGINT) AS n_nulls,
               nd_{c} AS n_distinct, mn_{c} AS min_value, mx_{c} AS max_value
        FROM s''' for c in _PROFILE_COLS
    )}
    """,
)
def column_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile — the constraint-suite primitive of
    data-quality frameworks (Deequ / Great Expectations): per measure
    column of the fact table, row count, null count, exact distinct
    count, min and max — the statistics a completeness/uniqueness/
    range check asserts against before a load is accepted (the
    data-plane face of the reference's per-batch MAXERROR budget).

    Scale: ONE fact scan computes every per-column aggregate except
    the distincts; each COUNT(DISTINCT) runs as its own two-phase
    aggregate and the (1-row each) results join back — never mixed
    into one Expand (the established Catalyst trap), never more than
    {len(_PROFILE_COLS)} + 1 single-row frames. Output is one row per
    profiled column (the unpivot of the 1-row stats frame)."""
    li = table(spark, sf_dir, "lineitem")
    base_aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for c in _PROFILE_COLS:
        base_aggs += [
            F.count(c).cast("bigint").alias(f"nn_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    stats = li.agg(*base_aggs)
    for c in _PROFILE_COLS:
        nd = li.agg(F.countDistinct(c).cast("bigint").alias(f"nd_{c}"))
        stats = stats.crossJoin(F.broadcast(nd))
    rows = [
        stats.select(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).cast("bigint").alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_value"),
            F.col(f"mx_{c}").alias("max_value"),
        )
        for c in _PROFILE_COLS
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _skyline3d_coords(pts: DataFrame) -> DataFrame:
    """Frontier coordinates of a (p MIN, x MIN, d MAX) criteria triple —
    the 3-D generalization of _skyline_coords, shared by
    pareto_skyline_lineitem_3d (batch) and the 3-D incremental frontier
    store. In 3-D the frontier is no longer a monotone staircase, so the
    2-D running-min recurrence does not apply; the standard two-phase
    shape is: phase 1 = EXACT local frontier per Arrow batch (map-only
    — per-(x, d) cell min-p first, which is exact because a same-cell
    higher p is strictly dominated, then the vectorized O(k²) dominance
    matrix over the cell representatives); phase 2 = distinct over the
    phase-1 survivor union (a lossless superset of the global frontier:
    every globally-dominated point has a dominator inside its own batch
    frontier, by transitivity) followed by the dominance LEFT-ANTI
    self-join on that reduced set — broadcast, since the survivor union
    is bounded by partitions × local-frontier size, never the table."""
    from pyspark.sql import types as T

    sk_schema = T.StructType(
        [
            T.StructField("p", T.DoubleType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("d", T.DoubleType()),
        ]
    )

    def local_sky(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            g = (
                pdf[["p", "x", "d"]]
                .drop_duplicates()
                .groupby(["x", "d"], as_index=False)["p"]
                .min()
            )
            arr = g[["p", "x", "d"]].to_numpy(dtype="float64")
            P, X, D = arr[:, 0:1], arr[:, 1:2], arr[:, 2:3]
            # dom[i, j] = point j dominates point i (≤/≤/≥ with one
            # strict). The dominator axis is CHUNKED so memory stays
            # k × 4096 booleans however near-continuous the criteria
            # get (an unchunked k² matrix is ~100 MB at the default
            # 10k-row Arrow batch; the frontier store reuses this
            # helper on snapshot ∪ batch unions) — ADVICE r13.
            k = arr.shape[0]
            dominated = np.zeros(k, dtype=bool)
            for lo in range(0, k, 4096):
                Pj = P[lo : lo + 4096].T
                Xj = X[lo : lo + 4096].T
                Dj = D[lo : lo + 4096].T
                dom = (
                    (Pj <= P)
                    & (Xj <= X)
                    & (Dj >= D)
                    & ((Pj < P) | (Xj < X) | (Dj > D))
                )
                dominated |= dom.any(axis=1)
            keep = arr[~dominated]
            yield pd.DataFrame({"p": keep[:, 0], "x": keep[:, 1], "d": keep[:, 2]})

    reduced = pts.select(
        F.col("p").cast("double").alias("p"),
        F.col("x").cast("double").alias("x"),
        F.col("d").cast("double").alias("d"),
    ).mapInPandas(local_sky, schema=sk_schema)
    surv = reduced.distinct()
    s, q = surv.alias("s"), surv.alias("q")
    return s.join(
        F.broadcast(q),
        (F.col("q.p") <= F.col("s.p"))
        & (F.col("q.x") <= F.col("s.x"))
        & (F.col("q.d") >= F.col("s.d"))
        & (
            (F.col("q.p") < F.col("s.p"))
            | (F.col("q.x") < F.col("s.x"))
            | (F.col("q.d") > F.col("s.d"))
        ),
        "left_anti",
    )


_SKY3D_ORACLE = """
    WITH c AS (
      SELECT l_tax AS x, l_discount AS d, MIN(l_extendedprice) AS p
      FROM lineitem GROUP BY 1, 2
    ),
    f AS (
      SELECT * FROM c t WHERE NOT EXISTS (
        SELECT 1 FROM c q
        WHERE q.p <= t.p AND q.x <= t.x AND q.d >= t.d
          AND (q.p < t.p OR q.x < t.x OR q.d > t.d)
      )
    )
    SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l.l_linenumber AS INT) AS l_linenumber,
           l.l_extendedprice, l.l_discount, l.l_tax
    FROM lineitem l
    JOIN f ON l.l_extendedprice = f.p AND l.l_tax = f.x AND l.l_discount = f.d
    """


@register("pareto_skyline_lineitem_3d", _SKY3D_ORACLE)
def pareto_skyline_lineitem_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-criteria skyline over the FACT table — line items not
    dominated on (cheaper extended price, lower tax, higher discount).
    The round-12 skyline covered the 2-D case, whose frontier is a
    monotone staircase; with a third criterion that recurrence no
    longer exists, so this entry implements the general shape the
    preference-query literature prescribes (Börzsönyi et al. 2001):
    local-frontier reduction per Arrow batch + dominance left-anti
    self-join on the reduced survivor set (see _skyline3d_coords).

    Oracle: the NOT-EXISTS dominance definition applied to the
    per-(tax, discount) cell minimum-price representatives — an exact
    reduction, because any row above its cell's minimum price is
    strictly dominated by that minimum (equal tax, equal discount,
    strictly cheaper), so the frontier of the cells IS the frontier of
    the table; the join-back restores every line item (duplicates
    included) carrying a frontier triple.

    Scale: phase 1 is map-only over the fact scan (3 columns read);
    the anti-join and the join-back both broadcast frames bounded by
    the frontier/survivor size, not the table — the single wide-table
    pass a 100 TB preference query needs."""
    li = table(spark, sf_dir, "lineitem")
    coords = _skyline3d_coords(
        li.select(
            F.col("l_extendedprice").alias("p"),
            F.col("l_tax").alias("x"),
            F.col("l_discount").alias("d"),
        )
    )
    return (
        li.join(
            F.broadcast(coords),
            (F.col("l_extendedprice") == F.col("p"))
            & (F.col("l_tax") == F.col("x"))
            & (F.col("l_discount") == F.col("d")),
        )
        .select(
            F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
            F.col("l_linenumber").cast("int").alias("l_linenumber"),
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
    )


# ---- Interval overlap join ------------------------------------------------
INCIDENT_GAP_US = 5 * 60 * 1_000_000  # error burst: gap > 5 min splits
IOJ_SESSION_GAP_US = 30 * 60 * 1_000_000  # session: gap > 30 min splits
IOJ_BUCKET_US = 3_600 * 1_000_000  # 1-hour grid for the bucketized join
_US_PER_DAY = 86_400 * 1_000_000


def _ioj_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             epoch_us(ts) // {_US_PER_DAY} AS day
      FROM events
    ),
    sg AS (
      SELECT user_id, us, event_id,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > {IOJ_SESSION_GAP_US} THEN 1
                  ELSE 0 END AS ns
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
    ),
    s1 AS (
      SELECT user_id, us,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM sg
    ),
    sessions AS (
      SELECT user_id, sid, MIN(us) AS s_start, MAX(us) AS s_end
      FROM s1 GROUP BY user_id, sid
    ),
    eg AS (
      SELECT day, us, event_id,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > {INCIDENT_GAP_US} THEN 1
                  ELSE 0 END AS ni
      FROM e WHERE event_type = 'error'
      WINDOW w AS (PARTITION BY day ORDER BY us ASC, event_id ASC)
    ),
    i1 AS (
      SELECT day, us,
             SUM(ni) OVER (PARTITION BY day ORDER BY us ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS iid
      FROM eg
    ),
    incidents AS (
      SELECT day, iid, MIN(us) AS i_start, MAX(us) AS i_end,
             COUNT(*) AS n_errors
      FROM i1 GROUP BY day, iid
    )
    SELECT CAST(s.user_id AS BIGINT) AS user_id,
           CAST(s.sid AS BIGINT) AS session_id,
           CAST(i.i_start AS BIGINT) AS incident_start_us,
           CAST(i.i_end AS BIGINT) AS incident_end_us,
           CAST(i.n_errors AS BIGINT) AS n_errors,
           CAST(least(s.s_end, i.i_end) - greatest(s.s_start, i.i_start)
                AS BIGINT) AS overlap_us
    FROM sessions s
    JOIN incidents i
      ON s.s_start <= i.i_end AND i.i_start <= s.s_end
    """


@register("interval_overlap_incidents", _ioj_oracle())
def interval_overlap_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL OVERLAP JOIN — the temporal-join class the equi/range/
    as-of rows don't cover: which user sessions (gaps-and-islands
    intervals, 30-min gap) were exposed to platform incidents
    (day-scoped error-burst intervals, 5-min gap)? Spark has no native
    interval join; the naive form is a cross join with an overlap
    predicate, which at 100 TB is quadratic.

    Physical strategy (the textbook distributed interval join): both
    interval sets explode onto a fixed 1-hour time grid (an interval
    covering k buckets emits k rows — bounded by duration/bucket, not
    by the other side), the join runs as a plain EQUI-join on the
    bucket key, the exact overlap predicate filters, and each
    overlapping pair is emitted EXACTLY ONCE without any distinct: a
    pair survives only in the bucket containing max(start_a, start_b)
    — the dedup-free emit-once trick. The oracle states the semantic
    definition directly (interval join with no grid), so the hash gate
    proves grid+predicate == semantics.

    Everything is exact integer microseconds (unix_micros/epoch_us —
    both engines truncate the parquet NANOS the same way); the islands
    windows partition per user / per day (never global); incident
    detection is day-scoped by DESIGN (a burst crossing midnight
    splits — monitoring windows usually are, and it is what bounds the
    islands window at any scale)."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    base = ev.select(
        "user_id", "event_id", "event_type", us.alias("us")
    ).withColumn("day", F.expr(f"us div {_US_PER_DAY}"))
    order = [F.col("us").asc(), F.col("event_id").asc()]

    def islands(df: DataFrame, pkey: str, gap_us: int, idcol: str) -> DataFrame:
        w_lag = W.partitionBy(pkey).orderBy(*order)
        w_cum = (
            W.partitionBy(pkey)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        flag = F.when(
            F.lag("us").over(w_lag).isNull()
            | ((F.col("us") - F.lag("us").over(w_lag)) > gap_us),
            1,
        ).otherwise(0)
        return df.withColumn("_f", flag).withColumn(
            idcol, F.sum("_f").over(w_cum)
        )

    sessions = (
        islands(base, "user_id", IOJ_SESSION_GAP_US, "sid")
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_start"), F.max("us").alias("s_end"))
    )
    incidents = (
        islands(base.filter(F.col("event_type") == "error"), "day",
                INCIDENT_GAP_US, "iid")
        .groupBy("day", "iid")
        .agg(
            F.min("us").alias("i_start"),
            F.max("us").alias("i_end"),
            F.count("*").alias("n_errors"),
        )
    )
    s_g = sessions.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.expr(f"s_start div {IOJ_BUCKET_US}"),
                F.expr(f"s_end div {IOJ_BUCKET_US}"),
            )
        ),
    )
    i_g = incidents.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.expr(f"i_start div {IOJ_BUCKET_US}"),
                F.expr(f"i_end div {IOJ_BUCKET_US}"),
            )
        ),
    )
    pairs = (
        s_g.join(i_g, "bkt")
        .filter(
            (F.col("s_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("s_end"))
        )
        # emit-once: only the bucket holding max(s_start, i_start) keeps
        # the pair — no distinct over the pair set, ever.
        .filter(
            F.col("bkt")
            == F.expr(f"greatest(s_start, i_start) div {IOJ_BUCKET_US}")
        )
    )
    return pairs.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("sid").cast("bigint").alias("session_id"),
        F.col("i_start").cast("bigint").alias("incident_start_us"),
        F.col("i_end").cast("bigint").alias("incident_end_us"),
        F.col("n_errors").cast("bigint").alias("n_errors"),
        (F.least("s_end", "i_end") - F.greatest("s_start", "i_start"))
        .cast("bigint")
        .alias("overlap_us"),
    )


# ---- Personalized PageRank over the co-purchase graph --------------------
PPR_ITERS = 3
PPR_SCALE = 1_000_000
PPR_SEED_BRAND = "Brand#11"
_PPR_TELEPORT = (PPR_SCALE * 15) // 100  # per-seed integer teleport mass

_PPR_GRAPH_CTE = """
items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
halfedges AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
),
edges AS (
  SELECT src, dst, w FROM halfedges
  UNION ALL
  SELECT dst AS src, src AS dst, w FROM halfedges
),
outdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
seeds AS (
  SELECT n.node, CASE WHEN p.p_brand = '{brand}' THEN 1 ELSE 0 END AS is_seed
  FROM nodes n JOIN part p ON p.p_partkey = n.node
)
"""


def _ppr_oracle(iters: int) -> str:
    parts = [
        f"r0 AS (SELECT node, CAST(is_seed * {PPR_SCALE} AS BIGINT) AS r"
        " FROM seeds)"
    ]
    for t in range(iters):
        parts.append(
            f"""r{t + 1} AS (
      SELECT sd.node,
             sd.is_seed * {_PPR_TELEPORT}
               + (85 * coalesce(s.contrib, 0)) // 100 AS r
      FROM seeds sd LEFT JOIN (
        SELECT e.dst AS node, CAST(SUM((p.r * e.w) // o.wout) AS BIGINT) AS contrib
        FROM edges e
        JOIN r{t} p ON p.node = e.src
        JOIN outdeg o ON o.src = e.src
        GROUP BY e.dst
      ) s ON s.node = sd.node
    )"""
        )
    chained = ",\n    ".join(parts)
    graph = _PPR_GRAPH_CTE.format(brand=PPR_SEED_BRAND)
    return f"""
    WITH {graph},
    {chained}
    SELECT CAST(node AS BIGINT) AS p_partkey, CAST(r AS BIGINT) AS ppr_q
    FROM r{iters} WHERE r > 0
    """


@register("ppr_copurchase_parts", _ppr_oracle(PPR_ITERS))
def ppr_copurchase_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank over the part co-purchase graph — the
    recommendation primitive ("parts relevant to {PPR_SEED_BRAND}
    buyers"): teleport mass lands only on the seed set (parts of one
    brand), {PPR_ITERS} damped propagation rounds spread it along
    co-purchase edges (distinct same-order part pairs, support-
    weighted, symmetrized). Complements pagerank_token_graph — same
    Pregel shape, but a PERSONALIZED teleport vector and a graph whose
    size grows with the FACT table (≈1.2 M directed edges at sf0.1),
    not a fixed vocabulary.

    Integer arithmetic end to end (the token-PageRank parity rules):
    {PPR_SCALE}-scaled int64 ranks, per-edge contribution
    (r·w) div w_out, damping (85·sum) div 100, per-seed teleport
    {_PPR_TELEPORT} — all positive integer division, so the unrolled
    oracle matches bit-for-bit. Unnormalized teleport (SCALE per seed)
    is the documented variant; zero-mass nodes are filtered so the
    output is the reached neighborhood, not the part dimension.

    Scale: the edge build is one fact self-join keyed on l_orderkey
    (order-bounded fan-out); each round is edges⋈ranks (shuffle on
    src) + a grouped sum (shuffle on dst) with map-side combine; state
    is one int per node. Seeds ride a broadcast-size dimension join."""
    p = table(spark, sf_dir, "part")
    # r18: edge build via the shared aggregate-then-expand builder
    # (guide §2.3/§2.4 — see _copurchase_pair_supports), served from
    # the session memo (_COPURCHASE_MEMO) like every family member.
    _, pe = _copurchase_frames(spark, sf_dir)
    half = pe.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"), "w"
    )
    edges = _mirror_pairs(half, "src", "dst", "src", "dst", ("w",))
    outdeg = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("wout"))
    # Materialize the per-round inputs once: the loop re-references
    # edges/outdeg/seeds every iteration, and without this each round
    # would replay the edge build (the bm25_prf rationale). NOTE
    # (r18 probe, see _lpa_frames): localCheckpoint does NOT preserve
    # partitioning info — the edge side avoids per-round shuffles via
    # the broadcast below, not via layout. The only per-round exchange
    # left is the groupBy(dst) transfer, which IS the propagation; an
    # in-plan repartition("dst") to elide it (the LPA C12 trick) was
    # measured a wash-to-loss at sf0.1 and 10x — it swaps a combined
    # partial-sum exchange for a full edge-list shuffle one-for-one.
    edges = edges.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    seeds = nodes.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        nodes.node == F.col("p_partkey"),
    ).select(
        "node",
        F.when(F.col("p_brand") == PPR_SEED_BRAND, 1).otherwise(0).alias("is_seed"),
    )
    seeds = seeds.localCheckpoint(eager=True)
    ranks = seeds.select(
        "node", (F.col("is_seed") * PPR_SCALE).cast("bigint").alias("r")
    )
    # r18 (guide §3.1, see GRAPH_BCAST_MAX_NODES): ranks and contribs
    # are node-grain — broadcast them so the only per-round exchange
    # left is the groupBy(dst) partial-sum transfer, which IS the
    # propagation. The edge list (checkpointed above) is never shuffled
    # inside the loop. Past the node cap the loop falls back to the
    # r17 shuffled-hash plan (hash the node-grain side, never sort the
    # edge list).
    bcast = seeds.count() <= GRAPH_BCAST_MAX_NODES
    for _ in range(PPR_ITERS):
        rk = F.broadcast(ranks) if bcast else ranks.hint("shuffle_hash")
        contribs = (
            edges.join(rk, edges["src"] == rk["node"])
            .select("dst", F.expr("(r * w) div wout").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("contrib"))
        )
        cb = F.broadcast(contribs) if bcast else contribs.hint("shuffle_hash")
        ranks = seeds.join(
            cb, seeds["node"] == cb["dst"], "left"
        ).select(
            "node",
            (
                F.col("is_seed") * F.lit(_PPR_TELEPORT)
                + F.expr("85 * coalesce(contrib, 0) div 100")
            )
            .cast("bigint")
            .alias("r"),
        )
    return ranks.filter(F.col("r") > 0).select(
        F.col("node").cast("bigint").alias("p_partkey"),
        F.col("r").alias("ppr_q"),
    )


@register(
    "weighted_median_price_by_nation",
    """
    WITH src AS (
      SELECT n.n_name AS nation, l.l_extendedprice AS price,
             CAST(l.l_quantity AS BIGINT) AS w
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    ),
    grains AS (
      SELECT nation, price, CAST(SUM(w) AS BIGINT) AS w
      FROM src GROUP BY nation, price
    ),
    cum AS (
      SELECT nation, price, w,
             CAST(SUM(w) OVER (PARTITION BY nation ORDER BY price
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c,
             CAST(SUM(w) OVER (PARTITION BY nation) AS BIGINT) AS tot
      FROM grains
    )
    SELECT nation,
           CAST(MAX(tot) AS BIGINT) AS total_weight,
           MIN(price) FILTER (WHERE 2 * c >= tot) AS weighted_median_price
    FROM cum
    GROUP BY nation
    """,
)
def weighted_median_price_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED MEDIAN — the order statistic the plain median family
    (exact percentiles, moving/banded medians) doesn't cover: per
    supplier nation, the quantity-weighted median extended price (the
    lower weighted median: smallest price whose cumulative weight
    reaches half the total — exact, no interpolation, so the DECIMAL
    price value itself is the answer and hash-compares bit-exactly).

    Scale: the fact rows collapse FIRST to (nation, price) grains
    (map-side combined — the window never sees raw lineitem), the
    running sum partitions by nation over the price-grain frame, and
    the final aggregate is nation-grain. For a group whose PRICE GRAIN
    itself outgrows a partition, the banded-ECDF machinery
    (ks_two_sample_scalable's distributed prefix sum) is the drop-in —
    the grain collapse makes that unnecessary at any realistic price
    cardinality."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # nation is constant-size (broadcast always); supplier grows with
    # SF — no hint, AQE picks broadcast at fixture scale and shuffle
    # join when the dim outgrows the threshold
    src = li.join(sup, li.l_suppkey == sup.s_suppkey).join(
        F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
    )
    grains = src.groupBy(F.col("n_name").alias("nation"), "price").agg(
        F.sum("w").cast("bigint").alias("w")
    )
    from pyspark.sql.window import Window as W

    wc = (
        W.partitionBy("nation")
        .orderBy(F.col("price").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = grains.select(
        "nation",
        "price",
        F.sum("w").over(wc).cast("bigint").alias("c"),
        F.sum("w").over(W.partitionBy("nation")).cast("bigint").alias("tot"),
    )
    return cum.groupBy("nation").agg(
        F.max("tot").cast("bigint").alias("total_weight"),
        F.min(F.when(2 * F.col("c") >= F.col("tot"), F.col("price"))).alias(
            "weighted_median_price"
        ),
    )


@register(
    "supplier_hhi_by_part_brand",
    """
    WITH rev AS (
      SELECT p.p_brand AS brand, l.l_suppkey AS suppkey,
             CAST(SUM(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand, l.l_suppkey
    ),
    tot AS (
      SELECT brand, CAST(SUM(rev_c) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers
      FROM rev GROUP BY brand
    )
    SELECT r.brand, t.n_suppliers, t.t AS total_rev_cents,
           CAST(SUM((r.rev_c * 10000 // t.t) * (r.rev_c * 10000 // t.t))
                AS BIGINT) AS hhi_pb
    FROM rev r JOIN tot t ON t.brand = r.brand
    GROUP BY r.brand, t.n_suppliers, t.t
    """,
)
def supplier_hhi_by_part_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL–HIRSCHMAN concentration index per part brand — the
    supply-risk complement of spend_gini_by_nation's inequality
    measure: per brand, each supplier's revenue share (basis points,
    integer) squared and summed. 10⁸ = a brand sourced from one
    supplier; low values = diversified supply. Shares quantize to
    basis points BEFORE squaring (rev·10⁴ // total — every
    intermediate < 2⁶³ at any revenue volume; cents themselves are
    exact DECIMAL→BIGINT), so the index is reproducible to the digit.

    Scale: one fact×part join collapsed to (brand, supplier) grains
    (map-side combined), then two brand-grain aggregates — nothing
    after the first groupBy exceeds catalog cardinality."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("rev_c"),
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(F.sum("rev_c").cast("bigint").alias("rev_c"))
    )
    tot = rev.groupBy("brand").agg(
        F.sum("rev_c").cast("bigint").alias("t"),
        F.count("*").cast("bigint").alias("n_suppliers"),
    )
    return (
        rev.join(tot, "brand")
        .groupBy("brand", "n_suppliers", F.col("t").alias("total_rev_cents"))
        .agg(
            F.expr("CAST(SUM((rev_c * 10000 div t) * (rev_c * 10000 div t)) AS BIGINT)")
            .alias("hhi_pb")
        )
    )
