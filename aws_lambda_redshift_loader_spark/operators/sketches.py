"""Deterministic sketch operators (count-min, Bloom) — the streaming/
join-pruning primitives a 100 TB pipeline leans on, built on the
cross-engine md5 hash so every counter and bit reproduces identically in
the DuckDB oracle (engine-native sketch functions — approx_percentile,
bloom_filter_agg, HLL — are register-format-specific and can never be
hash-verified; these can).

Related: kmv_distinct_estimate (operators.relational) is the
distinct-count member of this family; approx_distinct keeps the native
HLL form as the rows-only engine-specific comparison point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.scalar import hex_hash64, norm_text
from ..plans.registry import register
from ..session import table

CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 256  # counters per row
CMS_TOP = 20  # heavy hitters reported

# DuckDB fragment: md5-derived 60-bit hash of (salt || ':' || key) % width.
def _duck_bucket(salt: str, key: str, width: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('{salt}', ':', {key})), 1, 15)) AS BIGINT)"
        f" % {width}"
    )


@register(
    "heavy_hitters_cms",
    f"""
    WITH tokens AS (
      SELECT u.token
      FROM (SELECT string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
            FROM documents),
           LATERAL (SELECT unnest(ws) AS token) u
    ),
    cms AS (
      SELECT d.i, {_duck_bucket("' || d.i || '", "tokens.token", CMS_WIDTH)} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM tokens, (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS i) d
      GROUP BY d.i, bucket
    ),
    exact AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM tokens GROUP BY token
    ),
    est AS (
      SELECT e.token, e.exact_count, MIN(cms.c) AS cms_estimate
      FROM exact e,
           (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS i) d
      JOIN cms ON cms.i = d.i
             AND cms.bucket = {_duck_bucket("' || d.i || '", "e.token", CMS_WIDTH)}
      GROUP BY e.token, e.exact_count
    )
    SELECT token, exact_count, cms_estimate, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY cms_estimate DESC, token ASC) AS rank
      FROM est
    ) WHERE rank <= {CMS_TOP}
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (Cormode/Muthukrishnan 2005):
    {CMS_DEPTH} md5-salted hash rows × {CMS_WIDTH} counters; a key's
    estimate is the MIN of its {CMS_DEPTH} counters (never an
    underestimate). Reported next to the exact count so the collision
    overestimate is visible. Unlike engine-native sketches, every counter
    here is reproducible anywhere — the oracle rebuilds the identical
    sketch and the driver hash-gates it.

    Scale: sketch state is DEPTH×WIDTH counters regardless of stream
    length — THE skew detector for a 100 TB shuffle (find hot keys
    before salting); building it is one groupBy over (row, bucket) with
    map-side combine, so the shuffle carries at most DEPTH×WIDTH rows
    per partition.

    r18 (guide §2.4): the corpus is tokenized+hashed exactly ONCE — the
    token-grain exact aggregate (which this self-auditing form needs
    anyway) is checkpointed and the counters derive from it by the
    grouping identity (_cms_from_exact); before, the counter union and
    the probe branches re-ran the tokenize subtree ~8×."""
    d = table(spark, sf_dir, "documents")
    tokens = d.select(F.explode(F.split(norm_text("text"), " ")).alias("token"))
    wb = _token_buckets(tokens)
    exact = (
        wb.groupBy("token", *[f"b{i}" for i in range(CMS_DEPTH)])
        .agg(F.count("*").cast("bigint").alias("exact_count"))
        .localCheckpoint(eager=True)
    )
    return _cms_report(tokens, _cms_from_exact(exact), exact=exact)


def _token_buckets(tokens: DataFrame) -> DataFrame:
    """(token) frame → (token, b0..b{CMS_DEPTH-1}) salted bucket ids —
    the shared hash geometry of the token CMS family."""
    return tokens.select(
        "token",
        *[
            (hex_hash64(F.col("token"), salt=f"{i}:") % CMS_WIDTH).alias(f"b{i}")
            for i in range(CMS_DEPTH)
        ],
    )


def _cms_of(tokens: DataFrame) -> DataFrame:
    """(token) frame → count-min counters (i, bucket, c). Linear in the
    input (pure counter sums), so per-shard/per-epoch sketches built
    with this merge EXACTLY by adding counters per (i, bucket) — the
    property the streaming CMS store's hash gate proves.

    r18 (guide §2.4): ONE pass — the {CMS_DEPTH} per-depth groupBys used
    to ride a union whose branches each re-ran the tokenize+hash subtree
    (4 full corpus passes); exploding the (i, bucket) pairs map-side
    feeds a single map-side-combined aggregate with the identical
    multiset of keys, so the counters are value-identical."""
    wb = _token_buckets(tokens)
    pairs = wb.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), F.col(f"b{i}").alias("bucket")
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("ib")
    )
    return (
        pairs.groupBy(
            F.col("ib.i").alias("i"), F.col("ib.bucket").alias("bucket")
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .select("i", "bucket", "c")
    )


def _cms_from_exact(exact: DataFrame) -> DataFrame:
    """(token, b0.., exact_count) frame → the SAME (i, bucket, c)
    counters _cms_of builds: c(i, bucket) = Σ exact_count over tokens
    hashing there, which equals count(*) over the raw token stream by
    the grouping identity. Lets the batch report derive the sketch from
    the one token-grain aggregate instead of re-scanning the corpus
    (r18, guide §2.4)."""
    pairs = exact.select(
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), F.col(f"b{i}").alias("bucket")
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("ib"),
    )
    return (
        pairs.groupBy(
            F.col("ib.i").alias("i"), F.col("ib.bucket").alias("bucket")
        )
        .agg(F.sum("exact_count").cast("bigint").alias("c"))
        .select("i", "bucket", "c")
    )


def _cms_report(
    tokens: DataFrame, cms: DataFrame, exact: DataFrame | None = None
) -> DataFrame:
    """Heavy-hitters report: exact per-token counts (the audit side)
    joined against a (i, bucket, c) counter frame, estimate = MIN over
    the token's {CMS_DEPTH} counters, top-{CMS_TOP}. Shared by the
    batch sketch and the streaming counter store (whose cms frame is
    the additive merge of per-epoch sketches).

    r18: the cms frame is ≤ DEPTH×WIDTH rows by construction but its
    subtree used to be re-evaluated once per broadcast probe (4×) —
    localCheckpoint materializes it once (guide §5 lineage cut on a
    bounded frame). Callers that already hold the token-grain exact
    aggregate pass it in so the corpus is scanned exactly once."""
    if exact is None:
        wb = _token_buckets(tokens)
        exact = wb.groupBy("token", *[f"b{i}" for i in range(CMS_DEPTH)]).agg(
            F.count("*").cast("bigint").alias("exact_count")
        )
    cms = cms.localCheckpoint(eager=True)
    est = exact
    for i in range(CMS_DEPTH):
        row_i = cms.filter(F.col("i") == i).select(
            F.col("bucket").alias(f"rb{i}"), F.col("c").alias(f"c{i}")
        )
        est = est.join(F.broadcast(row_i), est[f"b{i}"] == row_i[f"rb{i}"])
    estimate = F.least(*[F.col(f"c{i}") for i in range(CMS_DEPTH)])
    scored = est.select("token", "exact_count", estimate.alias("cms_estimate"))
    w = W.orderBy(F.col("cms_estimate").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= CMS_TOP)
        .select("token", "exact_count", "cms_estimate", "rank")
    )


CMS_CAND_DOCS = 50  # bounded candidate-sample size for the sketch-only form


@register(
    "heavy_hitters_cms_only",
    f"""
    WITH tokens AS (
      SELECT u.token
      FROM (SELECT string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
            FROM documents),
           LATERAL (SELECT unnest(ws) AS token) u
    ),
    cms AS (
      SELECT d.i, {_duck_bucket("' || d.i || '", "tokens.token", CMS_WIDTH)} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM tokens, (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS i) d
      GROUP BY d.i, bucket
    ),
    candidates AS (
      SELECT DISTINCT u.token
      FROM (SELECT string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
            FROM documents WHERE doc_id < {CMS_CAND_DOCS}),
           LATERAL (SELECT unnest(ws) AS token) u
    ),
    est AS (
      SELECT e.token, MIN(cms.c) AS cms_estimate
      FROM candidates e,
           (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS i) d
      JOIN cms ON cms.i = d.i
             AND cms.bucket = {_duck_bucket("' || d.i || '", "e.token", CMS_WIDTH)}
      GROUP BY e.token
    )
    SELECT token, cms_estimate, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY cms_estimate DESC, token ASC) AS rank
      FROM est
    ) WHERE rank <= {CMS_TOP}
    """,
)
def heavy_hitters_cms_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters, production shape: the full corpus touches ONLY the
    sketch (groupBy bucket with map-side combine — the shuffle carries at
    most {CMS_DEPTH}×{CMS_WIDTH} rows per map partition, bounded by
    construction regardless of corpus size). Candidate keys come from a
    bounded sample (the first {CMS_CAND_DOCS} documents — partition-
    prunable on doc_id) and are scored by probing the sketch; unlike
    `heavy_hitters_cms` there is NO exact per-token groupBy anywhere in
    the plan — that exact side is the very cost CMS exists to avoid, and
    the companion query keeps it only as a self-auditing check.

    Estimates are upward-biased by collisions (CMS guarantee: never an
    underestimate), and the candidate sample bounds recall — both are the
    documented trade of the sketch."""
    d = table(spark, sf_dir, "documents")
    tokens = d.select(F.explode(F.split(norm_text("text"), " ")).alias("token"))
    # r18 (guide §2.4): one corpus pass for all {CMS_DEPTH} counter rows
    # (map-side (i, bucket) explode in _cms_of), checkpointed so the
    # per-depth broadcast probes below scan the bounded materialized
    # counters instead of each re-running a full tokenize pass.
    cms = _cms_of(tokens).localCheckpoint(eager=True)
    candidates = (
        d.filter(F.col("doc_id") < CMS_CAND_DOCS)
        .select(F.explode(F.split(norm_text("text"), " ")).alias("token"))
        .distinct()
    )
    est = candidates
    for i in range(CMS_DEPTH):
        row_i = cms.filter(F.col("i") == i).select(
            F.col("bucket").alias(f"rb{i}"), F.col("c").alias(f"c{i}")
        )
        # The CMS rows are bounded (DEPTH×WIDTH) — broadcast is safe at
        # any corpus size, unlike a per-key aggregate.
        est = est.join(
            F.broadcast(row_i),
            (hex_hash64(F.col("token"), salt=f"{i}:") % CMS_WIDTH) == row_i[f"rb{i}"],
        )
    estimate = F.least(*[F.col(f"c{i}") for i in range(CMS_DEPTH)])
    scored = est.select("token", estimate.alias("cms_estimate"))
    w = W.orderBy(F.col("cms_estimate").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= CMS_TOP)
        .select("token", "cms_estimate", "rank")
    )


BLOOM_M = 4096  # bits
BLOOM_K = 3  # hash functions


@register(
    "bloom_filter_probe",
    f"""
    WITH build_keys AS (SELECT DISTINCT o_custkey AS k FROM orders),
    bloom AS (
      SELECT DISTINCT {_duck_bucket("' || j.j || '", "build_keys.k", BLOOM_M)} AS pos
      FROM build_keys, (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j) j
    ),
    probe_keys AS (
      SELECT c_custkey FROM customer
      UNION ALL
      SELECT c_custkey + 1000000 FROM customer
    ),
    probe AS (
      SELECT c.c_custkey,
             c.c_custkey IN (SELECT k FROM build_keys) AS is_member,
             (SELECT COUNT(*)
              FROM (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j) j
              WHERE {_duck_bucket("' || j.j || '", "c.c_custkey", BLOOM_M)}
                    IN (SELECT pos FROM bloom)) = {BLOOM_K} AS bloom_positive
      FROM probe_keys c
    )
    SELECT is_member, bloom_positive, CAST(COUNT(*) AS BIGINT) AS n_probed
    FROM probe GROUP BY is_member, bloom_positive
    """,
)
def bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pre-filter, hand-rolled on the cross-engine md5
    hash ({BLOOM_K} salted positions in {BLOOM_M} bits) so the oracle
    reproduces every bit (Spark's native bloom_filter_agg is
    format-specific). Builds over orders' customer keys, probes every
    customer, and emits the 2×2 (is_member × bloom_positive) confusion
    matrix — the (member, not-positive) cell MUST be absent (Bloom
    filters have no false negatives; the driver hash check enforces it),
    and the false-positive cell quantifies the {BLOOM_M}-bit sizing.

    Scale: this is the semi-join pre-filter for shuffle pruning — build
    side reduces to ≤{BLOOM_M} bit positions (broadcastable at any build
    cardinality), probe is map-only; rows failing the bloom never enter
    the join shuffle."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    build = o.select(F.col("o_custkey").alias("k")).distinct()
    pos = None
    for j in range(BLOOM_K):
        pj = build.select((hex_hash64(F.col("k"), salt=f"{j}:") % BLOOM_M).alias("pos"))
        pos = pj if pos is None else pos.unionByName(pj)
    bloom = pos.distinct()
    # Probe every customer PLUS a shifted copy guaranteed absent from the
    # build side, so all reachable confusion-matrix cells are exercised.
    probe_keys = c.select("c_custkey").unionByName(
        c.select((F.col("c_custkey") + 1_000_000).alias("c_custkey"))
    )
    probe = probe_keys.select(
        "c_custkey",
        *[
            (hex_hash64(F.col("c_custkey"), salt=f"{j}:") % BLOOM_M).alias(f"p{j}")
            for j in range(BLOOM_K)
        ],
    )
    for j in range(BLOOM_K):
        bj = bloom.select(F.col("pos").alias(f"bp{j}"))
        probe = probe.join(
            F.broadcast(bj), probe[f"p{j}"] == bj[f"bp{j}"], "left"
        ).withColumn(f"hit{j}", F.col(f"bp{j}").isNotNull())
    bloom_positive = F.expr(" AND ".join(f"hit{j}" for j in range(BLOOM_K)))
    # Ground-truth membership: plain keyed left join against the distinct
    # build keys — NO broadcast hint (build cardinality is unbounded;
    # forcing a driver collect+broadcast of it is the 100 TB OOM the
    # bloom filter itself exists to avoid). AQE picks the strategy from
    # runtime stats.
    membership = build.select(F.col("k").alias("c_custkey")).withColumn(
        "is_member_flag", F.lit(True)
    )
    out = (
        probe.join(membership, "c_custkey", "left")
        .select(
            F.coalesce(F.col("is_member_flag"), F.lit(False)).alias("is_member"),
            bloom_positive.alias("bloom_positive"),
        )
        .groupBy("is_member", "bloom_positive")
        .agg(F.count("*").cast("bigint").alias("n_probed"))
    )
    return out


# ---- Join-size estimation via CMS inner product -------------------------
# (Alon-Matias-Szegedy second moment / Cormode-Muthukrishnan inner
# product): the self-join size on a key — SUM over keys of cnt(k)^2 —
# estimated from a count-min sketch alone as the MIN over hash rows of
# the row's inner product with itself. This is what a cost-based
# optimizer consults before picking a join strategy: the sketch is
# mergeable, O(depth x width) state, and never underestimates.
F2_SLACK = 2  # bound: est <= exact + F2_SLACK * N^2 / width (checked)


@register(
    "selfjoin_size_estimate",
    f"""
    WITH keys AS (SELECT user_id AS k FROM events),
    cms AS (
      SELECT d.i, {_duck_bucket("f2' || d.i || '", "keys.k", CMS_WIDTH)} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM keys, (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS i) d
      GROUP BY d.i, bucket
    ),
    per_row AS (
      SELECT i, CAST(SUM(c * c) AS BIGINT) AS est FROM cms GROUP BY i
    ),
    est AS (SELECT MIN(est) AS cms_estimate FROM per_row),
    exact AS (
      SELECT CAST(SUM(n * n) AS BIGINT) AS exact_f2,
             CAST(SUM(n) AS BIGINT) AS n_rows
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keys GROUP BY k)
    )
    SELECT exact_f2, cms_estimate, n_rows,
           cms_estimate >= exact_f2
           AND cms_estimate - exact_f2 <= ({F2_SLACK} * n_rows * n_rows) // {CMS_WIDTH}
             AS within_bound
    FROM exact, est
    """,
)
def selfjoin_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join cardinality on events.user_id from a count-min sketch
    (see block comment): exact F2 = SUM cnt(k)^2, estimate = MIN over
    the {CMS_DEPTH} hash rows of SUM c^2 — never an underestimate, and
    the sketch-only path touches {CMS_DEPTH}x{CMS_WIDTH} counters
    instead of the key dictionary. The within_bound column asserts the
    CMS inner-product contract (overshoot <= {F2_SLACK} N^2/width on
    this fixture) the same way the HLL/percentile sketches are gated:
    exact values plus a boolean the oracle reproduces.

    Scale: the sketch build is one map-side-combined groupBy on
    (row, bucket) — bounded width regardless of key cardinality — and
    the exact audit side is the one key-grain aggregate; production
    drops the audit and keeps the O(1)-state estimator."""
    ev = table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    rows = ev.select(
        F.posexplode(
            F.array(
                *[
                    (hex_hash64(F.col("k"), salt=f"f2{i}:") % CMS_WIDTH)
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("i", "bucket")
    )
    per_row = (
        rows.groupBy("i", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("est"))
    )
    est = per_row.agg(F.min("est").alias("cms_estimate"))
    exact = (
        ev.groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n"))
        .agg(
            F.sum(F.col("n") * F.col("n")).cast("bigint").alias("exact_f2"),
            F.sum("n").cast("bigint").alias("n_rows"),
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_f2",
        "cms_estimate",
        "n_rows",
        (
            (F.col("cms_estimate") >= F.col("exact_f2"))
            & (
                F.col("cms_estimate") - F.col("exact_f2")
                <= F.expr(f"({F2_SLACK} * n_rows * n_rows) div {CMS_WIDTH}")
            )
        ).alias("within_bound"),
    )


@register(
    "join_size_estimate_cms",
    f"""
    WITH ck AS (SELECT user_id AS k FROM events WHERE event_type = 'click'),
    vk AS (SELECT user_id AS k FROM events WHERE event_type = 'view'),
    cms_c AS (
      SELECT d.i, {_duck_bucket("j2' || d.i || '", "ck.k", CMS_WIDTH)} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM ck, (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS i) d
      GROUP BY d.i, bucket
    ),
    cms_v AS (
      SELECT d.i, {_duck_bucket("j2' || d.i || '", "vk.k", CMS_WIDTH)} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM vk, (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS i) d
      GROUP BY d.i, bucket
    ),
    per_row AS (
      SELECT a.i, CAST(SUM(a.c * b.c) AS BIGINT) AS est
      FROM cms_c a JOIN cms_v b ON b.i = a.i AND b.bucket = a.bucket
      GROUP BY a.i
    ),
    est AS (SELECT MIN(est) AS cms_estimate FROM per_row),
    exact AS (
      SELECT CAST(COALESCE(SUM(c.n * v.n), 0) AS BIGINT) AS exact_size,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ck) AS n_click,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM vk) AS n_view
      FROM (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM ck GROUP BY k) c
      JOIN (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM vk GROUP BY k) v
        ON v.k = c.k
    )
    SELECT exact_size, cms_estimate, n_click, n_view,
           cms_estimate >= exact_size
           AND cms_estimate - exact_size
               <= ({F2_SLACK} * n_click * n_view) // {CMS_WIDTH} AS within_bound
    FROM exact, est
    """,
)
def join_size_estimate_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table join-size estimation from two count-min sketches (the
    Cormode-Muthukrishnan inner product, generalizing
    selfjoin_size_estimate): |clicks JOIN views ON user_id| =
    SUM over users of c_u * v_u — what an optimizer needs before
    choosing the funnel join's strategy — estimated as the MIN over
    hash rows of the two sketches' inner product. Sketches are built
    independently per stream (mergeable, O(depth x width) each), never
    meet at key grain, and never underestimate; within_bound asserts
    the {F2_SLACK} * N_c * N_v / width overshoot contract the oracle
    reproduces.

    Scale: two bounded-width groupBys (no key-cardinality state), a
    {CMS_DEPTH}x{CMS_WIDTH}-row sketch join, and the exact audit join
    that production would drop."""
    ev = table(spark, sf_dir, "events")
    ck = ev.filter(F.col("event_type") == "click").select(F.col("user_id").alias("k"))
    vk = ev.filter(F.col("event_type") == "view").select(F.col("user_id").alias("k"))

    def cms(keys: DataFrame) -> DataFrame:
        return (
            keys.select(
                F.posexplode(
                    F.array(
                        *[
                            (hex_hash64(F.col("k"), salt=f"j2{i}:") % CMS_WIDTH)
                            for i in range(CMS_DEPTH)
                        ]
                    )
                ).alias("i", "bucket")
            )
            .groupBy("i", "bucket")
            .agg(F.count("*").cast("bigint").alias("c"))
        )

    per_row = (
        cms(ck)
        .alias("a")
        .join(cms(vk).alias("b"), ["i", "bucket"])
        .groupBy("i")
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("bigint").alias("est"))
    )
    est = per_row.agg(F.min("est").alias("cms_estimate"))
    cpu = ck.groupBy("k").agg(F.count("*").cast("bigint").alias("cn"))
    vpu = vk.groupBy("k").agg(F.count("*").cast("bigint").alias("vn"))
    exact = (
        cpu.join(vpu, "k")
        .agg(F.coalesce(F.sum(F.col("cn") * F.col("vn")), F.lit(0)).cast("bigint").alias("exact_size"))
        .crossJoin(F.broadcast(ck.agg(F.count("*").cast("bigint").alias("n_click"))))
        .crossJoin(F.broadcast(vk.agg(F.count("*").cast("bigint").alias("n_view"))))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_size",
        "cms_estimate",
        "n_click",
        "n_view",
        (
            (F.col("cms_estimate") >= F.col("exact_size"))
            & (
                F.col("cms_estimate") - F.col("exact_size")
                <= F.expr(f"({F2_SLACK} * n_click * n_view) div {CMS_WIDTH}")
            )
        ).alias("within_bound"),
    )


# ---- KMV sketch set algebra ----------------------------------------------
# The k-minimum-values sketch supports UNION and INTERSECTION estimation
# (Beyer et al., "On synopses for distinct-value estimation under
# multiset operations"): merge two sketches by taking the k smallest of
# their union; rho = how many of those k live in BOTH input sketches
# estimates the Jaccard, and intersection ~= (rho/k) * union_estimate.
# Every intermediate is md5-integer deterministic, so unlike HLL the
# whole algebra hash-verifies cross-engine.
OVERLAP_K = 256  # per-set sketch size; rel. error ~ 1/sqrt(k)
_KMV_DENOM = 1152921504606846976.0  # 2^60, exactly representable


@register(
    "kmv_set_overlap",
    f"""
    WITH toks AS (
      SELECT DISTINCT lang, t.tok
      FROM documents, LATERAL (
        SELECT unnest(string_split(
          lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS tok
      ) t
    ),
    hv AS (
      SELECT DISTINCT lang,
             CAST(concat('0x', substr(md5(concat('kv|', tok)), 1, 15)) AS BIGINT) AS hv
      FROM toks
    ),
    sk AS (
      SELECT lang, hv FROM (
        SELECT lang, hv,
               row_number() OVER (PARTITION BY lang ORDER BY hv ASC) AS rn
        FROM hv
      ) WHERE rn <= {OVERLAP_K}
    ),
    langs AS (SELECT DISTINCT lang FROM documents),
    pairs AS (
      SELECT a.lang AS la, b.lang AS lb FROM langs a JOIN langs b ON a.lang < b.lang
    ),
    merged AS (
      SELECT DISTINCT p.la, p.lb, s.hv
      FROM pairs p JOIN sk s ON s.lang = p.la OR s.lang = p.lb
    ),
    mtop AS (
      SELECT la, lb, hv FROM (
        SELECT la, lb, hv,
               row_number() OVER (PARTITION BY la, lb ORDER BY hv ASC) AS rn
        FROM merged
      ) WHERE rn <= {OVERLAP_K}
    ),
    stats AS (
      SELECT m.la, m.lb,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             MAX(m.hv) AS kth,
             CAST(SUM(CASE WHEN sa.hv IS NOT NULL AND sb.hv IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS rho
      FROM mtop m
      LEFT JOIN sk sa ON sa.lang = m.la AND sa.hv = m.hv
      LEFT JOIN sk sb ON sb.lang = m.lb AND sb.hv = m.hv
      GROUP BY m.la, m.lb
    ),
    est AS (
      SELECT la, lb, n_kept, rho,
             CAST(CASE WHEN n_kept < {OVERLAP_K} THEN n_kept
                  ELSE floor(({OVERLAP_K} - 1) * {_KMV_DENOM} / kth) END
                  AS BIGINT) AS u_est
      FROM stats
    ),
    sizes AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY lang),
    inter AS (
      SELECT a.lang AS la, b.lang AS lb, CAST(COUNT(*) AS BIGINT) AS ei
      FROM toks a JOIN toks b ON b.tok = a.tok AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT e.la AS lang_a, e.lb AS lang_b,
           za.n + zb.n - COALESCE(i.ei, 0) AS exact_union,
           COALESCE(i.ei, 0) AS exact_intersection,
           e.u_est AS kmv_union_est,
           (e.rho * e.u_est) // e.n_kept AS kmv_intersection_est,
           e.rho,
           (e.rho * 1000000) // e.n_kept AS jaccard_ppm
    FROM est e
    JOIN sizes za ON za.lang = e.la
    JOIN sizes zb ON zb.lang = e.lb
    LEFT JOIN inter i ON i.la = e.la AND i.lb = e.lb
    """,
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra over per-language token vocabularies (see
    block comment): for every language pair, the exact union /
    intersection cardinalities next to the sketch-only estimates —
    union from the merged k-minimum sketch, intersection and Jaccard
    from rho (merged-top-k values present in BOTH input sketches). The
    vocabulary-overlap matrix is what a multilingual mix design reads
    before sharing a tokenizer across languages.

    Scale: the exact side is the audit (token-grain self-join);
    production keeps only the sketches — {OVERLAP_K} values per set,
    mergeable per shard, pairwise algebra on k-row frames. All
    arithmetic is md5-integer + one exactly-representable double
    multiply/divide, so the sketch path hash-verifies cross-engine
    (the HLL contrast documented on kmv_distinct_estimate)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.array_distinct(F.split(norm_text("text"), " "))).alias("tok"),
    ).distinct()
    hv = toks.select(
        "lang", hex_hash64(F.col("tok"), salt="kv|").alias("hv")
    ).distinct()
    wl = W.partitionBy("lang").orderBy(F.col("hv").asc())
    sk = hv.withColumn("rn", F.row_number().over(wl)).filter(
        F.col("rn") <= OVERLAP_K
    ).select("lang", "hv")
    langs = d.select("lang").distinct()
    pairs = (
        langs.alias("a")
        .join(langs.alias("b"), F.col("a.lang") < F.col("b.lang"))
        .select(F.col("a.lang").alias("la"), F.col("b.lang").alias("lb"))
    )
    merged = (
        F.broadcast(pairs)
        .join(sk, (F.col("lang") == F.col("la")) | (F.col("lang") == F.col("lb")))
        .select("la", "lb", "hv")
        .distinct()
    )
    wp = W.partitionBy("la", "lb").orderBy(F.col("hv").asc())
    mtop = merged.withColumn("rn", F.row_number().over(wp)).filter(
        F.col("rn") <= OVERLAP_K
    )
    sa = sk.select(F.col("lang").alias("la"), "hv", F.lit(1).alias("ina"))
    sb = sk.select(F.col("lang").alias("lb"), "hv", F.lit(1).alias("inb"))
    stats = (
        mtop.join(sa, ["la", "hv"], "left")
        .join(sb, ["lb", "hv"], "left")
        .groupBy("la", "lb")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.max("hv").alias("kth"),
            F.sum(
                F.when(F.col("ina").isNotNull() & F.col("inb").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("rho"),
        )
    )
    u_est = (
        F.when(F.col("n_kept") < OVERLAP_K, F.col("n_kept"))
        .otherwise(F.floor((OVERLAP_K - 1) * F.lit(_KMV_DENOM) / F.col("kth")))
        .cast("bigint")
    )
    est = stats.select("la", "lb", "n_kept", "rho", u_est.alias("u_est"))
    sizes = toks.groupBy("lang").agg(F.count("*").cast("bigint").alias("n"))
    inter = (
        toks.alias("x")
        .join(
            toks.alias("y"),
            (F.col("y.tok") == F.col("x.tok")) & (F.col("x.lang") < F.col("y.lang")),
        )
        .groupBy(F.col("x.lang").alias("la"), F.col("y.lang").alias("lb"))
        .agg(F.count("*").cast("bigint").alias("ei"))
    )
    return (
        est.join(sizes.select(F.col("lang").alias("la"), F.col("n").alias("na")), "la")
        .join(sizes.select(F.col("lang").alias("lb"), F.col("n").alias("nb")), "lb")
        .join(inter, ["la", "lb"], "left")
        .select(
            F.col("la").alias("lang_a"),
            F.col("lb").alias("lang_b"),
            (F.col("na") + F.col("nb") - F.coalesce("ei", F.lit(0))).alias("exact_union"),
            F.coalesce("ei", F.lit(0)).alias("exact_intersection"),
            F.col("u_est").alias("kmv_union_est"),
            F.expr("(rho * u_est) div n_kept").alias("kmv_intersection_est"),
            "rho",
            F.expr("(rho * 1000000) div n_kept").alias("jaccard_ppm"),
        )
    )


@register(
    "bloom_join_prune",
    f"""
    WITH fo AS (SELECT o_custkey, o_orderkey FROM orders
                WHERE o_orderpriority = '1-URGENT'),
    build_keys AS (SELECT DISTINCT o_custkey AS k FROM fo),
    bloom AS (
      SELECT DISTINCT {_duck_bucket("bj' || j.j || '", "build_keys.k", BLOOM_M)} AS pos
      FROM build_keys, (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j) j
    ),
    surv AS (
      SELECT c.c_custkey FROM customer c
      WHERE (SELECT COUNT(*)
             FROM (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j) j
             WHERE {_duck_bucket("bj' || j.j || '", "c.c_custkey", BLOOM_M)}
                   IN (SELECT pos FROM bloom)) = {BLOOM_K}
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_customers,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_survivors,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM customer c JOIN fo o ON o.o_custkey = c.c_custkey) AS n_join_rows,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM surv s JOIN fo o ON o.o_custkey = s.c_custkey) AS n_join_rows_pruned,
           CAST(((SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM surv))
                * 1000000 // (SELECT COUNT(*) FROM customer) AS BIGINT) AS pruned_ppm
    """,
)
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END Bloom join pruning audit (bloom_filter_probe shows the
    confusion matrix; this proves the optimization): build a
    {BLOOM_K}x{BLOOM_M}-bit Bloom over the FILTERED build side's join
    keys (customers of URGENT orders — a selective build-side predicate
    is exactly what makes a runtime filter pay; an unfiltered key join
    here is fully matched and prunes nothing), PRE-FILTER the customer
    table through it, run the join both ways, and emit in one row the
    lossless-ness proof (n_join_rows == n_join_rows_pruned — Bloom
    filters have no false negatives, so the driver's hash gate enforces
    the pruned join loses nothing) next to the measured shuffle savings
    (pruned_ppm: ~13% of fixture customers have no URGENT order, minus
    whatever false positives {BLOOM_M} bits cost at this build
    cardinality — both effects visible, both exact).

    Scale: this is runtime-filter pushdown made explicit — the build
    side collapses to <={BLOOM_M} broadcastable bits, the probe-side
    filter is map-only before any shuffle, and the savings scale with
    the non-matching fraction. Companion to kmv_join_distinct, which
    predicts the match density that decides whether this filter is
    worth building."""
    fo = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    c = table(spark, sf_dir, "customer")
    build = fo.select(F.col("o_custkey").alias("k")).distinct()
    pos = None
    for j in range(BLOOM_K):
        pj = build.select((hex_hash64(F.col("k"), salt=f"bj{j}:") % BLOOM_M).alias("pos"))
        pos = pj if pos is None else pos.unionByName(pj)
    bloom = pos.distinct()
    probe = c.select(
        "c_custkey",
        *[
            (hex_hash64(F.col("c_custkey"), salt=f"bj{j}:") % BLOOM_M).alias(f"p{j}")
            for j in range(BLOOM_K)
        ],
    )
    for j in range(BLOOM_K):
        bj = bloom.select(F.col("pos").alias(f"bp{j}"))
        probe = probe.join(F.broadcast(bj), probe[f"p{j}"] == bj[f"bp{j}"], "left")
    surv = probe.filter(
        sum((F.col(f"bp{j}").isNotNull().cast("int") for j in range(BLOOM_K)), F.lit(0))
        == BLOOM_K
    ).select("c_custkey")
    n_customers = c.agg(F.count("*").cast("bigint").alias("n_customers"))
    n_survivors = surv.agg(F.count("*").cast("bigint").alias("n_survivors"))
    n_join = (
        c.join(fo, c["c_custkey"] == fo["o_custkey"])
        .agg(F.count("*").cast("bigint").alias("n_join_rows"))
    )
    n_join_pruned = (
        surv.join(fo, surv["c_custkey"] == fo["o_custkey"])
        .agg(F.count("*").cast("bigint").alias("n_join_rows_pruned"))
    )
    return (
        n_customers.crossJoin(F.broadcast(n_survivors))
        .crossJoin(F.broadcast(n_join))
        .crossJoin(F.broadcast(n_join_pruned))
        .select(
            "n_customers",
            "n_survivors",
            "n_join_rows",
            "n_join_rows_pruned",
            F.expr("CAST((n_customers - n_survivors) * 1000000 div n_customers AS BIGINT)")
            .alias("pruned_ppm"),
        )
    )


KJ_K = 64  # small on purpose: ~150 distinct users at sf0.01 must EXCEED
# the sketch size so the driver gate exercises the (K-1)*2^60/kth
# estimator, not the n_kept<K exact fallback


@register(
    "kmv_join_distinct",
    f"""
    WITH ck AS (
      SELECT DISTINCT user_id AS k FROM events WHERE event_type = 'click'
    ),
    vk AS (
      SELECT DISTINCT user_id AS k FROM events WHERE event_type = 'view'
    ),
    skc AS (
      SELECT CAST(concat('0x', substr(md5(concat('kj|', k)), 1, 15)) AS BIGINT) AS hv
      FROM ck ORDER BY hv ASC LIMIT {KJ_K}
    ),
    skv AS (
      SELECT CAST(concat('0x', substr(md5(concat('kj|', k)), 1, 15)) AS BIGINT) AS hv
      FROM vk ORDER BY hv ASC LIMIT {KJ_K}
    ),
    mtop AS (
      SELECT DISTINCT hv FROM (
        SELECT hv FROM skc UNION ALL SELECT hv FROM skv
      ) ORDER BY hv ASC LIMIT {KJ_K}
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
             MAX(m.hv) AS kth,
             CAST(SUM(CASE WHEN c.hv IS NOT NULL AND v.hv IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS rho
      FROM mtop m
      LEFT JOIN skc c ON c.hv = m.hv
      LEFT JOIN skv v ON v.hv = m.hv
    ),
    est AS (
      SELECT n_kept, rho,
             CAST(CASE WHEN n_kept < {KJ_K} THEN n_kept
                  ELSE floor(({KJ_K} - 1) * {_KMV_DENOM} / kth) END
                  AS BIGINT) AS u_est
      FROM stats
    ),
    exact AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ck) AS exact_users_click,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM vk) AS exact_users_view,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM ck JOIN vk ON vk.k = ck.k) AS exact_overlap
    )
    SELECT exact_users_click, exact_users_view, exact_overlap,
           u_est AS kmv_union_est,
           (rho * u_est) // n_kept AS kmv_overlap_est,
           rho,
           (rho * 1000000) // n_kept AS jaccard_ppm
    FROM exact, est
    """,
)
def kmv_join_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table JOIN-KEY overlap estimation from KMV sketches — the
    distinct-count sibling of join_size_estimate_cms (which sizes the
    join OUTPUT; this sizes the key MATCH: how many click users also
    appear in views). The optimizer question it answers: is the funnel
    join's build side mostly-matching (dense, favor shuffle) or
    sparse-matching (favor a Bloom/semi pre-filter)? Union comes from
    the merged k-minimum sketch, overlap from rho (merged-top-k values
    present in BOTH input sketches) — the same Beyer et al. multiset
    algebra as kmv_set_overlap, applied across two tables instead of
    within one.

    Scale: each side's sketch is a distributed sort-limit
    (TakeOrdered: per-partition top-{KJ_K}, merged on the driver —
    no single-partition window, no key-grain shuffle beyond the
    distinct); the algebra runs on two {KJ_K}-row broadcast
    frames. The exact side is the audit production drops. All
    arithmetic is md5-integer + one exactly-representable double
    multiply/divide, so the sketch path hash-verifies cross-engine."""
    ev = table(spark, sf_dir, "events")

    def sketch(event_type: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .select(hex_hash64(F.col("user_id"), salt="kj|").alias("hv"))
            .distinct()
            .orderBy(F.col("hv").asc())
            .limit(KJ_K)
        )

    skc, skv = sketch("click"), sketch("view")
    mtop = (
        skc.unionByName(skv)
        .distinct()
        .orderBy(F.col("hv").asc())
        .limit(KJ_K)
    )
    stats = (
        mtop.join(F.broadcast(skc.withColumn("ina", F.lit(1))), "hv", "left")
        .join(F.broadcast(skv.withColumn("inb", F.lit(1))), "hv", "left")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.max("hv").alias("kth"),
            F.sum(
                F.when(F.col("ina").isNotNull() & F.col("inb").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("rho"),
        )
    )
    u_est = (
        F.when(F.col("n_kept") < KJ_K, F.col("n_kept"))
        .otherwise(F.floor((KJ_K - 1) * F.lit(_KMV_DENOM) / F.col("kth")))
        .cast("bigint")
    )
    est = stats.select("n_kept", "rho", u_est.alias("u_est"))
    users = lambda t: (
        ev.filter(F.col("event_type") == t).select(F.col("user_id").alias("k")).distinct()
    )
    cu, vu = users("click"), users("view")
    exact = (
        cu.agg(F.count("*").cast("bigint").alias("exact_users_click"))
        .crossJoin(F.broadcast(vu.agg(F.count("*").cast("bigint").alias("exact_users_view"))))
        .crossJoin(
            F.broadcast(
                cu.join(vu, "k").agg(F.count("*").cast("bigint").alias("exact_overlap"))
            )
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_users_click",
        "exact_users_view",
        "exact_overlap",
        F.col("u_est").alias("kmv_union_est"),
        F.expr("(rho * u_est) div n_kept").alias("kmv_overlap_est"),
        "rho",
        F.expr("(rho * 1000000) div n_kept").alias("jaccard_ppm"),
    )


def _lsh_candidate_oracle() -> str:
    """Lazy oracle (resolved by load_all): composes dedup's shingle +
    minhash CTE constants so the SQL bands are the engine's own."""
    from .dedup import _MINHASH_CTE, _SHINGLES_CTE

    return f"""
    WITH {_SHINGLES_CTE},
    {_MINHASH_CTE},
    keys AS (
      SELECT concat(CAST(band AS VARCHAR), '|', band_key) AS k FROM bands
    ),
    cms AS (
      SELECT d.i, {_duck_bucket("lf' || d.i || '", "keys.k", CMS_WIDTH)} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM keys, (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS i) d
      GROUP BY d.i, bucket
    ),
    per_row AS (
      SELECT i, CAST(SUM(c * c) AS BIGINT) AS est FROM cms GROUP BY i
    ),
    est AS (SELECT MIN(est) AS cms_f2 FROM per_row),
    exact AS (
      SELECT CAST(SUM(n * n) AS BIGINT) AS exact_f2,
             CAST(SUM(n) AS BIGINT) AS n_band_rows,
             CAST(SUM(n * (n - 1)) // 2 AS BIGINT) AS exact_candidates
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keys GROUP BY k)
    )
    SELECT exact_candidates,
           (cms_f2 - n_band_rows) // 2 AS est_candidates,
           exact_f2, cms_f2, n_band_rows,
           cms_f2 >= exact_f2
           AND cms_f2 - exact_f2 <= ({F2_SLACK} * n_band_rows * n_band_rows)
               // {CMS_WIDTH} AS within_bound
    FROM exact, est
    """


@register("lsh_candidate_estimate", _lsh_candidate_oracle)
def lsh_candidate_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-planner statistics: predict the MinHash-LSH candidate-pair
    volume from a count-min sketch over the band keys BEFORE running
    the pair join. Candidates = SUM over band buckets of C(n_k, 2) =
    (F2 - N) / 2, and F2 is exactly what the CMS inner product
    estimates (selfjoin_size_estimate's machinery pointed at the LSH
    key space) — the number an optimizer consults to size the shuffle,
    pick band parameters, or flag a skewed bucket that needs salting,
    at O(depth x width) state instead of a key-grain count. The
    estimate never undershoots (CMS one-sided error), so capacity
    planning from it is safe; within_bound asserts the overshoot
    contract the oracle reproduces.

    Scale: the band-key pass is the store's own signing cost; the
    sketch build is a bounded-width map-side-combined groupBy; the
    exact side is the audit production drops."""
    from .dedup import _band_rows

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    keys = _band_rows(docs).select(
        F.concat(
            F.col("band").cast("string"), F.lit("|"), F.col("band_key")
        ).alias("k")
    )
    rows = keys.select(
        F.posexplode(
            F.array(
                *[
                    (hex_hash64(F.col("k"), salt=f"lf{i}:") % CMS_WIDTH)
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("i", "bucket")
    )
    per_row = (
        rows.groupBy("i", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("est"))
    )
    est = per_row.agg(F.min("est").alias("cms_f2"))
    exact = (
        keys.groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n"))
        .agg(
            F.sum(F.col("n") * F.col("n")).cast("bigint").alias("exact_f2"),
            F.sum("n").cast("bigint").alias("n_band_rows"),
            F.expr("CAST(sum(n * (n - 1)) div 2 AS BIGINT)").alias("exact_candidates"),
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_candidates",
        F.expr("(cms_f2 - n_band_rows) div 2").alias("est_candidates"),
        "exact_f2",
        "cms_f2",
        "n_band_rows",
        (
            (F.col("cms_f2") >= F.col("exact_f2"))
            & (
                F.col("cms_f2") - F.col("exact_f2")
                <= F.expr(f"({F2_SLACK} * n_band_rows * n_band_rows) div {CMS_WIDTH}")
            )
        ).alias("within_bound"),
    )


@register(
    "kmv_difference_estimate",
    f"""
    WITH toks AS (
      SELECT DISTINCT lang, t.tok
      FROM documents, LATERAL (
        SELECT unnest(string_split(
          lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS tok
      ) t
    ),
    hv AS (
      SELECT DISTINCT lang,
             CAST(concat('0x', substr(md5(concat('kv|', tok)), 1, 15)) AS BIGINT) AS hv
      FROM toks
    ),
    sk AS (
      SELECT lang, hv FROM (
        SELECT lang, hv,
               row_number() OVER (PARTITION BY lang ORDER BY hv ASC) AS rn
        FROM hv
      ) WHERE rn <= {OVERLAP_K}
    ),
    langs AS (SELECT DISTINCT lang FROM documents),
    pairs AS (
      SELECT a.lang AS la, b.lang AS lb FROM langs a JOIN langs b ON a.lang < b.lang
    ),
    merged AS (
      SELECT DISTINCT p.la, p.lb, s.hv
      FROM pairs p JOIN sk s ON s.lang = p.la OR s.lang = p.lb
    ),
    mtop AS (
      SELECT la, lb, hv FROM (
        SELECT la, lb, hv,
               row_number() OVER (PARTITION BY la, lb ORDER BY hv ASC) AS rn
        FROM merged
      ) WHERE rn <= {OVERLAP_K}
    ),
    stats AS (
      SELECT m.la, m.lb,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             MAX(m.hv) AS kth,
             CAST(SUM(CASE WHEN sa.hv IS NOT NULL AND sb.hv IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS rho_a_only,
             CAST(SUM(CASE WHEN sa.hv IS NULL AND sb.hv IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS rho_b_only
      FROM mtop m
      LEFT JOIN sk sa ON sa.lang = m.la AND sa.hv = m.hv
      LEFT JOIN sk sb ON sb.lang = m.lb AND sb.hv = m.hv
      GROUP BY m.la, m.lb
    ),
    est AS (
      SELECT la, lb, n_kept, rho_a_only, rho_b_only,
             CAST(CASE WHEN n_kept < {OVERLAP_K} THEN n_kept
                  ELSE floor(({OVERLAP_K} - 1) * {_KMV_DENOM} / kth) END
                  AS BIGINT) AS u_est
      FROM stats
    ),
    sizes AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY lang),
    inter AS (
      SELECT a.lang AS la, b.lang AS lb, CAST(COUNT(*) AS BIGINT) AS ei
      FROM toks a JOIN toks b ON b.tok = a.tok AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT e.la AS lang_a, e.lb AS lang_b,
           za.n - COALESCE(i.ei, 0) AS exact_diff_ab,
           (e.rho_a_only * e.u_est) // e.n_kept AS kmv_diff_ab_est,
           zb.n - COALESCE(i.ei, 0) AS exact_diff_ba,
           (e.rho_b_only * e.u_est) // e.n_kept AS kmv_diff_ba_est,
           e.rho_a_only, e.rho_b_only
    FROM est e
    JOIN sizes za ON za.lang = e.la
    JOIN sizes zb ON zb.lang = e.lb
    LEFT JOIN inter i ON i.la = e.la AND i.lb = e.lb
    """,
)
def kmv_difference_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-DIFFERENCE estimation — the member kmv_set_overlap's
    algebra was missing: |A\\B| and |B\\A| per language pair from the
    same merged k-minimum sketch, via rho_a_only / rho_b_only (merged
    top-k values present in exactly one input sketch) scaled by the
    union estimate. The statistic a corpus-mix design reads to answer
    "how much NEW vocabulary does adding language B contribute" without
    materializing either vocabulary.

    Construction identical to kmv_set_overlap (same per-set sketches —
    in production the SAME stored sketch serves overlap AND difference;
    the reference has no sketch surface, SURVEY §2.4's approx-distinct
    row is the parity anchor). All arithmetic md5-integer + the one
    exactly-representable double multiply/divide, so the estimates
    hash-verify cross-engine; the exact sides are the audit columns
    production would drop.

    Scale: per-set sketches are {OVERLAP_K}-row frames built by one
    partitioned top-k; pair algebra touches k-row frames only."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.array_distinct(F.split(norm_text("text"), " "))).alias("tok"),
    ).distinct()
    hv = toks.select(
        "lang", hex_hash64(F.col("tok"), salt="kv|").alias("hv")
    ).distinct()
    wl = W.partitionBy("lang").orderBy(F.col("hv").asc())
    sk = hv.withColumn("rn", F.row_number().over(wl)).filter(
        F.col("rn") <= OVERLAP_K
    ).select("lang", "hv")
    langs = d.select("lang").distinct()
    pairs = (
        langs.alias("a")
        .join(langs.alias("b"), F.col("a.lang") < F.col("b.lang"))
        .select(F.col("a.lang").alias("la"), F.col("b.lang").alias("lb"))
    )
    merged = (
        F.broadcast(pairs)
        .join(sk, (F.col("lang") == F.col("la")) | (F.col("lang") == F.col("lb")))
        .select("la", "lb", "hv")
        .distinct()
    )
    wp = W.partitionBy("la", "lb").orderBy(F.col("hv").asc())
    mtop = merged.withColumn("rn", F.row_number().over(wp)).filter(
        F.col("rn") <= OVERLAP_K
    )
    sa = sk.select(F.col("lang").alias("la"), "hv", F.lit(1).alias("ina"))
    sb = sk.select(F.col("lang").alias("lb"), "hv", F.lit(1).alias("inb"))
    stats = (
        mtop.join(sa, ["la", "hv"], "left")
        .join(sb, ["lb", "hv"], "left")
        .groupBy("la", "lb")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.max("hv").alias("kth"),
            F.sum(
                F.when(F.col("ina").isNotNull() & F.col("inb").isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("rho_a_only"),
            F.sum(
                F.when(F.col("ina").isNull() & F.col("inb").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("rho_b_only"),
        )
    )
    u_est = (
        F.when(F.col("n_kept") < OVERLAP_K, F.col("n_kept"))
        .otherwise(F.floor((OVERLAP_K - 1) * F.lit(_KMV_DENOM) / F.col("kth")))
        .cast("bigint")
    )
    est = stats.select(
        "la", "lb", "n_kept", "rho_a_only", "rho_b_only", u_est.alias("u_est")
    )
    sizes = toks.groupBy("lang").agg(F.count("*").cast("bigint").alias("n"))
    inter = (
        toks.alias("x")
        .join(
            toks.alias("y"),
            (F.col("y.tok") == F.col("x.tok")) & (F.col("x.lang") < F.col("y.lang")),
        )
        .groupBy(F.col("x.lang").alias("la"), F.col("y.lang").alias("lb"))
        .agg(F.count("*").cast("bigint").alias("ei"))
    )
    return (
        est.join(sizes.select(F.col("lang").alias("la"), F.col("n").alias("na")), "la")
        .join(sizes.select(F.col("lang").alias("lb"), F.col("n").alias("nb")), "lb")
        .join(inter, ["la", "lb"], "left")
        .select(
            F.col("la").alias("lang_a"),
            F.col("lb").alias("lang_b"),
            (F.col("na") - F.coalesce("ei", F.lit(0))).alias("exact_diff_ab"),
            F.expr("(rho_a_only * u_est) div n_kept").alias("kmv_diff_ab_est"),
            (F.col("nb") - F.coalesce("ei", F.lit(0))).alias("exact_diff_ba"),
            F.expr("(rho_b_only * u_est) div n_kept").alias("kmv_diff_ba_est"),
            "rho_a_only",
            "rho_b_only",
        )
    )
