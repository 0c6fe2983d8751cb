"""Embedding similarity search (ANN) for LLM training-data pipelines.

Embeddings are `array<float>` columns. Exact cross-engine comparison of
float math is impossible in general (reduction order), so similarity is
computed over *quantized* vectors: `floor(x * 10000)` int64 components.
All dot products are then integer-valued (exact in both engines regardless
of summation order, since |dot| << 2^53), and the final cosine is a single
deterministic sqrt/divide — bit-identical doubles, stable ranking.

Scale strategy:
- brute-force top-k: broadcast the (small) query set against the corpus —
  embarrassingly parallel, no corpus shuffle; the baseline and the
  exact-verifier.
- LSH-bucketed ANN: random-hyperplane signatures (±1 planes derived from
  the cross-engine md5 hash, so buckets reproduce everywhere) restrict
  comparisons to same-bucket pairs — the sub-quadratic scale path.
- IVF ANN: coarse-quantizer cells + nprobe probing — the inverted-file
  layout; centroid assignment and query probing are per-block BLAS
  matmuls against broadcast centroids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..plans.registry import register
from ..session import table

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
QUANT = 10000
N_TABLES = 8  # LSH hash tables (bands)
PLANES_PER_TABLE = 4  # signature bits per table
DIM = 64


def _quantize(col: Column) -> Column:
    """array<float> → array<bigint>, exact `floor(double(x) * QUANT)`."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT).cast("bigint"))


def _dot(a: Column, b: Column) -> Column:
    """Exact integer dot product via zip_with + left-fold aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


_QUANT_CTE = f"""
q AS (
  SELECT vec_id,
         [CAST(floor(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT) FOR x IN embedding] AS e
  FROM embeddings
)
"""


@register(
    "embedding_topk_bruteforce",
    f"""
    WITH {_QUANT_CTE},
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_dot_product(CAST(a.e AS DOUBLE[]), CAST(b.e AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.e AS DOUBLE[]), CAST(a.e AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.e AS DOUBLE[]), CAST(b.e AS DOUBLE[])))) AS cosine
      FROM q a JOIN q b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM pairs
    ) WHERE rank <= {TOP_K}
    """,
)
def embedding_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-{TOP_K} over quantized embeddings for the
    first {N_QUERIES} vectors.

    Spark plan: broadcast the query set, per-partition scoring of the
    corpus (no corpus shuffle), then a per-query top-k window over
    queries×k candidate rows. At 100 TB this exact shape still works —
    scoring is a map-only pass; only queries×corpus-partitions candidate
    rows reach the shuffle if you pre-rank per partition (AQE keeps the
    final window cheap)."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", _quantize("embedding").alias("e"))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    pairs = emb.alias("c").join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id"), "inner"
    )
    cosine = (
        _dot(F.col("qe"), F.col("e")).cast("double")
        / (
            F.sqrt(_dot(F.col("qe"), F.col("qe")).cast("double"))
            * F.sqrt(_dot(F.col("e"), F.col("e")).cast("double"))
        )
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cosine.alias("cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@register("embedding_ann_lsh", None)  # verified against bruteforce in tests (recall)
def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table random-hyperplane LSH: {N_TABLES} independent
    signatures of {PLANES_PER_TABLE} ±1-hyperplanes each (signs derived
    from the cross-engine md5 hash of (plane, dim), so buckets reproduce
    everywhere). A candidate pair is any (query, doc) sharing ANY table's
    bucket — the classic banding trick: short bands give per-band match
    probability p^b, and T tables lift recall to 1-(1-p^b)^T while each
    probe stays sub-quadratic. Candidates then get exact quantized-cosine
    top-{TOP_K} scoring.

    Rows-only driver check; tests/test_similarity.py measures recall
    against embedding_topk_bruteforce. Scale: corpus side explodes to
    T rows/vector, shuffles on (table, bucket) — each bucket holds
    ~N/2^b vectors, so candidate generation is O(T·N²/2^b) pair work
    instead of O(N²); queries are broadcast, never shuffled.
    """
    import hashlib

    import numpy as np
    import pandas as pd  # noqa: F811 — worker-side
    from pyspark.sql import types as T

    emb = table(spark, sf_dir, "embeddings").select("vec_id", _quantize("embedding").alias("e"))

    # sign(t, p, d) = ±1 from md5 parity; all N_TABLES*PLANES_PER_TABLE
    # hyperplanes form one (planes x DIM) matrix so every signature bit of
    # a block of vectors is a single BLAS matmul in the pandas worker
    # (the per-element Catalyst fold costs ~100x more for this shape).
    def sign(t: int, p: int, d: int) -> int:
        h = hashlib.md5(f"{t}:{p}:{d}".encode()).hexdigest()
        return 1 if int(h[:15], 16) & 1 else -1

    planes = np.array(
        [
            [sign(t, p, d) for d in range(DIM)]
            for t in range(N_TABLES)
            for p in range(PLANES_PER_TABLE)
        ],
        dtype=np.float64,  # exact: entries ±1, dots are integers << 2^53
    )
    n_tables, planes_per_table = N_TABLES, PLANES_PER_TABLE
    sig_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("e", T.ArrayType(T.LongType())),
            T.StructField("buckets", T.ArrayType(T.IntegerType())),
        ]
    )

    def project(batches):
        bits = (1 << np.arange(planes_per_table, dtype=np.int64))[None, :]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf["e"]), dtype=np.float64)
            proj = mat @ planes.T  # (n, tables*planes) — one GEMM
            pos = (proj > 0).reshape(len(pdf), n_tables, planes_per_table)
            buckets = (pos * bits[None, :, :]).sum(axis=2) + (
                np.arange(n_tables, dtype=np.int64) << planes_per_table
            )[None, :]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "e": pdf["e"],
                    "buckets": [row.astype("int32") for row in buckets],
                }
            )

    sigs = emb.mapInPandas(project, schema=sig_schema)
    corpus = sigs.select("vec_id", "e", F.explode("buckets").alias("bucket"))
    queries = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.explode("buckets").alias("qb"),
    )
    cands = (
        corpus.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id")),
        )
        # A pair sharing k tables would score k times — dedup before the
        # (more expensive) exact scoring pass.
        .select("query_id", "qe", F.col("vec_id").alias("neighbor_id"), "e")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cosine = (
        _dot(F.col("qe"), F.col("e")).cast("double")
        / (
            F.sqrt(_dot(F.col("qe"), F.col("qe")).cast("double"))
            * F.sqrt(_dot(F.col("e"), F.col("e")).cast("double"))
        )
    )
    scored = cands.select("query_id", "neighbor_id", cosine.alias("cosine"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


NEARDUP_COSINE = 0.35  # fixture-calibrated: p99.9 of pairs ≈ 0.377


@register(
    "embedding_cosine_neardup",
    f"""
    WITH {_QUANT_CTE},
    pairs AS (
      SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
             list_dot_product(CAST(a.e AS DOUBLE[]), CAST(b.e AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.e AS DOUBLE[]), CAST(a.e AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.e AS DOUBLE[]), CAST(b.e AS DOUBLE[])))) AS cosine
      FROM q a JOIN q b ON a.vec_id < b.vec_id
    )
    SELECT keep_id, dup_id, cosine
    FROM pairs WHERE cosine >= {NEARDUP_COSINE}
    """,
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (a < b) pair whose
    quantized cosine ≥ {NEARDUP_COSINE}; the lower vec_id is the keeper.
    Semantic dedup — catches paraphrases that MinHash (lexical) misses.

    Physical strategy: broadcast the quantized corpus matrix (int64,
    N×DIM — the *small* side by construction) to every executor; a
    map-only `mapInPandas` pass computes each partition-block's dot
    products against the broadcast matrix as ONE numpy integer matmul
    and emits only above-threshold pairs. No shuffle, no per-pair
    expression evaluation — Catalyst's higher-order-function fold costs
    ~100× more per element than the BLAS path for exactly this shape.

    At 100 TB nobody runs all-pairs: candidate pairs come from the LSH
    bucket join (embedding_ann_lsh's signature scheme) or an IVF coarse
    quantizer (embedding_centroid_by_label is its assignment primitive),
    and THIS operator is the exact verifier applied per candidate block —
    the broadcast side is then the bounded candidate set, same code path.
    Integer dots (quantized) keep the threshold comparison deterministic
    cross-engine (int64 matmul is exact; cosine is one IEEE sqrt/divide
    per pair in both engines); boundary pairs cannot flap.
    """
    import numpy as np
    import pandas as pd  # noqa: F811 — worker-side
    from pyspark.sql import types as T

    emb = table(spark, sf_dir, "embeddings").select("vec_id", _quantize("embedding").alias("e"))
    rows = emb.collect()  # corpus matrix: the broadcast-able small side
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.e for r in rows], dtype=np.float64)  # exact; see worker note
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    out_schema = T.StructType(
        [
            T.StructField("keep_id", T.LongType()),
            T.StructField("dup_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def block_matmul(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            # float64 on purpose: int64 matmul bypasses BLAS (≈50× slower),
            # while every product (≤1e8) and dot (≤6.4e9) here is an
            # integer < 2^53, so the float64 GEMM is bit-exact.
            a_mat = np.array(list(pdf["e"]), dtype=np.float64)
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            dots = a_mat @ b_mat.T
            cos = dots / (a_norms[:, None] * b_norms[None, :])
            ai, bj = np.nonzero((cos >= NEARDUP_COSINE) & (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame(
                {
                    "keep_id": a_ids[ai],
                    "dup_id": b_ids[bj],
                    "cosine": cos[ai, bj],
                }
            )

    return emb.mapInPandas(block_matmul, schema=out_schema)


@register(
    "embedding_centroid_by_label",
    f"""
    WITH {_QUANT_CTE},
    labeled AS (
      SELECT l.label, q.e
      FROM q JOIN (SELECT vec_id, label FROM embeddings) l ON l.vec_id = q.vec_id
    )
    SELECT label, CAST(u.i AS INT) AS dim,
           CAST(SUM(e[u.i]) AS BIGINT) AS component_sum,
           COUNT(*) AS n_vectors
    FROM labeled, LATERAL (SELECT unnest(generate_series(1, {DIM})) AS i) u
    GROUP BY label, u.i
    """,
)
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (quantized sums — exact): the grouped
    vector aggregation primitive behind IVF coarse quantizers (k-means
    assignment steps are repeated applications of this + topk)."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _quantize("embedding").alias("e")
    )
    exploded = emb.select(
        "label", F.posexplode("e").alias("pos", "q_val")
    ).select("label", (F.col("pos") + 1).cast("int").alias("dim"), "q_val")
    return exploded.groupBy("label", "dim").agg(
        F.sum("q_val").cast("bigint").alias("component_sum"), F.count("*").alias("n_vectors")
    )


IVF_CELLS = 16  # coarse-quantizer cells
IVF_NPROBE = 4  # cells probed per query


@register("embedding_ivf_topk", None)  # approximate → recall-tested vs bruteforce
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via an IVF (inverted-file) index: a coarse quantizer of
    {IVF_CELLS} centroids partitions the corpus into cells; each query
    probes only its {IVF_NPROBE} nearest cells and re-ranks exactly
    within them — the other classic sub-quadratic ANN layout next to LSH
    (embedding_ann_lsh), searching ~nprobe/cells of the corpus.

    Centroids here are the first {IVF_CELLS} corpus vectors (deterministic
    single-step seeding); production would run k-means, i.e. repeated
    application of this same assignment plus embedding_centroid_by_label's
    grouped component-sum (the update step).

    Physical plan: centroids broadcast; cell assignment is one BLAS
    matmul per block (map-only, no shuffle — same pattern as the LSH
    projections); the probe restricts the scoring join to matching cells.
    Scale: cells shard across executors by cell id; per-cell candidate
    lists are the "inverted file". Deterministic: integer-quantized
    cosines, argmax ties broken toward the lower centroid id, candidate
    re-rank ordered by (cosine DESC, neighbor_id ASC).
    """
    import numpy as np
    import pandas as pd  # noqa: F811 — worker-side
    from pyspark.sql import types as T

    emb = table(spark, sf_dir, "embeddings").select("vec_id", _quantize("embedding").alias("e"))
    seed = emb.filter(F.col("vec_id") < IVF_CELLS).collect()
    cent = np.array([r.e for r in sorted(seed, key=lambda r: r.vec_id)], dtype=np.float64)
    cent_norms = np.sqrt((cent * cent).sum(axis=1))
    bc = spark.sparkContext.broadcast((cent, cent_norms))

    assign_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("e", T.ArrayType(T.LongType())),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def assign(batches):
        c_mat, c_norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf["e"]), dtype=np.float64)
            norms = np.sqrt((mat * mat).sum(axis=1))
            cos = (mat @ c_mat.T) / (norms[:, None] * c_norms[None, :])
            # np.argmax returns the FIRST max index → ties to lower cell id.
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "e": pdf["e"],
                    "cell": np.argmax(cos, axis=1).astype("int32"),
                }
            )

    probe_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("qe", T.ArrayType(T.LongType())),
            T.StructField("qcell", T.IntegerType()),
        ]
    )

    def probe(batches):
        c_mat, c_norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf["e"]), dtype=np.float64)
            norms = np.sqrt((mat * mat).sum(axis=1))
            cos = (mat @ c_mat.T) / (norms[:, None] * c_norms[None, :])
            # Deterministic top-nprobe cells: sort by (-cos, cell id).
            order = np.lexsort((np.arange(cos.shape[1])[None, :].repeat(len(pdf), 0), -cos), axis=1)
            cells = order[:, :IVF_NPROBE]
            yield pd.DataFrame(
                {
                    "query_id": pdf["vec_id"].repeat(IVF_NPROBE),
                    "qe": [e for e in pdf["e"] for _ in range(IVF_NPROBE)],
                    "qcell": cells.reshape(-1).astype("int32"),
                }
            )

    assigned = emb.mapInPandas(assign, schema=assign_schema)
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES).mapInPandas(probe, schema=probe_schema)
    )
    cands = assigned.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    )
    cosine = (
        _dot(F.col("qe"), F.col("e")).cast("double")
        / (
            F.sqrt(_dot(F.col("qe"), F.col("qe")).cast("double"))
            * F.sqrt(_dot(F.col("e"), F.col("e")).cast("double"))
        )
    )
    scored = cands.select("query_id", F.col("vec_id").alias("neighbor_id"), cosine.alias("cosine"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
