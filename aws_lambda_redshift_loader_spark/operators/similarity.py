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
N_PLANES = 8  # LSH signature bits
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
    """ANN via random-hyperplane LSH: {N_PLANES} ±1-hyperplanes (signs
    derived from the cross-engine md5 hash of (plane, dim), so the
    signature is deterministic), bucket = sign-bit integer; neighbor
    candidates restricted to the same bucket, then exact quantized cosine
    top-{TOP_K} within bucket.

    Rows-only driver check; tests/test_similarity.py measures recall
    against embedding_topk_bruteforce. Scale: bucket join replaces the
    cross join — sub-quadratic candidate generation, same verify step.
    """
    emb = table(spark, sf_dir, "embeddings").select("vec_id", _quantize("embedding").alias("e"))

    # sign(p, d) = +1/-1 from md5 parity — computed as a 64-element array
    # literal per plane, broadcast into the projection expression.
    import hashlib

    def sign(p: int, d: int) -> int:
        h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
        return 1 if int(h[:15], 16) & 1 else -1

    bucket = None
    for p in range(N_PLANES):
        signs = F.array(*[F.lit(sign(p, d)) for d in range(DIM)])
        proj = F.aggregate(
            F.zip_with(F.col("e"), signs, lambda x, s: x * s),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    sigs = emb.withColumn("bucket", bucket.cast("int"))

    queries = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("bucket").alias("qb")
    )
    cands = sigs.alias("c").join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id")),
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
