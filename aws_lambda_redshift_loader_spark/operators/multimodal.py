"""Multimodal (binary) column plumbing for LLM training-data pipelines.

Image/audio/video payloads are opaque `binary` columns + typed metadata
structs. The container has no image/audio libs, so the *decode* step is a
clearly-marked deterministic fake behind ``DECODERS``; everything
Spark-side — schema, partitioning, Arrow batch shape, mapInPandas
signature — is real and tested (tests/test_multimodal.py).

Scale notes: binary payloads ride in Arrow record batches to the Python
workers; keep `spark.sql.execution.arrow.maxRecordsPerBatch` sized so a
batch of payloads fits executor memory (e.g. 1k × 1 MB images). Metadata
predicates (width/height/codec) are plain columns → pushdown prunes files
before any payload bytes are read (parquet column pruning keeps `payload`
out of the scan entirely for metadata-only queries).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import register
from ..session import table


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → simulated multimodal rows: utf-8 payload bytes + typed
    metadata struct (the schema a binaryFile/parquet media table has)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/text").alias("mime"),
            (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            F.col("n_chars").cast("bigint").alias("content_length"),
        ).alias("meta"),
    )


@register(
    "multimodal_metadata",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           CAST(doc_id % 640 + 1 AS INT) AS width,
           CAST(doc_id % 480 + 1 AS INT) AS height,
           'fake/text' AS mime
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over a binary media column: byte length +
    struct-field access. The payload column itself is pruned out of the
    scan (only `octet_length` forces bytes here; a pure meta query reads
    zero payload bytes)."""
    rows = _with_payload(spark, sf_dir)
    return rows.select(
        "doc_id",
        F.length("payload").cast("bigint").alias("payload_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.mime").alias("mime"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("head_md5", T.StringType()),
    ]
)


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder. A real deployment would plug
    PIL/ffmpeg/torchaudio here; the container has none of them, so this
    computes byte-level stats instead (same I/O shape: bytes in,
    fixed-width features out).

    Raises NotImplementedError for mime types a real decoder would handle
    differently — the plumbing treats that as a per-row error column.
    """
    import hashlib

    if payload is None:
        raise NotImplementedError("real media decode requires PIL/ffmpeg (not in container)")
    return {
        "n_bytes": len(payload),
        "mean_byte": float(sum(payload)) / max(len(payload), 1),
        "head_md5": hashlib.md5(payload[:64]).hexdigest(),
    }


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch of (doc_id, payload) → features.

    Vectorized per batch (one Python call per Arrow batch, not per row).
    """
    for pdf in batches:
        feats = [_decode_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [f["n_bytes"] for f in feats],
                "mean_byte": [f["mean_byte"] for f in feats],
                "head_md5": [f["head_md5"] for f in feats],
            }
        )


@register("multimodal_features", None)  # pandas path → rows-only driver check
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: the decode/
    resize/frame-sample slot in a media pipeline. Deterministic byte-stat
    fake decode (see _decode_stub); exact values asserted in
    tests/test_multimodal.py.

    Scale: map-only (no shuffle); Arrow-batched transfer; payload column
    read is the only I/O. Partition count = input splits, so 100 TB of
    media shards across however many executors exist."""
    rows = _with_payload(spark, sf_dir).select("doc_id", "payload")
    return rows.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)
