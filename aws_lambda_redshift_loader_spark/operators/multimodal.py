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


# NOTE: every mapInPandas worker below is defined INSIDE its query
# builder. Module-level functions are cloudpickled by *reference* and the
# executors would need this package importable (sys.path/cwd dependent —
# breaks when the host session runs from another directory); closures are
# pickled by *value* and carry their constants with them.


FRAME_STRIDE = 64  # chars between frame starts (fake "video" timeline)
FRAME_LEN = 16  # chars per sampled frame
MAX_FRAMES = 8


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


@register(
    "multimodal_frame_sample",
    f"""
    SELECT doc_id, CAST(u.i AS INT) AS frame_idx,
           md5(substr(text, CAST(u.i AS INT) * {FRAME_STRIDE} + 1, {FRAME_LEN})) AS frame_md5
    FROM documents,
         LATERAL (SELECT unnest(generate_series(0,
             least({MAX_FRAMES - 1},
                   CAST(floor((length(text) - {FRAME_LEN}) / {FRAME_STRIDE}) AS INT)))) AS i) u
    WHERE length(text) >= {FRAME_LEN}
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over media payloads: every document explodes into up
    to {MAX_FRAMES} fixed-stride frames, md5-fingerprinted — the
    mapInPandas 1→N shape a video frame-sampler has (decode seek points,
    emit k frames per clip). Runs through real Arrow batches; the SQL
    oracle reproduces the frames with generate_series + substr, so even
    the pandas path is hash-verified, not rows-only.

    Scale: map-only explode with bounded fan-out (≤{MAX_FRAMES}×input);
    no shuffle; frames shard with their source partitions."""
    rows = table(spark, sf_dir, "documents").select("doc_id", "text")
    frame_stride, frame_len, max_frames = FRAME_STRIDE, FRAME_LEN, MAX_FRAMES

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """1→N worker: each document yields up to max_frames frame rows —
        the frame-sampling slot of a video pipeline (a real decoder would
        seek keyframes; the fake samples fixed strides of the payload)."""
        import hashlib

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                if n < frame_len:
                    continue
                n_frames = min(max_frames, (n - frame_len) // frame_stride + 1)
                for i in range(n_frames):
                    frame = text[i * frame_stride : i * frame_stride + frame_len]
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return rows.mapInPandas(sample_frames, schema=_FRAME_SCHEMA)


@register(
    "multimodal_features",
    """
    SELECT d.doc_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           CAST(SUM(ascii(u.c)) AS DOUBLE)
             / greatest(octet_length(encode(d.text)), 1) AS mean_byte,
           md5(substr(d.text, 1, 64)) AS head_md5
    FROM documents d,
         LATERAL (SELECT unnest(string_split(d.text, '')) AS c) u
    GROUP BY d.doc_id, d.text
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: the decode/
    resize/frame-sample slot in a media pipeline. Deterministic byte-stat
    fake decode (see _decode_stub); exact values asserted in
    tests/test_multimodal.py AND hash-verified against a DuckDB oracle
    (payload = utf-8 of ASCII fixture text, so bytes == code points and
    the byte sum is a per-char ascii() sum; mean_byte is exact-int-sum /
    length — one IEEE divide in both engines).

    Scale: map-only (no shuffle); Arrow-batched transfer; payload column
    read is the only I/O. Partition count = input splits, so 100 TB of
    media shards across however many executors exist."""
    rows = _with_payload(spark, sf_dir).select("doc_id", "payload")

    def decode_stub(payload: bytes) -> dict:
        """Deterministic fake decoder. A real deployment would plug
        PIL/ffmpeg/torchaudio here; the container has none of them, so
        this computes byte-level stats instead (same I/O shape: bytes in,
        fixed-width features out). Raises NotImplementedError where a
        real decoder would be required."""
        import hashlib

        import numpy as np

        if payload is None:
            raise NotImplementedError("real media decode requires PIL/ffmpeg (not in container)")
        byte_sum = int(np.frombuffer(payload, np.uint8).astype(np.int64).sum())
        return {
            "n_bytes": len(payload),
            "mean_byte": float(byte_sum) / max(len(payload), 1),
            "head_md5": hashlib.md5(payload[:64]).hexdigest(),
        }

    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Arrow batch of (doc_id, payload) → features; one Python call
        per batch, not per row."""
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "mean_byte": [f["mean_byte"] for f in feats],
                    "head_md5": [f["head_md5"] for f in feats],
                }
            )

    return rows.mapInPandas(extract_features, schema=_FEATURE_SCHEMA)


# ---- REAL container codec: RIFF/WAV PCM ---------------------------------
# The "no real media decode" env-block covers compressed codecs
# (PIL/ffmpeg). Uncompressed RIFF/WAV is decodable with the Python
# STDLIB (`wave` + `struct`), so this query runs a REAL codec through
# the binary-column plumbing end-to-end: stage 1 synthesizes a
# deterministic int16 PCM waveform per doc and ENCODES it as an actual
# WAV container; the payload crosses Arrow back to the JVM as a binary
# column; stage 2 DECODES it with the stdlib reader and extracts
# features. The oracle computes the same features from the waveform
# formula alone — so a wrong RIFF header, byte order, or frame count
# anywhere in encode/transport/decode fails the value hash.
WAV_RATE = 16000
WAV_BASE_SAMPLES = 100  # n_samples = base + doc_id % WAV_EXTRA
WAV_EXTRA = 50

_WAV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_abs_amplitude", T.LongType()),
    ]
)


@register(
    "multimodal_wav_decode",
    f"""
    SELECT doc_id,
           {WAV_RATE} AS sample_rate,
           CAST({WAV_BASE_SAMPLES} + doc_id % {WAV_EXTRA} AS BIGINT) AS n_samples,
           CAST(SUM(ABS(((doc_id * 7919 + u.i * 104729) % 65536) - 32768)) AS BIGINT)
             AS sum_abs_amplitude
    FROM documents,
         LATERAL (SELECT unnest(generate_series(0,
             {WAV_BASE_SAMPLES} - 1 + CAST(doc_id % {WAV_EXTRA} AS INT))) AS i) u
    GROUP BY doc_id
    """,
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/WAV PCM codec through the media plumbing (see block
    comment): synthesize → encode (stdlib `wave` writer) → binary column
    through Arrow/JVM → decode (stdlib `wave` reader + struct unpack) →
    features (rate, frame count, summed |amplitude|). The oracle derives
    the same numbers from the waveform formula, so the whole container
    roundtrip is hash-gated — the strongest decode validation available
    without compressed-codec libs.

    Scale: both stages are map-only Arrow batches (the production shape
    for any per-file decode); payload bytes never reach the driver."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    rate, base, extra = WAV_RATE, WAV_BASE_SAMPLES, WAV_EXTRA

    enc_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Defined in-builder (pickled by value).
        import io
        import wave

        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = base + int(doc_id) % extra
                # Vectorized synthesis: exact in int64 (doc_id*7919 and
                # i*104729 are far below 2^63), then wrap to int16 range.
                samples = (
                    (int(doc_id) * 7919 + np.arange(n, dtype=np.int64) * 104729)
                    % 65536
                ) - 32768
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(samples.astype("<i2").tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rates, counts, sums = [], [], []
            for payload in pdf["payload"]:
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    sr = w.getframerate()
                    nf = w.getnframes()
                    raw = w.readframes(nf)
                # Vectorized decode: frombuffer is zero-copy; cast to
                # int64 BEFORE abs (|INT16_MIN| overflows int16).
                samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                rates.append(sr)
                counts.append(nf)
                sums.append(int(np.abs(samples).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(counts, dtype="int64"),
                    "sum_abs_amplitude": pd.Series(sums, dtype="int64"),
                }
            )

    encoded = d.mapInPandas(encode, schema=enc_schema)
    return encoded.mapInPandas(decode, schema=_WAV_SCHEMA)


# ---- REAL image codec: PPM (P6) -----------------------------------------
# The image half of the same idea: binary PPM (P6) is a real image
# container (header + raw RGB) parseable with zero external libs, so
# the image-decode slot also runs a REAL codec end-to-end. Deterministic
# RGB synthesis → P6 encode → binary column through Arrow → header parse
# + pixel decode → per-channel sums; oracle from the pixel formula.
PPM_BASE_W = 8
PPM_BASE_H = 6

_PPM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_red", T.LongType()),
        T.StructField("sum_green", T.LongType()),
        T.StructField("sum_blue", T.LongType()),
    ]
)


@register(
    "multimodal_ppm_decode",
    f"""
    WITH dims AS (
      SELECT doc_id,
             CAST({PPM_BASE_W} + doc_id % {PPM_BASE_W} AS INT) AS w,
             CAST({PPM_BASE_H} + doc_id % {PPM_BASE_H} AS INT) AS h
      FROM documents
    )
    SELECT d.doc_id, d.w AS width, d.h AS height,
           CAST(SUM((d.doc_id * 31 + (u.p * 3 + 0) * 97) % 256) AS BIGINT) AS sum_red,
           CAST(SUM((d.doc_id * 31 + (u.p * 3 + 1) * 97) % 256) AS BIGINT) AS sum_green,
           CAST(SUM((d.doc_id * 31 + (u.p * 3 + 2) * 97) % 256) AS BIGINT) AS sum_blue
    FROM dims d,
         LATERAL (SELECT unnest(generate_series(0, d.w * d.h - 1)) AS p) u
    GROUP BY d.doc_id, d.w, d.h
    """,
)
def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL P6/PPM image codec through the media plumbing (see the WAV
    twin above): synthesize a deterministic RGB image per doc, encode a
    real binary PPM (ASCII header + raw pixel bytes), ship it through
    Arrow as a binary column, then parse the header and decode pixels
    in a second stage — per-channel sums verified against the pixel
    formula by the oracle. With WAV, this narrows the media env-block
    strictly to compressed codecs (JPEG/PNG/MP4 need PIL/ffmpeg).

    Scale: map-only Arrow stages; the decoded features are fixed-width
    regardless of image size."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    bw, bh = PPM_BASE_W, PPM_BASE_H

    enc_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Defined in-builder (pickled by value).
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = bw + did % bw, bh + did % bh
                pixels = (
                    (did * 31 + np.arange(w * h * 3, dtype=np.int64) * 97) % 256
                ).astype(np.uint8).tobytes()
                payloads.append(f"P6\n{w} {h}\n255\n".encode("ascii") + pixels)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ws, hs, rs, gs, bs = [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                # P6 header: magic, whitespace-separated w h, maxval, one
                # whitespace byte, then w*h*3 raw bytes.
                parts = raw.split(b"\n", 3)
                assert parts[0] == b"P6", "not a P6 PPM"
                w, h = (int(x) for x in parts[1].split())
                maxval = int(parts[2])
                assert maxval == 255
                pix = np.frombuffer(parts[3], dtype=np.uint8).astype(np.int64)
                assert len(pix) == w * h * 3
                ws.append(w)
                hs.append(h)
                rs.append(int(pix[0::3].sum()))
                gs.append(int(pix[1::3].sum()))
                bs.append(int(pix[2::3].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "sum_red": pd.Series(rs, dtype="int64"),
                    "sum_green": pd.Series(gs, dtype="int64"),
                    "sum_blue": pd.Series(bs, dtype="int64"),
                }
            )

    encoded = d.mapInPandas(encode, schema=enc_schema)
    return encoded.mapInPandas(decode, schema=_PPM_SCHEMA)


# ---- REAL video container: YUV4MPEG2 (Y4M) ------------------------------
# Completing the audio/image/VIDEO trio: Y4M is a real video container
# (plain-text stream header, then per-frame FRAME markers + raw YUV
# planes) that needs no codec library. Frame-SAMPLING from a real
# container is the exact slot a production video pipeline gives ffmpeg;
# here the full parse — stream header, frame iteration, plane offsets —
# is real, and the oracle recomputes the per-frame luma sums from the
# signal formula, so a mis-parsed header or a one-byte frame-offset bug
# fails the hash.
Y4M_W = 8
Y4M_H = 6
Y4M_BASE_FRAMES = 2
Y4M_EXTRA_FRAMES = 3

_Y4M_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sum_luma", T.LongType()),
    ]
)


@register(
    "multimodal_y4m_frames",
    f"""
    WITH dims AS (
      SELECT doc_id,
             CAST({Y4M_BASE_FRAMES} + doc_id % {Y4M_EXTRA_FRAMES} AS INT) AS nf
      FROM documents
    )
    SELECT d.doc_id, {Y4M_W} AS width, {Y4M_H} AS height, d.nf AS n_frames,
           CAST(SUM((d.doc_id * 13 + u.f * 101 + u.i * 57) % 256) AS BIGINT) AS sum_luma
    FROM dims d,
         LATERAL (SELECT a.f, b.i
                  FROM (SELECT unnest(generate_series(0, d.nf - 1)) AS f) a,
                       (SELECT unnest(generate_series(0, {Y4M_W * Y4M_H - 1})) AS i) b) u
    GROUP BY d.doc_id, d.nf
    """,
)
def multimodal_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Y4M video-container frame extraction (see block comment):
    synthesize deterministic YUV444 frames, write an actual YUV4MPEG2
    stream, ship it as a binary column, then parse the stream header +
    FRAME markers and sum each frame's luma plane. Oracle from the
    signal formula — the container parse is what's under test.

    Scale: map-only Arrow stages, one row per clip out; at 100 TB this
    is the binaryFile → mapInPandas frame-sampler shape with ffmpeg in
    the decode slot instead of the stdlib parser."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    w, h, basef, extraf = Y4M_W, Y4M_H, Y4M_BASE_FRAMES, Y4M_EXTRA_FRAMES

    enc_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Defined in-builder (pickled by value).
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                nf = basef + did % extraf
                out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode())
                plane = w * h
                idx = np.arange(plane, dtype=np.int64) * 57
                for f in range(nf):
                    out += b"FRAME\n"
                    # Y plane is formula-driven (what the oracle checks);
                    # U/V planes are flat 128s (decoded but not summed).
                    out += ((did * 13 + f * 101 + idx) % 256).astype(np.uint8).tobytes()
                    out += bytes([128]) * (2 * plane)
                payloads.append(bytes(out))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ws, hs, nfs, sums = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                nl = raw.index(b"\n")
                header = raw[:nl].decode("ascii").split()
                assert header[0] == "YUV4MPEG2"
                pw = int(next(t[1:] for t in header if t.startswith("W")))
                ph = int(next(t[1:] for t in header if t.startswith("H")))
                assert any(t == "C444" for t in header), "expected YUV444"
                plane = pw * ph
                pos, nf, luma = nl + 1, 0, 0
                while pos < len(raw):
                    assert raw[pos : pos + 6] == b"FRAME\n", "bad frame marker"
                    pos += 6
                    luma += int(
                        np.frombuffer(raw, np.uint8, count=plane, offset=pos)
                        .astype(np.int64)
                        .sum()
                    )
                    pos += 3 * plane  # Y + U + V
                    nf += 1
                ws.append(pw)
                hs.append(ph)
                nfs.append(nf)
                sums.append(luma)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "sum_luma": pd.Series(sums, dtype="int64"),
                }
            )

    encoded = d.mapInPandas(encode, schema=enc_schema)
    return encoded.mapInPandas(decode, schema=_Y4M_SCHEMA)
