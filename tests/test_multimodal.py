"""Multimodal plumbing checks: the decode stub is a deterministic fake,
so its outputs are asserted exactly against a pure-Python recomputation
of the same bytes — proving the Arrow batch path (schema, dtypes, 1→N
explode shape) carries values through unchanged."""

from __future__ import annotations

import hashlib

import duckdb

from aws_lambda_redshift_loader_spark.operators.multimodal import (
    FRAME_LEN,
    FRAME_STRIDE,
    MAX_FRAMES,
    multimodal_features,
    multimodal_frame_sample,
)

from conftest import SF_ORACLE


def _docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_ORACLE}/documents.parquet')"
    ).fetchall()


def test_features_match_python_recomputation(spark):
    got = {r.doc_id: r for r in multimodal_features(spark, SF_ORACLE).collect()}
    docs = _docs()
    assert len(got) == len(docs)
    for doc_id, text in docs[:50]:
        payload = text.encode("utf-8")
        row = got[doc_id]
        assert row.n_bytes == len(payload)
        assert abs(row.mean_byte - sum(payload) / max(len(payload), 1)) < 1e-9
        assert row.head_md5 == hashlib.md5(payload[:64]).hexdigest()


def test_frame_sample_shape_and_values(spark):
    got = {}
    for r in multimodal_frame_sample(spark, SF_ORACLE).collect():
        got.setdefault(r.doc_id, {})[r.frame_idx] = r.frame_md5
    docs = dict(_docs())
    for doc_id, frames in list(got.items())[:50]:
        text = docs[doc_id]
        n_expected = min(MAX_FRAMES, (len(text) - FRAME_LEN) // FRAME_STRIDE + 1)
        assert sorted(frames) == list(range(n_expected))  # dense 0..n-1
        for i, digest in frames.items():
            frame = text[i * FRAME_STRIDE : i * FRAME_STRIDE + FRAME_LEN]
            assert digest == hashlib.md5(frame.encode("utf-8")).hexdigest()
    # Docs shorter than one frame are absent, not emitted as empties.
    for doc_id, text in docs.items():
        if len(text) < FRAME_LEN:
            assert doc_id not in got
