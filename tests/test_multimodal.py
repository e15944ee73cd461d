"""Multimodal binary-column plumbing (operators/multimodal.py).

The codec is the deterministic FAKE codec (real image/audio libs are not in
this container); what is under test is the Spark-side design: binary column
construction JVM-side, typed-header parse via mapInPandas Arrow batches,
strided frame sampling with JVM slicing, and the decode round-trip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_source_legislation_spark.operators import multimodal

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"document body {i} " + "x" * (i * 7 % 200), "en", f"src{i % 3}", 0)
        for i in range(12)
    ]
    rows = [(i, t, lg, s, len(t)) for (i, t, lg, s, _n) in rows]
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


@pytest.fixture(scope="module")
def media(docs):
    return multimodal.synth_media_from_documents(docs).persist()


def test_metadata_header_roundtrip(docs, media):
    meta = multimodal.extract_metadata(media)
    got = {r["doc_id"]: r for r in meta.collect()}
    for d in docs.collect():
        m = got[d["doc_id"]]
        assert m["codec"] == "fake"
        assert m["n_bytes"] == 16 + len(d["text"].encode())
        assert m["width"] == d["n_chars"] % 64 + 1
        assert m["height"] == d["doc_id"] % 32 + 1


def test_decode_roundtrip(docs, media):
    decoded = multimodal.decode_media(media)
    got = {r["doc_id"]: r["decoded_text"] for r in decoded.collect()}
    for d in docs.collect():
        assert got[d["doc_id"]] == d["text"]


def test_decode_unknown_codec_raises(spark):
    bad = spark.createDataFrame(
        [(99, "image", bytearray(b"JPEGnotfake"), {})],
        schema=multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|FAKE"):
        multimodal.decode_media(bad).collect()


def test_frame_sample_strided(media):
    frames = multimodal.frame_sample(media, stride=64, frame_len=8)
    rows = frames.collect()
    assert rows, "video docs must yield frames"
    vids = {r["doc_id"] for r in rows}
    assert all(d % 3 == 2 for d in vids)
    # frame_idx dense from 0 per doc
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for idxs in per_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_resize_plan_bounds(media):
    meta = multimodal.extract_metadata(media)
    plan = multimodal.resize_plan(meta, target=16)
    for r in plan.collect():
        assert 1 <= r["out_w"] <= 16 and 1 <= r["out_h"] <= 16
        assert max(r["out_w"], r["out_h"]) <= 16


def test_media_binary_column_is_binary(media):
    assert dict(media.dtypes)["content"] == "binary"
    # header magic visible JVM-side (no Python needed for the sniff filter)
    n_fake = media.filter(
        F.expr("substring(content, 1, 4) = cast('FAKE' as binary)")
    ).count()
    assert n_fake == media.count()
