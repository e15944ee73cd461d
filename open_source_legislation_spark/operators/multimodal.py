"""Multimodal columns — opaque ``binary`` payloads with typed metadata.

The reference is text-only; a 100 TB training-data pipeline also carries
image/audio/video blobs. Design: media rows are ``(doc_id, media_type,
content: binary, meta: map<string,string>)``; every stage is Spark-native
plumbing (schema, partitioning, Arrow batch shape) with the codec itself
stubbed — the actual image/audio libraries are not in this container, so
``decode_media`` raises ``NotImplementedError`` unless the payload uses the
deterministic FAKE codec produced by :func:`synth_media_from_documents`.

The FAKE codec is a 16-byte header::

    b"FAKE" | media_type[0:4] | width:uint32le | height:uint32le

followed by the raw utf-8 "pixel" bytes. It exists so the full pipeline —
binary column in parquet, header parse, resize bookkeeping, frame sampling —
is real and testable end-to-end without external codecs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

_HEADER = b"FAKE"
_HEADER_LEN = 16


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table: the text
    bytes become the payload, width/height derive from doc stats. Pure
    column expressions — the binary column is built JVM-side."""
    width = (F.col("n_chars") % 64 + 1).cast("int")
    height = (F.col("doc_id") % 32 + 1).cast("int")
    mtype = F.when(F.col("doc_id") % 3 == 0, "image").when(
        F.col("doc_id") % 3 == 1, "audio"
    ).otherwise("video")
    # FAKE header little-endian uint32: byte-reverse the 8-hex-digit form.
    def le32(c):
        h = F.lpad(F.hex(c), 8, "0")
        return F.unhex(
            F.concat(
                F.substring(h, 7, 2),
                F.substring(h, 5, 2),
                F.substring(h, 3, 2),
                F.substring(h, 1, 2),
            )
        )
    content = F.concat(
        F.lit(_HEADER),
        F.encode(F.rpad(F.substring(mtype, 1, 4), 4, "\x00"), "utf-8"),
        le32(width),
        le32(height),
        F.encode(F.col("text"), "utf-8"),
    )
    return docs.select(
        "doc_id",
        mtype.alias("media_type"),
        content.alias("content"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """Parse the typed header out of the binary column — ``mapInPandas`` so
    each Arrow batch is handled vectorized (the shape a real codec sniffing
    stage would use; cf. reference per-node ``core_metadata`` enrichment,
    ``scrapeECFR.py:359-360``)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["content"]
            # nullable Int64: a null payload must not crash the int cast
            n_bytes = raw.map(len, na_action="ignore").astype("Int64")
            is_fake = raw.map(
                lambda b: b is not None
                and len(b) >= _HEADER_LEN
                and bytes(b[:4]) == _HEADER
            )
            # where() masks non-fake rows to NaN; guard on bytes-like, not
            # just None, so masked rows stay null instead of crashing unpack
            def _u32(off):
                return lambda b: (
                    struct.unpack("<I", bytes(b[off : off + 4]))[0]
                    if isinstance(b, (bytes, bytearray, memoryview))
                    else None
                )

            width = raw.where(is_fake).map(_u32(8))
            height = raw.where(is_fake).map(_u32(12))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "codec": is_fake.map(lambda f: "fake" if f else "unknown"),
                    "width": width.astype("Int32"),
                    "height": height.astype("Int32"),
                }
            )

    return media.mapInPandas(parse, schema=META_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode payload → content text. Real codecs (PIL/ffmpeg/soundfile) are
    NOT available in this container; only the FAKE codec is implemented, and
    any other payload raises ``NotImplementedError`` — clearly-marked stub,
    the Spark-side plumbing (schema, Arrow batching) is the real design."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("decoded_text", T.StringType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(b) -> str:
                if b is None:
                    return None
                b = bytes(b)
                if b[:4] != _HEADER:
                    raise NotImplementedError(
                        "real media codecs are not available in this "
                        "environment; only the deterministic FAKE codec "
                        "is decodable"
                    )
                return b[_HEADER_LEN:].decode("utf-8")

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "decoded_text": pdf["content"].map(one)}
            )

    return media.mapInPandas(decode, schema=out_schema)


def frame_sample(media: DataFrame, stride: int = 64, frame_len: int = 8) -> DataFrame:
    """Sample fixed-length "frames" from the payload at a byte stride —
    the video frame-sampling shape (explode of a computed offsets array,
    slicing done JVM-side on the binary column; no Python in the loop)."""
    body_len = F.octet_length("content") - _HEADER_LEN
    offsets = F.sequence(
        F.lit(0),
        F.greatest(
            (body_len - frame_len) .cast("long"), F.lit(0)
        ),
        F.lit(stride),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", F.posexplode(offsets).alias("frame_idx", "offset"))
        .join(media.select("doc_id", "content"), "doc_id")
        .select(
            "doc_id",
            "frame_idx",
            F.base64(
                F.expr(f"substring(content, offset + {_HEADER_LEN + 1}, {frame_len})")
            ).alias("frame_b64"),
        )
    )


def resize_plan(meta: DataFrame, target: int = 16) -> DataFrame:
    """Resize bookkeeping for images: scale factors + output dims as pure
    column math (the compute-plan a real resize UDF would execute)."""
    scale = F.least(
        F.lit(float(target)) / F.col("width"), F.lit(float(target)) / F.col("height")
    )
    return meta.filter(F.col("media_type") == "image").select(
        "doc_id",
        "width",
        "height",
        F.round(scale, 4).alias("scale"),
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("out_h"),
    )
