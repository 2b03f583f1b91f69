"""Multimodal columns — opaque binary payloads with typed metadata
(task brief): decode / feature-extract / resize / frame-sample plumbing.

The Spark-side machinery (schemas, partition-aware batching, Arrow UDF
signatures, pruning of the wide binary column after extraction) is REAL and
tested; the codec step is STUBBED because no image/audio libraries exist in
this container: ``decode_media`` raises NotImplementedError for real codecs
and a deterministic fake codec ("fake/*" media types) stands in so the
pipeline shape is exercised end-to-end.

Pattern notes for 100 TB: media bytes behave exactly like the crawl's
`html binary` column — never shuffle them; extract features in ONE
mapInPandas pass right after the scan, drop the binary column immediately,
and bound Arrow batch bytes via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # e.g. fake/image, image/jpeg
        StructField("payload", BinaryType()),
        StructField("meta_json", StringType()),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha16", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def decode_media(media_type: str, payload: bytes) -> dict:
    """Codec seam. Real codecs are unavailable in this container — the
    fake/* types give a deterministic stand-in so the Spark plumbing is
    testable; anything else raises loudly rather than fabricating data."""
    if media_type.startswith("fake/"):
        d = hashlib.sha256(payload).digest()
        return {
            "width": 16 + d[0] % 240,
            "height": 16 + d[1] % 240,
            "n_frames": 1 if media_type == "fake/image" else 1 + d[2] % 64,
        }
    raise NotImplementedError(
        f"no codec for {media_type}: install pillow/av and extend decode_media"
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """One Arrow pass: (media_id, media_type, payload) → typed features.

    The binary column is consumed here and MUST NOT survive downstream —
    callers select from the returned frame only.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                blob = bytes(payload) if payload is not None else b""
                feats = decode_media(mtype, blob)
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "n_bytes": len(blob),
                        "sha16": hashlib.sha256(blob).digest()[:16],
                        "width": feats["width"],
                        "height": feats["height"],
                        "n_frames": feats["n_frames"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES.fields])

    return media.select("media_id", "media_type", "payload").mapInPandas(run, FEATURES)


def frame_sample_plan(features: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic frame-sampling plan: which frame indices to decode per
    video, as a column expression over an ALREADY-extracted features frame
    (pure JVM — no second decode pass; callers hold on to the
    extract_media_features output precisely so the wide payload column is
    crossed once)."""
    return features.select(
        "media_id",
        F.sequence(
            F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
        ).alias("frame_indices"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents (test/bench
    input): payload = UTF-8 text bytes, type alternates image/video."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("fake/image"))
        .otherwise(F.lit("fake/video"))
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.col("lang"), F.col("n_chars"))).alias("meta_json"),
    )
