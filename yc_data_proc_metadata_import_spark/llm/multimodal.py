"""Multimodal (binary media) column handling (SURVEY.md SS2.13).

The pattern a multimodal training pipeline needs from the engine: media
travels as an opaque ``binary`` column with a typed metadata struct; the
engine moves/filters/joins it without touching the payload, and decode /
feature-extraction runs as Arrow-batched Python over ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED
(`decode_image` raises NotImplementedError) and feature extraction runs a
clearly-marked deterministic fake over the raw bytes — the Spark-side
plumbing (schema, partitioning, batch shape, UDF signature) is real and
tested; swapping the fake for PIL/ffmpeg changes one function.

100 TB notes: binary payloads dominate row size, so the round-trip write
keeps the source's natural partitioning (no repartition/coalesce funnel)
and metadata-only queries prune the payload column at the Parquet scan.
Feature extraction is embarrassingly parallel map-only work — Arrow moves
each batch across the JVM/Python boundary once.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` re-shaped as a media table: payload bytes + metadata.

    The payload is the UTF-8 document text standing in for image bytes
    (deterministic, codec-free); metadata is a typed struct derived
    row-locally. Schema: (doc_id, media binary, meta struct<fmt,width,
    height>).
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, "png").otherwise("jpeg").alias("fmt"),
            (64 + F.col("n_chars") % 512).cast("int").alias("width"),
            (64 + (F.col("n_chars") * 7) % 512).cast("int").alias("height"),
        ).alias("meta"),
    )


@query(
    "llm_multimodal",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
           CAST(64 + n_chars % 512 AS INTEGER) AS width,
           CAST(64 + (n_chars * 7) % 512 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha
    FROM documents
    """,
)
def llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + metadata struct, Parquet round-tripped.

    Writes the media table to Parquet and reads it back before projecting
    — proving binary payloads and nested metadata survive the sink/scan
    path byte-exactly (payload_sha is computed from the ROUND-TRIPPED
    bytes and hash-checked against DuckDB hashing the original text).
    """
    from ..sources.io import SCRATCH

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(SCRATCH, f"media_roundtrip_{sf_tag}")
    media_table(spark, sf_dir).write.mode("overwrite").parquet(out)
    rt = spark.read.parquet(out)
    return rt.select(
        "doc_id",
        F.col("meta.fmt").alias("fmt"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.length("media").cast("long").alias("n_bytes"),
        F.sha2("media", 256).alias("payload_sha"),
    )


def decode_image(data: bytes, fmt: str):
    """Real decode hook — requires an image codec library (PIL/opencv),
    which this container does not ship. Kept as the single swap point.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv (not available in this container); "
        "llm_media_features uses _fake_decode for the pipeline plumbing"
    )


def _fake_decode(data: bytes) -> "list[float]":
    """Deterministic stand-in for decode+feature-extract: byte-level stats
    standing in for pixel stats. Replace with decode_image() in production.
    """
    import numpy as np

    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return [0.0, 0.0, 0.0, 0.0]
    hist = np.bincount(arr >> 6, minlength=4).astype(np.float64) / arr.size
    return hist.tolist()


def _media_features_iter(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow batch -> per-row fake-decoded features. Batch shape: the
    driver-visible schema is (doc_id, media, meta); output one row per
    input row — mapInPandas so a future real decoder can also resample /
    drop undecodable rows.
    """
    import numpy as np

    for pdf in it:
        feats = [_fake_decode(m) for m in pdf["media"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": [m["fmt"] for m in pdf["meta"]],
                "n_bytes": [len(m) for m in pdf["media"]],
                "mean_byte": [
                    float(np.frombuffer(m, dtype=np.uint8).mean()) if len(m) else 0.0
                    for m in pdf["media"]
                ],
                "quadrant_hist": feats,
            }
        )


@query(
    "llm_media_features",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(list_filter(string_split(text, ''),
                    c -> c <> ''), c -> ascii(c))) AS DOUBLE) / length(text)
               AS mean_byte,
           [CAST(len(list_filter(string_split(text, ''),
                    c -> c <> '' AND ascii(c) // 64 = b)) AS DOUBLE) / length(text)
            FOR b IN [0, 1, 2, 3]] AS quadrant_hist
    FROM documents
    """,
)
def llm_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media via mapInPandas (decode STUB).

    Map-only Arrow pipeline: binary column in, fixed-width feature vector
    out; no shuffle, parallelism = input partitions. This is the exact
    shape real image featurization takes — only _fake_decode changes.

    Hash-checked despite the Python path: the fake features are integer
    sums/counts divided once in float64 (numpy's pairwise summation is
    exact for integers < 2^53), so DuckDB recomputing them from the
    text's codepoints produces identical bits.
    """
    return media_table(spark, sf_dir).mapInPandas(
        _media_features_iter,
        "doc_id long, fmt string, n_bytes long, mean_byte double, "
        "quadrant_hist array<double>",
    )
