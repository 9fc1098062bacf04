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


# Frame sampling: treat the payload as a fixed-stride frame sequence
# (256-byte frames standing in for video frames), keep every 5th frame.
_FRAME_BYTES = 256
_FRAME_STRIDE = 5


def _frame_sample_iter(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow batch -> one row per SAMPLED frame. The real-codec version
    swaps the byte-slice for ffmpeg frame extraction; partitioning, fan-out
    shape (rows out > rows in), and schema stay identical."""
    import numpy as np

    for pdf in it:
        ids, idxs, lens, means = [], [], [], []
        for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
            arr = np.frombuffer(media, dtype=np.uint8)
            for fi in range(0, (arr.size + _FRAME_BYTES - 1) // _FRAME_BYTES, _FRAME_STRIDE):
                frame = arr[fi * _FRAME_BYTES : (fi + 1) * _FRAME_BYTES]
                ids.append(doc_id)
                idxs.append(fi)
                lens.append(int(frame.size))
                # exact: integer sum < 2^53 divided once in float64
                means.append(float(frame.sum(dtype=np.int64)) / frame.size)
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "frame_len": lens, "frame_mean": means}
        )


@query(
    "llm_frame_sample",
    oracle=f"""
    SELECT doc_id, f.frame_idx,
           CAST(length(substr(text, f.frame_idx * {_FRAME_BYTES} + 1, {_FRAME_BYTES}))
                AS BIGINT) AS frame_len,
           CAST(list_sum(list_transform(
                    list_filter(string_split(
                        substr(text, f.frame_idx * {_FRAME_BYTES} + 1, {_FRAME_BYTES}), ''),
                        c -> c <> ''),
                    c -> ascii(c))) AS DOUBLE)
             / length(substr(text, f.frame_idx * {_FRAME_BYTES} + 1, {_FRAME_BYTES}))
               AS frame_mean
    FROM documents,
         (SELECT unnest(range(0, 1000, {_FRAME_STRIDE})) AS frame_idx) f
    WHERE f.frame_idx * {_FRAME_BYTES} < length(text)
    """,
)
def llm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media via mapInPandas (decode STUB):
    every {_FRAME_STRIDE}th 256-byte frame, one output row per frame.

    The fan-out shape (rows out > rows in) is what a video pipeline's
    frame extraction does; map-only, so parallelism = input partitions
    and no shuffle moves payload bytes. Hash-checked: frame boundaries
    and byte means are recomputed by DuckDB from the text (ASCII fixture
    => codepoints == bytes).
    """
    return media_table(spark, sf_dir).mapInPandas(
        _frame_sample_iter,
        "doc_id long, frame_idx long, frame_len long, frame_mean double",
    )


_RESIZE_FACTOR = 4


def _media_resize_iter(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow batch -> per-row downsampled payload stats ("resize" = keep
    every 4th byte — the stride-subsample shape of nearest-neighbor image
    downscaling, minus the codec)."""
    import numpy as np

    for pdf in it:
        orig, kept, means = [], [], []
        for media in pdf["media"]:
            arr = np.frombuffer(media, dtype=np.uint8)
            small = arr[::_RESIZE_FACTOR]
            orig.append(int(arr.size))
            kept.append(int(small.size))
            means.append(
                float(small.sum(dtype=np.int64)) / small.size if small.size else 0.0
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "orig_bytes": orig,
                "resized_bytes": kept,
                "resized_mean": means,
            }
        )


@query(
    "llm_media_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS orig_bytes,
           CAST(len(kept) AS BIGINT) AS resized_bytes,
           CAST(list_sum(kept) AS DOUBLE) / len(kept) AS resized_mean
    FROM (
        SELECT doc_id, text,
               list_transform(
                   list_filter(range(1, length(text) + 1),
                               i -> (i - 1) % {_RESIZE_FACTOR} = 0),
                   i -> ascii(substr(text, CAST(i AS INTEGER), 1))) AS kept
        FROM documents)
    """,
)
def llm_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride "resize" of binary media via mapInPandas (decode STUB):
    keep every {_RESIZE_FACTOR}th byte, report original/resized sizes and
    the exact resized mean. Map-only Arrow plumbing identical to a real
    nearest-neighbor downscale; hash-checked via DuckDB recomputing the
    stride subsample from the text."""
    return media_table(spark, sf_dir).mapInPandas(
        _media_resize_iter,
        "doc_id long, orig_bytes long, resized_bytes long, resized_mean double",
    )
