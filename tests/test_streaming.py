"""Streaming-specific invariants beyond oracle parity: the watermark key
must actually exercise the late-drop path (not just produce matching
output), and the controlled three-batch fixture must split as designed.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from yc_data_proc_metadata_import_spark.sources.io import SCRATCH
from yc_data_proc_metadata_import_spark.streaming.stream_queries import (
    _read_stream,
    _stream_three_batch_src,
)


def test_watermark_drops_late_rows(spark, sf_dir):
    src = _stream_three_batch_src(spark, sf_dir)
    agg = (
        _read_stream(spark, src, maxFilesPerTrigger=1, latestFirst=False)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    chk = f"{SCRATCH}/checkpoints/test_wm_drops"
    shutil.rmtree(chk, ignore_errors=True)
    q = (
        agg.writeStream.format("memory")
        .queryName("test_wm_drops")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    # three data batches, in the constructed order
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) == 3, [p["numInputRows"] for p in progress]
    dropped = sum(
        op["numRowsDroppedByWatermark"] for p in progress for op in p["stateOperators"]
    )
    assert dropped > 0, "late batch was not dropped by the watermark"
    # drops happen only in the last (late) batch
    late = data_batches[-1]
    assert all(
        op["numRowsDroppedByWatermark"] == 0
        for p in data_batches[:-1]
        for op in p["stateOperators"]
    )
    assert sum(op["numRowsDroppedByWatermark"] for op in late["stateOperators"]) > 0
