"""Per-bucket wall profile of the simhash star-edge kernel (round-14
VERDICT task 2's measurement half).

Runs the PRODUCTION keyed plan (llm/dedup.py::_keyed_blocks — including
the _BUCKET_CAP pigeonhole split) but swaps the CC kernel for a timing
wrapper that emits one row per hash group: rows, bucket count, largest
(sub-)bucket, and the group's kernel wall. The driver-side summary is
the task-granularity evidence: before the cap, one group held the whole
giant bucket and its wall WAS the stage wall; after, the distribution's
max shrinks toward the mean.

Run:  SPARK_GRAFT_RUNG_DIR=.scratch/sf10 python tools/bucket_profile.py
Env:  SPARK_GRAFT_CPUS (32), SPARK_GRAFT_BUCKET_CAP (production default)

Prints one JSON object; the round's SF*_RUNG merge picks it up as
`bucket_profile`.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _profiled_kernel(pdf):
    import time as _t

    import pandas as pd

    from yc_data_proc_metadata_import_spark.llm.dedup import (
        _bucket_group_cc_edges,
    )

    t0 = _t.monotonic()
    edges = _bucket_group_cc_edges(pdf)
    wall_ms = (_t.monotonic() - t0) * 1000.0
    sizes = pdf.groupby(
        ["block_id", "block_key", "sub_id", "sub_key"], sort=False
    ).size()
    return pd.DataFrame(
        {
            "grp": [int(pdf["grp"].iloc[0]) if len(pdf) else -1],
            "n_rows": [int(len(pdf))],
            "n_buckets": [int(len(sizes))],
            "max_bucket": [int(sizes.max()) if len(sizes) else 0],
            "n_edges": [int(len(edges))],
            "wall_ms": [float(round(wall_ms, 1))],
        }
    )


def main() -> int:
    sf_dir = os.path.abspath(
        os.environ.get("SPARK_GRAFT_RUNG_DIR", "/root/testdata/sf0.1")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from yc_data_proc_metadata_import_spark.session import get_spark

    spark = get_spark(
        app_name="bucket-profile", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    from yc_data_proc_metadata_import_spark.llm import dedup

    dfp = (
        dedup.simhash_fingerprints_cached(spark, sf_dir)
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("min_doc"))
    )
    n_groups = 8 * spark.sparkContext.defaultParallelism
    keyed = dedup._keyed_blocks(dfp).withColumn(
        "grp",
        F.pmod(
            F.hash("block_id", "block_key", "sub_id", "sub_key"),
            F.lit(n_groups),
        ),
    )
    t0 = time.monotonic()
    prof = (
        keyed.groupBy("grp")
        .applyInPandas(
            _profiled_kernel,
            "grp int, n_rows long, n_buckets long, max_bucket long, "
            "n_edges long, wall_ms double",
        )
        .collect()
    )
    stage_wall = time.monotonic() - t0
    walls = sorted(float(r["wall_ms"]) for r in prof)

    def pct(p: float) -> float:
        return round(walls[min(len(walls) - 1, int(p * len(walls)))], 1)

    out = {
        "sf_dir": sf_dir,
        "bucket_cap": dedup._BUCKET_CAP,
        "n_groups": len(prof),
        "n_rows_total": sum(int(r["n_rows"]) for r in prof),
        "max_bucket_rows": max(int(r["max_bucket"]) for r in prof),
        "kernel_wall_ms": {
            "p50": pct(0.50),
            "p90": pct(0.90),
            "p99": pct(0.99),
            "max": round(walls[-1], 1),
            "sum": round(sum(walls), 1),
        },
        "stage_wall_sec": round(stage_wall, 2),
        "note": "per-hash-group kernel walls for the simhash star-edge "
                "stage; max_bucket_rows is the largest single "
                "(sub-)bucket any task BFS-verifies whole",
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
