#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md targets T1-T4).

Runs every registered ``queries()`` key at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "full_suite_wall", "value": <total sec>, "unit": "sec",
     "queries": {"<key>": sec, ...}, "sf": 0.1}

Execution is forced with the ``noop`` sink (full plan runs — scan, shuffle,
codegen — nothing collected to the driver), so timings measure the engine,
not result transfer.  A warm-up query absorbs JVM/codegen spin-up so the
first measured key isn't charged for session start.  Per-query errors are
recorded under "errors" and don't abort the suite.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf"))
    except ValueError:
        sf = None

    from yc_data_proc_metadata_import_spark.session import get_spark

    spark = get_spark(
        app_name="engine-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    import __spark_entry__ as contract

    queries = contract.queries()

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # Warm-up: JVM classloading + codegen + parquet footer reads.
    run(queries["flagship_pricing_summary"](spark, sf_dir))

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for key in sorted(queries):
        t0 = time.perf_counter()
        try:
            run(queries[key](spark, sf_dir))
            times[key] = round(time.perf_counter() - t0, 3)
            print(f"[bench] {key}: {times[key]}s", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — record, keep benching
            errors[key] = f"{type(e).__name__}: {e}"[:200]
            print(f"[bench] {key}: ERROR {errors[key]}", file=sys.stderr, flush=True)

    result = {
        "metric": "full_suite_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if errors:
        result["errors"] = errors
    line = json.dumps(result)
    print(line)
    # Durable local artifact (round-2 VERDICT: BENCH_r01 was empty and
    # BENCH_r02's captured stdout tail was truncated — keep our own
    # history instead of depending on the driver's capture).
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH_LOCAL.jsonl"), "a") as f:
            f.write(json.dumps({"ts": int(time.time()), **result}) + "\n")
    except OSError:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
