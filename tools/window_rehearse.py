"""Rehearse the driver's correctness gate on the EXACT upcoming window.

The adjudication gate walks ``queries()`` in dict order and checks the
first 50 keys at sf0.01 (rows + schema + Arrow-level value hash against
the DuckDB oracle).  This tool replays precisely that: an externally
built SparkSession (the driver hands us one we didn't configure), the
first N keys of the live rotation order, and the driver-faithful
comparator (tests/compare.py).  Run it from a COLD scratch
(``rm -rf .scratch``) before ending a round — the r3/r4
``scan_typed_columns`` reds were stale-fixture artifacts exactly this
replay would have caught.

Usage: python tools/window_rehearse.py [sf_dir] [n_keys]
       (defaults: /root/testdata/sf0.01, 50)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb
    from pyspark.sql import SparkSession

    from tests.compare import assert_match
    import __spark_entry__ as contract

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    q, o = contract.queries(), contract.oracle_sql()
    window = list(q)[:n]
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    fails: list[str] = []
    t0 = time.time()
    for k in window:
        try:
            assert_match(q[k](spark, sf), con, o[k], k)
        except Exception as ex:  # noqa: BLE001 — report every key
            fails.append(k)
            print(f"FAIL {k}: {str(ex)[:300]}")
    print(
        f"window {n}: {n - len(fails)}/{n} green in {time.time() - t0:.1f}s"
        f" at {sf}"
    )
    print("order:", " ".join(window))
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
