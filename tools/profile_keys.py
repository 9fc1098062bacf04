"""Per-key adjudication-cost profile: how long the driver's correctness
loop spends on each key at sf0.01 (Spark execute+collect AND DuckDB
oracle execute+fetch). The driver's budget covered only 50/131 keys in
round 2 — this finds the wall-time hogs to shrink.

Usage: python tools/profile_keys.py [sf_dir] [key ...]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import yc_data_proc_metadata_import_spark as engine
from yc_data_proc_metadata_import_spark.session import get_spark
from yc_data_proc_metadata_import_spark.sources.io import TABLES, table_path


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="key-profile", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf, t)}')"
        )
    qs, os_ = engine.queries(), engine.oracle_sql()
    rows = []
    for key in sorted(qs):
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            n = len(qs[key](spark, sf).collect())
            t_spark = time.time() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{key}: SPARK ERROR {e}", flush=True)
            continue
        t1 = time.time()
        try:
            if key in os_:
                dn = len(con.execute(os_[key]).fetchall())
            else:
                dn = -1
            t_duck = time.time() - t1
        except Exception as e:  # noqa: BLE001
            print(f"{key}: DUCK ERROR {e}", flush=True)
            continue
        rows.append((t_spark + t_duck, t_spark, t_duck, key, n, dn))
        print(
            f"{key}: total={t_spark + t_duck:.2f}s spark={t_spark:.2f}s "
            f"duck={t_duck:.2f}s rows={n}",
            flush=True,
        )
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\nTOTAL {total:.1f}s over {len(rows)} keys; top 15:")
    for tt, ts, td, key, n, dn in rows[:15]:
        print(f"  {key}: {tt:.2f}s (spark {ts:.2f} / duck {td:.2f})")
    with open("/tmp/key_profile.json", "w") as f:
        json.dump(
            {k: {"total": tt, "spark": ts, "duck": td} for tt, ts, td, k, n, dn in rows},
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
