"""Physical-plan census: Exchange / Sort / BroadcastNestedLoop / Python
node counts for every registered key, to spot shuffle-heavy or
accidentally-cartesian plans. Shows the plan SHAPE the driver's queries
execute (AQE may still coalesce/replace at runtime).

Usage: PYTHONPATH=. python tools/plan_audit.py [sf_dir] [key ...]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import yc_data_proc_metadata_import_spark as engine
from yc_data_proc_metadata_import_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="plan-audit", shuffle_partitions=8)
    rows = []
    for key, fn in sorted(engine.queries().items()):
        if only and key not in only:
            continue
        try:
            df = fn(spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            nodes = re.findall(r"^\(\d+\) (\w+)", buf.getvalue(), re.M)
        except Exception as e:  # noqa: BLE001
            print(f"{key}: ERROR {type(e).__name__}: {e}"[:160])
            continue
        counts = {
            "ex": sum(1 for n in nodes if n == "Exchange"),
            "sort": sum(1 for n in nodes if n == "Sort"),
            "bnl": sum(1 for n in nodes if "NestedLoop" in n),
            "cart": sum(1 for n in nodes if "Cartesian" in n),
            "py": sum(1 for n in nodes if n in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas")),
        }
        rows.append((key, counts))
    rows.sort(key=lambda r: (-r[1]["ex"], r[0]))
    for key, c in rows:
        flag = " <-- CARTESIAN" if c["cart"] or c["bnl"] else ""
        print(f"{c['ex']:3d} ex {c['sort']:3d} sort {c['py']:2d} py  {key}{flag}")


if __name__ == "__main__":
    main()
