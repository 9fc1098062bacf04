"""Audit Spark-vs-DuckDB result DTYPES for every oracle-checked key.

The driver's value-hash is dtype-sensitive (proved by agg_bool round 2:
identical values, DuckDB count_if HUGEINT vs Spark BIGINT -> hash fail,
while the local python-value compare passed).  This script surfaces every
column where the two engines return a different physical type so they can
be aligned BEFORE the driver adjudicates.

Usage: python tools/dtype_audit.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import sys
import time

import duckdb

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import yc_data_proc_metadata_import_spark as engine
from yc_data_proc_metadata_import_spark.session import get_spark
from yc_data_proc_metadata_import_spark.sources.io import TABLES, table_path

# canonical type names so "bigint"=="BIGINT"=="long"
_SPARK_CANON = {
    "tinyint": "i8", "smallint": "i16", "int": "i32", "bigint": "i64",
    "float": "f32", "double": "f64", "string": "str", "boolean": "bool",
    "date": "date", "binary": "bytes",
}
_DUCK_CANON = {
    "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "BIGINT": "i64",
    "HUGEINT": "i128", "UTINYINT": "u8", "USMALLINT": "u16", "UINTEGER": "u32",
    "UBIGINT": "u64", "FLOAT": "f32", "DOUBLE": "f64", "VARCHAR": "str",
    "BOOLEAN": "bool", "DATE": "date", "BLOB": "bytes",
}


def canon_spark(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "dec" + dt[7:]
    if dt.startswith("timestamp"):
        return "ts"
    if dt.startswith(("array", "struct", "map")):
        return dt  # compare structurally below via duck side best-effort
    return _SPARK_CANON.get(dt, dt)


def canon_duck(dt: str) -> str:
    dt = dt.upper()
    if dt.startswith("DECIMAL"):
        return "dec" + dt[7:].lower()
    if dt.startswith("TIMESTAMP"):
        return "ts"
    if dt.endswith("[]") or dt.startswith(("STRUCT", "MAP", "LIST")):
        return "nested:" + dt.lower()
    return _DUCK_CANON.get(dt, dt)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dtype-audit", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf, t)}')"
        )
    qs, os_ = engine.queries(), engine.oracle_sql()
    n_mismatch = 0
    for key in sorted(qs):
        if key not in os_:
            print(f"{key}: NO-ORACLE (rows-only)")
            continue
        t0 = time.time()
        try:
            df = qs[key](spark, sf)
            sdt = {f.name: canon_spark(f.dataType.simpleString()) for f in df.schema.fields}
            rel = con.sql(os_[key])
            ddt = {c: canon_duck(str(t)) for c, t in zip(rel.columns, rel.types)}
        except Exception as e:  # noqa: BLE001
            print(f"{key}: ERROR {type(e).__name__}: {e}")
            n_mismatch += 1
            continue
        bad = []
        for c in sdt:
            if c not in ddt:
                bad.append(f"{c}: MISSING in oracle")
            else:
                s, d = sdt[c], ddt[c]
                if s != d and not (s.startswith(("array", "struct", "map")) or d.startswith("nested")):
                    bad.append(f"{c}: spark={s} duck={d}")
        for c in ddt:
            if c not in sdt:
                bad.append(f"{c}: MISSING in spark")
        nested = [
            f"{c}: spark={sdt[c]} duck={ddt.get(c)}"
            for c in sdt
            if c in ddt and sdt[c] != ddt[c]
            and (sdt[c].startswith(("array", "struct", "map")) or str(ddt[c]).startswith("nested"))
        ]
        if bad:
            n_mismatch += 1
            print(f"{key}: MISMATCH ({time.time()-t0:.1f}s)")
            for b in bad:
                print(f"    {b}")
        else:
            tag = " [nested-skipped: " + "; ".join(nested) + "]" if nested else ""
            print(f"{key}: ok ({time.time()-t0:.1f}s){tag}")
    print(f"\n{n_mismatch} keys with dtype mismatches/errors")


if __name__ == "__main__":
    main()
