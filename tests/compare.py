"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB result set — the local stand-in for the driver's value-hash check.

Normalization rules (why each exists):
- columns sorted by name: the driver sorts columns before hashing, so
  column ORDER never matters but column NAMES must match exactly;
- rows sorted by their normalized string form: order-insensitive;
- floats compared EXACTLY (repr bits): the driver hashes values, so a
  1-ulp drift is a failure — operators must be written order-independent
  (decimal-exact sums, identical scalar expression trees) rather than the
  test being tolerant;
- Decimal normalized via float-free string canonicalization, timestamps to
  ISO strings, bytes to hex, lists recursively.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"ts:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, _dt.date):
        return f"dt:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "m:{" + ",".join(f"{_norm(k)}={_norm(x)}" for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))) + "}"
    return f"s:{v}"


def spark_rows(df):
    cols = sorted(df.columns)
    return cols, [tuple(_norm(r[c]) for c in cols) for r in df.collect()]


def duck_rows(con, sql: str):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, [tuple(_norm(row[i]) for i in order) for row in cur.fetchall()]


def assert_match(df, con, sql: str, key: str):
    scols, srows = spark_rows(df)
    dcols, drows = duck_rows(con, sql)
    assert scols == dcols, f"{key}: column names differ\n spark={scols}\n duck ={dcols}"
    assert len(srows) == len(drows), f"{key}: row count {len(srows)} != {len(drows)}"
    srows.sort()
    drows.sort()
    if srows != drows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
        ][:5]
        msg = "\n".join(f"  row {i}:\n   spark={a}\n   duck ={b}" for i, a, b in diffs)
        raise AssertionError(f"{key}: value mismatch ({len(diffs)}+ rows shown)\n{msg}")
