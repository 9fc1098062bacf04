"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB result set — the local stand-in for the driver's value-hash check.

The comparison happens at the ARROW level on both sides, because that is
what the driver hashes (proved twice: round-2 ``agg_bool``, DuckDB
HUGEINT arriving as decimal128(38,0) vs Spark int64 with identical
values; round-3 ``scan_typed_columns``, Spark TIMESTAMP_LTZ arriving as
``timestamp[us, tz=UTC]`` vs DuckDB's naive ``timestamp[us]``). Schema
TYPES are compared field-by-field (names sorted), then values.

Normalization rules (why each exists):
- columns sorted by name: the driver sorts columns before hashing, so
  column ORDER never matters but column NAMES must match exactly;
- Arrow types must match exactly after collapsing encodings that hold
  identical decoded values (string vs large_string);
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


def _canon_type(t) -> str:
    s = str(t)
    return s.replace("large_string", "string").replace("large_list", "list")


def _arrow_fields(table):
    return sorted((f.name, _canon_type(f.type)) for f in table.schema)


def _arrow_rows(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    rows = [tuple(_norm(v) for v in row) for row in zip(*data)]
    return cols, rows


def spark_rows(df):
    t = df.toArrow()
    cols, rows = _arrow_rows(t)
    return cols, rows, _arrow_fields(t)


def duck_rows(con, sql: str):
    t = con.execute(sql).arrow()
    cols, rows = _arrow_rows(t)
    return cols, rows, _arrow_fields(t)


def assert_match(df, con, sql: str, key: str):
    scols, srows, stypes = spark_rows(df)
    dcols, drows, dtypes = duck_rows(con, sql)
    assert scols == dcols, f"{key}: column names differ\n spark={scols}\n duck ={dcols}"
    assert stypes == dtypes, (
        f"{key}: ARROW TYPES differ (driver typed-hash would fail)\n"
        f" spark={stypes}\n duck ={dtypes}"
    )
    assert len(srows) == len(drows), f"{key}: row count {len(srows)} != {len(drows)}"
    srows.sort()
    drows.sort()
    if srows != drows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
        ][:5]
        msg = "\n".join(f"  row {i}:\n   spark={a}\n   duck ={b}" for i, a, b in diffs)
        raise AssertionError(f"{key}: value mismatch ({len(diffs)}+ rows shown)\n{msg}")
