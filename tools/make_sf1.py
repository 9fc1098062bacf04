#!/usr/bin/env python
"""Build a deterministic ~sf1 (10x sf0.1) scale rung under .scratch/sf1.

Round-11 VERDICT item 2: the engine's 100 TB claims are plan-asserted but
the largest measured data point was sf0.1 (600 k lineitem rows).  This
tool manufactures the next rung — one decade up, ~6 M lineitem rows —
WITHOUT touching the read-only driver testdata: each scalable table is
replicated COPIES times with every key column offset by ``copy * span``
(span = max(key)+1, keys are 0-based dense), so referential integrity
holds exactly (copy i's lineitem rows reference copy i's orders/parts/
suppliers, copy i's orders reference copy i's customers).  The fixed
dimensions (region, nation) are byte-identical copies; nationkey FKs
therefore stay valid in every replica.

Replication is NOT a no-op for the interesting operators, by design:

- ``documents``: copy i>0 gets a 3-char ``c<i> `` text prefix (and the
  recomputed n_chars), so the 10 replicas of a doc are NEAR-duplicates,
  not exact ones — every MinHash/SimHash collision bucket gains a
  10-clique, a deliberate skew stress for the banded dedup family
  (quadratic work stays confined to buckets; this rung measures that).
- ``embeddings``: copy i adds a constant i*1e-3 to every coordinate —
  a direction change (cosine is scale-invariant, so scaling would be a
  degenerate tie), keeping ANN/top-k rankings tie-free and exact ties
  out of the Spark-vs-DuckDB comparison.  The perturbed float32 values
  are baked into the parquet, so both engines read identical bits.
- everything else replicates verbatim with offset keys: groupBy results
  scale their counts 10x, joins scale their row counts, distributions
  (dates, prices, flags) are preserved exactly.

Pure SQL over fixed input — no RNG, no timestamps — so the output is
bit-reproducible (TESTDATA.md seed-42 discipline).  DuckDB does the
transform; output is one parquet per table (zstd), ~10x sf0.1 bytes.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF1_SRC", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("SPARK_GRAFT_SF1_OUT", os.path.join(REPO, ".scratch", "sf1"))
COPIES = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))
# sf100-scale knobs (round-13 VERDICT task 5): SPARK_GRAFT_SF1_TABLES
# restricts generation to a comma-separated subset (the sf100 probe
# replays bounded-output RELATIONAL keys only, so documents/embeddings
# are wasted bytes there), and SPARK_GRAFT_SF1_CHUNK=<copies per file>
# writes each scaled table as a DIRECTORY of chunk parquets — one
# bounded DuckDB sort per chunk instead of a single 600M-row external
# sort that would eat the disk in temp spill. Unset => single-file
# output, byte-identical to previous rounds.
TABLES_FILTER = {
    t for t in os.environ.get("SPARK_GRAFT_SF1_TABLES", "").split(",") if t
}
CHUNK = int(os.environ.get("SPARK_GRAFT_SF1_CHUNK", "0"))

# (table, [key columns offset by that table's OWN span], {fk column -> parent table})
FIXED = ("region", "nation")
SCALED: dict[str, dict] = {
    "customer": {"own": ["c_custkey"], "fk": {}},
    "supplier": {"own": ["s_suppkey"], "fk": {}},
    "part": {"own": ["p_partkey"], "fk": {}},
    "orders": {"own": ["o_orderkey"], "fk": {"o_custkey": "customer"}},
    "lineitem": {
        "own": [],
        "fk": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    },
    "events": {"own": ["event_id"], "fk": {}, "user": ["user_id"]},
    "documents": {"own": ["doc_id"], "fk": {}},
    "embeddings": {"own": ["vec_id"], "fk": {}},
}
# span lookup key: which table's key defines the offset for an fk column
SPAN_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
}


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    spans: dict[str, int] = {}
    for t, keycol in SPAN_KEY.items():
        spans[t] = (
            con.sql(
                f"SELECT max({keycol}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchone()[0]
        )
    # user_id shares events' row space but has its own span
    user_span = con.sql(
        f"SELECT max(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]

    def wanted(t: str) -> bool:
        return not TABLES_FILTER or t in TABLES_FILTER

    for t in FIXED:
        if not wanted(t):
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO "
            f"'{OUT}/{t}.parquet' (FORMAT parquet, COMPRESSION zstd)"
        )
        print(f"[sf1] {t}: copied verbatim", flush=True)

    for t, spec in SCALED.items():
        if not wanted(t):
            continue
        # (name, duckdb type) pairs: the offset arithmetic below
        # (col + copy_i * span, with range() yielding BIGINT) widens
        # 32-bit key columns to BIGINT, so every offset expression casts
        # back to the SOURCE type — the rung parquet stays byte-
        # compatible with the sf0.1 schema (round-12 ADVICE).
        cols = [
            (c[0], c[1])
            for c in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        exprs = []
        for c, typ in cols:
            if c in spec["own"]:
                exprs.append(f"CAST({c} + copy_i * {spans[t]} AS {typ}) AS {c}")
            elif c in spec["fk"]:
                exprs.append(
                    f"CAST({c} + copy_i * {spans[spec['fk'][c]]} AS {typ}) AS {c}"
                )
            elif c in spec.get("user", ()):
                exprs.append(f"CAST({c} + copy_i * {user_span} AS {typ}) AS {c}")
            elif t == "documents" and c == "text":
                exprs.append(
                    "CASE WHEN copy_i = 0 THEN text "
                    "ELSE 'c' || copy_i || ' ' || text END AS text"
                )
            elif t == "documents" and c == "n_chars":
                # recompute from the constructed text (prefix length is
                # 2 + digits(copy_i), so never hard-code it)
                exprs.append(
                    "CAST(length(CASE WHEN copy_i = 0 THEN text "
                    "ELSE 'c' || copy_i || ' ' || text END) AS BIGINT) AS n_chars"
                )
            elif t == "embeddings" and c == "embedding":
                exprs.append(
                    "list_transform(embedding, x -> "
                    "CAST(x + copy_i * 0.001 AS FLOAT)) AS embedding"
                )
            else:
                exprs.append(c)
        if CHUNK:
            dest = f"{OUT}/{t}.parquet"
            # Clear any prior chunk set first: re-running with fewer
            # COPIES / a different CHUNK would otherwise leave stale
            # part-*.parquet files that the glob silently includes,
            # inflating row counts past the audits (round-14 ADVICE).
            shutil.rmtree(dest, ignore_errors=True)
            os.makedirs(dest)
            for lo in range(0, COPIES, CHUNK):
                hi = min(lo + CHUNK, COPIES)
                con.execute(
                    f"COPY (SELECT {', '.join(exprs)} "
                    f"FROM read_parquet('{SRC}/{t}.parquet') "
                    f"CROSS JOIN (SELECT unnest(range({lo}, {hi})) AS copy_i) "
                    f"ORDER BY copy_i) TO '{dest}/part-{lo:06d}.parquet' "
                    f"(FORMAT parquet, COMPRESSION zstd)"
                )
            read_src = f"{dest}/*.parquet"
        else:
            con.execute(
                f"COPY (SELECT {', '.join(exprs)} "
                f"FROM read_parquet('{SRC}/{t}.parquet') "
                f"CROSS JOIN (SELECT unnest(range({COPIES})) AS copy_i) "
                f"ORDER BY copy_i) TO '{OUT}/{t}.parquet' "
                f"(FORMAT parquet, COMPRESSION zstd)"
            )
            read_src = f"{OUT}/{t}.parquet"
        n = con.sql(f"SELECT count(*) FROM read_parquet('{read_src}')").fetchone()[0]
        print(f"[sf1] {t}: {n} rows", flush=True)

    # integrity audit: FK joins lose no rows, key spaces stay disjoint-dense
    def rp(t: str) -> str:
        # chunked scaled tables are directories of part files
        p = f"{OUT}/{t}.parquet"
        return f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"read_parquet('{p}')"

    audits = [
        (("lineitem", "orders"), "lineitem->orders", "SELECT count(*) FROM {lineitem} l LEFT JOIN {orders} o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"),
        (("orders", "customer"), "orders->customer", "SELECT count(*) FROM {orders} o LEFT JOIN {customer} c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"),
        (("lineitem", "part"), "lineitem->part", "SELECT count(*) FROM {lineitem} l LEFT JOIN {part} p ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL"),
        (("lineitem", "supplier"), "lineitem->supplier", "SELECT count(*) FROM {lineitem} l LEFT JOIN {supplier} s ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL"),
        (("customer",), "custkey-unique", "SELECT count(*) - count(DISTINCT c_custkey) FROM {customer}"),
        (("orders",), "orderkey-unique", "SELECT count(*) - count(DISTINCT o_orderkey) FROM {orders}"),
        (("documents",), "docid-unique", "SELECT count(*) - count(DISTINCT doc_id) FROM {documents}"),
        (("documents",), "nchars-consistent", "SELECT count(*) FROM {documents} WHERE n_chars != length(text)"),
    ]
    paths = {t: rp(t) for t in list(SCALED) + list(FIXED)}
    ok = True
    for needs, name, sql in audits:
        if not all(wanted(t) for t in needs):
            print(f"[sf1] audit {name}: SKIPPED (table filter)", flush=True)
            continue
        v = con.sql(sql.format(**paths)).fetchone()[0]
        status = "OK" if v == 0 else f"FAIL ({v})"
        ok = ok and v == 0
        print(f"[sf1] audit {name}: {status}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
