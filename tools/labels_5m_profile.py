#!/usr/bin/env python
"""Run llm_dedup_simhash_labels on the docs-only sf100 fixture (5M docs).

Rounds 14/15 recorded this decade as ad-hoc snippets merged into
SF100_RUNG_r{14,15}.json; this makes the run reproducible.  The corpus
(1000 near-copies per sf0.1 base doc) collapses to ONE component by
construction, so the row is a WALL/SCALE datapoint plus the invariant
battery — exactness evidence for the algorithm lives in the sf1/sf10
exhaustive fixpoints and the hard-corpus runs (HARD_LABEL_FIXPOINT_*).

Invariants asserted (the r15 set):
  - one output row per non-empty doc;
  - exactly one cluster, its id 0 (doc 0 is the global min doc_id);
  - keep marks exactly the representative (count == cluster count);
  - no label exceeds its doc_id (min-label semantics).

Usage: python tools/labels_5m_profile.py [docs_dir] [out_json]
       (defaults: .scratch/sf100_docs, LABELS_5M_r17.json)
Run solo — the fingerprint + propagation stages assume the host.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    docs_dir = os.path.abspath(
        sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scratch", "sf100_docs")
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "LABELS_5M_r17.json"
    )
    if not os.path.isdir(docs_dir):
        print(f"docs fixture missing — SPARK_GRAFT_SF1_OUT={docs_dir} "
              "SPARK_GRAFT_SF1_COPIES=1000 SPARK_GRAFT_SF1_TABLES=documents "
              "tools/make_sf1.py first")
        return 2

    from pyspark.sql import functions as F

    import yc_data_proc_metadata_import_spark as engine
    from yc_data_proc_metadata_import_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="labels-5m", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    q = engine.queries()["llm_dedup_simhash_labels"]

    t0 = time.perf_counter()
    out = q(spark, docs_dir)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.sum("cluster_id").alias("sum_cluster_id"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum((F.col("cluster_id") > F.col("doc_id")).cast("long")).alias(
            "n_bad_label"
        ),
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 1)

    report = {
        "docs_dir": docs_dir,
        "n_rows": agg["n_rows"],
        "n_clusters": agg["n_clusters"],
        "sum_cluster_id": agg["sum_cluster_id"],
        "n_keep": agg["n_keep"],
        "n_bad_label": agg["n_bad_label"],
        "end_to_end_sec": wall,
        "invariants_ok": bool(
            agg["n_clusters"] == 1
            and agg["sum_cluster_id"] == 0
            and agg["n_keep"] == agg["n_clusters"]
            and agg["n_bad_label"] == 0
        ),
        "note": (
            "wall/scale datapoint: replicated corpus collapses to one "
            "component by construction; exactness evidence = sf1/sf10 "
            "exhaustive fixpoints + HARD_LABEL_FIXPOINT (fragmenting and "
            "supercritical topologies, 0 mismatches)"
        ),
    }
    line = json.dumps(report, indent=1)
    print(line)
    with open(out_json, "w") as f:
        f.write(line + "\n")
    return 0 if report["invariants_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
