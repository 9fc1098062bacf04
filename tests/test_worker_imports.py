"""Regression guard for the addPyFile worker-import fix: a driver process
that can import the engine only through a patched sys.path (cwd elsewhere,
no $PYTHONPATH) must still run Python-exec keys — workers don't inherit
driver sys.path, so without the registry's addPyFile shipping, the first
mapInPandas key dies with ModuleNotFoundError on the worker.
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as e

# llm_sim_join runs a mapInPandas GEMM — its workers MUST import the
# package (cloudpickle references it by module path).
n = e.queries()["llm_sim_join"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("WORKER_IMPORT_OK", n)
spark.stop()
"""


def test_python_exec_keys_survive_syspath_only_driver(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", _DRIVER.format(repo=_REPO)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo — cwd must not rescue the import
        env=env,
        timeout=300,
    )
    assert "WORKER_IMPORT_OK" in out.stdout, (
        f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-2000:]}"
    )
