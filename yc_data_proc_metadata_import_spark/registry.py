"""Query/oracle registry backing the driver contract (__spark_entry__.py).

Every operator module registers its ``queries()`` keys here via the
``@query`` decorator.  A key maps to a callable ``(spark, sf_dir) ->
DataFrame``; when an ANSI-SQL oracle exists it is registered alongside so
the driver can hash-compare against DuckDB at sf0.01 (SURVEY.md SS5).

Convention enforced here: every registered callable first pins the session
timezone to UTC (timestamps in pyspark render in session TZ; DuckDB's are
UTC-naive — without this, any timestamp column hash-mismatches).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_PYFILES_SENT: set[int] = set()


def _ensure_worker_imports(spark: SparkSession) -> None:
    """Ship this package to the Python workers (once per SparkContext).

    cloudpickle serializes module-level functions BY REFERENCE, so every
    pandas-UDF / mapInPandas / applyInPandasWithState worker must be able
    to ``import yc_data_proc_metadata_import_spark`` itself. A driver
    process that found the package via a patched ``sys.path`` (instead of
    cwd or $PYTHONPATH, which workers inherit) would otherwise die with
    ModuleNotFoundError on the first Python-exec key. ``addPyFile`` of a
    package zip is the canonical fix and also exactly how this library
    deploys to a real cluster (``spark-submit --py-files``).
    """
    sc = spark.sparkContext
    if id(sc) in _PYFILES_SENT:
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"yc_dp_engine_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    _PYFILES_SENT.add(id(sc))


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; optionally attach a DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str, *args: Any, **kwargs: Any) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            _ensure_worker_imports(spark)
            return fn(spark, sf_dir, *args, **kwargs)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        if name in QUERIES:
            raise ValueError(f"duplicate queries() key: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def get(name: str) -> QueryFn:
    return QUERIES[name]


def run(spark: SparkSession, sf_dir: str, name: str, **kwargs: Any) -> DataFrame:
    return QUERIES[name](spark, sf_dir, **kwargs)
