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


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; optionally attach a DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str, *args: Any, **kwargs: Any) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
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
