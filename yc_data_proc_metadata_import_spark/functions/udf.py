"""UDF / UDAF / UDTF surface (SURVEY.md SS2.12).

The escape hatches, in preference order for 100 TB:
1. built-ins / higher-order functions (functions/scalar.py) — always first;
2. pandas UDF (udf_pandas) — Arrow-batched, vectorized, ~10-100x the
   row-at-a-time UDF;
3. applyInPandas (udaf_grouped) — whole-group custom aggregation;
4. Python UDTF (udtf_explode) — one-to-many row expansion;
5. row-at-a-time Python UDF (udf_scalar) — kept ONLY as the API demo; its
   per-row serialization is the canonical hot-path anti-pattern.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..registry import query
from ..sources.io import load


@query(
    "udf_scalar",
    oracle="""
    SELECT c_custkey,
           lower(c_mktsegment) || ':' || CAST(length(c_name) AS VARCHAR) AS segment_tag
    FROM customer
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path — every row crosses the
    JVM<->Python boundary individually).  Exists to cover the API; the
    same logic belongs in built-ins everywhere else."""

    @F.udf(returnType=StringType())
    def segment_tag(seg: str, name: str) -> str:
        return f"{seg.lower()}:{len(name)}"

    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", segment_tag("c_mktsegment", "c_name").alias("segment_tag")
    )


@query(
    "udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS gross
    FROM lineitem
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF: whole Arrow batches cross the boundary, the
    arithmetic runs on numpy arrays — element-wise IEEE ops, so results
    are bit-identical to the SQL expression."""

    @F.pandas_udf("double")
    def gross(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        gross("l_extendedprice", "l_discount").alias("gross"),
    )


@query(
    "udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS HUGEINT)) AS BIGINT) AS sum_price_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom whole-group aggregation via applyInPandas.  The group's rows
    arrive as ONE pandas frame (requires a shuffle on the key and the
    group fitting in executor memory — at 100 TB keep keys high-cardinality
    or pre-aggregate).  Sums use integer cents so Python and SQL agree
    exactly."""
    import numpy as np

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        price = pdf["l_extendedprice"]
        cents = np.floor(price.to_numpy() * 100.0 + 0.5).astype("int64")
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_rows": [len(pdf)],
                "min_price": [price.min()],
                "max_price": [price.max()],
                "sum_price_cents": [cents.sum()],
            }
        )

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    return li.groupBy("l_returnflag").applyInPandas(
        stats,
        schema="l_returnflag string, n_rows long, min_price double, max_price double, sum_price_cents long",
    )


@query(
    "udtf_explode",
    oracle="""
    SELECT t.doc_id, CAST(u.i AS INTEGER) AS pos, u.x AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents WHERE doc_id < 50) t,
         LATERAL (SELECT unnest(l) AS x, generate_subscripts(l, 1) AS i) u
    """,
)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row -> many output rows, lateral
    joined.  Tokenizes documents into (pos, token) rows; positions are
    1-based to match SQL generate_subscripts."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok

    spark.udtf.register("engine_tokenize", Tokenize)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM udtf_docs d, LATERAL engine_tokenize(d.text) t"
    )


def _order_lines_merge(key, orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame):
    """Cogrouped merge: one output row per order of this key with its
    line stats (exact integer-cent sums — order-independent)."""
    if orders_pdf.empty:
        return pd.DataFrame(
            columns=["o_orderkey", "price_cents", "n_lines", "qty_sum"]
        )
    import numpy as np

    qty = np.int64(0)
    n = 0
    if not lines_pdf.empty:
        qty = lines_pdf["l_quantity"].astype("int64").sum()
        n = len(lines_pdf)
    row = orders_pdf.iloc[0]
    return pd.DataFrame(
        {
            "o_orderkey": [row["o_orderkey"]],
            "price_cents": [
                int(np.floor(row["o_totalprice"] * 100 + 0.5))
            ],
            "n_lines": [n],
            "qty_sum": [int(qty)],
        }
    )


@query(
    "udf_cogrouped",
    oracle="""
    SELECT o.o_orderkey,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
           CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
           CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0) AS BIGINT) AS qty_sum
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 400 = 0
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
)
def udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED pandas API — the last piece of the pandas-UDF surface
    (SS2.12) after scalar / grouped-agg / grouped-map / mapInPandas:
    ``df.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas(fn)`` hands
    the function BOTH sides' Arrow batches for each key — the escape
    hatch for per-key logic no join expresses (custom as-of matching,
    per-entity reconciliation, trajectory alignment).

    Here the merge itself is deliberately join-expressible (order
    header + its line stats) so the full result hash-checks against a
    plain LEFT JOIN oracle; orders with no lines prove the empty-side
    path. Scale shape: one co-partitioning shuffle on the key for each
    side, then per-key Python with Arrow transfer. The honest cost
    model: the function is invoked ONCE PER KEY, so cogrouped pandas
    fits low-cardinality entity keys or heavy per-key logic — for a
    trivial merge over millions of keys the per-invocation overhead
    dominates and a join is the right tool (measured: 15k keys of
    1-row work ran ~10x slower than 1.5k; 1.5k keys still cost ~4 s of
    pure per-invocation overhead at sf0.1). The keyset is therefore
    capped to the hundreds (o_orderkey % 400 — ~375 keys at sf0.1,
    ~38 at the sf0.01 adjudication tier, which retains an order with
    zero lineitems so the empty-side path stays proven).
    """
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 400 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    lines = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    lines = lines.join(
        orders.select(F.col("o_orderkey").alias("k")),
        lines.l_orderkey == F.col("k"),
        "left_semi",
    )
    return (
        orders.groupBy("o_orderkey")
        .cogroup(lines.groupBy("l_orderkey"))
        .applyInPandas(
            _order_lines_merge,
            "o_orderkey long, price_cents long, n_lines long, qty_sum long",
        )
    )


def _arrow_doc_stats(it):
    """Arrow-native batch transform: byte/char lengths computed with
    pyarrow.compute kernels — no pandas materialization at all."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in it:
        text = batch.column("text")
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(pc.utf8_length(text), pa.int64()),
                pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
            ],
            ["doc_id", "n_chars_arrow", "n_bytes_arrow"],
        )


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_arrow,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_arrow
    FROM documents
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-conversion sibling of mapInPandas: the
    function receives raw ``pyarrow.RecordBatch``es and answers with
    RecordBatches, skipping the Arrow->pandas->Arrow round-trip
    entirely. That conversion is the dominant per-batch cost for
    wide/binary rows (pandas materializes python objects for strings),
    so arrow-native is the right default for byte-level media/text
    work; columns here are computed with pyarrow.compute kernels (C++,
    vectorized). Map-only — partition-parallel, no shuffle."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInArrow(
            _arrow_doc_stats,
            "doc_id long, n_chars_arrow long, n_bytes_arrow long",
        )
    )


@query(
    "udtf_polymorphic",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(length(n_name) AS INTEGER) AS name_len
    FROM nation
    """,
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF with a TABLE argument (Spark 4): the
    class's static ``analyze()`` runs at PLAN time and derives the
    output schema from the incoming table's schema (all input fields +
    a computed column) — the generic-transform surface that lets one
    UDTF serve any table, where a plain UDTF's schema is frozen in its
    decorator. Called as ``SELECT * FROM fn(TABLE(v))``.

    Cost model: Python executes once per row (UDTF contract) — fine on
    the 25-row dimension used here and for metadata-scale transforms;
    bulk transforms belong in Arrow-batched mapInPandas (see
    functions/udf.py module docstring).
    """
    from pyspark.sql.functions import udtf

    class AddNameLen:
        @staticmethod
        def analyze(t):
            from pyspark.sql.types import IntegerType, StructType
            from pyspark.sql.udtf import AnalyzeResult

            schema = StructType(list(t.dataType.fields)).add(
                "name_len", IntegerType()
            )
            return AnalyzeResult(schema=schema)

        def eval(self, row):
            yield (*row, len(row["n_name"]))

    spark.udtf.register("eng_add_name_len", udtf(AddNameLen))
    load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).createOrReplaceTempView("udtf_poly_nation")
    return spark.sql("SELECT * FROM eng_add_name_len(TABLE(udtf_poly_nation))")


@query(
    "udf_arrow_scalar",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'),
                                t -> t <> '')) AS INTEGER) AS n_words,
           CAST(length(text) AS INTEGER) AS n_chars
    FROM documents
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-NATIVE SCALAR PYTHON UDF (Spark 4 ``useArrow=True``): the
    same ``F.udf`` registration, but rows cross the Python boundary as
    Arrow batches instead of pickled rows — the drop-in upgrade that
    removes most of the classic scalar-UDF serialization tax without
    rewriting the function as a pandas UDF.  The Python body mirrors the
    oracle's ``\\s+`` split EXACTLY on every input, not just the current
    fixture (round-6 ADVICE): RE2's ``\\s`` is the explicit class
    ``[ \\t\\n\\f\\r]`` — NO vertical tab, so neither Python's default
    Unicode ``\\s`` nor ``re.ASCII`` ``\\s`` (both include ``\\x0b``)
    nor ``str.split()`` matches it; the UDF spells the identical class
    literally.  NULL text maps to NULL, not 0.  With both fixed,
    "arrow transport changes COST, never results" holds
    data-independently.

    Still a per-row Python call — batch-vectorized pandas/arrow UDFs
    remain the hot-path choice (udf_pandas, udf_map_in_arrow); this is
    the migration step for existing scalar-UDF code."""
    import re

    ws = re.compile(r"[ \t\n\f\r]+")

    n_words = F.udf(
        lambda t: (
            sum(1 for w in ws.split(t) if w) if t is not None else None
        ),
        "int",
        useArrow=True,
    )
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_words(F.col("text")).alias("n_words"),
        F.length("text").cast("int").alias("n_chars"),
    )


@query(
    "udf_apply_in_arrow",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(value) AS max_value,
           MIN(value) AS min_value
    FROM events GROUP BY user_id
    """,
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED-MAP OVER ARROW TABLES (Spark 4 ``applyInArrow``): each
    user's rows arrive as ONE ``pyarrow.Table`` and the function returns
    a table — the zero-pandas grouped transform for logic that works
    directly on Arrow buffers (or hands them to Arrow-native libraries)
    without the pandas conversion layer ``applyInPandas`` pays.  The
    body computes per-group aggregates with ``pyarrow.compute`` (exact
    count/min/max — no float accumulation), so results hash-match the
    relational oracle.

    Same scale shape as every grouped-map: one shuffle on the group
    key, one Python invocation per group — group cardinality must be
    far above task count (user_id is) and per-group data must fit a
    worker (aggregates here, never row explosion)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def summarize(t: "pa.Table") -> "pa.Table":
        v = t.column("value")
        return pa.table(
            {
                "user_id": pa.array(
                    [t.column("user_id")[0].as_py()], type=pa.int64()
                ),
                "n_events": pa.array([t.num_rows], type=pa.int64()),
                "max_value": pa.array([pc.max(v).as_py()], type=pa.float64()),
                "min_value": pa.array([pc.min(v).as_py()], type=pa.float64()),
            }
        )

    e = load(spark, sf_dir, "events").select("user_id", "value")
    return e.groupBy("user_id").applyInArrow(
        summarize,
        schema=(
            "user_id bigint, n_events bigint, "
            "max_value double, min_value double"
        ),
    )
