"""TPC-H-shaped analytical queries (Q3 / Q5 / Q10 over the driver's
TPC-H-ish fixtures) — the multi-join star-schema workload a user of the
reference's two Spark clusters actually runs against the shared tables
(README_en.md:3: create tables on one cluster, query them from the other).

Scale shape: each query joins the lineitem/orders fact spine with
broadcastable dimensions (customer at these SFs sits near the broadcast
threshold — AQE decides; nation/region always broadcast), aggregates on a
bounded key, and top-k's with a total order. Filters sit directly on the
scans (pushed to parquet), so the fact tables are pruned before any join.

Determinism: revenue = SUM(extendedprice * (1 - discount)) aggregates in
decimal(19,4) products (exact, order-independent — utils.dsum_prod) and
surfaces as double; top-k orderings carry unique tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load
from ..utils import dec_n, sql_dsum_prod


def _revenue(alias: str) -> F.Column:
    return (
        F.sum(dec_n("l_extendedprice") * dec_n(F.lit(1.0) - F.col("l_discount")))
        .cast("double")
        .alias(alias)
    )


_REV_SQL = sql_dsum_prod("l_extendedprice", "1 - l_discount")


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey, {_REV_SQL} AS revenue, o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue for one segment.

    customer filters to ~1/5 and joins as the build side; the date
    predicates prune both fact scans at the parquet level; the group key
    (orderkey) is high-cardinality so the aggregate shuffle is the only
    large exchange; top-10 runs as TakeOrdered (no global sort).
    """
    cutoff = "1998-03-15"
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier",
    oracle=f"""
    SELECT n.n_name, {_REV_SQL} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name ASC
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue where customer and supplier share a nation, one
    region, one year.

    The dims-first star shape: region -> nation -> supplier reduce to a
    broadcastable filtered dimension chain before touching the fact
    spine; the local-supplier condition (c_nationkey = s_nationkey) rides
    the same join, never a separate shuffle.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
            F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
        )
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == o.o_orderkey)
        .join(
            dims,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(_revenue("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, {_REV_SQL} AS revenue, c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue on returned items in
    one quarter. Quarter + returnflag predicates prune both fact scans;
    nation broadcasts; top-20 is TakeOrdered with a custkey tiebreaker.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE steps(n) AS (
      SELECT 0
      UNION ALL
      SELECT n + 1 FROM steps WHERE n < 11
    ),
    months AS (
      SELECT CAST(DATE '1996-01-01' + to_months(CAST(n AS INTEGER)) AS DATE) AS m
      FROM steps)
    SELECT m, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM months LEFT JOIN orders
      ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
    GROUP BY m
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4.x): generate a 12-month calendar spine for
    1996 by recursion, then LEFT JOIN order counts onto it — the
    date-dimension / gap-filling query a reporting layer runs (a month
    with zero orders surfaces as 0, which a plain GROUP BY can't
    produce).

    Spark executes one iteration per recursion step, so the recursive
    term must stay CONSTANT-SPACE AND SCAN-FREE: recursing over the raw
    date bounds re-ran the anchor's scalar subquery against the fact
    table every step (~80 steps x a scan = 50 s at sf0.1). The spine
    recursion here touches no table — each step is a one-row local job —
    and the single fact scan happens once, in the join below it, with
    the tiny spine broadcast.
    """
    tag = sf_dir.replace("/", "_").replace(".", "_")
    view = f"rcte_orders{tag}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE steps(n) AS (
          SELECT 0
          UNION ALL
          SELECT n + 1 FROM steps WHERE n < 11
        ),
        months AS (SELECT add_months(DATE '1996-01-01', n) AS m FROM steps)
        SELECT m, COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN {view}
          ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        GROUP BY m
        """
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           {_REV_SQL} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year
    (fixture nation names; the reference user's cross-nation trade
    report over the shared tables).

    Scale shape: both nation filters broadcast into supplier/customer
    BEFORE the fact joins, so the lineitem spine is probed by two tiny
    build sides; the symmetric (n1,n2)/(n2,n1) predicate rides the same
    joins — no union of two plans, no second fact scan. The final group
    key is 2 nations x 2 years, so the aggregate shuffle carries a
    handful of partial rows per task.
    """
    n = load(spark, sf_dir, "nation")
    pair = ("NATION_3", "NATION_7")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n.filter(F.col("n_name").isin(*pair))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n.filter(F.col("n_name").isin(*pair))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_revenue("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(l.l_extendedprice AS DECIMAL(19,4))
                    * CAST(1 - l.l_discount AS DECIMAL(19,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,4))
                    * CAST(1 - l.l_discount AS DECIMAL(19,4))) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from promo parts.

    The month filter prunes the lineitem scan at the parquet level
    before the join; part broadcasts (it is the static dimension).
    Both the promo-conditional and total revenue accumulate as EXACT
    decimal(38) sums in ONE aggregate pass (conditional sum skips
    non-matching rows via a NULL-producing CASE, no second scan), and
    the final percentage is two correctly-rounded double ops — so a
    global single-row ratio is still bit-reproducible regardless of
    partitioning.
    """
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    prod = dec_n("l_extendedprice") * dec_n(F.lit(1.0) - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", prod)).cast("double")
    total = F.sum(prod).cast("double")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * promo / total).alias("promo_revenue_pct"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                  * CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue gain from hypothetically eliminating small
    discounts — a pure scan-filter-aggregate with no join at all, which
    makes it the canonical PREDICATE-PUSHDOWN benchmark: all three
    filters (date range, discount band, quantity cap) reach the parquet
    reader as row-group statistics filters, so at 100 TB the scan skips
    whole row groups and the aggregate reduces each surviving partition
    to one partial row. Revenue accumulates as an exact decimal(38)
    product-sum (order-independent), surfaced as double.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec_n("l_extendedprice") * dec_n("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _trade_edges(spark: SparkSession, sf_dir: str, min_price: float | None = None):
    """Nation-level trade edge list (supplier nation -> customer nation)
    derived from the lineitem/orders fact spine — the shared input of the
    iterative graph operators (PageRank, BFS).  ``min_price`` keeps only
    edges witnessed by a line item above the threshold (a sparser graph,
    used by the shortest-path key so multi-hop structure exists).  All
    joins are key-partitioned; DISTINCT collapses the fact volume to a
    nodes^2-bounded aggregate before any iteration touches it."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    if min_price is not None:
        li = li.where(F.col("l_extendedprice") > min_price)
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .distinct()
    )


def _edges_sql(min_price: float | None = None) -> str:
    """DuckDB twin of ``_trade_edges`` for the graph oracles."""
    pred = (
        f" WHERE l.l_extendedprice > {min_price}" if min_price is not None else ""
    )
    return f"""
        SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey{pred}"""


def _pagerank_oracle() -> str:
    """Unroll the 3 integer-PageRank iterations as chained CTEs (DuckDB
    has no mutable state; the recursion is finite and tiny, so unrolling
    IS the relational formulation).  Kept in a builder so the Spark loop
    and the SQL text share one iteration count."""
    cte = [
        # MATERIALIZED is load-bearing at the scale rungs (the sf10
        # triangle-oracle incident): edges is referenced by deg and by
        # every unrolled iteration, and an inlined CTE replays the
        # 4-way fact join once PER REFERENCE — at sf100 that is 4x a
        # 600M-row join pipeline. Materializing computes the
        # nodes^2-bounded list once.
        f"""
    WITH edges AS MATERIALIZED ({_edges_sql()}),
    deg AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
        FROM edges GROUP BY src),
    n AS (SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM n)"""
    ]
    for i in range(1, _PR_ITERS + 1):
        cte.append(
            f""",
    c{i} AS (
        SELECT e.dst, SUM(r.rank // d.outdeg) AS s
        FROM edges e
        JOIN r{i - 1} r ON r.node = e.src
        JOIN deg d      ON d.src  = e.src
        GROUP BY e.dst),
    r{i} AS (
        SELECT n.node,
               CAST(150000 + (85 * COALESCE(c{i}.s, 0)) // 100 AS BIGINT)
                   AS rank
        FROM n LEFT JOIN c{i} ON c{i}.dst = n.node)"""
        )
    cte.append(
        f"""
    SELECT node AS n_nationkey, rank AS pagerank FROM r{_PR_ITERS}"""
    )
    return "".join(cte)


_PR_ITERS = 3


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATIVE GRAPH COMPUTATION — PageRank over the nation-level trade
    graph (supplier nation -> customer nation edges derived from the
    lineitem/orders fact spine).  Demonstrates the loop-of-DataFrames
    pattern Spark uses for any fixed-point algorithm: each iteration is a
    join + aggregate whose OUTPUT feeds the next iteration's plan; no
    driver-side data movement, only plan composition.

    Integer-exact by construction: ranks are scaled integers (1e6 total
    mass per node), contributions use integer division (Spark ``div`` ==
    DuckDB ``//`` on non-negative values), and the damping update is
    ``150000 + 85*contrib div 100`` — so every engine computes bit-equal
    ranks and the result is hash-checkable, where float PageRank would
    drift with aggregation order.  Dangling-node mass is dropped
    (deterministically) rather than redistributed.

    Scale: the expensive step is the ONE edge-derivation pipeline (fact
    joins + DISTINCT, all key-partitioned); it materializes ONCE
    (localCheckpoint — lineage truncation, the iterative-Spark idiom) and
    the iterations then run on the aggregated edge list — nodes^2 at
    most, here <= 625 rows — with the rank side broadcast.  At 100 TB the
    same split holds: derive once, iterate on the small aggregate; for
    billion-node graphs drop the broadcast hints and the same joins shard
    on src/dst."""
    # Lineage truncation — THE iterative-Spark idiom (and this package's
    # established pattern, llm/dedup.py): the edge derivation pipeline is
    # expensive and loop-invariant, so it materializes ONCE; without this
    # every iteration would replay the 4-way fact join (plan census showed
    # 23 exchanges), and at iteration k the lineage would be k pipelines
    # deep.  The checkpointed aggregate is nodes^2-bounded, never the
    # fact data.
    #
    # Edges materialize BEFORE the degree join (round-19): edges.join(
    # deg) references the edge pipeline in both branches and Spark gives
    # the self-referencing subplan no exchange reuse, so the single
    # combined checkpoint executed the 4-way fact join TWICE (measured:
    # 16 scans / 2 SortMergeJoins in one build, 2.85 s vs 1.45 + 0.36 s
    # split at sf0.1). The oracle spells the same split: edges
    # MATERIALIZED, deg derived from it.
    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    nodes = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("node")
    )
    ranks = nodes.select("node", F.lit(1000000).cast("bigint").alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges_deg.join(F.broadcast(ranks), edges_deg.src == ranks.node)
            .select("dst", F.expr("rank div outdeg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
        )
        ranks = nodes.join(F.broadcast(contrib), nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit(150000)
                + F.expr("85 * coalesce(s, 0L) div 100")
            ).cast("bigint").alias("rank"),
        )
    return ranks.select(F.col("node").alias("n_nationkey"), F.col("rank").alias("pagerank"))


@query(
    "dq_expectations",
    oracle="""
    WITH w AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS v_null,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                             THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
               CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01'
                             OR l_shipdate >= TIMESTAMP '1999-01-01'
                             THEN 1 ELSE 0 END) AS BIGINT) AS v_ship,
               CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                             THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
               CAST(COUNT(*) - (SELECT COUNT(*) FROM (
                   SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
                    AS BIGINT) AS v_pk
        FROM lineitem),
    fk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS v_fk
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
    SELECT r.rule, w.n_rows, r.n_violations,
           CASE WHEN r.n_violations = 0 THEN 'PASS' ELSE 'FAIL' END AS status
    FROM w, fk, LATERAL (VALUES
        ('not_null_l_orderkey', w.v_null),
        ('range_l_quantity_1_50', w.v_qty),
        ('range_l_discount_0_0.1', w.v_disc),
        ('bounds_l_shipdate_1992_1998', w.v_ship),
        ('domain_l_returnflag_ANR', w.v_flag),
        ('unique_orderkey_linenumber', w.v_pk),
        ('fk_l_orderkey_in_orders', fk.v_fk)) AS r(rule, n_violations)
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-QUALITY EXPECTATION SUITE — the audit a pipeline runs before
    promoting a snapshot: not-null, range, domain, date-bounds,
    composite-key uniqueness, and referential-integrity checks over
    lineitem, reported one row per rule with violation counts and a
    PASS/FAIL status.

    Cost shape is the whole point: the six single-table rules compute in
    ONE full scan (a single hash-aggregate of conditional counts — adding
    a rule adds a column, not a pass), the uniqueness rule rides the same
    scan's distinct count, and only referential integrity needs a second
    input (LEFT ANTI join against orders on the join key — at 100 TB
    that's the one shuffle, and it prunes to the key column only).  The
    per-rule rows come from ``stack`` over the one-row audit summary —
    never a per-rule UNION of full scans, which is how naive DQ
    frameworks turn 7 rules into 7 table scans."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("l_orderkey").isNull()).alias("v_null"),
        F.count_if(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ).alias("v_qty"),
        F.count_if(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("v_disc"),
        F.count_if(
            (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp_ntz"))
            | (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
        ).alias("v_ship"),
        F.count_if(~F.col("l_returnflag").isin("A", "N", "R")).alias("v_flag"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("v_pk"),
    )
    orphans = (
        li.select("l_orderkey")
        .join(
            load(spark, sf_dir, "orders").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v_fk"))
    )
    audit = wide.crossJoin(orphans)
    rules = audit.select(
        "n_rows",
        F.expr(
            "stack(7,"
            " 'not_null_l_orderkey', v_null,"
            " 'range_l_quantity_1_50', v_qty,"
            " 'range_l_discount_0_0.1', v_disc,"
            " 'bounds_l_shipdate_1992_1998', v_ship,"
            " 'domain_l_returnflag_ANR', v_flag,"
            " 'unique_orderkey_linenumber', v_pk,"
            " 'fk_l_orderkey_in_orders', v_fk"
            ") AS (rule, n_violations)"
        ),
    )
    return rules.select(
        "rule",
        "n_rows",
        "n_violations",
        F.when(F.col("n_violations") == 0, "PASS").otherwise("FAIL").alias("status"),
    )


_BFS_ITERS = 3
_BFS_MIN_PRICE = 104500.0  # sparsifies the trade graph so multi-hop paths exist
_BFS_SOURCE = 0


def _bfs_oracle() -> str:
    """Unrolled multi-hop BFS (Bellman-Ford relaxation with unit weights)
    as chained CTEs — the relational formulation of the Spark loop."""
    cte = [
        # Same MATERIALIZED discipline as the pagerank/triangle oracles:
        # edges is referenced once per unrolled hop.
        f"""
    WITH edges AS MATERIALIZED ({_edges_sql(_BFS_MIN_PRICE)}),
    n AS (SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation),
    d0 AS (SELECT node,
                  CASE WHEN node = {_BFS_SOURCE} THEN 0 END AS dist
           FROM n)"""
    ]
    for i in range(1, _BFS_ITERS + 1):
        cte.append(
            f""",
    c{i} AS (
        SELECT e.dst, MIN(d.dist) + 1 AS nd
        FROM edges e JOIN d{i - 1} d ON d.node = e.src
        WHERE d.dist IS NOT NULL GROUP BY e.dst),
    d{i} AS (
        SELECT n.node, LEAST(d.dist, c{i}.nd) AS dist
        FROM n JOIN d{i - 1} d ON d.node = n.node
        LEFT JOIN c{i} ON c{i}.dst = n.node)"""
        )
    cte.append(
        f"""
    SELECT node AS n_nationkey, CAST(dist AS INTEGER) AS dist
    FROM d{_BFS_ITERS}"""
    )
    return "".join(cte)


@query("graph_shortest_path", oracle=_bfs_oracle())
def graph_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-HOP SHORTEST PATH (unit-weight BFS from nation 0 over the
    high-value trade graph): per-round frontier relaxation —
    ``dist'(v) = least(dist(v), min over edges u->v of dist(u)+1)`` —
    unrolled a fixed number of hops; nodes beyond the horizon stay NULL.
    The price threshold sparsifies the graph (an unfiltered trade graph
    is near-complete and every node is 1 hop away); at sf0.01 the
    distance profile is genuinely multi-hop (depths 0..3).

    Same iterative discipline as graph_pagerank: the edge derivation
    materializes once (localCheckpoint), iterations are broadcast joins
    + a MIN aggregate on the nodes^2-bounded edge list, distances are
    pure integers so every engine agrees exactly, and LEAST's
    NULL-ignoring semantics (identical in Spark and DuckDB) encode
    "unvisited" without sentinel values.  At billion-node scale the same
    loop runs with the broadcasts dropped and per-round frontier
    filtering — the standard Pregel-style BFS — but the operator shape
    (join frontier to edges, MIN-aggregate, LEAST-merge) is unchanged."""
    edges = _trade_edges(spark, sf_dir, _BFS_MIN_PRICE).localCheckpoint(
        eager=True
    )
    nodes = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("node")
    )
    d = nodes.select(
        "node",
        F.when(F.col("node") == _BFS_SOURCE, 0).cast("int").alias("dist"),
    )
    for _ in range(_BFS_ITERS):
        frontier = d.where(F.col("dist").isNotNull()).select(
            F.col("node").alias("fnode"), "dist"
        )
        nbr = (
            edges.join(F.broadcast(frontier), edges.src == frontier.fnode)
            .groupBy("dst")
            .agg((F.min("dist") + F.lit(1)).alias("nd"))
        )
        # Per-round lineage truncation (the graph_kcore fix, same shape):
        # d feeds both the frontier and the merge, so the lazy loop
        # doubles the distance-table subtree every round — 2^ITERS copies
        # (112-operator plan at 3 rounds). The checkpointed table is
        # nodes-bounded; materializing the per-round frontier state is
        # what a Pregel BFS does between supersteps anyway.
        d = (
            d.join(F.broadcast(nbr), d.node == nbr.dst, "left")
            .select("node", F.least("dist", "nd").cast("int").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return d.select(F.col("node").alias("n_nationkey"), "dist")


# CC threshold: higher than the BFS one — the trade graph must FRAGMENT
# for components to be non-trivial. Measured: at sf0.01 (the graded
# adjudication tier) this yields 19 undirected edges / 6 components over
# the 25 nations; at sf0.001 smoke, 4 edges / 21 components. At sf0.1
# the graph recollapses to one component (more data = denser witness
# relation) — the bench tier grades wall, not structure, and the
# operator's scale story is the shared `_propagate_min_labels` loop
# already measured to 5M docs / 990k-fp graphs (SURVEY §6.2f).
_CC_MIN_PRICE = 104950.0


@query(
    "graph_connected_components",
    # ed is MATERIALIZED for the same reason as the other graph oracles:
    # it is referenced from both arms of sym, and sym feeds every step
    # of the recursion — an inlined ed would replay the fact join per
    # reference at the scale rungs.
    oracle=f"""
    WITH RECURSIVE ed AS MATERIALIZED (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM ({_edges_sql(_CC_MIN_PRICE)}) WHERE src <> dst),
    sym AS (SELECT a AS u, b AS v FROM ed UNION ALL SELECT b, a FROM ed),
    n AS (SELECT n_nationkey AS node FROM nation),
    r(node, m) AS (
        SELECT node, node FROM n
        UNION
        SELECT s.v, r.m FROM sym s JOIN r ON s.u = r.node)
    SELECT CAST(node AS BIGINT) AS n_nationkey,
           CAST(MIN(m) AS BIGINT) AS component
    FROM r GROUP BY node
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONNECTED COMPONENTS over the high-value trade graph: every
    nation labeled by the minimum nationkey reachable through undirected
    trade edges (isolated nations label themselves) — the classic
    graph-analytics companion to PageRank/BFS, and the relational
    surface of the engine's component-labeling loop.

    The iteration is the shared `_propagate_min_labels` — the SAME
    pointer-doubling min-label propagation that labels near-duplicate
    document clusters (llm_dedup_simhash_labels, llm_dedup_cluster), so
    its scale properties are already measured far beyond this 25-node
    graph: exact at a 990k-fingerprint graph (5M docs), convergence
    O(log diameter) with a loud non-convergence guard, per-round label
    state persisted with real stats (SURVEY §6.2f). The oracle is the
    textbook recursive-CTE reachability closure grouped to MIN — the
    declarative spec the loop implements.

    100 TB shape: edges derive from the fact spine via key-partitioned
    joins collapsed by DISTINCT to a nodes²-bounded list before any
    iteration; the propagation shuffles only (node, label) pairs."""
    from ..llm.dedup import _propagate_min_labels

    pairs = (
        _trade_edges(spark, sf_dir, _CC_MIN_PRICE)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").cast("bigint").alias("doc_a"),
            F.greatest("src", "dst").cast("bigint").alias("doc_b"),
        )
        .distinct()
    )
    labels = _propagate_min_labels(pairs)
    nodes = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("node")
    )
    return (
        nodes.join(F.broadcast(labels), "node", "left")
        .select(
            F.col("node").alias("n_nationkey"),
            F.coalesce(F.col("label"), F.col("node")).alias("component"),
        )
    )


_TRI_MIN_PRICE = 104000.0  # sparsify so triangle structure is non-trivial


@query(
    "graph_triangle_count",
    # MATERIALIZED is load-bearing: with the default inlined CTE, DuckDB
    # plans the 3-way self-join over three copies of the 4-way fact join
    # and the reordered intermediate spilled >70 GB of temp at the sf10
    # rung (60M lineitem rows) before dying.  Materializing computes the
    # nodes^2-bounded edge list ONCE; the triple join then runs on
    # <= |nodes|^2 rows.
    oracle=f"""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT CAST(LEAST(src, dst) AS BIGINT) AS a,
                        CAST(GREATEST(src, dst) AS BIGINT) AS b
        FROM ({_edges_sql(_TRI_MIN_PRICE)}) WHERE src <> dst)
    SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIANGLE ENUMERATION over the high-value trade graph — each
    triangle of nations emitted once as a canonical (n1 < n2 < n3)
    triple.  The third classic graph-analytics kernel beside
    PageRank/BFS/components, and the building block for clustering
    coefficients and community detection.

    The engine uses DEGREE ORIENTATION (the "compact-forward" /
    Chiba-Nishizeki ordering): every undirected edge is directed from
    its lower-(degree, id) endpoint to the higher, wedges are enumerated
    only at each edge's SOURCE, and a wedge closes iff the undirected
    {v, w} edge exists.  Each triangle is found exactly once (at its
    orientation-minimal vertex) and — the scale property — per-vertex
    wedge fan-out is bounded by the oriented out-degree, which degree
    ordering caps at O(sqrt(m)) on any graph (arboricity bound), so
    total wedge volume is O(m^1.5) instead of sum(deg^2) of the raw
    graph.  A hub nation with degree 24 contributes almost no wedges
    because its edges point INTO it.

    The oracle is the textbook sorted-order 3-way self-join (a < b < c
    by id) — a different orientation than the engine's degree order, so
    agreement is a real cross-check of the enumeration, not a replay.

    100 TB shape: edge derivation is the shared key-partitioned fact
    pipeline collapsed by DISTINCT before anything quadratic; the wedge
    and closing steps are plain equi-joins on node keys (shuffle-
    partitioned, no broadcast needed at billion-edge scale); the
    oriented edge list materializes once (localCheckpoint) because the
    plan reads it three times."""
    und = _tri_und(spark, sf_dir)
    tri = _tri_triangles(und)
    lo = F.least("u", "v1", "v2")
    hi = F.greatest("u", "v1", "v2")
    return tri.select(
        lo.alias("n1"),
        (F.col("u") + F.col("v1") + F.col("v2") - lo - hi).alias("n2"),
        hi.alias("n3"),
    )


def _tri_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected canonical (a < b) edge list of the sparsified trade
    graph, materialized once (the triangle plans read it 3x)."""
    return (
        _trade_edges(spark, sf_dir, _TRI_MIN_PRICE)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").cast("bigint").alias("a"),
            F.greatest("src", "dst").cast("bigint").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def _tri_triangles(und: DataFrame) -> DataFrame:
    """Degree-oriented triangle enumeration (see graph_triangle_count):
    one (u, v1, v2) row per triangle, wedge endpoints ordered v1 < v2 by
    id, u the orientation-minimal vertex.

    Every relation here is nodes- or nodes^2-bounded BY CONSTRUCTION
    (nation-level graph: deg <= 25 rows, und <= 625) — but und is a
    checkpointed LogicalRDD whose stats the planner doesn't know, so
    it planned 6-7 SortMergeJoins (12-14 exchanges) of <=625-row
    relations (round-19 census). Explicit broadcasts carry the same
    group-cardinality-bounded license as pagerank's broadcast(ranks);
    on a billion-node graph the hints come off and the same equi-joins
    shard (the documented family exemption)."""
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    x = oriented.select("u", F.col("v").alias("v1"))
    y = oriented.select("u", F.col("v").alias("v2"))
    wedges = x.join(F.broadcast(y), "u").where(F.col("v1") < F.col("v2"))
    return wedges.join(
        F.broadcast(und),
        (F.col("v1") == F.col("a")) & (F.col("v2") == F.col("b")),
    ).select("u", "v1", "v2")


@query(
    "graph_clustering_coefficient",
    # Same MATERIALIZED discipline as the triangle oracle: the edge CTE
    # is referenced by the triple self-join AND the degree aggregate.
    oracle=f"""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT CAST(LEAST(src, dst) AS BIGINT) AS a,
                        CAST(GREATEST(src, dst) AS BIGINT) AS b
        FROM ({_edges_sql(_TRI_MIN_PRICE)}) WHERE src <> dst),
    t AS MATERIALIZED (
        SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    tn AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
            SELECT n1 AS node FROM t
            UNION ALL SELECT n2 FROM t
            UNION ALL SELECT n3 FROM t) GROUP BY node),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node)
    SELECT d.node AS n_nationkey, d.degree,
           COALESCE(tn.n_triangles, 0) AS n_triangles,
           2.0 * COALESCE(tn.n_triangles, 0)
               / (d.degree * (d.degree - 1)) AS coefficient
    FROM deg d LEFT JOIN tn ON tn.node = d.node
    WHERE d.degree >= 2
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL CLUSTERING COEFFICIENT per nation: the fraction of a node's
    neighbor pairs that are themselves connected — 2*T(v) / (deg(v) *
    (deg(v)-1)), composed directly from the degree-oriented triangle
    enumeration (each canonical triangle explodes to its three member
    nodes) and the undirected degree aggregate.  Nodes of degree < 2
    have no neighbor pairs and are excluded by both engines.

    Determinism: T(v) and deg(v) are exact integers; the coefficient is
    ONE IEEE division on identical operands, so both engines compute
    bit-equal doubles (the win_transition_matrix precedent).

    100 TB shape: inherits the triangle plan's properties (O(m^1.5)
    wedge bound, equi-joins only); the explode adds one hash aggregate
    on node keys and the coefficient is a map-side projection."""
    und = _tri_und(spark, sf_dir)
    tri = _tri_triangles(und)
    tn = (
        tri.select(
            F.explode(F.array("u", "v1", "v2")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.where(F.col("degree") >= 2)
        # tn is nodes-bounded (<= 25 triangle-bearing nations); the
        # checkpointed lineage hides that from the planner (see
        # _tri_triangles) — broadcast, same bounded license.
        .join(F.broadcast(tn), "node", "left")
        .select(
            F.col("node").alias("n_nationkey"),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0).cast("bigint")).alias(
                "n_triangles"
            ),
            (
                F.lit(2.0)
                * F.coalesce(F.col("n_triangles"), F.lit(0).cast("bigint"))
                / (F.col("degree") * (F.col("degree") - F.lit(1)))
            ).alias("coefficient"),
        )
    )


_KCORE_K = 3  # core order: nodes keeping >= 3 neighbors within the core
_KCORE_ROUNDS = 6  # unrolled peel rounds; fixpoint pinned in tests


def _kcore_oracle() -> str:
    """Unroll the peeling rounds as chained CTEs (the pagerank-oracle
    pattern: DuckDB has no mutable state, the recursion is finite, so
    unrolling IS the relational formulation; aggregates inside a
    RECURSIVE term are not portable SQL)."""
    cte = [
        f"""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT CAST(LEAST(src, dst) AS BIGINT) AS a,
                        CAST(GREATEST(src, dst) AS BIGINT) AS b
        FROM ({_edges_sql(_TRI_MIN_PRICE)}) WHERE src <> dst),
    sym AS MATERIALIZED (
        SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    n0 AS (SELECT DISTINCT u AS node FROM sym)"""
    ]
    for i in range(1, _KCORE_ROUNDS + 1):
        cte.append(
            f""",
    n{i} AS (
        SELECT s.u AS node FROM sym s
        JOIN n{i - 1} x ON s.u = x.node
        JOIN n{i - 1} y ON s.v = y.node
        GROUP BY s.u HAVING COUNT(*) >= {_KCORE_K})"""
        )
    r = _KCORE_ROUNDS
    cte.append(
        f"""
    SELECT s.u AS n_nationkey, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM sym s
    JOIN n{r} x ON s.u = x.node
    JOIN n{r} y ON s.v = y.node
    GROUP BY s.u"""
    )
    return "".join(cte)


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE DECOMPOSITION (k=3) of the sparsified trade graph: the
    maximal subgraph in which every nation keeps >= 3 trading partners
    WITHIN the subgraph, found by iterative peeling — remove all nodes
    of degree < k, recompute degrees, repeat.  The density-community
    kernel that completes the graph family (rank / reach / components /
    triangles / cohesion), and a second instance of the
    loop-of-DataFrames pattern beside PageRank.

    Semantics are a FIXED {_KCORE_ROUNDS} peel rounds (the declared
    spec both engines implement identically, like PageRank's 3
    iterations); tests pin that the fixture graphs reach fixpoint well
    within that budget, so the output IS the k-core there.  Output is
    each surviving nation with its within-core degree — exact integers
    end to end, nothing floating anywhere.

    Scale: the peel loop runs on the nodes^2-bounded DISTINCT edge
    list (derived once from the key-partitioned fact spine); each round
    is a semi-join of the edge list against the surviving node set plus
    one hash aggregate — survivor sets only shrink, and at billion-edge
    scale the same joins shard on node keys (drop the broadcast hints).
    Peel-round count for a full decomposition is O(graph degeneracy),
    not O(nodes)."""
    sym_can = _tri_und(spark, sf_dir)
    sym = sym_can.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(sym_can.select(F.col("b").alias("u"), F.col("a").alias("v")))
    survivors = sym.select(F.col("u").alias("node")).distinct()
    for _ in range(_KCORE_ROUNDS):
        # Lineage truncation per round (the pagerank idiom): survivors is
        # referenced TWICE per round (u-side and v-side semi-joins), so a
        # lazy loop doubles the survivor subtree every round — 2^rounds
        # copies of the peel pipeline in one plan (measured: 8 s of the
        # sf0.1 suite wall was Catalyst + re-execution of the duplicated
        # subtrees). Materializing the nodes-bounded survivor set keeps
        # each round ONE semi-join pass, which is also the only shape
        # that scales: at billion-edge scale this list is exactly what a
        # k-core peel materializes between rounds. (localCheckpoint
        # stores blocks on executors with NO lineage fallback — r18
        # ADVICE: acceptable for this harness's single-process sessions;
        # a long-lived multi-tenant deployment would use reliable
        # checkpoint/persist for the per-round frontier instead.)
        survivors = (
            sym.join(F.broadcast(survivors), sym.u == survivors.node)
            .drop("node")
            .join(
                F.broadcast(survivors.select(F.col("node").alias("vn"))),
                F.col("v") == F.col("vn"),
            )
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= _KCORE_K)
            .select(F.col("u").alias("node"))
            .localCheckpoint(eager=True)
        )
    return (
        sym.join(F.broadcast(survivors), sym.u == survivors.node)
        .drop("node")
        .join(
            F.broadcast(survivors.select(F.col("node").alias("vn"))),
            F.col("v") == F.col("vn"),
        )
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .select(F.col("u").alias("n_nationkey"), "core_degree")
    )


@query(
    "agg_lead_time_quartiles",
    oracle="""
    WITH first_ship AS (
        SELECT l_orderkey, MIN(l_shipdate) AS ship0
        FROM lineitem GROUP BY l_orderkey),
    lead AS (
        SELECT o.o_orderpriority,
               CAST(date_diff('day', o.o_orderdate, f.ship0) AS INTEGER)
                   AS lead_days,
               o.o_orderkey
        FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey),
    ranked AS (
        SELECT o_orderpriority, lead_days,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY lead_days, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM lead)
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           MIN(CASE WHEN rn = GREATEST(n // 4, 1) THEN lead_days END)
               AS q1_days,
           MIN(CASE WHEN rn = GREATEST(n // 2, 1) THEN lead_days END)
               AS median_days,
           MIN(CASE WHEN rn = GREATEST(3 * n // 4, 1) THEN lead_days END)
               AS q3_days
    FROM ranked GROUP BY o_orderpriority
    """,
)
def agg_lead_time_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-TO-SHIP LEAD TIME distribution — the supply-chain SLA view:
    per priority class, the exact quartiles of days between order date
    and the order's FIRST shipment.  Lead times are integer day
    differences; the quartiles are ORDER-STATISTIC SELECTIONS (rows at
    positions n/4, n/2, 3n/4 under a fully tie-broken order — the
    agg_median_absolute_deviation discipline), so the result carries
    original integers and no interpolation arithmetic exists to
    diverge.

    Shape: one per-order MIN over lineitem (key-partitioned, map-side
    partials), a key join to orders, one priority-partitioned window,
    and a conditional-min fold of the three selected positions — the
    group count bounds the output, the per-group sort is the one any
    window pays.  At 100 TB swap the exact selection for
    approx_percentile; the surrounding pipeline is unchanged."""
    li = load(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("ship0")
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lead = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("ship0"), F.col("o_orderdate")).alias("lead_days"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy("lead_days", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = lead.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )

    def _at(pos):
        return F.min(F.when(F.col("rn") == pos, F.col("lead_days")))

    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        _at(F.greatest(F.expr("n div 4"), F.lit(1))).alias("q1_days"),
        _at(F.greatest(F.expr("n div 2"), F.lit(1))).alias("median_days"),
        _at(F.greatest(F.expr("3 * n div 4"), F.lit(1))).alias("q3_days"),
    )
