"""Scalar function families (SURVEY.md SS2.10) — one composite query per
family, every expression a JVM-side built-in (pyspark.sql.functions), so
the whole projection stays inside whole-stage codegen: zero Python in the
hot path, scan-bound at any scale.

Cross-engine notes: transcendentals (ln/log10) are rounded to 6 decimals —
Java and libm disagree in the last ulp; everything else is exact (IEEE
scalar ops on identical inputs, or integer/string semantics shared by both
engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           concat_ws(' ', p_brand, p_type) AS brand_type,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substring(p_name, 1, 5) AS name_head,
           length(p_name) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           split_part(p_name, ' ', 1) AS first_word,
           regexp_extract(p_type, '([A-Z]+)', 1) AS type_first_token,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
           strpos(p_name, 'a') AS first_a,
           ascii(substring(p_brand, 1, 1)) AS brand_initial_code
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/case/substring/length/pad/split/regexp/instr.
    Spark regexp_replace is global by default; DuckDB needs the 'g' flag —
    the one semantic asymmetry worth remembering."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws(" ", "p_brand", "p_type").alias("brand_type"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("type_first_token"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.instr("p_name", "a").cast("bigint").alias("first_a"),
        F.ascii(F.substring("p_brand", 1, 1)).cast("int").alias("brand_initial_code"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS INTEGER) AS days_to_cutoff,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
           CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS reparsed
    FROM orders
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract/add/diff/trunc/epoch/format/parse
    round-trip.  All calendar arithmetic — deterministic on both engines
    (session TZ pinned to UTC by the registry)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("1998-12-01").cast("date"), d).alias("days_to_cutoff"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.last_day(d).alias("month_end"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd"), "yyyy-MM-dd").alias("reparsed"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice, 1) AS price_rounded,
           abs(p_size - 25) AS size_dev,
           sqrt(p_retailprice) AS price_sqrt,
           pow(CAST(p_size AS DOUBLE), 2.0) AS size_sq,
           round(ln(p_retailprice), 6) AS price_ln,
           round(log10(p_retailprice), 6) AS price_log10,
           CAST(floor(p_retailprice / 100.0) AS BIGINT) AS price_hundreds,
           CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS price_hundreds_up,
           CAST(sign(p_size - 25) AS DOUBLE) AS size_sign,
           mod(p_partkey, 7) AS key_mod
    FROM part
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family.  sqrt/pow-of-integer are IEEE-exact cross-engine;
    ln/log10 are libm-dependent so both sides round to 6 decimals; pmod ==
    mod for the positive operands used here."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_rounded"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.sqrt("p_retailprice").alias("price_sqrt"),
        F.pow(F.col("p_size").cast("double"), 2.0).alias("size_sq"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 6).alias("price_log10"),
        F.floor(F.col("p_retailprice") / 100.0).alias("price_hundreds"),
        F.ceil(F.col("p_retailprice") / 100.0).alias("price_hundreds_up"),
        F.signum(F.col("p_size") - 25).alias("size_sign"),
        F.pmod("p_partkey", F.lit(7)).alias("key_mod"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 5000.0) AS bal_cap5k,
           nullif(c_nationkey, 0) AS nationkey_nz,
           coalesce(nullif(c_nationkey, 0), -1) AS nationkey_filled
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: coalesce / nullif / greatest / least."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_acctbal", F.lit(5000.0)).alias("bal_cap5k"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nationkey_nz"),
        F.coalesce(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "nationkey_filled"
        ),
    )


@query(
    "fn_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3), ',') AS first3_sorted,
           CAST(list_sum(list_transform(string_split(text, ' '), s -> length(s))) AS BIGINT) AS total_token_chars,
           len(list_filter(string_split(text, ' '), s -> length(s) > 4)) AS n_long_tokens
    FROM documents
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order functions (transform/filter/
    aggregate) — these run as Catalyst expressions, NOT Python lambdas, so
    they vectorize like any built-in."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), ",").alias(
            "first3_sorted"
        ),
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)).alias(
            "total_token_chars"
        ),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("bigint").alias(
            "n_long_tokens"
        ),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           event_type AS type_from_map,
           CASE WHEN value >= 100.0 THEN 'high' ELSE 'low' END AS bucket_from_map,
           'bucket,type' AS keys_csv,
           2 AS n_keys
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build a map column, extract by key, enumerate keys.
    Output is reduced to scalars because DuckDB's MAP rendering differs;
    the oracle computes the same values directly — the check is on the
    map ops' RESULTS, not the container."""
    e = load(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("bucket")),
        F.array(
            F.col("event_type"),
            F.when(F.col("value") >= 100.0, "high").otherwise("low"),
        ),
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.element_at(m, "bucket").alias("bucket_from_map"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_get,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct,
           json_extract_string(props, '$.missing') AS missing_key,
           length(props) AS props_len
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props: path extraction (get_json_object)
    and schema-full parsing (from_json -> struct) — the latter is the
    scale path: parse once, read many fields."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_get"),
        parsed.getField("k").alias("k_struct"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
        F.length("props").cast("bigint").alias("props_len"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_partkey & 255 AS low_byte,
           p_partkey | 4096 AS with_flag,
           xor(p_partkey, p_size) AS key_xor_size,
           p_partkey << 3 AS shl3,
           p_partkey >> 2 AS shr2,
           CAST(bit_count(p_partkey) AS INTEGER) AS popcount,
           ~p_partkey AS negated
    FROM part
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount/complement — exact
    two's-complement integer ops, bit-identical across engines (the
    building blocks the LSH/SimHash operators compose)."""
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        "p_partkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("p_size").cast("long")).alias("key_xor_size"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bit_count(k).alias("popcount"),
        F.bitwise_not(k).alias("negated"),
    )


@query(
    "fn_struct",
    oracle="""
    SELECT c_custkey,
           c_custkey AS key_from_struct,
           c_acctbal AS bal_from_nested,
           c_mktsegment AS seg_from_nested,
           true AS struct_eq,
           CAST(to_json(struct_pack(k := c_custkey)) AS VARCHAR) AS struct_json
    FROM customer
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: build, nest, field-access, whole-struct equality,
    and JSON rendering. Like fn_map, the check is on the struct ops'
    RESULTS (extracted scalars), not the container encoding — except
    struct_json, which pins the canonical JSON rendering of an
    integer-field struct (float fields would diverge on repr, so the
    JSON probe deliberately carries only the key)."""
    c = load(spark, sf_dir, "customer")
    s = F.struct(F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal"))
    nested = F.struct(s.alias("inner"), F.col("c_mktsegment").alias("seg"))
    rebuilt = F.struct(F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal"))
    return c.select(
        "c_custkey",
        s.getField("key").alias("key_from_struct"),
        nested.getField("inner").getField("bal").alias("bal_from_nested"),
        nested.getField("seg").alias("seg_from_nested"),
        (s == rebuilt).alias("struct_eq"),
        F.to_json(F.struct(F.col("c_custkey").alias("k"))).alias("struct_json"),
    )


@query(
    "fn_url",
    oracle="""
    WITH u AS (
        SELECT event_id,
               'https://shop.example.com' ||
               CASE WHEN user_id % 3 = 0 THEN ':8443' ELSE '' END ||
               '/' || event_type || '?uid=' || CAST(user_id AS VARCHAR) AS url
        FROM events)
    SELECT event_id, url,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/:]+)', 1) AS host,
           NULLIF(regexp_extract(url, '^[a-z]+://[^/:]+:([0-9]+)', 1), '') AS port,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           NULLIF(regexp_extract(url, '[?&]uid=([^&]*)', 1), '') AS uid
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: parse_url component extraction (protocol /
    host / port / path / query parameter) over URLs constructed from the
    events fixture — the clickstream-normalization step of a web-log
    pipeline. The oracle re-parses the identical strings with anchored
    regexps (DuckDB has no parse_url); NULLIF aligns DuckDB's
    empty-string no-match with parse_url's NULL. Row-local, codegen'd,
    zero shuffle."""
    e = load(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://shop.example.com"),
        F.when(F.col("user_id") % 3 == 0, ":8443").otherwise(""),
        F.lit("/"),
        F.col("event_type"),
        F.lit("?uid="),
        F.col("user_id").cast("string"),
    )
    d = e.select("event_id", url.alias("url"))
    # parse_url has no PORT part (Hive part set: HOST/PATH/QUERY/REF/
    # PROTOCOL/AUTHORITY/FILE/USERINFO) — the port comes off AUTHORITY.
    auth = F.parse_url("url", F.lit("AUTHORITY"))
    return d.select(
        "event_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.nullif(F.regexp_extract(auth, ":([0-9]+)$", 1), F.lit("")).alias("port"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("uid")).alias("uid"),
    )


@query(
    "fn_hash_encode",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           base64(CAST(p_name AS BLOB)) AS name_b64,
           CAST(octet_length(from_base64(base64(CAST(p_name AS BLOB)))) AS INTEGER)
             AS b64_roundtrip_len,
           lower(hex(p_name)) AS name_hex
    FROM part
    """,
)
def fn_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash + encoding family: md5 / sha256 content digests (the
    content-addressing primitives every data-lake dedup/caching layer
    uses) and base64/hex transport encodings with a decode round-trip.
    All row-local codegen; hex is case-normalized (Spark upper, DuckDB
    upper — lowered on both so the oracle can't drift on case)."""
    p = load(spark, sf_dir, "part")
    b64 = F.base64(F.col("p_name").cast("binary"))
    return p.select(
        "p_partkey",
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("p_name").cast("binary"), 256).alias("name_sha256"),
        b64.alias("name_b64"),
        F.length(F.unbase64(b64)).alias("b64_roundtrip_len"),
        F.lower(F.hex("p_name")).alias("name_hex"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(NULL AS BIGINT) AS k_missing,
           'OBJECT<k: BIGINT>' AS v_schema
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface over the events JSON payload: parse once
    with ``parse_json`` into the binary VARIANT encoding, then typed
    extraction via ``variant_get`` (error-on-miss) /
    ``try_variant_get`` (NULL-on-miss) and ``schema_of_variant``
    introspection.

    Why this matters beyond get_json_object (fn_json): VARIANT stores
    the parsed tree ONCE in a compact binary form, so N extractions cost
    one parse instead of N string re-parses, and parquet can store the
    column shredded — the modern semi-structured path the Hive-era
    clusters the reference provisions never had. The result surface is
    fully typed (the raw variant stays internal: its Arrow encoding is
    engine-specific); the oracle replays extraction with DuckDB's JSON
    functions and pins the (constant, fixture-determined) variant
    schema string.
    """
    e = load(spark, sf_dir, "events")
    # Two-step projection so the variant is PARSED ONCE per row and the
    # four extractions read the binary encoding: CollapseProject refuses
    # to substitute non-cheap expressions, so parse_json survives as a
    # single materialized column instead of re-running per extraction.
    parsed = e.select("event_id", F.parse_json(F.col("props")).alias("v"))
    return parsed.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k_int"),
        F.expr("variant_get(v, '$.k', 'string')").alias("k_str"),
        F.expr("try_variant_get(v, '$.missing', 'bigint')").alias("k_missing"),
        F.schema_of_variant(F.col("v")).alias("v_schema"),
    )


@query(
    "fn_sql_udf",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                        * (10000 - CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)))
                    AS BIGINT) AS disc_e6
        FROM lineitem GROUP BY l_returnflag),
    tf AS (SELECT n_name, n_nationkey FROM nation WHERE n_regionkey = 0)
    SELECT tf.n_name, tf.n_nationkey, agg.l_returnflag, agg.n, agg.disc_e6
    FROM agg CROSS JOIN tf
    """,
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-DEFINED FUNCTIONS (Spark 4.x ``CREATE FUNCTION ... RETURN``):
    a scalar SQL UDF (exact integer-unit discounted price — body is a
    pure SQL expression, so it inlines into codegen with NO Python
    boundary, unlike udf_scalar) and a SQL TABLE function (parameterized
    nation lookup) driving the FROM clause. These are the catalog-
    managed reusable business definitions HMS-era warehouses kept as
    Hive UDFs-in-jars; SQL-defined bodies migrate as text instead of
    classfiles. Both kinds exercise in one result: the scalar UDF
    aggregates per returnflag, the table function fans the region-0
    nations across it.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("sqludf_lineitem")
    load(spark, sf_dir, "nation").createOrReplaceTempView("sqludf_nation")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_e6(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(p * 100 + 0.5) AS BIGINT) "
        "* (10000 - CAST(floor(d * 10000 + 0.5) AS BIGINT))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION region_nations(rk INT) "
        "RETURNS TABLE(n_name STRING, n_nationkey INT) "
        "RETURN SELECT n_name, n_nationkey FROM sqludf_nation WHERE n_regionkey = rk"
    )
    return spark.sql(
        """
        WITH agg AS (
            SELECT l_returnflag, COUNT(*) AS n,
                   CAST(SUM(disc_e6(l_extendedprice, l_discount)) AS BIGINT)
                       AS disc_e6
            FROM sqludf_lineitem GROUP BY l_returnflag)
        SELECT tf.n_name, tf.n_nationkey, agg.l_returnflag, agg.n, agg.disc_e6
        FROM agg CROSS JOIN region_nations(0) tf
        """
    )


@query(
    "fn_collation_lcase",
    oracle="""
    WITH variants AS (
        SELECT upper(n_name) AS name FROM nation
        UNION ALL
        SELECT lower(n_name) AS name FROM nation)
    SELECT lower(name) AS name_lc, COUNT(*) AS n
    FROM variants GROUP BY lower(name)
    """,
)
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String COLLATION surface (Spark 4): grouping under the
    ``UTF8_LCASE`` collation folds case variants into one group at the
    COMPARISON level — no lower() rewrite of the data — the engine-native
    way to reconcile case-mixed catalogs/IDs. The fixture doubles every
    nation name as UPPER + lower; case-insensitive grouping must land
    both in one group of 2. The surfaced key is lowercased and cast back
    to a plain (UTF8_BINARY) string so the result schema is
    collation-free for the Arrow hash; the oracle spells the same
    semantics with GROUP BY lower(). Collation compares are
    codegen'd JVM-side — same scale shape as any hash aggregate."""
    n = load(spark, sf_dir, "nation")
    variants = n.select(F.upper("n_name").alias("name")).unionAll(
        n.select(F.lower("n_name").alias("name"))
    )
    return (
        variants.groupBy(F.collate(F.col("name"), "UTF8_LCASE").alias("name_ci"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lower(F.col("name_ci")).cast("string").alias("name_lc"),
            "n",
        )
    )


@query(
    "fn_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_custkey % 7 = 0 THEN NULL
                ELSE CAST(o_totalprice / (o_custkey % 7) AS DOUBLE) END AS safe_div,
           CASE WHEN o_orderkey > 9223372036854775807 - 1000000000000000000
                THEN NULL ELSE o_orderkey + 1000000000000000000 END AS safe_add,
           TRY_CAST(o_orderpriority AS BIGINT) AS not_a_number
    FROM orders
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe ``try_*`` arithmetic family: ``try_divide`` (NULL on
    divide-by-zero), ``try_add`` (NULL on int64 overflow), ``try_cast``
    (NULL on malformed input) — the error-tolerant row-local operators a
    100 TB ingest uses so one dirty row NULLs out instead of killing the
    job (or, non-ANSI, silently wrapping — the overflow class the
    round-5 hash-mask fix guards). The oracle spells each as an explicit
    guard; all are codegen'd map-only expressions."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 7).alias("safe_div"),
        F.try_add(F.col("o_orderkey"), F.lit(1000000000000000000)).alias("safe_add"),
        F.col("o_orderpriority").try_cast("bigint").alias("not_a_number"),
    )


@query(
    "fn_xpath",
    oracle="""
    WITH x AS (
        SELECT n_nationkey,
               '<nation><key>' || n_nationkey || '</key><name>' || n_name
                   || '</name><region>' || n_regionkey
                   || '</region></nation>' AS xml
        FROM nation)
    SELECT n_nationkey,
           CAST(regexp_extract(xml, '<key>([^<]*)</key>', 1) AS BIGINT)
               AS key_num,
           regexp_extract(xml, '<name>([^<]*)</name>', 1) AS name_s,
           CAST(regexp_extract(xml, '<region>([^<]*)</region>', 1) AS INTEGER)
               AS region_i,
           CAST(length(xml) AS INTEGER) AS xml_len
    FROM x
    """,
)
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction over an XML string column (``xpath_long`` /
    ``xpath_string`` / ``xpath_int`` — the Hive-compatible function
    family the reference's Hive service exposes): values round-trip
    through a generated XML document and back out via real XPath
    evaluation. The oracle extracts the same fields with anchored
    regexes — a deliberately independent formulation (regex vs a real
    XML parser), which agrees exactly because the generated documents
    are canonical (no attributes, entities, or nesting ambiguity).
    Map-only: XML build + xpath both run row-local inside codegen; the
    fixture names contain no XML-escapable characters (uppercase
    letters and spaces only), so no entity encoding divergence exists.
    """
    n = load(spark, sf_dir, "nation")
    xml = F.concat(
        F.lit("<nation><key>"),
        F.col("n_nationkey").cast("string"),
        F.lit("</key><name>"),
        F.col("n_name"),
        F.lit("</name><region>"),
        F.col("n_regionkey").cast("string"),
        F.lit("</region></nation>"),
    )
    return n.select(
        "n_nationkey",
        F.xpath_long(xml, F.lit("/nation/key")).alias("key_num"),
        F.xpath_string(xml, F.lit("/nation/name")).alias("name_s"),
        F.xpath_int(xml, F.lit("/nation/region")).alias("region_i"),
        F.length(xml).alias("xml_len"),
    )


@query(
    "fn_mask_redact",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS masked_name,
           regexp_replace(regexp_replace(regexp_replace(
               c_mktsegment, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS masked_segment,
           CAST(length(c_name) AS INTEGER) AS n_chars
    FROM customer WHERE c_custkey % 13 = 0
    """,
)
def fn_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA MASKING (``mask()``, Spark 3.4+): shape-preserving
    redaction — uppercase -> X, lowercase -> x, digits -> n, everything
    else kept — the governance primitive for sharing datasets whose
    VALUES are sensitive but whose FORMAT must survive (length checks,
    pattern validation, joins on masked equality all still work).
    Complements llm_pii_redact's pattern-targeted replacement: masking
    is total and shape-preserving, redaction is selective and
    destructive.

    The oracle rebuilds mask's default character-class contract with
    three ordered regexp passes — an independent formulation that
    agrees exactly on ASCII data.  Map-only codegen; a masked 100 TB
    export runs at scan speed."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") % 13 == 0)
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_name"),
        F.mask("c_mktsegment").alias("masked_segment"),
        F.length("c_name").cast("int").alias("n_chars"),
    )
