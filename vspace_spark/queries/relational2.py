"""Relational surface, part 2: outer joins, the full window-function
suite, explicit GROUPING SETS, bag-semantics set ops, exact percentiles,
string/math/array scalar functions, range-frame windows, correlated
aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.relational import dec, money
from vspace_spark.queries import query


@query(
    "customer_order_full_outer",
    oracle="""
SELECT coalesce(c_custkey, o_custkey) AS custkey,
       c_mktsegment,
       count(o_orderkey)::BIGINT AS n_orders
FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
GROUP BY 1, 2
""",
)
def customer_order_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: customers without orders AND (hypothetical)
    orphan orders both survive with nulls."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
    return joined.groupBy(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"), "c_mktsegment"
    ).agg(F.count("o_orderkey").alias("n_orders"))


@query(
    "order_rank_suite",
    oracle="""
SELECT o_custkey, o_orderkey,
       rank()       OVER w::INT AS rnk,
       dense_rank() OVER w::INT AS drnk,
       ntile(4)     OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey)::INT AS quartile,
       lead(o_orderkey)    OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS next_order,
       first_value(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING) AS first_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def order_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / lead / first_value in one pass —
    one shuffle on the partition key serves all five frames."""
    orders = load_table(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    by_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(by_price).alias("rnk"),
        F.dense_rank().over(by_price).alias("drnk"),
        F.ntile(4).over(by_price).alias("quartile"),
        F.lead("o_orderkey").over(by_date).alias("next_order"),
        F.first("o_orderkey").over(
            by_date.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("first_order"),
    )


@query(
    "trailing_30d_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2)::DOUBLE
           AS spend_30d
FROM orders
""",
)
def trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over event time: trailing-30-day spend per
    customer (epoch-seconds ordering so the frame is a true time
    range, not a row count)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        money(F.sum(dec("o_totalprice", 2)).over(w)).alias("spend_30d"),
    )


@query(
    "grouping_sets_revenue",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)::DOUBLE AS rev
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube) via Spark SQL —
    per-flag, per-status, and grand totals in one aggregation pass."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS rev
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "part_brand_intersect_all",
    oracle="""
SELECT p_brand FROM part WHERE p_size > 10
INTERSECT ALL
SELECT p_brand FROM part WHERE p_retailprice > 905
""",
)
def part_brand_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the two
    sides), vs the set-semantics INTERSECT in part 1."""
    part = load_table(spark, sf_dir, "part")
    a = part.filter(F.col("p_size") > 10).select("p_brand")
    b = part.filter(F.col("p_retailprice") > 905).select("p_brand")
    return a.intersectAll(b)


@query(
    "part_brand_except_all",
    oracle="""
SELECT p_brand FROM part WHERE p_size > 10
EXCEPT ALL
SELECT p_brand FROM part WHERE p_retailprice > 905
""",
)
def part_brand_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity subtraction)."""
    part = load_table(spark, sf_dir, "part")
    a = part.filter(F.col("p_size") > 10).select("p_brand")
    b = part.filter(F.col("p_retailprice") > 905).select("p_brand")
    return a.exceptAll(b)


@query(
    "price_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6)  AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem GROUP BY l_returnflag
""",
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (Spark's ``percentile``, linear interpolation —
    same definition as DuckDB's quantile_cont). The approximate
    variant lives in approx_distinct_users (rows-only by design)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", 0.9), 6).alias("p90"),
        F.round(F.percentile("l_extendedprice", 0.99), 6).alias("p99"),
    )


@query(
    "string_functions_suite",
    oracle="""
SELECT DISTINCT source,
       upper(source) AS src_upper,
       lpad(source, 8, '0') AS src_padded,
       substring(source, 4) AS src_num,
       levenshtein(source, 'src0')::INT AS lev_from_src0,
       concat(source, ':', reverse(source)) AS round_trip
FROM documents
""",
)
def string_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions: upper/lpad/substring/levenshtein/
    reverse/concat — all JVM built-ins, exact cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "source",
        F.upper("source").alias("src_upper"),
        F.lpad("source", 8, "0").alias("src_padded"),
        F.substring("source", 4, 2147483647).alias("src_num"),
        F.levenshtein("source", F.lit("src0")).alias("lev_from_src0"),
        F.concat("source", F.lit(":"), F.reverse("source")).alias("round_trip"),
    ).distinct()


@query(
    "math_functions_suite",
    oracle="""
SELECT l_linenumber,
       round(sum(sqrt(l_quantity)), 6)            AS sum_sqrt_qty,
       round(sum(ln(l_extendedprice)), 6)         AS sum_ln_price,
       round(sum(pow(l_discount, 2)), 6)          AS sum_disc_sq,
       sum(abs(l_quantity - 25))                  AS sum_abs_dev,
       sum(ceil(l_discount * 10))::BIGINT         AS sum_ceil,
       sum(floor(l_tax * 10))::BIGINT             AS sum_floor
FROM lineitem GROUP BY l_linenumber
""",
)
def math_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions over a grouped aggregate. sqrt/ln/pow are
    IEEE-deterministic on identical inputs; sums of ≤ 2k terms keep the
    error far below the 1e-6 rounding grain."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linenumber").agg(
        F.round(F.sum(F.sqrt("l_quantity")), 6).alias("sum_sqrt_qty"),
        F.round(F.sum(F.log("l_extendedprice")), 6).alias("sum_ln_price"),
        F.round(F.sum(F.pow("l_discount", F.lit(2))), 6).alias("sum_disc_sq"),
        F.sum(F.abs(F.col("l_quantity") - 25)).alias("sum_abs_dev"),
        F.sum(F.ceil(F.col("l_discount") * 10)).alias("sum_ceil"),
        F.sum(F.floor(F.col("l_tax") * 10)).alias("sum_floor"),
    )


@query(
    "doc_token_arrays",
    oracle="""
WITH t AS (
  SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS toks
  FROM documents
)
SELECT doc_id,
       array_to_string(toks[1:5], ',') AS first5,
       len(toks)::INT AS n_distinct,
       list_contains(toks, 'data') AS has_data
FROM t
""",
)
def doc_token_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions: array_distinct/sort_array/slice/array_join/
    array_contains over the token array (string-serialized output so
    the hash comparison is representation-independent)."""
    from vspace_spark.functions.text import tokenize_col

    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_sort(F.array_distinct(tokenize_col("text")))
    return docs.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 5), ",").alias("first5"),
        F.size(toks).alias("n_distinct"),
        F.array_contains(toks, "data").alias("has_data"),
    )


@query(
    "orders_above_segment_avg",
    oracle="""
WITH seg AS (
  SELECT c_mktsegment,
         avg(o_totalprice) AS seg_avg
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_mktsegment
)
SELECT o_orderkey, c_mktsegment,
       round(o_totalprice - seg_avg, 6) AS above_avg
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN seg USING (c_mktsegment)
WHERE o_totalprice > seg_avg
""",
)
def orders_above_segment_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate pattern (orders above their segment's
    average) decorrelated into an explicit aggregate + re-join — the
    plan Catalyst produces for the subquery form, written directly.
    avg is sum/count of identical doubles on both engines → exact."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    seg = joined.groupBy("c_mktsegment").agg(
        F.avg("o_totalprice").alias("seg_avg")
    )
    return (
        joined.join(F.broadcast(seg), "c_mktsegment")
        .filter(F.col("o_totalprice") > F.col("seg_avg"))
        .select(
            "o_orderkey",
            "c_mktsegment",
            F.round(F.col("o_totalprice") - F.col("seg_avg"), 6).alias(
                "above_avg"
            ),
        )
    )


@query(
    "q7_nation_volume",
    oracle="""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       year(o_orderdate)::INT AS yr,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(8,4))), 2)::DOUBLE
           AS volume
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_nationkey != n2.n_nationkey
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume — the same dimension
    (nation) joined twice under different roles, with an inequality
    between the two role keys. Both nation joins broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = dec("l_extendedprice", 2) * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(8,4)"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("c_nk") != F.col("s_nk"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("o_orderdate").alias("yr")
        )
        .agg(money(F.sum(vol)).alias("volume"))
    )


@query(
    "token_positions",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE doc_id < 50)
SELECT doc_id,
       (unnest(range(len(toks))))::INT AS pos,
       toks[unnest(range(len(toks))) + 1] AS token
FROM t
""",
)
def token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: position-preserving flattening (the arrays_zip/
    posexplode surface) — token order matters for n-gram provenance."""
    from vspace_spark.functions.text import tokenize_col

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.posexplode(tokenize_col("text")).alias("pos", "token"),
    )
