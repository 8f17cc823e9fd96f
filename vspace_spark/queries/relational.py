"""General relational surface (SURVEY.md §2.12) over the TPC-H-ish
driver tables — joins of every type, windows, rollup/cube, set ops,
date/JSON functions, sessionization, as-of joins.

Scale notes baked into each query:
- dimension joins broadcast (region/nation/bands are O(1) rows at any SF)
- fact-fact joins shuffle on their keys and rely on AQE skew handling
- every filter is a plain column predicate → parquet pushdown
- money aggregates use exact decimals (queries/__init__ discipline)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.relational import (
    asof_join,
    dec,
    money,
    sessionize,
    top_k_per_group,
)
from vspace_spark.queries import query


def _dec2(col: str) -> F.Column:
    return dec(col, 2)  # prices: < 1e10, 2 decimal places → decimal(18,2)


def _rate(col_expr: F.Column) -> F.Column:
    return col_expr.cast("decimal(8,4)")  # discount/tax rates ∈ [0, 1]


# --- Q1-style pricing summary -------------------------------------------------

_Q1_CUTOFF = "1999-09-02"


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)::DOUBLE
           AS sum_base_price,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(8,4))), 2)::DOUBLE
           AS sum_disc_price,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(8,4))
                 * CAST(1 + l_tax AS DECIMAL(8,4))), 2)::DOUBLE
           AS sum_charge,
       round(sum(l_quantity) / count(*), 6) AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with 6 aggregates. The
    filter pushes to the parquet scan; one shuffle with map-side partial
    aggregation over a 6-value grouping key."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = _dec2("l_extendedprice") * _rate(F.lit(1) - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money(F.sum(_dec2("l_extendedprice"))).alias("sum_base_price"),
            money(F.sum(disc)).alias("sum_disc_price"),
            money(
                F.sum(disc * _rate(F.lit(1) + F.col("l_tax")))
            ).alias("sum_charge"),
            F.round(F.sum("l_quantity") / F.count("*"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# --- Q3-style top-k join ------------------------------------------------------


@query(
    "q3_top_unshipped_orders",
    oracle="""
SELECT o_orderkey,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(8,4))), 2)::DOUBLE
           AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10 (revenue
    is exact decimal, tie-broken on the unique key, so LIMIT is stable).
    customer⋈orders shuffles on custkey; orders⋈lineitem on orderkey —
    at 100 TB both sides are pre-filtered before the shuffle."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = _dec2("l_extendedprice") * _rate(F.lit(1) - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(money(F.sum(revenue)).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --- Q5-style multi-join ------------------------------------------------------


@query(
    "q5_nation_revenue",
    oracle="""
SELECT n_name,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(8,4))), 2)::DOUBLE
           AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. nation/region/supplier are
    broadcast (O(1) or tiny at any SF) so only the two fact joins
    shuffle; Catalyst reorders the dimension filters below them."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec2("l_extendedprice") * _rate(F.lit(1) - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(money(F.sum(revenue)).alias("revenue"))
    )


# --- Windows ------------------------------------------------------------------


@query(
    "top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         (row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey))::INT AS rank
  FROM orders
) WHERE rank <= 3
""",
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number with unique tie-break —
    no global sort, one shuffle on the group key."""
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        group=["o_custkey"],
        order=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )


@query(
    "customer_running_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)::DOUBLE
           AS running_spend,
       date_diff('day',
                 lag(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 o_orderdate)::INT AS days_since_prev
FROM orders
""",
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate + lag over a deterministic per-customer order:
    cumulative spend and inter-order gap."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = F.sum(_dec2("o_totalprice")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        money(running).alias("running_spend"),
        F.datediff(F.col("o_orderdate"), prev)
        .cast("int")
        .alias("days_since_prev"),
    )


# --- Grouping sets ------------------------------------------------------------


@query(
    "rollup_order_totals",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL')   AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*)::BIGINT AS n_orders,
       round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)::DOUBLE AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status×priority → grand)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum(_dec2("o_totalprice"))).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
    )


@query(
    "cube_lineitem_counts",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*)::BIGINT AS n,
       sum(l_quantity) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_lineitem_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets in one pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "qty",
        )
    )


# --- Semi / anti joins ----------------------------------------------------------


@query(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS). At scale the orders side is reduced
    to distinct keys by the aggregate pushdown inside the join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "customers_with_high_value_order",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
""",
)
def customers_with_high_value_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) with a pushed-down predicate on the
    probe side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


# --- Non-equi (theta) join ------------------------------------------------------


@query(
    "part_price_bands",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('b900', 900.0, 905.0), ('b905', 905.0, 910.0),
         ('b910', 910.0, 915.0), ('b915', 915.0, 920.0)
)
SELECT band,
       count(*)::BIGINT AS n_parts,
       round(sum(CAST(p_retailprice AS DECIMAL(18,2))), 2)::DOUBLE
           AS total_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
""",
)
def part_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join against a broadcast tiny dimension → broadcast
    nested-loop, the right plan when one side is O(1) rows; never a
    cross join of two fact tables."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("b900", 900.0, 905.0), ("b905", 905.0, 910.0),
         ("b910", 910.0, 915.0), ("b915", 915.0, 920.0)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            money(F.sum(_dec2("p_retailprice"))).alias("total_price"),
        )
    )


# --- As-of join -----------------------------------------------------------------


@query(
    "asof_purchase_prior_view",
    oracle="""
WITH e AS (SELECT event_id, user_id, event_type,
                  CAST(ts AS TIMESTAMP) AS ts FROM events)
SELECT p.event_id AS purchase_id, p.user_id,
       (SELECT v.event_id FROM e v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          AND v.ts < p.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS prior_view_id
FROM e p WHERE p.event_type = 'purchase'
""",
)
def asof_purchase_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest strictly-earlier
    view by the same user — the union+window formulation (ONE shuffle on
    user_id, no correlated probe; see operators/relational.py:asof_join)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("prior_view_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        right_cols=["prior_view_id"],
        tie_break="prior_view_id",
        strict=True,
    )
    return joined.select("purchase_id", "user_id", "prior_view_id")


# --- Set operations ---------------------------------------------------------------


@query(
    "repeat_customers_both_years",
    oracle="""
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
""",
)
def repeat_customers_both_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics)."""
    orders = load_table(spark, sf_dir, "orders")

    def keys(year: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return keys(1995).intersect(keys(1996))


@query(
    "churned_customers_1995",
    oracle="""
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
""",
)
def churned_customers_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics)."""
    orders = load_table(spark, sf_dir, "orders")

    def keys(year: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return keys(1995).subtract(keys(1996))


# --- Date / JSON scalar functions --------------------------------------------------


@query(
    "monthly_revenue",
    oracle="""
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       count(*)::BIGINT AS n_orders,
       round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)::DOUBLE AS revenue
FROM orders GROUP BY 1
""",
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc time series — the partition-pruning-friendly way to
    bucket timestamps."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
    ).agg(
        F.count("*").alias("n_orders"),
        money(F.sum(_dec2("o_totalprice"))).alias("revenue"),
    )


@query(
    "events_json_stats",
    oracle="""
SELECT event_type,
       sum(CAST(regexp_extract(props, '[0-9]+') AS INT))::BIGINT AS sum_k,
       count(*)::BIGINT AS n,
       round(sum(CAST(regexp_extract(props, '[0-9]+') AS INT))::DOUBLE
             / count(*), 6) AS avg_k
FROM events GROUP BY event_type
""",
)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column parsing: ``props`` → ``map<string,int>`` via
    ``from_json`` + ``element_at`` (exercises JSON + map functions;
    the oracle reads the single numeric field with a regex to stay
    engine-neutral)."""
    events = load_table(spark, sf_dir, "events")
    k = F.element_at(F.from_json("props", "map<string,int>"), "k")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count("*").alias("n"),
        F.round(F.sum(k).cast("double") / F.count("*"), 6).alias("avg_k"),
    )


# --- Sessionization -----------------------------------------------------------------


@query(
    "user_sessions",
    oracle="""
WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN date_diff('microsecond',
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts) > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
         THEN 1 ELSE 0 END AS is_new
  FROM e
),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, session_id::BIGINT AS session_id,
       count(*)::BIGINT AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_id
""",
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap) — lag + running sum,
    one shuffle on user_id (operators/relational.py:sessionize). The
    streaming twin uses ``session_window`` (streaming/events.py)."""
    events = load_table(spark, sf_dir, "events")
    sess = sessionize(
        events.select("user_id", "ts", "event_id"),
        key="user_id",
        ts="ts",
        gap_minutes=30,
        order_tie="event_id",
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# --- Pivot ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "daily_event_pivot",
    oracle="""
SELECT CAST(ts AS DATE) AS day,
       count(*) FILTER (event_type = 'click')::BIGINT    AS click,
       count(*) FILTER (event_type = 'error')::BIGINT    AS error,
       count(*) FILTER (event_type = 'purchase')::BIGINT AS purchase,
       count(*) FILTER (event_type = 'signup')::BIGINT   AS signup,
       count(*) FILTER (event_type = 'view')::BIGINT     AS view
FROM events GROUP BY 1
""",
)
def daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit values (explicit list keeps it one pass — no
    distinct-values pre-query, which matters on a 100 TB fact table)."""
    events = load_table(spark, sf_dir, "events")
    out = (
        events.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )
    return out


# --- Exact & approximate distincts ----------------------------------------------------


@query(
    "distinct_users_per_type",
    oracle="""
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY event_type
""",
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (two-phase under the hood)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


@query("approx_distinct_users")  # no oracle: sketch values are engine-specific
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB answer to
    COUNT(DISTINCT): one pass, fixed memory, no exact shuffle. Checked
    rows-only (sketch estimates are engine-specific by construction);
    test_relational.py bounds its error against the exact count."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("median_value_approx"),
    )


@query(
    "events_variant_stats",
    oracle="""
WITH k AS (
  SELECT event_type,
         CAST(regexp_extract(props, '[0-9]+') AS INT) AS kv
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(kv)::BIGINT AS sum_k,
       min(kv)::INT AS min_k,
       max(kv)::INT AS max_k,
       count(*) FILTER (kv % 2 = 1)::BIGINT AS odd_k
FROM k GROUP BY event_type
""",
)
def events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured fast path via Spark 4's VARIANT type:
    ``parse_json`` shreds ``props`` once into the binary variant
    encoding, ``variant_get`` then reads ``$.k`` with a typed path —
    at scale this replaces per-expression JSON string re-parsing
    (``from_json``, events_json_stats) with one decode feeding any
    number of typed extractions, and variant-aware readers can push
    the shredding into the scan. Integer aggregates only, so the
    value-hash gate is exact; the oracle reads the single numeric
    field with a regex to stay engine-neutral."""
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count(F.when(k % 2 == 1, 1)).alias("odd_k"),
    )
