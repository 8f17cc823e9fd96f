"""Log-analytics queries over events + documents — funnel, cohort
retention, per-source rollups, TF-IDF retrieval, promo/disjunctive
TPC-H shapes. The reference's domain is log/corpus analytics
(BASELINE.json category), so these are first-class surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.relational import dec, money
from vspace_spark.operators.stats import tokenized_documents
from vspace_spark.queries import query


@query(
    "funnel_view_click_purchase",
    oracle="""
WITH e AS (SELECT user_id, event_type, event_id,
                  CAST(ts AS TIMESTAMP) AS ts FROM events),
v AS (SELECT user_id, min(ts) AS first_view FROM e
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT user_id, min(ts) AS first_click FROM e
      WHERE event_type = 'click' GROUP BY user_id),
p AS (SELECT user_id, min(ts) AS first_purchase FROM e
      WHERE event_type = 'purchase' GROUP BY user_id),
funnel AS (
  SELECT v.user_id,
         1 AS viewed,
         CASE WHEN c.first_click > v.first_view THEN 1 ELSE 0 END AS clicked,
         CASE WHEN c.first_click > v.first_view
               AND p.first_purchase > c.first_click THEN 1 ELSE 0 END
             AS purchased
  FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
)
SELECT sum(viewed)::BIGINT    AS n_viewed,
       sum(clicked)::BIGINT   AS n_clicked,
       sum(purchased)::BIGINT AS n_purchased
FROM funnel
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes first click
    precedes first purchase. One conditional aggregation per stage +
    two left joins on user_id — no per-user window materialization, so
    the shuffle carries one row per user per stage at any scale."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(t: str, name: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == t)
            .groupBy("user_id")
            .agg(F.min("ts").alias(name))
        )

    v = first_ts("view", "first_view")
    c = first_ts("click", "first_click")
    p = first_ts("purchase", "first_purchase")
    funnel = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            F.lit(1).alias("viewed"),
            F.when(F.col("first_click") > F.col("first_view"), 1)
            .otherwise(0)
            .alias("clicked"),
            F.when(
                (F.col("first_click") > F.col("first_view"))
                & (F.col("first_purchase") > F.col("first_click")),
                1,
            )
            .otherwise(0)
            .alias("purchased"),
        )
    )
    return funnel.agg(
        F.sum("viewed").alias("n_viewed"),
        F.sum("clicked").alias("n_clicked"),
        F.sum("purchased").alias("n_purchased"),
    )


@query(
    "cohort_daily_retention",
    oracle="""
WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
           FROM events),
cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, day FROM e)
SELECT cohort_day,
       date_diff('day', cohort_day, day)::INT AS day_offset,
       count(*)::BIGINT AS active_users
FROM activity JOIN cohort USING (user_id)
GROUP BY 1, 2
""",
)
def cohort_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen day,
    counted on each subsequent active day. Cohort assignment is an
    aggregation re-joined (broadcastable — one row per user), not a
    window over the event stream."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    cohort = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = e.distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
SELECT round(
         100.00 * sum(CASE WHEN p_type LIKE 'PROMO%%'
                           THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                * CAST(1 - l_discount AS DECIMAL(8,4))
                           ELSE 0 END)
         / sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(8,4))), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-02-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact⋈dim join
    with a LIKE predicate; part is broadcast. The division of two exact
    decimal sums is one double op → deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice", 2) * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(8,4)"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            100.0
            * F.sum(
                F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_pct")
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
SELECT round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(8,4))), 2)::DOUBLE
           AS revenue,
       count(*)::BIGINT AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
""",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-column predicates spanning
    both join sides. Catalyst extracts the common l_partkey equi-key so
    the plan is a broadcast hash join with a residual OR filter — not a
    nested loop."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    rev = dec("l_extendedprice", 2) * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(8,4)"
    )
    return joined.filter(cond).agg(
        money(F.sum(rev)).alias("revenue"), F.count("*").alias("n")
    )


@query(
    "min_cost_supplier_per_part",
    oracle="""
SELECT l_partkey, l_suppkey, min_price FROM (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice) OVER (PARTITION BY l_partkey) AS min_price,
         l_extendedprice,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY l_extendedprice, l_suppkey) AS rn
  FROM lineitem
) WHERE rn = 1
""",
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-per-group with the argmin row): window min +
    row_number in one shuffle, instead of the correlated subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    wo = w.orderBy("l_extendedprice", "l_suppkey")
    return (
        li.select(
            "l_partkey",
            "l_suppkey",
            F.min("l_extendedprice").over(w).alias("min_price"),
            F.row_number().over(wo).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "min_price")
    )


@query(
    "tfidf_search",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
ex AS (SELECT doc_id, unnest(t) AS token FROM toks),
perdoc AS (SELECT doc_id, token, count(*) AS tf FROM ex GROUP BY ALL),
df AS (SELECT token, count(*) AS df FROM perdoc GROUP BY token),
n AS (SELECT count(*) AS n FROM documents),
q(token) AS (VALUES ('spark'), ('join'), ('window')),
scored AS (
  SELECT p.doc_id,
         sum(p.tf * ln((SELECT n FROM n) / df.df)) AS score
  FROM perdoc p JOIN df USING (token) JOIN q USING (token)
  GROUP BY p.doc_id
)
SELECT doc_id, rank FROM (
  SELECT doc_id,
         (row_number() OVER (ORDER BY score DESC, doc_id))::INT AS rank
  FROM scored
) WHERE rank <= 10
""",
)
def tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF retrieval: rank documents for a query term set using the
    engine's own term statistics (§2.11 — the scoring query the
    reference's stats exist to serve but never implemented). Query
    terms broadcast; one aggregation per doc.

    The broadcast term filter runs FIRST, and document frequency is
    computed on the filtered stream — identical counts (perdoc is one
    row per (doc, token)), but the df aggregation shuffles only the
    query terms' postings instead of the full vocabulary (VERDICT r2:
    the old shape paid a vocabulary-sized shuffle to score 3 terms).
    The per-term df is query-terms-sized, so it broadcasts back."""
    from vspace_spark.operators.scale import (
        est_relation_bytes,
        persist_shared,
    )

    docs = load_table(spark, sf_dir, "documents")
    terms = spark.createDataFrame(
        [("spark",), ("join",), ("window",)], "token string"
    )
    # consumed twice (df build + scoring) — persist the FILTERED form:
    # |query terms| posting lists, not the whole exploded corpus.
    # Upper bound: perdoc rows ≤ |terms| per document (docs is a bare
    # scan → exact footer row count × |terms| × row width), so a
    # popular-term posting list over a big corpus still crosses the
    # disk floor instead of heap-parking (VERDICT r12 #5)
    matched = persist_shared(
        tokenized_documents(docs).join(F.broadcast(terms), "token"),
        est_relation_bytes(docs, row_bytes=3 * 48),
    )
    df = matched.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    scored = (
        matched.join(F.broadcast(df), "token")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("score")
        )
    )
    # global top-k via sort+limit (TakeOrderedAndProject: per-partition
    # partial top-10 + driver merge — parallel at any corpus size), NOT
    # an unpartitioned row_number window, which would funnel every
    # scored doc through one task (the r1 vocabulary-id scale-killer).
    # The rank window then runs over the 10 surviving rows only.
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("doc_id", "rank")
    )


@query(
    "merge_upsert_orders",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_custkey,
         round(CAST(o_totalprice AS DECIMAL(18,2))
               * CAST(1.1 AS DECIMAL(3,2)), 2)::DOUBLE AS o_totalprice,
         'P' AS o_orderstatus
  FROM orders WHERE o_orderkey % 10 = 0
),
untouched AS (
  SELECT o_orderkey, o_custkey,
         round(CAST(o_totalprice AS DECIMAL(18,2)), 2)::DOUBLE
             AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 10 != 0
)
SELECT * FROM untouched UNION ALL SELECT * FROM updates
""",
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (no Delta in this image): target anti-join
    updates ∪ updates — the upsert plan lakehouses run under the hood.
    The updates side is derived deterministically from orders (every
    10th key gets a 10% price bump and status P)."""
    from vspace_spark.operators.relational import dec, money

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        money(dec("o_totalprice", 2)).alias("o_totalprice"),
        "o_orderstatus",
    )
    updates = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            money(
                dec("o_totalprice", 2) * F.lit("1.1").cast("decimal(3,2)")
            ).alias("o_totalprice"),
            F.lit("P").alias("o_orderstatus"),
        )
    )
    untouched = orders.join(updates, "o_orderkey", "left_anti")
    return untouched.unionByName(updates)


@query(
    "daily_revenue_gapfilled",
    oracle="""
WITH bounds AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS lo,
         CAST(max(o_orderdate) AS DATE) AS hi
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-04-01'
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)::DOUBLE AS revenue
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-04-01'
  GROUP BY 1
)
SELECT spine.day, coalesce(daily.revenue, 0.0) AS revenue,
       (daily.day IS NULL) AS gap_filled
FROM spine LEFT JOIN daily USING (day)
""",
)
def daily_revenue_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a `sequence()` date spine left-joined
    onto daily aggregates (missing days → 0, flagged). The spine is
    generated, not scanned — no shuffle beyond the daily aggregate."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp")
    )
    from vspace_spark.operators.relational import dec, money

    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        money(F.sum(dec("o_totalprice", 2))).alias("revenue")
    )
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.col("revenue").isNull().alias("gap_filled"),
    )


# Count-min sketch geometry: 4 hash rows × 16 counters — sized to the
# fixture's 31-token vocabulary so collisions actually occur
# (non-vacuous overestimates; W=1024 measured zero collisions here).
# At corpus scale W grows to 2^20+ and the sketch is still KB-sized.
_CMS_D = 4
_CMS_W = 16


@query(
    "token_cms_estimates",
    oracle=f"""
WITH flat AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT token, count(*)::BIGINT AS tf FROM flat GROUP BY token),
kb AS (
  SELECT token, tf, j.j AS j,
         ('0x' || substr(md5(j.j::VARCHAR || ':' || token), 1, 8))::BIGINT
             % {_CMS_W} AS bucket
  FROM tf, (SELECT unnest(range({_CMS_D})) AS j) j
),
cms AS (SELECT j, bucket, sum(tf)::BIGINT AS c FROM kb GROUP BY j, bucket)
SELECT kb.token, any_value(kb.tf) AS tf, min(cms.c)::BIGINT AS cms_est,
       (min(cms.c) - any_value(kb.tf))::BIGINT AS overestimate
FROM kb JOIN cms USING (j, bucket)
GROUP BY kb.token
HAVING any_value(kb.tf) >= 5
""",
)
def token_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream, fully under the exact
    oracle gate — the approximate-counting structure real pipelines
    keep when the exact vocabulary is too big, here with PORTABLE md5
    row-hashes so every counter, estimate, and overestimate reproduces
    bit-for-bit in ANSI SQL (the same portable-hash strategy that made
    MinHash/SimHash/ANN-LSH oracle-checkable). Emits, for every token
    with true frequency ≥ 5, the true count, the CMS point estimate
    (min over the 4 row counters), and the overestimate — ≥ 0 by
    construction, and genuinely non-zero on the fixture because the
    4 × 16 geometry is sized to its 31-token vocabulary (W=1024
    collided nothing — a vacuous sketch check).

    Scale shape: the sketch build is ONE hash aggregation over the
    token stream (map-side combined; the flagship's Zipf-bounded key
    space) followed by a d × W-row aggregation — the sketch itself is
    KB-sized at any corpus size and broadcasts back for the estimate
    join. Integer arithmetic throughout: no float discipline needed at
    all."""
    docs = load_table(spark, sf_dir, "documents")
    from vspace_spark.functions.text import tokenize_col

    tf = (
        docs.select(F.explode(tokenize_col("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
    )
    kb = tf.select(
        "token",
        "tf",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"{j}:"), F.col("token")
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % _CMS_W
                        ).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("_jb"),
    ).select("token", "tf", "_jb.j", "_jb.bucket")
    cms = kb.groupBy("j", "bucket").agg(F.sum("tf").cast("long").alias("c"))
    return (
        kb.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy("token")
        .agg(
            F.first("tf").cast("long").alias("tf"),
            F.min("c").alias("cms_est"),
            (F.min("c") - F.first("tf")).cast("long").alias("overestimate"),
        )
        .filter(F.col("tf") >= 5)
    )


@query(
    "daily_revenue_interpolated",
    oracle="""
WITH sub AS (
  SELECT CAST(o_orderdate AS DATE) AS day, o_totalprice
  FROM orders
  WHERE o_orderkey % 199 = 0
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM sub),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
),
daily AS (
  SELECT day,
         round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)::DOUBLE
             AS revenue
  FROM sub GROUP BY 1
),
j AS (SELECT spine.day, daily.revenue
      FROM spine LEFT JOIN daily USING (day)),
ctx AS (
  SELECT day, revenue,
         last_value(revenue IGNORE NULLS) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_v,
         last_value(CASE WHEN revenue IS NOT NULL THEN day END
                    IGNORE NULLS) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_d,
         first_value(revenue IGNORE NULLS) OVER (
           ORDER BY day ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS next_v,
         first_value(CASE WHEN revenue IS NOT NULL THEN day END
                     IGNORE NULLS) OVER (
           ORDER BY day ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS next_d
  FROM j
)
SELECT day,
       round(CASE WHEN revenue IS NOT NULL THEN revenue
             ELSE prev_v + (next_v - prev_v)
                  * date_diff('day', prev_d, day)
                  / date_diff('day', prev_d, next_d) END, 6) AS revenue,
       (revenue IS NULL) AS interpolated
FROM ctx
""",
)
def daily_revenue_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series LINEAR INTERPOLATION over a date spine — the
    gap-fill variant that estimates missing days from their bracketing
    observations instead of zeroing them (sensor/metric pipelines'
    default). The input is deterministically sparsified
    (``o_orderkey % 199``) so gaps exist at EVERY fixture scale — the
    plain gap-fill's window has no missing days from sf0.01 up, which
    would make this check vacuous.

    Scale shape: the corpus-sized work is one daily aggregation; the
    interpolation windows run over the DATE SPINE (#days rows — a
    bounded, calendar-sized table, not data-sized), so the
    unpartitioned window is safe by construction, same as the
    gap-fill's spine join. Float discipline: revenue is
    DECIMAL-summed then rounded; the interpolation is the identical
    ``prev + (next − prev) * k / n`` expression tree in both engines
    (int day-diffs, one multiply then one divide), then round(6)."""
    from vspace_spark.operators.relational import dec, money

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 199 == 0
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        money(F.sum(dec("o_totalprice", 2))).alias("revenue")
    )
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    j = spine.join(daily, "day", "left")
    w_prev = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.orderBy("day")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("revenue").isNotNull(), F.col("day"))
    ctx = j.select(
        "day",
        "revenue",
        F.last("revenue", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("prev_d"),
        F.first("revenue", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("next_d"),
    )
    interp = F.col("prev_v") + (
        F.col("next_v") - F.col("prev_v")
    ) * F.datediff("day", "prev_d") / F.datediff("next_d", "prev_d")
    return ctx.select(
        "day",
        F.round(
            F.when(F.col("revenue").isNotNull(), F.col("revenue")).otherwise(
                interp
            ),
            6,
        ).alias("revenue"),
        F.col("revenue").isNull().alias("interpolated"),
    )


# HLL geometry: 64 registers (6 index bits + 54 rho bits from a 60-bit
# md5 prefix). alpha(64) = 0.709 (Flajolet et al. 2007).
_HLL_M = 64


@query(
    "user_hll_distinct",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type, user_id,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h60
  FROM events
),
split AS (
  SELECT event_type, h60 % {_HLL_M} AS idx, h60 // {_HLL_M} AS rem
  FROM h
),
rho AS (
  SELECT event_type, idx,
         CASE WHEN rem = 0 THEN 55
              ELSE 55 - length(bin(rem)) END AS rho
  FROM split
),
regs AS (
  SELECT event_type, idx, max(rho) AS r
  FROM rho GROUP BY event_type, idx
),
sums AS (
  SELECT event_type,
         (sum(((2::DOUBLE) ** (55 - r))::BIGINT)
          + ({_HLL_M} - count(*)) * ((2::DOUBLE) ** 55)::BIGINT)::BIGINT
             AS s,
         count(*)::BIGINT AS nonzero_registers
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT sums.event_type, sums.nonzero_registers, exact.exact_distinct,
       round(0.709::DOUBLE * {_HLL_M} * {_HLL_M}
             * 36028797018963968.0 / sums.s::DOUBLE, 6)
           AS hll_estimate
FROM sums JOIN exact USING (event_type)
""",
)
def user_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimation, fully under the EXACT
    oracle gate — the cardinality sketch engines normally hide behind
    `approx_count_distinct` (rows-only there, by design), rebuilt with
    portable arithmetic so both engines reproduce every register and
    the estimate bit-for-bit:

    - 60-bit md5 prefix → 6-bit register index + 54-bit remainder;
    - rho = leading zeros + 1 via ``length(bin(x))`` — an INTEGER
      string op, not float log2;
    - the harmonic sum Σ 2^-rho is scaled by 2^55 so it is a BIGINT
      sum of exact powers of two — order-free, no float aggregation
      (the unscaled float sum would be summation-order-dependent);
    - one final constant × division × round(6) (alpha(64) = 0.709).

    Raw estimate only — the standard small-range linear-counting
    correction needs ln(), whose last-ulp behavior differs across
    libm builds; ``nonzero_registers`` and ``exact_distinct`` ride
    along so accuracy is inspectable. m=64 draws legitimately swing
    ±35% singly; tests/test_properties.py asserts the estimator is
    UNBIASED (mean over independent key families within ±12%).

    Scale shape: one distinct-projection + one 64-registers-per-group
    aggregation, both map-side combined; the sketch is bytes per
    group at any cardinality — the whole point of HLL."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("bigint").alias("h60"),
        "user_id",
    ).dropDuplicates(["event_type", "user_id"])
    split = h.select(
        "event_type",
        (F.col("h60") % _HLL_M).alias("idx"),
        F.expr(f"h60 div {_HLL_M}").alias("rem"),
    )
    rho = split.select(
        "event_type",
        "idx",
        F.when(F.col("rem") == 0, F.lit(55))
        .otherwise(F.lit(55) - F.length(F.bin("rem")))
        .alias("rho"),
    )
    regs = rho.groupBy("event_type", "idx").agg(F.max("rho").alias("r"))
    sums = regs.groupBy("event_type").agg(
        (
            F.sum(F.pow(F.lit(2.0), 55 - F.col("r")).cast("bigint"))
            + (_HLL_M - F.count("*"))
            * F.lit(2**55).cast("bigint")
        ).cast("bigint").alias("s"),
        F.count("*").cast("long").alias("nonzero_registers"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return sums.join(exact, "event_type").select(
        "event_type",
        "nonzero_registers",
        "exact_distinct",
        F.round(
            F.lit(0.709 * _HLL_M * _HLL_M * 36028797018963968.0)
            / F.col("s").cast("double"),
            6,
        ).alias("hll_estimate"),
    )


# Bloom geometry: 3 hashes × 64 bits over the fixture's 31-token
# vocabulary → fill ratio ~0.75, so false positives actually occur
# (the check is non-vacuous, like the CMS sizing above).
_BLOOM_K = 3
_BLOOM_BITS = 64


@query(
    "vocab_bloom_membership",
    oracle=f"""
WITH vocab AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents
),
probes AS (
  SELECT token, TRUE AS is_member FROM vocab
  UNION ALL
  SELECT token || '~', FALSE FROM vocab
),
pb AS (
  SELECT p.token, p.is_member, j.j,
         ('0x' || substr(md5(j.j::VARCHAR || '#' || p.token), 1, 8))::BIGINT
             % {_BLOOM_BITS} AS bit
  FROM probes p, (SELECT unnest(range({_BLOOM_K})) AS j) j
),
bloom AS (SELECT DISTINCT bit FROM pb WHERE is_member),
hits AS (
  SELECT pb.token, pb.is_member, count(b.bit)::BIGINT AS nb
  FROM pb LEFT JOIN bloom b ON pb.bit = b.bit
  GROUP BY pb.token, pb.is_member
)
SELECT token, is_member,
       (nb = {_BLOOM_K}) AS bloom_hit,
       (nb = {_BLOOM_K} AND NOT is_member) AS false_positive
FROM hits
""",
)
def vocab_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership, fully under the exact oracle gate —
    the third portable sketch next to the count-min (`token_cms_
    estimates`) and HLL (`user_hll_distinct`): 3 md5-derived bit
    positions over a 64-bit filter built from the corpus vocabulary,
    probed with every vocabulary token (must hit) and a deterministic
    non-member twin per token (``token || '~'`` — may false-positive,
    and genuinely does at this fill ratio). Every bit position, hit,
    and false positive reproduces in ANSI SQL — the runtime-filter
    cousin of the MEASURED bloom join pruning in
    scripts/runtime_filter_bench.py (that one uses Spark's native
    engine-internal filter; this one puts the structure itself under
    the correctness gate).

    Scale shape: the filter is bits (broadcast scalar set — here a
    64-row table, semi-joined); the build is one distinct-projection.
    In production the member side is the small dimension (the
    vocabulary / the id set), exactly the runtime-filter shape."""
    from vspace_spark.functions.text import tokenize_col

    docs = load_table(spark, sf_dir, "documents")
    vocab = docs.select(
        F.explode(tokenize_col("text")).alias("token")
    ).distinct()
    probes = vocab.select("token", F.lit(True).alias("is_member")).unionByName(
        vocab.select(
            F.concat(F.col("token"), F.lit("~")).alias("token"),
            F.lit(False).alias("is_member"),
        )
    )
    pb = probes.select(
        "token",
        "is_member",
        F.explode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(F.lit(f"{j}#"), F.col("token"))
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("bigint")
                        % _BLOOM_BITS
                    )
                    for j in range(_BLOOM_K)
                ]
            )
        ).alias("bit"),
    )
    bloom = pb.filter("is_member").select("bit").distinct()
    hits = (
        pb.join(
            F.broadcast(bloom.withColumn("_in", F.lit(1))), "bit", "left"
        )
        .groupBy("token", "is_member")
        .agg(F.count("_in").alias("nb"))
    )
    return hits.select(
        "token",
        "is_member",
        (F.col("nb") == _BLOOM_K).alias("bloom_hit"),
        ((F.col("nb") == _BLOOM_K) & ~F.col("is_member")).alias(
            "false_positive"
        ),
    )


@query(
    "events_rollup_cascade",
    oracle="""
WITH e AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
),
daily AS (
  SELECT date_trunc('day', ts) AS period_start, event_type,
         count(*)::BIGINT AS n, sum(v) AS sv
  FROM e GROUP BY 1, 2
),
monthly AS (
  SELECT date_trunc('month', ts) AS period_start, event_type,
         count(*)::BIGINT AS n, sum(v) AS sv
  FROM e GROUP BY 1, 2
)
SELECT 'daily' AS grain, period_start, event_type, n,
       round(sv, 6)::DOUBLE AS sum_value
FROM daily
UNION ALL
SELECT 'monthly', period_start, event_type, n,
       round(sv, 6)::DOUBLE
FROM monthly
""",
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup CASCADE (continuous-aggregate algebra):
    the hourly aggregate is materialized ONCE and the daily and
    monthly grains are derived from IT — sums of sums, never a second
    scan of the raw events — while the oracle computes every grain
    directly from raw. Equality is the continuous-aggregate invariant
    (count and DECIMAL sums are additive across grain boundaries), and
    it holds EXACTLY because the measure is cast to DECIMAL(18,6) at
    the leaf: a double sum would differ in the last ulp between the
    cascaded and direct groupings.

    Scale shape: raw events shuffle once (to hourly keys — the finest
    grain); each coarser grain aggregates the previous rollup, whose
    size is calendar x types, not data. This is the maintenance
    pattern for time-series stores (TimescaleDB continuous aggregates,
    Druid rollup segments): append-only ingest updates the finest
    grain; coarser grains fold already-aggregated rows, like
    ``term_stats_incremental_merge`` does for the flagship."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "ts",
        dec("value", 6).alias("v"),
    )
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    daily = hourly.groupBy(
        F.date_trunc("day", "h").alias("period_start"), "event_type"
    ).agg(F.sum("n").cast("long").alias("n"), F.sum("sv").alias("sv"))
    monthly = daily.groupBy(
        F.date_trunc("month", "period_start").alias("period_start"),
        "event_type",
    ).agg(F.sum("n").cast("long").alias("n"), F.sum("sv").alias("sv"))
    out_daily = daily.select(
        F.lit("daily").alias("grain"),
        "period_start",
        "event_type",
        "n",
        F.round(F.col("sv"), 6).cast("double").alias("sum_value"),
    )
    out_monthly = monthly.select(
        F.lit("monthly").alias("grain"),
        "period_start",
        "event_type",
        "n",
        F.round(F.col("sv"), 6).cast("double").alias("sum_value"),
    )
    return out_daily.unionByName(out_monthly)


@query(
    "event_transition_matrix",
    oracle="""
WITH e AS (SELECT user_id, event_id, event_type,
                  CAST(ts AS TIMESTAMP) AS ts FROM events),
p AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS from_type,
         event_type AS to_type
  FROM e
)
SELECT from_type, to_type, count(*)::BIGINT AS n_transitions,
       round(count(*) / sum(count(*)) OVER (PARTITION BY from_type),
             6)::DOUBLE AS p_transition
FROM p WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (from_type, to_type) pair, how many times a
    user's event of one type was immediately followed by the other,
    and the row-normalized transition probability.

    Scale shape: ONE shuffle on user_id for the lag window (high
    cardinality — no single-partition window), then a hash agg onto
    the |event_types|² key space, which is tiny; the row
    normalization is a window over that tiny aggregate, not over the
    event stream. Determinism: sequence order is (ts, event_id) —
    event_id breaks timestamp ties identically on both engines; the
    probability is one bigint/bigint division (IEEE correctly rounded,
    engine-independent), then round(6)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(norm),
            6,
        ).cast("double").alias("p_transition"),
    )


@query(
    "user_value_ewma",
    oracle="""
WITH d AS (
  SELECT user_id,
         date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM events GROUP BY 1, 2
),
s AS (SELECT user_id, list(rev ORDER BY day) AS arr FROM d GROUP BY 1)
SELECT user_id, len(arr)::BIGINT AS n_days,
       round(list_reduce(arr, (acc, x) -> acc * 0.5 + x * 0.5),
             6)::DOUBLE AS ewma_value
FROM s
""",
)
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's daily
    event value (alpha = 0.5): the classic time-decay smoothing
    operator, computed as an ORDERED per-user fold.

    Float discipline (why this is oracle-exact where a window-sum
    formulation would not be): daily sums are exact DECIMAL before the
    double conversion; the EWMA recurrence ewma_t = acc*0.5 + x*0.5 is
    then a fixed SEQUENCE of IEEE ops over identical doubles —
    multiplication by 0.5 is exact, each add is correctly rounded, and
    both engines fold in the same (day-sorted) order, so the result is
    bit-identical (NOTES.md float discipline: ordered folds are the
    deterministic alternative to unordered float sums).

    Scale shape: one shuffle for the (user, day) aggregation, one for
    the per-user collect_list; series length is bounded by the day
    range, not the event count, so the per-user array stays small at
    any corpus size. The fold is O(len) per user (the full running
    series would be O(len²) interpreted — deliberately not returned)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("rev")
    )
    series = daily.groupBy("user_id").agg(
        F.transform(
            # bounded-list: one entry per distinct day (calendar-bounded)
            F.sort_array(F.collect_list(F.struct("day", "rev"))),
            lambda p: p.rev,
        ).alias("arr")
    )
    arr = F.col("arr")
    ewma = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    return series.select(
        "user_id",
        F.size("arr").cast("long").alias("n_days"),
        F.round(ewma, 6).cast("double").alias("ewma_value"),
    )


def _pagerank_oracle(iterations: int = 5) -> str:
    """Unrolled-CTE DuckDB mirror of operators/graph.py:pagerank —
    one CTE per iteration, fixed-point contribution sums (each
    neighbor's pr/deg scaled by 2⁴⁰ and floored to a long; the longs
    SUM exactly and commutatively) matching Spark's hash aggregate
    bit-for-bit."""
    iters = []
    prev = "r0"
    for k in range(1, iterations + 1):
        iters.append(f"""
r{k} AS (
  SELECT e.u,
         CAST(0.125 AS DOUBLE) / nn.n
           + CAST(0.875 AS DOUBLE)
             * (CAST(sum(CAST(floor(r.pr / d.deg * 1099511627776.0)
                              AS BIGINT)) AS DOUBLE)
                / 1099511627776.0) AS pr
  FROM e
  JOIN {prev} r ON r.u = e.v
  JOIN deg d ON d.u = e.v
  CROSS JOIN nn
  GROUP BY e.u, nn.n
)""")
        prev = f"r{k}"
    return f"""
WITH e0 AS (
  SELECT DISTINCT 'c' || o_custkey::VARCHAR AS u,
                  's' || l_suppkey::VARCHAR AS v
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
e AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
deg AS (SELECT u, count(*)::BIGINT AS deg FROM e GROUP BY u),
nn AS (SELECT count(*)::BIGINT AS n FROM deg),
r0 AS (SELECT u, CAST(1 AS DOUBLE) / nn.n AS pr FROM deg CROSS JOIN nn),
{",".join(iters)}
SELECT u AS node, round(pr, 6)::DOUBLE AS pagerank FROM {prev}
"""


@query("pagerank_purchase_graph", oracle=_pagerank_oracle(5))
def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the customer–supplier transaction
    graph (an edge per distinct (customer, supplier) trading pair,
    symmetrized): which entities sit at the center of the purchase
    network. The iterative-algorithm counterpart to
    ``dedup_clusters``'s label propagation — weighted mass moves each
    round instead of min-labels (operators/graph.py:pagerank).

    Oracle-exact despite 5 rounds of float arithmetic: neighbor
    contributions are FIXED-POINT longs (pr/deg × 2⁴⁰, floored) whose
    SUM is exact and order-independent — partial-aggregable, so hub
    nodes skew-combine map-side instead of materializing neighbor
    arrays; damping 7/8 multiplies exactly, and the DuckDB oracle
    unrolls the same five iterations as chained CTEs with identical
    expression trees — ranks match bit-for-bit before the final
    round(6).

    Scale: the graph derives from one fact-table distinct (edge list
    ≪ lineitem); each iteration shuffles the edge list, not a base
    table. Node ids stay LONG through the whole iteration (customer k
    → 2k, supplier k → 2k+1) and become the 'c…'/'s…' labels only in
    the final projection — the rank arithmetic never touches the id,
    so results are unchanged, while every per-iteration hash/shuffle/
    aggregate keys on an 8-byte long instead of a variable-length
    string (measured 564 s → 284 s at the 100×-replica bench, and
    8.6 s → 6.5 s at sf0.1)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    from vspace_spark.operators.graph import pagerank

    pr = pagerank(edges, iterations=5, damping=0.875)
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        F.shiftright(F.col("node"), 1).cast("string"),
    )
    return pr.select(
        label.alias("node"),
        F.round("pr", 6).cast("double").alias("pagerank"),
    )


@query(
    "events_anomaly_zscore",
    oracle="""
WITH d AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, count(*)::BIGINT AS n_days,
         sum(n_events)::BIGINT AS s1,
         sum(n_events * n_events)::BIGINT AS s2
  FROM d GROUP BY 1
)
SELECT d.event_type, d.day, d.n_events,
       round((d.n_events - s.s1 / s.n_days)
             / sqrt(s.s2 / s.n_days
                    - (s.s1 / s.n_days) * (s.s1 / s.n_days)),
             6)::DOUBLE AS zscore
FROM d JOIN s USING (event_type)
WHERE abs((d.n_events - s.s1 / s.n_days)
          / sqrt(s.s2 / s.n_days
                 - (s.s1 / s.n_days) * (s.s1 / s.n_days))) >= 1.5
""",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: days whose per-type event count
    deviates ≥ 1.5 standard deviations from that type's daily mean —
    the classic monitoring query over an event stream's daily profile.

    Determinism: the population moments feeding the z-score are EXACT
    BIGINT sums (count and count² never round); mean and variance are
    then a fixed tree of correctly-rounded IEEE ops (s1/n, s2/n −
    mean², sqrt) written identically in both engines, so z-scores are
    bit-identical and the ≥ 1.5 cut cannot disagree.

    Scale shape: one shuffle to (type, day) — high-cardinality keys —
    then a #types-row moment table broadcast back onto the daily
    aggregate. Nothing event-sized shuffles twice."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n_events"))
    s = d.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n_days")
    z = (F.col("n_events") - mean) / F.sqrt(
        F.col("s2") / F.col("n_days") - mean * mean
    )
    return (
        d.join(F.broadcast(s), "event_type")
        .filter(F.abs(z) >= 1.5)
        .select(
            "event_type",
            "day",
            "n_events",
            F.round(z, 6).cast("double").alias("zscore"),
        )
    )


@query(
    "user_rfm_segments",
    oracle="""
WITH g AS (SELECT max(CAST(ts AS TIMESTAMP)) AS horizon FROM events),
u AS (
  SELECT user_id,
         date_diff('day', max(CAST(ts AS TIMESTAMP)),
                   any_value(horizon))::BIGINT AS recency_days,
         count(*)::BIGINT AS frequency,
         round(sum(CAST(value AS DECIMAL(18,6)))
               FILTER (event_type = 'purchase'), 2)::DOUBLE AS monetary
  FROM events CROSS JOIN g
  GROUP BY user_id
)
SELECT user_id, recency_days, frequency, monetary,
       ntile(4) OVER (ORDER BY recency_days, user_id)::INT AS r_quartile,
       ntile(4) OVER (ORDER BY frequency DESC, user_id)::INT AS f_quartile,
       ntile(4) OVER (
         ORDER BY monetary DESC NULLS LAST, user_id)::INT AS m_quartile
FROM u
""",
)
def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (days since last event,
    against the dataset horizon), frequency (event count), monetary
    (exact-decimal purchase value), each cut into quartiles — the
    standard customer-scoring pipeline.

    Determinism: every ntile ordering carries user_id as the final
    tie-break, so quartile boundaries are identical on both engines;
    monetary sums are DECIMAL before the display rounding; recency is
    integer day arithmetic.

    Scale shape: one per-user aggregation (exact, combinable) with the
    one-row horizon broadcast. The three quartile assignments use
    ``operators/ordering.py:ntile_scalable_multi`` — two-phase
    range-partitioned numbering plus the exact ntile bucket formula,
    fused across the three orderings (one shared persist + count,
    slim per-dimension numbering projections, quartiles joined back
    on user_id; VERDICT r11 #7) — NOT a global ntile window, so no
    single-partition WindowExec exists even though the ordering is
    corpus-global (descending orders become ascending negated keys;
    NULL monetary maps to +inf for NULLS LAST)."""
    e = load_table(spark, sf_dir, "events")
    g = e.agg(F.max("ts").alias("horizon"))
    u = (
        e.crossJoin(F.broadcast(g))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("horizon"), F.max("ts"))
            .cast("long")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(18,6)"),
                    )
                ),
                2,
            )
            .cast("double")
            .alias("monetary"),
        )
    )
    from vspace_spark.operators.ordering import ntile_scalable_multi
    from vspace_spark.operators.scale import est_relation_bytes

    keyed = u.withColumn("_negf", -F.col("frequency")).withColumn(
        "_negm",
        F.coalesce(-F.col("monetary"), F.lit(float("inf"))),
    )
    out = ntile_scalable_multi(
        keyed,
        4,
        [
            (["recency_days", "user_id"], "r_quartile"),
            (["_negf", "user_id"], "f_quartile"),
            (["_negm", "user_id"], "m_quartile"),
        ],
        "user_id",
        # upper bound: the per-user aggregate is never larger than
        # its events input's decoded bytes; slim rows (user_id + a
        # few numerics), so a disk decision above the floor is the
        # r12-measured-free shape, while an unknown (None) est would
        # heap-park a user-dimension-sized relation at 100 TB
        est_bytes=est_relation_bytes(e),
    )
    return out.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_quartile",
        "f_quartile",
        "m_quartile",
    )


@query(
    "funnel_conversion_window",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              ELSE 3 END AS tc
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
r AS (
  SELECT *, row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS rn
  FROM e
),
arr AS (
  SELECT user_id,
         list(tc::BIGINT * 17592186044416 + epoch_ms(ts)
              ORDER BY ts, event_id) AS a
  FROM r WHERE rn <= 65536 GROUP BY user_id
),
fin AS (
  SELECT user_id,
         (list_reduce([0::BIGINT] || a, (acc, x) ->
            CASE WHEN (x >> 44) = (acc >> 44) + 1
                  AND ((acc >> 44) = 0
                       OR (x & 17592186044415)
                          - (acc & 17592186044415) <= 3600000)
                 THEN x ELSE acc END) >> 44) AS stage
  FROM arr
)
SELECT stage::INT AS funnel_stage, count(*)::BIGINT AS n_users
FROM fin GROUP BY 1
""",
)
def funnel_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed conversion funnel (ClickHouse ``windowFunnel``-style):
    how far each user progresses through view → click → purchase when
    every step must land within 1 hour of the previous one, anchored
    greedily at the user's FIRST view. Complements
    ``funnel_view_click_purchase``, which orders first-occurrences
    without a time budget.

    The per-user pass is an ordered fold over an INTEGER-ENCODED event
    list — code = type·2⁴⁴ + epoch_ms — so the whole state machine
    (stage + last-step timestamp) lives in one BIGINT and every fold
    step is exact integer arithmetic: bit-identical across engines, no
    float anywhere. The DuckDB oracle folds the same encoding with a
    prepended zero accumulator.

    Scale shape: one shuffle to collect each user's event list, with a
    HARD per-user cap of 65,536 events (earliest by (ts, event_id) —
    a row_number filter on the same user partitioning, so the cap adds
    no shuffle): funnel progression is defined over a user's first 64k
    funnel events, which bounds the collected array against
    bot/crawler users whose event streams would otherwise materialize
    unboundedly in one task (VERDICT r3 #5); the oracle applies the
    identical cap. The fold is O(events-per-user); the final stage
    histogram aggregates onto 4 keys. No window over the full stream,
    no self-join per step (the join-chain funnel formulation doubles
    the shuffles per added stage; the fold is one pass regardless of
    funnel depth)."""
    from pyspark.sql import Window

    T = 1 << 44
    MASK = T - 1
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    tc = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .otherwise(3)
        .cast("long")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    coded = e.select(
        "user_id",
        "ts",
        "event_id",
        (tc * F.lit(T) + F.unix_millis("ts")).alias("code"),
    ).withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 65536
    )
    arr = coded.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                # bounded-list: hard-capped at 65536 by the rn filter
                F.collect_list(F.struct("ts", "event_id", "code"))
            ),
            lambda p: p.code,
        ).alias("a")
    )

    def step(acc, x):
        stage_up = F.shiftright(x, 44) == F.shiftright(acc, 44) + 1
        in_window = (F.shiftright(acc, 44) == 0) | (
            x.bitwiseAND(F.lit(MASK)) - acc.bitwiseAND(F.lit(MASK))
            <= 3600000
        )
        return F.when(stage_up & in_window, x).otherwise(acc)

    stage = F.shiftright(
        F.aggregate(F.col("a"), F.lit(0).cast("long"), step), 44
    )
    return (
        arr.select(stage.cast("int").alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count("*").alias("n_users"))
    )


def _spread_sql(base: str) -> str:
    """DuckDB mirror of morton_key's 5-step bit spread (textual
    expansion — the expression tree is identical to the Spark side's,
    so the interleave is exact integer arithmetic on both engines).
    The leading pmod mirrors morton_key's own [0, 2³²) reduction."""
    e = f"((({base}) % 4294967296 + 4294967296) % 4294967296)"
    for shift, mask in (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ):
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


@query(
    "events_zorder_keys",
    oracle=f"""
WITH b AS (
  SELECT event_id, user_id::BIGINT AS x,
         epoch_ms(CAST(ts AS TIMESTAMP)) // 60000 AS y
  FROM events
)
SELECT event_id,
       ({_spread_sql("x")} | ({_spread_sql("y")} << 1)) AS zkey
FROM b
""",
)
def events_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering keys for the events table: Morton-interleave
    of (user_id, event minute) — the data-layout operator behind
    ``operators/scale.py:write_zordered``. Sorting/range-partitioning
    by this key clusters rows that are close in BOTH dimensions, so
    parquet min/max statistics prune selective predicates on EITHER
    column (a single-column sort prunes only its leading column);
    measured in scripts/zorder_bench.py. The key itself is exact
    integer shift/mask arithmetic, identical on both engines."""
    from vspace_spark.operators.scale import morton_key

    e = load_table(spark, sf_dir, "events")
    b = e.select(
        "event_id",
        F.col("user_id").cast("long").alias("x"),
        F.expr("unix_millis(ts) div 60000").alias("y"),
    )
    return b.select("event_id", morton_key("x", "y").alias("zkey"))


@query(
    "corpus_pmi_bigrams",
    oracle="""
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
uni AS (SELECT unnest(t) AS tok FROM toks),
uc AS (SELECT tok, count(*)::BIGINT AS c FROM uni GROUP BY tok),
n AS (SELECT sum(c)::BIGINT AS n FROM uc),
bi AS (
  SELECT unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM toks WHERE len(t) >= 2
),
bc AS (SELECT bigram, count(*)::BIGINT AS c_ab FROM bi GROUP BY bigram
       HAVING count(*) >= 5),
scored AS (
  SELECT bc.bigram, bc.c_ab, a.c AS c_a, b.c AS c_b,
         CAST(bc.c_ab AS DOUBLE) * n.n
           / (CAST(a.c AS DOUBLE) * b.c) AS r
  FROM bc
  JOIN uc a ON a.tok = string_split(bc.bigram, ' ')[1]
  JOIN uc b ON b.tok = string_split(bc.bigram, ' ')[2]
  CROSS JOIN n
)
SELECT bigram, c_ab, c_a, c_b, round(r, 6) AS pmi_ratio
FROM scored ORDER BY r DESC, bigram LIMIT 20
""",
)
def corpus_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction — top-20 bigrams by the PMI ratio
    ``c_ab·N / (c_a·c_b)`` (∝ pointwise mutual information with the
    constant B/N factor dropped; vocabulary/tokenizer-merge signal).
    Exact integer counts feed ONE correctly-rounded IEEE division, so
    the score — and therefore the top-20 cut with its (ratio, bigram)
    tie-break — is bit-identical across engines with no log() (libm
    results are not portable; the ratio orders identically to the
    log). Plan shape: two hash aggs (unigrams, bigrams), two
    broadcast-able joins back on the gram's words, a broadcast
    single-row N, and TakeOrderedAndProject for the top-k — no global
    window, no single-partition stage."""
    from vspace_spark.functions.text import ngrams_col, tokenize_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokenize_col("text").alias("t"))
    uc = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    n = uc.agg(F.sum("c").alias("n"))
    bc = (
        toks.filter(F.size("t") >= 2)
        .select(F.explode(ngrams_col(F.col("t"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    first = F.split("bigram", " ")[0]
    second = F.split("bigram", " ")[1]
    scored = (
        bc.join(uc.select(F.col("tok").alias("_ta"), F.col("c").alias("c_a")),
                first == F.col("_ta"))
        .join(uc.select(F.col("tok").alias("_tb"), F.col("c").alias("c_b")),
              second == F.col("_tb"))
        # scalar-subquery pattern: broadcast single-row aggregate
        .crossJoin(F.broadcast(n))
        .select(
            "bigram",
            "c_ab",
            "c_a",
            "c_b",
            (
                F.col("c_ab").cast("double") * F.col("n")
                / (F.col("c_a").cast("double") * F.col("c_b"))
            ).alias("_r"),
        )
    )
    return (
        scored.orderBy(F.desc("_r"), "bigram")
        .limit(20)
        .select(
            "bigram", "c_ab", "c_a", "c_b",
            F.round("_r", 6).alias("pmi_ratio"),
        )
    )
