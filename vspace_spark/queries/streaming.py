"""Streaming queries (events as a replayed file stream) with batch-
equivalent DuckDB oracles — the driver sees a normal DataFrame; under
the hood each query runs a Structured Streaming job to completion
against a memory sink (streaming/events.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vspace_spark.queries import query
from vspace_spark.streaming.events import (
    dedup_stream,
    hourly_type_counts,
    read_events_stream,
    run_stream_to_memory,
    sliding_type_counts,
    user_session_windows,
)


@query(
    "stream_hourly_counts",
    oracle="""
WITH e AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*)::BIGINT AS n,
       round(sum(value), 6) AS sum_value
FROM e GROUP BY 1, 2, 3
""",
)
def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window streaming aggregation (1 h × event_type) with a
    10-min watermark, run to completion on the replayed file stream.
    Complete output mode → every window emitted, matching the batch
    GROUP BY exactly."""
    events = read_events_stream(spark, sf_dir)
    return run_stream_to_memory(hourly_type_counts(events), "complete")


@query(
    "stream_sliding_counts",
    oracle="""
WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
w AS (
  SELECT event_type, ts,
         date_trunc('hour', ts - to_microseconds(offs * 1800000000))
           + to_microseconds(offs * 1800000000) AS window_start
  FROM e, (SELECT unnest([0, 1]) AS offs)
)
SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
       event_type, count(*)::BIGINT AS n
FROM w
WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
GROUP BY 1, 2, 3
""",
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregation (1 h window, 30 min slide —
    each event in 2 windows). The oracle enumerates both candidate
    window starts per event and filters to containment."""
    events = read_events_stream(spark, sf_dir)
    return run_stream_to_memory(sliding_type_counts(events), "complete")


@query(
    "stream_user_sessions",
    oracle="""
WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
ordered AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) >= 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM e
),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT user_id, min(ts) AS session_start, count(*)::BIGINT AS n_events
FROM sess GROUP BY user_id, sid
""",
)
def stream_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` streaming sessionization (30-min gap).
    The oracle is the relational lag/cumsum formulation with the
    session_window gap convention (new session at gap ≥ threshold)."""
    events = read_events_stream(spark, sf_dir)
    return run_stream_to_memory(user_session_windows(events), "complete")


@query(
    "stream_dedup_events",
    oracle="SELECT event_id, user_id, event_type FROM events",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark on
    event_id). event_ids are unique in the fixture, so the oracle is
    the identity projection — the operator's value is the bounded state
    semantics, exercised here end-to-end."""
    events = read_events_stream(spark, sf_dir)
    return run_stream_to_memory(dedup_stream(events), "append")


@query(
    "stream_stateful_user_totals",
    oracle="""
SELECT user_id, count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS total_value
FROM events GROUP BY user_id
""",
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running totals in explicit per-key state. One replayed
    batch → one emission per user → the batch GROUP BY is an exact
    oracle (streaming/events.py:stateful_user_totals)."""
    from vspace_spark.streaming.events import stateful_user_totals

    events = read_events_stream(spark, sf_dir)
    return run_stream_to_memory(stateful_user_totals(events), "update")


@query(
    "stream_purchase_view_join",
    oracle="""
WITH e AS (SELECT event_id, user_id, event_type,
                  CAST(ts AS TIMESTAMP) AS ts FROM events)
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
FROM e p JOIN e v
  ON p.event_type = 'purchase' AND v.event_type = 'view'
 AND p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
""",
)
def stream_purchase_view_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchases × same-user views in the
    trailing hour) with watermark-bounded state; the batch interval
    join is the exact oracle (streaming/events.py)."""
    from vspace_spark.streaming.events import purchases_with_recent_views

    events = read_events_stream(spark, sf_dir)
    return run_stream_to_memory(purchases_with_recent_views(events), "append")


@query(
    "stream_term_stats",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
flat AS (SELECT doc_id, len(t) AS wc, unnest(t) AS token FROM toks),
perdoc AS (
  SELECT doc_id, wc, token, count(*) AS tf FROM flat GROUP BY ALL
)
SELECT token,
       count(*)::BIGINT AS document_frequency,
       sum(tf)::BIGINT  AS term_frequency,
       sum(wc)::BIGINT  AS tdsum
FROM perdoc GROUP BY token
""",
)
def stream_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP aggregate (A1 unigram term stats) maintained
    incrementally over a document stream — the capability the batch
    reference recomputes per run (streaming/corpus.py). Run to
    completion on the finite fixture, the result is batch-identical,
    so it shares the term_stats_unigram oracle semantics."""
    from vspace_spark.streaming.corpus import (
        read_documents_stream,
        streaming_term_stats,
    )

    docs = read_documents_stream(spark, sf_dir)
    return run_stream_to_memory(streaming_term_stats(docs), "complete")


@query(
    "stream_dedup_docs",
    oracle="""
SELECT md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9_]+'),
           ' ')) AS fingerprint,
       min(doc_id) AS keep_doc_id,
       count(*)::BIGINT AS n_dups
FROM documents GROUP BY 1
""",
)
def stream_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup over the DOCUMENT stream: content
    fingerprint (md5 of normalized text) → keep the min doc_id per
    fingerprint with a duplicate count. Aggregation form rather than
    dropDuplicates so the kept row is DETERMINISTIC under any arrival
    order — the batch dedup_exact semantics, maintained continuously
    (state = one row per distinct document)."""
    from vspace_spark.functions.text import normalize_col
    from vspace_spark.streaming.corpus import read_documents_stream

    docs = read_documents_stream(spark, sf_dir)
    # Streaming rebalance_for_compute (guide §2 — r13, the
    # streaming_term_stats shape): the single-file micro-batch arrives
    # in ONE IO-sized partition, so the per-row regex normalize + md5
    # ran nearly single-task (measured 12.5 s at sf0.1). The stateful
    # fingerprint aggregation is partitioning-invariant.
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    dedup = (
        docs.select(
            F.md5(normalize_col("text")).alias("fingerprint"), "doc_id"
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_dups"),
        )
    )
    return run_stream_to_memory(dedup, "complete")


@query(
    "stream_term_stats_ngram",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (SELECT doc_id, t, len(t) AS wc, unnest(range(1, len(t) + 1)) AS i
        FROM toks),
ng AS (SELECT doc_id, wc, array_to_string(t[i:i + n - 1], ' ') AS token
       FROM pos, (SELECT unnest(range(1, 3)) AS n) AS gn
       WHERE i + n - 1 <= wc),
perdoc AS (SELECT doc_id, wc, token, count(*) AS tf FROM ng GROUP BY ALL)
SELECT token,
       count(*)::BIGINT AS document_frequency,
       sum(tf)::BIGINT  AS term_frequency,
       sum(wc)::BIGINT  AS tdsum
FROM perdoc GROUP BY token
""",
)
def stream_term_stats_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental 1..2-gram term stats — the flagship's parametric
    gram range maintained over the document stream, same row-local
    histogram shape as stream_term_stats."""
    from vspace_spark.streaming.corpus import (
        read_documents_stream,
        streaming_term_stats,
    )

    docs = read_documents_stream(spark, sf_dir)
    return run_stream_to_memory(
        streaming_term_stats(docs, min_n=1, max_n=2), "complete"
    )


@query(
    "stream_category_counts",
    oracle="""
WITH e AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
d AS (SELECT * FROM (VALUES ('view','engagement'), ('click','engagement'),
                            ('purchase','conversion'), ('signup','conversion'),
                            ('error','ops')) AS t(event_type, category))
SELECT date_trunc('hour', e.ts) AS window_start,
       date_trunc('hour', e.ts) + INTERVAL 1 HOUR AS window_end,
       d.category,
       count(*)::BIGINT AS n,
       round(sum(e.value), 6) AS sum_value
FROM e JOIN d USING (event_type)
GROUP BY 1, 2, 3
""",
)
def stream_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (events stream ⋈ broadcast category dim) +
    tumbling hourly rollup (streaming/events.py:hourly_category_counts).
    Complete mode → every window emitted; the oracle is the batch join
    + GROUP BY with the dim inlined as VALUES."""
    from vspace_spark.streaming.events import hourly_category_counts

    events = read_events_stream(spark, sf_dir)
    return run_stream_to_memory(hourly_category_counts(events), "complete")


@query(
    "stream_purchase_view_left_join",
    oracle="""
WITH e AS (SELECT event_id, user_id, event_type,
                  CAST(ts AS TIMESTAMP) AS ts FROM events),
horizon AS (
  SELECT least(
           (SELECT max(ts) FROM e WHERE event_type = 'purchase'),
           (SELECT max(ts) FROM e WHERE event_type = 'view')
         ) - INTERVAL 10 MINUTE AS h
)
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
FROM e p LEFT JOIN e v
  ON v.event_type = 'view'
 AND p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
WHERE p.event_type = 'purchase' AND p.ts < (SELECT h FROM horizon)
""",
)
def stream_purchase_view_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join with watermark-driven
    null padding (streaming/events.py:purchases_with_optional_views).

    A purchase's null row emits only once the GLOBAL watermark passes
    its timestamp, and the global watermark is the MIN across both
    watermark operators of (that side's max observed event time −
    delay) — with sparse purchases the purchase side is the binding
    one (verified empirically at sf0.01: an unmatched purchase 22 min
    before stream end emitted nothing because the purchase-side
    watermark lagged). So BOTH the streaming result and the batch
    oracle trim to ``least(max purchase ts, max view ts) − 10 min``
    for an exact comparison."""
    import datetime

    from vspace_spark.io.tables import load_table
    from vspace_spark.streaming.events import purchases_with_optional_views

    events = read_events_stream(spark, sf_dir)
    res = run_stream_to_memory(purchases_with_optional_views(events), "append")
    ev = load_table(spark, sf_dir, "events")
    side_max = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .collect()  # bounded-collect: 2 rows (one max per side)
    )
    horizon = min(r["m"] for r in side_max) - datetime.timedelta(minutes=10)
    return res.filter(F.col("p_ts") < F.lit(horizon)).select(
        "purchase_id", "view_id", "user_id"
    )


@query(
    "stream_purchase_view_full_join",
    oracle="""
WITH e AS (SELECT event_id, user_id, event_type,
                  CAST(ts AS TIMESTAMP) AS ts FROM events),
p AS (SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
      FROM e WHERE event_type = 'purchase'),
v AS (SELECT event_id AS view_id, user_id AS v_user, ts AS v_ts
      FROM e WHERE event_type = 'view'),
horizon AS (
  SELECT least((SELECT max(p_ts) FROM p), (SELECT max(v_ts) FROM v))
         - INTERVAL 10 MINUTE AS h
)
SELECT purchase_id, view_id, coalesce(p_user, v_user) AS user_id
FROM p FULL JOIN v
  ON p_user = v_user
 AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts < p_ts
WHERE (p_ts IS NOT NULL AND v_ts IS NOT NULL)
   OR (v_ts IS NULL AND p_ts < (SELECT h FROM horizon))
   OR (p_ts IS NULL
       AND v_ts < (SELECT h FROM horizon) - INTERVAL 1 HOUR)
""",
)
def stream_purchase_view_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — the last cell of the
    streaming join matrix (streaming/events.py:
    purchases_views_full_outer). Null padding on BOTH sides is
    watermark-driven, and the two sides evict at DIFFERENT horizons
    because the interval condition is asymmetric: a purchase can only
    be matched by PAST views, so its state evicts (and null-pads) as
    soon as the global watermark h =
    ``least(max purchase ts, max view ts) − 10 min`` passes
    ``p_ts``; a view can still be matched by purchases up to an HOUR
    in its future, so its state survives until the watermark passes
    ``v_ts + 1 h``. Matched pairs emit at match time regardless. The
    exact comparison therefore keeps every matched row, unmatched
    purchases with ``p_ts < h``, and unmatched views with
    ``v_ts < h − 1 h`` — mirrored verbatim in the batch oracle
    (verified at sf0.001 AND sf0.01; the naive symmetric trim is 3
    rows short at sf0.01, exactly the unmatched views inside the
    final hour-wide eviction lag)."""
    import datetime

    from vspace_spark.io.tables import load_table
    from vspace_spark.streaming.events import purchases_views_full_outer

    events = read_events_stream(spark, sf_dir)
    res = run_stream_to_memory(purchases_views_full_outer(events), "append")
    ev = load_table(spark, sf_dir, "events")
    side_max = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .collect()  # bounded-collect: 2 rows (one max per side)
    )
    horizon = min(r["m"] for r in side_max) - datetime.timedelta(minutes=10)
    view_horizon = horizon - datetime.timedelta(hours=1)
    return res.filter(
        (F.col("p_ts").isNotNull() & F.col("v_ts").isNotNull())
        | (F.col("v_ts").isNull() & (F.col("p_ts") < F.lit(horizon)))
        | (
            F.col("p_ts").isNull()
            & (F.col("v_ts") < F.lit(view_horizon))
        )
    ).select("purchase_id", "view_id", "user_id")


@query(
    "stream_transition_matrix",
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
SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
FROM p WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
""",
)
def stream_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The event-type transition matrix maintained INCREMENTALLY:
    per-user last-event state bridges micro-batches
    (streaming/events.py:stateful_transition_counts), per-user pair
    counts stream out, and a batch sum over the finite replay yields
    the same integer counts as the batch lag-window query
    (``event_transition_matrix``) — its oracle, minus the probability
    column (a ratio over a still-growing stream is not incremental
    state; downstream normalization is one tiny batch window away)."""
    from vspace_spark.streaming.events import stateful_transition_counts

    events = read_events_stream(spark, sf_dir)
    per_user = run_stream_to_memory(
        stateful_transition_counts(events), "update"
    )
    return per_user.groupBy("from_type", "to_type").agg(
        F.sum("n").cast("long").alias("n_transitions")
    )
