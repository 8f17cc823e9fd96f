"""Structured Streaming operators over the events table.

The reference has no streaming at all (SURVEY.md §2.12); this module
provides the standard set — tumbling/sliding windows with watermarks,
session windows, streaming dedup — with BATCH-EQUIVALENT semantics so
every streaming query keeps a DuckDB oracle (the driver replays the
parquet file as a one-batch stream; the oracle computes the same
aggregation relationally).

Scale notes: in production these read Kafka/file streams; state stores
(window aggs, dedup sets) are partitioned by grouping key across
executors, and watermarks bound state size — the same code runs there,
only ``readStream`` options change.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def events_schema(spark: SparkSession, parquet_path: str) -> T.StructType:
    """Stream-source schema for the events table, probed from the
    parquet footer of a batch read so it tracks how THIS Spark version
    surfaces the NANOS timestamp column (TIMESTAMP_NTZ on ≥4.1, raw
    int64 nanos under ``nanosAsLong`` on older versions)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(parquet_path).schema


def read_table_stream(
    spark: SparkSession, sf_dir: str, name: str, schema: T.StructType
) -> DataFrame:
    """One table of ``sf_dir`` as a parquet file-source stream,
    handling BOTH table shapes: a single ``{name}.parquet`` FILE
    (driver-generated fixtures) via parent-dir load + pathGlobFilter,
    and a Spark-written ``{name}.parquet/`` DIRECTORY loaded directly —
    pathGlobFilter matches FILE names, so pointing it at a directory
    table silently filters out every part-* file and the stream reads
    0 rows (a non-error in Spark; caught by the 10× bench pass)."""
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    reader = spark.readStream.schema(schema).format("parquet")
    if os.path.isdir(path):
        return reader.load(path)
    return reader.option("pathGlobFilter", f"{name}.parquet").load(sf_dir)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream (the local stand-in for a
    Kafka topic). Timestamps normalize ns → µs exactly like the batch
    loader so streaming and batch results are comparable."""
    import os

    from vspace_spark.io.tables import normalize_event_ts

    schema = events_schema(spark, os.path.join(sf_dir, "events.parquet"))
    return normalize_event_ts(
        read_table_stream(spark, sf_dir, "events", schema)
    )


def run_stream_to_memory(
    streaming_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame to completion against the finite
    file source via a memory sink; returns the materialized result.

    ``processAllAvailable`` drains every batch (plus the no-data batch
    that advances the watermark), so append-mode queries emit all
    closed windows deterministically.
    """
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        streaming_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return streaming_df.sparkSession.table(name)


def hourly_type_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window × event_type counts + value sum, with a
    10-minute watermark bounding state."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# Static dimension for the stream-static join demo: event_type →
# category. In production this is a dimension table on storage,
# re-read (and re-broadcast) each micro-batch so slowly-changing dims
# stay fresh without restarting the query.
EVENT_CATEGORY_DIM = [
    ("view", "engagement"),
    ("click", "engagement"),
    ("purchase", "conversion"),
    ("signup", "conversion"),
    ("error", "ops"),
]


def hourly_category_counts(events: DataFrame) -> DataFrame:
    """Stream-STATIC join + windowed aggregation: the event stream is
    enriched against a static dimension (broadcast per micro-batch —
    no stream-side state, no watermark needed for the join itself),
    then rolled up per tumbling hour × category. The remaining shape
    in the streaming join matrix next to stream-stream inner/left
    (``purchases_with_recent_views`` / ``purchases_with_optional_views``).
    """
    spark = events.sparkSession
    dim = spark.createDataFrame(
        EVENT_CATEGORY_DIM, "event_type string, category string"
    )
    return (
        events.join(F.broadcast(dim), "event_type")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "category")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "category",
            "n",
            "sum_value",
        )
    )


def sliding_type_counts(events: DataFrame) -> DataFrame:
    """Sliding window (1 hour, 30-minute slide): each event lands in 2
    windows."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def user_session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native streaming sessionization: ``session_window`` merges events
    whose windows [ts, ts+gap) overlap — i.e. a new session starts when
    the gap is ≥ the threshold (note: the batch twin in
    operators/relational.py:sessionize uses strictly-greater; they agree
    everywhere except a gap of exactly the threshold)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def purchases_with_recent_views(events: DataFrame) -> DataFrame:
    """Stream-stream INTERVAL JOIN: each purchase joined to the same
    user's views from the preceding hour. Both sides carry watermarks
    and the join condition bounds event-time distance — the two
    ingredients Spark needs to age join state out of the store (without
    them a stream-stream join buffers forever)."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "10 minutes")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") < F.col("p_ts")),
        "inner",
    )
    return joined.select("purchase_id", "view_id", F.col("p_user").alias("user_id"))


def purchases_with_optional_views(events: DataFrame) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase, padded
    with null view_ids when no same-user view precedes it within an
    hour. Outer semantics on streams are watermark-driven: a purchase
    row sits in the join state until the VIEW-side watermark passes its
    timestamp (no future view can match), and only then emits its
    null-padded row. Consequence: purchases newer than
    ``max(event time) - watermark delay`` never emit if unmatched —
    callers comparing against a batch oracle must trim both sides to
    that horizon (queries/streaming.py does). Completes the streaming
    join matrix next to the inner variant above."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "10 minutes")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") < F.col("p_ts")),
        "left_outer",
    )
    return joined.select(
        "purchase_id", "view_id", F.col("p_user").alias("user_id"), "p_ts"
    )


def purchases_views_full_outer(events: DataFrame) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the join
    matrix (inner / left outer above): matched (purchase, view) pairs
    emit at match time; an unmatched purchase null-pads once the
    VIEW-side state can no longer match it, and an unmatched view
    null-pads once the PURCHASE side passes it. Both evictions are
    driven by the GLOBAL watermark (min across both sides), so rows
    newer than ``max(event time) - delay`` on EITHER side may never
    emit — callers comparing against a batch oracle must trim both
    sides' timestamps to that horizon (queries/streaming.py does).
    The time-range condition bounds join state on both sides; without
    it Spark rejects outer stream-stream joins outright."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "10 minutes")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") < F.col("p_ts")),
        "full_outer",
    )
    return joined.select(
        "purchase_id",
        "view_id",
        F.coalesce(F.col("p_user"), F.col("v_user")).alias("user_id"),
        "p_ts",
        "v_ts",
    )


def run_stream_foreach_batch_parquet(
    streaming_df: DataFrame, out_dir: str
) -> list[int]:
    """``foreachBatch`` sink: per-micro-batch exactly-once parquet
    writes (batch id in the path → idempotent replay, the standard
    recipe for sinks without native streaming support). Returns the
    processed batch ids."""
    seen: list[int] = []

    def write_batch(df: DataFrame, batch_id: int) -> None:
        seen.append(batch_id)
        df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    q = streaming_df.writeStream.foreachBatch(write_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return seen


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals held in explicit state (the escape hatch for logic
    windowed aggregations can't express — e.g. conditional counters,
    decaying scores, per-key ML state).

    State is one (n, total) pair per user, partitioned across executors
    by the grouping key; each micro-batch updates state and emits the
    new totals. On the finite replay (one batch) every user emits
    exactly once → deterministic, batch-oracle-checkable output.
    """
    from pyspark.sql.streaming.state import GroupState

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state
    (``dropDuplicatesWithinWatermark`` — late duplicates beyond the
    watermark age out of the state store, the only way dedup state
    stays bounded on an unbounded stream)."""
    return events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    ).select("event_id", "user_id", "event_type")


def stateful_transition_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    first-order transition counts (which event type follows which),
    with the user's LAST event held in state so sequences bridge
    micro-batch boundaries — the streaming twin of the batch
    ``event_transition_matrix`` lag-window.

    Each micro-batch CONCATENATES the group's Arrow chunks and sorts
    them ONCE by (ts, event_id) before pairing — applyInPandasWithState
    hands a group's rows as arbitrarily split, unordered chunks
    (default ~10k-row Arrow batches), so the earlier per-chunk
    sort-and-bridge was wrong whenever one user's micro-batch rows
    spanned chunks (ADVICE r3). The stored last event is prepended,
    adjacent (from, to) pairs count vectorized (shift + groupby size —
    no per-row Python), and the globally-last row becomes the new
    state. State is one (ts_ns, event_id, type) triple per user — O(1)
    per key, never the event history; the concat holds one user's ONE
    micro-batch in memory (bounded by trigger size per key, not by the
    stream). Counts are integers end-to-end, so the finite replay is
    exactly batch-oracle-checkable after a downstream sum (ordering
    across micro-batches follows file order; exact parity assumes the
    replay respects event-time order, as the single-batch fixture
    replay does)."""
    from pyspark.sql.streaming.state import GroupState

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("from_type", T.StringType()),
            T.StructField("to_type", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_ts", T.LongType()),
            T.StructField("last_eid", T.LongType()),
            T.StructField("last_type", T.StringType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values(["ts", "event_id"])
            last = state.get if state.exists else None
            seq = pdf["event_type"].tolist()
            prev = ([last[2]] if last is not None else []) + seq[:-1]
            cur = seq if last is not None else seq[1:]
            ts_ns = int(pdf["ts"].iloc[-1].value)
            state.update((ts_ns, int(pdf["event_id"].iloc[-1]), seq[-1]))
            if cur:
                pairs = pd.DataFrame({"f": prev, "t": cur})
                counts = (
                    pairs.groupby(["f", "t"]).size().reset_index(name="n")
                )
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(counts),
                        "from_type": counts["f"],
                        "to_type": counts["t"],
                        "n": counts["n"].astype("int64"),
                    }
                )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )
