"""foreachBatch sink + connector gating tests."""

from __future__ import annotations

import pytest

from vspace_spark.io.connectors import (
    ConnectorUnavailable,
    read_delta,
    read_iceberg,
)
from vspace_spark.streaming.events import (
    read_events_stream,
    run_stream_foreach_batch_parquet,
)


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, sf_dir).select(
        "event_id", "event_type"
    )
    out = str(tmp_path / "sink")
    batches = run_stream_foreach_batch_parquet(stream, out)
    assert batches, "at least one micro-batch"
    written = spark.read.parquet(out)
    assert written.count() == 1000  # all sf0.001 events, exactly once
    assert written.select("event_id").distinct().count() == 1000


def test_delta_connector_gated(spark):
    with pytest.raises(ConnectorUnavailable, match="delta-spark"):
        read_delta(spark, "/tmp/nope")


def test_iceberg_connector_gated(spark):
    with pytest.raises(ConnectorUnavailable, match="iceberg-spark-runtime"):
        read_iceberg(spark, "db.tbl")
