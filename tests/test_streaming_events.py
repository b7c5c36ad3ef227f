"""Structured Streaming windowed aggregation over the events shape:
readStream + withWatermark + tumbling window must produce exactly the batch
form (pipeline.windowed_event_counts), which in turn is DuckDB-oracled via
the events_windowed harness entry."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from visigoth_spark import pipeline as P

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path_factory.mktemp("events_stream")
    if os.path.exists(src):
        df = spark.read.parquet(src)
    else:  # synthetic fallback, deterministic
        df = spark.range(0, 500).select(
            F.col("id").alias("event_id"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=F.col("id") * 37)).alias("ts"),
            (F.col("id") % 20).alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("error")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            F.round(F.col("id") * 0.13, 2).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        )
    out = str(d / "events")
    df.write.mode("overwrite").parquet(out)
    return out


def test_stream_equals_batch_windowed_counts(spark, events_dir):
    batch = P.windowed_event_counts(
        spark.read.parquet(events_dir), "1 hour"
    ).collect()
    stream_src = (
        spark.readStream.schema(SCHEMA).parquet(events_dir)
        .withWatermark("ts", "10 minutes")
    )
    agg = P.windowed_event_counts(stream_src, "1 hour")
    q = (
        agg.writeStream.format("memory").queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from win_counts").collect()
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    assert sorted(
        [(key(r), r["n_events"], r["sum_value"]) for r in got]
    ) == sorted(
        [(key(r), r["n_events"], r["sum_value"]) for r in batch]
    )
    assert len(got) > 0


def test_watermark_present_in_stream_plan(spark, events_dir):
    stream_src = (
        spark.readStream.schema(SCHEMA).parquet(events_dir)
        .withWatermark("ts", "10 minutes")
    )
    agg = P.windowed_event_counts(stream_src, "1 hour")
    assert agg.isStreaming
    plan = agg._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
