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


class TestStatefulSessionize:
    def test_stream_equals_batch_across_microbatches(self, spark, tmp_path):
        """Sessions spanning micro-batches must merge through GroupState:
        drain batch A (first half by time), then batch B, same checkpoint;
        the last emission per (user, session_idx) equals the batch
        sessionization of A ∪ B."""
        import pandas as pd

        from visigoth_spark.streaming import sessionize_stream

        src = "/root/testdata/sf0.001/events.parquet"
        full = spark.read.parquet(src)
        cut = full.approxQuantile("event_id", [0.5], 0.0)[0]
        a = full.filter(F.col("event_id") <= cut)
        b = full.filter(F.col("event_id") > cut)
        # event_id order == ts order in the fixture; verify the premise
        assert full.orderBy("event_id").select("ts").collect() == \
            full.orderBy("ts").select("ts").collect()

        stream_dir = str(tmp_path / "events")
        ckpt = str(tmp_path / "ckpt")
        emitted: list = []

        def drain(name):
            stream = (
                spark.readStream
                .schema("event_id long, ts timestamp, user_id long, "
                        "event_type string, value double, props string")
                .parquet(stream_dir)
            )
            q = (
                sessionize_stream(stream, gap_minutes=240)
                .writeStream
                .foreachBatch(lambda df, eid: emitted.extend(df.collect()))
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        a.write.mode("overwrite").parquet(stream_dir)
        drain("sess_a")
        b.write.mode("append").parquet(stream_dir)
        drain("sess_b")

        # last emission wins per (user, session_idx)
        final = {}
        for r in emitted:
            final[(r["user_id"], r["session_idx"])] = (
                r["n_events"], r["session_start"], r["session_end"]
            )
        from visigoth_spark import pipeline as P

        batch = {
            (r["user_id"], r["session_idx"]): (
                r["n_events"], r["session_start"], r["session_end"]
            )
            for r in P.sessionize(full, gap_minutes=240).collect()
        }
        assert final == batch and len(batch) > 0
        # the state-merge path must actually have been exercised: some
        # session emitted in drain A was re-emitted (extended) in drain B
        seen_twice = len(emitted) > len(final)
        assert seen_twice, "no session spanned the A/B micro-batch boundary"
