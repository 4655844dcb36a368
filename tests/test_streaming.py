"""Structured Streaming: the windowed-aggregation plan runs identically in
batch and under a real micro-batch readStream (file source → memory sink)."""

import pytest
from pyspark.sql import functions as F

from feldman_spark.streaming.events import (
    run_stream_to_memory,
    sessionize,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    if dict(e.dtypes)["ts"] == "bigint":
        e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return e.cache()


def test_tumbling_batch(spark, events):
    out = tumbling_agg(events).collect()
    assert len(out) > 0
    assert sum(r["n"] for r in out) == events.count()


def test_sliding_counts_double(spark, events):
    # each event lands in exactly len/slide = 2 windows
    out = sliding_agg(events).collect()
    assert sum(r["n"] for r in out) == 2 * events.count()


def test_sessionize_partitions_events(spark, events):
    sessions = sessionize(events, gap_minutes=30)
    assert sessions.agg(F.sum("n_events")).first()[0] == events.count()
    # session ids are 1..k contiguous per user
    per_user = sessions.groupBy("user_id").agg(
        F.min("session_id").alias("lo"), F.max("session_id").alias("hi"),
        F.count(F.lit(1)).alias("k"))
    bad = per_user.filter((F.col("lo") != 1) | (F.col("hi") != F.col("k"))).count()
    assert bad == 0


def test_streaming_matches_batch(spark, events, tmp_out):
    """Real readStream: write events to a parquet dir, stream it through
    the same tumbling plan with a watermark, compare to batch."""
    src_dir = f"{tmp_out}/stream_events_src"
    # several files → several micro-batches (maxFilesPerTrigger=1)
    events.repartition(4).write.mode("overwrite").parquet(src_dir)

    stream = stream_events(spark, src_dir)
    plan = tumbling_agg(stream, watermark="2 hours")
    run_stream_to_memory(plan, "t_stream", output_mode="complete")

    got = {(r["window_start"], r["event_type"]): (r["n"], r["value_sum"])
           for r in spark.sql("select * from t_stream").collect()}
    want = {(r["window_start"], r["event_type"]): (r["n"], r["value_sum"])
            for r in tumbling_agg(events).collect()}
    assert got == want
