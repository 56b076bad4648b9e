"""Stateful streaming: dedup-within-watermark and arbitrary state."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_integration_and_harmonization_spark.operators import events as EV
from data_integration_and_harmonization_spark.streaming import pipeline as SP
from data_integration_and_harmonization_spark.streaming import stateful as ST


@pytest.fixture()
def duped_events_dir(spark, sf_dir):
    """A directory with the events file present twice -> every event is
    an exact duplicate across files."""
    d = tempfile.mkdtemp(prefix="dih_dup_")
    ev = EV.load_events(spark, sf_dir)
    ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "a"))
    for i, f in enumerate(os.listdir(os.path.join(d, "a"))):
        if f.endswith(".parquet"):
            src = os.path.join(d, "a", f)
            shutil.copy(src, os.path.join(d, f"events_0.parquet"))
            shutil.copy(src, os.path.join(d, f"events_1.parquet"))
    shutil.rmtree(os.path.join(d, "a"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_dedup_within_watermark(spark, duped_events_dir, sf_dir):
    n_distinct = EV.load_events(spark, sf_dir).count()
    schema = spark.read.parquet(duped_events_dir).schema
    stream = spark.readStream.schema(schema).parquet(duped_events_dir)
    deduped = ST.dedup_stream(stream, ["event_id"], "ts", "2 hours")

    with tempfile.TemporaryDirectory(prefix="dih_ckpt_") as ckpt:
        q = (
            deduped.writeStream.format("memory")
            .queryName("t_dedup")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = spark.table("t_dedup").count()
    assert got == n_distinct  # 2x input rows -> 1x distinct events


def test_user_running_stats_state_across_batches(spark, sf_dir):
    """Force multiple micro-batches (maxFilesPerTrigger=1 over two
    copies) and check the final state accumulated across them."""
    ev = EV.load_events(spark, sf_dir).select("user_id", "value", "ts")
    expected = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .collect()
    )
    exp = {r["user_id"]: (r["n"], r["s"]) for r in expected}

    stream = SP.stream_events(spark, f"{sf_dir}/events.parquet")
    stream = SP.ensure_event_time(stream).select("user_id", "value", "ts")
    out = ST.user_running_stats(stream)
    with tempfile.TemporaryDirectory(prefix="dih_ckpt_") as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName("t_stats")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # last update per user wins
    final = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in spark.table("t_stats").collect()
    }
    assert final == exp
