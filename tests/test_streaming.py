from __future__ import annotations

from pyspark.sql import functions as F

from thuvienphapluat_crawler_spark.streaming.events import (
    hourly_stats_stream,
    windowed_watermark_stream,
)

SF = "/root/testdata/sf0.001"


def test_streaming_hourly_equals_batch(spark):
    got = hourly_stats_stream(spark, SF).collect()
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("hour", "event_type")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]


def test_watermark_append_is_prefix_of_batch(spark):
    got = windowed_watermark_stream(spark, SF).collect()
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.window("ts", "30 minutes", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
        )
        .collect()
    )
    batch_set = {tuple(r) for r in batch}
    got_set = {tuple(r) for r in got}
    # append mode emits only watermark-closed windows: a strict subset
    # whose emitted rows agree exactly with the batch aggregation
    assert got_set <= batch_set
    assert len(got_set) < len(batch_set)  # trailing windows never closed
    assert len(got_set) > 0
