"""Structured Streaming operators (SURVEY §2.9).

The reference is batch with streaming-shaped semantics (per-page commit
loop, resumable checkpoints); here the same aggregations run as real
Structured Streaming queries. For finite parquet input the stream is
driven to completion synchronously (processAllAvailable) — the pattern
the crawl engine would use with `Trigger.AvailableNow` in production.

Exactly-once emission on a real deployment: `foreachBatch` writing the
batch + checkpoint through SnapshotWarehouse.commit_epoch (one atomic
manifest swap per micro-batch) — the same idempotent MERGE-on-
(doc_id, offset) contract the batch engine uses.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def hourly_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation as a streaming query over the
    events parquet, driven to completion; returns the final result table
    (identical semantics to the batch events_hourly_stats query, which is
    its DuckDB-checked oracle twin)."""
    name = f"hourly_{uuid.uuid4().hex[:8]}"
    # FileStreamSource needs a directory; glob-filter to the events file
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("hour", "event_type")
    )


def windowed_watermark_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked sliding-window count (late-data handling shape):
    10-minute watermark over 30-minute windows sliding by 15. Append mode
    emits only closed windows; with a finite input the trailing windows
    never close, so the count is a strict prefix — asserted in tests."""
    name = f"wm_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n",
    )


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def streaming_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The URL-seen set as a STREAMING operator (SURVEY §2.7 U4's
    streaming twin): a continuous URL feed deduplicated with streaming
    dropDuplicates (state = the seen set; in production bounded by a
    watermark on discovery time + the engine's persistent filter), then
    counted per host. Two documents map to every canonical URL
    (doc_id % 250), so the dedup has real work; the batch DISTINCT is
    the oracle."""
    name = f"seen_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    key = F.col("doc_id") % 250  # 2 docs per URL at sf0.01 → real dedup work
    urls = stream.select(
        F.concat(F.lit("host"), (key % 7).cast("string")).alias("host"),
        F.concat(
            F.lit("https://host"), (key % 7).cast("string"),
            F.lit(".example.vn/doc-"), key.cast("string"), F.lit(".aspx"),
        ).alias("canonical_url"),
    )
    pending = urls.dropDuplicates(["canonical_url"]).groupBy("host").agg(
        F.count("*").alias("n_unique")
    )
    q = pending.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("host", "n_unique").orderBy("host")
