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


def test_streaming_politeness_contiguous_across_batches(spark, tmp_path):
    # Two parquet files + maxFilesPerTrigger=1 → two micro-batches. Slots
    # must stay contiguous per host (state carries the counter), and every
    # doc appears exactly once.
    import uuid

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from thuvienphapluat_crawler_spark.queries import _frontier_cols_from_docs
    from thuvienphapluat_crawler_spark.streaming.events import DOCS_SCHEMA
    from thuvienphapluat_crawler_spark.streaming.politeness import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        _schedule_group,
    )

    rows = [(d, f"t{d}", "en", "s", 10) for d in range(40)]
    src = str(tmp_path / "docs_stream")
    spark.createDataFrame(rows[:20], DOCS_SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows[20:], DOCS_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    name = f"polite_t_{uuid.uuid4().hex[:8]}"
    docs = spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    fr = _frontier_cols_from_docs(docs).withColumn("url_fp", F.md5("canonical_url"))
    out = fr.groupBy("host").applyInPandasWithState(
        _schedule_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(name).collect()
    assert sorted(r.doc_id for r in got) == list(range(40))
    by_host: dict[str, list] = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r)
    for host, rs in by_host.items():
        delay = 1.0 + (int(host.removeprefix("host")) % 3)
        ranks = sorted(r.rnk for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), host  # contiguous, no gaps
        for r in rs:
            assert r.fetch_slot_s == round((r.rnk - 1) * delay, 1)


def test_schedule_group_sorts_across_arrow_chunks():
    # A host group bigger than arrow.maxRecordsPerBatch arrives as MULTIPLE
    # pandas chunks. Slot order must follow the (category_priority, depth,
    # url_fp) sort over the WHOLE group, not per-chunk.
    import pandas as pd

    from thuvienphapluat_crawler_spark.streaming.politeness import _schedule_group

    class FakeState:
        exists = False

        def update(self, v):
            self.val = v

    def mk(rows):
        return pd.DataFrame(
            rows, columns=["host", "doc_id", "category_priority", "depth", "url_fp"]
        )

    # chunk 2 holds the globally-first row (priority 0) — a per-chunk sort
    # would schedule doc 11 (priority 5) before doc 99 (priority 0).
    chunk1 = mk([("host1", 11, 5, 1, "aa"), ("host1", 12, 5, 2, "bb")])
    chunk2 = mk([("host1", 99, 0, 0, "cc"), ("host1", 13, 5, 1, "zz")])
    st = FakeState()
    (out,) = list(_schedule_group(("host1",), iter([chunk1, chunk2]), st))
    assert list(out["doc_id"]) == [99, 11, 13, 12]
    assert list(out["rnk"]) == [1, 2, 3, 4]
    assert st.val == (4,)
