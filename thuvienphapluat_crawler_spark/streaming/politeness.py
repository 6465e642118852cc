"""Streaming politeness scheduler: per-host fetch-slot assignment as a
custom stateful operator (SURVEY §2.9; north_rule politeness — the
streaming twin of the batch `politeness_schedule` query, which is its
DuckDB oracle).

State per host is ONE integer — how many fetches have been scheduled —
so slots stay contiguous across micro-batches: the k-th URL a host ever
sees gets slot (k-1)·crawl_delay(host), exactly the reference's
sleep-between-requests semantics (upload_documents.py:129) on a virtual
clock. Within a batch, rows are ordered by the same (category_priority,
depth, url_fp) key the batch scheduler uses; with the single-file test
source there is one batch, so the emitted schedule equals the batch
row_number plan row-for-row. On a live multi-batch stream the slots
remain correct politeness (contiguous per host, arrival-ordered across
batches) — that divergence-from-batch is inherent to online scheduling
and documented here, not hidden.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import DOCS_SCHEMA

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("rnk", T.IntegerType()),
        T.StructField("fetch_slot_s", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("n_scheduled", T.LongType())])


def _schedule_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (host,) = key
    n = state.get[0] if state.exists else 0
    delay = 1.0 + (int(host.removeprefix("host")) % 3)  # == SW.crawl_delay
    out = []
    # A host group larger than arrow.maxRecordsPerBatch arrives as MULTIPLE
    # pandas chunks; sorting each chunk independently would silently break
    # the documented (category_priority, depth, url_fp) within-batch order.
    # Concatenate first, sort once.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["category_priority", "depth", "url_fp"])
        for doc_id in pdf["doc_id"]:
            n += 1
            out.append((host, int(doc_id), n, round((n - 1) * delay, 1)))
    state.update((n,))
    if out:
        yield pd.DataFrame(out, columns=["host", "doc_id", "rnk", "fetch_slot_s"])


def politeness_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents stream → frontier columns → stateful per-host slot
    assignment; driven to completion, emitted schedule returned."""
    from ..queries import _frontier_cols_from_docs

    name = f"polite_{uuid.uuid4().hex[:8]}"
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
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
    return spark.table(name)
