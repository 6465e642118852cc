"""Custom stateful streaming operator: per-user sessionization via
applyInPandasWithState (SURVEY §2.9 'custom stateful operators').

Sessions close when the event gap exceeds GAP_S (same semantics as the
batch events_sessionize query, which is this operator's oracle twin).
Closed sessions are emitted as they are observed; the final open session
per user stays in state (append semantics — with an infinite stream a
ProcessingTimeTimeout would flush it; tests assert the emitted set is
exactly the batch result minus each user's last session).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from .events import EVENTS_SCHEMA

GAP_S = 1800

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # epoch seconds
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
        T.StructField("duration_s", T.LongType()),
    ]
)

# state: (session_start, last_ts, n_events, value_sum)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start, last, n, vsum = state.get
    else:
        start = last = n = 0
        vsum = 0.0
    closed: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, value in zip(pdf["ts"], pdf["value"]):
            tsec = int(ts.timestamp())
            if n > 0 and tsec - last > GAP_S:
                closed.append((user_id, start, n, round(vsum, 2), last - start))
                start, n, vsum = tsec, 0, 0.0
            if n == 0:
                start = tsec
            n += 1
            vsum += float(value)
            last = tsec
    state.update((start, last, n, vsum))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "n_events", "session_value", "duration_s"]
        )


def sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionizer over the events parquet as a stream;
    returns the emitted (closed) sessions."""
    name = f"sess_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
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
