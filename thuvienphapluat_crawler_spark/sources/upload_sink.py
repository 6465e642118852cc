"""HTTP API sink (SURVEY §2.1 S13): catalog-driven multipart-POST upload
as a foreachPartition sink (reference: upload_documents.py:100-137).

No network in the sandbox (and the driver gate needs determinism), so the
POST itself is modeled as a spool-dir write: each non-empty partition
writes ONE JSONL file of "POST records" carrying exactly the fields the
reference posts per document (file + the 5 metadata form fields,
upload_documents.py:92-96) plus the response fields (status/status_code/
error, upload_documents.py:115-127). The reference throttles with
`time.sleep(1)` between requests (upload_documents.py:129); here the
1 req/s token bucket runs on a VIRTUAL clock — `post_slot` is the
precomputed second each request fires — so the spacing is deterministic,
assertable, and benchable instead of wall-clock sleeps.

Scale note: an HTTP sink is rate-bound, not compute-bound — the Spark
shape that survives scale is exactly this one (foreachPartition + a
per-partition token bucket writing its own spool file, statuses re-read
as a table). The throttle is LANE-partitioned by default: files hash
into N_LANES independent 1 req/s clients and post_slot is the lane-local
slot, so the scheduling window is `partitionBy(lane)` — never a global
single-task sort. N_LANES=1 reproduces the reference's one sequential
client (upload_documents.py:129) exactly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

POST_RECORD_SCHEMA = (
    "file string, document_number string, document_type string, issuing_authority string, "
    "title string, issued_date string, status string, status_code long, error string, "
    "lane long, post_slot double"
)


def spool_post_records(df: DataFrame, spool_dir: str) -> None:
    """foreachPartition sink: each partition appends its rows to one
    JSONL spool file (tmp-write + atomic rename — the same
    write-then-flip discipline as the warehouse manifest)."""
    os.makedirs(spool_dir, exist_ok=True)
    cols = [f.split()[0] for f in POST_RECORD_SCHEMA.split(", ")]

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        buf = []
        for r in rows:
            d = r.asDict()
            buf.append(json.dumps({c: d.get(c) for c in cols}, ensure_ascii=False))
        if not buf:
            return
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(spool_dir, f".part-{pid:05d}.jsonl.tmp")
        dst = os.path.join(spool_dir, f"part-{pid:05d}.jsonl")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(buf) + "\n")
        os.replace(tmp, dst)

    df.foreachPartition(write_partition)


def read_post_records(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Re-read the spooled POST records with an explicit schema (no
    inference drift) — the sink's statuses become a queryable table."""
    return spark.read.schema(POST_RECORD_SCHEMA).json(spool_dir)
