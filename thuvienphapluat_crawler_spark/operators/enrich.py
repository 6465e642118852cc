"""Document-enrichment joins and chunking (SURVEY §2.3 J1/J2, §2.4 A6/A7).

The reference walks the DOM appending tooltip text in brackets
(crawler.py:83-142, pipeline.py:129-151) and swapping footnote bodies in
place (pipeline.py:154-213); both are equi-joins once elements and
reference divs are rows. The build side (tooltips/footnotes per doc
batch) is small → broadcast hash join, zero shuffle of the element side.

Chunking reproduces format_xls.py:16-19/221-240: fixed 30-row groups per
(doc, section) with the header re-emitted per chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOOLTIP_NOISE = "Click vào để xem nội dung"  # pipeline.py:148
CHUNK_ROWS = 30  # format_xls.py:18


def tooltip_join(elements: DataFrame, tooltips: DataFrame) -> DataFrame:
    """elements(doc_id, offset, text, tooltip_class) ⟕ tooltips(doc_id,
    tooltip_class, tooltip_text): append ' [tooltip]' to matched element
    text; noise tooltips dropped (pipeline.py:148); unmatched unchanged.
    """
    tt = tooltips.filter(F.col("tooltip_text") != TOOLTIP_NOISE)
    joined = elements.join(
        F.broadcast(tt), ["doc_id", "tooltip_class"], "left"
    )
    return joined.select(
        "doc_id",
        "offset",
        F.when(
            F.col("tooltip_text").isNotNull(),
            F.concat(F.col("text"), F.lit(" ["), F.col("tooltip_text"), F.lit("]")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def footnote_join(elements: DataFrame, notes: DataFrame) -> DataFrame:
    """<huongdan id="span-note_X"> elements ⟕ div#note_X notes; the note
    body replaces the element text and splits on '|~|' into
    (content, source) — pipeline.py:154-184, 207-213."""
    el = elements.withColumn(
        "note_id", F.regexp_replace(F.col("element_id"), r"^span-", "")
    )
    joined = el.join(F.broadcast(notes), el.note_id == notes.note_div_id, "left")
    parts = F.split(F.col("note_text"), r"\|~\|")
    return joined.select(
        "doc_id",
        "offset",
        F.coalesce(F.element_at(parts, 1), F.col("text")).alias("text"),
        F.element_at(parts, 2).alias("note_source"),
    )


def chunk_table_rows(
    rows: DataFrame,
    group_cols: list[str],
    order_col: str = "offset",
    chunk_rows: int = CHUNK_ROWS,
) -> DataFrame:
    """Fixed-size chunking with header re-emission: within each group
    ordered by offset, row 0 is the header; body rows get
    chunk_id = (rn-1) // chunk_rows and every chunk re-emits the header
    as its first row (format_xls.py:221-240 semantics)."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    numbered = rows.withColumn("_rn", F.row_number().over(w))
    header = numbered.filter(F.col("_rn") == 1)
    body = numbered.filter(F.col("_rn") > 1).withColumn(
        "chunk_id", F.floor((F.col("_rn") - 2) / chunk_rows).cast("int")
    )
    n_chunks = body.groupBy(*group_cols).agg(
        (F.max("chunk_id") + 1).alias("_nc")
    )
    header_per_chunk = (
        header.join(n_chunks, group_cols, "left")
        .withColumn("_nc", F.coalesce("_nc", F.lit(1)))
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .withColumn("is_header", F.lit(True))
        .drop("_nc")
    )
    return (
        header_per_chunk.select(*group_cols, "chunk_id", "is_header", order_col, "_rn",
                                *[c for c in rows.columns if c not in group_cols + [order_col]])
        .unionByName(
            body.withColumn("is_header", F.lit(False)).select(
                *group_cols, "chunk_id", "is_header", order_col, "_rn",
                *[c for c in rows.columns if c not in group_cols + [order_col]]
            )
        )
        .drop("_rn")
    )
