"""Multi-sheet workbook scan (SURVEY §2.1 S8; reference: format_xls.py:182-186
`pd.read_excel(sheet_name=None, header=None)` → {sheet → raw DataFrame}).

The xlsx DECODE itself needs openpyxl/xlrd (not in this container) — that
step is the stub, exactly like the media decoders (multimodal.py). What
is real and tested end-to-end is the Spark shape the reference's sheet
processing maps to:

    workbook column → mapInPandas sheet scan
      → (doc_id, sheet_name, row_idx, cells:array<string>) rows
      → per-sheet header detection / annex title / chunking
        (operators/enrich.py — the same W4/A7/A6/J6 machinery)

Serialized stand-in format (deterministic, produced by the synthetic
workbook builder in queries.py): sheets separated by GS (\\x1d), the
first record of a sheet is its name, records separated by RS (\\x1e),
cells by US (\\x1f); empty cells serialize as '' and surface as NULLs —
the same nullability contract pd.read_excel gives pandas NaNs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GS, RS, US = "\x1d", "\x1e", "\x1f"

SHEET_ROW_SCHEMA = "doc_id string, sheet_name string, row_idx int, cells array<string>"


def parse_workbook(payload: str) -> list[tuple[str, int, list[str | None]]]:
    """workbook payload → (sheet_name, row_idx, cells) rows; '' cells → None
    (pd.read_excel NaN analogue — header/annex logic treats them as absent)."""
    out: list[tuple[str, int, list[str | None]]] = []
    for sheet in payload.split(GS):
        if not sheet:
            continue
        records = sheet.split(RS)
        name, rows = records[0], records[1:]
        for i, row in enumerate(rows):
            cells = [c if c != "" else None for c in row.split(US)]
            out.append((name, i, cells))
    return out


def sheets_from_workbooks(
    df: DataFrame, id_col: str = "doc_id", wb_col: str = "workbook"
) -> DataFrame:
    """(doc_id, workbook) → one row per sheet row, Arrow-batched. With a
    real xlsx source this is `binaryFile` scan + openpyxl inside the same
    mapInPandas (decode swap is local to this function)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[wb_col]):
                for name, i, cells in parse_workbook(payload):
                    rows.append((str(doc_id), name, i, cells))
            yield pd.DataFrame(rows, columns=["doc_id", "sheet_name", "row_idx", "cells"])

    return df.select(F.col(id_col), F.col(wb_col)).mapInPandas(run, SHEET_ROW_SCHEMA)
