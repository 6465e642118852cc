from __future__ import annotations

import textwrap

from thuvienphapluat_crawler_spark.sources.catalog import catalog_file_join, read_catalog
from thuvienphapluat_crawler_spark.sources.cookies import read_cookies


def test_read_cookies(spark, tmp_path):
    p = tmp_path / "cookies.txt"
    p.write_text(
        textwrap.dedent(
            """\
            # Netscape HTTP Cookie File
            .thuvienphapluat.vn\tTRUE\t/\tTRUE\t1893456000\tsessionid\tabc123
            thuvienphapluat.vn\tFALSE\t/van-ban\tFALSE\t0\tlang\tvi
            """
        ),
        encoding="utf-8",
    )
    rows = {r.name: r for r in read_cookies(spark, str(p)).collect()}
    assert rows["sessionid"].domain == "thuvienphapluat.vn"  # leading dot stripped
    assert rows["sessionid"].secure is True
    assert rows["sessionid"].expires == 1893456000
    assert rows["lang"].include_subdomains is False
    assert rows["lang"].path == "/van-ban"


def test_catalog_join_statuses(spark, tmp_path):
    p = tmp_path / "documents.csv"
    p.write_text(
        "file,document_number,document_type,issuing_authority,title,issued_date\n"
        "a.txt,01/2020/TT-BYT,Thông tư,Bộ Y tế,Title A,15/03/2020\n"
        ",,,,skip-me,\n"
        "b.txt,02/2020/QD-TTg,Quyết định,TTg,Title B,01/01/2021\n",
        encoding="utf-8",
    )
    cat = read_catalog(spark, str(p))
    assert cat.count() == 2  # blank-file row dropped (upload_documents.py:76)
    d = {r.file: r.issued_date for r in cat.collect()}
    assert str(d["a.txt"]) == "2020-03-15"  # DD/MM/YYYY parsed

    files = spark.createDataFrame([("a.txt",)], "file string")
    joined = {r.file: r.status for r in catalog_file_join(cat, files).collect()}
    assert joined == {"a.txt": "upload", "b.txt": "skipped"}


# --- real .xlsx codec (S8 decode, stdlib zip+XML) ---------------------------


def test_xlsx_roundtrip_exact():
    from thuvienphapluat_crawler_spark.sources.workbook import build_xlsx, parse_xlsx_bytes

    sheets = {
        "Sheet1": [["STT", "MÃ SỐ", "Tên <thủ> & tục"], ["r0", None, "x"]],
        "Phụ Lục": [["PHỤ LỤC 3", None, None], ["cột a", "cột b", "cột c"]],
    }
    blob = build_xlsx(sheets)
    assert blob == build_xlsx(sheets)  # deterministic bytes (fixed zip timestamps)
    got: dict[str, list] = {}
    for name, i, cells in parse_xlsx_bytes(blob):
        got.setdefault(name, []).append(cells)
        assert i == len(got[name]) - 1  # dense 0-based row indices
    assert got == sheets  # values, escaping, None gaps, sheet order


def test_xlsx_parser_handles_row_gaps_and_inline_strings():
    """Hand-built sheet XML (not from our writer): skipped row numbers
    become all-None rows (pd.read_excel NaN-row semantics), sparse A1
    refs land in the right columns, inline strings decode without a
    shared-string table."""
    import io
    import zipfile

    from thuvienphapluat_crawler_spark.sources.workbook import parse_xlsx_bytes

    sheet = (
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="C1" t="inlineStr"><is><t>wide</t></is></c></row>'
        '<row r="3"><c r="A3"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    rows = parse_xlsx_bytes(buf.getvalue())
    assert rows == [
        ("S", 0, [None, None, "wide"]),
        ("S", 1, [None, None, None]),  # gap row materialized
        ("S", 2, ["42", None, None]),  # raw <v> kept as string
    ]


def test_sheets_from_xlsx_spark_path(spark):
    """The distributed decode path: binary xlsx column → mapInPandas real
    parser → same SHEET_ROW_SCHEMA rows the enrich operators consume."""
    from thuvienphapluat_crawler_spark.sources.workbook import build_xlsx, sheets_from_xlsx

    blob = build_xlsx({"Sheet1": [["a", "b"], ["1", None]]})
    df = spark.createDataFrame([("d1", bytearray(blob))], "doc_id string, xlsx binary")
    rows = sorted(
        (r.doc_id, r.sheet_name, r.row_idx, list(r.cells)) for r in sheets_from_xlsx(df).collect()
    )
    assert rows == [("d1", "Sheet1", 0, ["a", "b"]), ("d1", "Sheet1", 1, ["1", None])]
