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
