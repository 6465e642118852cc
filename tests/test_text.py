from __future__ import annotations

import re

from pyspark.sql import functions as F

from thuvienphapluat_crawler_spark.functions import text as TX

LINES = [
    "Căn cứ Luật Tổ chức Chính phủ;",
    "Điều 1. Phạm vi điều chỉnh",
    "Nghị định này quy định",
    "về quản lý dữ liệu.",
    "1. Khoản một nói về",
    "phạm vi áp dụng.",
    "a) điểm a của khoản;",
    "- gạch đầu dòng.",
]

# what the reference's buffer machine would produce (flush on sentence end
# / Điều-title; merge continuation lines)
EXPECTED = [
    "Căn cứ Luật Tổ chức Chính phủ;",
    "Điều 1. Phạm vi điều chỉnh",
    "Nghị định này quy định về quản lý dữ liệu.",
    "1. Khoản một nói về phạm vi áp dụng.",
    "a) điểm a của khoản;",
    "- gạch đầu dòng.",
]


def test_merge_lines_to_paragraphs(spark):
    df = spark.createDataFrame(
        [("d1", i, line) for i, line in enumerate(LINES)], "doc_id string, offset int, line string"
    )
    out = (
        TX.merge_lines_to_paragraphs(df)
        .orderBy("para_offset")
        .select("paragraph")
        .collect()
    )
    assert [r.paragraph for r in out] == EXPECTED


def python_postprocess(text: str) -> str:
    for pat, rep in TX.POSTPROCESS_STEPS:
        text = re.sub(pat, rep, text)
    return text.lstrip()


def test_postprocess_matches_python_fold(spark):
    raw = (
        "\n\n[Click vào để xem nội dung]Điều 1.  Nội dung\t\n"
        " . \nphần   tiếp theo\n\n\n\nhết."
    )
    df = spark.createDataFrame([(raw,)], "text string")
    got = df.select(TX.postprocess_text(F.col("text")).alias("t")).first().t
    assert got == python_postprocess(raw)
    assert "[Click" not in got
    assert "\n\n\n" not in got


def test_new_paragraph_patterns(spark):
    positives = ["Chương I Quy định", "Mục 1 ...", "Điều 5. X", "2. nội dung", "b) điểm", "- ý", "PHỤ LỤC I", "Căn cứ luật", "Số: 12/2021", "Nơi nhận: các bộ", "III. Phần ba", "KT. BỘ TRƯỞNG"]
    negatives = ["nội dung thường", "tiếp tục câu trước", "của Chính phủ"]
    df = spark.createDataFrame([(s,) for s in positives + negatives], "line string")
    rows = df.select("line", TX.is_new_paragraph(F.col("line")).alias("m")).collect()
    res = {r.line: r.m for r in rows}
    for s in positives:
        assert res[s], f"should match: {s}"
    for s in negatives:
        assert not res[s], f"should NOT match: {s}"
