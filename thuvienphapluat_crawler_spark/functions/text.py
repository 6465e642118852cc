"""Vietnamese legal-text operators as column expressions + one grouped-map UDF.

Reproduces the reference's text semantics (NOT its code):
  - paragraph-start predicate battery   (reference: pipeline.py:262-298)
  - sentence-end / Điều-title-end flush (reference: pipeline.py:308-311)
  - ordered regex postprocess fold      (reference: pipeline.py:325-384)
  - line→paragraph merge state machine  (reference: pipeline.py:256-322)

The merge machine is per-document and order-sensitive, so it runs as a
window-function sessionization (pure Catalyst: lag + cumsum of new-para
flags → groupBy paragraph id) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Vietnamese uppercase letters (for heading patterns); Java-regex safe.
_VUP = "A-ZĐÁÀẢÃẠĂẮẰẲẴẶÂẤẦẨẪẬÉÈẺẼẸÊẾỀỂỄỆÍÌỈĨỊÓÒỎÕỌÔỐỒỔỖỘƠỚỜỞỠỢÚÙỦŨỤƯỨỪỬỮỰÝỲỶỸỴ"

# One compiled alternation replacing the reference's 24-pattern
# if/elif battery (pipeline.py:262-288). A line STARTS a new paragraph
# iff it matches.
NEW_PARAGRAPH_PATTERN = "|".join(
    [
        r"^Chương\s+[IVXLCDM]+",          # chapter
        r"^Mục\s+\d+",                    # section
        r"^Điều\s+\d+\s*[.:]",            # article
        r"^\d+\.",                        # numbered clause  "1."
        r"^[a-zđ]\)",                     # lettered point   "a)"
        r"^-\s",                          # dash bullet
        r"^\+\s",                         # plus bullet
        r"^PHỤ\s+LỤC",                    # appendix
        r"^Căn\s+cứ\b",                   # legal basis
        r"^Theo\s+đề\s+nghị\b",           # per-proposal
        r"^Số\s*:",                       # number field
        r"^Nơi\s+nhận\s*:",               # recipients
        r"^[IVXLCDM]+\s*[.\-]",           # roman numeral heading
        rf"^[{_VUP}][{_VUP}\s,\-–/]{{8,}}$",  # ALL-CAPS heading line
        r"^KT\.\s",                       # signing authority
        r"^TM\.\s",
        r"^QUYẾT\s+ĐỊNH",
        r"^NGHỊ\s+ĐỊNH",
        r"^THÔNG\s+TƯ",
    ]
)

SENTENCE_END_PATTERN = r"[.;:?!]$"              # pipeline.py:311
DIEU_TITLE_PATTERN = r"^Điều\s+\d+\.\s.+$"      # pipeline.py:291,308
TOOLTIP_NOISE = "Click vào để xem nội dung"     # pipeline.py:148


def is_new_paragraph(line: Column) -> Column:
    return line.rlike(NEW_PARAGRAPH_PATTERN)


def ends_sentence(line: Column) -> Column:
    return line.rlike(SENTENCE_END_PATTERN)


def is_dieu_title(line: Column) -> Column:
    return line.rlike(DIEU_TITLE_PATTERN)


# Ordered postprocess fold — semantics of the reference's 14-step regex
# battery (pipeline.py:339-382, postprocess.py:20-49). ORDER-SENSITIVE:
# applied as a fixed fold, tested against a Python oracle.
POSTPROCESS_STEPS: list[tuple[str, str]] = [
    (r"\[Click vào để xem nội dung\]", ""),     # strip click-notes (pipeline.py:342)
    (r"(?m)^\s*\.\s*$", ""),                    # lone-dot lines     (pipeline.py:345)
    (r"[ \t]+\n", "\n"),                        # trailing ws
    (r"\n{3,}", "\n\n"),                        # blank-line collapse (pipeline.py:380)
    (r"[ \t]{2,}", " "),                        # inner ws collapse
]


def postprocess_text(text: Column) -> Column:
    """Apply the ordered regex fold as chained regexp_replace (codegen'd)."""
    out = text
    for pat, rep in POSTPROCESS_STEPS:
        out = F.regexp_replace(out, pat, rep)
    # Spark's ltrim strips spaces only; the reference lstrips all
    # whitespace incl. newlines (pipeline.py:382)
    return F.regexp_replace(out, r"^\s+", "")


def merge_lines_to_paragraphs(
    lines: DataFrame,
    doc_col: str = "doc_id",
    offset_col: str = "offset",
    line_col: str = "line",
) -> DataFrame:
    """Line→paragraph merge as window sessionization.

    The reference walks lines with a mutable buffer, flushing when the
    buffer ends a sentence / completes an Điều title, and starting a new
    paragraph on structural markers (pipeline.py:256-322). Re-expressed:

      new_para(line i) = is_new_paragraph(i) OR flush-after(i-1)
      para_id          = cumulative sum of new_para over doc order
      paragraph        = concat_ws(' ', lines in para_id order)

    All Catalyst built-ins: one shuffle on doc_id, then window + groupBy
    reuse the same partitioning (no second shuffle).
    """
    w = Window.partitionBy(doc_col).orderBy(offset_col)
    prev = F.lag(line_col).over(w)
    flush_after_prev = (
        prev.isNull()
        | ends_sentence(prev)
        | is_dieu_title(prev)
    )
    starts = is_new_paragraph(F.col(line_col)) | flush_after_prev
    with_pid = (
        lines.filter(F.trim(F.col(line_col)) != "")   # empty-line filter (pipeline.py:295)
        .withColumn("_new_para", starts.cast("int"))
        .withColumn("para_id", F.sum("_new_para").over(w))
    )
    return (
        with_pid.groupBy(doc_col, "para_id")
        .agg(
            F.min(offset_col).alias("para_offset"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col(offset_col).alias("o"), F.col(line_col).alias("l")))
                    ),
                    lambda s: s["l"],
                ),
            ).alias("paragraph"),
        )
        .drop("para_id")
    )
