"""Line-level boilerplate dedup + exact substring-span dedup (r06).

Reference framing: the crawler feeds a curation pipeline it doesn't
contain (pipeline.py stops at postprocessing); these are the RefinedWeb
line-wise filter and the Lee-et-al ExactSubstr stage over the same
documents table the other corpus ops use.
"""

from __future__ import annotations

import pytest

from thuvienphapluat_crawler_spark.operators.corpusops import line_dedup
from thuvienphapluat_crawler_spark.operators.dedup import duplicated_spans, token_windows


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# line_dedup


def test_line_dedup_removes_frequent_keeps_rare(spark):
    boiler = "subscribe now"
    rows = [(i, f"unique body {i}\n{boiler}") for i in range(5)]
    rows.append((5, "unique body 5\nrare footer"))
    out = {r.doc_id: r for r in line_dedup(_docs(spark, rows), min_docs=5).collect()}
    assert out[0].n_removed == 1 and out[0].cleaned_text == "unique body 0"
    # the rare footer is below the document-frequency threshold: survives
    assert out[5].n_removed == 0 and out[5].cleaned_text == "unique body 5\nrare footer"


def test_line_dedup_within_doc_repeats_do_not_count(spark):
    # the SAME doc repeating a line contributes ONE distinct doc, so the
    # threshold is not met and nothing is removed (frequency is across
    # documents — a legit refrain inside one doc is not boilerplate)
    rows = [(1, "x\nx\nx\nx\nx"), (2, "other")]
    out = {r.doc_id: r for r in line_dedup(_docs(spark, rows), min_docs=2).collect()}
    assert out[1].n_removed == 0 and out[1].n_lines == 5


def test_line_dedup_doc_reduced_to_nothing_keeps_row(spark):
    rows = [(i, "only boiler") for i in range(5)]
    out = {r.doc_id: r for r in line_dedup(_docs(spark, rows), min_docs=5).collect()}
    assert len(out) == 5
    assert out[0].n_lines == 1 and out[0].n_removed == 1 and out[0].cleaned_text == ""


def test_line_dedup_preserves_line_order(spark):
    boiler = "b"
    rows = [(i, f"first {i}\n{boiler}\nlast {i}") for i in range(5)]
    out = line_dedup(_docs(spark, rows), min_docs=5).collect()
    for r in out:
        assert r.cleaned_text == f"first {r.doc_id}\nlast {r.doc_id}"


# ---------------------------------------------------------------------------
# token_windows / duplicated_spans


def test_token_windows_short_doc_yields_none(spark):
    rows = [(1, "a b c")]
    assert token_windows(_docs(spark, rows), k=4).count() == 0


def test_token_windows_positions_and_content(spark):
    rows = [(1, "a b c d e")]
    wins = {r.start: r.win for r in token_windows(_docs(spark, rows), k=3).collect()}
    assert wins == {0: "a b c", 1: "b c d", 2: "c d e"}


@pytest.fixture()
def span_docs(spark):
    # docs 1 and 2 share tokens s0..s9 (a 10-token passage); doc 3 is noise
    shared = " ".join(f"s{i}" for i in range(10))
    return _docs(
        spark,
        [
            (1, f"a1 b1 c1 {shared} z1"),
            (2, f"{shared} q2 r2 t2 u2 v2"),
            (3, "n0 n1 n2 n3 n4 n5 n6 n7 n8 n9 n10"),
        ],
    )


def test_duplicated_spans_maximal_merge(spark, span_docs):
    # k=4 windows inside the shared 10-token passage: starts 0..6 relative
    # to the passage -> ONE maximal span of length 10 per doc, offset by
    # each doc's prefix
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.n_windows)
        for r in duplicated_spans(span_docs, k=4, min_docs=2).collect()
    }
    assert spans[1] == (3, 13, 7)  # after the 3-token prefix
    assert spans[2] == (0, 10, 7)
    assert 3 not in spans  # noise doc shares nothing


def test_duplicated_spans_disjoint_spans_stay_separate(spark):
    sa = "p0 p1 p2 p3"
    sb = "q0 q1 q2 q3"
    docs = _docs(
        spark,
        [
            (1, f"{sa} g1 g2 g3 g4 g5 {sb}"),
            (2, f"{sa} h1 h2 h3 h4 h5 {sb}"),
        ],
    )
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(docs, k=4, min_docs=2).collect()
    )
    # the gap tokens differ between docs, so the two 4-token passages
    # (at token offsets [0,4) and [9,13) — 5 gap tokens between them)
    # must NOT merge across the gap
    assert spans == [(1, 0, 4), (1, 9, 13), (2, 0, 4), (2, 9, 13)]


def test_duplicated_spans_requires_distinct_docs(spark):
    # a window repeated WITHIN one doc only is not a cross-doc duplicate
    docs = _docs(spark, [(1, "w0 w1 w2 w3 g w0 w1 w2 w3"), (2, "z0 z1 z2 z3 z4")])
    assert duplicated_spans(docs, k=4, min_docs=2).count() == 0


def test_duplicated_spans_hash_collisions_verified_exactly(spark, span_docs):
    # r07: the full-corpus shuffles key on xxhash64(win); correctness rests
    # on the exact string verify over the hash-qualified candidates. Force
    # EVERY window into one colliding "hash" bucket — the candidate set
    # becomes all windows, and the output must still be exactly the
    # true-duplicate spans (collisions add candidates, never results).
    from pyspark.sql import functions as F

    exact = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicated_spans(span_docs, k=4, min_docs=2).collect()
    }
    collided = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicated_spans(
            span_docs, k=4, min_docs=2, hash_fn=lambda c: F.lit(0).cast("long")
        ).collect()
    }
    assert collided == exact
    assert exact  # non-vacuous: the shared passage is present
