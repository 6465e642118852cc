from __future__ import annotations

from thuvienphapluat_crawler_spark.sources import synthetic_web as SW
from thuvienphapluat_crawler_spark.sources.html_parse import (
    extract_documents,
    parse_page,
    parse_pages,
)


def _urls(n=30):
    world = SW.World(n_hosts=4, base_size=40)
    return [SW.make_url(h, i) for h in range(4) for i in range(min(n // 4, world.host_sizes[h]))]


def test_parser_excludes_nav_noise():
    rows = parse_page(SW.page_html(SW.make_url(0, 1)))
    # content stream (node/element rows) excludes everything outside
    # content1; the menu div surfaces only as an unreferenced page div
    texts = " ".join(r[2] for r in rows if r[0] in ("node", "element"))
    assert "NAV NOISE" not in texts
    kinds = {r[0] for r in rows}
    assert kinds == {"node", "element", "tooltip", "note"}


def test_html_extract_matches_sequential_oracle(spark):
    urls = _urls(32)
    df = spark.createDataFrame(
        [(u, SW.page_html(u)) for u in urls], "doc_id string, html string"
    )
    out = extract_documents(parse_pages(df)).collect()
    got: dict[str, list[tuple[int, str]]] = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.para_offset, r.paragraph))
    assert set(got) == set(urls)
    for u in urls:
        paras = [p for _, p in sorted(got[u])]
        expected = SW.expected_page_paragraphs(u)
        assert paras == expected, f"extract diverges for {u}\n{paras}\nvs\n{expected}"


def test_tooltip_precedence_and_noise(spark):
    # atmm wins over onmouseover; noise tooltip appends nothing
    html = (
        '<div class="content1">\n'
        'đầu dòng <a atmm=".real" onmouseover="x(\'.noise\')">kép</a> hết.\n'
        'tiếp <span onmouseover="LS_lqhlTootip(\'.noise\')">mờ</span> dòng.\n'
        "</div>"
        '<div class="real">nội dung thật</div>'
        '<div class="noise">Click vào để xem nội dung</div>'
    )
    df = spark.createDataFrame([("d", html)], "doc_id string, html string")
    paras = [r.paragraph for r in extract_documents(parse_pages(df)).orderBy("para_offset").collect()]
    assert paras == ["đầu dòng kép [nội dung thật] hết.", "tiếp mờ dòng."]


def test_crawl_engine_html_mode_matches_sequential_oracle(spark, tmp_path):
    """The engine with content='html' runs the REAL DOM extract inside the
    epoch loop; every fetched doc's spans must equal the generator-
    inversion oracle, and crawl order must be identical to spans mode."""
    from thuvienphapluat_crawler_spark.plans.frontier import CrawlEngine
    from thuvienphapluat_crawler_spark.sources.synthetic_web import World

    world = World(n_hosts=2, base_size=24, links_per_page=3, budget_per_host=5, max_epochs=2)
    html_eng = CrawlEngine(spark, world, str(tmp_path / "html"), n_buckets=4, content="html")
    html_eng.run()
    span_eng = CrawlEngine(spark, world, str(tmp_path / "spans"), n_buckets=4)
    span_eng.run()

    log_of = lambda e: sorted(
        (r.epoch, r.host, r.rank, r.canonical_url, r.status) for r in e.crawl_log().collect()
    )
    assert log_of(html_eng) == log_of(span_eng), "fetch scheduling must not depend on content mode"

    docs = {r.canonical_url: r.spans for r in html_eng.docs().collect()}
    oks = [r.canonical_url for r in html_eng.crawl_log().collect() if r.status == "ok"]
    assert set(docs) == set(oks)
    for url, spans in docs.items():
        got = [(s.kind, s.text, s.media_ref, s.offset) for s in spans]
        expected = [
            ("text", p, "", i) for i, p in enumerate(SW.expected_page_paragraphs(url))
        ]
        assert got == expected, f"html-mode spans diverge for {url}"
