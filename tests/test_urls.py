from __future__ import annotations

from pyspark.sql import functions as F

from thuvienphapluat_crawler_spark.functions import urls as U

CASES = [
    ("  HTTPS://Example.VN:443/a/b.aspx#frag ", "https://example.vn/a/b.aspx"),
    ("http://Example.VN:80/a//b/", "http://example.vn/a/b"),
    ("https://example.vn/a/b?", "https://example.vn/a/b"),
    ("https://example.vn/a/b?x=1#y", "https://example.vn/a/b?x=1"),
    ("https://example.vn:8443/a", "https://example.vn:8443/a"),  # non-default port kept
    ("https://example.vn/", "https://example.vn/"),
]


def test_canonicalize_url(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], "url string")
    got = [r[0] for r in df.select(U.canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in CASES]


def test_host_and_category(spark):
    df = spark.createDataFrame(
        [("https://host001.example.vn/van-ban/Nghi-dinh/doc-5.aspx",)], "url string"
    )
    row = df.select(
        U.url_host(F.col("url")).alias("h"),
        U.url_category(F.col("url")).alias("c"),
        U.category_priority(U.url_category(F.col("url"))).alias("p"),
        U.host_bucket(U.url_host(F.col("url")), 8).alias("b"),
        U.url_hash64(F.col("url")).alias("x"),
    ).first()
    assert row.h == "host001.example.vn"
    assert row.c == "Nghi-dinh"
    assert row.p == 1
    assert 0 <= row.b < 8
    assert isinstance(row.x, int)


def test_hash_is_deterministic(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "u string")
    vals = [r[0] for r in df.select(U.url_hash64(F.col("u"))).collect()]
    assert vals[0] == vals[1] != vals[2]


def test_canonicalize_is_idempotent(spark):
    """Property (hypothesis-generated messy URLs): canonicalize ∘
    canonicalize == canonicalize — the dedup invariant: a re-discovered
    already-canonical URL must hash identically."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS"])
    host = st.sampled_from(["Example.VN", "host001.example.vn", "WWW.TVPL.vn"])
    port = st.sampled_from(["", ":80", ":443", ":8443"])
    path = st.lists(
        st.sampled_from(["a", "b", "van-ban", "Nghi-dinh", "doc-7.aspx", ""]),
        min_size=0, max_size=4,
    ).map(lambda xs: "/" + "/".join(xs))
    tail = st.sampled_from(["", "?", "?x=1", "#f", "?x=1#f", "  "])
    urls = st.tuples(scheme, host, port, path, tail).map(
        lambda t: f" {t[0]}://{t[1]}{t[2]}{t[3]}{t[4]}"
    )

    collected: list[str] = []

    @settings(max_examples=60, deadline=None)
    @given(urls)
    def gather(u):
        collected.append(u)

    gather()
    df = spark.createDataFrame([(u,) for u in set(collected)], "url string")
    once = df.select(U.canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select("c1", U.canonicalize_url(F.col("c1")).alias("c2"))
    bad = twice.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, f"not idempotent for: {[(r.c1, r.c2) for r in bad[:5]]}"
