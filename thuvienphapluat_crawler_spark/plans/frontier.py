"""The crawl engine: window-ranked frontier generations with politeness,
bloom-prefiltered exact dedup, interleaved span emission, and atomic
epoch commits with per-partition lineage + metrics.

One epoch (the distributed generalization of the reference's sequential
URL→fetch→extract→write pipeline, pipeline.py:387-435, and its per-page
checkpoint loop, ocr/ocr_pdf.py:158-195):

  frontier ──anti-join log──▶ pending ──window rank──▶ budgeted batch
      │                                                     │
      │                              groupBy(host).applyInPandas (politeness:
      │                              one task per host, virtual-clock slots)
      │                                                     ▼
      │                                   crawl_log (status, attempts, slot)
      │                                           ok rows ──┬─ parse → spans → docs
      │                                                     └─ outlinks
      │                                                          ▼
      seen ◀──bloom prefilter + exact left-anti join── candidate URLs
      frontier += confirmed-new (depth+1, discovered_epoch = e+1)
      checkpoints += per-bucket metrics;  ONE atomic manifest commit

Scale notes (the 100 TB story):
  * frontier/seen deltas are written partitioned by host_bucket → epoch
    reads prune to live buckets; the rank window shuffles on host once.
  * the seen anti-join keys on url_fp — at 10^10 rows AQE picks
    sort-merge and splits skewed buckets; the bloom prefilter removes
    the vast majority of candidates BEFORE that shuffle (negatives are
    guaranteed-new, no join needed).
  * politeness = groupBy(host) → exactly one concurrent task per host;
    Zipf-hot hosts bound epoch duration via the budget, not via a
    straggler task fetching the whole host.
  * all Python stages are Arrow-batched pandas UDFs (fetch simulation,
    parse, bloom) — no row-at-a-time UDFs anywhere.
  * determinism: every ordering is (category_priority, depth, url_fp) —
    no wall clock, no task-order dependence; the same world crawls
    identically at local[2] and local[32] (tested).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import urls as U
from ..operators import bloom as B
from ..sources import synthetic_web as SW
from .warehouse import SnapshotWarehouse

FRONTIER_SCHEMA = (
    "canonical_url string, url_fp string, url_hash long, host string, host_bucket int, "
    "category string, category_priority int, depth int, discovered_epoch int"
)
CRAWL_LOG_SCHEMA = (
    FRONTIER_SCHEMA
    + ", epoch int, rank int, fetch_slot double, status string, attempts int, cookie_header string"
)
SPAN_ROW_SCHEMA = "doc_id string, canonical_url string, kind string, text string, media_ref string, offset int"
OUTLINK_SCHEMA = "out_url string, src_depth int"
CHECKPOINT_SCHEMA = (
    "partition_id int, epoch int, n_ranked long, n_fetched long, n_ok long, n_error long, "
    "n_attempts long, n_candidates long, n_new long, max_fetch_slot double, lineage string"
)


def _doc_id_for(url: str) -> str:
    """Filename-style doc id (reference sanitization: pipeline.py:426-428)."""
    h, category, n = SW.parse_url_parts(url)
    return f"{category}_doc-{n}_host{h:03d}".replace(" ", "_").replace("/", "-")


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        world: SW.World,
        root: str,
        n_buckets: int = 8,
        seeds_per_host: int = 2,
        filter_kind: str = "bloom",
        content: str = "spans",
        robots: bool = False,
    ):
        self.spark = spark
        self.world = world
        self.wh = SnapshotWarehouse(root)
        self.n_buckets = n_buckets
        self.seeds_per_host = seeds_per_host
        self.filter_kind = filter_kind  # 'bloom' | 'cuckoo' (same interface)
        # robots=True: per-host robots.txt TEXT is parsed (sources/robots)
        # into a broadcast rule dim; disallowed URLs are filtered out of
        # every epoch's batch BEFORE ranking, and the fetch stage takes
        # its crawl-delay FROM the parsed Crawl-delay line (north_rule:
        # politeness enforces "crawl-delay and robots.txt rules").
        self.robots = robots
        # 'spans': fetch emits pre-structured spans (synthetic shortcut);
        # 'html': fetch emits RAW HTML and the extract stage is the real
        # DOM pipeline (sources/html_parse.py — parse, tooltip/footnote
        # joins, Điều normalization, line merge), per pipeline.py:216-322
        self.content = content

    # -- frontier-row construction (shared by seeds and discovered links) --

    def _frontier_cols(self, df: DataFrame, depth_col: str, epoch: int) -> DataFrame:
        url = F.col("canonical_url")
        return df.select(
            url,
            F.md5(url).alias("url_fp"),
            F.xxhash64(url).alias("url_hash"),
            U.url_host(url).alias("host"),
            U.host_bucket(U.url_host(url), self.n_buckets).alias("host_bucket"),
            U.url_category(url).alias("category"),
            U.category_priority(U.url_category(url)).alias("category_priority"),
            F.col(depth_col).cast("int").alias("depth"),
            F.lit(epoch).cast("int").alias("discovered_epoch"),
        )

    def bootstrap(self) -> None:
        """Epoch 0: seeds → frontier + bloom, one atomic commit. (The
        seen set IS the frontier projected to its identity columns —
        frontier rows are inserted exactly once — so no separate seen
        table is written; see seen().)"""
        if self.wh.last_epoch() >= 0:
            return
        seeds = SW.seed_urls(self.world, self.seeds_per_host)
        raw = self.spark.createDataFrame([(u,) for u in seeds], "canonical_url string")
        fr = self._frontier_cols(raw.withColumn("depth", F.lit(0)), "depth", 0)
        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [
                pool.submit(self.wh.stage, "frontier", 0, fr.repartition(self.n_buckets, "host_bucket")),
                pool.submit(self._bloom_update, fr, 0),
            ]
            for f in futs:
                f.result()
        self.wh.commit_epoch(0, ["frontier"], lineage={"seeds": len(seeds)})

    def _cookie_dim(self) -> DataFrame:
        """Per-host cookie dimension (S1 output shape) broadcast-joined
        into the fetch stage — the reference injects file-loaded cookies
        into every fetch (crawler.py:62-70, pipeline.py:114-117). Tiny
        table (one row per host) → broadcast, never a shuffle."""
        rows = [
            (SW.host_name(h), SW.host_cookie_header(h))
            for h in range(self.world.n_hosts)
            if SW.host_cookie_header(h)
        ]
        return self.spark.createDataFrame(rows or [("", "")], "host string, cookie_header string")

    def _robots_rules(self) -> DataFrame:
        """Broadcast rule dimension: each host's robots.txt TEXT parsed by
        the real RFC 9309 parser inside one mapInPandas (sources/robots).
        Tiny (hosts × ~2 rules) — cached on first use."""
        if getattr(self, "_robots_rules_df", None) is None:
            from ..sources.robots import rules_from_robots_txt

            txt = self.spark.createDataFrame(
                [(SW.host_name(h), SW.host_robots_txt(h)) for h in range(self.world.n_hosts)],
                "host string, robots_txt string",
            )
            self._robots_rules_df = rules_from_robots_txt(txt, agent=SW.ROBOTS_AGENT).localCheckpoint()
        return self._robots_rules_df

    # -- pandas-UDF stages ------------------------------------------------

    def _fetch_group_fn(self, epoch: int):
        world = self.world

        def fetch(pdf: pd.DataFrame) -> pd.DataFrame:
            # One host per group → politeness is structural. Virtual-clock
            # slots replace sleep() (upload_documents.py:129) so the
            # schedule is deterministic and benchable.
            pdf = pdf.sort_values("rank").reset_index(drop=True)
            h_idx, _, _ = SW.parse_url_parts(pdf["canonical_url"].iloc[0])
            if "robots_delay" in pdf.columns:  # robots mode: delay comes
                rd = pdf["robots_delay"].iloc[0]  # from robots.txt
                # A host whose robots.txt has no Crawl-delay (or that is
                # absent from the rules dim) arrives as null/NaN — fall
                # back to the default per-host delay, never NaN slots.
                delay = float(rd) if rd is not None and not np.isnan(rd) else SW.crawl_delay(h_idx)
                pdf = pdf.drop(columns=["robots_delay"])
            else:
                delay = SW.crawl_delay(h_idx)
            pdf["fetch_slot"] = (pdf["rank"] - 1).astype("float64") * delay
            outcomes = [SW.fetch_attempts(u) for u in pdf["canonical_url"]]
            pdf["status"] = [o[0] for o in outcomes]
            pdf["attempts"] = np.int32([o[1] for o in outcomes])
            pdf["epoch"] = np.int32(epoch)
            return pdf

        return fetch

    @staticmethod
    def _parse_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Fetched page → interleaved span rows (the extract stage,
        pipeline.py:216-322 re-expressed; content from the synthetic web)."""
        for pdf in it:
            rows = []
            for url in pdf["canonical_url"]:
                doc_id = _doc_id_for(url)
                for kind, text, media_ref, offset in SW.page_spans(url):
                    rows.append((doc_id, url, kind, text, media_ref, offset))
            yield pd.DataFrame(rows, columns=["doc_id", "canonical_url", "kind", "text", "media_ref", "offset"])

    def _html_span_rows(self, ok: DataFrame) -> DataFrame:
        """The real extract path: fetch raw HTML (synthetic DOM twin of
        page_spans), run the DOM pipeline (parse → tooltip/footnote
        joins → Điều normalization → line merge), emit paragraphs as
        text spans. doc_id derives from the URL with column regexes —
        same sanitization as _doc_id_for."""
        from ..sources.html_parse import extract_documents, parse_pages

        def fetch_html(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                yield pd.DataFrame(
                    {"page_url": pdf["canonical_url"], "html": [SW.page_html(u) for u in pdf["canonical_url"]]}
                )

        pages = ok.select("canonical_url").mapInPandas(fetch_html, "page_url string, html string")
        paras = extract_documents(parse_pages(pages, id_col="page_url"))
        url = F.col("doc_id")  # extract keys on the page URL
        derived = F.concat(
            F.regexp_extract(url, r"/van-ban/([^/]+)/", 1),
            F.lit("_doc-"),
            F.regexp_extract(url, r"doc-(\d+)\.aspx", 1),
            F.lit("_host"),
            F.regexp_extract(url, r"host(\d+)\.", 1),
        )
        # merge emits source-line offsets; span offsets are the dense
        # paragraph sequence (0-based), matching the sequential oracle
        w = Window.partitionBy("doc_id").orderBy("para_offset")
        return paras.withColumn("_pi", F.row_number().over(w) - 1).select(
            derived.alias("doc_id"),
            url.alias("canonical_url"),
            F.lit("text").alias("kind"),
            F.col("paragraph").alias("text"),
            F.lit("").alias("media_ref"),
            F.col("_pi").cast("int").alias("offset"),
        )

    def _outlinks_fn(self):
        world = self.world

        def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                rows = []
                for url, depth in zip(pdf["canonical_url"], pdf["depth"]):
                    for out in SW.page_outlinks(url, world):
                        rows.append((out, int(depth)))
                yield pd.DataFrame(rows, columns=["out_url", "src_depth"])

        return gen

    def _bloom_probe_fn(self, up_to_epoch: int):
        root, n = self.wh.root, self.n_buckets

        def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                flags = np.zeros(len(pdf), dtype=bool)
                for b, idx in pdf.groupby("host_bucket").groups.items():
                    keys = pdf.loc[idx, "url_hash"].to_numpy(dtype=np.int64)
                    flags[pdf.index.get_indexer(idx)] = B.probe_bucket(root, int(b), up_to_epoch, keys)
                yield pdf.assign(maybe_seen=flags)

        return probe

    def _bloom_update(self, new_rows: DataFrame, epoch: int) -> None:
        """Distributed bloom update: one applyInPandas task per bucket
        writes its own .npy (atomic rename); buckets with no new keys
        keep their previous file (walk-back read)."""
        root, kind = self.wh.root, self.filter_kind

        def upd(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["host_bucket"].iloc[0])
            B.update_bucket(root, b, epoch, pdf["url_hash"].to_numpy(dtype=np.int64), kind=kind)
            return pd.DataFrame({"host_bucket": [b], "n": [len(pdf)]})

        counts = (
            new_rows.select("host_bucket", "url_hash")
            .groupBy("host_bucket")
            .applyInPandas(upd, "host_bucket int, n long")
        )
        counts.collect()  # action: materialize the writes

    # -- one epoch ---------------------------------------------------------

    def run_epoch(self, epoch: int) -> bool:
        wh, world = self.wh, self.world
        frontier = wh.read(self.spark, "frontier", FRONTIER_SCHEMA)
        log = wh.read(self.spark, "crawl_log", CRAWL_LOG_SCHEMA)

        pending = frontier.join(log.select("canonical_url"), "canonical_url", "left_anti")
        eligible = pending.filter(F.col("discovered_epoch") <= epoch)
        n_blocked = 0
        if self.robots:
            from ..sources.robots import apply_robots

            el = apply_robots(
                eligible.withColumn(
                    "path", F.regexp_extract("canonical_url", r"^[a-z]+://[^/]+(/.*)$", 1)
                ),
                self._robots_rules(),
            ).localCheckpoint()  # 2 consumers: blocked tally + allowed batch
            n_blocked = el.filter(~F.col("allowed")).count()
            eligible = (
                el.filter(F.col("allowed"))
                .withColumnRenamed("crawl_delay", "robots_delay")
                .drop("path", "allowed", "matched_rule")
            )
        w = Window.partitionBy("host").orderBy("category_priority", "depth", "url_fp")
        batch = (
            eligible.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= world.budget_per_host)
            .join(F.broadcast(self._cookie_dim()), "host", "left")
            .withColumn("cookie_header", F.coalesce("cookie_header", F.lit("")))
        )

        fetched = batch.groupBy("host").applyInPandas(
            self._fetch_group_fn(epoch), CRAWL_LOG_SCHEMA
        )
        fetched = fetched.localCheckpoint()  # cut lineage; epoch outputs reuse it
        n_ranked = fetched.count()  # cheap: already materialized
        if n_ranked == 0:
            return False

        ok = fetched.filter(F.col("status") == "ok")
        if self.content == "html":
            span_rows = self._html_span_rows(ok)
        else:
            span_rows = ok.select("canonical_url").mapInPandas(self._parse_fn, SPAN_ROW_SCHEMA)
        docs = (
            span_rows.groupBy("doc_id", "canonical_url")
            .agg(F.collect_list(F.struct("kind", "text", "media_ref", "offset")).alias("_s"))
            .select(
                "doc_id",
                "canonical_url",
                F.expr("array_sort(_s, (a, b) -> a.offset - b.offset)").alias("spans"),
                F.lit(epoch).cast("int").alias("epoch"),
            )
        )

        # The epoch's outputs split into two independent dataflows off the
        # localCheckpoint'ed fetch: (a) parse → docs + the crawl_log copy,
        # (b) outlinks → bloom probe → frontier delta. Each is a chain of
        # small overhead-dominated jobs, so running (a) on a worker thread
        # while the main thread drives (b) overlaps their job latencies
        # (Spark schedules concurrent jobs FIFO; back-fill the tail). The
        # manifest commit still happens strictly after ALL writes land, so
        # atomicity/resume semantics are unchanged.
        pool = ThreadPoolExecutor(max_workers=3)
        early_futs = [
            pool.submit(wh.stage, "crawl_log", epoch, fetched),
            pool.submit(wh.stage, "docs", epoch, docs),
        ]

        links = ok.select("canonical_url", "depth").mapInPandas(self._outlinks_fn(), OUTLINK_SCHEMA)
        # one shuffle, not two: frontier columns are per-URL expressions, so
        # compute them BEFORE the exchange, repartition by host_bucket once,
        # and fold duplicate outlinks (min-depth) colocated — the groupBy
        # keys contain host_bucket, so the agg reuses the repartition
        # layout instead of adding its own url-keyed exchange.
        ann = self._frontier_cols(
            links.withColumnRenamed("out_url", "canonical_url"), "src_depth", epoch + 1
        )
        frontier_cols = [f.split()[0] for f in FRONTIER_SCHEMA.split(", ")]
        id_cols = [c for c in frontier_cols if c != "depth"]
        cands = (
            ann.repartition(self.n_buckets, "host_bucket")
            .groupBy(*id_cols)
            .agg((F.min("depth") + 1).cast("int").alias("depth"))
            .select(*frontier_cols)
        )

        probed = cands.mapInPandas(self._bloom_probe_fn(epoch - 1), FRONTIER_SCHEMA + ", maybe_seen boolean")
        probed = probed.localCheckpoint()
        fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        confirmed = (
            probed.filter(F.col("maybe_seen"))
            .drop("maybe_seen")
            .join(frontier.select("url_fp"), "url_fp", "left_anti")
        )
        new_rows = fresh.unionByName(confirmed).localCheckpoint()

        # per-bucket lineage + metrics (the distributed progress.json,
        # ocr/ocr_pdf.py:77-88,179-195)
        lineage = json.dumps(
            {"epoch": epoch, "bloom_base": epoch - 1, "manifest_epochs": wh.read_manifest()["epochs"]}
        )
        fstats = fetched.groupBy("host_bucket").agg(
            F.count("*").alias("n_fetched"),
            F.sum((F.col("status") == "ok").cast("long")).alias("n_ok"),
            F.sum((F.col("status") == "error").cast("long")).alias("n_error"),
            F.sum("attempts").alias("n_attempts"),
            F.max("fetch_slot").alias("max_fetch_slot"),
            F.count("*").alias("n_ranked"),
        )
        # candidate + new counts in ONE union-based pass (was two
        # aggregations + an extra full_outer join)
        cnstats = (
            probed.select("host_bucket", F.lit(1).alias("_c"), F.lit(0).alias("_n"))
            .unionByName(new_rows.select("host_bucket", F.lit(0).alias("_c"), F.lit(1).alias("_n")))
            .groupBy("host_bucket")
            .agg(F.sum("_c").alias("n_candidates"), F.sum("_n").alias("n_new"))
        )
        checkpoints = (
            fstats.join(cnstats, "host_bucket", "full_outer")
            .select(
                F.col("host_bucket").alias("partition_id"),
                F.lit(epoch).cast("int").alias("epoch"),
                F.coalesce("n_ranked", F.lit(0)).cast("long").alias("n_ranked"),
                F.coalesce("n_fetched", F.lit(0)).cast("long").alias("n_fetched"),
                F.coalesce("n_ok", F.lit(0)).cast("long").alias("n_ok"),
                F.coalesce("n_error", F.lit(0)).cast("long").alias("n_error"),
                F.coalesce("n_attempts", F.lit(0)).cast("long").alias("n_attempts"),
                F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
                F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
                F.coalesce("max_fetch_slot", F.lit(0.0)).alias("max_fetch_slot"),
                F.lit(lineage).alias("lineage"),
            )
        )

        try:
            futs = early_futs + [
                pool.submit(wh.stage, "frontier", epoch, new_rows.repartition(self.n_buckets, "host_bucket")),
                pool.submit(wh.stage, "checkpoints", epoch, checkpoints),
                pool.submit(self._bloom_update, new_rows, epoch),
            ]
            for f in futs:
                f.result()  # propagate the first failure, never commit partial
        finally:
            pool.shutdown(wait=True)
        wh.commit_epoch(
            epoch,
            ["crawl_log", "docs", "frontier", "checkpoints"],
            lineage={"n_ranked": n_ranked, "n_robots_blocked": n_blocked},
        )
        return True

    def run(self, max_epochs: int | None = None) -> int:
        """Bootstrap if needed, then run epochs until the frontier drains
        or max_epochs; RESUMES from the last committed epoch (the
        progress.json semantics: max(last+1, start), ocr_pdf.py:135)."""
        self.bootstrap()
        max_epochs = max_epochs or self.world.max_epochs
        e = self.wh.last_epoch() + 1
        while e <= max_epochs:
            if not self.run_epoch(e):
                break
            e += 1
        return e - 1

    # -- results for assertions/bench --------------------------------------

    def crawl_log(self) -> DataFrame:
        return self.wh.read(self.spark, "crawl_log", CRAWL_LOG_SCHEMA)

    def seen(self) -> DataFrame:
        """The URL-seen set: the frontier projected to identity columns
        (frontier rows are inserted exactly once, so the projection IS
        the seen table — one fewer parquet write per epoch)."""
        return self.wh.read(self.spark, "frontier", FRONTIER_SCHEMA).select(
            "url_fp", "url_hash", "canonical_url", "host_bucket"
        )

    def docs(self) -> DataFrame:
        return self.wh.read(self.spark, "docs", "doc_id string, canonical_url string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, epoch int")

    def checkpoints(self) -> DataFrame:
        return self.wh.read(self.spark, "checkpoints", CHECKPOINT_SCHEMA)


def frontier_scale_job(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int = 997,
    budget_per_host: int = 1 << 30,
    with_fetch: bool = True,
) -> int:
    """One full frontier generation over n_urls synthetic URLs — the
    CPU-bound scaling workload for the N-vs-4N-parallelism evidence
    (BASELINE.json north metric: URLs fetched+deduped/sec).

    Pipeline (the engine's per-epoch dataflow, minus bookkeeping):
      generate raw URLs (20% duplicated — dedup has real work)
        → canonicalize (regex chain) → xxhash64
        → exact dedup (groupBy url_hash)
        → anti-join a 10%-of-space seen set
        → per-host window rank (category_priority, depth, url_hash)
        → politeness fetch slots
        → fetch+parse (Arrow-batched pandas stage: retry simulation,
          interleaved span extraction, content fingerprint)
        → per-host aggregate

    Shuffle hygiene: everything that crosses a shuffle is 4 narrow ints —
    the URL string is re-derived inside the parse stage, never shuffled.

    Returns the number of URLs fetched (actions the whole plan).
    """
    ids = spark.range(0, n_urls).select(
        (F.col("id") % int(n_urls * 0.8)).alias("k")  # 20% dup rate
    )
    host_n = F.pmod(F.hash(F.col("k").cast("string")), F.lit(n_hosts))
    doc_n = F.pmod(F.hash(F.concat(F.lit("d"), F.col("k").cast("string"))), F.lit(1_000_000))
    cat = F.element_at(
        F.array(*[F.lit(c) for c in SW.CATEGORIES]), (F.pmod(doc_n, F.lit(5)) + 1).cast("int")
    )
    raw = ids.select(
        F.concat(
            F.lit("HTTPS://Host"),
            F.format_string("%03d", host_n),
            F.lit(".Example.VN:443/van-ban/"),
            cat,
            F.lit("/doc-"),
            doc_n.cast("string"),
            F.lit(".aspx#section"),
        ).alias("raw_url"),
        F.pmod(F.col("k"), F.lit(6)).cast("int").alias("depth"),
    )
    url = U.canonicalize_url(F.col("raw_url"))
    fr = raw.select(
        F.xxhash64(url).alias("url_hash"),
        F.regexp_extract(url, r"host(\d+)\.", 1).cast("int").alias("host_n"),
        F.regexp_extract(url, r"doc-(\d+)\.aspx", 1).cast("int").alias("doc_n"),
        U.category_priority(U.url_category(url)).alias("category_priority"),
        F.col("depth"),
    )
    deduped = fr.groupBy("url_hash").agg(
        F.first("host_n").alias("host_n"),
        F.first("doc_n").alias("doc_n"),
        F.first("category_priority").alias("category_priority"),
        F.min("depth").alias("depth"),
    )
    # seen-set membership: the 10%-of-space "seen" predicate is derivable
    # from the key itself here, so it stays a filter (the real engine's
    # seen set is external state → bloom prefilter + left-anti join in
    # run_epoch; that join is exercised there and in seen_antijoin)
    pending = deduped.filter(F.pmod(F.col("url_hash"), F.lit(10)) != 0)
    w = Window.partitionBy("host_n").orderBy("category_priority", "depth", "url_hash")
    ranked = (
        pending.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= budget_per_host)
        .withColumn(
            "fetch_slot",
            (F.col("rank") - 1).cast("double") * (1.0 + F.pmod(F.col("host_n"), F.lit(3)).cast("double")),
        )
    )
    if not with_fetch:
        out = ranked.groupBy("host_n").agg(F.count("*").alias("n"), F.max("fetch_slot").alias("max_slot"))
        return out.agg(F.sum("n")).collect()[0][0]

    # MinHash permutation constants (content near-dup sketch per page)
    from ..operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    def fetch_parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # The engine's full per-document work: fetch simulation (retry
        # semantics), interleaved span extraction, content fingerprint,
        # MinHash signature + SimHash sketch over token hashes — i.e.
        # what a training-data crawl actually computes per page.
        # Token→(minhash contribution, simhash bits) is MEMOIZED across
        # the task's whole input: corpus vocabularies are Zipfian, so
        # the md5 + per-token matrix work collapses to a dict hit for
        # all but first occurrences (values identical to the direct
        # formula — tested in test_skew_and_state).
        import hashlib

        a0, b0 = int(MINHASH_A[0]), int(MINHASH_B[0])
        bit_idx = np.arange(32)
        bitpow = 1 << np.arange(32, dtype=np.int64)
        tok_ix: dict[str, int] = {}
        s0_rows: list[int] = []
        bit_rows: list[np.ndarray] = []
        S0 = np.empty(0, dtype=np.int64)
        B = np.empty((0, 32), dtype=np.int64)

        def tok_index(t: str) -> int:
            i = tok_ix.get(t)
            if i is None:
                h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                tok_ix[t] = i = len(s0_rows)
                s0_rows.append(((h % MINHASH_P) * a0 + b0) % MINHASH_P)
                bit_rows.append((((h >> bit_idx) & 1) * 2 - 1).astype(np.int64))
            return i

        for pdf in it:
            m = len(pdf)
            ok = np.empty(m, dtype=bool)
            n_spans = np.zeros(m, dtype=np.int64)
            total_len = np.zeros(m, dtype=np.int64)
            sig0 = np.zeros(m, dtype=np.int64)
            simhash = np.zeros(m, dtype=np.int64)
            for i, (h, n) in enumerate(zip(pdf["host_n"], pdf["doc_n"])):
                u = SW.make_url(int(h), int(n))
                status, _ = SW.fetch_attempts(u)
                ok[i] = status == "ok"
                if not ok[i]:
                    continue
                spans = SW.page_spans(u)
                n_spans[i] = len(spans)
                text = " ".join(s[1] for s in spans if s[0] == "text")
                total_len[i] = len(text)
                idx = [tok_index(t) for t in set(text.split())]
                if len(s0_rows) > len(S0):  # vocab grew: rebuild the memo
                    S0 = np.array(s0_rows, dtype=np.int64)  # matrices (rare
                    B = np.vstack(bit_rows)  # after the first few docs)
                sig0[i] = int(S0[idx].min())
                simhash[i] = int((B[idx].sum(axis=0) > 0).astype(np.int64) @ bitpow)
            yield pd.DataFrame(
                {
                    "host_n": pdf["host_n"],
                    "ok": ok,
                    "n_spans": n_spans,
                    "total_len": total_len,
                    "sig0": sig0,
                    "simhash": simhash,
                }
            )

    parsed = ranked.select("host_n", "doc_n").mapInPandas(
        fetch_parse, "host_n int, ok boolean, n_spans long, total_len long, sig0 long, simhash long"
    )
    out = parsed.groupBy("host_n").agg(
        F.count("*").alias("n"),
        F.sum("n_spans").alias("spans"),
        F.sum("total_len").alias("chars"),
        F.approx_count_distinct("simhash").alias("distinct_sketches"),
    )
    return out.agg(F.sum("n")).collect()[0][0]
