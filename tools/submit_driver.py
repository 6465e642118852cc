"""spark-submit driver: run crawl epochs on an existing SparkSession.

Usage (via tools/submit.sh):
    tools/submit.sh [warehouse_root] [max_epochs]
The library arrives via --py-files; this file only wires the session.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tvpl_submit_wh"
    max_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = SparkSession.builder.appName("tvpl-crawl-submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from thuvienphapluat_crawler_spark.plans.frontier import CrawlEngine
    from thuvienphapluat_crawler_spark.sources.synthetic_web import World

    world = World(n_hosts=8, base_size=200, links_per_page=4, budget_per_host=20, max_epochs=max_epochs)
    engine = CrawlEngine(spark, world, root, n_buckets=8)
    last = engine.run(max_epochs=max_epochs)
    n = engine.crawl_log().count()
    docs = engine.docs().count()
    print(f"crawl complete: epochs<= {last}, urls fetched={n}, docs={docs}, warehouse={root}")
    spark.stop()


if __name__ == "__main__":
    main()
