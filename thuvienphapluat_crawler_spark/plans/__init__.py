from . import crawl_oracle, frontier, warehouse  # noqa: F401
