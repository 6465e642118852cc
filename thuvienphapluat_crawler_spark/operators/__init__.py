from . import dedup, similarity, spans, textstats  # noqa: F401
