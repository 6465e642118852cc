"""PySpark-native crawl/analytics engine.

A from-scratch re-expression of the capabilities of
johnPa02/thuvienphapluat-crawler (see /root/reference, SURVEY.md) as an
idiomatic Spark engine: DataFrame/SQL plans optimized by Catalyst,
vectorized pandas/Arrow UDFs only where Python is genuinely needed
(parse state machines, bloom filters, simulated fetch), snapshot-committed
parquet tables standing in for Iceberg, and explicit partitioning /
broadcast / skew decisions for 100 TB-scale inputs.
"""

__version__ = "0.1.0"
