"""Skew handling: salted repartitioning (north_rule) as reusable operators.

AQE's skew-join splitting handles most cases at runtime; these explicit
salting forms cover the two places AQE can't: (a) a hash AGGREGATION on
a Zipf-hot key (one reducer owns the hot host), and (b) a join where the
hot key's build rows must be replicated. Salts are DERIVED (hash of a
unique column mod S), never rand() — determinism survives retries and
parallelism changes.

Reference analogue: the reference has no parallelism at all (SURVEY §4
"skew handling: absent"); at 10^10-URL scale host-skew is the dominant
risk (FIXTURES.md Zipf worlds), so the engine owns it explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGEABLE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "avg": None,  # decomposed into sum+count partials, merged as sum/sum
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str | Column,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a skewed key: partial agg on
    (keys, salt) spreads the hot key over `buckets` reducers, final agg
    merges partials. aggs: out_name -> (fn, in_col) with fn in
    sum|count|avg|min|max (algebraic → partials merge exactly).
    'count' means count(*) (rows, NULLs included — matching SQL
    count(*)); 'avg' is decomposed into sum+count(col) partials so the
    merged mean is exact (and NULL-skipping, matching SQL avg).
    """
    salt = F.pmod(F.hash(salt_col if isinstance(salt_col, Column) else F.col(salt_col)), F.lit(buckets))
    partial_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}_s"))
            partial_exprs.append(F.count(col).alias(f"_p_{out}_n"))
        else:
            partial_exprs.append(MERGEABLE[fn](col).alias(f"_p_{out}"))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    final_exprs = []
    for out, (fn, _col) in aggs.items():
        if fn == "avg":
            final_exprs.append((F.sum(f"_p_{out}_s") / F.sum(f"_p_{out}_n")).alias(out))
        else:
            final_exprs.append(MERGEABLE[fn](f"_p_{out}").alias(out))
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: str,
    buckets: int = 16,
) -> DataFrame:
    """Skewed equi-join: the big (probe) side is salted by a derived hash
    of `salt_source` (a unique-ish big-side column); the small (build)
    side is replicated across all salt buckets. Join key becomes
    (key, salt) → the hot key's rows spread over `buckets` tasks.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_source)), F.lit(buckets))
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_big.join(replicated, [key, "_salt"]).drop("_salt")
