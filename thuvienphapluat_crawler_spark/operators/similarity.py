"""Similarity search over an embedding column (array<float>).

Two paths:
  brute force — exact cosine top-k. The queries side is tiny (top-k for a
      handful of probes) → broadcast the queries, stream the corpus once:
      cost O(|corpus|·|queries|·dim) with NO shuffle of the corpus.
  LSH (random hyperplanes) — sign-bit bucket per vector from D seeded
      hyperplanes; candidates share a bucket → top-k within bucket. The
      scale path: one narrow map to bucket ids, then a bucket-equi-join.

Cosine is computed with explicit fold arithmetic (dot/(√aa·√bb)) in
float64, summing in index order, so a SQL oracle (list_inner_product)
reproduces it bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_PLANES = 8
LSH_DIM = 64

_rng = np.random.RandomState(7)
# fixed hyperplanes, embedded as literals (same constants go into the SQL oracle)
HYPERPLANES: list[list[float]] = [
    [round(float(v), 6) for v in _rng.randn(LSH_DIM)] for _ in range(LSH_PLANES)
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the probe set against the corpus."""
    vecs = emb.select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("ne"))
    queries = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qe"))
    )
    sims = (
        vecs.join(F.broadcast(queries), F.col("nid") != F.col("qid"))
        .withColumn("sim", F.round(cosine(F.col("qe"), F.col("ne")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "nid")
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("qid").alias("query_id"), F.col("nid").alias("neighbor_id"), F.col("rnk").alias("rank"))
    )


def lsh_bucket(vec: Column) -> Column:
    """Random-hyperplane signature: bit p set iff <v, plane_p> > 0."""
    sig = F.lit(0)
    for p, plane in enumerate(HYPERPLANES):
        plane_col = F.array(*[F.lit(x) for x in plane])
        sig = sig + F.when(_dot(vec, plane_col) > 0, F.lit(2**p)).otherwise(F.lit(0))
    return sig


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's LSH
    bucket. One narrow bucket-id projection + bucket equi-join — the
    shape that survives 10^9-vector corpora (bucket is the shuffle key)."""
    vecs = emb.select(
        F.col(id_col).alias("nid"),
        as_double(F.col(vec_col)).alias("ne"),
    ).withColumn("bucket", lsh_bucket(F.col("ne")))
    queries = (
        vecs.filter(F.col("nid").isin(query_ids))
        .select(F.col("nid").alias("qid"), F.col("ne").alias("qe"), "bucket")
    )
    sims = (
        vecs.join(F.broadcast(queries), "bucket")
        .filter(F.col("nid") != F.col("qid"))
        .withColumn("sim", F.round(cosine(F.col("qe"), F.col("ne")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "nid")
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("qid").alias("query_id"), F.col("nid").alias("neighbor_id"), F.col("rnk").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Multi-table LSH — the production ANN shape. A single P-plane table has
# 2^P buckets; at 10^9 vectors each bucket still holds millions AND true
# neighbors split across bucket boundaries cost recall. L independent
# tables with fewer planes each: a candidate is anything sharing ANY
# table's bucket with the query — recall ≈ 1-(1-p^P)^L instead of p^P —
# and the per-table bucket key remains the shuffle key (cost is L narrow
# projections + L bucket equi-joins, still never O(n²)).
# ---------------------------------------------------------------------------

LSH_TABLES = 4
LSH_PLANES_PER_TABLE = 6

# Plane-count picks the precision/recall point: FEW planes per table →
# big recall-oriented buckets (kNN candidates); MANY planes → tiny
# precision-oriented buckets where only near-identical vectors collide
# (near-dup detection). 6 planes over 6k vectors ≈ 94/bucket — fine for
# top-k search, quadratic poison for all-pairs near-dup verification.
NEARDUP_TABLES = 2
NEARDUP_PLANES_PER_TABLE = 12


def _make_hyperplanes(n_tables: int, n_planes: int, seed: int) -> list[list[list[float]]]:
    rng = np.random.RandomState(seed)
    return [
        [[round(float(v), 6) for v in rng.randn(LSH_DIM)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


HYPERPLANE_TABLES: list[list[list[float]]] = _make_hyperplanes(LSH_TABLES, LSH_PLANES_PER_TABLE, 1234)
NEARDUP_HYPERPLANES: list[list[list[float]]] = _make_hyperplanes(NEARDUP_TABLES, NEARDUP_PLANES_PER_TABLE, 4321)


def planes_bucket(vec: Column, planes: list[list[float]]) -> Column:
    sig = F.lit(0)
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        sig = sig + F.when(_dot(vec, plane_col) > 0, F.lit(2**p)).otherwise(F.lit(0))
    return sig


def lsh_table_bucket(vec: Column, table: int) -> Column:
    return planes_bucket(vec, HYPERPLANE_TABLES[table])


def lsh_multitable_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with L independent hash tables: candidate set =
    union over tables of the query's bucket mates; exact cosine on the
    DISTINCT candidates only. The bucket projections are narrow
    (id + L ints); the 64-dim vectors join in once, at the end, keyed on
    the candidate id — vectors never fan out L-fold."""
    vecs = emb.select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("ne"))
    buckets = vecs.select(
        "nid", *[lsh_table_bucket(F.col("ne"), t).alias(f"b{t}") for t in range(LSH_TABLES)]
    )
    narrow = buckets.select(
        "nid",
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("b")) for t in range(LSH_TABLES)])
        ).alias("tb"),
    ).select("nid", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    qn = narrow.filter(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("qid"), "t", "b"
    )
    cand = (
        narrow.join(F.broadcast(qn), ["t", "b"])
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid")
        .distinct()
    )
    queries = vecs.filter(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("qid"), F.col("ne").alias("qe")
    )
    sims = (
        cand.join(vecs, "nid")
        .join(F.broadcast(queries), "qid")
        .withColumn("sim", F.round(cosine(F.col("qe"), F.col("ne")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "nid")
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("qid").alias("query_id"), F.col("nid").alias("neighbor_id"), F.col("rnk").alias("rank"))
    )


# Probe radius for emb_knn_multiprobe (and its oracle — the mask list is
# shared). r04 measured flip<=1: recall@5 0.25→0.68 at 1x index cost;
# r05 measured flip<=2 (22 probes/table, still tiny vs 5x more tables).
MULTIPROBE_MAX_FLIPS = 1


def probe_masks(n_planes: int, max_flips: int) -> list[int]:
    """All XOR masks of popcount <= max_flips over n_planes sign bits —
    the multi-probe perturbation set (bucket ids at Hamming distance
    <= max_flips from the query's own signature)."""
    from itertools import combinations

    return [
        sum(2**p for p in combo)
        for r in range(max_flips + 1)
        for combo in combinations(range(n_planes), r)
    ]


def lsh_multiprobe_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_flips: int = MULTIPROBE_MAX_FLIPS,
) -> DataFrame:
    """Multi-probe LSH (the Lv et al. VLDB'07 idea on sign-LSH): the
    corpus index is UNCHANGED — same L tables, same bucket projections —
    but each query also probes every bucket within Hamming distance
    max_flips of its own signature. Near neighbors that fell a sign-bit
    or two across a boundary become candidates without building more
    tables; the extra cost is probe rows only (|Q|·L·Σ C(P,f) narrow
    rows, still broadcast). Recall tail fix for the random-top-k probes
    the single-bucket variant misses."""
    vecs = emb.select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("ne"))
    buckets = vecs.select(
        "nid", *[lsh_table_bucket(F.col("ne"), t).alias(f"b{t}") for t in range(LSH_TABLES)]
    )
    narrow = buckets.select(
        "nid",
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("b")) for t in range(LSH_TABLES)])
        ).alias("tb"),
    ).select("nid", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    masks = probe_masks(LSH_PLANES_PER_TABLE, max_flips)
    probes = (
        narrow.filter(F.col("nid").isin(query_ids))
        .select(F.col("nid").alias("qid"), "t", "b")
        .select(
            "qid", "t",
            F.explode(F.array(*[F.col("b").bitwiseXOR(F.lit(m)) for m in masks])).alias("b"),
        )
    )
    cand = (
        narrow.join(F.broadcast(probes), ["t", "b"])
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid")
        .distinct()
    )
    queries = vecs.filter(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("qid"), F.col("ne").alias("qe")
    )
    sims = (
        cand.join(vecs, "nid")
        .join(F.broadcast(queries), "qid")
        .withColumn("sim", F.round(cosine(F.col("qe"), F.col("ne")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "nid")
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("qid").alias("query_id"), F.col("nid").alias("neighbor_id"), F.col("rnk").alias("rank"))
    )
