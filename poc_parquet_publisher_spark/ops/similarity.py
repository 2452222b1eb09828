"""Similarity search over an embedding column (array<float>).

Two tiers, per SURVEY.md section 2.4:

- ``brute_force_topk``: exact cosine top-k. The *query* side is broadcast
  (it is small by construction); the corpus side streams through a single
  narrow pass -- no shuffle of the corpus, work is O(|corpus| * |queries|)
  but embarrassingly parallel. This is the correctness baseline and is
  perfectly reasonable at 100 TB when |queries| is bounded (the broadcast
  keeps the big side shuffle-free).
- ``lsh_topk`` (random hyperplane LSH): the scale path. Signatures are a
  narrow map over the corpus; candidate generation is an equi-join on
  (band, signature) buckets, so the corpus is hash-partitioned by bucket
  instead of cross-joined. Recall is tuned by (n_planes, n_bands).

All vector math stays in Spark's built-in higher-order functions
(zip_with/aggregate), i.e. JVM codegen -- no Python in the hot path.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str, out: str = "nrm") -> DataFrame:
    v = _as_double(vec_col)
    return df.withColumn("__v", v).withColumn(
        out, F.sqrt(_dot(F.col("__v"), F.col("__v")))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, sim).

    ``queries`` is broadcast; ranking is row_number over (sim desc, id) so
    results are total-ordered and deterministic.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("c_v"),
        F.col("nrm").alias("c_nrm"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    sim = _dot(F.col("q_v"), F.col("c_v")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", sim)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("sim", 4).alias("sim"),
        )
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold.

    Correctness-tier implementation (O(n^2) pair scan with the smaller side
    broadcast); at scale, route candidates through ``lsh_topk`` buckets
    instead and only score within-bucket pairs.
    """
    n = with_norm(df, vec_col)
    a = n.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("va"), F.col("nrm").alias("na")
    )
    b = n.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("vb"), F.col("nrm").alias("nb")
    )
    sim = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(sim, 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes from md5 (no RNG state --
    reproducible across sessions, which Spark's rand() is not across
    retries)."""
    planes: list[list[float]] = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            u1 = (int.from_bytes(h[:8], "big") + 1) / (2**64 + 2)
            u2 = (int.from_bytes(h[8:], "big") + 1) / (2**64 + 2)
            # Box-Muller
            row.append(
                math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2)
            )
        planes.append(row)
    return planes


def lsh_signature(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    out: str = "sig",
) -> DataFrame:
    """Random-hyperplane signature: ``n_planes``-char bitstring per row."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = _as_double(vec_col)
    bits = [
        F.when(
            _dot(v, F.array(*[F.lit(x) for x in plane])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return df.withColumn(out, F.concat(*bits))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 3,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share >= 1 LSH band, scored exactly.

    The corpus is hash-partitioned by (band_idx, band_bits) -- an equi-join,
    not a cross join. Increasing n_bands raises recall at the cost of more
    candidates; n_planes controls bucket granularity.
    """
    band_w = n_planes // n_bands

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        sig = lsh_signature(df, vec_col, dim, n_planes, seed)
        n = with_norm(sig, vec_col)
        return n.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col("__v").alias(f"{prefix}_v"),
            F.col("nrm").alias(f"{prefix}_nrm"),
            F.explode(
                F.array(
                    *[
                        F.concat(
                            F.lit(f"{i}:"),
                            F.substring("sig", i * band_w + 1, band_w),
                        )
                        for i in range(n_bands)
                    ]
                )
            ).alias("band"),
        )

    c = banded(corpus, "c")
    q = banded(queries, "q")
    cand = (
        q.join(c, "band")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", "q_v", "c_v", "q_nrm", "c_nrm")
        .distinct()
    )
    sim = _dot(F.col("q_v"), F.col("c_v")) / (F.col("q_nrm") * F.col("c_nrm"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "rank",
            F.round("sim", 4).alias("sim"),
        )
    )
