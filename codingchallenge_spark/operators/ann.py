"""Similarity search over embedding columns (array<float>).

Two paths, per the scale playbook:
- brute_force_topk: exact cosine top-k. Query side broadcast; corpus scanned
  once; per-query ranking via window. Baseline + oracle for the ANN path.
- lsh_topk: sign-random-projection LSH — seeded hyperplanes (numpy, one
  Arrow crossing to compute sketch bits), bucket self-join on band keys, exact
  cosine re-rank inside buckets. At 100 TB the bucket join shuffles only
  colliding candidates instead of the full cross product.

Cosine is computed with JVM higher-order functions on double-cast arrays
(deterministic sequential fold — bit-identical to the DuckDB oracle SQL).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_sim(a: Column, b: Column) -> Column:
    """Exact cosine over two array<float|double> columns, JVM-side.

    Arrays are cast to double BEFORE any arithmetic so every product/sum is a
    double op — the same sequence DuckDB executes for the oracle SQL.
    """
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    denom = na * nb
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries is assumed small (it is broadcast); corpus is scanned once.
    Returns [query_id, neighbor_id, cos, rank] with deterministic tie-break
    (rounded cosine desc, neighbor id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_sim(F.col("_cvec"), F.col("_qvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _plane_matrix(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def add_lsh_sketch(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Append `bands` LSH band keys: sign bits of dot products with seeded
    random hyperplanes, sliced into bands. One mapInPandas-free Arrow
    crossing (scalar pandas UDF on the vector column)."""
    rows_per_band = n_planes // bands

    @F.pandas_udf("array<string>")
    def sketch(vecs: pd.Series) -> pd.Series:
        mats: dict[int, np.ndarray] = {}
        out = []
        for v in vecs:
            if v is None or len(v) == 0:
                out.append(["empty"] * bands)
                continue
            d = len(v)
            if d not in mats:
                mats[d] = _plane_matrix(d, n_planes, seed)
            bits = (np.asarray(v, dtype=np.float64) @ mats[d]) > 0
            out.append(
                [
                    f"b{bi}:" + "".join(
                        "1" if x else "0"
                        for x in bits[bi * rows_per_band : (bi + 1) * rows_per_band]
                    )
                    for bi in range(bands)
                ]
            )
        return pd.Series(out)

    return df.withColumn("_bands", sketch(F.col(vec_col)))


def _ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> "np.ndarray":
    """Deterministic centroid seed set: the ``n_centroids`` corpus vectors
    with the smallest xxhash64(id) — a seeded uniform sample without RNG
    state, stable across runs/partitionings. orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-k, merged on the driver) — no
    global sort, no single-partition window, scales to any corpus size."""
    seeds = (
        corpus.select(F.col(vec_col).alias("v"), F.col(id_col).alias("_i"))
        .orderBy(F.xxhash64(F.col("_i").cast("string")), F.col("_i"))
        .limit(n_centroids)
        .collect()
    )
    return np.asarray([r.v for r in seeds], dtype=np.float64)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine neighbors.

    Scale path alongside :func:`lsh_topk`: corpus vectors are assigned to
    their nearest centroid (one Arrow crossing, centroid matrix broadcast in
    the UDF closure); queries probe their ``n_probe`` nearest centroids; the
    bucket equi-join shuffles only same-cell candidates; exact cosine
    re-ranks within cells. ``queries=None`` → all-pairs mode (corpus as
    queries). Deterministic: hash-sampled centroids, no RNG state.

    Returns [query_id, neighbor_id, cos, rank] (rank ≤ k per query).
    """
    cents = _ivf_centroids(corpus, id_col, vec_col, n_centroids)
    # Normalize centroid rows for cosine assignment.
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cents_n = cents / norms

    def assign_udf(n_cells: int):
        @F.pandas_udf("array<int>")
        def assign(vecs: pd.Series) -> pd.Series:
            out = []
            for v in vecs:
                if v is None or len(v) == 0:
                    out.append([0])
                    continue
                x = np.asarray(v, dtype=np.float64)
                nx = np.linalg.norm(x)
                sims = cents_n @ (x / nx) if nx > 0 else np.zeros(len(cents_n))
                top = np.argsort(-sims, kind="stable")[:n_cells]
                out.append([int(c) for c in top])
            return pd.Series(out)

        return assign

    c_assign = assign_udf(1)
    q_assign = assign_udf(n_probe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    ).withColumn("cell", F.element_at(c_assign(F.col("_cvec")), 1))
    q = (queries if queries is not None else corpus).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    ).withColumn("cell", F.explode(q_assign(F.col("_qvec"))))

    cand = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine_sim(F.col("_cvec"), F.col("_qvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    bucket_cap: int = 2000,
) -> DataFrame:
    """Approximate all-pairs top-k: collide on any LSH band, exact cosine
    re-rank within collisions. Returns [query_id, neighbor_id, cos, rank]."""
    sk = add_lsh_sketch(corpus, vec_col, n_planes, bands, seed).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"),
        F.explode("_bands").alias("bucket"),
    )
    hot = (
        sk.groupBy("bucket").agg(F.count("*").alias("c"))
        .filter(F.col("c") > bucket_cap).select("bucket")
    )
    cold = sk.join(F.broadcast(hot), "bucket", "left_anti")
    a, b = cold.alias("a"), cold.alias("b")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("a._id") != F.col("b._id"))
        .select(
            F.col("a._id").alias("query_id"),
            F.col("b._id").alias("neighbor_id"),
            F.col("a._vec").alias("_qvec"),
            F.col("b._vec").alias("_cvec"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos", F.round(cosine_sim(F.col("_cvec"), F.col("_qvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
