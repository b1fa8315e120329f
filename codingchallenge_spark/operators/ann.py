"""Similarity search over embedding columns (array<float>).

Two paths, per the scale playbook:
- brute_force_topk: exact cosine top-k. Query side broadcast; corpus scanned
  once; per-query ranking via window. Baseline + oracle for the ANN path.
- lsh_topk: sign-random-projection LSH — md5-derived hyperplanes (portable,
  no RNG state; one Arrow crossing computes the sketch bits in production,
  and a JVM sequential-fold twin over the same planes serves as the
  DuckDB-verifiable oracle surface), bucket self-join on band keys, exact
  cosine re-rank inside buckets. At 100 TB the bucket join shuffles only
  colliding candidates instead of the full cross product.

Cosine is computed with JVM higher-order functions on double-cast arrays
(deterministic sequential fold — bit-identical to the DuckDB oracle SQL).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from functools import lru_cache

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

    Round 6 — hand-CSE of :func:`cosine_sim` across the pair fan-out: the
    inlined expression recomputes BOTH norms (each a full interpreted
    transform+aggregate fold) twice per pair — once in the CASE guard, once
    in the divisor — plus the double-casts, ~10 interpreted array traversals
    per pair. Norms and double-casts are pure per-ROW functions, so they are
    computed once per side before the cross join; the per-pair work is a
    single dot-product fold. Bit-identical: same fold expressions over the
    same operand order (cvec ⊗ qvec products, cn·qn divisor), just evaluated
    at a different plan position. Measured 3.9 s → 0.5 s at sf1.0 (with the
    corpus partition floor).
    """

    def _d(col: Column) -> Column:
        return F.transform(col, lambda x: x.cast("double"))

    def _norm(vd: Column) -> Column:
        return F.sqrt(F.aggregate(vd, F.lit(0.0), lambda acc, x: acc + x * x))

    q = queries.select(
        F.col(id_col).alias("query_id"), _d(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _d(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    dot = F.aggregate(
        F.zip_with(F.col("_cv"), F.col("_qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("_cn") * F.col("_qn")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(F.when(denom > 0, dot / denom).otherwise(F.lit(0.0)), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


@lru_cache(maxsize=8)
def _plane_matrix(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic sign-random-projection hyperplanes WITHOUT RNG state:
    entry (j, i) = (md5_int(seed_i_j) % 2001 - 1000) / 1000.0 ∈ [-1, 1].

    Portable by construction — the identical doubles are reproducible from
    any engine that has md5 (the driver's DuckDB oracle computes them as
    (('0x'||substr(md5(...),1,15))::BIGINT % 2001 - 1000) / 1000.0; integer
    ops and the power-of-ten division are IEEE-exact), the same trick as
    _ivf_centroids' hash-sampled seeds. Uniform [-1,1] entries are a valid
    SRP family (only the direction distribution matters; recall bound
    re-verified in tests/test_ann.py). Cached: n_planes·dim md5 calls per
    (config, worker), ~1k at the default 16-plane/64-dim shape."""
    mat = np.empty((dim, n_planes), dtype=np.float64)
    for i in range(n_planes):
        for j in range(dim):
            h = int(
                hashlib.md5(f"{seed}_{i}_{j}".encode()).hexdigest()[:15], 16
            )
            mat[j, i] = (h % 2001 - 1000) / 1000.0
    return mat


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
    crossing (scalar pandas UDF on the vector column).

    Batch-vectorized (BASELINE.json:15 "no per-row Python"): rows are grouped
    by vector dim (one group in practice), each group is stacked into one
    (n, d) matrix for a single matmul against the plane matrix, and the
    band-key strings are built with vectorized char ops — no per-row matmul
    or per-bit Python string join."""
    rows_per_band = n_planes // bands

    @F.pandas_udf("array<string>")
    def sketch(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        out = np.empty(n, dtype=object)
        lens = np.fromiter(
            ((len(v) if v is not None else 0) for v in vecs),
            dtype=np.int64,
            count=n,
        )
        for i in np.nonzero(lens == 0)[0]:
            out[i] = ["empty"] * bands
        for d in np.unique(lens[lens > 0]):
            idx = np.nonzero(lens == d)[0]
            mat = np.vstack([vecs.iat[i] for i in idx]).astype(
                np.float64, copy=False
            )
            bits = (mat @ _plane_matrix(int(d), n_planes, seed)) > 0
            # Pack each band's bits into an integer code, then map codes to
            # the "b{i}:0101…" key strings through a per-band lookup table —
            # one fancy-index per band instead of per-row string joins. The
            # LUT has 2^rows_per_band entries (16 at the default 16/4
            # config); past 8 bits the table itself (rebuilt per batch)
            # outgrows the work it saves, so wider bands take the
            # vectorized-char fallback. Trailing planes beyond
            # bands·rows_per_band are ignored for indivisible configs —
            # the same semantics as the per-row implementation this
            # vectorization replaced.
            grp = bits[:, : bands * rows_per_band].reshape(
                len(idx), bands, rows_per_band
            )
            if rows_per_band <= 8:
                weights = 1 << np.arange(rows_per_band - 1, -1, -1)
                codes = grp @ weights  # (n, bands)
                cols = [
                    np.array(
                        [
                            f"b{bi}:{c:0{rows_per_band}b}"
                            for c in range(1 << rows_per_band)
                        ]
                    )[codes[:, bi]]
                    for bi in range(bands)
                ]
            else:
                chars = np.where(bits, "1", "0").astype("<U1")
                cols = [
                    np.char.add(
                        f"b{bi}:",
                        np.ascontiguousarray(
                            chars[:, bi * rows_per_band : (bi + 1) * rows_per_band]
                        ).view(f"<U{rows_per_band}").ravel(),
                    )
                    for bi in range(bands)
                ]
            stacked = np.stack(cols, axis=1)
            for j, i in enumerate(idx):
                out[i] = stacked[j].tolist()
        return pd.Series(out.tolist())

    return df.withColumn("_bands", sketch(F.col(vec_col)))


def _lsh_buckets_jvm(
    vecs: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    bands: int,
    seed: int,
) -> DataFrame:
    """LSH band buckets computed fully JVM-side — the oracle surface twin of
    :func:`add_lsh_sketch` (same planes, same band layout), analogous to
    :func:`_assign_cells_jvm` for IVF.

    Per vector and plane: dot = sequential fold over zip_with products —
    bit-identical to DuckDB's list_inner_product over the same md5-derived
    plane doubles — then bit = dot > 0 (FP-safe: min |dot| over the test
    corpora is ≥3e-5, machine-checked by tests/test_ann.py's margin test,
    vs ~1e-15 summation noise). Band code packs the band's bits MSB-first
    (matching the Arrow kernel's weight order); bucket = band·2^rpb + code,
    an integer key — exact in every engine. Returns one row per (vector,
    band): [id_col, vec_col, bucket].

    Interpreted-eval higher-order fns keep this off the production path
    (sketch="arrow"); it exists so the driver's DuckDB oracle can verify
    the whole LSH operator end-to-end.

    Vectors without LSH evidence — NULL, empty, or off-dimension (≠ the
    corpus's reference dim) — are EXPLICITLY excluded here, mirroring
    minhash's documented empty-doc semantics (and the DuckDB twin, which
    computes the same planes for one dim). The arrow path instead groups
    null/empty vectors into a shared "empty" bucket whose degenerate
    self-join the band cap then drops — so the two modes agree on every
    corpus whose invalid vectors number > band_df_cap or zero; tests pin the
    valid-vector agreement. An all-invalid (or empty) corpus yields an empty
    bucket relation instead of a driver crash."""
    rows_per_band = n_planes // bands
    # Reference dim is picked from the min-id valid vector — deterministic
    # regardless of partition order (an arbitrary first() would make WHICH
    # dim survives on a mixed-dimension corpus depend on scan order). The
    # JVM twin is single-dim by design: off-dim vectors are excluded below,
    # while the arrow path builds per-dim plane matrices and buckets all of
    # them — use sketch="arrow" on genuinely mixed-dim corpora.
    ref = (
        vecs.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .orderBy(id_col)
        .select(vec_col)
        .first()
    )
    if ref is None:
        # No vector carries LSH evidence: empty relation, correct schema.
        return (
            vecs.select(id_col, vec_col)
            .withColumn("bucket", F.lit(0).cast("long"))
            .filter(F.lit(False))
        )
    dim = len(ref[0])
    vecs = vecs.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    )
    pm = _plane_matrix(dim, n_planes, seed)  # (dim, n_planes)
    planes = vecs.sparkSession.createDataFrame(
        [(i, [float(pm[j, i]) for j in range(dim)]) for i in range(bands * rows_per_band)],
        "plane_id int, pvec array<double>",
    )
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(vd, F.col("pvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    bits = (
        vecs.select(id_col, vec_col)
        .crossJoin(F.broadcast(planes))
        .withColumn("_bit", (dot > 0).cast("int"))
        .withColumn("_band", (F.col("plane_id") / rows_per_band).cast("int"))
        .withColumn(
            "_w",
            F.expr(
                f"shiftleft(1, {rows_per_band} - 1 - plane_id % {rows_per_band})"
            ),
        )
    )
    return bits.groupBy(id_col, vec_col, "_band").agg(
        (
            F.col("_band") * (1 << rows_per_band) + F.sum(F.col("_bit") * F.col("_w"))
        ).alias("bucket")
    ).select(id_col, vec_col, "bucket")


def _ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> "np.ndarray":
    """Deterministic centroid seed set: the ``n_centroids`` corpus vectors
    with the smallest portable md5 hash of their id — a seeded uniform sample
    without RNG state, stable across runs/partitionings AND reproducible in
    the DuckDB oracle (('0x'||substr(md5(id||'#0'),1,15))::BIGINT).
    orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k,
    merged on the driver) — no global sort, no single-partition window,
    scales to any corpus size."""
    from codingchallenge_spark.operators.dedup import portable_hash64

    seeds = (
        corpus.select(F.col(vec_col).alias("v"), F.col(id_col).alias("_i"))
        .orderBy(portable_hash64(F.col("_i").cast("string"), salt=0), F.col("_i"))
        .limit(n_centroids)
        .collect()
    )
    return np.asarray([r.v for r in seeds], dtype=np.float64)


def _centroid_df(spark, cents: "np.ndarray") -> DataFrame:
    return spark.createDataFrame(
        [(i, [float(x) for x in cents[i]]) for i in range(len(cents))],
        "cent_id int, cvec array<double>",
    )


def _assign_cells_jvm(
    vecs: DataFrame, id_col: str, vec_col: str, cents: "np.ndarray", n_cells: int
) -> DataFrame:
    """Nearest-centroid assignment fully JVM-side: cross join against the
    broadcast (tiny) centroid table, sequential-fold cosine (bit-identical to
    the DuckDB oracle's list_inner_product SQL), deterministic rank on
    (round(sim, 9) DESC, cent_id). Appends ``cell`` (one row per probed cell).
    """
    cdf = _centroid_df(vecs.sparkSession, cents)
    sims = vecs.crossJoin(F.broadcast(cdf)).withColumn(
        "_sim", F.round(cosine_sim(F.col(vec_col), F.col("cvec")), 9)
    )
    other = [c for c in vecs.columns]
    w = Window.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col("cent_id"))
    return (
        sims.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= n_cells)
        .select(*other, F.col("cent_id").alias("cell"))
    )


def lloyd_refine(
    corpus: DataFrame,
    vec_col: str,
    cents: "np.ndarray",
    iters: int = 1,
) -> "np.ndarray":
    """Deterministic Lloyd refinement of IVF centroids (k-means steps).

    Each iteration: assign every corpus vector to its nearest centroid
    (JVM-side, deterministic), then recompute each cell's centroid as the
    per-dimension mean (posexplode + groupBy(cell, dim) — distributed partial
    aggregation, only k·dim tiny rows are collected). Cells that lose all
    members keep their previous centroid. Trained centroids tighten cells so
    the same recall needs fewer probes (smaller n_probe/n_centroids ratio).
    """
    cents = np.array(cents, dtype=np.float64, copy=True)
    vecs = corpus.select(
        F.monotonically_increasing_id().alias("_vid"), F.col(vec_col).alias("_v")
    )
    for _ in range(iters):
        assigned = _assign_cells_jvm(vecs, "_vid", "_v", cents, n_cells=1)
        means = (
            assigned.select("cell", F.posexplode("_v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("mu"))
            .collect()
        )
        for r in means:
            cents[r.cell][r.dim] = r.mu
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    assign: str = "arrow",
    lloyd_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine neighbors.

    Scale path alongside :func:`lsh_topk`: corpus vectors are assigned to
    their nearest centroid; queries probe their ``n_probe`` nearest
    centroids; the bucket equi-join shuffles only same-cell candidates; exact
    cosine re-ranks within cells. ``queries=None`` → all-pairs mode (corpus
    as queries). Deterministic: hash-sampled centroids, no RNG state;
    ``lloyd_iters`` > 0 runs that many deterministic k-means refinement
    passes over the seeds (:func:`lloyd_refine`).

    ``assign`` picks the assignment plan:
    - ``"arrow"`` (production): one Arrow crossing, numpy matmul against the
      centroid matrix in the UDF closure — the fast path at corpus scale.
    - ``"jvm"``: broadcast cross join + sequential-fold cosine + window rank.
      Bit-identical to DuckDB SQL, so the driver oracle can verify the whole
      operator (higher-order fns are interpreted-eval — fine for the oracle
      surface, not the production path).

    Returns [query_id, neighbor_id, cos, rank] (rank ≤ k per query).
    """
    cents = _ivf_centroids(corpus, id_col, vec_col, n_centroids)
    if lloyd_iters > 0:
        cents = lloyd_refine(corpus, vec_col, cents, iters=lloyd_iters)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    q = (queries if queries is not None else corpus).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    if assign == "jvm":
        c = _assign_cells_jvm(c, "neighbor_id", "_cvec", cents, n_cells=1)
        q = _assign_cells_jvm(q, "query_id", "_qvec", cents, n_cells=n_probe)
    else:
        # Normalize centroid rows once; the UDF closure broadcasts them.
        norms = np.linalg.norm(cents, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents_n = cents / norms

        def assign_udf(n_cells: int):
            # Batch-vectorized: one (n, d) stack + one matmul per Arrow
            # batch/dim group — not a per-row dgemv (BASELINE.json:15).
            @F.pandas_udf("array<int>")
            def fn(vecs: pd.Series) -> pd.Series:
                n = len(vecs)
                out = np.empty(n, dtype=object)
                lens = np.fromiter(
                    ((len(v) if v is not None else 0) for v in vecs),
                    dtype=np.int64,
                    count=n,
                )
                for i in np.nonzero(lens == 0)[0]:
                    out[i] = [0]
                for d in np.unique(lens[lens > 0]):
                    idx = np.nonzero(lens == d)[0]
                    mat = np.vstack([vecs.iat[i] for i in idx]).astype(
                        np.float64, copy=False
                    )
                    nx = np.linalg.norm(mat, axis=1)
                    safe = np.where(nx > 0, nx, 1.0)[:, None]
                    sims = (mat / safe) @ cents_n.T
                    sims[nx == 0] = 0.0
                    top = np.argsort(-sims, axis=1, kind="stable")[:, :n_cells]
                    for j, i in enumerate(idx):
                        out[i] = top[j].tolist()
                return pd.Series(out.tolist())

            return fn

        c = c.withColumn("cell", F.element_at(assign_udf(1)(F.col("_cvec")), 1))
        q = q.withColumn("cell", F.explode(assign_udf(n_probe)(F.col("_qvec"))))

    # shuffle_hash: the corpus cell relation carries one row per vector —
    # a Catalyst under-estimate (it is derived through a UDF / window rank)
    # would broadcast the whole corpus. Per-cell build size is corpus/k on
    # average and AQE splits skewed cells.
    cand = (
        q.join(c.hint("shuffle_hash"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine_sim(F.col("_cvec"), F.col("_qvec")), 6))
    )
    # No pair dedup needed: each corpus vector lives in exactly one cell, so
    # a (query, neighbor) pair appears at most once across the probed cells.
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
    sketch: str = "arrow",
) -> DataFrame:
    """Approximate all-pairs top-k: collide on any LSH band, exact cosine
    re-rank within collisions. Returns [query_id, neighbor_id, cos, rank].

    ``sketch`` picks the band-key plan (same md5-derived planes either way):
    - ``"arrow"`` (production): one batched Arrow crossing, numpy matmul —
      the fast path at corpus scale (:func:`add_lsh_sketch`).
    - ``"jvm"``: sequential-fold dot products per plane, bit-identical to
      the driver's DuckDB oracle (:func:`_lsh_buckets_jvm`) — the surface
      the driver hash-checks, like ``ivf_topk(assign="jvm")``.
    """
    if sketch == "jvm":
        sk = _lsh_buckets_jvm(
            corpus, id_col, vec_col, n_planes, bands, seed
        ).select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), "bucket"
        )
    else:
        sk = add_lsh_sketch(corpus, vec_col, n_planes, bands, seed).select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"),
            F.explode("_bands").alias("bucket"),
        )
    hot = (
        sk.groupBy("bucket").agg(F.count("*").alias("c"))
        .filter(F.col("c") > bucket_cap).select("bucket")
    )
    cold = sk.join(F.broadcast(hot), "bucket", "left_anti")
    # shuffle_hash: the bucket relation is derived through a pandas UDF +
    # explode, so Catalyst's size estimate can land under
    # autoBroadcastJoinThreshold and it then broadcasts the ENTIRE sketched
    # corpus — serial driver-side build, driver-killer at scale. Per-bucket
    # build rows are bounded by bucket_cap, the same argument as the
    # MinHash-LSH band join (operators/dedup.py).
    a, b = cold.alias("a"), cold.hint("shuffle_hash").alias("b")
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
