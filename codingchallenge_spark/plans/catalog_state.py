"""Persisted catalog state for delta-proportional incremental ingest.

Spec motivation (BASELINE.json:6's 10^12-file clause + :14 "resumable from
checkpoint"): a high-frequency ingest deployment cannot pay a corpus-
proportional normalize / token-count / range-sort per delta. The batch
pipeline (plans.pipeline) already persists its normalize stage; this module
adds the two derived relations a delta run needs to avoid every full-corpus
pass the round-3 incremental path still paid:

- ``token_df`` — (tok, df) document frequencies over the catalog. A delta
  run maintains it incrementally: df' = df + delta counts (EXACT — tokens
  are distinct per record by functions.normalize.tokenize, and catalog/delta
  rid sets are disjoint after the idempotent anti-join, so document
  frequencies simply add; they never shrink under insertion, the property
  the incremental refinement contract already leans on).
- ``sn_index`` / ``sn_bounds`` — the catalog's (name_norm, rid) sort order
  materialized ONCE with global positions, range-bucketed: ``sn_index`` =
  [bucket, rid(binary), name_norm, pos] written bucket-per-file (so a
  bucket predicate prunes whole files via parquet min/max stats), and
  ``sn_bounds`` = [bucket, n, start_pos, min_name, min_rid] — one row per
  bucket, small enough to broadcast. A delta run range-joins its keys into
  this order (plans.incremental.delta_sn_pairs) instead of re-sorting the
  union corpus.

On disk the state lives inside a pipeline run_dir next to the stage sinks,
plus a ``state.json`` manifest listing the normalize-stage parquet paths
(a CHAIN: a maintained delta run appends its own delta-normalize path
instead of rewriting the corpus — the full normalized relation is the union
of the chain, which is what :func:`load_catalog_state` reads back).

Production shape: at 10^12 files ``sn_index`` buckets would be sized to
~64k rows (here: defaultParallelism buckets — a knob), and index maintenance
would ride the table format's compaction (Iceberg sort orders / LSM merge);
the rewrite in :func:`updated_sn_index` is a narrow 3-column relation,
never content.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STATE_MANIFEST = "state.json"
STATE_VERSION = 1


@dataclass
class CatalogState:
    """In-memory handle on a catalog's persisted derived relations."""

    norm: DataFrame  # normalize-stage rows (full cols + name_norm/tokens/th/rid_b)
    token_df: DataFrame  # (tok, df)
    sn_index: DataFrame  # (bucket, rid: binary, name_norm, pos)
    sn_bounds: DataFrame  # (bucket, n, start_pos, min_name, min_rid) — tiny
    norm_paths: list[str] | None = None  # manifest chain (None when in-memory)


def build_token_df(norm: DataFrame) -> DataFrame:
    """(tok, df) over a normalized relation. df = document frequency exactly
    (tokenize emits distinct tokens per record)."""
    return (
        norm.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )


def build_sn_index(
    norm: DataFrame, num_buckets: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Materialize the catalog's global (name_norm, rid) order.

    One range sort — paid at CATALOG BUILD time, never per delta. Returns
    (sn_index, sn_bounds); positions are 1-based and globally exact
    regardless of how balanced the range buckets came out (start offsets are
    computed from real per-bucket counts, not assumed).

    The bucketed relation is pinned with a lazy localCheckpoint for the same
    reason as operators.blocking.sorted_neighborhood: repartitionByRange
    samples boundaries with a physical-RDD-id-derived seed, and the index
    rows and the bounds table MUST observe identical boundaries.
    """
    spark = norm.sparkSession
    num_buckets = num_buckets or spark.sparkContext.defaultParallelism
    keyed = norm.select(F.col("rid_b").alias("rid"), "name_norm")
    bucketed = (
        keyed.repartitionByRange(num_buckets, "name_norm", "rid")
        .withColumn("bucket", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("bucket").orderBy("name_norm", "rid")
    local = bucketed.withColumn("lpos", F.row_number().over(w))
    key = F.struct(F.col("name_norm"), F.col("rid"))
    parts = bucketed.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min_by("name_norm", key).alias("min_name"),
        F.min_by("rid", key).alias("min_rid"),
    )
    # start_pos = 1 + rows in all prior buckets: non-equi self-join over the
    # metadata-sized bucket table (≤ num_buckets rows — no global window).
    prior = parts.select(F.col("bucket").alias("q"), F.col("n").alias("qn"))
    bounds = (
        parts.join(F.broadcast(prior), F.col("q") < F.col("bucket"), "left")
        .groupBy("bucket", "n", "min_name", "min_rid")
        .agg((F.coalesce(F.sum("qn"), F.lit(0)) + 1).alias("start_pos"))
        .select("bucket", "n", "start_pos", "min_name", "min_rid")
    )
    sn_index = local.join(F.broadcast(bounds.select("bucket", "start_pos")), "bucket").select(
        "bucket",
        "rid",
        "name_norm",
        (F.col("start_pos") + F.col("lpos") - 1).alias("pos"),
    )
    return sn_index, bounds


def bounds_from_index(sn_index: DataFrame) -> DataFrame:
    """Derive ``sn_bounds`` from a PERSISTED ``sn_index`` — used by the
    pipeline's stage sinks so bounds and index provably describe the same
    materialization (two independent build_sn_index calls could sample
    different range boundaries; a parquet-backed index cannot)."""
    return sn_index.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("pos").alias("start_pos"),
        F.min_by("name_norm", "pos").alias("min_name"),
        F.min_by("rid", "pos").alias("min_rid"),
    )


def updated_token_df(token_df: DataFrame, delta_norm: DataFrame) -> DataFrame:
    """df' = df + delta document counts (exact under disjoint rid sets)."""
    dn = build_token_df(delta_norm).withColumnRenamed("df", "dfn")
    return (
        token_df.join(dn, "tok", "full_outer")
        .select(
            "tok",
            (F.coalesce("df", F.lit(0)) + F.coalesce("dfn", F.lit(0))).alias("df"),
        )
    )


def updated_sn_index(
    state: "CatalogState", delta_norm: DataFrame, num_buckets: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Rebuild the key index over catalog ∪ delta keys.

    A 3-column narrow-key merge (positions shift under insertion, so a
    rewrite is semantically required); the CONTENT corpus is never touched.
    Production would fold this into table-format compaction.
    """
    keys = state.sn_index.select("rid", "name_norm").unionByName(
        delta_norm.select(F.col("rid_b").alias("rid"), "name_norm")
    )
    return build_sn_index(
        keys.withColumnRenamed("rid", "rid_b"), num_buckets=num_buckets
    )


def write_state_manifest(run_dir: str, norm_paths: list[str]) -> None:
    payload = {"version": STATE_VERSION, "norm_paths": norm_paths}
    (Path(run_dir) / STATE_MANIFEST).write_text(json.dumps(payload, indent=1))


def has_state(run_dir: str) -> bool:
    return (Path(run_dir) / STATE_MANIFEST).exists()


def load_catalog_state(spark: SparkSession, run_dir: str) -> CatalogState:
    """Read a persisted state (batch run_dir or maintained delta run_dir)."""
    manifest = json.loads((Path(run_dir) / STATE_MANIFEST).read_text())
    norm_paths = manifest["norm_paths"]
    return CatalogState(
        norm=spark.read.parquet(*norm_paths),
        token_df=spark.read.parquet(str(Path(run_dir) / "token_df")),
        sn_index=spark.read.parquet(str(Path(run_dir) / "sn_index")),
        sn_bounds=spark.read.parquet(str(Path(run_dir) / "sn_bounds")),
        norm_paths=norm_paths,
    )


def state_from_norm(norm: DataFrame, num_buckets: int | None = None) -> CatalogState:
    """In-memory state from a normalized catalog (tests / ad-hoc use; the
    pipeline persists the same three relations as stages)."""
    sn_index, sn_bounds = build_sn_index(norm, num_buckets=num_buckets)
    return CatalogState(
        norm=norm,
        token_df=build_token_df(norm),
        sn_index=sn_index,
        sn_bounds=sn_bounds,
    )
