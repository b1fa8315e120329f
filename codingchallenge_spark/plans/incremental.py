"""Incremental (delta) entity resolution: link NEW records against an
already-resolved catalog without re-scoring the whole corpus.

Production motivation (BASELINE.json:6's 10^12-file clause): a corpus that
size is never re-resolved from scratch for a day's ingest. The batch matcher
(plans.matcher.resolve_entities) costs a full token self-join whose pair
volume is quadratic in block size; the delta form below scores ONLY pairs
that touch at least one new record, seeds transitive closure with the
catalog's existing star edges, and converges in O(1) extra CC rounds — the
per-delta cost is one corpus token-df pass + one (delta × corpus) bucketed
join instead of a (corpus × corpus) self-join.

Semantics (documented contract, tested in tests/test_incremental.py):

- **Old entities never split.** The catalog's (entity_id → rid) star edges
  are part of the CC input, so every existing cluster stays connected no
  matter what the delta contains.
- **Entities merge only through new-record bridges.** A new record that
  matches members of two different catalog entities joins them into one
  (entity_id = global min rid, unchanged label semantics).
- **Delta-touching pairs are scored exactly as the batch matcher would.**
  Token document frequencies (the hot-key cap) are computed over the FULL
  union corpus and the sorted-neighborhood pass runs over the full union
  order, so the candidate set equals the batch run's candidate set
  restricted to pairs with ≥ 1 new side — same blocking keys, same
  meta-blocking overlap counts, same kernels, same threshold.
- **Relation to a from-scratch batch run** (tests assert both directions on
  the driver corpus): the incremental partition is the batch partition of
  the union corpus, *coarsened* by any old-old merges the catalog already
  contains. The two can differ only where inserting delta rows changed an
  old-old candidate pair — a token crossing the df cap, or two old names
  pushed > window apart in the union sort order — and both effects only
  REMOVE old-old pairs from the batch run (insertions never move sort
  neighbors closer, dfs never shrink), i.e. the batch partition refines the
  incremental one; on corpora without such crossings they are identical.
- **Idempotent ingest.** Delta rows whose rid (sha256 of repo/path/commit —
  functions.normalize.record_id) already exists in the catalog are ignored;
  the catalog row wins.

Scale shape: the delta side of the token join is small by assumption; the
corpus side is exploded once and shuffled once on token (shuffle_hash-hinted
— the same Catalyst mis-broadcast class as operators.blocking.token_blocking,
gated in tests/test_plan_quality.py). The SN pass pays one full-corpus range
sort per delta — the documented cost of exact union-order semantics (a
deployment that ingests continuously would maintain the sorted key order as
a sorted/bucketed table instead; the pair semantics here are the contract).
All shuffles run on 32-byte binary rids, like the batch pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codingchallenge_spark.functions.normalize import (
    guarded_unhex,
    normalize_records,
    with_token_hashes,
)
from codingchallenge_spark.operators.blocking import (
    sorted_neighborhood,
    union_candidates_meta,
)
from codingchallenge_spark.operators.cc import connected_components
from codingchallenge_spark.operators.scoring import (
    edges_from_scores,
    score_pairs_fused,
)
from codingchallenge_spark.plans.matcher import MatcherConfig, emit_entities
from codingchallenge_spark.sources.records import INPUT_COLUMNS


def incremental_token_pairs(work: DataFrame, df_cap: int) -> DataFrame:
    """Token pass restricted to pairs touching ≥ 1 new record.

    ``work`` carries [rid, tokens, is_new, ...]. Document frequencies and the
    hot-token cap are computed over the FULL corpus — identical cold-token set
    to a batch run — but only the (tiny) delta side of the exploded relation
    drives the join, so the pair volume is |delta tokens| × per-token df
    instead of the batch self-join's quadratic block volume.

    Emits each unordered delta-touching pair once per shared cold token
    (NON-deduped — exactly the multiplicity union_candidates_meta counts as
    token overlap): a (new, old) pair joins once because old rows never sit
    on the delta side; a (new, new) pair is kept only in its a.rid < b.rid
    orientation.
    """
    tok = work.select("rid", "is_new", F.explode("tokens").alias("tok"))
    hot = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > df_cap)
        .select("tok")
    )
    cold = tok.join(F.broadcast(hot), "tok", "left_anti")
    new_side = cold.filter(F.col("is_new"))
    # shuffle_hash on the corpus side for the same reason as token_blocking
    # (operators/blocking.py): Catalyst under-estimates the exploded relation
    # and would broadcast the ENTIRE corpus token list. Per-token build rows
    # are bounded by df_cap.
    a, b = new_side.alias("a"), cold.hint("shuffle_hash").alias("b")
    pairs = (
        a.join(b, "tok")
        .filter((~F.col("b.is_new")) | (F.col("a.rid") < F.col("b.rid")))
        .select(
            F.least(F.col("a.rid"), F.col("b.rid")).alias("rid1"),
            F.greatest(F.col("a.rid"), F.col("b.rid")).alias("rid2"),
            F.col("tok").alias("block_key"),
        )
    )
    return pairs


def incremental_candidate_pairs(
    work: DataFrame, cfg: MatcherConfig, sn: bool = True
) -> DataFrame:
    """Multi-pass delta blocking: restricted token pass ∪ delta-touching
    sorted-neighborhood pairs, merged through the same single-shuffle
    meta-union as the batch matcher (identical overlap semantics).

    ``sn=False`` drops the sorted-neighborhood pass — the one component whose
    per-delta cost is corpus-proportional (a full union range sort). Token-
    only incremental blocking is delta-proportional end to end (the corpus is
    exploded and shuffled once, never sorted) at the price of the SN recall
    path for name-similar-but-token-poor records; high-frequency ingest
    deployments run sn=False per delta and fold an sn=True pass into the
    periodic full re-resolution."""
    tok = incremental_token_pairs(work, df_cap=cfg.token_df_cap)
    if not sn:
        empty = tok.filter(F.lit(False))
        return union_candidates_meta(
            tok, empty, min_token_overlap=cfg.min_token_overlap
        )
    # SN runs over the FULL union order (exact batch semantics), then keeps
    # pairs with ≥ 1 new side. The flag join shuffles the O(N·window) SN pair
    # set on rid — the same key every downstream stage shuffles on.
    sn_pairs = sorted_neighborhood(
        work, window=cfg.sn_window, num_buckets=cfg.sn_buckets, dedupe=False
    )
    flags = work.select("rid", "is_new")
    f1 = flags.select(F.col("rid").alias("rid1"), F.col("is_new").alias("_n1"))
    f2 = flags.select(F.col("rid").alias("rid2"), F.col("is_new").alias("_n2"))
    sn_new = (
        sn_pairs.join(f1, "rid1")
        .join(f2, "rid2")
        .filter(F.col("_n1") | F.col("_n2"))
        .select("rid1", "rid2", "block_key")
    )
    return union_candidates_meta(
        tok, sn_new, min_token_overlap=cfg.min_token_overlap
    )


def resolve_entities_incremental(
    catalog: DataFrame,
    new_records: DataFrame,
    cfg: MatcherConfig | None = None,
    sn: bool = True,
) -> DataFrame:
    """Resolve ``catalog ∪ new_records`` by linking only the delta.

    ``catalog`` is a prior resolve_entities / run_pipeline output (the five
    input columns + content_sha + entity_id, entity_id = min rid per
    cluster). ``new_records`` is a raw delta with the five input columns.
    ``sn=False`` selects token-only delta blocking (delta-proportional cost —
    see :func:`incremental_candidate_pairs`). Returns the same entity-table
    schema over the combined corpus.
    """
    cfg = cfg or MatcherConfig()
    spark = catalog.sparkSession
    parallelism = spark.sparkContext.defaultParallelism

    labels_old = catalog.select("rid", "entity_id")
    # Idempotent ingest: delta rows whose natural key already exists in the
    # catalog are dropped (the catalog row wins). rid is derived from the
    # natural key, so one left_anti on rid is the whole check. The same key
    # deduped WITHIN the batch too: one delta replaying a row twice (same
    # repo/path/commit) must not emit duplicate rid rows.
    norm_new = (
        normalize_records(new_records.select(*INPUT_COLUMNS))
        .dropDuplicates(["rid"])
        .join(labels_old.select("rid"), "rid", "left_anti")
    )
    norm_old = normalize_records(catalog.select(*INPUT_COLUMNS))
    norm = (
        with_token_hashes(
            norm_old.withColumn("is_new", F.lit(False)).unionByName(
                norm_new.withColumn("is_new", F.lit(True))
            )
        )
        .withColumn("rid_b", F.unhex("rid"))
    )
    # Same partition floor + persist-once rationale as plans.matcher.
    if norm.rdd.getNumPartitions() < parallelism:
        norm = norm.repartition(parallelism)
    norm = norm.persist()
    work = norm.select(
        F.col("rid_b").alias("rid"), "name_norm", "tokens", "th", "is_new"
    )

    pairs = incremental_candidate_pairs(work, cfg, sn=sn)
    scored = score_pairs_fused(
        pairs,
        work,
        weights=cfg.weights,
        threshold=cfg.threshold,
        salt_buckets=cfg.salt_buckets,
    )
    delta_edges = edges_from_scores(scored, threshold=cfg.threshold)

    # Seed CC with the catalog's star edges (entity_id → member rid): old
    # clusters stay connected by construction, and a delta edge that lands in
    # two different stars merges them transitively. entity_id ≤ rid within a
    # cluster (min-rid labels), so the canonical src < dst form is free.
    # Guard the hex invariant rather than silently nulling: F.unhex of a
    # malformed id returns NULL, _canon_edges would then DROP the star edge
    # and the old entity would silently split — the exact failure mode a
    # foreign/corrupted catalog must surface instead.
    ctx = "resolve_entities_incremental: catalog"
    star = (
        labels_old.filter(F.col("rid") != F.col("entity_id"))
        .select(
            guarded_unhex("entity_id", ctx).alias("src"),
            guarded_unhex("rid", ctx).alias("dst"),
        )
    )
    labels = connected_components(
        delta_edges.unionByName(star),
        nodes=work.select("rid"),
        max_iterations=cfg.cc_max_iterations,
    ).labels
    # norm stays persisted (matcher convention): the returned plan is lazy
    # and re-reads it through blocking, scoring, CC nodes and the emit join.
    return emit_entities(norm.drop("is_new"), labels)
