"""Production pipeline: checkpointed, resumable stage graph (EP1/EP3).

Spec: BASELINE.json:6/14 — the pipeline "ships as spark-submit --py-files
modules" and "interrupted runs resume at the blocking, scoring, or clustering
stage". Stage graph:

    normalize → block_token → block_sn → pairs → score → edges → cc → entities

Every stage materializes to ``run_dir/<stage>/`` with a fingerprinted
``_STAGE_DONE`` marker (sources/checkpoint.py). On --resume, stages whose
fingerprint matches are loaded, not recomputed; a fingerprint is the sha256
of (config json ⊕ input id ⊕ upstream fingerprint), so changing any upstream
config invalidates exactly the downstream suffix. The CC stage additionally
checkpoints each iteration's edge set under run_dir/cc_iters and resumes
mid-iteration-sequence.

Column discipline at scale: ``content`` (the wide column) exists only in the
normalize output and the final entities join — blocking/scoring/cc stages
carry (rid, name_norm, tokens) at most.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codingchallenge_spark.functions.normalize import (
    guarded_unhex,
    normalize_records,
    with_token_hashes,
)
from codingchallenge_spark.operators.blocking import (
    sorted_neighborhood,
    token_blocking,
    union_candidates_meta,
)
from codingchallenge_spark.operators.cc import connected_components
from codingchallenge_spark.operators.scoring import (
    edges_from_scores,
    score_pairs_fused,
)
from codingchallenge_spark.plans import catalog_state as cstate
from codingchallenge_spark.plans.matcher import MatcherConfig, emit_entities
from codingchallenge_spark.sources import checkpoint as ckpt

STAGES = [
    "normalize",
    "block_token",
    "block_sn",
    "pairs",
    "score",
    "edges",
    "cc",
    "entities",
    # catalog-state sinks consumed by --delta runs (plans.catalog_state)
    "token_df",
    "sn_index",
    "sn_bounds",
    "tok_index",
]

DELTA_STAGES = [
    "normalize_delta",
    "pairs_delta",
    "score_delta",
    "edges_delta",
    "cc_delta",
    "entities_delta",
]


@dataclass
class PipelineRun:
    entities: DataFrame
    executed: list[str]
    skipped: list[str]
    run_dir: str


# Marker a delta-EMIT run writes when it maintains no state manifest (the
# manifest records emit itself): the only signal that its entities_delta
# holds the upsert set, not the catalog (ADVICE r04 — a partial sink must
# never be silently consumable as a full one).
EMIT_DELTA_MARKER = "EMIT_DELTA"


def _is_delta_emit(run_dir: str) -> bool:
    return (
        cstate.manifest_emit(run_dir) == "delta"
        or (Path(run_dir) / EMIT_DELTA_MARKER).exists()
    )


def catalog_entities_path(run_dir: str) -> str:
    """The completed FULL entities sink inside a pipeline run_dir.

    Shared by the ``--delta`` CLI and the streaming ingest adapter so the
    fallback order can never drift: a delta run writes ``entities_delta``,
    a batch run ``entities``. A run_dir whose entities_delta is an
    ``emit="delta"`` upsert set (recorded in state.json / the EMIT_DELTA
    marker) is REFUSED — its partial sink would silently drop every
    untouched catalog row (ADVICE r04); read :func:`current_entities`
    instead, which reconstructs the full view from the state chains.
    """
    for ent in ("entities_delta", "entities"):
        if (Path(run_dir) / ent / "_STAGE_DONE").exists():
            if ent == "entities_delta" and _is_delta_emit(run_dir):
                raise ValueError(
                    f"{run_dir!r} was emitted with emit='delta': its "
                    "entities_delta holds only the upsert set, not the "
                    "catalog. Use current_entities(spark, run_dir) for the "
                    "full resolved view (or delta_entities_path for the "
                    "upsert set)."
                )
            return str(Path(run_dir) / ent)
    raise ValueError(
        f"{run_dir!r} holds no completed entities stage; it is not a "
        "resolved catalog run_dir"
    )


def delta_entities_path(run_dir: str) -> str:
    """The per-run upsert sink (whatever the emit mode wrote there)."""
    p = Path(run_dir) / "entities_delta"
    if not (p / "_STAGE_DONE").exists():
        raise ValueError(f"{run_dir!r} holds no completed entities_delta stage")
    return str(p)


def current_entities(spark: SparkSession, run_dir: str) -> DataFrame:
    """The FULL resolved entities view of a run_dir, independent of emit
    mode: a full-emit run's persisted entities sink, else (delta-emit run or
    compacted state dir) the reconstruction ``emit_entities(norm chain,
    resolved labels chain)`` — a lazy corpus-sized READ for the consumer who
    asks for the whole catalog, paid by that consumer only; per-batch writes
    stay delta-sized (VERDICT r04 #3)."""
    if cstate.has_state(run_dir):
        full_sink_ok = not _is_delta_emit(run_dir) and (
            (Path(run_dir) / "entities" / "_STAGE_DONE").exists()
            or (Path(run_dir) / "entities_delta" / "_STAGE_DONE").exists()
        )
        if not full_sink_ok:
            state = cstate.load_catalog_state(spark, run_dir)
            return emit_entities(state.norm, state.labels)
    return spark.read.parquet(catalog_entities_path(run_dir))


# Bump whenever any stage's OUTPUT SCHEMA or on-disk semantics change: the
# token is folded into every stage fingerprint, so --resume against a run_dir
# written by older code rebuilds instead of loading a stale-schema checkpoint
# (e.g. v2 added the `th` column to the normalize stage — resuming a v1
# run_dir would otherwise fail on norm.select(..., 'th'); v3 switched the
# blocking/scoring/cc stages to 32-byte binary rids; v4 switched the
# sn_index stage to bucket-local positions + manifest sn_chain overlays).
PIPELINE_SCHEMA_VERSION = 4


def _fingerprint(cfg: MatcherConfig, input_id: str, upstream: str, stage: str) -> str:
    payload = json.dumps(
        {
            "cfg": asdict(cfg),
            "input": input_id,
            "up": upstream,
            "stage": stage,
            "schema_version": PIPELINE_SCHEMA_VERSION,
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def _resume_cc_iter_dir(run_dir: str) -> str:
    return str(Path(run_dir) / "cc_iters")


def _latest_cc_iteration(iter_dir: str) -> tuple[int, str | None]:
    best, path = 0, None
    for p in sorted(Path(iter_dir).glob("edges_iter_*.parquet")):
        if not (p / "_SUCCESS").exists():
            continue
        m = re.match(r"edges_iter_(\d+)\.parquet", p.name)
        if m and int(m.group(1)) > best:
            best, path = int(m.group(1)), str(p)
    return best, path


class _StageRunner:
    """The fingerprinted execute-or-skip protocol shared by the batch and
    delta pipelines (one implementation, two stage graphs)."""

    def __init__(
        self,
        spark: SparkSession,
        run_dir: str,
        cfg: MatcherConfig,
        input_id: str,
        resume: bool,
    ):
        self.spark = spark
        self.run_dir = run_dir
        self.cfg = cfg
        self.input_id = input_id
        self.resume = resume
        self.executed: list[str] = []
        self.skipped: list[str] = []
        self.fps: dict[str, str] = {}

    def stage(self, name: str, upstream: list[str], build) -> DataFrame:
        up_fp = "|".join(self.fps[u] for u in upstream)
        fp = _fingerprint(self.cfg, self.input_id, up_fp, name)
        self.fps[name] = fp
        if self.resume and ckpt.is_done(self.run_dir, name, fp):
            ckpt.record_skip(self.run_dir, name, fp)
            self.skipped.append(name)
        else:
            ckpt.write_stage(build(), self.run_dir, name, fp)
            self.executed.append(name)
        return ckpt.load_stage(self.spark, self.run_dir, name)


def run_pipeline(
    spark: SparkSession,
    records: DataFrame,
    run_dir: str,
    cfg: MatcherConfig | None = None,
    input_id: str = "",
    resume: bool = False,
) -> PipelineRun:
    """Execute (or resume) the full record-linkage pipeline."""
    cfg = cfg or MatcherConfig()
    Path(run_dir).mkdir(parents=True, exist_ok=True)
    runner = _StageRunner(spark, run_dir, cfg, input_id, resume)
    stage = runner.stage
    executed, skipped, fps = runner.executed, runner.skipped, runner.fps

    def build_normalize() -> DataFrame:
        recs = records
        # Partition floor (see plans.matcher): small scans must not cap the
        # whole run's parallelism. No-op at production scale.
        parallelism = spark.sparkContext.defaultParallelism
        if recs.rdd.getNumPartitions() < parallelism:
            recs = recs.repartition(parallelism)
        # th (token-hash fingerprints) is interpreted-eval — materialize it
        # in the stage parquet so scoring never recomputes it per execution.
        # rid_b = unhex(rid): the blocking/scoring/cc stages shuffle on
        # record ids constantly, and the 32-byte binary form halves that
        # key's bytes vs the 64-char hex string (exact — see plans.matcher).
        n = with_token_hashes(normalize_records(recs))
        if cfg.int32_prefilter:
            from codingchallenge_spark.functions.normalize import (
                with_token_hashes32,
            )

            n = with_token_hashes32(n)
        return n.withColumn("rid_b", F.unhex("rid"))

    norm = stage("normalize", [], build_normalize)
    narrow_cols = ["name_norm", "tokens", "th"] + (
        ["th32"] if cfg.int32_prefilter else []
    )
    norm_narrow = norm.select(F.col("rid_b").alias("rid"), *narrow_cols)

    tok_pairs = stage(
        "block_token",
        ["normalize"],
        lambda: token_blocking(norm_narrow, df_cap=cfg.token_df_cap, dedupe=False),
    )
    sn_pairs = stage(
        "block_sn",
        ["normalize"],
        lambda: sorted_neighborhood(
            norm_narrow, window=cfg.sn_window, num_buckets=cfg.sn_buckets,
            dedupe=False,
        ),
    )
    pairs = stage(
        "pairs",
        ["block_token", "block_sn"],
        lambda: union_candidates_meta(
            tok_pairs, sn_pairs, min_token_overlap=cfg.min_token_overlap
        ),
    )
    # The scored stage persists only pairs whose score can reach the
    # threshold (exact upper-bound prune, see score_pairs_pruned) — the
    # pruned pairs are provably non-edges, so resume semantics are unchanged.
    scored = stage(
        "score",
        ["pairs", "normalize"],
        lambda: score_pairs_fused(
            pairs,
            norm_narrow,
            weights=cfg.weights,
            threshold=cfg.threshold,
            salt_buckets=cfg.salt_buckets,
        ),
    )
    edges = stage(
        "edges",
        ["score"],
        lambda: edges_from_scores(scored, threshold=cfg.threshold),
    )

    def build_cc() -> DataFrame:
        iter_dir = _resume_cc_iter_dir(run_dir)
        Path(iter_dir).mkdir(parents=True, exist_ok=True)
        # cc_iters must belong to THIS edge set: the directory is stamped
        # with the edges-stage fingerprint (which folds config, input, the
        # whole upstream chain and the schema version). A stale stamp means
        # the files were written by an older run — e.g. a pre-binary-rid
        # schema, or a config whose CC converged in fewer rounds, leaving
        # higher-numbered iter files a later interrupted resume would
        # otherwise prefer over the real latest round — so they are wiped
        # before anything can seed from them.
        stamp = Path(iter_dir) / "_EDGES_FP"
        expected = fps["edges"]
        if not stamp.exists() or stamp.read_text().strip() != expected:
            import shutil

            for p in Path(iter_dir).iterdir():
                shutil.rmtree(p) if p.is_dir() else p.unlink()
            stamp.write_text(expected)
        # Mid-iteration resume is only sound when the edge set is unchanged
        # (edges stage was skipped under the same fingerprint — and, via the
        # stamp above, the surviving iter files provably came from it).
        latest = None
        if resume and "edges" in skipped:
            _, latest = _latest_cc_iteration(iter_dir)
        seed_edges = spark.read.parquet(latest) if latest else edges
        res = connected_components(
            seed_edges,
            nodes=norm_narrow.select("rid"),
            max_iterations=cfg.cc_max_iterations,
            iter_dir=iter_dir,
        )
        return res.labels

    labels = stage("cc", ["edges", "normalize"], build_cc)
    entities = stage(
        "entities", ["cc", "normalize"], lambda: emit_entities(norm, labels)
    )

    # Catalog-state stages (plans.catalog_state): the derived relations a
    # --delta run needs to stay delta-proportional — maintained token dfs
    # and the materialized (name_norm, rid) key order. sn_bounds is derived
    # from the PERSISTED index so both describe one materialization.
    tok_df = stage(
        "token_df", ["normalize"], lambda: cstate.build_token_df(norm)
    )
    sn_index = stage(
        "sn_index",
        ["normalize"],
        lambda: cstate.build_sn_index(norm, num_buckets=cfg.sn_buckets)[0],
    )
    stage(
        "sn_bounds", ["sn_index"], lambda: cstate.bounds_from_index(sn_index)
    )
    stage(
        "tok_index",
        ["normalize"],
        lambda: cstate.build_tok_postings(norm, cfg.tok_buckets),
    )
    cstate.write_state_manifest(
        run_dir,
        [ckpt.stage_path(run_dir, "normalize")],
        sn_chain=[
            {"path": ckpt.stage_path(run_dir, "sn_index"), "buckets": None}
        ],
        # The cc stage IS the labels base: binary (rid, entity_id) for every
        # catalog rid — the labels overlay chain grows from it, one
        # delta-sized upsert element per maintained delta run.
        labels_chain=[ckpt.stage_path(run_dir, "cc")],
        emit="full",
        tok_chain=[ckpt.stage_path(run_dir, "tok_index")],
        tok_buckets=cfg.tok_buckets,
    )
    return PipelineRun(
        entities=entities, executed=executed, skipped=skipped, run_dir=run_dir
    )


def run_delta_pipeline(
    spark: SparkSession,
    catalog: DataFrame | None,
    delta_records: DataFrame,
    run_dir: str,
    cfg: MatcherConfig | None = None,
    input_id: str = "",
    resume: bool = False,
    sn: bool = True,
    state: "cstate.CatalogState | None" = None,
    emit: str = "full",
    maintain_state: bool = True,
) -> PipelineRun:
    """Checkpointed, resumable INCREMENTAL pipeline (plans.incremental staged
    through the same sources.checkpoint protocol as the batch run).

    Stage graph (each a fingerprinted parquet sink; an interrupted ingest
    resumes after the last completed stage):

        [catalog_norm → token_df_cat → sn_index_cat → tok_index_cat]
                                                       (only when no
                                                        persisted state —
                                                        builds one in-run)
        normalize_delta → pairs_delta → score_delta → edges_delta
        → cc_delta → entities_delta
        [→ token_df / sn_index / sn_bounds / tok_index + state.json]
                                                       (maintain_state:
                                                        the run_dir becomes
                                                        a valid catalog
                                                        state for the NEXT
                                                        delta — norm chain =
                                                        catalog paths +
                                                        this delta's)

    ``input_id`` must identify BOTH the catalog and the delta (the CLI folds
    both paths plus the sn/emit flags) so fingerprints invalidate when either
    side changes. ``catalog`` is the prior entities table (rid, entity_id +
    record columns) — pass ``None`` when ``state`` carries a labels chain
    (load_catalog_state): the prior labels come from the chain, which is
    what makes an ``emit="delta"`` run_dir chainable (its partial entities
    sink is never consulted — VERDICT r04 #3 / ADVICE r04).
    """
    from codingchallenge_spark.plans import incremental as inc

    cfg = cfg or MatcherConfig()
    Path(run_dir).mkdir(parents=True, exist_ok=True)
    runner = _StageRunner(
        spark, run_dir, cfg, f"{input_id}|sn={int(sn)}|emit={emit}", resume
    )
    stage = runner.stage
    # Prior labels, BINARY (rid, entity_id): from the state's labels chain
    # when available (narrow, delta-sized elements over one corpus-sized
    # base), else converted from the catalog entities relation.
    if state is not None and state.labels is not None:
        labels_old_b = state.labels
    elif catalog is not None:
        ctx = "run_delta_pipeline: catalog"
        labels_old_b = catalog.select(
            guarded_unhex("rid", ctx).alias("rid"),
            guarded_unhex("entity_id", ctx).alias("entity_id"),
        )
    else:
        raise ValueError(
            "run_delta_pipeline needs a catalog entities relation or a "
            "state carrying a labels chain (load_catalog_state)"
        )

    if state is None:
        # No persisted state supplied: derive one IN-RUN, checkpointed — the
        # corpus-proportional derivation is paid once per catalog (resume
        # skips it), not once per stage, and the run_dir then carries a
        # reusable state.
        if catalog is None:
            raise ValueError(
                "run_delta_pipeline without a persisted state needs the "
                "catalog entities relation to derive one in-run"
            )

        def build_catalog_norm() -> DataFrame:
            recs = catalog.select(*normalize_input_columns())
            parallelism = spark.sparkContext.defaultParallelism
            if recs.rdd.getNumPartitions() < parallelism:
                recs = recs.repartition(parallelism)
            from codingchallenge_spark.functions.normalize import (
                normalize_records,
                with_token_hashes,
            )

            n = with_token_hashes(normalize_records(recs))
            if cfg.int32_prefilter:
                from codingchallenge_spark.functions.normalize import (
                    with_token_hashes32,
                )

                n = with_token_hashes32(n)
            return n.withColumn("rid_b", F.unhex("rid"))

        cat_norm = stage("catalog_norm", [], build_catalog_norm)
        tok_df_cat = stage(
            "token_df_cat",
            ["catalog_norm"],
            lambda: cstate.build_token_df(cat_norm),
        )
        idx_cat = stage(
            "sn_index_cat",
            ["catalog_norm"],
            lambda: cstate.build_sn_index(cat_norm, num_buckets=cfg.sn_buckets)[0],
        )
        tok_idx_cat = stage(
            "tok_index_cat",
            ["catalog_norm"],
            lambda: cstate.build_tok_postings(cat_norm, cfg.tok_buckets),
        )
        labels_cat = stage("labels_cat", [], lambda: labels_old_b)
        bounds_cat = cstate.bounds_from_index(idx_cat)
        state = cstate.CatalogState(
            norm=cat_norm,
            token_df=tok_df_cat,
            sn_index=cstate.resolve_sn_index(idx_cat, bounds_cat),
            sn_bounds=bounds_cat,
            sn_stored=idx_cat,
            labels=labels_cat,
            norm_paths=[ckpt.stage_path(run_dir, "catalog_norm")],
            sn_chain=[
                {
                    "path": ckpt.stage_path(run_dir, "sn_index_cat"),
                    "buckets": None,
                }
            ],
            labels_chain=[ckpt.stage_path(run_dir, "labels_cat")],
            tok_postings=tok_idx_cat,
            tok_chain=[ckpt.stage_path(run_dir, "tok_index_cat")],
            tok_buckets=cfg.tok_buckets,
        )
        labels_old_b = labels_cat  # downstream reads the persisted stage

    def build_normalize_delta() -> DataFrame:
        from codingchallenge_spark.functions.normalize import (
            normalize_records,
            with_token_hashes,
        )
        from codingchallenge_spark.sources.records import INPUT_COLUMNS

        nd = (
            normalize_records(delta_records.select(*INPUT_COLUMNS))
            .dropDuplicates(["rid"])
            # idempotency: rids already cataloged are dropped (labels are
            # the catalog's rid set; hex both sides — norm rids are hex)
            .join(
                labels_old_b.select(F.lower(F.hex("rid")).alias("rid")),
                "rid",
                "left_anti",
            )
        )
        nd = with_token_hashes(nd)
        # Delta schema follows the STATE's: a catalog persisted with
        # int32_prefilter carries th32 and the norm-chain union requires the
        # delta to carry it too (ADVICE r04 — cfg alone must not decide).
        if "th32" in state.norm.columns:
            from codingchallenge_spark.functions.normalize import (
                with_token_hashes32,
            )

            nd = with_token_hashes32(nd)
        return nd.withColumn("rid_b", F.unhex("rid"))

    norm_delta = stage("normalize_delta", [], build_normalize_delta)
    work_new = norm_delta.select(
        F.col("rid_b").alias("rid"),
        "name_norm",
        "tokens",
        "th",
        *(["th32"] if "th32" in norm_delta.columns else []),
    )

    pairs = stage(
        "pairs_delta",
        ["normalize_delta"],
        lambda: inc.incremental_candidate_pairs(
            None, cfg, sn=sn, state=state, work_new=work_new
        ),
    )
    scored = stage(
        "score_delta",
        ["pairs_delta", "normalize_delta"],
        lambda: score_pairs_fused(
            pairs,
            inc.delta_attrs(state, work_new, pairs),
            weights=cfg.weights,
            threshold=cfg.threshold,
            salt_buckets=cfg.salt_buckets,
        ),
    )
    edges = stage(
        "edges_delta",
        ["score_delta"],
        lambda: edges_from_scores(scored, threshold=cfg.threshold),
    )
    # cc_delta IS the labels-chain upsert element: new rids + every member
    # of a touched catalog entity, relabeled — exactly the set whose labels
    # the next chain read must override.
    labels_touched = stage(
        "cc_delta",
        ["edges_delta", "normalize_delta"],
        lambda: inc._touched_component_labels(
            edges,
            labels_old_b,
            new_rids=work_new.select("rid"),
            max_iterations=cfg.cc_max_iterations,
        )[0],
    )

    def build_entities() -> DataFrame:
        norm_union = state.norm.unionByName(
            norm_delta.select(*state.norm.columns)
        )
        if emit == "delta":
            return emit_entities(norm_union, labels_touched)
        labels_rest = labels_old_b.join(
            labels_touched.select("rid"), "rid", "left_anti"
        )
        return emit_entities(
            norm_union, labels_touched.unionByName(labels_rest)
        )

    entities = stage("entities_delta", ["cc_delta", "normalize_delta"], build_entities)

    if emit == "delta" and not maintain_state:
        # No manifest will record the emit mode — leave the marker that
        # makes catalog_entities_path refuse this partial sink (ADVICE r04).
        (Path(run_dir) / EMIT_DELTA_MARKER).write_text(
            "entities_delta is an upsert set (emit='delta'), not a catalog\n"
        )

    if maintain_state:
        if state.sn_chain is None or state.labels_chain is None:
            raise ValueError(
                "maintain_state=True needs a parquet-backed catalog state "
                "(state.sn_chain + state.labels_chain) — pass state from "
                "load_catalog_state / a prior run_dir, or "
                "maintain_state=False"
            )
        stage(
            "token_df",
            ["normalize_delta"],
            lambda: cstate.updated_token_df(state.token_df, norm_delta),
        )
        # Bucket-local maintenance (VERDICT r04 #2): the sn_index stage holds
        # ONLY the merged touched buckets; untouched buckets stay in the
        # prior chain elements (manifest sn_chain, latest-covering wins).
        # The global-position shift an insertion causes lives in the
        # recomputed metadata-sized bounds stage — no corpus re-sort.
        idx_touched = stage(
            "sn_index",
            ["normalize_delta"],
            lambda: cstate.merge_sn_buckets(state, norm_delta),
        )
        stage(
            "sn_bounds",
            ["sn_index"],
            lambda: cstate.merged_bounds(state.sn_bounds, idx_touched),
        )
        # Inverted-postings maintenance: APPEND-ONLY — the delta's own
        # postings become a delta-sized chain element; no catalog posting is
        # ever rewritten (only catalogs that carry a postings chain maintain
        # one — pre-postings state dirs keep the norm-explode fallback).
        if state.tok_chain is not None and state.tok_buckets:
            stage(
                "tok_index",
                ["normalize_delta"],
                lambda: cstate.build_tok_postings(
                    norm_delta, state.tok_buckets
                ),
            )
            tok_chain_next = list(state.tok_chain) + [
                ckpt.stage_path(run_dir, "tok_index")
            ]
        else:
            tok_chain_next = None
        # Touched-bucket ids for the manifest, from the PERSISTED element
        # (delta-proportional distinct over a delta-sized stage).
        touched_ids = sorted(
            r.bucket
            for r in idx_touched.select("bucket").distinct().collect()
        )
        cstate.write_state_manifest(
            run_dir,
            (state.norm_paths or [])
            + [ckpt.stage_path(run_dir, "normalize_delta")],
            sn_chain=list(state.sn_chain)
            + [
                {
                    "path": ckpt.stage_path(run_dir, "sn_index"),
                    "buckets": touched_ids,
                }
            ],
            labels_chain=list(state.labels_chain)
            + [ckpt.stage_path(run_dir, "cc_delta")],
            emit=emit,
            tok_chain=tok_chain_next,
            tok_buckets=state.tok_buckets if tok_chain_next else None,
        )
    return PipelineRun(
        entities=entities,
        executed=runner.executed,
        skipped=runner.skipped,
        run_dir=run_dir,
    )


def normalize_input_columns() -> list[str]:
    from codingchallenge_spark.sources.records import INPUT_COLUMNS

    return list(INPUT_COLUMNS)
