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
]


@dataclass
class PipelineRun:
    entities: DataFrame
    executed: list[str]
    skipped: list[str]
    run_dir: str


# Bump whenever any stage's OUTPUT SCHEMA or on-disk semantics change: the
# token is folded into every stage fingerprint, so --resume against a run_dir
# written by older code rebuilds instead of loading a stale-schema checkpoint
# (e.g. v2 added the `th` column to the normalize stage — resuming a v1
# run_dir would otherwise fail on norm.select(..., 'th'); v3 switched the
# blocking/scoring/cc stages to 32-byte binary rids).
PIPELINE_SCHEMA_VERSION = 3


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
    executed: list[str] = []
    skipped: list[str] = []
    fps: dict[str, str] = {}

    def stage(name: str, upstream: list[str], build) -> DataFrame:
        up_fp = "|".join(fps[u] for u in upstream)
        fp = _fingerprint(cfg, input_id, up_fp, name)
        fps[name] = fp
        if resume and ckpt.is_done(run_dir, name, fp):
            ckpt.record_skip(run_dir, name, fp)
            skipped.append(name)
        else:
            ckpt.write_stage(build(), run_dir, name, fp)
            executed.append(name)
        return ckpt.load_stage(spark, run_dir, name)

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
        return with_token_hashes(normalize_records(recs)).withColumn(
            "rid_b", F.unhex("rid")
        )

    norm = stage("normalize", [], build_normalize)
    norm_narrow = norm.select(
        F.col("rid_b").alias("rid"), "name_norm", "tokens", "th"
    )

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
    return PipelineRun(
        entities=entities, executed=executed, skipped=skipped, run_dir=run_dir
    )
