"""Per-stage wall-time decomposition of the end-to-end pipeline (E3 aid).

Times each pipeline stage separately — normalize, blocking, scoring+edges,
connected components, final emit — with the stage's input persisted, at one
parallelism level per invocation (fresh JVM). Used to attribute the e2e
scaling floor: stages whose wall time does not shrink from 8 to 32 cores are
parallelism-invariant at this fixture size (per-round job latency, broadcast
builds, Python-worker pool) and amortize at production data sizes. Results
are recorded in BENCH/BASELINE.md.

Usage: python scripts/e2e_stage_decomp.py <cores>
(requires the bench fixture; run scripts/bench_scaling.py once to create it)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))
cores = int(sys.argv[1])

from bench_scaling import ensure_fixture  # noqa: E402
from codingchallenge_spark.functions.normalize import (  # noqa: E402
    normalize_records,
    with_token_hashes,
)
from codingchallenge_spark.operators.cc import connected_components  # noqa: E402
from codingchallenge_spark.operators.scoring import (  # noqa: E402
    edges_from_scores,
    score_pairs_fused,
)
from codingchallenge_spark.plans.matcher import (  # noqa: E402
    MatcherConfig,
    candidate_pairs,
    emit_entities,
)
from pyspark.sql import functions as F  # noqa: E402
from codingchallenge_spark.session import build_session  # noqa: E402
from codingchallenge_spark.sources.records import read_records  # noqa: E402

spark = build_session(
    app_name=f"e2e-decomp-{cores}",
    master=f"local[{cores}]",
    shuffle_partitions=2 * cores,
)
spark.sparkContext.setLogLevel("ERROR")
cfg = MatcherConfig()
records = read_records(
    spark, str(ensure_fixture() / "repo_files.parquet")
).repartition(2 * cores)
records.persist().count()

REPS = 3


def timed(fn):
    """Min of REPS timed materializations (first call also warms the path)."""
    fn()  # warm: Python worker pool, codegen, broadcast builds
    secs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        secs.append(round(time.perf_counter() - t0, 2))
    return secs


def noop(df):
    df.write.format("noop").mode("overwrite").save()


results = {}

# Stage 1: normalize + token-hash materialization + binary rid — exactly
# the production normalize output (resolve_entities persists the same
# relation; the pipeline's normalize stage writes it to parquet).
norm = with_token_hashes(normalize_records(records)).withColumn(
    "rid_b", F.unhex("rid")
)
results["normalize"] = timed(lambda: noop(norm))
norm = norm.persist()
norm.count()
# Narrow binary-keyed relation every downstream stage consumes — the
# decomposition must shuffle the same 32-byte keys production does, or the
# per-stage attribution measures a plan the pipeline no longer executes.
work = norm.select(F.col("rid_b").alias("rid"), "name_norm", "tokens", "th")

# Stage 2: multi-pass blocking + meta-union (reads persisted norm).
pairs = candidate_pairs(work, cfg)
results["blocking"] = timed(lambda: noop(pairs))
pairs = pairs.persist()
pairs.count()

# Stage 3: fused scoring + edge emit (reads persisted pairs + norm).
edges = edges_from_scores(
    score_pairs_fused(pairs, work, weights=cfg.weights, threshold=cfg.threshold),
    threshold=cfg.threshold,
)
results["score_edges"] = timed(lambda: noop(edges))
edges = edges.persist()
edges.count()

# Stage 4: connected components (iterative; includes per-round actions).
nodes = work.select("rid")
results["cc"] = timed(
    lambda: noop(connected_components(edges, nodes=nodes, max_iterations=cfg.cc_max_iterations).labels)
)

# Stage 5: final emit join (labels re-derived once, persisted, then joined
# through the shared binary-rid emit contract).
labels = connected_components(
    edges, nodes=nodes, max_iterations=cfg.cc_max_iterations
).labels.persist()
labels.count()
final = emit_entities(norm, labels)
results["emit"] = timed(lambda: noop(final))

print(
    json.dumps(
        {
            "cores": cores,
            **{k: {"secs": v, "min": min(v)} for k, v in results.items()},
        }
    )
)
spark.stop()
