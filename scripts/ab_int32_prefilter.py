"""A/B: th64-only scoring plan vs int32-prefilter scoring plan (E3 lever).

The narrow-crossing scorer's jaccard crossing is DRAM-bound (pass-through
twin ~50% of its wall; BENCH/BASELINE.md decomposition). This measures the
byte-halving variant: ship 31-bit truncated token hashes through the
prefilter crossing (exact-conservative lower bound — similarity.
hashed_jaccard_batch32), then recompute the exact 64-bit jaccard together
with jw/lev in the single survivor crossing. Both plans are value-identical
(tests/test_plan_quality.py::test_fused_equals_pruned).

Isolation protocol: ONE variant per JVM (a first in-process interleaved
version persisted both pair-attribute relations in one 48g heap — cache
pressure turned the B-side numbers into eviction noise, 10-27s spread on a
7s plan). The orchestrator alternates variant JVMs (A,B,A,B) so hypervisor
window drift hits both sides; each child persists only its own input and
reports its timed runs.

Usage:
  python scripts/ab_int32_prefilter.py <cores>            # orchestrate A/B
  python scripts/ab_int32_prefilter.py <cores> <variant>  # one child JVM
variant ∈ {th64, int32}.
"""
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

JVMS_PER_VARIANT = 2
RUNS_PER_JVM = 4


def child(cores: int, variant: str) -> None:
    from codingchallenge_spark.functions.normalize import (
        normalize_records,
        with_token_hashes,
        with_token_hashes32,
    )
    from codingchallenge_spark.operators.scoring import (
        fused_pair_attrs,
        fused_score_from_attrs,
    )
    from codingchallenge_spark.plans.matcher import (
        MatcherConfig,
        candidate_pairs,
    )
    from codingchallenge_spark.session import build_session
    from codingchallenge_spark.sources.records import read_records
    from bench_scaling import ensure_fixture

    spark = build_session(
        app_name=f"ab-int32-{cores}-{variant}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = MatcherConfig()
    records = read_records(
        spark, str(ensure_fixture() / "repo_files.parquet")
    ).repartition(2 * cores)
    norm = with_token_hashes(normalize_records(records))
    if variant == "int32":
        norm = with_token_hashes32(norm)
    norm = norm.persist()
    norm.count()
    pairs = candidate_pairs(norm, MatcherConfig(min_token_overlap=1))
    attrs = fused_pair_attrs(pairs, norm).repartition(2 * cores).persist()
    n = attrs.count()

    def run() -> float:
        t0 = time.perf_counter()
        fused_score_from_attrs(
            attrs, weights=cfg.weights, threshold=cfg.threshold
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run()  # warm-up
    secs = [round(run(), 2) for _ in range(RUNS_PER_JVM)]
    print(json.dumps({"variant": variant, "n_pairs": n, "secs": secs}))
    spark.stop()


def orchestrate(cores: int) -> None:
    res: dict[str, list[float]] = {"th64": [], "int32": []}
    n = None
    for _ in range(JVMS_PER_VARIANT):
        for variant in ("th64", "int32"):  # alternated — shares drift
            out = subprocess.run(
                [sys.executable, __file__, str(cores), variant],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = json.loads(out.stdout.strip().splitlines()[-1])
            res[line["variant"]].extend(line["secs"])
            n = line["n_pairs"]
    best = {k: min(v) for k, v in res.items()}
    print(
        json.dumps(
            {
                "cores": cores,
                "n_pairs": n,
                **{k: {"secs": v, "min": best[k]} for k, v in res.items()},
                "speedup": round(best["th64"] / best["int32"], 3),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 2:
        child(int(sys.argv[1]), sys.argv[2])
    else:
        orchestrate(int(sys.argv[1]))
