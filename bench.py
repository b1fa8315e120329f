#!/usr/bin/env python3
"""Per-round benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is forced to full materialization with a ``noop`` sink (all
partitions computed, nothing collected to the driver — the same shape a
cluster job has). The headline set covers every engine surface: the flagship
entity-resolution plan (multi-pass blocking → pruned Arrow scoring →
large-star/small-star CC), the relational core (scan/filter/join/agg/window),
token blocking's explode + self-join shuffle shape, MinHash-LSH dedup, text
quality metrics, and brute-force cosine top-k over embeddings.

Scaling-efficiency evidence (local[8] vs local[32]) is produced separately by
``scripts/bench_scaling.py`` and recorded in ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO_ROOT))

from codingchallenge_spark.plans import query_pack  # noqa: E402
from codingchallenge_spark.session import build_session  # noqa: E402

# Ordered headline set: name -> query_pack entry. The ER flagship runs last so
# its persist/unpersist churn never skews the relational timings.
# q_minhash_lsh_prod is the registered production-capped LSH plan (since
# round 3 it is also the 50th driver-recorded query, with a HAVING>cap
# anti-join DuckDB twin); q_minhash_lsh_pairs stays the uncapped oracle shape.
HEADLINE = [
    "q_groupby_agg",        # TPC-H Q1 shape: 600k-row hash aggregate
    "q_double_join_agg",    # lineitem ⋈ orders ⋈ customer fan-in
    "q_window_lead",        # partitioned window over 100k events
    "q_topk_per_group",     # row_number + filter (per-group top-k)
    "q_jaccard_pairs",      # blocked pair scoring, JVM-native Jaccard
    "q_dedup_fingerprint",  # order-invariant doc fingerprint dedup
    "q_minhash_lsh_prod",   # MinHash + banded LSH, production band cap
    "q_quality",            # text quality metrics (JVM-side, codegen)
    "q_cosine_topk",        # brute-force ANN baseline over embeddings
    "q_er_entities",        # flagship: full record-linkage plan + CC
]

def _force(df) -> int:
    """Materialize every partition without driver-side collect."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = build_session(
        app_name="ccspark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )
    spark.sparkContext.setLogLevel("WARN")

    queries = query_pack.queries()
    # Warm-up, off the clock: JVM + codegen + parquet footer reads, and the
    # Python worker pool (creation is serialized JVM-wide and pays the heavy
    # imports once per worker — a one-time executor cost that a steady-state
    # throughput measurement must not attribute to the first Arrow query).
    _force(queries["q_scan_project"](spark, sf_dir))
    import pandas as pd  # noqa: PLC0415

    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers * 10, numPartitions=n_workers).mapInPandas(
        lambda it: (pd.DataFrame({"id": pdf["id"]}) for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    # First DataFrame.rdd access initializes Py4J's Python-RDD serializer
    # machinery (~1.1s measured) — a session fixed cost the flagship's
    # partition-floor check would otherwise pay on the clock.
    spark.range(1).rdd.getNumPartitions()

    # Min of three timed runs per query: this shared VM sees intermittent
    # hypervisor-neighbor interference (identical runs measured 2-3× apart
    # minutes apart — BENCH/BASELINE.md documents the effect), and the
    # minimum is the standard noise-floor estimator of what the engine
    # itself costs. Three (up from two) because the first execution of a
    # plan also pays its whole-stage-codegen JIT compile — measured on the
    # flagship: 9.2 / 6.0 / 5.7s for runs 1-3 in one session — so with two
    # runs the minimum still carries JIT, not engine cost. All runs are
    # full materializations of the same plan; nothing is cached between
    # them beyond the session-level warm state every run shares.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _force(queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            # Drop relations the query persisted: Spark's CacheManager
            # substitutes cached plans by logical-plan equality, so without
            # this the repeat run would silently reuse the first run's
            # persisted normalize relation and under-measure the query.
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
