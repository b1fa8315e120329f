#!/usr/bin/env python3
"""Capture .explain('formatted') for headline queries into plans/r06/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt. Plan-only (no execution).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO_ROOT))

from codingchallenge_spark.plans import query_pack  # noqa: E402
from codingchallenge_spark.session import build_session  # noqa: E402

HEADLINE = [
    "q_groupby_agg", "q_double_join_agg", "q_window_lead", "q_topk_per_group",
    "q_jaccard_pairs", "q_dedup_fingerprint", "q_minhash_lsh_prod",
    "q_quality", "q_cosine_topk", "q_er_entities",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="ccspark-plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = _REPO_ROOT / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    queries = query_pack.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
