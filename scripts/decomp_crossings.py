"""Transport-vs-kernel decomposition of the narrow-crossing scorer (E3 aid).

For each Arrow crossing in the production scoring plan, times a PASS-THROUGH
twin (identical Arrow traffic, zero kernel work) against the real kernel, at
one parallelism level per invocation (fresh JVM). If pass-through cost
dominates and scales at the same 8->32 ratio as the full plan, the scaling
gap is the JVM->Arrow->pandas memory path — an environment bound, not engine
overhead. Results are recorded in BENCH/BASELINE.md's decomposition table.

Usage: python scripts/decomp_crossings.py <cores>
(requires the bench fixture; run scripts/bench_scaling.py once to create it)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))
cores = int(sys.argv[1])
import numpy as np
import pandas as pd
from codingchallenge_spark.functions.normalize import normalize_records, with_token_hashes
from codingchallenge_spark.functions.similarity import (
    hashed_jaccard_udf, jaro_winkler_udf, levenshtein_ratio_udf,
)
from codingchallenge_spark.operators.scoring import fused_pair_attrs, fused_score_from_attrs
from codingchallenge_spark.plans.matcher import MatcherConfig, candidate_pairs
from codingchallenge_spark.session import build_session
from codingchallenge_spark.sources.records import read_records
from pyspark.sql import functions as F

spark = build_session(app_name=f"decomp-{cores}", master=f"local[{cores}]", shuffle_partitions=2*cores)
spark.sparkContext.setLogLevel("ERROR")
cfg = MatcherConfig()
from bench_scaling import ensure_fixture  # noqa: E402 (needs sys.path above)

records = read_records(
    spark, str(ensure_fixture() / "repo_files.parquet")
).repartition(2 * cores)
norm = with_token_hashes(normalize_records(records)).persist(); norm.count()
pairs = candidate_pairs(norm, MatcherConfig(min_token_overlap=1))
attrs = fused_pair_attrs(pairs, norm).repartition(2*cores).persist()
n = attrs.count()
w, thr = cfg.weights, cfg.threshold
min_jac = (thr - w["jw"] - w["lev"]) / w["jaccard"]

@F.pandas_udf("double")
def nop_pair_arrays(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(np.ones(len(a)))

@F.pandas_udf("double")
def nop_pair_strs(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(np.ones(len(a)))

pre = attrs.filter(F.least(F.size("th1"), F.size("th2")) >= F.lit(min_jac) * F.greatest(F.size("th1"), F.size("th2")))
surv = pre.withColumn("jaccard", hashed_jaccard_udf("th1","th2")).filter(F.col("jaccard") >= F.lit(min_jac))\
          .select("name1","name2","jaccard").persist()
surv.count()

plans = {
    "jac_transport": lambda: pre.select(nop_pair_arrays("th1","th2").alias("x")),
    "jac_kernel":    lambda: pre.select(hashed_jaccard_udf("th1","th2").alias("x")),
    "names_transport": lambda: surv.select(nop_pair_strs("name1","name2").alias("x")),
    "names_kernel":  lambda: surv.withColumns({"jw": jaro_winkler_udf("name1","name2"),
                                               "lev": levenshtein_ratio_udf("name1","name2")}).select("jw","lev"),
    "full":          lambda: fused_score_from_attrs(attrs, weights=w, threshold=thr),
}
def run(fn):
    t0 = time.perf_counter(); fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
for fn in plans.values(): run(fn)
res = {}
for i in range(4):
    for name, fn in plans.items():
        res.setdefault(name, []).append(round(run(fn), 2))
print(json.dumps({"cores": cores, "n_pairs": n, "n_survivors": surv.count(),
                  **{k: {"secs": v, "min": min(v)} for k, v in res.items()}}))
spark.stop()
