"""Physical-plan quality gates (SURVEY.md §4).

Correctness tests prove the operators compute the right answer; these prove
the *plans* are the ones that survive a 100× scale-up: predicates and column
projections reach the parquet scan, small dimensions broadcast, the wide
``content`` column never travels through blocking/scoring shuffles, and the
scoring stage keeps its Arrow crossings down to the designed count.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from codingchallenge_spark.functions.normalize import (
    normalize_records,
    with_token_hashes,
)
from codingchallenge_spark.operators.scoring import (
    score_pairs_fused,
    score_pairs_pruned,
)
from codingchallenge_spark.plans.matcher import MatcherConfig, candidate_pairs
from codingchallenge_spark.plans.query_pack import queries

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    df = queries()["q_filter_pushdown"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    # Both predicates are sargable and must be pushed, not just evaluated post-scan.
    assert re.search(r"PushedFilters: \[.*GreaterThan\(l_quantity", plan), plan
    assert re.search(r"PushedFilters: \[.*EqualTo\(l_returnflag,R\)", plan), plan


def test_column_pruning_reaches_scan(spark):
    df = queries()["q_scan_project"](spark, SF)
    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    # 3-column projection over a 16-column table: the scan reads exactly 3.
    assert read_cols == {"l_orderkey", "l_linenumber", "l_quantity"}, read_cols


def test_small_dims_broadcast(spark):
    df = queries()["q_broadcast_join"](spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_whole_stage_codegen_covers_quality_metrics(spark):
    # Text-analysis expressions must stay JVM-side: no Python eval nodes.
    # (The stopword higher-order filter is interpreted-eval — Spark can't
    # codegen higher-order functions — but it must never become a UDF.)
    df = queries()["q_quality"](spark, SF)
    plan = _plan(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    # Since round 6 the query carries a partition-floor Exchange, so the lazy
    # AQE plan prints without codegen markers (isFinalPlan=false hides the
    # WholeStageCodegen wrapping). Execute THIS DataFrame's QueryExecution
    # (collect of 50 rows at sf0.001 — a noop write would clone the plan and
    # leave df's own AQE state unfinalized) and assert on the FINAL plan.
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in final and "BatchEvalPython" not in final
    assert "*(" in final or "WholeStageCodegen" in final, final


def test_content_never_enters_blocking_or_scoring(spark, tiny_records):
    """The wide column must stay at the scan/normalize boundary: blocking and
    scoring plans may only carry (rid, name_norm, tokens, th) derivatives."""
    # Other tests may have persisted plans that carry `content`; cache
    # substitution would splice their InMemoryRelation description into this
    # plan string and fail the assertion spuriously.
    spark.catalog.clearCache()
    cfg = MatcherConfig()
    norm = with_token_hashes(normalize_records(tiny_records)).select(
        "rid", "name_norm", "tokens", "th"
    )
    pairs = candidate_pairs(norm, cfg)
    scored = score_pairs_fused(pairs, norm, weights=cfg.weights,
                               threshold=cfg.threshold)
    plan = _plan(scored)
    assert "content" not in plan, "wide column leaked into the scoring plan"


def test_scoring_python_crossings_bounded(spark, tiny_records):
    """The production (fused) scoring plan has exactly TWO narrow
    ArrowEvalPython crossings — jaccard over (th1, th2), then jw/lev over
    survivor names — and NO mapInPandas: ArrowEvalPython ships only the UDF
    argument columns, so rids/jaccard never enter Python. The mapInPandas
    variant (score_pairs_fused_arrow) must stay at exactly one crossing."""
    from codingchallenge_spark.operators.scoring import score_pairs_fused_arrow

    cfg = MatcherConfig()
    norm = with_token_hashes(normalize_records(tiny_records)).select(
        "rid", "name_norm", "tokens", "th"
    )
    pairs = candidate_pairs(norm, cfg)

    fused = score_pairs_fused(pairs, norm, weights=cfg.weights,
                              threshold=cfg.threshold)
    plan = _plan(fused)
    # formatted explain prints each node in the tree AND the detail section —
    # count detail headers "(NN) ArrowEvalPython".
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 2, plan
    assert "MapInPandas" not in plan, plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere

    arrow = score_pairs_fused_arrow(pairs, norm, weights=cfg.weights,
                                    threshold=cfg.threshold)
    plan2 = _plan(arrow)
    assert len(re.findall(r"\(\d+\) MapInPandas", plan2)) == 1, plan2
    assert "BatchEvalPython" not in plan2

    pruned = score_pairs_pruned(pairs, norm, weights=cfg.weights,
                                threshold=cfg.threshold)
    plan3 = _plan(pruned)
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan3)) >= 2, plan3
    assert "BatchEvalPython" not in plan3

    # int32-prefilter variant: still exactly two crossings — the half-width
    # jac32 prefilter, then ONE survivor node evaluating exact jaccard + jw
    # + lev as adjacent scalar UDFs (th64 only ever crosses for survivors).
    from codingchallenge_spark.functions.normalize import with_token_hashes32

    norm32 = with_token_hashes32(
        with_token_hashes(normalize_records(tiny_records))
    ).select("rid", "name_norm", "tokens", "th", "th32")
    fused32 = score_pairs_fused(pairs, norm32, weights=cfg.weights,
                                threshold=cfg.threshold)
    plan4 = _plan(fused32)
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan4)) == 2, plan4
    assert "MapInPandas" not in plan4 and "BatchEvalPython" not in plan4


def test_fused_equals_pruned(spark, tiny_records):
    """Exactness across all three scorer plans: the production narrow-crossing
    scorer, the mapInPandas fused kernel, and the two-crossing pruned scorer
    yield the identical (rid1, rid2, jw, lev, jaccard, score) multiset."""
    from codingchallenge_spark.operators.scoring import score_pairs_fused_arrow

    cfg = MatcherConfig()
    norm = with_token_hashes(normalize_records(tiny_records)).persist()
    pairs = candidate_pairs(norm, cfg).persist()
    a = score_pairs_pruned(pairs, norm, weights=cfg.weights,
                           threshold=cfg.threshold)
    b = score_pairs_fused(pairs, norm, weights=cfg.weights,
                          threshold=cfg.threshold)
    c = score_pairs_fused_arrow(pairs, norm, weights=cfg.weights,
                                threshold=cfg.threshold)
    from codingchallenge_spark.functions.normalize import with_token_hashes32

    d = score_pairs_fused(pairs, with_token_hashes32(norm),
                          weights=cfg.weights, threshold=cfg.threshold)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    rc = sorted(map(tuple, c.collect()))
    rd = sorted(map(tuple, d.collect()))
    assert ra == rb
    assert ra == rc
    assert ra == rd  # int32 prefilter is exact: survivors recompute on th64
    norm.unpersist()
    pairs.unpersist()


def test_simhash64_plan_has_no_python(spark):
    """simhash64 is explode + 64 codegen'd bit-sum aggregates — the retired
    per-row pandas UDF must never creep back in."""
    df = queries()["q_simhash64"](spark, SF)
    plan = _plan(df)
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan, f"{node} in simhash64 plan"


def _window_partition_specs(df) -> list[str]:
    """Partition-spec strings of every Window node in the optimized plan.

    Window prints as `Window [fns], [partitionSpec], [orderSpec]` — an empty
    second bracket group is the single-partition trap (and is what Catalyst
    folds a constant partition key into).
    """
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = []
    for line in plan.splitlines():
        stripped = line.lstrip(" +-:")
        if stripped.startswith("Window "):
            parts = re.findall(r"\[[^\[\]]*\]", stripped)
            if len(parts) >= 2:
                specs.append(parts[-2])
    return specs


def test_sn_has_no_single_partition_window(spark, tiny_records):
    """Both SN passes window over real (unfoldable) partition keys — no
    'No Partition Defined for Window' degradation anywhere in the plan."""
    from codingchallenge_spark.operators.blocking import sorted_neighborhood

    norm = normalize_records(tiny_records).select("rid", "name_norm")
    sn = sorted_neighborhood(norm, window=4, num_buckets=8)
    for spec in _window_partition_specs(sn):
        assert spec != "[]", "single-partition Window in SN plan"


def test_flagship_has_no_single_partition_window(spark, tiny_records):
    from codingchallenge_spark.plans.matcher import resolve_entities

    out = resolve_entities(tiny_records, MatcherConfig())
    for spec in _window_partition_specs(out):
        assert spec != "[]", "single-partition Window in flagship plan"


def test_no_cartesian_anywhere_in_matcher(spark, tiny_records):
    cfg = MatcherConfig()
    from codingchallenge_spark.plans.matcher import resolve_entities

    out = resolve_entities(tiny_records, cfg)
    plan = _plan(out)
    assert "CartesianProduct" not in plan, plan


def test_cc_round_plan_shape(spark):
    """One large-star/small-star round is two single-exchange window-min
    passes plus one dedup — no join operator anywhere (the groupBy+join form
    this replaced shuffled the edge list twice per step), and at most 3
    exchanges for the whole round."""
    from codingchallenge_spark.operators.cc import (
        _canon_edges,
        _large_star_raw,
        _small_star_raw,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], ["src", "dst"]
    )
    round_df = _canon_edges(_small_star_raw(_large_star_raw(edges)))
    plan = _plan(round_df)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct"):
        assert node not in plan, f"{node} in CC round plan"
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_cc_adaptive_round_narrows_exchanges(spark):
    """With an adaptive partition count n, every round exchange is an
    explicit n-way repartition that REPLACES the implicit
    shuffle-partition-wide exchange (hash partitioning on the window/dedup
    keys satisfies their required distribution) — same exchange count, no
    joins, and no exchange at the session's shuffle-partition width. This is
    what stops per-round task-scheduling overhead dominating when the live
    edge set is small (local runs; the shrinking tail rounds at scale)."""
    from codingchallenge_spark.operators.cc import (
        _canon_edges,
        _large_star_raw,
        _small_star_raw,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], ["src", "dst"]
    )
    n = 2
    round_df = _canon_edges(_small_star_raw(_large_star_raw(edges, n), n), n)
    plan = _plan(round_df)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct"):
        assert node not in plan, f"{node} in adaptive CC round plan"
    # Every exchange is one of our explicit n-way repartitions; none were
    # ADDED on top of them by the planner to meet a distribution requirement
    # (that would show as an ENSURE_REQUIREMENTS exchange at the session's
    # shuffle-partition width).
    assert "ENSURE_REQUIREMENTS" not in plan, plan
    n_exchanges = plan.count("REPARTITION_BY_NUM")
    assert n_exchanges >= 1, plan
    assert plan.count(f"hashpartitioning") == plan.count(f", {n}), REPARTITION_BY_NUM"), plan


def _simple_plan(df) -> str:
    """`simple` explain: one line per physical node with the join type inline
    (`BroadcastHashJoin [k], [k], Inner, BuildRight`) — what the broadcast-
    guard gates below need to tell a corpus-side broadcast from the
    deliberate tiny-list anti-join broadcasts."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def _assert_selfjoin_guarded(df, label: str) -> None:
    """The derived self-join must be a ShuffledHashJoin; the only broadcast
    hash joins allowed are the LeftAnti hot-key guards (tiny by construction).
    Locks in the shuffle_hash hints against config/Spark-version drift —
    Catalyst under-estimates exploded/UDF-derived relations and would
    otherwise broadcast the ENTIRE corpus side (commits ce2a8c6/05fcdda
    class of bug)."""
    plan = _simple_plan(df)
    assert "ShuffledHashJoin" in plan, f"{label}: self-join not shuffle-hash:\n{plan}"
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line:
            assert "LeftAnti" in line, (
                f"{label}: corpus-side BroadcastHashJoin:\n{line}\n{plan}"
            )
    assert "BroadcastNestedLoopJoin" not in plan, label
    assert "CartesianProduct" not in plan, label


def test_token_blocking_selfjoin_guarded(spark, tiny_records):
    from codingchallenge_spark.operators.blocking import token_blocking

    norm = normalize_records(tiny_records).select("rid", "name_norm", "tokens")
    _assert_selfjoin_guarded(token_blocking(norm), "token_blocking")


def test_minhash_lsh_selfjoin_guarded(spark):
    from codingchallenge_spark.operators.dedup import minhash_lsh_pairs

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    _assert_selfjoin_guarded(
        minhash_lsh_pairs(d, "doc_id", "toks", k=8, bands=4), "minhash_lsh"
    )


def test_ngram_selfjoin_guarded(spark):
    from codingchallenge_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    _assert_selfjoin_guarded(
        ngram_jaccard_pairs(docs, "doc_id", "text", ["lang", "n_chars"]),
        "ngram_jaccard",
    )


def test_lsh_ann_selfjoin_guarded(spark):
    from codingchallenge_spark.operators.ann import lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _assert_selfjoin_guarded(lsh_topk(emb, k=5), "lsh_topk")


def test_ivf_ann_cell_join_guarded(spark):
    from codingchallenge_spark.operators.ann import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # Production assignment path (arrow): centroids live in the UDF closure,
    # so the ONLY join in the plan is the cell join — it must shuffle.
    _assert_selfjoin_guarded(ivf_topk(emb, k=5, assign="arrow"), "ivf_topk")


def test_incremental_token_join_guarded(spark, tiny_records):
    """The delta-side token join is the same exploded-relation shape whose
    size estimate Catalyst gets wrong (commits ce2a8c6/05fcdda): the corpus
    side must shuffle, never broadcast."""
    from codingchallenge_spark.plans.incremental import incremental_token_pairs

    work = normalize_records(tiny_records).select(
        "rid", "name_norm", "tokens", (F.crc32("rid") % 7 == 0).alias("is_new")
    )
    _assert_selfjoin_guarded(
        incremental_token_pairs(work, df_cap=100), "incremental_token_pairs"
    )


def test_exchange_count_in_token_blocking(spark, tiny_records):
    """Token blocking = explode → hot-key anti-join → self-join: the self-join
    needs exactly one exchange per side on `tok` (plus the tiny hot-list
    aggregation); no additional repartition creeps in."""
    from codingchallenge_spark.operators.blocking import token_blocking

    norm = normalize_records(tiny_records).select("rid", "name_norm", "tokens")
    plan = _plan(token_blocking(norm))
    # hashpartitioning on tok for the join; the rid1<rid2 filter must NOT
    # force an extra shuffle.
    assert plan.count("Exchange hashpartitioning") <= 4, plan
