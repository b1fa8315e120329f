"""State-based (delta-proportional) incremental ingest — plans.catalog_state
+ the state branch of plans.incremental + the staged delta pipeline.

Contract under test:
- the state path produces EXACTLY the self-contained path's entity table
  (which test_incremental.py already pins against batch refinement);
- the sorted-catalog SN pass reproduces the full-union-sort pair set
  restricted to delta-touching pairs, without sorting the corpus;
- the candidate set S is delta-proportional (|S| ≤ |delta| · (2w − 1));
- maintained state (token_df / sn_index) equals a from-scratch rebuild;
- the blocking plan never reads the catalog's content column (plan gate);
- the staged delta pipeline resumes after an interruption.
"""

from __future__ import annotations

import re
import shutil

import pytest
from pyspark.sql import functions as F

from codingchallenge_spark.functions.normalize import (
    normalize_records,
    with_token_hashes,
)
from codingchallenge_spark.operators.blocking import sorted_neighborhood
from codingchallenge_spark.plans import catalog_state as cstate
from codingchallenge_spark.plans.incremental import (
    _delta_sn_candidates,
    delta_sn_pairs,
    incremental_candidate_pairs,
    resolve_entities_incremental,
)
from codingchallenge_spark.plans.matcher import MatcherConfig, resolve_entities

SN_WINDOW = 4


def _partition(df) -> set[frozenset[str]]:
    clusters: dict[str, set[str]] = {}
    for r in df.select("rid", "entity_id").collect():
        clusters.setdefault(r.entity_id, set()).add(r.rid)
    return {frozenset(v) for v in clusters.values()}


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def split_corpus(spark, tiny_fixture):
    recs = tiny_fixture.records.reset_index(drop=True)
    old = spark.createDataFrame(recs[recs.index % 7 != 0])
    new = spark.createDataFrame(recs[recs.index % 7 == 0])
    return old, new


@pytest.fixture(scope="module")
def catalog(spark, split_corpus):
    old, _ = split_corpus
    cat = resolve_entities(old, MatcherConfig()).cache()
    cat.count()
    return cat


@pytest.fixture(scope="module")
def state(spark, catalog, tmp_path_factory):
    """Parquet-backed state (like a pipeline run_dir's) so the plan gates
    below see real scans with ReadSchema."""
    tmp = tmp_path_factory.mktemp("catstate")
    norm = with_token_hashes(
        normalize_records(catalog.select("repo", "path", "commit", "lang", "content"))
    ).withColumn("rid_b", F.unhex("rid"))
    norm.write.parquet(str(tmp / "norm"))
    normp = spark.read.parquet(str(tmp / "norm"))
    cstate.build_token_df(normp).write.parquet(str(tmp / "token_df"))
    stored, _ = cstate.build_sn_index(normp, num_buckets=8)
    stored.write.parquet(str(tmp / "sn_index"))
    idxp = spark.read.parquet(str(tmp / "sn_index"))
    # bounds persisted like the pipeline's sn_bounds stage (derived from the
    # persisted index, then parquet-backed — the plan gates below must see
    # the production lineage, a scan, not the derivation)
    cstate.bounds_from_index(idxp).write.parquet(str(tmp / "sn_bounds"))
    bounds = spark.read.parquet(str(tmp / "sn_bounds"))
    from codingchallenge_spark.functions.normalize import guarded_unhex

    catalog.select(
        guarded_unhex("rid", "t").alias("rid"),
        guarded_unhex("entity_id", "t").alias("entity_id"),
    ).write.parquet(str(tmp / "labels"))
    cstate.build_tok_postings(normp, 16).write.parquet(str(tmp / "tok_index"))
    return cstate.CatalogState(
        norm=normp,
        token_df=spark.read.parquet(str(tmp / "token_df")),
        sn_index=cstate.resolve_sn_index(idxp, bounds),
        sn_bounds=bounds,
        sn_stored=idxp,
        labels=spark.read.parquet(str(tmp / "labels")),
        norm_paths=[str(tmp / "norm")],
        sn_chain=[{"path": str(tmp / "sn_index"), "buckets": None}],
        labels_chain=[str(tmp / "labels")],
        tok_postings=spark.read.parquet(str(tmp / "tok_index")),
        tok_chain=[str(tmp / "tok_index")],
        tok_buckets=16,
    ), str(tmp / "norm")


@pytest.fixture(scope="module")
def work_new(spark, catalog, split_corpus):
    _, new = split_corpus
    nn = (
        normalize_records(new)
        .dropDuplicates(["rid"])
        .join(catalog.select("rid"), "rid", "left_anti")
    )
    nn = with_token_hashes(nn).withColumn("rid_b", F.unhex("rid")).cache()
    nn.count()
    return nn.select(F.col("rid_b").alias("rid"), "name_norm", "tokens", "th")


@pytest.fixture(scope="module")
def inc_nostate(spark, catalog, split_corpus):
    _, new = split_corpus
    df = resolve_entities_incremental(catalog, new, MatcherConfig()).cache()
    df.count()
    return df


def test_state_path_equals_self_contained(spark, catalog, split_corpus, state, inc_nostate):
    _, new = split_corpus
    st, _ = state
    inc = resolve_entities_incremental(catalog, new, MatcherConfig(), state=st)
    assert _partition(inc) == _partition(inc_nostate)
    # and the content invariant rides through the persisted-norm emit
    bad = inc.filter(F.sha2("content", 256) != F.col("content_sha")).count()
    assert bad == 0


def test_state_token_only_equals_self_contained(spark, catalog, split_corpus, state):
    _, new = split_corpus
    st, _ = state
    ref = resolve_entities_incremental(catalog, new, MatcherConfig(), sn=False)
    got = resolve_entities_incremental(
        catalog, new, MatcherConfig(), sn=False, state=st
    )
    assert _partition(got) == _partition(ref)


def test_delta_sn_pairs_exact(spark, catalog, split_corpus, state, work_new):
    """The sorted-catalog SN pass = full union sort restricted to pairs with
    ≥ 1 new side — pair-level equality, the strongest form of the claim."""
    st, _ = state
    union_work = (
        st.norm.select(
            F.col("rid_b").alias("rid"), "name_norm", F.lit(False).alias("is_new")
        )
        .unionByName(
            work_new.select("rid", "name_norm").withColumn("is_new", F.lit(True))
        )
    )
    batch = sorted_neighborhood(union_work, window=SN_WINDOW, dedupe=True)
    flags = union_work.select("rid", "is_new")
    f1 = flags.select(F.col("rid").alias("rid1"), F.col("is_new").alias("_n1"))
    f2 = flags.select(F.col("rid").alias("rid2"), F.col("is_new").alias("_n2"))
    batch_new = (
        batch.join(f1, "rid1").join(f2, "rid2")
        .filter(F.col("_n1") | F.col("_n2"))
        .select("rid1", "rid2", "block_key")
    )
    got = delta_sn_pairs(
        st, work_new.select("rid", "name_norm"), window=SN_WINDOW
    ).dropDuplicates(["rid1", "rid2"])

    def rows(df):
        return {
            (bytes(r.rid1).hex(), bytes(r.rid2).hex(), r.block_key)
            for r in df.collect()
        }

    assert rows(got) == rows(batch_new)


def test_candidate_set_is_delta_proportional(spark, state, work_new):
    """|S| ≤ |delta| · (2w − 1): the runtime witness that the SN delta pass
    reads a bounded neighborhood of the index, not the corpus."""
    st, _ = state
    n_delta = work_new.count()
    s_rows = _delta_sn_candidates(
        st, work_new.select("rid", "name_norm"), SN_WINDOW
    ).count()
    assert s_rows <= n_delta * (2 * SN_WINDOW - 1), (s_rows, n_delta)


def test_blocking_plan_reads_no_catalog_content(spark, state, work_new):
    """VERDICT gate: the state-path pairs plan must not scan the catalog's
    content column (no re-normalize — the persisted narrow columns only),
    and its one range sort is over the delta-proportional candidate set,
    driven by the persisted key index."""
    st, norm_path = state

    def norm_scan_cols(plan: str):
        for m in re.finditer(
            r"Location:[^\n]*" + re.escape(norm_path) + r"[^\n]*\n(?:[^\n]*\n)*?"
            r"ReadSchema: struct<([^>]*)>",
            plan,
        ):
            yield {c.split(":")[0] for c in m.group(1).split(",") if c}

    for sn in (False, True):
        pairs = incremental_candidate_pairs(
            None, MatcherConfig(), sn=sn, state=st, work_new=work_new
        )
        plan = _plan(pairs)
        for cols in norm_scan_cols(plan):
            assert "content" not in cols, (sn, cols)
        # sha2/normalize expressions must not appear anywhere (the catalog
        # is never re-normalized; the delta side arrives pre-normalized).
        assert "sha2" not in plan, sn

    # The SN candidate derivation (pre-pin: delta_sn_pairs localCheckpoints
    # S, which truncates lineage out of the pairs plan above) must consume
    # the persisted key index WITHOUT any range sort — the only range
    # exchange in the whole SN delta pass is over S itself, whose
    # delta-proportionality the |S| bound test witnesses at runtime.
    cand_plan = _plan(
        _delta_sn_candidates(st, work_new.select("rid", "name_norm"), SN_WINDOW)
    )
    assert "sn_index" in cand_plan, "SN pass must consume the key index"
    assert "rangepartitioning" not in cand_plan
    assert "sha2" not in cand_plan
    for cols in norm_scan_cols(cand_plan):
        assert "content" not in cols, cols


def test_tok_postings_path_equals_fallback(spark, state, work_new):
    """The inverted-postings catalog side produces the SAME pair multiset as
    the norm-chain explode it replaces (round 5): postings = explode(norm)
    by construction, and the tbucket prune is lossless — every probe token's
    bucket is in the IN list."""
    import dataclasses

    from codingchallenge_spark.plans.incremental import (
        incremental_token_pairs_state,
    )

    st, _ = state
    st_noidx = dataclasses.replace(st, tok_postings=None, tok_chain=None)

    def rows(df):
        return sorted(
            (bytes(r.rid1).hex(), bytes(r.rid2).hex(), r.block_key)
            for r in df.collect()
        )

    got = incremental_token_pairs_state(st, work_new, df_cap=50)
    ref = incremental_token_pairs_state(st_noidx, work_new, df_cap=50)
    assert rows(got) == rows(ref)
    assert len(rows(got)) > 0  # non-vacuous on this corpus


def test_token_pass_plan_is_bucket_pruned(spark, state, work_new):
    """Plan gate (round 5): with a postings chain the token pass scans the
    tok_index parquet with the tbucket IN literal REACHING the scan, and the
    catalog side never explodes the norm chain's token arrays (the norm
    parquet is absent from the token-pass plan entirely)."""
    from codingchallenge_spark.plans.incremental import (
        incremental_token_pairs_state,
    )

    st, norm_path = state
    plan = _plan(incremental_token_pairs_state(st, work_new, df_cap=50))
    assert "tok_index" in plan, "catalog side must read the postings index"
    assert re.search(r"PushedFilters:[^\n]*In\(tbucket", plan), plan[:2000]
    assert norm_path not in plan, "norm chain must not be scanned"


def test_updated_state_equals_rebuild(spark, state, catalog, split_corpus, tmp_path):
    """Incremental maintenance is exact: df' = df + delta counts equals a
    from-scratch df over the union, and the BUCKET-LOCAL merge (touched
    buckets rewritten, untouched untouched, bounds re-prefix-summed)
    resolves to the union order re-materialized (same keys, contiguous
    1..N positions) — without any corpus re-sort (plan gate below)."""
    _, new = split_corpus
    st, _ = state
    norm_new = (
        with_token_hashes(
            normalize_records(new).join(catalog.select("rid"), "rid", "left_anti")
        )
        .withColumn("rid_b", F.unhex("rid"))
    )
    union_norm = st.norm.select("rid_b", "tokens", "name_norm").unionByName(
        norm_new.select("rid_b", "tokens", "name_norm")
    )
    got = {
        (r.tok, r.df)
        for r in cstate.updated_token_df(st.token_df, norm_new).collect()
    }
    want = {(r.tok, r.df) for r in cstate.build_token_df(union_norm).collect()}
    assert got == want

    # bucket-local merge, persisted like the pipeline stage would persist it
    merged = cstate.merge_sn_buckets(st, norm_new)
    merged.write.parquet(str(tmp_path / "sn_touched"))
    touched = spark.read.parquet(str(tmp_path / "sn_touched"))
    bounds2 = cstate.merged_bounds(st.sn_bounds, touched)
    touched_ids = {r.bucket for r in touched.select("bucket").distinct().collect()}
    stored2 = st.sn_stored.filter(
        ~F.col("bucket").isin(sorted(touched_ids))
    ).unionByName(touched)
    rows = cstate.resolve_sn_index(stored2, bounds2).select(
        "rid", "name_norm", "pos"
    ).collect()
    n = union_norm.count()
    assert len(rows) == n
    assert sorted(r.pos for r in rows) == list(range(1, n + 1))
    # positions follow the global (name_norm, rid) order
    by_pos = sorted(rows, key=lambda r: r.pos)
    keys = [(r.name_norm, bytes(r.rid)) for r in by_pos]
    assert keys == sorted(keys)


def test_maintenance_plan_is_bucket_local(spark, state, catalog, split_corpus):
    """VERDICT r04 #2 plan gates: the maintenance plan contains NO range
    sort (the corpus re-sort the old full rebuild paid per delta) and scans
    the stored index WITH a bucket pruning filter; and VERDICT r04 #4: the
    SN candidate derivation contains no BroadcastNestedLoopJoin (the old
    non-equi bounds joins)."""
    _, new = split_corpus
    st, _ = state
    norm_new = (
        with_token_hashes(
            normalize_records(new).join(catalog.select("rid"), "rid", "left_anti")
        )
        .withColumn("rid_b", F.unhex("rid"))
    )
    plan = _plan(cstate.merge_sn_buckets(st, norm_new))
    assert "rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the touched-bucket predicate reaches the parquet scan
    assert "In(bucket" in plan, "stored-index scan must be bucket-pruned"

    work = norm_new.select(F.col("rid_b").alias("rid"), "name_norm")
    cand_plan = _plan(_delta_sn_candidates(st, work, SN_WINDOW))
    assert "BroadcastNestedLoopJoin" not in cand_plan


def test_emit_delta_is_exact_upsert(spark, catalog, split_corpus, state, inc_nostate):
    _, new = split_corpus
    st, _ = state
    up = resolve_entities_incremental(
        catalog, new, MatcherConfig(), state=st, emit="delta"
    )
    up_rows = {(r.rid, r.entity_id) for r in up.select("rid", "entity_id").collect()}
    full_rows = {
        (r.rid, r.entity_id)
        for r in inc_nostate.select("rid", "entity_id").collect()
    }
    assert up_rows <= full_rows
    up_rids = {rid for rid, _ in up_rows}
    assert up_rows == {t for t in full_rows if t[0] in up_rids}
    # every new record is in the upsert set
    new_rids = {
        r.rid for r in normalize_records(new).select("rid").collect()
    }
    assert new_rids <= up_rids


def test_delta_pipeline_resumes_after_interruption(
    spark, catalog, split_corpus, state, inc_nostate, tmp_path
):
    """VERDICT item: staged --delta checkpointing — kill after scoring,
    resume recomputes only the downstream suffix; fingerprints fold the
    catalog identity (different input_id ⇒ full rebuild)."""
    from codingchallenge_spark.plans.pipeline import run_delta_pipeline

    _, new = split_corpus
    st, _ = state
    run_dir = str(tmp_path / "d1")
    r1 = run_delta_pipeline(
        spark, catalog, new, run_dir, MatcherConfig(), input_id="cat1", state=st
    )
    assert r1.skipped == []
    assert _partition(r1.entities) == _partition(inc_nostate)

    # interruption: downstream of scoring lost
    for stg in ("edges_delta", "cc_delta", "entities_delta"):
        shutil.rmtree(tmp_path / "d1" / stg, ignore_errors=True)
    r2 = run_delta_pipeline(
        spark, catalog, new, run_dir, MatcherConfig(), input_id="cat1",
        state=st, resume=True,
    )
    assert "normalize_delta" in r2.skipped and "score_delta" in r2.skipped
    assert r2.executed[:3] == ["edges_delta", "cc_delta", "entities_delta"]
    assert _partition(r2.entities) == _partition(inc_nostate)

    # catalog identity is part of every fingerprint
    r3 = run_delta_pipeline(
        spark, catalog, new, run_dir, MatcherConfig(), input_id="cat2",
        state=st, resume=True,
    )
    assert "normalize_delta" in r3.executed
