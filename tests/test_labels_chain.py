"""Labels overlay chain + delta-sized emit + chain compaction (VERDICT r04
#3 / ADVICE r04).

Contract under test:
- a chain of maintained ``emit="delta"`` runs writes ONLY delta-sized
  relations per run, yet ``current_entities`` over the final run_dir equals
  the full-emit chain's entity table exactly (the labels overlay resolves
  "latest element containing a rid wins");
- ``catalog_entities_path`` REFUSES a delta-emit run_dir's partial sink —
  both the manifest-recorded form and the no-manifest EMIT_DELTA marker;
- ``compact_state`` folds the three chains back to single elements and the
  compacted dir chains a further delta identically to the uncompacted one.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from codingchallenge_spark.plans import catalog_state as cstate
from codingchallenge_spark.plans.matcher import MatcherConfig
from codingchallenge_spark.plans.pipeline import (
    catalog_entities_path,
    current_entities,
    delta_entities_path,
    run_delta_pipeline,
    run_pipeline,
)

CFG = MatcherConfig()


def _labels(df) -> list[tuple[str, str]]:
    return sorted(
        (r.rid, r.entity_id) for r in df.select("rid", "entity_id").collect()
    )


@pytest.fixture(scope="module")
def corpus3(spark, tiny_fixture):
    recs = tiny_fixture.records.reset_index(drop=True)
    cat = spark.createDataFrame(recs[recs.index % 5 != 0])
    rest = recs[recs.index % 5 == 0].reset_index(drop=True)
    da = spark.createDataFrame(rest[rest.index % 3 == 0])
    db = spark.createDataFrame(rest[rest.index % 3 == 1])
    dc = spark.createDataFrame(rest[rest.index % 3 == 2])
    return cat, da, db, dc


@pytest.fixture(scope="module")
def catalog_run(spark, corpus3, tmp_path_factory):
    cat = corpus3[0]
    rd = str(tmp_path_factory.mktemp("lblcat") / "cat_run")
    run_pipeline(spark, cat, rd, CFG, input_id="lblcat")
    return rd


@pytest.fixture(scope="module")
def delta_chain(spark, corpus3, catalog_run, tmp_path_factory):
    """Two maintained emit='delta' runs chained via their state manifests."""
    _, da, db, _ = corpus3
    tmp = tmp_path_factory.mktemp("lblchain")
    d1 = str(tmp / "d1")
    run_delta_pipeline(
        spark, None, da, d1, CFG, input_id="d1",
        state=cstate.load_catalog_state(spark, catalog_run), emit="delta",
    )
    d2 = str(tmp / "d2")
    run_delta_pipeline(
        spark, None, db, d2, CFG, input_id="d2",
        state=cstate.load_catalog_state(spark, d1), emit="delta",
    )
    return d1, d2


@pytest.fixture(scope="module")
def full_chain_entities(spark, corpus3, catalog_run, tmp_path_factory):
    """The same two deltas chained with emit='full' — the reference table."""
    _, da, db, _ = corpus3
    tmp = tmp_path_factory.mktemp("lblfull")
    f1 = str(tmp / "f1")
    run_delta_pipeline(
        spark, None, da, f1, CFG, input_id="d1",
        state=cstate.load_catalog_state(spark, catalog_run),
    )
    f2 = str(tmp / "f2")
    r2 = run_delta_pipeline(
        spark, None, db, f2, CFG, input_id="d2",
        state=cstate.load_catalog_state(spark, f1),
    )
    return r2.entities


def test_delta_emit_chain_matches_full_chain(
    spark, delta_chain, full_chain_entities
):
    _, d2 = delta_chain
    got = current_entities(spark, d2)
    assert _labels(got) == _labels(full_chain_entities)
    # content rides the norm chain: full row count matches too
    assert got.count() == full_chain_entities.count()


def test_delta_emit_writes_are_delta_sized(spark, corpus3, delta_chain):
    """The per-run upsert sink holds ≤ |delta| + touched rows, NOT the
    corpus: its row count must be far below the catalog's."""
    cat = corpus3[0]
    _, d2 = delta_chain
    up = spark.read.parquet(delta_entities_path(d2))
    assert up.count() < cat.count()  # corpus-sized emit would exceed it
    # and the labels chain grew by exactly one element per run
    manifest = json.loads((Path(d2) / "state.json").read_text())
    assert len(manifest["labels_chain"]) == 3  # base + 2 deltas
    assert manifest["emit"] == "delta"


def test_catalog_entities_path_refuses_delta_emit(spark, delta_chain):
    d1, d2 = delta_chain
    for rd in (d1, d2):
        with pytest.raises(ValueError, match="emit='delta'"):
            catalog_entities_path(rd)


def test_emit_delta_marker_without_manifest(
    spark, corpus3, catalog_run, tmp_path
):
    """--emit-delta --no-maintain-state leaves no manifest; the EMIT_DELTA
    marker still makes the partial sink refuse to serve as a catalog."""
    da = corpus3[1]
    rd = str(tmp_path / "nm")
    run_delta_pipeline(
        spark, None, da, rd, CFG, input_id="nm",
        state=cstate.load_catalog_state(spark, catalog_run),
        emit="delta", maintain_state=False,
    )
    assert (Path(rd) / "EMIT_DELTA").exists()
    with pytest.raises(ValueError, match="emit='delta'"):
        catalog_entities_path(rd)


def test_compact_state_folds_chains_and_chains_on(
    spark, corpus3, delta_chain, full_chain_entities, tmp_path
):
    dc = corpus3[3]
    _, d2 = delta_chain
    cdir = str(tmp_path / "compact")
    cstate.compact_state(spark, d2, cdir, num_buckets=8)

    manifest = json.loads((Path(cdir) / "state.json").read_text())
    assert len(manifest["norm_paths"]) == 1
    assert len(manifest["sn_chain"]) == 1
    assert len(manifest["labels_chain"]) == 1

    # the compacted view equals the chain it folded
    assert _labels(
        current_entities(spark, cdir)
    ) == _labels(full_chain_entities)

    # a third delta chained from the COMPACTED dir equals the same delta
    # chained from the UNcompacted run_dir — compaction is semantics-free
    rd3 = str(tmp_path / "d3")
    run_delta_pipeline(
        spark, None, dc, rd3, CFG, input_id="d3c",
        state=cstate.load_catalog_state(spark, cdir), emit="delta",
    )
    rd4 = str(tmp_path / "d4")
    run_delta_pipeline(
        spark, None, dc, rd4, CFG, input_id="d3u",
        state=cstate.load_catalog_state(spark, d2), emit="delta",
    )
    assert _labels(current_entities(spark, rd3)) == _labels(
        current_entities(spark, rd4)
    )


def test_compact_state_builds_and_rebuckets_tok_index(
    spark, catalog_run, tmp_path
):
    """Round 6 (ADVICE r05): compaction (a) gives a PRE-postings state a
    tok_index built from the folded norm, and (b) re-buckets an existing
    index when ``tok_buckets`` is passed — tbucket recomputed over the new
    modulus, postings multiset unchanged."""
    from pyspark.sql import functions as F

    # (a) strip the postings from a copy of the catalog manifest → legacy
    # pre-postings state; compaction must add a tok_index at the default
    # modulus, not silently leave the state index-less forever.
    legacy = str(tmp_path / "legacy")
    import shutil

    shutil.copytree(catalog_run, legacy)
    mpath = Path(legacy) / "state.json"
    manifest = json.loads(mpath.read_text())
    manifest.pop("tok_chain", None)
    manifest.pop("tok_buckets", None)
    mpath.write_text(json.dumps(manifest))
    assert cstate.load_catalog_state(spark, legacy).tok_postings is None

    c1 = str(tmp_path / "c1")
    cstate.compact_state(spark, legacy, c1, num_buckets=8)
    st1 = cstate.load_catalog_state(spark, c1)
    assert st1.tok_postings is not None
    assert st1.tok_buckets == MatcherConfig().tok_buckets
    # postings content = explode of the folded norm's tokens
    want = (
        st1.norm.select(
            F.col("rid_b").alias("rid"), F.explode("tokens").alias("tok")
        )
        .groupBy()
        .count()
        .collect()[0][0]
    )
    assert st1.tok_postings.count() == want

    # (b) explicit re-bucket: modulus recorded and tbucket recomputed.
    c2 = str(tmp_path / "c2")
    cstate.compact_state(spark, c1, c2, num_buckets=8, tok_buckets=7)
    st2 = cstate.load_catalog_state(spark, c2)
    assert st2.tok_buckets == 7
    bad = st2.tok_postings.filter(
        F.col("tbucket") != F.pmod(F.xxhash64("tok"), F.lit(7)).cast("int")
    ).count()
    assert bad == 0
    # same (tok, rid) multiset as before the re-bucket
    a = sorted(
        (r.tok, bytes(r.rid).hex())
        for r in st1.tok_postings.select("tok", "rid").collect()
    )
    b = sorted(
        (r.tok, bytes(r.rid).hex())
        for r in st2.tok_postings.select("tok", "rid").collect()
    )
    assert a == b
