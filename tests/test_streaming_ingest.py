"""Structured Streaming ingest adapter (codingchallenge_spark.streaming.ingest,
SURVEY.md §2.9 G9).

Contract under test — the adapter adds NO semantics of its own, so these
tests pin the glue, not the linkage (which test_incremental*.py own):

- a stream of landed files, one micro-batch each, produces EXACTLY the
  entity table of manually chaining run_delta_pipeline over the same splits;
- restarting a query with the same out_dir processes only newly landed
  files (streaming checkpoint) and carries the catalog chain forward
  (CURRENT pointer) without re-running completed batches;
- foreachBatch replay windows are safe: a replay of a completed batch is a
  pointer-detected no-op, a replay after a crash between run completion and
  pointer advance resumes with every stage skipped, and empty batches
  neither burn a run_dir nor advance the pointer.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import pytest

from codingchallenge_spark.plans import catalog_state as cstate
from codingchallenge_spark.plans.matcher import MatcherConfig
from codingchallenge_spark.plans.pipeline import run_delta_pipeline, run_pipeline
from codingchallenge_spark.sources.records import RECORDS_SCHEMA
from codingchallenge_spark.streaming.ingest import (
    catalog_entities_path,
    ingest_batch,
    read_pointer,
    start_stream_ingest,
)

CFG = MatcherConfig()
AWAIT_SECS = 600


@pytest.fixture(scope="module")
def corpus3(tiny_fixture):
    """catalog / delta-A / delta-B split of the tiny fixture (pandas)."""
    recs = tiny_fixture.records.reset_index(drop=True)
    cat = recs[recs.index % 5 != 0]
    deltas = recs[recs.index % 5 == 0]
    da = deltas[deltas.index % 2 == 0]
    db = deltas[deltas.index % 2 == 1]
    return cat, da, db


@pytest.fixture(scope="module")
def catalog_run(spark, corpus3, tmp_path_factory):
    """A completed batch run_dir — carries persisted catalog state."""
    cat, _, _ = corpus3
    rd = str(tmp_path_factory.mktemp("streamcat") / "cat_run")
    run_pipeline(
        spark, spark.createDataFrame(cat), rd, CFG, input_id="streamcat"
    )
    assert cstate.has_state(rd)
    return rd


def _land(src: Path, name: str, pdf, mtime: float) -> Path:
    """Write one delta as a single parquet file with a pinned mtime (the
    file source orders files by modification time)."""
    src.mkdir(parents=True, exist_ok=True)
    p = src / name
    pdf.to_parquet(p, index=False)
    os.utime(p, (mtime, mtime))
    return p


def _labels(df) -> list[tuple[str, str]]:
    return sorted(
        (r.rid, r.entity_id) for r in df.select("rid", "entity_id").collect()
    )


def _stage_markers(run_dir: str) -> dict[str, float]:
    return {
        str(m): m.stat().st_mtime
        for m in Path(run_dir).glob("*/_STAGE_DONE")
    }


def test_stream_matches_manual_chain(spark, corpus3, catalog_run, tmp_path):
    """availableNow + maxFilesPerTrigger=1 over two landed files ==
    manually chaining run_delta_pipeline over the same two deltas."""
    _, da, db = corpus3
    src, out = tmp_path / "src", str(tmp_path / "out")
    t0 = time.time() - 1000
    _land(src, "delta-a.parquet", da, t0)
    _land(src, "delta-b.parquet", db, t0 + 100)

    q = start_stream_ingest(spark, str(src), catalog_run, out, CFG)
    assert q.awaitTermination(AWAIT_SECS), "stream did not drain in time"

    ptr = read_pointer(out)
    assert ptr is not None and ptr.endswith("batch-000001")
    streamed = spark.read.parquet(catalog_entities_path(ptr))

    # Manual chain over the same splits and states.
    cat_ent = spark.read.parquet(catalog_entities_path(catalog_run)).select(
        "rid", "entity_id"
    )
    m1 = str(tmp_path / "m1")
    r1 = run_delta_pipeline(
        spark, cat_ent, spark.createDataFrame(da), m1, CFG, input_id="m1",
        state=cstate.load_catalog_state(spark, catalog_run),
    )
    r2 = run_delta_pipeline(
        spark, r1.entities.select("rid", "entity_id"),
        spark.createDataFrame(db), str(tmp_path / "m2"), CFG, input_id="m2",
        state=cstate.load_catalog_state(spark, m1),
    )
    assert _labels(streamed) == _labels(r2.entities)


def test_stream_restart_processes_only_new_files(
    spark, corpus3, catalog_run, tmp_path
):
    """Second query run with the same out_dir skips committed files and
    chains from the pointer instead of re-running batch 0."""
    cat, da, db = corpus3
    src, out = tmp_path / "src", str(tmp_path / "out")
    t0 = time.time() - 1000
    _land(src, "delta-a.parquet", da, t0)

    q1 = start_stream_ingest(spark, str(src), catalog_run, out, CFG)
    assert q1.awaitTermination(AWAIT_SECS)
    ptr1 = read_pointer(out)
    assert ptr1 is not None and ptr1.endswith("batch-000000")
    markers_before = _stage_markers(ptr1)
    assert markers_before, "batch 0 left no stage markers"
    norm_marker = str(Path(ptr1) / "normalize_delta" / "_STAGE_DONE")

    _land(src, "delta-b.parquet", db, t0 + 100)
    q2 = start_stream_ingest(spark, str(src), catalog_run, out, CFG)
    assert q2.awaitTermination(AWAIT_SECS)
    ptr2 = read_pointer(out)
    assert ptr2 is not None and ptr2.endswith("batch-000001")
    # superseded batch 0 was pruned down to its normalize_delta sink (still
    # referenced by the state manifest's norm-path chain), NOT rebuilt:
    m_after = _stage_markers(ptr1)
    assert set(m_after) == {norm_marker}
    assert m_after[norm_marker] == markers_before[norm_marker]
    assert not (Path(ptr1) / "entities_delta").exists()

    final = spark.read.parquet(catalog_entities_path(ptr2))
    assert final.count() == len(cat) + len(da) + len(db)
    # the pruned chain still loads as a valid catalog state
    from codingchallenge_spark.plans import catalog_state as cstate

    st = cstate.load_catalog_state(spark, ptr2)
    assert st.norm.count() == len(cat) + len(da) + len(db)


def test_ingest_batch_replay_and_empty(spark, corpus3, catalog_run, tmp_path):
    """The three foreachBatch edge branches, driven directly."""
    _, da, _ = corpus3
    out = str(tmp_path)
    delta = spark.createDataFrame(da)

    res = ingest_batch(spark, delta, 0, out, catalog_run, CFG)
    assert res["executed"] and not res.get("replay_noop")
    run_dir = res["run_dir"]
    assert read_pointer(out) == run_dir

    # Replay of a COMPLETED batch (pointer already advanced) → no-op.
    res2 = ingest_batch(spark, delta, 0, out, catalog_run, CFG)
    assert res2.get("replay_noop")

    # Crash window: run completed but pointer not yet advanced. The replay
    # re-enters with the same fingerprints → every stage skipped, pointer
    # restored.
    Path(out, "CURRENT").unlink()
    res3 = ingest_batch(spark, delta, 0, out, catalog_run, CFG)
    assert res3["executed"] == [] and set(res3["skipped"]) >= {
        "normalize_delta", "pairs_delta", "entities_delta"
    }
    assert read_pointer(out) == run_dir

    # Empty micro-batch: no run_dir, pointer unchanged.
    empty = spark.createDataFrame([], schema=RECORDS_SCHEMA)
    res4 = ingest_batch(spark, empty, 1, out, catalog_run, CFG)
    assert res4.get("empty") and res4["run_dir"] is None
    assert read_pointer(out) == run_dir


def test_out_dir_reuse_refused(spark, corpus3, catalog_run, tmp_path):
    """A recreated streaming checkpoint over a used out_dir restarts batch
    numbering over NEW files — both collision shapes must fail loudly
    instead of silently serving the old batch's results."""
    _, da, db = corpus3
    pa, pb = tmp_path / "a.parquet", tmp_path / "b.parquet"
    da.to_parquet(pa, index=False)
    db.to_parquet(pb, index=False)
    out = str(tmp_path / "out")

    res = ingest_batch(spark, spark.read.parquet(str(pa)), 0, out, catalog_run, CFG)
    assert res["executed"]

    # pointer intact: digest mismatch on the completed batch
    with pytest.raises(ValueError, match="DIFFERENT input-file set"):
        ingest_batch(spark, spark.read.parquet(str(pb)), 0, out, catalog_run, CFG)

    # pointer lost in the same scenario: the run_dir sentinel still refuses
    Path(out, "CURRENT").unlink()
    with pytest.raises(ValueError, match="different identity"):
        ingest_batch(spark, spark.read.parquet(str(pb)), 0, out, catalog_run, CFG)


def test_malformed_landed_file_fails_loudly(spark, corpus3, catalog_run, tmp_path):
    """A landed file missing a required column must fail the batch (so its
    offsets never commit), not silently ingest nulls."""
    _, da, _ = corpus3
    bad = da.drop(columns=["content"])
    p = tmp_path / "bad.parquet"
    bad.to_parquet(p, index=False)
    # mirror the streaming read: enforced schema fills the column with nulls
    bdf = spark.read.schema(RECORDS_SCHEMA).parquet(str(p))
    with pytest.raises(ValueError, match="null required columns"):
        ingest_batch(spark, bdf, 0, str(tmp_path / "out"), catalog_run, CFG)


def test_start_requires_persisted_state(spark, tmp_path):
    with pytest.raises(ValueError, match="no persisted catalog state"):
        start_stream_ingest(
            spark, str(tmp_path / "src"), str(tmp_path / "nostate"),
            str(tmp_path / "out"), CFG,
        )
