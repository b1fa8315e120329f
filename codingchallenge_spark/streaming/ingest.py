"""Structured Streaming ingest adapter over the staged delta pipeline (G9).

Spec position: BASELINE.json describes a BATCH pipeline, and SURVEY.md §1
scopes streaming out of the required surface — but BASELINE.json:6's
10^12-file clause is exactly the continuous-arrival regime Structured
Streaming's file source models. This module is therefore an ADAPTER, not a
new engine: each micro-batch is handed via ``foreachBatch`` to
``plans.pipeline.run_delta_pipeline`` — the same fingerprinted, staged,
delta-proportional path the ``--delta`` CLI runs. Nothing here re-implements
any pipeline semantics; every correctness property (never-split,
bridge-merge, idempotent re-ingest, batch-refines-incremental) is inherited
from the delta pipeline's own tests.

Exactly-once story (the part worth reading):

- Spark's streaming checkpoint (``out_dir/_stream_checkpoint``) tracks
  file-source offsets, so each landed file enters exactly one micro-batch.
- ``foreachBatch`` itself is at-least-once: after a failure the LAST
  uncommitted batch is replayed with the same ``batch_id``. Replays are safe
  twice over: (a) each batch's run_dir is keyed by ``batch_id`` and runs
  with ``resume=True``, so a replay of a half-finished batch resumes its
  staged suffix instead of recomputing; (b) a replay of a batch that already
  COMPLETED is detected by the catalog pointer (``out_dir/CURRENT`` already
  names that batch's run_dir) and returns as a no-op — re-running it against
  its own output would make the delta pipeline read and rewrite the same
  stage sinks.
- The pointer advances by atomic replace only after the batch's run
  completes, so a crash between run completion and offset commit leaves a
  consistent chain (the replay hits the no-op branch above).

Per-batch work is delta-proportional: the catalog pointer names a run_dir
carrying persisted catalog state (plans.catalog_state — reused normalize
chain, maintained token dfs, materialized SN key index), measured FLAT
across a 10× catalog in BENCH/BASELINE.md. The one corpus-proportional term
is the chainable ``emit="full"`` entity sink each batch writes; a production
deployment would instead ``emit="delta"`` into an Iceberg ``MERGE`` (upsert)
and keep labels in the table — the sandbox has no Iceberg runtime
(SURVEY.md §0), so this adapter keeps the chainable full emit.

Production shape: the source directory is an object-store landing zone (or
an Iceberg table scanned as a stream); ``maxFilesPerTrigger`` bounds
per-batch delta size; ``availableNow`` gives catch-up-then-stop semantics
for scheduled ingest, omit it for a continuously running query.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codingchallenge_spark.plans import catalog_state as cstate
from codingchallenge_spark.plans.matcher import MatcherConfig
from codingchallenge_spark.plans.pipeline import run_delta_pipeline
from codingchallenge_spark.sources.records import INPUT_COLUMNS, RECORDS_SCHEMA

CURRENT_POINTER = "CURRENT"


def _pointer_path(out_dir: str) -> Path:
    return Path(out_dir) / CURRENT_POINTER


def read_pointer(out_dir: str) -> str | None:
    """The run_dir of the most recently completed batch, or None."""
    p = _pointer_path(out_dir)
    if not p.exists():
        return None
    text = p.read_text().strip()
    return text or None


def _advance_pointer(out_dir: str, run_dir: str) -> None:
    """Atomically repoint CURRENT at a completed batch's run_dir."""
    p = _pointer_path(out_dir)
    tmp = p.with_suffix(".tmp")
    tmp.write_text(run_dir + "\n")
    os.replace(tmp, p)


def catalog_entities_path(run_dir: str) -> str:
    """The completed entities sink inside a pipeline run_dir.

    Same fallback order as the ``--delta`` CLI (run_pipeline.py): a delta
    run writes ``entities_delta``, a batch run ``entities``.
    """
    for ent in ("entities_delta", "entities"):
        if (Path(run_dir) / ent / "_STAGE_DONE").exists():
            return str(Path(run_dir) / ent)
    raise ValueError(
        f"{run_dir!r} holds no completed entities stage; it is not a "
        "resolved catalog run_dir"
    )


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    catalog_run_dir: str,
    cfg: MatcherConfig | None = None,
    sn: bool = True,
) -> dict:
    """One micro-batch: link ``batch_df`` against the current catalog chain.

    This is the ``foreachBatch`` body, factored out so tests (and manual
    backfills) can drive it without a streaming query. Returns a summary
    dict; the interesting replay branches are documented in the module
    docstring.
    """
    run_dir = str(Path(out_dir) / f"batch-{batch_id:06d}")
    current = read_pointer(out_dir) or catalog_run_dir
    if current == run_dir:
        # Replay of a batch whose pointer already advanced: its rows are in
        # the catalog; running would read and rewrite this run_dir's own
        # stage sinks. The idempotent anti-join would make it a no-op anyway
        # — skip the work entirely.
        return {"batch_id": batch_id, "run_dir": run_dir, "replay_noop": True}
    if batch_df.isEmpty():
        # File source can hand an empty batch (e.g. an empty landed file);
        # don't burn a run_dir or chain an empty normalize path for it.
        return {"batch_id": batch_id, "run_dir": None, "empty": True}

    state = cstate.load_catalog_state(spark, current)
    # With persisted state the catalog relation is only consumed for its
    # (rid, entity_id) labels — keep it narrow.
    catalog = spark.read.parquet(catalog_entities_path(current)).select(
        "rid", "entity_id"
    )
    run = run_delta_pipeline(
        spark,
        catalog,
        batch_df.select(*INPUT_COLUMNS),
        run_dir,
        cfg,
        input_id=f"stream:{current}|batch:{batch_id}",
        resume=True,  # replays of half-finished batches resume the suffix
        sn=sn,
        state=state,
        emit="full",  # chainable; production: emit="delta" + Iceberg MERGE
        maintain_state=True,
    )
    _advance_pointer(out_dir, run_dir)
    return {
        "batch_id": batch_id,
        "run_dir": run_dir,
        "executed": run.executed,
        "skipped": run.skipped,
    }


def start_stream_ingest(
    spark: SparkSession,
    source_path: str,
    catalog_run_dir: str,
    out_dir: str,
    cfg: MatcherConfig | None = None,
    *,
    sn: bool = True,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
):
    """Start the streaming ingest query; returns the StreamingQuery.

    ``catalog_run_dir`` must be a completed pipeline run_dir with persisted
    catalog state (any batch ``run_pipeline`` run, or a prior maintained
    delta run) — the chain grows from there, one run_dir per micro-batch
    under ``out_dir``, with ``out_dir/CURRENT`` always naming the newest.

    Restarting with the same ``out_dir`` resumes: the streaming checkpoint
    skips already-committed files, and the pointer carries the catalog chain
    forward across query restarts.
    """
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    if not cstate.has_state(catalog_run_dir):
        raise ValueError(
            f"{catalog_run_dir!r} carries no persisted catalog state "
            "(state.json); run the batch pipeline first"
        )

    reader = spark.readStream.schema(RECORDS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path).select(
        # same enforced projection as sources.records.read_records
        [F.col(c).cast("string").alias(c) for c in INPUT_COLUMNS]
    )

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            spark, batch_df, batch_id, out_dir, catalog_run_dir, cfg, sn=sn
        )

    writer = (
        stream.writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", str(Path(out_dir) / "_stream_checkpoint"))
        .queryName("ccspark-stream-ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
