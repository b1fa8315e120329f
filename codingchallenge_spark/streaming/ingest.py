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
  twice over: (a) each batch's run_dir is keyed by ``batch_id`` AND the
  micro-batch's input-file set (the digest rides the stage fingerprints and
  the catalog pointer), and runs with ``resume=True`` — so a replay of a
  half-finished batch resumes its staged suffix instead of recomputing;
  (b) a replay of a batch that already COMPLETED is detected by the catalog
  pointer (``out_dir/CURRENT`` already names that batch's run_dir with the
  same file digest) and returns as a no-op — re-running it against its own
  output would make the delta pipeline read and rewrite the same sinks.
- The pointer advances by atomic replace only after the batch's run
  completes, so a crash between run completion and offset commit leaves a
  consistent chain (the replay hits the no-op branch above).
- The failure mode the keying exists for: deleting and recreating the
  streaming checkpoint against a REUSED out_dir restarts batch numbering at
  0 over new files. Both collision shapes are detected and REFUSED loudly
  (pointer digest mismatch; per-run_dir ``INGEST_ID`` sentinel mismatch)
  instead of silently serving a stale batch's results or corrupting the
  normalize chain — reprocessing needs a fresh ``out_dir``.

Per-batch work is delta-proportional: the catalog pointer names a run_dir
carrying persisted catalog state (plans.catalog_state — reused normalize
chain, maintained token dfs, materialized SN key index), measured FLAT
across a 10× catalog in BENCH/BASELINE.md. Two corpus-proportional terms
remain, both bounded deliberately: the chainable ``emit="full"`` entity sink
the CURRENT batch writes (a production deployment would ``emit="delta"``
into an Iceberg ``MERGE``; no Iceberg runtime in this sandbox, SURVEY.md
§0), and disk growth — bounded by :func:`prune_superseded`, which after
each completed batch strips every stage sink of older run_dirs EXCEPT their
``normalize_delta`` (still referenced by the state manifest's norm-path
chain; the chain itself grows one small delta-sized parquet per batch and
would be compacted by a periodic batch re-run at production scale).

Production shape: the source directory is an object-store landing zone (or
an Iceberg table scanned as a stream); ``maxFilesPerTrigger`` bounds
per-batch delta size; ``availableNow`` gives catch-up-then-stop semantics
for scheduled ingest, omit it for a continuously running query.
"""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codingchallenge_spark.plans import catalog_state as cstate
from codingchallenge_spark.plans.matcher import MatcherConfig
from codingchallenge_spark.plans.pipeline import (
    catalog_entities_path,
    run_delta_pipeline,
)
from codingchallenge_spark.sources.records import INPUT_COLUMNS, RECORDS_SCHEMA

CURRENT_POINTER = "CURRENT"
INGEST_ID_FILE = "INGEST_ID"
# Stage sinks still needed from a SUPERSEDED batch run_dir: the state
# manifest's norm-path chain references every batch's normalize_delta.
PRUNE_KEEP = {"normalize_delta", INGEST_ID_FILE}


def _pointer_path(out_dir: str) -> Path:
    return Path(out_dir) / CURRENT_POINTER


def _read_pointer_full(out_dir: str) -> tuple[str | None, str | None]:
    """(run_dir, input-file digest) of the newest completed batch."""
    p = _pointer_path(out_dir)
    if not p.exists():
        return None, None
    lines = p.read_text().splitlines()
    run_dir = lines[0].strip() if lines else ""
    digest = lines[1].strip() if len(lines) > 1 else None
    return (run_dir or None), (digest or None)


def read_pointer(out_dir: str) -> str | None:
    """The run_dir of the most recently completed batch, or None."""
    return _read_pointer_full(out_dir)[0]


def _advance_pointer(out_dir: str, run_dir: str, digest: str) -> None:
    """Atomically repoint CURRENT at a completed batch's run_dir."""
    p = _pointer_path(out_dir)
    tmp = p.with_suffix(".tmp")
    tmp.write_text(f"{run_dir}\n{digest}\n")
    tmp.replace(p)


def _file_digest(batch_df: DataFrame) -> str:
    """Deterministic identity of the micro-batch's input-file set (empty
    for non-file-backed frames, e.g. direct test drives — still stable
    across replays of the same frame)."""
    files = sorted(batch_df.inputFiles())
    return hashlib.md5("\n".join(files).encode()).hexdigest()


def prune_superseded(out_dir: str, current_run_dir: str) -> list[str]:
    """Strip superseded batch run_dirs down to their normalize_delta sink.

    Every batch dir older than CURRENT is offset-committed (its successor
    only started after its offsets committed) and can never be replayed;
    nothing reads its entities/pairs/score/cc/state sinks again. Its
    ``normalize_delta`` parquet IS still read — the state manifest's
    norm-path chain unions every batch's delta-normalize — so that one sink
    (and the sentinel) survives. Returns the pruned paths.
    """
    cur = Path(current_run_dir).name
    pruned = []
    for d in sorted(Path(out_dir).glob("batch-*")):
        if not d.is_dir() or d.name >= cur:
            continue
        for child in d.iterdir():
            if child.name in PRUNE_KEEP:
                continue
            if child.is_dir():
                shutil.rmtree(child)
            else:
                child.unlink()
            pruned.append(str(child))
    return pruned


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
    dict; the replay/refusal branches are documented in the module
    docstring.
    """
    out_root = str(Path(out_dir).resolve())
    run_dir = str(Path(out_root) / f"batch-{batch_id:06d}")
    digest = _file_digest(batch_df)
    ptr_run, ptr_digest = _read_pointer_full(out_root)
    if ptr_run == run_dir:
        if ptr_digest in (None, digest):
            # Replay of a batch whose pointer already advanced: its rows are
            # in the catalog; running would read and rewrite this run_dir's
            # own stage sinks. The idempotent anti-join would make it a
            # no-op anyway — skip the work entirely.
            return {
                "batch_id": batch_id, "run_dir": run_dir, "replay_noop": True
            }
        raise ValueError(
            f"batch {batch_id} already completed in {out_root!r} with a "
            "DIFFERENT input-file set — the streaming checkpoint was "
            "recreated over a used out_dir. Reprocess into a fresh "
            "--out-dir (or restore the original checkpoint)."
        )
    if batch_df.isEmpty():
        # File source can hand an empty batch (e.g. an empty landed file);
        # don't burn a run_dir or chain an empty normalize path for it.
        return {"batch_id": batch_id, "run_dir": None, "empty": True}

    current = ptr_run or str(Path(catalog_run_dir).resolve())
    input_id = f"stream:{current}|batch:{batch_id}|files:{digest}"
    sentinel = Path(run_dir) / INGEST_ID_FILE
    if sentinel.exists() and sentinel.read_text().strip() != input_id:
        # Same restart-numbering collision as above, caught before the
        # pointer reaches this batch: rebuilding the run_dir in place would
        # corrupt the normalize chain that later states reference.
        raise ValueError(
            f"{run_dir!r} holds a prior ingest with a different identity — "
            "the streaming checkpoint was recreated over a used out_dir. "
            "Reprocess into a fresh --out-dir."
        )

    delta = batch_df.select(*INPUT_COLUMNS)
    # Fail-loud parity with sources.records.read_records' missing-column
    # check: the streaming schema fills columns absent from a landed file
    # with nulls, which normalize would silently discard AFTER the file's
    # offsets committed — lost data. One delta-sized pass.
    n_bad = delta.filter(
        " OR ".join(f"{c} IS NULL" for c in INPUT_COLUMNS)
    ).count()
    if n_bad:
        raise ValueError(
            f"batch {batch_id}: {n_bad} rows with null required columns "
            f"({INPUT_COLUMNS}) — a landed file is malformed; refusing to "
            "commit its offsets"
        )

    state = cstate.load_catalog_state(spark, current)
    # With persisted state the catalog relation is only consumed for its
    # (rid, entity_id) labels — keep it narrow.
    catalog = spark.read.parquet(catalog_entities_path(current)).select(
        "rid", "entity_id"
    )
    Path(run_dir).mkdir(parents=True, exist_ok=True)
    sentinel.write_text(input_id + "\n")
    run = run_delta_pipeline(
        spark,
        catalog,
        delta,
        run_dir,
        cfg,
        input_id=input_id,
        resume=True,  # replays of half-finished batches resume the suffix
        sn=sn,
        state=state,
        emit="full",  # chainable; production: emit="delta" + Iceberg MERGE
        maintain_state=True,
    )
    _advance_pointer(out_root, run_dir, digest)
    pruned = prune_superseded(out_root, run_dir)
    return {
        "batch_id": batch_id,
        "run_dir": run_dir,
        "executed": run.executed,
        "skipped": run.skipped,
        "pruned": len(pruned),
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
    out_root = str(Path(out_dir).resolve())
    Path(out_root).mkdir(parents=True, exist_ok=True)
    if not cstate.has_state(catalog_run_dir):
        raise ValueError(
            f"{catalog_run_dir!r} carries no persisted catalog state "
            "(state.json); run the batch pipeline first"
        )

    reader = spark.readStream.schema(RECORDS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path).select(
        # same explicit projection as sources.records.read_records; the
        # missing-column fail-loud check runs per batch in ingest_batch
        [F.col(c).cast("string").alias(c) for c in INPUT_COLUMNS]
    )

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            spark, batch_df, batch_id, out_root, catalog_run_dir, cfg, sn=sn
        )

    writer = (
        stream.writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", str(Path(out_root) / "_stream_checkpoint"))
        .queryName("ccspark-stream-ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
