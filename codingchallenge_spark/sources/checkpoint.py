"""Stage checkpoint protocol: S3/EP3 (SURVEY.md §2.1, §3).

Spec: BASELINE.json:14 — "resumable from checkpoint with per-partition
lineage + metrics … interrupted runs resume at the blocking, scoring, or
clustering stage".

A stage is DONE iff its parquet output + `_STAGE_DONE` marker exist and the
marker's fingerprint (config hash ⊕ input fingerprint chain) matches the
current run. The marker also records the per-partition lineage: rows per
output file (read from parquet footers — metadata only, no data scan) and
wall time. Markers are JSON so humans and the resume logic read the same
artifact.

Scale note: in production the run_dir lives on HDFS/S3 and stage outputs are
Iceberg tables/branches; this module keeps the protocol identical with local
parquet, and footer-based lineage costs O(#files) metadata reads, never a
data pass.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

MARKER = "_STAGE_DONE"


@dataclass
class StageResult:
    stage: str
    path: str
    fingerprint: str
    rows: int
    wall_ms: int
    partitions: int
    file_rows: dict[str, int] = field(default_factory=dict)  # per-partition lineage
    skipped: bool = False


def stage_path(run_dir: str, stage: str) -> str:
    return str(Path(run_dir) / stage)


def _marker_path(run_dir: str, stage: str) -> Path:
    return Path(stage_path(run_dir, stage)) / MARKER


def _parquet_file_rows(path: str) -> dict[str, int]:
    """Per-partition lineage from parquet footers (metadata-only)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover
        return {}
    out = {}
    for f in sorted(Path(path).glob("*.parquet")):
        out[f.name] = pq.ParquetFile(f).metadata.num_rows
    return out


def is_done(run_dir: str, stage: str, fingerprint: str) -> bool:
    m = _marker_path(run_dir, stage)
    if not m.exists():
        return False
    try:
        meta = json.loads(m.read_text())
    except (json.JSONDecodeError, OSError):
        return False
    return meta.get("fingerprint") == fingerprint


def load_stage(spark: SparkSession, run_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(stage_path(run_dir, stage))


def read_marker(run_dir: str, stage: str) -> dict:
    return json.loads(_marker_path(run_dir, stage).read_text())


def write_stage(
    df: DataFrame, run_dir: str, stage: str, fingerprint: str
) -> StageResult:
    """Materialize a stage: parquet + lineage + marker. The write is the
    pipeline barrier (deliberate — it IS the resume unit)."""
    path = stage_path(run_dir, stage)
    t0 = time.monotonic()
    df.write.mode("overwrite").parquet(path)
    wall_ms = int((time.monotonic() - t0) * 1000)
    file_rows = _parquet_file_rows(path)
    rows = sum(file_rows.values())
    res = StageResult(
        stage=stage,
        path=path,
        fingerprint=fingerprint,
        rows=rows,
        wall_ms=wall_ms,
        partitions=len(file_rows),
        file_rows=file_rows,
    )
    _marker_path(run_dir, stage).write_text(json.dumps(asdict(res), indent=1))
    _append_metrics(run_dir, res)
    return res


def _append_metrics(run_dir: str, res: StageResult) -> None:
    line = json.dumps(
        {
            "stage": res.stage,
            "rows": res.rows,
            "wall_ms": res.wall_ms,
            "partitions": res.partitions,
            "skipped": res.skipped,
        }
    )
    with open(Path(run_dir) / "stage_metrics.jsonl", "a") as f:
        f.write(line + "\n")


def record_skip(run_dir: str, stage: str, fingerprint: str) -> StageResult:
    meta = read_marker(run_dir, stage)
    res = StageResult(
        stage=stage,
        path=stage_path(run_dir, stage),
        fingerprint=fingerprint,
        rows=meta.get("rows", -1),
        wall_ms=0,
        partitions=meta.get("partitions", -1),
        skipped=True,
    )
    _append_metrics(run_dir, res)
    return res
