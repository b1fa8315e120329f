"""Packaging + source-format guards.

- dist/engine.zip (the spark-submit --py-files artifact, BASELINE.json:6)
  must stay byte-identical to the source tree — a stale zip silently ships
  old code to executors and is invisible until a worker deserializes a UDF.
- The Iceberg reader branch (sources/records.py S1) is environment-blocked
  here (no Iceberg jar, SURVEY.md §0) but must fail loudly and for the right
  reason, and the format dispatch itself must be covered.
"""

from __future__ import annotations

import hashlib
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "codingchallenge_spark"
ZIP = REPO / "dist" / "engine.zip"


def _sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def test_engine_zip_matches_source_tree():
    assert ZIP.exists(), "dist/engine.zip missing — run scripts/package.sh"
    with zipfile.ZipFile(ZIP) as z:
        zipped = {n: _sha(z.read(n)) for n in z.namelist() if n.endswith(".py")}
    src = {
        str(Path("codingchallenge_spark") / p.relative_to(PKG)): _sha(
            p.read_bytes()
        )
        for p in sorted(PKG.rglob("*.py"))
    }
    missing = sorted(set(src) - set(zipped))
    extra = sorted(set(zipped) - set(src))
    stale = sorted(n for n in set(src) & set(zipped) if src[n] != zipped[n])
    assert not missing and not extra and not stale, (
        f"dist/engine.zip out of date (run scripts/package.sh): "
        f"missing={missing} extra={extra} stale={stale}"
    )


def test_read_records_iceberg_branch_dispatches(spark):
    """No Iceberg runtime here: the branch must reach Spark's DSv2 source
    lookup and fail with the data-source-not-found error — not silently fall
    back to another format, and not break before dispatch."""
    from codingchallenge_spark.sources.records import read_records

    with pytest.raises(Exception) as ei:
        read_records(spark, "lake.code.repo_files", fmt="iceberg")
    msg = str(ei.value).lower()
    assert "iceberg" in msg, msg


def test_read_records_rejects_unknown_format(spark):
    from codingchallenge_spark.sources.records import read_records

    with pytest.raises(ValueError, match="unknown records format"):
        read_records(spark, "x", fmt="orc3000")


def test_read_records_enforces_schema(spark, tmp_path):
    from codingchallenge_spark.sources.records import read_records

    p = str(tmp_path / "bad.parquet")
    spark.createDataFrame([(1, "a")], ["repo", "path"]).write.parquet(p)
    with pytest.raises(ValueError, match="missing required columns"):
        read_records(spark, p, fmt="parquet")


def test_reap_stale_local_dirs(tmp_path):
    """Liveness-based tmpfs reaping (session._reap_stale_local_dirs):
    a pid-* dir whose process is dead goes immediately; a pid-* dir owned
    by a live process stays; legacy (non-pid) dirs use the deepest-file
    mtime — fresh kept, >max_age reaped; garbage names never raise."""
    import os
    import time

    from codingchallenge_spark.session import _reap_stale_local_dirs

    # Dead pid: spawn-and-wait a child so the pid is certainly recycled-free.
    dead_pid = os.spawnlp(os.P_NOWAIT, "true", "true")
    os.waitpid(dead_pid, 0)
    (tmp_path / f"pid-{dead_pid}" / "blockmgr-x").mkdir(parents=True)
    (tmp_path / f"pid-{os.getpid()}" / "blockmgr-y").mkdir(parents=True)
    stale = tmp_path / "blockmgr-legacy-stale"
    (stale / "00").mkdir(parents=True)
    f = stale / "00" / "shuffle.data"
    f.write_bytes(b"x")
    old = time.time() - 7 * 86400
    os.utime(f, (old, old))
    os.utime(stale / "00", (old, old))
    os.utime(stale, (old, old))
    fresh = tmp_path / "blockmgr-legacy-fresh"
    fresh.mkdir()
    (fresh / "live.data").write_bytes(b"x")
    # Unparsable pid-* names fall through to the mtime rule: a fresh one
    # stays, a week-old one is reclaimed (it cannot prove liveness).
    (tmp_path / "pid-notanumber").mkdir()
    pid_stale = tmp_path / "pid-stale-garbage"
    pid_stale.mkdir()
    os.utime(pid_stale, (old, old))
    # Stale PLAIN FILE at the top level (foreign writer's lockfile):
    # rmtree(file) is a silent no-op, so the reaper must unlink it.
    stale_file = tmp_path / "foreign.lock"
    stale_file.write_bytes(b"x")
    os.utime(stale_file, (old, old))
    fresh_file = tmp_path / "live.lock"
    fresh_file.write_bytes(b"x")

    _reap_stale_local_dirs(tmp_path)

    assert not (tmp_path / f"pid-{dead_pid}").exists()
    assert (tmp_path / f"pid-{os.getpid()}").exists()
    assert not stale.exists()
    assert fresh.exists()
    assert (tmp_path / "pid-notanumber").exists()  # fresh → kept
    assert not pid_stale.exists()  # unparsable + stale → reclaimed
    assert not stale_file.exists()  # stale plain file → unlinked
    assert fresh_file.exists()
