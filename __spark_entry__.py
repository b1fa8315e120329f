"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``codingchallenge_spark``; the query registry is
``codingchallenge_spark.plans.query_pack`` (Spark callable + DuckDB SQL twin
per operator from SURVEY.md §2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO_ROOT))

from codingchallenge_spark.plans import query_pack  # noqa: E402


from codingchallenge_spark.session import ship_package  # noqa: E402


def _ensure_executors_have_package(spark: SparkSession) -> None:
    """Ship codingchallenge_spark to executor Python workers.

    The driver process imports the package via sys.path above, but executor
    workers deserializing pandas-UDF closures need it on THEIR path — the
    same problem `spark-submit --py-files engine.zip` solves in production
    (BASELINE.json:6). Harmless no-op when already registered.
    """
    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full record-linkage
    slice (normalize → multi-pass blocking → vectorized scoring → large-star/
    small-star connected components) over the documents table mapped to the
    (repo, path, commit, lang, content) input shape."""
    from codingchallenge_spark.plans.matcher import MatcherConfig, resolve_entities
    from codingchallenge_spark.sources.records import documents_as_records

    _ensure_executors_have_package(spark)
    recs = documents_as_records(spark, "/root/testdata/sf0.001")
    # 0.75 matches q_er_entities (the oracle-checked flagship): non-trivial
    # clusters on this corpus with a safe margin to every pair score.
    cfg = MatcherConfig(threshold=0.75)
    return resolve_entities(recs, cfg)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def with_pyfiles(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_executors_have_package(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: with_pyfiles(fn) for name, fn in query_pack.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return query_pack.oracle_sql()
