"""Sources: the input repo-files table (S1/S2 in SURVEY.md §2.1).

Spec: BASELINE.json:14 "over Iceberg tables"; BASELINE.json:15 fixes the
schema to (repo, path, commit, lang, content), all strings. This sandbox has
no Iceberg runtime (SURVEY.md §0), so format selection is config-driven:

- ``format="iceberg"``: production path — reads through a DSv2 Iceberg catalog
  (``spark.table``/``spark.read.format("iceberg")``), which gives snapshot
  isolation, partition pruning and metadata-level file skipping for free.
  Untestable here; exercised on a real cluster only.
- ``format="parquet"``: identical schema, fully tested. Used by every test and
  the sandbox bench.

Scale notes (10^12-file clause, BASELINE.json:6):
- The reader *always* applies an explicit select of the five input columns so
  Catalyst prunes everything else at the scan (ReadSchema).
- Callers must filter early (lang filters, non-null content) so predicates
  reach the scan (PushedFilters) — see ``codingchallenge_spark.functions
  .normalize`` which does this as its first step.
- ``content`` is the wide column: never carry it past the stage that needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The one fixed input schema (BASELINE.json:15, input_hint).
RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

INPUT_COLUMNS = [f.name for f in RECORDS_SCHEMA.fields]


def read_records(
    spark: SparkSession,
    table_or_path: str,
    fmt: str = "parquet",
) -> DataFrame:
    """Read the repo-files input table with the enforced input schema.

    Returns exactly the five input columns, cast to string — any extra
    columns in the underlying table are pruned at the scan.
    """
    if fmt == "iceberg":
        # Production branch: catalog table name, e.g. "lake.code.repo_files".
        # Iceberg's DSv2 source provides partition pruning + filter pushdown.
        df = spark.read.format("iceberg").load(table_or_path)
    elif fmt == "parquet":
        df = spark.read.parquet(table_or_path)
    elif fmt == "table":
        df = spark.table(table_or_path)
    else:
        raise ValueError(f"unknown records format: {fmt!r}")

    missing = [c for c in INPUT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"input table {table_or_path!r} missing required columns {missing}; "
            f"found {df.columns}"
        )
    # Explicit projection → column pruning reaches the scan.
    return df.select([F.col(c).cast("string").alias(c) for c in INPUT_COLUMNS])


def read_testdata_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-provided oracle table (TESTDATA.md:13-15)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def documents_as_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a repo_files-shaped view from the driver `documents` table.

    Mapping per FIXTURES.md §B: source→repo, 'doc/<id>.txt'→path,
    sha2(text)[:16]→commit, lang→lang, text→content. Used by the flagship
    ``entry(spark)`` so the end-to-end dedup slice runs on driver data.
    """
    docs = read_testdata_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias(
            "path"
        ),
        F.substring(F.sha2(F.col("text"), 256), 1, 16).alias("commit"),
        F.col("lang").alias("lang"),
        F.col("text").alias("content"),
    )
