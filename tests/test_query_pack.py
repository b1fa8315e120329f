"""Local mirror of the driver's DuckDB oracle comparison (SURVEY.md §5.1).

Runs every query pack entry at sf0.001 on both engines and compares
row count, sorted column names, and the order-insensitive multiset of
normalized row values — stricter than the driver (exact float bits, modulo
float32→float64 display) so driver-side hash mismatches surface here first.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest

from codingchallenge_spark.plans.query_pack import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )


SQL_QUERIES = [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql is not None]
ROWS_ONLY = [(n, fn) for n, (fn, sql) in QUERIES.items() if sql is None]


@pytest.mark.parametrize(
    "name,fn,sql", SQL_QUERIES, ids=[n for n, _, _ in SQL_QUERIES]
)
def test_query_matches_duckdb(spark, duck, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _norm_rows(spark_cols, spark_rows)
    b = _norm_rows(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name,fn", ROWS_ONLY, ids=[n for n, _ in ROWS_ONLY])
def test_rows_only_queries_run(spark, name, fn):
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_approx_count_distinct_error_bound(spark):
    """A5 — the HLL sketch has no DuckDB twin (different sketch), so bound it
    locally: within 5% relative error of the exact distinct count."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact <= 0.05, (row.approx, row.exact)


def test_flagship_threshold_margin(spark):
    """The flagship oracle's FP-safety claim, machine-checked: every candidate
    pair's EXACT score (full scorer, no prune — pruned-away pairs can sit
    closer to the line than emitted ones) keeps clear distance from the 0.75
    decision threshold. Measured floors: 5.75e-4 at sf0.01 (the scale the
    driver hash-compares at — this is the load-bearing bound) and 3.83e-5 at
    sf0.001 (entry() smoke scale; still ~10^11 x a 1-ulp cross-engine
    discrepancy). A testdata or kernel change that erodes either floor fails
    here before the driver hashes diverge."""
    from pyspark.sql import functions as F

    from codingchallenge_spark.functions.normalize import (
        normalize_records,
        with_token_hashes,
    )
    from codingchallenge_spark.operators.scoring import (
        attach_pair_attrs,
        score_pairs,
    )
    from codingchallenge_spark.plans.matcher import MatcherConfig, candidate_pairs
    from codingchallenge_spark.sources.records import documents_as_records

    for sf_dir, floor in (
        ("/root/testdata/sf0.001", 1e-5),
        ("/root/testdata/sf0.01", 5e-4),
    ):
        recs = documents_as_records(spark, sf_dir)
        cfg = MatcherConfig(threshold=0.75)
        norm = with_token_hashes(normalize_records(recs)).persist()
        pairs = candidate_pairs(norm, cfg)
        scored = score_pairs(
            attach_pair_attrs(pairs, norm), weights=cfg.weights,
            threshold=cfg.threshold,
        )
        row = scored.agg(
            F.min(F.abs(F.col("score") - F.lit(cfg.threshold))).alias("m"),
            F.count("*").alias("n"),
        ).collect()[0]
        norm.unpersist()
        assert row.n > 0, sf_dir
        assert row.m >= floor, (sf_dir, row.m)
