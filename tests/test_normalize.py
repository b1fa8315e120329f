"""Normalize stage tests (SURVEY.md §2.2 P3-P6)."""

import hashlib

from pyspark.sql import functions as F

from codingchallenge_spark.functions.normalize import (
    MIN_TOKEN_LEN,
    STOPWORDS,
    normalize_records,
)


def test_content_preserved_and_sha(spark, tiny_records, tiny_fixture):
    out = normalize_records(tiny_records)
    rows = out.select("content", "content_sha").collect()
    assert len(rows) == len(tiny_fixture.records)
    for r in rows[:50]:
        assert r.content_sha == hashlib.sha256(r.content.encode()).hexdigest()


def test_record_id_matches_fixture_golden(spark, tiny_records, tiny_fixture):
    out = normalize_records(tiny_records).select("rid")
    got = {r.rid for r in out.collect()}
    want = set(tiny_fixture.golden["rid"])
    assert got == want  # fixture computes rid the same way (sha256 repo\x1fpath\x1fcommit)


def test_name_norm(spark):
    df = spark.createDataFrame(
        [
            ("r", "src/parser/Join_Impl-v2.PY", "c", "py", "x"),
            ("r", "a/b/hash_table.java", "c", "java", "x"),
            ("r", "noext", "c", "c", "x"),
        ],
        ["repo", "path", "commit", "lang", "content"],
    )
    out = normalize_records(df).select("path", "name_norm").collect()
    by_path = {r.path: r.name_norm for r in out}
    assert by_path["src/parser/Join_Impl-v2.PY"] == "join impl v2"
    assert by_path["a/b/hash_table.java"] == "hash table"
    assert by_path["noext"] == "noext"


def test_tokenize(spark):
    df = spark.createDataFrame(
        [("r", "p", "c", "py", "Foo the bar1 x bar1 IF baz-qux")],
        ["repo", "path", "commit", "lang", "content"],
    )
    toks = normalize_records(df).select("tokens").collect()[0].tokens
    assert toks == sorted(set(toks))  # distinct + sorted
    assert "foo" in toks and "bar1" in toks and "baz" in toks and "qux" in toks
    assert "x" not in toks  # shorter than MIN_TOKEN_LEN
    assert "the" not in toks and "if" not in toks  # stopwords
    assert MIN_TOKEN_LEN == 2 and "the" in STOPWORDS


def test_empty_content_filtered(spark):
    df = spark.createDataFrame(
        [("r", "p", "c", "py", ""), ("r", "p2", "c", "py", "real content here")],
        ["repo", "path", "commit", "lang", "content"],
    )
    assert normalize_records(df).count() == 1


def test_no_python_udf_in_plan(spark, tiny_records):
    # Normalize must stay JVM-side (BASELINE.json:15 "no per-row Python").
    plan = normalize_records(tiny_records)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
