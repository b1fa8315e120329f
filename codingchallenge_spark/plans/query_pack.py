"""Driver-contract query pack: one entry per operator (SURVEY.md §2).

Each item maps a name to (spark_fn, oracle_sql). ``spark_fn(spark, sf_dir)``
returns a DataFrame; ``oracle_sql`` is ANSI SQL DuckDB runs over the same
parquet tables (views pre-registered by the driver). The driver compares
row-count + schema + order-insensitive value hash — so every computed column
is aliased identically on both sides, float aggregation is made exact
(integral doubles / decimal casts / identical expression trees), and rounding
is applied symmetrically where engines could differ by representation.

Queries whose semantics are not SQL-expressible (iterative CC, HLL sketches,
numpy LSH planes) carry ``None`` SQL → the driver records a rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codingchallenge_spark.functions.normalize import STOPWORDS, name_norm
from codingchallenge_spark.functions.similarity import (
    jaro_winkler_udf,
    token_jaccard,
)
from codingchallenge_spark.functions.text import (
    LANG_LEXICONS,
    bpe_ish_token_count,
    fingerprint,
    langid,
    quality_metrics,
    ws_token_count,
)
from codingchallenge_spark.operators.ann import brute_force_topk, cosine_sim
from codingchallenge_spark.operators.blocking import salted_join
from codingchallenge_spark.operators.dedup import (
    exact_dedup,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash16,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _scan_meta(sf_dir: str, name: str) -> tuple[int, int] | None:
    """(total row groups, total bytes) of a testdata table — the scan's
    EFFECTIVE max parallelism plus its size. Spark splits files by byte
    range, but a task only reads row groups whose start offset falls inside
    its range, so a file's row-group count (not its split count, which
    `df.rdd.getNumPartitions()` reports) bounds how many tasks can do real
    work. Returns None when the path is not locally inspectable (e.g. an
    object-store URI) — callers fall back to the split count."""
    try:
        from pathlib import Path

        import pyarrow.parquet as pq

        path = Path(f"{sf_dir}/{name}.parquet")
        if path.is_file():
            files = [path]
        elif path.is_dir():
            files = sorted(p for p in path.rglob("*.parquet") if p.is_file())
        else:
            return None
        rg = sum(pq.ParquetFile(str(f)).metadata.num_row_groups for f in files)
        nbytes = sum(f.stat().st_size for f in files)
        return rg, nbytes
    except Exception:
        return None


# Below this input size the whole per-row computation is sub-100 ms serial
# and the floor's exchange (plus the .rdd partition probe) only adds
# latency — measured: q_dedup_fingerprint 0.26 s → 0.48 s at sf0.1 with an
# unconditional floor. 4 MB ≈ one open-cost unit of compact zstd parquet
# (~500k short-doc rows); env-overridable for other hardware profiles.
_FLOOR_MIN_BYTES = int(
    os.environ.get("CCSPARK_FLOOR_MIN_BYTES", str(4 * 1024 * 1024))
)


def _t_par(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan with a partition floor for compute-dense queries (round 6).

    A compact parquet input written as a single row group scans as ONE task —
    Spark splits files by byte range but a task only reads row groups whose
    start offset falls in its range, so split-size configs cannot parallelize
    inside a row group (the driver's sf1.0 `documents`/`embeddings` tables
    are exactly that: one row group each). Every downstream per-row
    computation (9.3M md5s in the MinHash signature pass, 660k array
    intersections in q_jaccard_pairs, 200k interpreted cosine folds) then
    runs on one core of 32: measured 8.0 s → 2.3 s (LSH), 9.2 s → 0.9 s
    (jaccard) at sf1.0 from this floor alone. The round-robin repartition is
    CONDITIONAL on the scan's EFFECTIVE parallelism — min(splits, total row
    groups) — being below the session's parallelism, so at production scale
    (many files / many row groups) it is a no-op: the same guard
    plans.matcher.resolve_entities has always used for the flagship, with
    the row-group bound added because split count alone over-reports (byte
    ranges that contain no row-group start scan nothing). Only applied to
    queries whose post-scan per-row work dominates the scan; scan-bound
    relational queries keep the bare `_t` (an extra exchange would only add
    cost there).
    """
    df = _t(spark, sf_dir, name)
    parallelism = spark.sparkContext.defaultParallelism
    meta = _scan_meta(sf_dir, name)
    if meta is not None:
        row_groups, nbytes = meta
        if nbytes < _FLOOR_MIN_BYTES:
            # Too small for an insurance exchange to pay off — and skipping
            # the .rdd probe keeps tiny-scale query construction cheap.
            return df
        if row_groups < parallelism:
            # Row groups alone already bound effective parallelism below the
            # session's — the floor applies whatever the split count is, so
            # the (costlier) .rdd split probe is skipped.
            return df.repartition(parallelism)
        effective = min(df.rdd.getNumPartitions(), row_groups)
    else:
        effective = df.rdd.getNumPartitions()
    if effective < parallelism:
        df = df.repartition(parallelism)
    return df


# ---------------------------------------------------------------------------
# Relational core (P/J/A/W/U operators) over the TPC-H-ish tables
# ---------------------------------------------------------------------------

def q_scan_project(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


SQL_SCAN_PROJECT = "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"


def q_filter_pushdown(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


SQL_FILTER = (
    "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
    "WHERE l_quantity > 30 AND l_returnflag = 'R'"
)


def q_sha256(spark, sf_dir):
    return _t(spark, sf_dir, "customer").select(
        "c_custkey", F.sha2(F.col("c_name"), 256).alias("name_sha")
    )


SQL_SHA256 = "SELECT c_custkey, sha256(c_name) AS name_sha FROM customer"


def q_concat_hash(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.sha2(
            F.concat_ws(
                "|",
                F.col("o_orderkey").cast("string"),
                F.col("o_orderstatus"),
                F.col("o_orderpriority"),
            ),
            256,
        ).alias("rid"),
    )


SQL_CONCAT_HASH = (
    "SELECT o_orderkey, sha256(concat_ws('|', o_orderkey::VARCHAR, "
    "o_orderstatus, o_orderpriority)) AS rid FROM orders"
)


def q_norm_string(spark, sf_dir):
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.trim(
            F.regexp_replace(F.lower(F.col("p_type")), r"[^a-z0-9]+", " ")
        ).alias("type_norm"),
    )


SQL_NORM_STRING = (
    "SELECT p_partkey, trim(regexp_replace(lower(p_type), '[^a-z0-9]+', ' ', 'g')) "
    "AS type_norm FROM part"
)


def q_tokenize_counts(spark, sf_dir):
    return (
        _t_par(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )


SQL_TOKENIZE = (
    "SELECT tok, COUNT(*) AS cnt FROM (SELECT unnest(string_split(text, ' ')) "
    "AS tok FROM documents) GROUP BY tok"
)


def q_json_extract(spark, sf_dir):
    return _t(spark, sf_dir, "events").select(
        "event_id", F.get_json_object("props", "$.k").alias("k_val")
    )


SQL_JSON = "SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events"


def q_math_expr(spark, sf_dir):
    # Also carries the least/greatest scalar check (folded from the retired
    # standalone q_least_greatest to keep the registry under the driver's
    # 50-query recording window).
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("charge"),
        F.least("l_discount", "l_tax").alias("lo_rate"),
        F.greatest("l_discount", "l_tax").alias("hi_rate"),
    )


SQL_MATH = (
    "SELECT l_orderkey, l_linenumber, "
    "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge, "
    "least(l_discount, l_tax) AS lo_rate, "
    "greatest(l_discount, l_tax) AS hi_rate FROM lineitem"
)


def q_window_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id", F.lead("value").over(w).alias("next_value")
    )


SQL_WINDOW_LEAD = (
    "SELECT event_id, lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS next_value FROM events"
)


def q_row_number(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.row_number().over(w).alias("rn")
    )


SQL_ROW_NUMBER = (
    "SELECT o_orderkey, row_number() OVER (PARTITION BY o_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders"
)


def q_window_frame_sum(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id", F.sum("value").over(w).alias("roll_sum")
    )


SQL_WINDOW_FRAME = (
    "SELECT event_id, sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_sum FROM events"
)


def q_orderby_limit(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
    )


SQL_ORDERBY_LIMIT = (
    "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
    "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10"
)


def q_topk_per_group(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
    )


SQL_TOPK_PER_GROUP = (
    "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
    "SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER "
    "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn "
    "FROM orders) WHERE rn <= 2"
)


def q_equi_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )


SQL_EQUI_JOIN = (
    "SELECT c_mktsegment, COUNT(*) AS cnt FROM orders JOIN customer "
    "ON o_custkey = c_custkey GROUP BY c_mktsegment"
)


def q_broadcast_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("cnt"))
    )


SQL_BROADCAST_JOIN = (
    "SELECT r_name, COUNT(*) AS cnt FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
)


def q_double_join_agg(spark, sf_dir):
    # Round 6: the planner's size estimate put the 1.5M-row orders relation
    # under the 256 MB broadcast threshold, so every execution paid a driver
    # collect + serial hash build + ship of 1.5M rows before probing. A
    # big-big fact⋈fact join is a shuffle join at any real scale — the merge
    # hint makes that choice explicit (measured 2.0 s → 1.23 s at sf1.0;
    # SMJ picked over SHJ as the spill-graceful default, within noise of each
    # other here). SIZE-CONDITIONED like a cost-based optimizer would: below
    # ~8 MB the broadcast build is cheaper than two extra shuffles (measured
    # 0.60 s → 0.85 s at sf0.1 with an unconditional hint), so the hint only
    # fires when the orders input is big — and when the path is not locally
    # inspectable the production assumption (orders ≫ broadcastable) holds.
    # The customer dimension still auto-broadcasts (guide §3.1).
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ometa = _scan_meta(sf_dir, "orders")
    if ometa is None or ometa[1] >= 8 * 1024 * 1024:
        o = o.hint("merge")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("cnt"))
    )


SQL_DOUBLE_JOIN = (
    "SELECT c_mktsegment, SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
)


def q_semi_anti_join(spark, sf_dir):
    # J4 left-semi + left-anti in one tagged query (merged like
    # q_multi_dim_agg — frees a slot of the driver's 50-query window for
    # q_pairwise_f1 while keeping both join types hash-verified).
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.lit("semi").alias("tag"), "c_custkey")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("tag"), "c_custkey")
    )
    return semi.unionByName(anti)


SQL_SEMI_ANTI_JOIN = (
    "SELECT 'semi' AS tag, c_custkey FROM customer "
    "WHERE c_custkey IN (SELECT o_custkey FROM orders) "
    "UNION ALL "
    "SELECT 'anti' AS tag, c_custkey FROM customer "
    "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
)


def q_union_distinct(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct()


SQL_UNION_DISTINCT = (
    "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey AS k FROM supplier"
)


def q_intersect_except(spark, sf_dir):
    # U2 — both set operators in one tagged result (merged from the former
    # q_intersect / q_except pair; registry ≤ 50, see Registry note).
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    i = c.intersect(o).select(F.lit("intersect").alias("op"), "k")
    e = c.exceptAll(o).distinct().select(F.lit("except").alias("op"), "k")
    return i.unionByName(e)


SQL_INTERSECT_EXCEPT = (
    "SELECT 'intersect' AS op, k FROM ("
    "SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders) "
    "UNION ALL "
    "SELECT 'except' AS op, k FROM ("
    "SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)"
)


def q_groupby_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


SQL_GROUPBY_AGG = (
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty, "
    "MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus"
)


def q_min_agg(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.min("o_totalprice").alias("min_price"))
    )


SQL_MIN_AGG = (
    "SELECT o_custkey, MIN(o_totalprice) AS min_price FROM orders GROUP BY o_custkey"
)


def q_multi_dim_agg(spark, sf_dir):
    # A4 — rollup + cube + grouping sets in one tagged result (merged from
    # the former q_rollup / q_cube / q_grouping_sets trio; registry ≤ 50).
    li = _t(spark, sf_dir, "lineitem")
    ru = li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt")
    ).select(F.lit("rollup").alias("op"), "l_returnflag", "l_linestatus", "cnt")
    cu = li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt")
    ).select(F.lit("cube").alias("op"), "l_returnflag", "l_linestatus", "cnt")
    gs = spark.sql(
        "SELECT 'gsets' AS op, l_returnflag, l_linestatus, COUNT(*) AS cnt FROM "
        f"parquet.`{sf_dir}/lineitem.parquet` "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    )
    return ru.unionByName(cu).unionByName(gs)


SQL_MULTI_DIM_AGG = (
    "SELECT 'rollup' AS op, l_returnflag, l_linestatus, COUNT(*) AS cnt "
    "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) "
    "UNION ALL "
    "SELECT 'cube' AS op, l_returnflag, l_linestatus, COUNT(*) AS cnt "
    "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) "
    "UNION ALL "
    "SELECT 'gsets' AS op, l_returnflag, l_linestatus, COUNT(*) AS cnt "
    "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
)


def q_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


SQL_DISTINCT = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_salted_join(spark, sf_dir):
    # Same result as a plain equi-join — proves the deterministic salting
    # transform (skew guard B3) preserves join semantics.
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("rid1"), F.col("o_orderkey").alias("rid2")
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("rid"), "c_mktsegment"
    )
    out = salted_join(o, c, "rid1", salt_buckets=8)
    return out.select(F.col("rid2").alias("o_orderkey"), "c_mktsegment")


SQL_SALTED_JOIN = (
    "SELECT o_orderkey, c_mktsegment FROM orders JOIN customer "
    "ON o_custkey = c_custkey"
)


# ---------------------------------------------------------------------------
# Blocking / similarity / ER-flavored operators over documents
# ---------------------------------------------------------------------------

def q_explode_selfjoin(spark, sf_dir):
    # Token-blocking join shape: per-token count of candidate doc pairs.
    d = _t_par(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    a, b = tok.alias("a"), tok.alias("b")
    return (
        a.join(b, "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy("tok")
        .agg(F.count("*").alias("pair_cnt"))
    )


SQL_EXPLODE_SELFJOIN = (
    "WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents) "
    "SELECT a.tok AS tok, COUNT(*) AS pair_cnt FROM tok a JOIN tok b "
    "ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY a.tok"
)


def q_levenshtein(spark, sf_dir):
    # V2 semantics check via the JVM builtin: raw distance + the normalized
    # ratio the matcher thresholds on (merged from the former q_lev_ratio).
    p = _t_par(spark, sf_dir, "part")
    denom = F.greatest(F.length("p_name"), F.length("p_brand"), F.lit(1))
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_brand").alias("dist"),
        (F.lit(1.0) - F.levenshtein("p_name", "p_brand") / denom).alias("lev_ratio"),
    )


SQL_LEVENSHTEIN = (
    "SELECT p_partkey, levenshtein(p_name, p_brand) AS dist, "
    "1.0 - levenshtein(p_name, p_brand) / "
    "greatest(length(p_name), length(p_brand), 1) AS lev_ratio FROM part"
)


def q_jaro_winkler(spark, sf_dir):
    # The numpy pandas-UDF kernel vs DuckDB's C++ jaro_winkler_similarity:
    # conventions verified identical (strcmp95); rounded to 6 for FP safety.
    return _t_par(spark, sf_dir, "part").select(
        "p_partkey", F.round(jaro_winkler_udf("p_name", "p_type"), 6).alias("jw")
    )


SQL_JARO_WINKLER = (
    "SELECT p_partkey, round(jaro_winkler_similarity(p_name, p_type), 6) AS jw "
    "FROM part"
)


def q_jaccard_pairs(spark, sf_dir):
    # Round 6: (a) partition floor — the blocked self-join's per-pair work ran
    # on the single-row-group scan's one task; (b) one set operation per pair
    # instead of three. token_jaccard evaluates array_union TWICE (once in the
    # CASE guard, once in the divisor) plus array_intersect; for DISTINCT
    # arrays |A∪B| = |A|+|B| − |A∩B| exactly, and the per-record sizes are
    # computed once before the join — so the pair kernel is a single
    # array_intersect and the jaccard double is the SAME integer division
    # (size ints unchanged → identical IEEE result; null/empty handling
    # identical: any null side nulls the guard and falls to the 1.0 branch,
    # exactly like size(array_union(null, x))). Measured 9.2 s → 0.65 s at
    # sf1.0 (floor 9.2→0.9, kernel 0.9→0.65).
    d = _t_par(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    ).withColumn("n", F.size("toks"))
    a, b = d.alias("a"), d.alias("b")
    paired = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.n_chars") == F.col("b.n_chars"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("d1"),
        F.col("b.doc_id").alias("d2"),
        F.size(F.array_intersect("a.toks", "b.toks")).alias("_i"),
        (F.col("a.n") + F.col("b.n")).alias("_t"),
    )
    return paired.select(
        "d1", "d2",
        F.when(
            (F.col("_t") - F.col("_i")) > 0,
            F.col("_i") / (F.col("_t") - F.col("_i")),
        ).otherwise(F.lit(1.0)).alias("jaccard"),
    )


SQL_JACCARD_PAIRS = (
    "WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents), "
    "sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id), "
    "pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM documents a "
    "JOIN documents b ON a.lang = b.lang AND a.n_chars = b.n_chars "
    "AND a.doc_id < b.doc_id), "
    "inter AS (SELECT ta.doc_id AS d1, tb.doc_id AS d2, COUNT(*) AS i FROM tok ta "
    "JOIN tok tb ON ta.tok = tb.tok AND ta.doc_id < tb.doc_id GROUP BY 1, 2) "
    "SELECT p.d1, p.d2, COALESCE(i.i, 0)::DOUBLE / (s1.n + s2.n - COALESCE(i.i, 0)) "
    "AS jaccard FROM pairs p JOIN sz s1 ON p.d1 = s1.doc_id "
    "JOIN sz s2 ON p.d2 = s2.doc_id "
    "LEFT JOIN inter i ON p.d1 = i.d1 AND p.d2 = i.d2"
)


def q_dedup_exact(spark, sf_dir):
    return exact_dedup(_t_par(spark, sf_dir, "documents"), "text", "doc_id")


SQL_DEDUP_EXACT = (
    "SELECT sha256(text) AS content_sha, MIN(doc_id) AS keep_id, "
    "COUNT(*) AS dup_cnt FROM documents GROUP BY sha256(text)"
)


def q_dedup_fingerprint(spark, sf_dir):
    d = _t_par(spark, sf_dir, "documents")
    return (
        d.select(fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_cnt"))
    )


SQL_DEDUP_FINGERPRINT = (
    "SELECT sha256(array_to_string(list_sort(list_distinct("
    "string_split(lower(text), ' '))), ' ')) AS fp, "
    "MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt FROM documents GROUP BY 1"
)


def _mh_sql(i: int) -> str:
    return (
        f"MIN(('0x' || substr(md5(tok || '#{i}'), 1, 15))::BIGINT) AS mh{i}"
    )


def q_minhash_sig(spark, sf_dir):
    d = _t_par(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    sig = minhash_signature(F.col("toks"), k=4)
    return d.select(
        "doc_id",
        *[F.element_at(sig, i + 1).alias(f"mh{i}") for i in range(4)],
    )


SQL_MINHASH_SIG = (
    "WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents) "
    f"SELECT doc_id, {_mh_sql(0)}, {_mh_sql(1)}, {_mh_sql(2)}, {_mh_sql(3)} "
    "FROM tok GROUP BY doc_id"
)


def q_minhash_lsh_pairs(spark, sf_dir):
    from codingchallenge_spark.operators.dedup import minhash_lsh_pairs

    d = _t_par(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    return minhash_lsh_pairs(
        d, "doc_id", "toks", k=8, bands=4, band_df_cap=10**9
    )


def _band_sql(b: int, r: int = 2) -> str:
    cols = ", ".join(f"mh{b * r + j}::VARCHAR" for j in range(r))
    return (
        f"SELECT doc_id, sha256(concat_ws(',', '{b}', {cols})) AS bucket FROM sig"
    )


SQL_MINHASH_LSH = (
    "WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents), "
    "sig AS (SELECT doc_id, "
    + ", ".join(_mh_sql(i) for i in range(8))
    + " FROM tok GROUP BY doc_id), "
    "buckets AS ("
    + " UNION ALL ".join(_band_sql(b) for b in range(4))
    + ") "
    "SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM buckets a "
    "JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id"
)


def q_minhash_lsh_prod(spark, sf_dir):
    # The PRODUCTION LSH configuration: identical plan to q_minhash_lsh_pairs
    # but with the band cap ON (default 200) — degenerate buckets are dropped
    # by the broadcast anti-join before the bucket self-join, exactly like
    # token blocking's hot-key guard. q_minhash_lsh_pairs keeps the cap
    # disabled as the uncapped oracle shape; this entry hash-verifies the
    # capped plan a 100-TB run actually executes (the cap IS SQL-expressible:
    # bucket counts + HAVING > cap anti-join).
    from codingchallenge_spark.operators.dedup import minhash_lsh_pairs

    d = _t_par(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    return minhash_lsh_pairs(d, "doc_id", "toks", k=8, bands=4)


SQL_MINHASH_LSH_PROD = (
    "WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents), "
    "sig AS (SELECT doc_id, "
    + ", ".join(_mh_sql(i) for i in range(8))
    + " FROM tok GROUP BY doc_id), "
    "buckets AS ("
    + " UNION ALL ".join(_band_sql(b) for b in range(4))
    + "), "
    # band_df_cap=200 — minhash_lsh_pairs' default production cap
    "hot AS (SELECT bucket FROM buckets GROUP BY bucket HAVING COUNT(*) > 200), "
    "cold AS (SELECT * FROM buckets WHERE bucket NOT IN "
    "(SELECT bucket FROM hot)) "
    "SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM cold a "
    "JOIN cold b ON a.bucket = b.bucket AND a.doc_id < b.doc_id"
)


def q_simhash16(spark, sf_dir):
    d = _t_par(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    return d.select("doc_id", simhash16(F.col("toks")).alias("simhash"))


SQL_SIMHASH16 = (
    "WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents), "
    "h AS (SELECT doc_id, ('0x' || substr(md5(tok || '#0'), 1, 15))::BIGINT AS h "
    "FROM tok), "
    "bits AS (SELECT doc_id, b.range AS b, "
    "SUM(CASE WHEN (h >> b.range) & 1 = 1 THEN 1 ELSE -1 END) AS s "
    "FROM h, range(0, 16) b GROUP BY doc_id, b.range) "
    "SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) "
    "AS BIGINT) AS simhash FROM bits GROUP BY doc_id"
)


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(
        _t_par(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        ["lang", "n_chars"],
        n=3,
    ).select(
        F.col("id1").alias("d1"), F.col("id2").alias("d2"), "ngram_jaccard"
    )


SQL_NGRAM_JACCARD = (
    # DuckDB 1.0 range() rejects lateral column args → static position table
    # (10k covers every documents.text) filtered per row.
    "WITH pos AS (SELECT range AS i FROM range(1, 10001)), "
    "sh AS (SELECT DISTINCT doc_id, lang, n_chars, substr(text, i::INT, 3) AS g "
    "FROM documents, pos WHERE i <= greatest(length(text) - 2, 1)), "
    "sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), "
    "pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM documents a "
    "JOIN documents b ON a.lang = b.lang AND a.n_chars = b.n_chars "
    "AND a.doc_id < b.doc_id), "
    "inter AS (SELECT sa.doc_id AS d1, sb.doc_id AS d2, COUNT(*) AS i FROM sh sa "
    "JOIN sh sb ON sa.g = sb.g AND sa.doc_id < sb.doc_id GROUP BY 1, 2) "
    "SELECT p.d1, p.d2, COALESCE(i.i, 0)::DOUBLE / (s1.n + s2.n - COALESCE(i.i, 0)) "
    "AS ngram_jaccard FROM pairs p JOIN sz s1 ON p.d1 = s1.doc_id "
    "JOIN sz s2 ON p.d2 = s2.doc_id "
    "LEFT JOIN inter i ON p.d1 = i.d1 AND p.d2 = i.d2"
)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def q_token_count(spark, sf_dir):
    d = _t_par(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ws_token_count("text").alias("ws_cnt"),
        bpe_ish_token_count("text").alias("bpe_cnt"),
    )


SQL_TOKEN_COUNT = (
    "SELECT doc_id, len(string_split(text, ' ')) AS ws_cnt, "
    r"length(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_cnt "
    "FROM documents"
)


def q_quality(spark, sf_dir):
    from codingchallenge_spark.functions.text import quality_score

    d = _t_par(spark, sf_dir, "documents")
    m = quality_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_tokens"].alias("n_tokens"),
        m["avg_token_len"].alias("avg_token_len"),
        m["alpha_ratio"].alias("alpha_ratio"),
        m["stopword_ratio"].alias("stopword_ratio"),
        quality_score(F.col("text")).alias("quality_score"),
    )


_EN = ", ".join(f"'{w}'" for w in LANG_LEXICONS["en"])

# Inline sub-expressions of functions.text.quality_score — literals cast to
# DOUBLE so DuckDB's DECIMAL literal arithmetic can't diverge from Spark's
# double path.
_SQL_Q_NTOK = "len(string_split(text, ' '))"
_SQL_Q_ALPHA = (
    "length(regexp_replace(lower(text), '[^a-z]', '', 'g')) / "
    "greatest(length(text), 1)"
)
_SQL_Q_STOP = (
    f"len(list_filter(string_split(lower(text), ' '), t -> t IN ({_EN}))) / "
    f"greatest({_SQL_Q_NTOK}, 1)"
)

SQL_QUALITY = (
    f"SELECT doc_id, {_SQL_Q_NTOK} AS n_tokens, "
    f"length(text) / greatest({_SQL_Q_NTOK}, 1) AS avg_token_len, "
    f"{_SQL_Q_ALPHA} AS alpha_ratio, "
    f"{_SQL_Q_STOP} AS stopword_ratio, "
    f"(CASE WHEN {_SQL_Q_NTOK} >= 10 AND {_SQL_Q_NTOK} <= 10000 "
    "THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END) * 0.4::DOUBLE "
    f"+ ({_SQL_Q_ALPHA}) * 0.4::DOUBLE "
    f"+ least(({_SQL_Q_STOP}) * 4.0::DOUBLE, 1.0::DOUBLE) * 0.2::DOUBLE "
    "AS quality_score "
    "FROM documents"
)


def q_langid(spark, sf_dir):
    return _t_par(spark, sf_dir, "documents").select(
        "doc_id", langid("text").alias("lang_pred")
    )


def _langid_sql() -> str:
    # Mirror functions.text.langid: iterate sorted langs, strict > to replace.
    langs = sorted(LANG_LEXICONS.items())
    cnt = {
        lang: (
            f"len(list_filter(string_split(lower(text), ' '), "
            f"t -> t IN ({', '.join(repr(w) for w in lex)})))"
        )
        for lang, lex in langs
    }
    best_expr, best_score = f"'{langs[0][0]}'", cnt[langs[0][0]]
    for lang, _ in langs[1:]:
        c = cnt[lang]
        best_expr = f"CASE WHEN {c} > {best_score} THEN '{lang}' ELSE {best_expr} END"
        best_score = f"CASE WHEN {c} > {best_score} THEN {c} ELSE {best_score} END"
    return (
        f"SELECT doc_id, CASE WHEN {best_score} > 0 THEN {best_expr} "
        "ELSE 'und' END AS lang_pred FROM documents"
    )


SQL_LANGID = _langid_sql()


def q_name_norm_docs(spark, sf_dir):
    # name_norm (P5) applied to a derived path — same derivation in SQL.
    d = _t_par(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("docs/"), F.col("source"), F.lit("/File_"),
                 F.col("doc_id").cast("string"), F.lit(".TXT")).alias("path"),
    )
    return d.select("doc_id", name_norm("path").alias("nn"))


SQL_NAME_NORM_DOCS = (
    "SELECT doc_id, trim(regexp_replace(regexp_replace(lower("
    "list_extract(string_split('docs/' || source || '/File_' || doc_id::VARCHAR "
    "|| '.TXT', '/'), -1)), '\\.[a-z0-9]{1,8}$', '', 'g'), '[^a-z0-9]+', ' ', 'g')"
    ") AS nn FROM documents"
)


# ---------------------------------------------------------------------------
# Embeddings: similarity search
# ---------------------------------------------------------------------------

def q_cosine_topk(spark, sf_dir):
    e = _t_par(spark, sf_dir, "embeddings")
    return brute_force_topk(
        e, e.filter(F.col("vec_id") < 10), id_col="vec_id", vec_col="embedding", k=5
    )


SQL_COSINE_TOPK = (
    "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
    "FROM embeddings WHERE vec_id < 10), "
    "c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings), "
    "s AS (SELECT query_id, neighbor_id, "
    "round(CASE WHEN sqrt(list_inner_product(cv, cv)) * "
    "sqrt(list_inner_product(qv, qv)) > 0 THEN "
    "list_inner_product(cv, qv) / (sqrt(list_inner_product(cv, cv)) * "
    "sqrt(list_inner_product(qv, qv))) ELSE 0.0 END, 6) AS cos "
    "FROM c, q WHERE neighbor_id != query_id), "
    "r AS (SELECT query_id, neighbor_id, cos, row_number() OVER "
    "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s) "
    "SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 5"
)


def q_embedding_neardup(spark, sf_dir):
    e = _t_par(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            F.round(
                cosine_sim(F.col("a.embedding"), F.col("b.embedding")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= 0.3)
    )


SQL_EMBEDDING_NEARDUP = (
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) "
    "SELECT a.vec_id AS id1, b.vec_id AS id2, "
    "round(CASE WHEN sqrt(list_inner_product(a.v, a.v)) * "
    "sqrt(list_inner_product(b.v, b.v)) > 0 THEN "
    "list_inner_product(a.v, b.v) / (sqrt(list_inner_product(a.v, a.v)) * "
    "sqrt(list_inner_product(b.v, b.v))) ELSE 0.0 END, 6) AS cos "
    "FROM e a JOIN e b ON a.vec_id < b.vec_id "
    "WHERE round(CASE WHEN sqrt(list_inner_product(a.v, a.v)) * "
    "sqrt(list_inner_product(b.v, b.v)) > 0 THEN "
    "list_inner_product(a.v, b.v) / (sqrt(list_inner_product(a.v, a.v)) * "
    "sqrt(list_inner_product(b.v, b.v))) ELSE 0.0 END, 6) >= 0.3"
)


# ---------------------------------------------------------------------------
# Multimodal: opaque binary payloads + typed metadata (operators/multimodal.py)
# ---------------------------------------------------------------------------

def _media_view(spark, sf_dir) -> DataFrame:
    """Deterministic media table derived from documents: payload is the UTF-8
    encoding of text (an opaque binary stand-in — no codec libs exist here),
    metadata typed per MEDIA_SCHEMA. Same derivation is expressible in SQL."""
    d = _t_par(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("audio").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def q_media_payload_sha(spark, sf_dir):
    # The SQL-checkable half of feature extraction: per-payload content
    # hash + byte length, computed through the real mapInPandas Arrow path.
    from codingchallenge_spark.operators.multimodal import extract_features

    return extract_features(_media_view(spark, sf_dir), fake=True).select(
        "media_id", "payload_sha", "byte_len"
    )


SQL_MEDIA_PAYLOAD_SHA = (
    # payload = encode(text): sha256 over those bytes == sha256 of the string.
    "SELECT doc_id::VARCHAR AS media_id, sha256(text) AS payload_sha, "
    "octet_length(encode(text))::BIGINT AS byte_len FROM documents"
)


def q_frame_sample(spark, sf_dir):
    from codingchallenge_spark.operators.multimodal import frame_sample_plan

    return frame_sample_plan(_media_view(spark, sf_dir), every_ms=1000)


SQL_FRAME_SAMPLE = (
    # Spark sequence(0, max(duration-1, 0), 1000) → 0..duration-1 step 1000.
    # DuckDB 1.0 range() rejects lateral column args → static position table.
    "WITH pos AS (SELECT range AS i FROM range(0, 1000)) "
    "SELECT doc_id::VARCHAR AS media_id, (i * 1000)::INT AS sample_ms "
    "FROM documents, pos WHERE i * 1000 <= greatest(n_chars * 10 - 1, 0)"
)


def q_media_features(spark, sf_dir):
    # The deterministic fake feature vectors exercise the full Arrow batch
    # shape (binary in → array<float> out). Surface is scalarized via
    # posexplode — the driver's canonicalizer can't hash list columns — and
    # the fake decode (sha256-digest bytes → uint32 LE → %1000/1000) is
    # replicated exactly in the DuckDB twin, so this is a full hash check of
    # the whole mapInPandas path. round(·, 6) absorbs the float32 storage of
    # the feature values (they are k/1000 with k < 1000, error < 6e-8).
    from codingchallenge_spark.operators.multimodal import extract_features

    feats = extract_features(_media_view(spark, sf_dir), fake=True)
    return feats.select(
        "media_id",
        "payload_sha",
        "byte_len",
        F.posexplode("feature").alias("dim", "val"),
    ).select(
        "media_id",
        "payload_sha",
        "byte_len",
        "dim",
        F.round(F.col("val").cast("double"), 6).alias("val"),
    )


SQL_MEDIA_FEATURES = (
    # Mirror of multimodal._fake_decode_features: sha256 digest bytes 4d..4d+3
    # as little-endian uint32, % 1000, / 1000. Hex-pair arithmetic replays the
    # byte decode; payload bytes == UTF-8(text) (see SQL_MEDIA_PAYLOAD_SHA).
    "WITH f AS (SELECT doc_id::VARCHAR AS media_id, sha256(text) AS sha, "
    "octet_length(encode(text))::BIGINT AS byte_len FROM documents), "
    "pos AS (SELECT range AS dim FROM range(0, 8)) "
    "SELECT media_id, sha AS payload_sha, byte_len, dim::INT AS dim, "
    "round((((('0x' || substr(sha, dim * 8 + 1, 2))::BIGINT) "
    "+ (('0x' || substr(sha, dim * 8 + 3, 2))::BIGINT) * 256 "
    "+ (('0x' || substr(sha, dim * 8 + 5, 2))::BIGINT) * 65536 "
    "+ (('0x' || substr(sha, dim * 8 + 7, 2))::BIGINT) * 16777216"
    ") % 1000) / 1000.0, 6) AS val "
    "FROM f, pos"
)


# ---------------------------------------------------------------------------
# Flagship ER + remaining dedup/ANN operators
# ---------------------------------------------------------------------------

def q_approx_count_distinct(spark, sf_dir):
    # HLL sketch values can't hash-match DuckDB's (different sketch), but a
    # DERIVED check can: emit the exact distinct count plus the boolean
    # |approx − exact| / exact ≤ 0.05 — the pytest error bound
    # (tests/test_query_pack.py) promoted into the driver artifact. The
    # oracle computes the same exact count and asserts the bound as TRUE, so
    # a sketch drifting past 5% hash-mismatches instead of going unrecorded.
    agg = _t(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey").alias("_approx"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "exact_parts",
        (
            F.abs(F.col("_approx") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("within_5pct"),
    )


SQL_APPROX_COUNT_DISTINCT = (
    # The exact side of the derived check; TRUE mirrors the 5% HLL bound the
    # Spark side computes (see q_approx_count_distinct).
    "SELECT count(DISTINCT l_partkey) AS exact_parts, true AS within_5pct "
    "FROM lineitem"
)


def q_ann_lsh(spark, sf_dir):
    # Oracle surface uses the JVM sketch plan (sequential-fold dot products
    # against md5-derived hyperplanes — bit-identical to DuckDB; the planes
    # themselves are portable integers-over-1000, no RNG state); production
    # uses sketch="arrow" (numpy matmul) over the SAME planes. Recall vs
    # brute force is asserted in tests/test_ann.py; the sign-bit FP margin
    # (min |dot| ≥ 3e-5 vs ~1e-15 noise) is machine-checked there too.
    from codingchallenge_spark.operators.ann import lsh_topk

    return lsh_topk(_t_par(spark, sf_dir, "embeddings"), k=5, sketch="jvm")


def q_ann_ivf(spark, sf_dir):
    # Oracle surface uses the JVM assignment plan (sequential-fold cosine,
    # bit-identical to DuckDB); production uses assign="arrow" (numpy matmul).
    from codingchallenge_spark.operators.ann import ivf_topk

    return ivf_topk(
        _t_par(spark, sf_dir, "embeddings"),
        k=5,
        n_centroids=16,
        n_probe=4,
        assign="jvm",
    )


SQL_ANN_LSH = (
    # Exact twin of lsh_topk(sketch="jvm", k=5, n_planes=16, bands=4,
    # seed=42, bucket_cap=2000) at dim 64: md5-derived planes (identical
    # doubles — integer hash % 2001 mapped to [-1,1] over /1000.0),
    # sequential-fold sign bits, MSB-first band codes, bucket = band·16 +
    # code, hot-bucket cap, distinct colliding pairs, exact cosine re-rank.
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "planes AS (SELECT i AS plane_id, "
    "list_transform(generate_series(1, 64), j -> "
    "((('0x' || substr(md5('42_' || i::VARCHAR || '_' || (j-1)::VARCHAR), "
    "1, 15))::BIGINT % 2001 - 1000) / 1000.0)) AS pvec "
    "FROM generate_series(0, 15) t(i)), "
    "bits AS (SELECT e.vec_id, p.plane_id, "
    "CASE WHEN list_inner_product(e.v, p.pvec) > 0 THEN 1 ELSE 0 END AS bit "
    "FROM e CROSS JOIN planes p), "
    "bk AS (SELECT vec_id, "
    "(plane_id // 4) * 16 + SUM(bit * (1 << (3 - (plane_id % 4)))) AS bucket "
    "FROM bits GROUP BY vec_id, plane_id // 4), "
    "hot AS (SELECT bucket FROM bk GROUP BY bucket HAVING count(*) > 2000), "
    "cold AS (SELECT vec_id, bucket FROM bk "
    "WHERE bucket NOT IN (SELECT bucket FROM hot)), "
    "cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id "
    "FROM cold a JOIN cold b ON a.bucket = b.bucket "
    "AND a.vec_id != b.vec_id), "
    "scored AS (SELECT c.query_id, c.neighbor_id, "
    "round({cos}, 6) AS cos "
    "FROM cand c JOIN e eq ON eq.vec_id = c.query_id "
    "JOIN e ec ON ec.vec_id = c.neighbor_id), "
    "r AS (SELECT query_id, neighbor_id, cos, row_number() OVER "
    "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank "
    "FROM scored) "
    "SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 5"
)


_IVF_COS = (
    "CASE WHEN sqrt(list_inner_product({a}, {a})) * "
    "sqrt(list_inner_product({b}, {b})) > 0 THEN "
    "list_inner_product({a}, {b}) / (sqrt(list_inner_product({a}, {a})) * "
    "sqrt(list_inner_product({b}, {b}))) ELSE 0.0 END"
)

# Spark computes cosine_sim(_cvec, _qvec); operand order is immaterial at
# the bit level (per-element double multiply and the norm product commute
# exactly), as q_ann_ivf's hash-matched twin already demonstrates.
SQL_ANN_LSH = SQL_ANN_LSH.format(cos=_IVF_COS.format(a="ec.v", b="eq.v"))

SQL_ANN_IVF = (
    # Exact twin of ivf_topk(assign="jvm"): portable-md5-sampled seed
    # centroids, nearest-cell assignment ranked on (round(cos,9), cent_id),
    # n_probe=4 probed cells per query, exact cosine re-rank (round 6), k=5.
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "seed AS (SELECT vec_id, v, row_number() OVER (ORDER BY "
    "('0x' || substr(md5(vec_id::VARCHAR || '#0'), 1, 15))::BIGINT, vec_id) "
    "AS rn FROM e), "
    "cents AS (SELECT (rn - 1)::INT AS cent_id, v AS cvec FROM seed "
    "WHERE rn <= 16), "
    "sim AS (SELECT e.vec_id, c.cent_id, "
    f"round({_IVF_COS.format(a='e.v', b='c.cvec')}, 9) AS s "
    "FROM e CROSS JOIN cents c), "
    "ranked AS (SELECT vec_id, cent_id, row_number() OVER "
    "(PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rnk FROM sim), "
    "c_cell AS (SELECT vec_id AS neighbor_id, cent_id AS cell FROM ranked "
    "WHERE rnk = 1), "
    "q_cell AS (SELECT vec_id AS query_id, cent_id AS cell FROM ranked "
    "WHERE rnk <= 4), "
    "cand AS (SELECT q.query_id, c.neighbor_id, "
    f"round({_IVF_COS.format(a='eq.v', b='ec.v')}, 6) AS cos "
    "FROM q_cell q JOIN c_cell c ON q.cell = c.cell "
    "AND q.query_id != c.neighbor_id "
    "JOIN e eq ON eq.vec_id = q.query_id "
    "JOIN e ec ON ec.vec_id = c.neighbor_id), "
    "r AS (SELECT query_id, neighbor_id, cos, row_number() OVER "
    "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM cand) "
    "SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 5"
)


def q_er_entities(spark, sf_dir):
    # Flagship: the full record-linkage slice (normalize → multi-pass
    # blocking → fused Arrow scoring → large-star/small-star CC) over the
    # documents table mapped to repo-file shape. Hash-checked end-to-end
    # against SQL_ER_ENTITIES — a complete DuckDB twin of the matcher
    # (recursive-CTE transitive closure stands in for the iterative CC).
    # Threshold 0.75 yields a non-trivial cluster structure on this corpus
    # (sf0.01: 266 clusters, sizes up to 17) with ≥ 5e-4 margin between every
    # candidate pair's exact score and the threshold at sf0.01 (the driver's
    # hash scale; 3.8e-5 at the sf0.001 smoke scale) — machine-checked by
    # tests/test_query_pack.py::test_flagship_threshold_margin. The
    # jw/lev/jaccard kernels are bitwise equal across engines (verified), so
    # the edge set is FP-safe.
    from codingchallenge_spark.plans.matcher import MatcherConfig, resolve_entities
    from codingchallenge_spark.sources.records import documents_as_records

    recs = documents_as_records(spark, sf_dir)
    cfg = MatcherConfig(threshold=0.75)
    return resolve_entities(recs, cfg).select("rid", "entity_id", "content_sha")


def _er_cte_body() -> str:
    """Shared CTE chain (through the min-label ``labels`` CTE) of the two
    matcher-twin SQL strings: SQL_ER_ENTITIES appends the entity emit,
    SQL_PAIRWISE_F1 appends the labeled-pair/F1 derivation.

    Stage-by-stage mirror of plans.matcher.resolve_entities: the derived
    records view (sources.records.documents_as_records), normalize
    (functions.normalize: rid/content_sha/name_norm/tokens incl. stopword +
    min-length filters), token blocking with df_cap=100, global
    sorted-neighborhood w=4 (the Spark bucketed+seam implementation is
    provably identical to this single-sort lead form — operators.blocking),
    meta-union (≥2 shared cold tokens OR SN pair), exact scoring
    (0.2·jw + 0.2·lev + 0.6·token-jaccard ≥ 0.75), and min-label components
    via recursive reachability. Valid because every kernel is bitwise equal
    across engines on these inputs (name keys < 64 chars — the numpy kernels
    truncate at 64) and hashed jaccard has no 64-bit collisions here.
    """
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH RECURSIVE recs AS (
  SELECT source AS repo,
         'doc/' || doc_id::VARCHAR || '.txt' AS path,
         substr(sha256(text), 1, 16) AS commit_sha,
         text AS content
  FROM documents
),
norm AS (
  SELECT sha256(concat_ws(chr(31), repo, path, commit_sha)) AS rid,
         sha256(content) AS content_sha,
         trim(regexp_replace(regexp_replace(regexp_replace(lower(
             list_extract(string_split(path, '/'), -1)),
           '\\.[a-z0-9]{{1,8}}$', ''), '[^a-z0-9]+', ' ', 'g'),
           '\\s+', ' ', 'g')) AS name_norm,
         content
  FROM recs WHERE content IS NOT NULL AND length(content) > 0
),
tok AS (
  SELECT DISTINCT rid, t AS tok FROM (
    SELECT rid, unnest(string_split_regex(lower(content), '[^a-z0-9]+')) AS t
    FROM norm
  ) WHERE length(t) >= 2 AND t NOT IN ({sw})
),
dfreq AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY tok),
cold AS (SELECT t.rid, t.tok FROM tok t JOIN dfreq d USING (tok)
         WHERE d.df <= 100),
tok_pairs AS (
  SELECT a.rid AS rid1, b.rid AS rid2, COUNT(*) AS overlap
  FROM cold a JOIN cold b ON a.tok = b.tok AND a.rid < b.rid GROUP BY 1, 2
),
sn_base AS (
  SELECT rid, row_number() OVER (ORDER BY name_norm, rid) AS pos FROM norm
),
sn_pairs AS (
  SELECT least(a.rid, b.rid) AS rid1, greatest(a.rid, b.rid) AS rid2
  FROM sn_base a JOIN sn_base b ON b.pos - a.pos BETWEEN 1 AND 3
),
cand AS (
  SELECT rid1, rid2 FROM tok_pairs WHERE overlap >= 2
  UNION
  SELECT rid1, rid2 FROM sn_pairs
),
sz AS (SELECT rid, COUNT(*) AS n FROM tok GROUP BY rid),
inter AS (
  SELECT c.rid1, c.rid2, COUNT(*) AS i
  FROM cand c JOIN tok t1 ON t1.rid = c.rid1
  JOIN tok t2 ON t2.rid = c.rid2 AND t2.tok = t1.tok
  GROUP BY 1, 2
),
edges AS (
  SELECT c.rid1, c.rid2 FROM cand c
  JOIN norm n1 ON n1.rid = c.rid1 JOIN norm n2 ON n2.rid = c.rid2
  LEFT JOIN sz s1 ON s1.rid = c.rid1 LEFT JOIN sz s2 ON s2.rid = c.rid2
  LEFT JOIN inter i ON i.rid1 = c.rid1 AND i.rid2 = c.rid2
  WHERE 0.2 * jaro_winkler_similarity(n1.name_norm, n2.name_norm)
      + 0.2 * (1.0 - levenshtein(n1.name_norm, n2.name_norm)::DOUBLE /
               greatest(length(n1.name_norm), length(n2.name_norm), 1))
      + 0.6 * (CASE WHEN coalesce(s1.n, 0) + coalesce(s2.n, 0) = 0 THEN 1.0
               ELSE coalesce(i.i, 0)::DOUBLE /
                    (coalesce(s1.n, 0) + coalesce(s2.n, 0)
                     - coalesce(i.i, 0)) END)
      >= 0.75
),
sym AS (SELECT rid1 AS src, rid2 AS dst FROM edges
        UNION ALL SELECT rid2, rid1 FROM edges),
reach(src, dst) AS (
  SELECT rid, rid FROM norm
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
),
labels AS (SELECT src AS rid, MIN(dst) AS entity_id FROM reach GROUP BY src)
"""


SQL_ER_ENTITIES = _er_cte_body() + (
    "SELECT n.rid, l.entity_id, n.content_sha "
    "FROM norm n JOIN labels l ON l.rid = n.rid"
)


def q_pairwise_f1(spark, sf_dir):
    # E1 on the driver oracle: pairwise precision/recall/F1 of the flagship
    # entity partition against a deterministic labeled-pairs derivation —
    # labeled same-block pairs (the spec metric, BASELINE.json:2) are the
    # sorted-neighborhood window pairs over the normalized name order
    # (window=4, exactly the flagship SN pass), labeled is_match = content
    # sha256 equality (exact-duplicate truth, derivable identically in SQL).
    # The arithmetic is eval.pairwise_f1_df — the SAME plan run_pipeline's
    # --labeled-pairs gate collects — so the spec's headline metric is
    # hash-checked end to end, not just pytest-bounded.
    from codingchallenge_spark.eval import pairwise_f1_df
    from codingchallenge_spark.functions.normalize import normalize_records
    from codingchallenge_spark.operators.blocking import sorted_neighborhood
    from codingchallenge_spark.plans.matcher import MatcherConfig, resolve_entities
    from codingchallenge_spark.sources.records import documents_as_records

    recs = documents_as_records(spark, sf_dir)
    norm = normalize_records(recs)  # hex rids: same SN order as binary
    sn = sorted_neighborhood(norm.select("rid", "name_norm"), window=4)
    sha = norm.select("rid", "content_sha")
    s1 = sha.select(F.col("rid").alias("rid1"), F.col("content_sha").alias("_s1"))
    s2 = sha.select(F.col("rid").alias("rid2"), F.col("content_sha").alias("_s2"))
    labeled = (
        sn.join(s1, "rid1")
        .join(s2, "rid2")
        .select("rid1", "rid2", (F.col("_s1") == F.col("_s2")).alias("is_match"))
    )
    labels = resolve_entities(recs, MatcherConfig(threshold=0.75)).select(
        "rid", "entity_id"
    )
    m = pairwise_f1_df(labels, labeled)
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    )


SQL_PAIRWISE_F1 = _er_cte_body() + (
    # Labeled pairs: the body's sn_pairs CTE (same SN window derivation the
    # Spark side reuses via operators.blocking.sorted_neighborhood), truth =
    # content_sha equality; prediction = same min-label entity. Counts cast
    # to BIGINT (DuckDB SUM yields HUGEINT); rates rounded like the Spark
    # side. Zero-denominator conventions mirror eval.PairwiseMetrics.
    ", lp AS ("
    "  SELECT s.rid1, s.rid2, (n1.content_sha = n2.content_sha) AS is_match"
    "  FROM sn_pairs s"
    "  JOIN norm n1 ON n1.rid = s.rid1 JOIN norm n2 ON n2.rid = s.rid2"
    "), pred AS ("
    "  SELECT lp.is_match, (l1.entity_id = l2.entity_id) AS pred"
    "  FROM lp JOIN labels l1 ON l1.rid = lp.rid1"
    "  JOIN labels l2 ON l2.rid = lp.rid2"
    "), cnt AS ("
    "  SELECT"
    "    (COUNT(*) FILTER (WHERE pred AND is_match))::BIGINT AS tp,"
    "    (COUNT(*) FILTER (WHERE pred AND NOT is_match))::BIGINT AS fp,"
    "    (COUNT(*) FILTER (WHERE NOT pred AND is_match))::BIGINT AS fn,"
    "    (COUNT(*) FILTER (WHERE NOT pred AND NOT is_match))::BIGINT AS tn"
    "  FROM pred"
    "), pr AS ("
    "  SELECT tp, fp, fn, tn,"
    "    CASE WHEN tp + fp = 0 THEN 1.0 ELSE tp::DOUBLE / (tp + fp) END AS p,"
    "    CASE WHEN tp + fn = 0 THEN 1.0 ELSE tp::DOUBLE / (tp + fn) END AS r"
    "  FROM cnt) "
    "SELECT tp, fp, fn, tn, round(p, 6) AS precision, round(r, 6) AS recall, "
    "round(CASE WHEN p + r = 0 THEN 0.0 ELSE 2.0 * p * r / (p + r) END, 6) "
    "AS f1 FROM pr"
)


def q_simhash64(spark, sf_dir):
    # 64-bit SimHash fully JVM-side (explode + 64 codegen'd bit-sum
    # aggregates) — zero Python eval nodes (asserted in test_plan_quality).
    from codingchallenge_spark.operators.dedup import simhash64_exploded

    d = _t_par(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    return simhash64_exploded(d, "doc_id", "toks")


SQL_SIMHASH64 = (
    # Bits 0-31 from md5-hash salt 101, bits 32-63 from salt 202; bit b set
    # iff the ±1 sum over the doc's distinct tokens is > 0. Bit 63 is the
    # sign bit (MIN_LONG term). Empty-token docs → 0 via left join.
    "WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) "
    "AS tok FROM documents), "
    "h AS (SELECT doc_id, "
    "('0x' || substr(md5(tok || '#101'), 1, 15))::BIGINT AS hl, "
    "('0x' || substr(md5(tok || '#202'), 1, 15))::BIGINT AS hh FROM tok), "
    "bits AS (SELECT doc_id, b.range AS b, "
    "SUM(CASE WHEN ((CASE WHEN b.range < 32 THEN hl ELSE hh END) "
    ">> (b.range % 32)::INT) & 1 = 1 THEN 1 ELSE -1 END) AS s "
    "FROM h, range(0, 64) b GROUP BY doc_id, b.range), "
    "sig AS (SELECT doc_id, SUM(CASE WHEN s > 0 THEN "
    "(CASE WHEN b = 63 THEN -9223372036854775808 "
    "ELSE (1::BIGINT << b::INT) END) ELSE 0 END)::BIGINT AS simhash64 "
    "FROM bits GROUP BY doc_id) "
    "SELECT d.doc_id, COALESCE(sig.simhash64, 0)::BIGINT AS simhash64 "
    "FROM documents d LEFT JOIN sig USING (doc_id)"
)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Registration order is the driver's execution order. CORRECTNESS_r01
# recorded exactly the first 50 registered queries and silently dropped the
# rest, so (a) the registry is kept AT that window (50 entries — merged
# q_least_greatest→q_math_expr, q_lev_ratio→q_levenshtein,
# q_intersect/q_except→q_intersect_except, q_rollup/q_cube/q_grouping_sets→
# q_multi_dim_agg, and in round 4 q_semi_join/q_anti_join→q_semi_anti_join
# to make room for q_pairwise_f1, the spec's headline metric), and (b) the
# flagship + the entries that went unrecorded in round 1 are registered
# first, right after one cheap smoke scan.
QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "q_scan_project": (q_scan_project, SQL_SCAN_PROJECT),
    # flagship + previously-unrecorded entries (front-loaded)
    "q_er_entities": (q_er_entities, SQL_ER_ENTITIES),
    "q_pairwise_f1": (q_pairwise_f1, SQL_PAIRWISE_F1),
    "q_simhash64": (q_simhash64, SQL_SIMHASH64),
    "q_ann_ivf": (q_ann_ivf, SQL_ANN_IVF),
    "q_ann_lsh": (q_ann_lsh, SQL_ANN_LSH),
    "q_media_features": (q_media_features, SQL_MEDIA_FEATURES),
    "q_approx_count_distinct": (
        q_approx_count_distinct,
        SQL_APPROX_COUNT_DISTINCT,
    ),
    # relational core
    "q_filter_pushdown": (q_filter_pushdown, SQL_FILTER),
    "q_sha256": (q_sha256, SQL_SHA256),
    "q_concat_hash": (q_concat_hash, SQL_CONCAT_HASH),
    "q_norm_string": (q_norm_string, SQL_NORM_STRING),
    "q_tokenize_counts": (q_tokenize_counts, SQL_TOKENIZE),
    "q_json_extract": (q_json_extract, SQL_JSON),
    "q_math_expr": (q_math_expr, SQL_MATH),
    "q_window_lead": (q_window_lead, SQL_WINDOW_LEAD),
    "q_row_number": (q_row_number, SQL_ROW_NUMBER),
    "q_window_frame_sum": (q_window_frame_sum, SQL_WINDOW_FRAME),
    "q_orderby_limit": (q_orderby_limit, SQL_ORDERBY_LIMIT),
    "q_topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "q_equi_join": (q_equi_join, SQL_EQUI_JOIN),
    "q_broadcast_join": (q_broadcast_join, SQL_BROADCAST_JOIN),
    "q_double_join_agg": (q_double_join_agg, SQL_DOUBLE_JOIN),
    "q_semi_anti_join": (q_semi_anti_join, SQL_SEMI_ANTI_JOIN),
    "q_union_distinct": (q_union_distinct, SQL_UNION_DISTINCT),
    "q_intersect_except": (q_intersect_except, SQL_INTERSECT_EXCEPT),
    "q_groupby_agg": (q_groupby_agg, SQL_GROUPBY_AGG),
    "q_min_agg": (q_min_agg, SQL_MIN_AGG),
    "q_multi_dim_agg": (q_multi_dim_agg, SQL_MULTI_DIM_AGG),
    "q_distinct": (q_distinct, SQL_DISTINCT),
    "q_salted_join": (q_salted_join, SQL_SALTED_JOIN),
    # blocking / similarity / dedup
    "q_explode_selfjoin": (q_explode_selfjoin, SQL_EXPLODE_SELFJOIN),
    "q_levenshtein": (q_levenshtein, SQL_LEVENSHTEIN),
    "q_jaro_winkler": (q_jaro_winkler, SQL_JARO_WINKLER),
    "q_jaccard_pairs": (q_jaccard_pairs, SQL_JACCARD_PAIRS),
    "q_dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "q_dedup_fingerprint": (q_dedup_fingerprint, SQL_DEDUP_FINGERPRINT),
    "q_minhash_sig": (q_minhash_sig, SQL_MINHASH_SIG),
    "q_minhash_lsh_pairs": (q_minhash_lsh_pairs, SQL_MINHASH_LSH),
    "q_simhash16": (q_simhash16, SQL_SIMHASH16),
    "q_ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    # text analysis
    "q_token_count": (q_token_count, SQL_TOKEN_COUNT),
    "q_quality": (q_quality, SQL_QUALITY),
    "q_langid": (q_langid, SQL_LANGID),
    "q_name_norm_docs": (q_name_norm_docs, SQL_NAME_NORM_DOCS),
    # embeddings
    "q_cosine_topk": (q_cosine_topk, SQL_COSINE_TOPK),
    "q_embedding_neardup": (q_embedding_neardup, SQL_EMBEDDING_NEARDUP),
    # multimodal plumbing
    "q_media_payload_sha": (q_media_payload_sha, SQL_MEDIA_PAYLOAD_SHA),
    "q_frame_sample": (q_frame_sample, SQL_FRAME_SAMPLE),
    # 50th (last) slot of the driver's recording window: the production-capped
    # LSH plan, hash-verified against the HAVING>cap anti-join CTE twin.
    "q_minhash_lsh_prod": (q_minhash_lsh_prod, SQL_MINHASH_LSH_PROD),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
