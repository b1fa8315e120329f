"""Deduplication operators for training-data pipelines.

Four families, each Spark-first and SQL-oracle-checkable:

- exact: hash-groupBy on sha256(content) — one shuffle, map-side partial agg.
- MinHash + LSH: portable md5-based hash (identical in DuckDB via
  ('0x'||substr(md5(t),1,15))::BIGINT), k-permutation signatures via
  higher-order array functions (JVM-side, no Python), banded LSH bucket join.
- SimHash: 64-bit (explode + 64 codegen'd bit-sum aggregates, exact SQL twin)
  and a 16-bit JVM-native variant whose SQL twin is exact.
- n-gram Jaccard: character shingles via sequence+transform, set Jaccard.

Scale: every family reduces to groupBy/join on uniformly-hashed keys — no
driver-side loops and ZERO Python crossings in any dedup path (asserted in
tests/test_plan_quality.py). LSH band join is the classic explode-by-band +
hash-partitioned
self-join: identical shuffle shape to token blocking (operators/blocking.py),
so the same hot-key cap applies to degenerate bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codingchallenge_spark.functions.similarity import token_jaccard


def portable_hash64(col: Column, salt: int = 0) -> Column:
    """Deterministic 60-bit hash computable identically in DuckDB:
    ('0x' || substr(md5(x || '#salt'), 1, 15))::BIGINT."""
    salted = F.concat(col, F.lit(f"#{salt}"))
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id row per content sha. Returns
    [content_sha, keep_id, dup_cnt]. One hash-shuffle; partial aggregation
    (min/count) is map-side combined automatically."""
    return (
        df.groupBy(F.sha2(F.col(content_col), 256).alias("content_sha"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_cnt"),
        )
    )


def minhash_signature(tokens: Column, k: int = 32) -> Column:
    """k-permutation MinHash signature as array<long>, fully JVM-side:
    sig[i] = min over tokens of portable_hash64(token, salt=i)."""

    def hash_with(salt: int):
        # Single-arg lambda on purpose: a 2-arg lambda would make F.transform
        # pass the array index as the second argument.
        return lambda t: portable_hash64(t, salt)

    return F.array(
        *[F.array_min(F.transform(tokens, hash_with(i))) for i in range(k)]
    )


def minhash_signature_exploded(
    docs: DataFrame, id_col: str, tokens_col: str, k: int
) -> DataFrame:
    """MinHash signatures via explode + k min-aggregates — identical values
    to :func:`minhash_signature`, but every expression is codegen-able
    (higher-order ``transform``/``array_min`` are interpreted-eval in Spark;
    at corpus scale that serializes the signature pass). One shuffle with
    map-side partial min. Returns [_id, sig:array<long>]."""
    tok = docs.select(
        F.col(id_col).alias("_id"), F.explode(F.col(tokens_col)).alias("_t")
    )
    aggs = [
        F.min(portable_hash64(F.col("_t"), salt=i)).alias(f"_mh{i}")
        for i in range(k)
    ]
    sig = tok.groupBy("_id").agg(*aggs)
    return sig.select(
        "_id", F.array(*[F.col(f"_mh{i}") for i in range(k)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    k: int = 32,
    bands: int = 8,
    band_df_cap: int = 200,
) -> DataFrame:
    """MinHash-LSH candidate pairs: sign → band → bucket self-join.

    Two docs collide if any band (k/bands consecutive signature slots) hashes
    equal. Degenerate buckets (> band_df_cap members, e.g. all-empty docs)
    are dropped via broadcast anti-join — same skew guard as token blocking.
    Returns [id1, id2] canonical + deduped.

    Docs whose token array is empty produce no exploded rows and therefore no
    signature/bucket — correct: an empty document carries no MinHash evidence,
    and the DuckDB oracle (unnest + GROUP BY) drops those docs identically.
    (The interpreted array form would instead emit a null-filled signature
    colliding all empties into one bucket — different semantics, independent
    of whether the band cap would also happen to drop it.)
    """
    rows_per_band = k // bands
    sig = minhash_signature_exploded(docs, id_col, tokens_col, k)
    # Round 6: the bucket key is a STRUCT (band index + the band's signature
    # slots) instead of sha256 over their string concatenation. Bucket values
    # are internal — only the colliding PAIR SET reaches the output — and
    # struct equality partitions identically to the old digest equality (the
    # comma-joined longs were collision-free, so the mapping was 1:1). This
    # drops a per-(doc, band) sha256 + string build and shuffles ~24 bytes of
    # longs instead of a 64-char hex string through the hot-list aggregate,
    # the anti-join and the bucket self-join (guide §2.3 "narrower types").
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            *[
                F.element_at("sig", b * rows_per_band + j + 1).alias(f"v{j}")
                for j in range(rows_per_band)
            ],
        ).alias("bucket")
        for b in range(bands)
    ]
    buckets = sig.select("_id", F.explode(F.array(*band_cols)).alias("bucket"))
    hot = (
        buckets.groupBy("bucket").agg(F.count("*").alias("c"))
        .filter(F.col("c") > band_df_cap).select("bucket")
    )
    cold = buckets.join(F.broadcast(hot), "bucket", "left_anti")
    # Same guard as token_blocking's self-join: Catalyst can under-estimate
    # the derived bucket relation and broadcast the ENTIRE corpus×bands
    # bucket list — serial build, driver-killer at scale. shuffle_hash
    # co-locates on bucket; per-bucket rows are bounded by band_df_cap.
    a, b = cold.alias("a"), cold.hint("shuffle_hash").alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )


def simhash16(tokens: Column) -> Column:
    """16-bit SimHash, JVM-native (exact SQL twin exists): for each bit b,
    sum ±1 over tokens' portable hashes; bit set iff sum > 0."""
    hashes = F.transform(tokens, lambda t: portable_hash64(t, 0))
    bit_terms = [
        F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            > 0,
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(16)
    ]
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def simhash64_exploded(
    docs: DataFrame, id_col: str, tokens_col: str
) -> DataFrame:
    """64-bit SimHash, fully JVM-side (zero Python crossings, exact SQL twin).

    Same shape as :func:`minhash_signature_exploded`: explode tokens, then one
    groupBy with 64 codegen'd ±1 bit-sum aggregates (map-side partial agg, one
    shuffle — scales like any hash aggregate). Bit entropy: bits 0-31 come
    from portable_hash64(token, salt=101), bits 32-63 from salt=202 (the
    portable md5 hash is 60 bits wide, so one hash cannot feed all 64 bits).
    Bit b is set iff the ±1 sum over the document's distinct tokens is > 0.
    Docs with no tokens get simhash64 = 0 (restored via left join).

    Replaces a per-row/per-token Python pandas UDF (round-1 `simhash64_udf`)
    — values differ from that retired kernel (hash basis changed to the
    portable md5 hash so DuckDB can verify it).

    Tokens are deduped here (array_distinct before the explode — no extra
    shuffle) so the documented distinct-token semantics hold for ANY caller,
    not only those that pre-dedupe; the SQL twin's SELECT DISTINCT matches.
    """
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.col(tokens_col))).alias("_t"),
    )
    hl = portable_hash64(F.col("_t"), salt=101)
    hh = portable_hash64(F.col("_t"), salt=202)
    aggs = []
    for b in range(64):
        bit = F.shiftright(hl if b < 32 else hh, b % 32).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit * 2 - 1).alias(f"_s{b}"))
    sums = tok.groupBy("_id").agg(*aggs)
    val = F.lit(0).cast("long")
    for b in range(64):
        # Bit 63 is the long sign bit: its term is MIN_LONG, and adding it to
        # the (non-negative) sum of lower bits is exact two's complement.
        term = F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
        val = val + F.when(F.col(f"_s{b}") > 0, term).otherwise(
            F.lit(0).cast("long")
        )
    sig = sums.select("_id", val.alias("simhash64"))
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(sig, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("simhash64", F.lit(0).cast("long")).alias("simhash64"),
        )
    )


def char_shingles(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams via sequence+transform (JVM-side)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1))),
            lambda i: text.substr(i, F.lit(n)),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    n: int = 3,
) -> DataFrame:
    """n-gram Jaccard near-dup scores for pairs blocked on ``block_cols``.

    Shingling uses expr-level substring over a sequence (codegen'd); the
    self-join is a hash equi-join on the block key.
    """
    base = docs.select(
        F.col(id_col).alias("_id"),
        *block_cols,
        char_shingles(F.col(text_col), n).alias("shingles"),
    )
    # shuffle_hash: keep Catalyst from broadcasting the whole shingled corpus
    # when its size estimate undershoots (same guard as the token-blocking
    # and LSH self-joins); AQE splits any skewed block at runtime.
    a, b = base.alias("a"), base.hint("shuffle_hash").alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col("a._id") < F.col("b._id"))
    joined = a.join(b, cond)
    return joined.select(
        F.col("a._id").alias("id1"),
        F.col("b._id").alias("id2"),
        token_jaccard(F.col("a.shingles"), F.col("b.shingles")).alias("ngram_jaccard"),
    )
