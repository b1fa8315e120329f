"""Scorer-surface contracts not covered by the plan/parity gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codingchallenge_spark.functions.normalize import (
    normalize_records,
    with_token_hashes,
)
from codingchallenge_spark.operators.scoring import score_pairs_fused_arrow
from codingchallenge_spark.plans.matcher import MatcherConfig, candidate_pairs


def test_fused_arrow_rejects_non_hex_rids(spark):
    """The mapInPandas variant ships rids as unhexed binary; F.unhex silently
    NULLs malformed input, so the guard must raise instead of emitting rows
    with nulled ids (ADVICE r02)."""
    pairs = spark.createDataFrame(
        [("not-a-sha", "also-not-hex")], ["rid1", "rid2"]
    )
    attrs = spark.createDataFrame(
        [
            ("not-a-sha", "alpha beta", ["alpha", "beta"]),
            ("also-not-hex", "alpha beta", ["alpha", "beta"]),
        ],
        ["rid", "name_norm", "tokens"],
    )
    out = score_pairs_fused_arrow(pairs, attrs, threshold=0.0)
    with pytest.raises(Exception, match="sha256 hex|ASSERT"):
        out.collect()


def test_fused_arrow_accepts_real_rids(spark, tiny_records):
    """Well-formed sha256-hex rids pass the guard and round-trip exactly."""
    cfg = MatcherConfig()
    norm = with_token_hashes(normalize_records(tiny_records))
    pairs = candidate_pairs(norm, cfg).limit(50)
    rows = score_pairs_fused_arrow(
        pairs, norm, weights=cfg.weights, threshold=cfg.threshold
    ).collect()
    for r in rows:
        assert len(r.rid1) == 64 and r.rid1 == r.rid1.lower()
        assert len(r.rid2) == 64 and r.rid2 == r.rid2.lower()


def test_int32_prefilter_knob_is_exact(spark, tiny_records):
    """MatcherConfig(int32_prefilter=True) routes the half-width prefilter
    crossing through the whole matcher and must emit the identical entity
    partition (the prefilter bound is provably conservative and survivors
    recompute on th64 — measured-rejected as the DEFAULT, kept as an exact
    opt-in; see the MatcherConfig field comment + scripts/ab_int32_prefilter)."""
    from codingchallenge_spark.plans.matcher import resolve_entities

    def part(df):
        out = {}
        for r in df.select("rid", "entity_id").collect():
            out.setdefault(r.entity_id, set()).add(r.rid)
        return {frozenset(v) for v in out.values()}

    base = resolve_entities(tiny_records, MatcherConfig())
    knob = resolve_entities(tiny_records, MatcherConfig(int32_prefilter=True))
    assert "th32" not in knob.columns  # narrow column never leaks to emit
    assert part(knob) == part(base)
