"""Evaluation: pairwise precision/recall/F1 on labeled same-block pairs (E1).

Spec: BASELINE.json:2 — "pairwise F1 on labeled same-block pairs (≥0.99)".
A labeled pair is predicted-positive iff both records landed in the same
emitted entity cluster.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PairwiseMetrics:
    tp: int
    fp: int
    fn: int
    tn: int

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if (self.tp + self.fp) else 1.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if (self.tp + self.fn) else 1.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def pairwise_f1(labels: DataFrame, labeled_pairs: DataFrame) -> PairwiseMetrics:
    """labels[rid, entity_id] × labeled_pairs[rid1, rid2, is_match] → P/R/F1."""
    l1 = labels.select(
        F.col("rid").alias("rid1"), F.col("entity_id").alias("e1")
    )
    l2 = labels.select(
        F.col("rid").alias("rid2"), F.col("entity_id").alias("e2")
    )
    joined = (
        labeled_pairs.join(l1, "rid1", "left")
        .join(l2, "rid2", "left")
        .withColumn(
            "pred",
            F.col("e1").isNotNull()
            & F.col("e2").isNotNull()
            & (F.col("e1") == F.col("e2")),
        )
    )
    agg = joined.agg(
        F.sum(F.when(F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("tn"),
    ).collect()[0]
    return PairwiseMetrics(
        tp=int(agg.tp or 0), fp=int(agg.fp or 0), fn=int(agg.fn or 0), tn=int(agg.tn or 0)
    )
