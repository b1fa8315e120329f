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


def pairwise_f1_df(labels: DataFrame, labeled_pairs: DataFrame) -> DataFrame:
    """Distributed form of :func:`pairwise_f1`: one-row DataFrame
    [tp, fp, fn, tn, precision, recall, f1] (counts bigint, rates double,
    same zero-denominator conventions as :class:`PairwiseMetrics`). The
    driver-checked q_pairwise_f1 query (plans.query_pack) runs THIS plan;
    :func:`pairwise_f1` collects it — one implementation, two surfaces."""
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
    cnt = joined.agg(
        F.sum(F.when(F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("tn"),
    ).select(*[F.coalesce(c, F.lit(0)).alias(c) for c in ("tp", "fp", "fn", "tn")])
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    pr = cnt.withColumns(
        {
            "precision": F.when(tp + fp == 0, F.lit(1.0)).otherwise(
                tp.cast("double") / (tp + fp)
            ),
            "recall": F.when(tp + fn == 0, F.lit(1.0)).otherwise(
                tp.cast("double") / (tp + fn)
            ),
        }
    )
    p, r = F.col("precision"), F.col("recall")
    return pr.withColumn(
        "f1",
        F.when(p + r == 0, F.lit(0.0)).otherwise(F.lit(2.0) * p * r / (p + r)),
    ).select("tp", "fp", "fn", "tn", "precision", "recall", "f1")


def pairwise_f1(labels: DataFrame, labeled_pairs: DataFrame) -> PairwiseMetrics:
    """labels[rid, entity_id] × labeled_pairs[rid1, rid2, is_match] → P/R/F1."""
    row = pairwise_f1_df(labels, labeled_pairs).collect()[0]
    return PairwiseMetrics(
        tp=int(row.tp), fp=int(row.fp), fn=int(row.fn), tn=int(row.tn)
    )
