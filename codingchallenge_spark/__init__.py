"""codingchallenge_spark — a PySpark-native record-linkage (entity-resolution)
engine with the capabilities of iron-fe/CodingChallenge, re-expressed
Spark-first.

Spec provenance: the reference checkout is empty in this sandbox (SURVEY.md §0);
the authoritative capability spec is BASELINE.json (north_star / north_rule /
input_hint). Pipeline: deterministic multi-pass blocking (sorted-neighborhood +
token blocking), vectorized pandas/Arrow UDF pairwise scoring (Jaro-Winkler,
Levenshtein, token-Jaccard), and transitive closure via large-star/small-star
connected components, over an Iceberg/parquet table of source-code files
(repo, path, commit, lang, content).
"""

__version__ = "0.1.0"
