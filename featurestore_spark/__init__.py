"""featurestore_spark — a PySpark-native feature-engineering engine.

A from-scratch rebuild of the capability surface of markmo/featurestore
("Project Diamond", Scala / Spark 1.5.2) on the modern PySpark
DataFrame API, plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design rules (see SURVEY.md §7):
- DataFrame-only; no RDD path.
- Built-in JVM functions on the hot path (md5 / xxhash64 / window
  specs); zero row-at-a-time Python UDFs.
- Window functions replace every heap / reduceByKey construct in the
  reference.
- `left_anti` / `unionByName` replace join-where-null / positional
  unionAll.
- Plain parquet, history + current dual write; config = plain dicts.
"""

__version__ = "0.1.0"
