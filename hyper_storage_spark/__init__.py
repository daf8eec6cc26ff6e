"""hyper_storage_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of InnovaCo/hyper-storage.

The reference (studied at /root/reference, cited as ``file:line`` in
docstrings) is a distributed RESTful document store on Cassandra+Kafka.
This package re-expresses its capabilities Spark-first:

- ``expression``  — the filter/sort expression language (HParser/HEval
  surface) as a parser + Python evaluator + PySpark Column compiler.
- ``plans``       — the query planner: filter implication (Comparation),
  sort-order weighing (OrderFieldsLogic), index selection + keyset
  pagination (IndexLogic), sargable-predicate extraction
  (FieldFiltersExtractor).
- ``store``       — the document store: bucketed-parquet storage with an
  atomic manifest (the Delta-style ACID core), document/collection CRUD
  with merge-patch + monotonic revisions, materialized-view indexes.
- ``operators``   — beyond-parity large-scale pipeline operators:
  deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  similarity search (cosine top-k, LSH), text analysis, multimodal
  column plumbing.
- ``streaming``   — change-feed publication and stateful revision
  assignment via Structured Streaming.
"""

__version__ = "0.1.0"
