"""fink_filters_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of astrolabsoftware/fink-filters (the Fink alert
broker's filter library), re-expressed Spark-first for 100 TB scale.

Layers (see SURVEY.md §7):

- ``functions``  — native Column-expression library (astronomy math, per-row
  array time-series analytics, text analysis, vector math). No UDFs in the
  hot path: everything here compiles to Catalyst expressions that stay inside
  whole-stage codegen.
- ``operators``  — DataFrame -> DataFrame operators: crossmatch (broadcast
  cone join), classification, top-k, deterministic sampling, deduplication
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search, multimodal binary-column plumbing.
- ``filters``    — the reference's ~45 named topic predicates as a registry of
  Column expressions (parity with fink-filters' ``apply_user_defined_filter``).
- ``sources`` / ``sinks`` / ``streaming`` — Structured Streaming wrapper:
  source -> enrich -> filter -> foreachBatch notification sinks.
"""

__version__ = "0.1.0"
