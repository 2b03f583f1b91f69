"""indigo_crawler_spark — PySpark-native URL-frontier + fetch scheduler.

A from-scratch, idiomatic-Spark batch crawl-scheduling engine with the
capabilities of ``into-the-blue/indigo_crawler``'s proxy-validating crawl
loop (reference checkout empty in this sandbox — SURVEY.md §0; semantics
pinned by SEMANTICS.md and verified against ``oracle/``).

Layout:
    kernels/    pure-Python semantic kernels shared with the oracle
    functions/  Spark Column-expression builders (JVM-side, codegen-friendly)
    operators/  DataFrame operators (dedup, seen-check, bloom, politeness, skew)
    sources/    TableIO (Iceberg-or-Parquet seam) + fixture generators
    plans/      the scheduler round (EP1) + resume (EP2)
    streaming/  optional Structured-Streaming skin (informative)
"""

__version__ = "0.1.0"
