"""Spark Column-expression builders — JVM-side, whole-stage-codegen friendly.

Everything here stays out of Python at execution time except the two
Arrow-vectorized UDFs (canonicalize, robots gate) that wrap the shared
kernels for bit-exactness with the oracle.
"""

from indigo_crawler_spark.functions.keys import host_expr, host_hash_expr, pk_expr, url_hash_expr
from indigo_crawler_spark.functions.scoring import priority_expr
from indigo_crawler_spark.functions.udfs import canonicalize_udf, robots_allowed_udf

__all__ = [
    "host_expr",
    "host_hash_expr",
    "pk_expr",
    "url_hash_expr",
    "priority_expr",
    "canonicalize_udf",
    "robots_allowed_udf",
]
