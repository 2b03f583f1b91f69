"""Pure-Python semantic kernels shared by the Spark engine and the oracle.

Nothing in this package may import pyspark: these functions define the
bit-exact semantics (SEMANTICS.md) and are imported by BOTH
``indigo_crawler_spark`` (inside Arrow-vectorized UDFs) and
``oracle/simulator.py`` (single-threaded reference loop), so byte-identity
holds by construction and is verified by test.
"""

from indigo_crawler_spark.kernels.canonicalize import canonicalize_url
from indigo_crawler_spark.kernels.priority import priority_score
from indigo_crawler_spark.kernels.textextract import extract_text_and_links
from indigo_crawler_spark.kernels.xxh64 import xxhash64

__all__ = [
    "canonicalize_url",
    "priority_score",
    "extract_text_and_links",
    "xxhash64",
]
