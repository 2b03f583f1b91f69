"""A4/A5 — partitioned Bloom seen-set: build / merge / probe (SURVEY.md §2.5).

The seen-set membership prefilter, "built via DataFrame aggregation over
canonicalized-and-hashed URLs, never per-row Python" (BASELINE.json:6):

- build:  seen-delta rows grouped by pk → one numpy bitmap per bucket
          (``applyInPandas``; vectorized double-hashing of the 16-byte
          sha256 url_hash — kernels/bloom.py).
- merge:  OR the delta bitmaps into the cumulative filter (cogroup by pk).
          Bitmap geometry (nbits, k) is FIXED per crawl by config, so merges
          are pure bitwise-OR and never resize.
- probe:  candidates cogrouped with their bucket's bitmap → ``maybe_seen``
          flag. No false negatives ⇒ rows with maybe_seen=false are
          *certainly* new and skip the exact anti-join; only the (tiny)
          maybe set joins against the full seen table. This is what keeps
          the 10^10-row seen table from shuffling every round.

Scale sizing (BASELINE.json 10^10 design target): fpr=1e-3 ⇒ ~14.4
bits/URL ⇒ ~18 GB of bitmap total, ~70 MB per bucket at P=256 — one bucket
comfortably fits an executor. Past ~2^31 bits/bucket, shard the bitmap into
multiple rows per pk (schema already allows it) and OR-probe per shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.kernels.bloom import (
    bloom_build,
    bloom_params,
    bloom_probe,
    bytes_to_words,
    words_to_bytes,
)
from indigo_crawler_spark.plans import schemas


def bloom_geometry(bucket_capacity: int, fpr: float) -> tuple[int, int]:
    """Fixed (nbits, k) per bucket for the whole crawl."""
    return bloom_params(bucket_capacity, fpr)


def _pk_int(df: DataFrame) -> DataFrame:
    """Coerce ``pk`` to int (the SEEN_BLOOM key type). Cogrouping two sides
    whose pk types differ (int vs bigint) hash-partitions them by DIFFERENT
    key bytes, silently splitting every (candidates, filter) pair into two
    half-empty groups — i.e. false negatives; a no-op for int inputs."""
    if dict(df.dtypes).get("pk") == "int":
        return df
    return df.withColumn("pk", F.col("pk").cast("int"))


def _digest_matrix(col: pd.Series) -> np.ndarray:
    if len(col) == 0:
        return np.empty((0, 16), dtype=np.uint8)
    return np.frombuffer(b"".join(bytes(b) for b in col), dtype=np.uint8).reshape(-1, 16)


def build_bloom_delta(seen_delta: DataFrame, nbits: int, k: int) -> DataFrame:
    """(pk, url_hash) rows → one (pk, nbits, k, bits) row per pk bucket."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        words = bloom_build(_digest_matrix(pdf["url_hash"]), nbits, k)
        return pd.DataFrame(
            {
                "pk": [int(pdf["pk"].iloc[0])],
                "nbits": [nbits],
                "k": [k],
                "bits": [words_to_bytes(words)],
            }
        )

    return (
        _pk_int(seen_delta.select("pk", "url_hash"))
        .groupBy("pk")
        .applyInPandas(build, schemas.SEEN_BLOOM)
    )


def merge_blooms(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """OR-merge two bloom tables with identical geometry (cogroup by pk)."""

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        frames = pd.concat([left, right], ignore_index=True)
        words = None
        for blob in frames["bits"]:
            w = bytes_to_words(bytes(blob))
            words = w if words is None else np.bitwise_or(words, w)
        return pd.DataFrame(
            {
                "pk": [int(key[0])],
                "nbits": [int(frames["nbits"].iloc[0])],
                "k": [int(frames["k"].iloc[0])],
                "bits": [words_to_bytes(words)],
            }
        )

    return (
        prev.groupBy("pk")
        .cogroup(delta.groupBy("pk"))
        .applyInPandas(merge, schemas.SEEN_BLOOM)
    )


def fold_bloom(
    prev: DataFrame, seen_delta: DataFrame, nbits: int, k: int
) -> DataFrame:
    """Build this round's delta bitmap AND OR-merge it into the cumulative
    filter in ONE cogrouped pass (r6 optimization — guide §4: one Python
    stage instead of build+merge's two, and the raw (pk, url_hash) delta
    shuffles by pk once instead of delta-then-bitmap twice). Bit-identical
    to ``merge_blooms(prev, build_bloom_delta(seen_delta, ...))``: the OR
    of set bits is commutative and geometry is fixed, so insert order —
    which cogroup does not guarantee — cannot change the result."""

    def fold(key, prev_rows: pd.DataFrame, delta: pd.DataFrame) -> pd.DataFrame:
        words = bloom_build(_digest_matrix(delta["url_hash"]), nbits, k)
        for blob in prev_rows["bits"]:
            words = np.bitwise_or(words, bytes_to_words(bytes(blob)))
        return pd.DataFrame(
            {
                "pk": [int(key[0])],
                "nbits": [nbits],
                "k": [k],
                "bits": [words_to_bytes(words)],
            }
        )

    return (
        prev.groupBy("pk")
        .cogroup(_pk_int(seen_delta.select("pk", "url_hash")).groupBy("pk"))
        .applyInPandas(fold, schemas.SEEN_BLOOM)
    )


def probe_split(candidates: DataFrame, blooms: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (certainly_new, maybe_seen) candidate rows.

    Candidates must carry ``pk`` and ``url_hash``. Cogroups each pk's
    candidates with that bucket's bitmap; vectorized probe per Arrow batch.
    Buckets with no bloom row (nothing seen there yet) are all-new.
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    # NB: StructType.add mutates in place and DataFrame.schema is cached —
    # never call .add on a DataFrame's schema object; build a fresh one.
    out_schema = StructType(
        list(candidates.schema.fields) + [StructField("maybe_seen", BooleanType())]
    )

    def probe(key, cand: pd.DataFrame, bloom: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            out = cand.iloc[0:0].copy()
            out["maybe_seen"] = pd.Series([], dtype=bool)
            return out
        if len(bloom) == 0:
            out = cand.copy()
            out["maybe_seen"] = False
            return out
        words = bytes_to_words(bytes(bloom["bits"].iloc[0]))
        nbits = int(bloom["nbits"].iloc[0])
        k = int(bloom["k"].iloc[0])
        hits = bloom_probe(_digest_matrix(cand["url_hash"]), words, nbits, k)
        out = cand.copy()
        out["maybe_seen"] = hits
        return out

    flagged = (
        _pk_int(candidates).groupBy("pk")
        .cogroup(blooms.groupBy("pk"))
        .applyInPandas(probe, out_schema)
    )
    certainly_new = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe_seen = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
    return certainly_new, maybe_seen
