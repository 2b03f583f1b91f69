"""A6 — cuckoo-filter seen-set variant: build / merge / probe / delete.

Same DataFrame shapes as bloom_ops (one binary row per pk bucket in the
SEEN_BLOOM schema — ``nbits`` carries the bucket count, ``k`` the slots per
bucket), but supporting *deletion* so retired URLs can be re-crawled without
rebuilding membership state (BASELINE.json:6 "cuckoo-filter variant for
deletions"). Transparent like the Bloom: positives are backstopped by the
exact seen table, negatives are definitive for non-deleted elements.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.kernels.cuckoo import CuckooFilter, num_buckets_for
from indigo_crawler_spark.operators.bloom_ops import _digest_matrix, _pk_int
from indigo_crawler_spark.plans import schemas

_SLOTS = 4


def cuckoo_geometry(bucket_capacity: int) -> tuple[int, int]:
    return num_buckets_for(bucket_capacity), _SLOTS


def build_cuckoo_delta(seen_delta: DataFrame, nbuckets: int) -> DataFrame:
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter(nbuckets)
        ok = cf.insert_many(_digest_matrix(pdf["url_hash"]))
        if not ok.all():
            # a silent insert failure would create FALSE NEGATIVES (probe says
            # "certainly new" for an already-seen URL, skipping the exact
            # anti-join) — fail loudly instead; size bloom_bucket_capacity
            # with ≥5% headroom over the expected per-pk seen-set size.
            raise RuntimeError(
                f"cuckoo bucket pk={int(pdf['pk'].iloc[0])} overflow: "
                f"{int((~ok).sum())}/{len(ok)} inserts failed at "
                f"{nbuckets * _SLOTS} slots; raise cfg.bloom_bucket_capacity"
            )
        return pd.DataFrame(
            {
                "pk": [int(pdf["pk"].iloc[0])],
                "nbits": [nbuckets],
                "k": [_SLOTS],
                "bits": [cf.to_bytes()],
            }
        )

    return (
        _pk_int(seen_delta.select("pk", "url_hash"))
        .groupBy("pk")
        .applyInPandas(build, schemas.SEEN_BLOOM)
    )


def merge_cuckoos(prev: DataFrame, delta: DataFrame) -> DataFrame:
    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        frames = pd.concat([left, right], ignore_index=True)
        nb = int(frames["nbits"].iloc[0])
        cf = CuckooFilter.from_bytes(bytes(frames["bits"].iloc[0]), nb)
        for blob in frames["bits"].iloc[1:]:
            fails = cf.merge_from(CuckooFilter.from_bytes(bytes(blob), nb))
            if fails:
                raise RuntimeError(
                    f"cuckoo merge pk={int(key[0])} overflow: {fails} fingerprints "
                    "lost (would become false negatives); raise cfg.bloom_bucket_capacity"
                )
        return pd.DataFrame(
            {"pk": [int(key[0])], "nbits": [nb], "k": [_SLOTS], "bits": [cf.to_bytes()]}
        )

    return (
        prev.groupBy("pk").cogroup(delta.groupBy("pk")).applyInPandas(merge, schemas.SEEN_BLOOM)
    )


def probe_split_cuckoo(candidates: DataFrame, filters: DataFrame) -> tuple[DataFrame, DataFrame]:
    from pyspark.sql.types import BooleanType, StructField, StructType

    out_schema = StructType(
        list(candidates.schema.fields) + [StructField("maybe_seen", BooleanType())]
    )

    def probe(key, cand: pd.DataFrame, filt: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            out = cand.iloc[0:0].copy()
            out["maybe_seen"] = pd.Series([], dtype=bool)
            return out
        out = cand.copy()
        if len(filt) == 0:
            out["maybe_seen"] = False
            return out
        cf = CuckooFilter.from_bytes(
            bytes(filt["bits"].iloc[0]), int(filt["nbits"].iloc[0])
        )
        out["maybe_seen"] = cf.contains_many(_digest_matrix(cand["url_hash"]))
        return out

    flagged = (
        _pk_int(candidates).groupBy("pk").cogroup(filters.groupBy("pk")).applyInPandas(probe, out_schema)
    )
    return (
        flagged.where(~F.col("maybe_seen")).drop("maybe_seen"),
        flagged.where(F.col("maybe_seen")).drop("maybe_seen"),
    )


def delete_from_cuckoo(filters: DataFrame, retired: DataFrame) -> DataFrame:
    """Remove retired (pk, url_hash) rows' fingerprints from their buckets.

    Cogroup keeps the whole thing a DataFrame job — deletions at 10^10 scale
    are just another per-bucket Arrow batch.
    """

    def delete(key, filt: pd.DataFrame, gone: pd.DataFrame) -> pd.DataFrame:
        if len(filt) == 0:
            return pd.DataFrame(
                {"pk": pd.Series([], dtype="int32"), "nbits": [], "k": [], "bits": []}
            ).astype({"nbits": "int64", "k": "int32"})
        nb = int(filt["nbits"].iloc[0])
        cf = CuckooFilter.from_bytes(bytes(filt["bits"].iloc[0]), nb)
        if len(gone):
            cf.delete_many(_digest_matrix(gone["url_hash"]))
        return pd.DataFrame(
            {"pk": [int(key[0])], "nbits": [nb], "k": [_SLOTS], "bits": [cf.to_bytes()]}
        )

    return (
        filters.groupBy("pk")
        .cogroup(_pk_int(retired.select("pk", "url_hash")).groupBy("pk"))
        .applyInPandas(delete, schemas.SEEN_BLOOM)
    )
