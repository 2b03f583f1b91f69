"""Similarity search over embedding columns (task brief):
brute-force cosine top-k baseline + LSH-bucketed ANN scale path.

All arithmetic is JVM column expressions: dot products via
``aggregate(zip_with(...))`` — a strict left fold, so the accumulation order
is fixed and results are deterministic. No Python per row.

Scale shapes:
- brute force: queries × corpus join. Broadcast the query side; corpus never
  shuffles. Right for ≤10^3 queries or as the verifier behind ANN.
- hyperplane LSH: b deterministic sha-derived hyperplanes → b-bit bucket;
  candidates share a bucket in ≥1 of r rotations (here: exact-bucket join),
  then exact cosine re-ranks. Recall tunable via (b, rotations).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours per query (self-match excluded).

    → (q_id, n_id, cos, rank). Ties broken by n_id — a total order.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_norm", _norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    ).withColumn("n_norm", _norm(F.col("n_vec")))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos", _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )


def int_dot_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, scale: int = 1000,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact-integer variant: vectors quantized to round(x·scale) so the dot
    product is an exact BIGINT — bit-identical across engines (the
    DuckDB-checkable face of the similarity operator)."""
    quant = lambda col: F.transform(  # noqa: E731
        col, lambda x: F.round(x.cast("double") * scale, 0).cast("long")
    )
    q = queries.select(F.col(id_col).alias("q_id"), quant(F.col(vec_col)).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("n_id"), quant(F.col(vec_col)).alias("n_vec"))
    dot = F.aggregate(
        F.zip_with("q_vec", "n_vec", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = c.join(F.broadcast(q)).where(F.col("q_id") != F.col("n_id")).withColumn("dot", dot)
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "dot", "rank")
    )


def int_cosine_near_pairs(
    vecs: DataFrame, t_num: int = 4, t_den: int = 5, scale: int = 1000,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with an EXACT threshold test.

    Vectors quantize to round(x·scale) ints; for t = t_num/t_den > 0,
    cos(a,b) ≥ t  ⇔  dot ≥ 0  AND  t_den²·dot² ≥ t_num²·|a|²·|b|² — every
    quantity an exact integer (decimal(38,0) arithmetic; dot ≤ dim·(6·scale)²
    keeps dot² well under 38 digits), so the pair set is bit-identical across
    engines (ANSI-SQL-checkable) — no float fold-order hazards.

    Pair generation here is the all-pairs self-join: the VERIFIER shape (cf.
    jaccard_pairs). At corpus scale generate candidates with ann_lsh_topk /
    bucketed LSH first and verify only those pairs with this test.
    """
    quant = lambda col: F.transform(  # noqa: E731
        col, lambda x: F.round(x.cast("double") * scale, 0).cast("long")
    )
    idot = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    a = vecs.select(F.col(id_col).alias("a"), quant(F.col(vec_col)).alias("av"))
    b = vecs.select(F.col(id_col).alias("b"), quant(F.col(vec_col)).alias("bv"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pairs = (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("dot", idot(F.col("av"), F.col("bv")))
        .withColumn("na2", idot(F.col("av"), F.col("av")))
        .withColumn("nb2", idot(F.col("bv"), F.col("bv")))
    )
    lhs = F.lit(t_den * t_den).cast("decimal(38,0)") * dec(F.col("dot")) * dec(F.col("dot"))
    rhs = F.lit(t_num * t_num).cast("decimal(38,0)") * dec(F.col("na2")) * dec(F.col("nb2"))
    return (
        pairs.where((F.col("dot") >= 0) & (lhs >= rhs))
        .select("a", "b", "dot")
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_centroids: int = 16,
    nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors partition into inverted
    lists by nearest centroid; a query probes its *nprobe* nearest lists and
    exact-cosine re-ranks only those candidates.

    Centroids are picked DETERMINISTICALLY (every ceil(N/n_centroids)-th
    corpus vector by id — no RNG, no k-means iterations; IVF-flat with
    sampled centroids is a standard recall/cost baseline). Assignment and
    probing are pure column expressions over broadcast centroid literals.

    Scale shape: the corpus shuffles ONCE on cluster_id (the inverted
    index); each query fans out to nprobe lists, so work is
    ~nprobe/n_centroids of brute force. Bigger n_centroids ⇒ smaller lists
    but lower per-list recall; nprobe trades it back. Recall floor asserted
    in pytest against brute force.
    """
    import math

    n = corpus.count()  # one-time index build cost, not per-query
    step = max(1, math.ceil(n / n_centroids))
    cent_rows = (
        corpus.select(id_col, vec_col)
        .where(F.col(id_col) % step == 0)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    cents = [list(r[vec_col]) for r in cent_rows]

    def neg_dist2(vec: Column, c: list) -> Column:
        # argmax of -||v-c||² == argmin distance; exact arithmetic order
        carr = F.array(*[F.lit(float(x)) for x in c])
        return -F.aggregate(
            F.zip_with(vec, carr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def cluster_ranks(vec: Column) -> Column:
        """centroid ids sorted by proximity (struct sort: (-(-d²), cid))."""
        scored = F.array(
            *[
                F.struct((-neg_dist2(vec, c)).alias("d"), F.lit(ci).alias("cid"))
                for ci, c in enumerate(cents)
            ]
        )
        return F.transform(F.array_sort(scored), lambda s: s["cid"])

    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    ).withColumn("cluster_id", F.element_at(cluster_ranks(F.col("n_vec")), 1))
    q = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("probe", F.slice(cluster_ranks(F.col("q_vec")), 1, nprobe))
        .select("q_id", "q_vec", F.explode("probe").alias("cluster_id"))
    )
    cands = (
        c.join(q, on="cluster_id")
        .where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "q_vec", "n_id", "n_vec")
        .distinct()
    )
    scored = (
        cands.withColumn("q_norm", _norm(F.col("q_vec")))
        .withColumn("n_norm", _norm(F.col("n_vec")))
        .withColumn(
            "cos",
            _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )


def _hyperplanes(dim: int, bits: int, rotation: int = 0) -> list[list[float]]:
    """Deterministic sha256-derived hyperplanes (no RNG anywhere):
    component ∈ (-1, 1) from 4-byte slices of repeated digests. Rotation 0
    keeps the original seed strings (stable across versions); rotations ≥ 1
    are independent plane sets for multi-probe."""
    planes = []
    for b in range(bits):
        vals: list[float] = []
        ctr = 0
        while len(vals) < dim:
            seed = f"lsh:{b}:{ctr}" if rotation == 0 else f"lsh:{rotation}:{b}:{ctr}"
            d = hashlib.sha256(seed.encode()).digest()
            for off in range(0, 32, 4):
                u = int.from_bytes(d[off : off + 4], "big")
                vals.append(u / 2**31 - 1.0)
                if len(vals) == dim:
                    break
            ctr += 1
        planes.append(vals)
    return planes


def lsh_bucket_expr(vec_col: Column, dim: int, bits: int = 12, rotation: int = 0) -> Column:
    """Hyperplane-LSH bucket id: bit_b = sign(v · plane_b) ≥ 0."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(_hyperplanes(dim, bits, rotation)):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseXOR(
            F.shiftleft(F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), b)
        )
    return bucket


def ann_lsh_topk(
    queries: DataFrame, corpus: DataFrame, dim: int, k: int = 5, bits: int = 12,
    rotations: int = 1, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket equi-join → exact cosine
    re-rank over the union of candidates. The bucket join replaces the cross
    join — the scale path when both sides are large (corpus shuffles once on
    the exploded (rotation, bucket) key).

    Multi-probe: *rotations* independent sha-derived plane sets; a candidate
    qualifies by sharing a bucket in ANY rotation — a single rotation has a
    recall cliff for neighbours straddling one hyperplane, and each extra
    rotation decays the miss probability geometrically (miss ⇔ separated in
    ALL rotations). Recall/cost knobs: fewer bits ⇒ bigger buckets (more
    exact work, higher recall); more rotations ⇒ more candidate unions at
    linear cost. The recall floor at the defaults is asserted in pytest.
    """

    def keyed(df, idc, vc):
        rot_structs = F.array(
            *[
                F.struct(
                    F.lit(r).alias("rot"),
                    lsh_bucket_expr(F.col(vc), dim, bits, r).alias("bk"),
                )
                for r in range(rotations)
            ]
        )
        return df.select(
            F.col(idc), F.col(vc), F.explode(rot_structs).alias("rb")
        ).select(F.col(idc), F.col(vc), F.col("rb.rot").alias("rot"), F.col("rb.bk").alias("bk"))

    q = keyed(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")),
        "q_id",
        "q_vec",
    )
    c = keyed(
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")),
        "n_id",
        "n_vec",
    )
    # candidate pairs = bucket-mates in ≥1 rotation (distinct dedups unions)
    cands = (
        c.join(q, on=["rot", "bk"])
        .where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "q_vec", "n_id", "n_vec")
        .distinct()
    )
    scored = cands.withColumn("q_norm", _norm(F.col("q_vec"))).withColumn(
        "n_norm", _norm(F.col("n_vec"))
    ).withColumn(
        "cos", _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )
