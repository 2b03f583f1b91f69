"""Deduplication operators for a training-data pipeline (task brief):
exact, n-gram Jaccard, MinHash+LSH, SimHash — all JVM-side DataFrame ops.

Everything below stays in whole-stage codegen (hash/agg/join on built-in
functions); no Python executes per row. Scale shapes:

- exact:       one hash aggregation on sha2(text).
- shingles:    explode word n-grams → (doc, shingle-hash) — the base relation
               for both exact-Jaccard and MinHash.
- jaccard:     inverted-index self-join on shingle hash (the classic
               pair-generation join); at 10^10 docs you NEVER run it on the
               full corpus — MinHash/LSH generates candidates first and this
               join verifies only those pairs.
- minhash-lsh: k=64 permutation mins as 64 aggregate exprs over the shingle
               relation (one shuffle), banded into 16×4; bucket self-join
               emits candidates, then exact Jaccard verifies. Deterministic
               permutation params derive from sha256 (no RNG).
- simhash:     64 sign-sums over token hashes → one BIGINT per doc;
               Hamming-≤k pairs via 4×16-bit band join + bit_count filter.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P61 = (1 << 61) - 1


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: keeper id (min), group size."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct (id, shingle_hash) over word n-grams, hashed into 31 bits.

    31-bit shingle space keeps MinHash modular arithmetic inside int64
    (a*h + b < 2^62); collision odds are fine below ~10^8 distinct shingles —
    at larger corpora switch to the 61-bit two-step mix noted in minhash_signatures.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle"))
        .where(F.length("shingle") > 0)
        .select("doc_id", F.pmod(F.xxhash64("shingle"), F.lit(1 << 31)).alias("sh"))
        .distinct()
    )


def jaccard_pairs(shingles: DataFrame, threshold: float) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold pairs via inverted-index self-join.

    PAIR-GENERATION shape: the self-join key ``sh`` includes stopword
    n-grams whose posting lists are huge — one hot shingle makes one join
    key quadratic. Use it only where pair generation itself is the point
    (the standalone all-pairs verifier query); when candidate pairs already
    exist (MinHash/LSH output) verify them with ``jaccard_verify_pairs``,
    which never self-joins on the shingle key."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = shingles.select(F.col("doc_id").alias("a"), "sh")
    b = shingles.select(F.col("doc_id").alias("b"), "sh")
    inter = (
        a.join(b, on="sh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "a")
        .join(sz_b, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def jaccard_verify_pairs(
    shingles: DataFrame, cands: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard for GIVEN candidate pairs (a, b) — the hot-shingle-safe
    verify shape behind MinHash/LSH.

    The inverted-index self-join (``jaccard_pairs``) keys on the shingle
    itself: one stopword n-gram ("of the and") present in d docs of a
    candidate cluster costs d² rows in ONE task. Here the intersection is
    computed per candidate pair instead:

        cands ⋈ shingles(a)  on a        [cost Σ_pairs |A|; key = doc id,
                                          duplicated once per pair — bounded
                                          by LSH bucket sizes, not by any
                                          shingle's corpus frequency]
              ⋈ shingles(b)  on (b, sh)  [key carries the DOC id — a hot
                                          shingle spreads across (b, sh)
                                          keys instead of melting one]

    Exact: |A∩B| counts every shared shingle (none dropped), denominators
    use full per-doc sizes. Pairs with empty intersection vanish at the
    inner join — they cannot pass any threshold > 0, same as the self-join
    path. Output (a, b, jaccard) == jaccard_pairs-then-semi-join-cands,
    asserted in tests including a 50%-document-frequency hot shingle.
    """
    # a duplicated candidate row would double-count the pair's intersection
    # (the joins below are additive, unlike the old semi-join) — dedup is a
    # tiny shuffle on the id-only frame
    cands = cands.dropDuplicates(["a", "b"])
    touched = (
        cands.select(F.col("a").alias("doc_id"))
        .union(cands.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sh = shingles.join(touched, "doc_id", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sha = sh.select(F.col("doc_id").alias("a"), "sh")
    shb = sh.select(F.col("doc_id").alias("b"), "sh")
    inter = (
        cands.join(sha, "a")
        .join(shb, ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "a")
        .join(sz_b, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _mh_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs < 2^31, a odd — sha256-derived, no RNG."""
    out = []
    for i in range(k):
        d = hashlib.sha256(f"minhash:{i}".encode()).digest()
        a = (int.from_bytes(d[0:4], "big") | 1) % (1 << 31)
        b = int.from_bytes(d[4:8], "big") % (1 << 31)
        out.append((a or 1, b))
    return out


def minhash_signatures(shingles: DataFrame, k: int = 64) -> DataFrame:
    """k permutation minima as one aggregation: sig_i = min((a_i·sh + b_i) mod p)."""
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("sh") + F.lit(b), F.lit(_P61))).alias(f"sig_{i}")
        for i, (a, b) in enumerate(_mh_params(k))
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 16, rows: int = 4) -> DataFrame:
    """Band the signature (bands×rows) → ONE self-join on (band_id, hash).

    Bands explode to rows so all bands share a single equi-join (a 16-way
    union of joins is 16 shuffles and a giant plan; this is one).
    """
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(*[f"sig_{b * rows + r}" for r in range(rows)]).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select(
        "doc_id", F.explode(band_structs).alias("bk")
    ).select("doc_id", "bk.band_id", "bk.bh")
    left = banded.select(F.col("doc_id").alias("a"), "band_id", "bh")
    right = banded.select(F.col("doc_id").alias("b"), "band_id", "bh")
    return (
        left.join(right, ["band_id", "bh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame, threshold: float = 0.7, n: int = 3, k: int = 64,
    bands: int = 16, rows: int = 4,
) -> DataFrame:
    """MinHash→LSH→exact-verify near-duplicate pairs (no false positives:
    every emitted pair passed the exact Jaccard check). Verification is the
    per-pair join (jaccard_verify_pairs) — no shingle-keyed self-join, so a
    hot stopword shingle in a large candidate cluster stays linear."""
    sh = word_shingles(docs, n).cache()
    cands = lsh_candidate_pairs(minhash_signatures(sh, k), bands, rows)
    return jaccard_verify_pairs(sh, cands, threshold)


def word_shingle_strings(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (doc_id, sh) where sh is the RAW word n-gram string —
    the cross-engine-checkable base relation (no engine-specific hash)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("sh"))
        .where(F.length("sh") > 0)
        .distinct()
    )


def minhash_md5_pairs(
    docs: DataFrame, threshold: float = 0.7, n: int = 3, k: int = 16,
    bands: int = 4, rows: int = 4,
) -> DataFrame:
    """MinHash → LSH banding → exact-Jaccard verify, built ONLY from
    engine-agnostic string primitives so the whole pipeline is
    ANSI-SQL-checkable (DuckDB runs the identical algebra):

      permutation i's minimum = min(md5('<i>:' || shingle)) — md5 hex strings
      under lexicographic min ARE a deterministic permutation surrogate;
      band key = md5 of its rows' concatenated minima; candidates share a
      band key; survivors pass exact Jaccard on the raw shingle strings.

    Same scale shape as minhash_dedup_pairs (banded candidates, never
    all-pairs); xxhash64-based minhash_dedup_pairs remains the fast
    production path (integer aggs beat md5 string aggs).
    """
    sh = word_shingle_strings(docs, n).cache()
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"sig_{i}")
            for i in range(k)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws("|", *[f"sig_{b * rows + r}" for r in range(rows)])
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", "bk.band_id", "bk.bh"
    )
    left = banded.select(F.col("doc_id").alias("a"), "band_id", "bh")
    right = banded.select(F.col("doc_id").alias("b"), "band_id", "bh")
    cands = (
        left.join(right, ["band_id", "bh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return jaccard_verify_pairs(sh, cands, threshold)


def simhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: bit_b = sign(Σ_tokens ±1 by token-hash bit b)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)
    h = F.xxhash64("tok")
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s_{b}")
            for b in range(64)
        ]
    )
    sig = None
    for b in range(64):
        bit = F.when(F.col(f"s_{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_md5_signatures(
    docs: DataFrame, bits: int = 60, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash from md5 nibbles — the ANSI-SQL-checkable variant: bit b of a
    token's hash = bit (b % 4) of hex nibble (b // 4) of md5(token), so a
    DuckDB mirror (strpos-on-hex nibble decode) reproduces the signature
    bit-for-bit. 60 bits (15 nibbles) keeps the packed signature a positive
    BIGINT in every engine (bit 63 would need unsigned/hugeint semantics).
    The xxhash64 64-bit variant stays the fast production path."""
    assert bits % 4 == 0 and bits <= 60
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)
    h = F.md5("tok")
    nib = lambda j: F.conv(F.substring(h, j + 1, 1), 16, 10).cast("int")  # noqa: E731
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(nib(b // 4), b % 4).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"s_{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"s_{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return sums.select("doc_id", sig.alias("simhash60"))


def simhash_md5_oracle_sql(bits: int = 60, table: str = "documents") -> str:
    """DuckDB mirror of simhash_md5_signatures (identical nibble decode)."""
    assert bits % 4 == 0 and bits <= 60
    nib = lambda j: (  # noqa: E731
        f"(strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1)"
    )
    s_cols = ", ".join(
        f"sum(CASE WHEN (({nib(b // 4)} >> {b % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS s_{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN s_{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END)" for b in range(bits)
    )
    return (
        f"WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text),"
        f" '\\s+')) AS tok FROM {table}), "
        f"hs AS (SELECT doc_id, md5(tok) AS h FROM toks WHERE length(tok) > 0), "
        f"sums AS (SELECT doc_id, {s_cols} FROM hs GROUP BY doc_id) "
        f"SELECT doc_id, CAST({sig} AS BIGINT) AS simhash60 FROM sums"
    )


def simhash_near_pairs(
    signatures: DataFrame,
    max_hamming: int = 3,
    chunks: int | None = None,
    combo: int | None = None,
) -> DataFrame:
    """Hamming ≤ max_hamming pairs via combinatorial chunk banding + exact
    bit_count verify (no false positives; no false negatives by pigeonhole).

    The 64-bit signature splits into *chunks* near-equal pieces; each band
    key is the hash of a *combo*-subset of pieces (C(chunks, combo) bands,
    one explode + ONE equi-join for all of them). Pigeonhole guarantee —
    enforced here: ``chunks - max_hamming >= combo``. A pair at distance
    ≤ max_hamming corrupts ≤ max_hamming pieces, leaving ≥ combo clean
    pieces, so at least one band key matches exactly.

    Scale / cost model (n docs, uniform-ish signatures): a band key carries
    ~combo·(64/chunks) bits, so each bucket holds ~n / 2^(combo·64/chunks)
    docs and in-bucket work is quadratic in that. Defaults (d≤3 → chunks=5,
    combo=2) give ~26-bit keys: at n = 10^9 that's ~15 docs/bucket × 10
    bands — flat. The naive single-piece banding this replaces (chunks=4,
    combo=1 ⇒ 16-bit keys) packs ~15k docs/bucket at 10^9 ⇒ ~10^8
    comparisons per bucket; it remains expressible (combo=1) and is
    pair-identical — asserted in tests. Near-duplicate CLUSTERS concentrate
    buckets regardless of key width; dedup survivors upstream (exact dedup
    first) keep that bounded.
    """
    from itertools import combinations

    if chunks is None:
        chunks = max_hamming + 2
    if combo is None:
        combo = min(2, max(1, chunks - max_hamming))
    if chunks - max_hamming < combo:
        raise ValueError(
            f"pigeonhole violated: chunks({chunks}) - max_hamming({max_hamming})"
            f" < combo({combo}) — matching pairs could be missed"
        )
    # near-equal bit widths summing to 64
    base, extra = divmod(64, chunks)
    widths = [base + (1 if i < extra else 0) for i in range(chunks)]
    offs = [sum(widths[:i]) for i in range(chunks)]
    piece = [
        F.shiftright("simhash", offs[i]).bitwiseAND(F.lit((1 << widths[i]) - 1))
        for i in range(chunks)
    ]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.xxhash64(*[piece[c] for c in cs]).alias("bh"),
            )
            for bi, cs in enumerate(combinations(range(chunks), combo))
        ]
    )
    banded = signatures.select(
        "doc_id", "simhash", F.explode(band_structs).alias("bk")
    ).select("doc_id", "simhash", "bk.band_id", "bk.bh")
    left = banded.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("sig_a"), "band_id", "bh"
    )
    right = banded.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("sig_b"), "band_id", "bh"
    )
    return (
        left.join(right, ["band_id", "bh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
