"""W1/W3/O1 — per-host politeness top-B + global bounded top-K sequencing.

SEMANTICS.md §Round 3-5. The per-host window shuffles once on the host key;
the global sequencing is a *bounded* top-K (K = cfg.round_limit), so the
single-partition tail only ever sees ≤K rows — at 10^10-URL frontier scale
the global sort never materializes the frontier (SURVEY.md §2.6 W3).

Skew note (M4): heavy hosts get pre-thinned by the two-phase salted top-k in
``operators/skew.py`` before this window; the superset property keeps W1
exact. AQE cannot skew-split windows, hence the explicit pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def politeness_topk(df: DataFrame, budget_col: str = "budget") -> DataFrame:
    """Keep ≤budget rows per host, ranked (priority DESC, canon_url ASC).

    Adds ``rank_in_host``; drops rows beyond the host budget.
    """
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("canon_url"))
    return (
        df.withColumn("rank_in_host", F.row_number().over(w))
        .where(F.col("rank_in_host") <= F.col(budget_col))
    )


def registered_domain_expr(host):
    """Registered domain ≈ last two '.'-labels of *host* (hosts with ≤2
    labels are their own domain). A public-suffix list would be more exact
    for ccTLDs (``*.co.uk``); the heuristic is documented in SEMANTICS.md
    §Politeness and mirrored verbatim by the oracle — ports, if present in
    the netloc, ride the last label on both sides identically."""
    parts = F.split(host, "[.]")
    return F.when(F.size(parts) <= 2, host).otherwise(
        F.concat_ws(".", F.slice(parts, -2, 2))
    )


def domain_topk(df: DataFrame, domain_budget: int, num_salts: int) -> DataFrame:
    """Registered-domain shared cap AFTER per-host top-B (SEMANTICS.md
    §Politeness): ≤``domain_budget`` rows per registered domain survive,
    ranked (priority DESC, canon_url ASC).

    Always two-phase salted: a subdomain farm can put millions of hosts —
    each already host-capped at B — under ONE domain, and unlike the host
    window there is no cheap per-round heavy-domain dimension to consult, so
    phase 1 thins within (domain, salt) unconditionally. Superset property
    (operators/skew.py): a row's in-salt rank ≤ its true in-domain rank, so
    the true top-D all survive phase 1 and phase 2 ranks them exactly.
    ``rank_in_host`` (already assigned) passes through untouched — emitted
    rows keep their HOST rank; the domain cap only selects rows.
    """
    order = (F.desc("priority"), F.asc("canon_url"))
    salted = df.withColumn(
        "_domain", registered_domain_expr(F.col("host"))
    ).withColumn("_salt", F.pmod(F.xxhash64("canon_url"), F.lit(num_salts)))
    w1 = Window.partitionBy("_domain", "_salt").orderBy(*order)
    thinned = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= domain_budget)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy("_domain").orderBy(*order)
    return (
        thinned.withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= domain_budget)
        .drop("_domain", "_r2")
    )


def global_rank(
    df: DataFrame,
    order_cols: list,
    gather_col: str | None = None,
    single_partition: bool = False,
) -> tuple[DataFrame, int, list, DataFrame]:
    """Exact global row_number over a total order, DISTRIBUTED:

    range-partition + sort on the order key, then rank = per-partition offset
    (one tiny driver collect of partition counts) + local index assigned in
    one mapInPandas pass. No single-partition window, no TakeOrdered driver
    merge — the two classic global-rank scalability traps. Output ranks are
    independent of where the range boundaries happen to fall, so the result
    is deterministic even though RangePartitioner samples its bounds.

    Returns (ranked_df, total_rows, gathered, cached): the total falls out of
    the offsets collect for free; *gathered* is the sorted distinct values of
    ``gather_col`` (piggybacked on the SAME collect — callers that need e.g.
    the set of pk buckets touched get it with zero extra actions). *cached*
    is the cached intermediate: the caller MUST keep it persisted until the
    ranked output is materialized (recomputation could re-sample different
    range bounds and invalidate the offsets), then unpersist it.
    """
    # *single_partition* (r6 — guide §1.2: pick the algorithm by size): when
    # the caller can BOUND the input rows cheaply (the crawl round reads the
    # committed frontier row count from the previous round's manifest — no
    # Spark job) and the bound is small, gather into ONE partition and sort
    # there: repartitionByRange's separate range-bounds sampling job — a
    # full pass over the gate+window chain — disappears, and the rank phase
    # collapses to a single job. Ranks are identical either way (the same
    # total order, offsets degenerate to {0: 0}); the range path remains
    # the at-scale default.
    if single_partition:
        s = (
            df.repartition(1)
            .sortWithinPartitions(*order_cols)
            .withColumn("_pid", F.spark_partition_id())
        )
    else:
        s = (
            df.repartitionByRange(*order_cols)
            .sortWithinPartitions(*order_cols)
            .withColumn("_pid", F.spark_partition_id())
        )
    s = s.cache()
    aggs = [F.count("*").alias("n")]
    if gather_col is not None:
        aggs.append(F.collect_set(gather_col).alias("_g"))
    rows = s.groupBy("_pid").agg(*aggs).collect()
    counts = {r["_pid"]: r["n"] for r in rows}
    gathered = sorted({v for r in rows for v in r["_g"]}) if gather_col else []
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    # rank assignment is pure JVM arithmetic (r6 optimization — guide §4:
    # eliminate the Python boundary): on the cached range-partitioned,
    # partition-sorted frame, monotonically_increasing_id() is
    # (partition_id << 33) + row_index_within_partition in the partition's
    # row order — exactly the local index the old mapInPandas enumeration
    # assigned — so global_rank = offset[pid] + local_index + 1 is a codegen
    # projection, no Arrow crossing, no Python worker on the critical path.
    # The offsets array literal is indexed O(1) per row; its length is the
    # number of range partitions (= shuffle partitions, bounded config).
    max_pid = max(offsets, default=-1)
    offs_arr = F.array(
        *[F.lit(offsets.get(p, 0)) for p in range(max_pid + 1)]
    ) if max_pid >= 0 else F.array(F.lit(0))
    local_idx = F.monotonically_increasing_id() - F.shiftleft(
        F.col("_pid").cast("long"), 33
    )
    ranked = s.withColumn(
        "global_rank",
        (F.element_at(offs_arr, F.col("_pid") + 1) + local_idx + 1).cast("long"),
    ).drop("_pid")
    return ranked, acc, gathered, s


def sequence_batches(
    df: DataFrame,
    round_no: int,
    limit: int,
    batch_size: int,
    gather_col: str | None = None,
    single_partition: bool = False,
) -> tuple[DataFrame, int, list, DataFrame]:
    """Global order (priority DESC, canon_url ASC) → top-*limit* rows with
    global_rank / batch_id — the emitted crawl ordering (BASELINE.json:2).

    Uses the distributed exact ranker above: scales to any K without a
    single-partition window or an O(partitions·K) TakeOrdered driver merge.
    Returns (emitted_df, n_input, gathered, cached) — n_input is the TOTAL
    input row count (callers derive the emitted count as min(n_input, limit)
    and the cap-deferred count as the difference); it and the optional
    ``gather_col`` value set both fall out of the ranker's one collect (zero
    extra actions). *cached* must stay persisted until the output is
    materialized (see global_rank), then be unpersisted.
    """
    ranked, total, gathered, cached = global_rank(
        df,
        [F.desc("priority"), F.asc("canon_url")],
        gather_col,
        single_partition=single_partition,
    )
    out = (
        ranked.where(F.col("global_rank") <= limit)
        .withColumn("global_rank", F.col("global_rank").cast("int"))
        .withColumn(
            "batch_id",
            ((F.col("global_rank") - F.lit(1)) / F.lit(batch_size)).cast("int"),
        )
        .withColumn("round", F.lit(round_no))
    )
    return out, total, gathered, cached
