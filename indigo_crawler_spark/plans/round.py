"""EP1 — the scheduler round as one pure DataFrame job (SURVEY.md §3).

One round of the reference's while-loop (pick task → validate proxy → fetch →
parse → dedupe → enqueue) re-expressed over ALL tasks at once
(BASELINE.json:6). Stage map, with where each runs:

    1. gates      robots (host join + Arrow UDF) / backoff / budget  [JVM + Arrow]
    2. politeness per-host top-B window                              [shuffle: host]
    3. cap        bounded global top-K → batch sequencing            [≤K rows]
    4. fetch      emitted ⋈ page store (broadcast emitted)           [scan + bcast join]
    5. extract    html → (text, links) once per page, mapInPandas    [Arrow]
    6. discover   explode links → dedup(min depth) → anti-join seen  [shuffle: url]
    7. advance    frontier' / seen delta / manifest commit           [write]

Scale notes (10^10 frontier, 1000 executors): the frontier never reaches a
global sort — the only global operation is the bounded top-K (≤round_limit
rows). The widest column (html binary) crosses Arrow exactly once per emitted
page (≤K per round), never shuffles, and is pruned immediately after
extraction. Frontier/seen live bucketed by pk = pmod(xxhash64(host), P) so
the politeness window and membership checks cluster on the same key.
Heavy-host skew: explicit two-phase salted top-k (operators/skew.py, M4)
because AQE does not skew-split window functions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.functions.keys import (
    host_expr,
    host_hash_expr,
    pk_expr,
    url_hash_expr,
)
from indigo_crawler_spark.functions.scoring import priority_expr
from indigo_crawler_spark.functions.udfs import canonicalize_udf
from indigo_crawler_spark.operators.dedup import dedup_min_by
from indigo_crawler_spark.operators.extract import extract_pages
from indigo_crawler_spark.operators.gates import attach_budget, split_robots
from indigo_crawler_spark.operators.politeness import sequence_batches
from indigo_crawler_spark.plans import schemas
from indigo_crawler_spark.sources.table_io import TableIO


@dataclass
class CrawlState:
    """Paths + IO for one crawl's durable state under ``io.root``.

    Layout (round R):
        page_store/, host_counts/           bootstrap-derived, static
        robots/, host_budgets/              static dimensions
        frontier/round=R/                   frontier ENTERING round R
        seen/round=R/                       urls first seen (emitted) AT round R
        fetch_batches/round=R/              the emitted ordering
        fetched_text/round=R/               extracted text (byte-identity)
        manifest/round_R.json               commit record — written LAST
    """

    io: TableIO
    cfg: CrawlConfig = field(default_factory=CrawlConfig)

    def frontier(self, r: int) -> DataFrame:
        return self.io.read(f"frontier/round={r}", schemas.FRONTIER)

    def seen_through(self, r: int) -> DataFrame:
        """Exact membership table for rounds < r: the newest compacted
        snapshot (if any) + the delta dirs after it. Without compaction the
        union chain grows one parquet dir per round forever; with it the
        read is one snapshot + ≤seen_compact_every deltas."""
        base = None
        start = 0
        for upto in sorted(self._compact_uptos(), reverse=True):
            if upto < r:
                base = self.io.read(f"seen_compact/upto={upto}", schemas.SEEN)
                start = upto + 1
                break
        dfs = ([base] if base is not None else []) + [
            self.io.read(f"seen/round={i}", schemas.SEEN)
            for i in range(start, r)
            if self.io.exists(f"seen/round={i}")
        ]
        if not dfs:
            return self.io.spark.createDataFrame([], schemas.SEEN)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def _compact_uptos(self) -> list[int]:
        import os

        d = self.io.path("seen_compact")
        if not os.path.isdir(d):
            return []
        # only COMPLETE snapshots count (a kill mid-compaction leaves a dir
        # without _SUCCESS; selecting it would corrupt resume, and skipping
        # its rebuild would freeze the corruption in)
        return [
            int(name.split("=")[1])
            for name in os.listdir(d)
            if name.startswith("upto=")
            and self.io.is_complete(f"seen_compact/{name}")
        ]


def _canonicalized(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("canon_url", canonicalize_udf(F.col(url_col)))


def bootstrap(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    host_budgets: DataFrame,
    state: CrawlState,
    with_counters: bool = True,
) -> dict:
    """Derive the page store + host counts, seed the round-0 frontier.

    Page store: canonicalize, quarantine rejects, dedup per canon_url keeping
    min (warc_ts, url) — SEMANTICS.md §Page store. At 100 TB this is the one
    full pass over `pages`; everything later touches only emitted slices —
    so quarantine counting is optional (it costs a second canonicalize pass;
    at scale, use .observe instead of re-running the scan).
    """
    cfg = state.cfg
    pc = _canonicalized(pages).drop("text")
    quarantined = (
        pc.where(F.col("canon_url").isNull()).count() if with_counters else -1
    )
    pc = pc.where(F.col("canon_url").isNotNull())
    # ONE shuffle: key by pk up front, then dedup on (pk, canon_url) — the
    # existing HashPartitioning(pk) satisfies the groupBy's clustering — and
    # write one file per bucket (partitionBy without this repartition fans
    # out to tasks×buckets small files).
    pc = (
        pc.withColumn("host", host_expr("canon_url"))
        .withColumn("pk", pk_expr(host_hash_expr(F.col("host")), cfg.num_buckets))
        .repartition(cfg.num_buckets, "pk")
    )
    store = (
        dedup_min_by(pc, ["pk", "canon_url"], ["warc_ts", "url"])
        .select("canon_url", "host", "pk", "url", "warc_ts", "html", "lang")
        .sortWithinPartitions("canon_url")  # deterministic layout + rowgroup stats
    )
    state.io.write(store, "page_store", partition_by=["pk"])

    store = state.io.read("page_store", schemas.PAGE_STORE)
    host_counts = store.groupBy("host").agg(F.count("*").alias("host_count"))
    state.io.write(host_counts, "host_counts")
    state.io.write(robots, "robots")
    state.io.write(host_budgets, "host_budgets")

    # round-0 frontier from seeds: dedup per canon_url keeping min seed_rank
    sc = _canonicalized(seeds)
    seeds_quarantined = (
        sc.where(F.col("canon_url").isNull()).count() if with_counters else -1
    )
    sc = sc.where(F.col("canon_url").isNotNull())
    sc = dedup_min_by(
        sc.select("canon_url", "seed_rank"), "canon_url", ["seed_rank"]
    ).withColumn("host", host_expr("canon_url"))
    hc = state.io.read("host_counts", schemas.HOST_COUNTS)
    # hc is per-host (frontier-scale) — shuffle join, never a broadcast build
    frontier0 = (
        sc.join(hc.hint("SHUFFLE_HASH"), on="host", how="left")
        .withColumn("host_count", F.coalesce(F.col("host_count"), F.lit(0)))
        .select(
            "canon_url",
            "host",
            host_hash_expr(F.col("host")).alias("host_hash"),
            pk_expr(host_hash_expr(F.col("host")), cfg.num_buckets).alias("pk"),
            F.lit(0).alias("depth"),
            F.col("seed_rank").cast("int").alias("seed_rank"),
            priority_expr(F.lit(0), F.col("seed_rank"), F.col("host_count")).alias(
                "priority"
            ),
            F.lit(0).alias("discovered_round"),
        )
    )
    state.io.write(frontier0, "frontier/round=0")
    payload = {
        "quarantined_pages": quarantined,
        "quarantined_seeds": seeds_quarantined,
        "config_hash": cfg.config_hash(),
    }
    state.io.write_manifest("bootstrap", payload)
    return payload


def run_round(
    spark: SparkSession, state: CrawlState, round_no: int, with_counters: bool = True
) -> dict:
    """Execute round R per SEMANTICS.md; returns the manifest payload."""
    cfg = state.cfg
    io = state.io
    counters: dict[str, int] = {}

    frontier = state.frontier(round_no)
    frontier.cache()
    if with_counters:
        counters["candidates"] = frontier.count()

    robots = io.read("robots", schemas.ROBOTS)
    budgets = io.read("host_budgets", schemas.HOST_BUDGETS)

    # 1-2. gates
    allowed, denied = split_robots(frontier, robots, cfg)
    denied = denied.cache()
    eligible, backoff_skipped = attach_budget(allowed, budgets, cfg, round_no)
    if with_counters:
        counters["robots_denied"] = denied.count()
        counters["backoff_skipped"] = backoff_skipped.count()

    # 3. per-host politeness top-B (salted for heavy hosts — J4/W2)
    # 4. global cap + sequencing
    from indigo_crawler_spark.operators.skew import politeness_topk_skew_aware

    # cache: the gates pipeline (robots Arrow UDF + budget join) feeds both
    # the skew-detection count and the window — never execute it twice
    eligible = eligible.cache()
    kept = politeness_topk_skew_aware(eligible, cfg).cache()
    emitted, n_emitted = sequence_batches(
        kept, round_no, cfg.round_limit, cfg.batch_size
    )
    emitted = emitted.cache()
    if with_counters:
        n_eligible = eligible.count()
        n_kept = kept.count()
        counters["budget_deferred"] = n_eligible - n_kept
        counters["cap_deferred"] = n_kept - n_emitted
    counters["emitted"] = n_emitted

    fetch_batches = emitted.select(
        "round", "batch_id", "canon_url", "host", "host_hash", "priority",
        "rank_in_host", "global_rank",
    )
    io.write(fetch_batches, f"fetch_batches/round={round_no}")

    # 5. fetch: emitted ⋈ page store — broadcast the ≤K emitted urls into the
    # store scan so the 100 TB side never shuffles, and prune store buckets
    # to the pks actually emitted (partition pruning: at P=256 a typical
    # round touches a fraction of the store's directories).
    emitted_pks = [r["pk"] for r in emitted.select("pk").distinct().collect()]
    store = io.read("page_store", schemas.PAGE_STORE).where(
        F.col("pk").isin(emitted_pks)
    )
    # strategy switch on the known emitted count: small rounds broadcast the
    # url list into the scan; huge rounds (K in the millions) would serialize
    # a giant broadcast build — shuffle-hash join instead (the store slice
    # shuffles once; never sorted).
    emitted_sel = emitted.select("canon_url", "depth")
    if n_emitted <= 200_000:
        fetched = store.select("canon_url", "html").join(
            F.broadcast(emitted_sel), on="canon_url", how="inner"
        )
    else:
        fetched = store.select("canon_url", "html").join(
            emitted_sel.hint("SHUFFLE_HASH"), on="canon_url", how="inner"
        )
    extracted = extract_pages(fetched).cache()
    if with_counters:
        counters["fetched_pages"] = extracted.count()
        counters["links_extracted"] = (
            extracted.select(F.sum(F.size("links")).alias("n")).collect()[0]["n"] or 0
        )
    io.write(extracted.select("canon_url", "text"), f"fetched_text/round={round_no}")

    # 6. discover children: explode → min-depth dedup → not in seen' / frontier'
    children = (
        extracted.where(F.col("depth") + 1 <= cfg.max_depth)
        .select(
            F.explode("links").alias("canon_url"),
            (F.col("depth") + 1).cast("int").alias("depth"),
        )
    )
    children = dedup_min_by(children, "canon_url", ["depth"]).withColumn(
        "host", host_expr("canon_url")
    )
    children = children.withColumn(
        "pk", pk_expr(host_hash_expr(F.col("host")), cfg.num_buckets)
    ).withColumn("url_hash", url_hash_expr(F.col("canon_url")))

    seen_prev = state.seen_through(round_no)
    seen_delta = emitted.select(
        "canon_url",
        url_hash_expr(F.col("canon_url")).alias("url_hash"),
        F.col("pk"),
        F.lit(round_no).alias("first_round"),
    )
    io.write(seen_delta, f"seen/round={round_no}")

    # seen check: Bloom prefilter (A5) in front of the exact anti-join (J1).
    # No false negatives ⇒ only the maybe_seen sliver touches the full seen
    # table; the certainly-new bulk skips it (this is what keeps the 10^10
    # seen set from shuffling every round). Results identical by construction.
    prev_bloom = f"seen_bloom/round={round_no - 1}"
    if cfg.filter_kind in ("bloom", "cuckoo") and round_no > 0 and io.exists(prev_bloom):
        filters = io.read(prev_bloom, schemas.SEEN_BLOOM)
        if cfg.filter_kind == "bloom":
            from indigo_crawler_spark.operators.bloom_ops import probe_split

            certainly_new, maybe_seen = probe_split(children, filters)
        else:
            from indigo_crawler_spark.operators.cuckoo_ops import probe_split_cuckoo

            certainly_new, maybe_seen = probe_split_cuckoo(children, filters)
        survivors = maybe_seen.join(
            seen_prev.select("canon_url"), on="canon_url", how="left_anti"
        )
        children_unseen = certainly_new.unionByName(survivors)
    else:
        children_unseen = children.join(
            seen_prev.select("canon_url").hint("SHUFFLE_HASH"),
            on="canon_url",
            how="left_anti",
        )

    # Join strategy notes (10^10 scale): emitted is bounded by K → broadcast;
    # denied / frontier / seen / host_counts are frontier-scale → broadcast
    # builds would serialize; SHUFFLE_HASH parallelizes and avoids sorting.
    remaining = (
        frontier.join(F.broadcast(emitted.select("canon_url")), on="canon_url", how="left_anti")
        .join(denied.select("canon_url").hint("SHUFFLE_HASH"), on="canon_url", how="left_anti")
    )

    # children must not already be in (remaining ∪ emitted) = frontier − denied
    # (emitted ⊆ frontier and emitted ∩ denied = ∅) — ONE anti-join instead of
    # two sequential ones (each join is a whole stage + exchange at scale).
    frontier_not_denied = frontier.select("canon_url").join(
        denied.select("canon_url").hint("SHUFFLE_HASH"), on="canon_url", how="left_anti"
    )
    hc = io.read("host_counts", schemas.HOST_COUNTS)
    children_full = (
        children_unseen.drop("url_hash")
        .join(frontier_not_denied.hint("SHUFFLE_HASH"), on="canon_url", how="left_anti")
        .join(hc.hint("SHUFFLE_HASH"), on="host", how="left")
        .withColumn("host_count", F.coalesce(F.col("host_count"), F.lit(0)))
        .select(
            "canon_url",
            "host",
            host_hash_expr(F.col("host")).alias("host_hash"),
            pk_expr(host_hash_expr(F.col("host")), cfg.num_buckets).alias("pk"),
            "depth",
            F.lit(None).cast("int").alias("seed_rank"),
            priority_expr(
                F.col("depth"), F.lit(None).cast("int"), F.col("host_count")
            ).alias("priority"),
            F.lit(round_no + 1).alias("discovered_round"),
        )
    )
    frontier_next = remaining.select(*[f.name for f in schemas.FRONTIER.fields]).unionByName(
        children_full
    )
    io.write(frontier_next, f"frontier/round={round_no + 1}")

    # A4/A6: fold this round's seen delta into the cumulative membership
    # filter (bloom: pure bitwise OR; cuckoo: fingerprint re-insert — the
    # deletable variant). One binary row per pk bucket either way.
    if cfg.filter_kind in ("bloom", "cuckoo"):
        seen_now = io.read(f"seen/round={round_no}", schemas.SEEN)
        if cfg.filter_kind == "bloom":
            from indigo_crawler_spark.operators.bloom_ops import (
                bloom_geometry,
                build_bloom_delta,
                merge_blooms,
            )

            nbits, k = bloom_geometry(cfg.bloom_bucket_capacity, cfg.bloom_fpr)
            delta_f = build_bloom_delta(seen_now, nbits, k)
            merge = merge_blooms
        else:
            from indigo_crawler_spark.operators.cuckoo_ops import (
                build_cuckoo_delta,
                cuckoo_geometry,
                merge_cuckoos,
            )

            nbuckets, _ = cuckoo_geometry(cfg.bloom_bucket_capacity)
            delta_f = build_cuckoo_delta(seen_now, nbuckets)
            merge = merge_cuckoos
        if round_no > 0 and io.exists(prev_bloom):
            cumulative = merge(io.read(prev_bloom, schemas.SEEN_BLOOM), delta_f)
        else:
            cumulative = delta_f
        io.write(cumulative, f"seen_bloom/round={round_no}")
    if with_counters:
        counters["links_new"] = io.read(
            f"frontier/round={round_no + 1}", schemas.FRONTIER
        ).where(F.col("discovered_round") == round_no + 1).count()

    # compaction: fold the delta chain into one pk-clustered snapshot so the
    # exact-membership read stays O(1 snapshot + few deltas) at any round
    # count. Deterministic content ⇒ safe to overwrite on a replayed round.
    # Replay safety: if a prior (killed-after-compaction) attempt already
    # committed this snapshot, skip — content is deterministic, and
    # rewriting would read seen_compact/upto=R while overwriting it.
    # A half-written dir (no _SUCCESS) is excluded by _compact_uptos, so
    # the rebuild below reads only deltas and safely overwrites it.
    if (
        cfg.seen_compact_every
        and (round_no + 1) % cfg.seen_compact_every == 0
        and not io.is_complete(f"seen_compact/upto={round_no}")
    ):
        compacted = state.seen_through(round_no + 1).repartition(
            cfg.num_buckets, "pk"
        )
        io.write(compacted, f"seen_compact/upto={round_no}")

    # C3: per-partition lineage digests of this round's committed outputs —
    # recomputed and checked on resume before trusting a snapshot.
    # (one tagged-union job for both tables: actions are serial latency)
    from indigo_crawler_spark.plans.lineage import tables_digest

    digests = tables_digest(
        {
            "seen": io.read(f"seen/round={round_no}", schemas.SEEN),
            "frontier_next": io.read(
                f"frontier/round={round_no + 1}", schemas.FRONTIER
            ),
        }
    )
    payload = {
        "round": round_no,
        "counters": counters,
        "digests": digests,
        "config_hash": cfg.config_hash(),
    }
    io.write_manifest(f"round_{round_no:05d}", payload)

    for df in (frontier, denied, eligible, kept, emitted, extracted):
        df.unpersist()
    return payload


def last_complete_round(state: CrawlState) -> int | None:
    """EP2 resume anchor: max round with a committed manifest, else None."""
    rounds = [
        int(m.split("_")[1]) for m in state.io.list_manifests() if m.startswith("round_")
    ]
    return max(rounds) if rounds else None


def run_rounds(
    spark: SparkSession, state: CrawlState, n_rounds: int, with_counters: bool = True
) -> list[dict]:
    """Run/resume rounds up to n_rounds (EP2). A round whose manifest exists
    is skipped (its outputs are committed); a partially-written round —
    killed after some data writes but before its manifest — is recomputed
    from its committed inputs and overwritten, bit-exactly, because every
    operator is deterministic (SEMANTICS.md §Round, tie-breaks total).

    Before resuming, the anchor round's lineage digests are re-verified
    (C3): corrupted/half-written committed state fails loudly instead of
    silently diverging.
    """
    from indigo_crawler_spark.plans.lineage import verify_table

    done = last_complete_round(state)
    start = 0 if done is None else done + 1
    if done is not None:
        m = state.io.read_manifest(f"round_{done:05d}") or {}
        digests = m.get("digests", {})
        if digests:
            ok_seen = verify_table(
                state.io.read(f"seen/round={done}", schemas.SEEN), digests["seen"]
            )
            ok_frontier = verify_table(
                state.io.read(f"frontier/round={done + 1}", schemas.FRONTIER),
                digests["frontier_next"],
            )
            if not (ok_seen and ok_frontier):
                raise RuntimeError(
                    f"lineage digest mismatch at resume anchor round {done}; "
                    "committed state is corrupt — refusing to resume"
                )
        if m.get("config_hash") not in (None, state.cfg.config_hash()):
            raise RuntimeError(
                "config_hash mismatch: resuming with different semantics is not allowed"
            )
    out = []
    for r in range(start, n_rounds):
        out.append(run_round(spark, state, r, with_counters=with_counters))
    return out
