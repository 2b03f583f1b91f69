"""Corpus export — fold per-round ``fetched_text`` deltas into ONE stable
corpus table (SURVEY.md §2, E39): the handoff from the crawl's round-versioned
state to a downstream training-data pipeline that wants "the latest text for
every url ever fetched" as a single partitioned parquet table.

Semantics: one row per canon_url, the text from the LATEST committed round
that fetched it — a url appears in more than one round only through the
retire → rediscovery path (operators/retire.py), and the re-crawl supersedes
the original. Ties are impossible (a round fetches a url at most once), so
``max_by(row, fetch_round)`` is deterministic.

Scale shape (100 TB): one union of the round deltas (a metadata-only plan
concat — no shuffle), one partial+final hash aggregation keyed on canon_url
(map-side combine collapses in-round-unique keys almost entirely), one
partitioned write bucketed by the same pk = pmod(xxh64(host), num_buckets)
the engine uses everywhere — so a downstream join against ``page_store`` or
a per-host groupBy starts co-located. No window, no driver collect; the row
count rides the write via ``observe``.

A round whose ``fetched_text`` was reclaimed by ``--gc-drop-outputs``
(plans/state_gc.py) cannot be exported — that is detected from the gc
manifest and raises loudly rather than silently shipping a partial corpus.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from indigo_crawler_spark.functions.keys import host_expr, host_hash_expr, pk_expr
from indigo_crawler_spark.plans import schemas
from indigo_crawler_spark.plans.round import CrawlState, last_complete_round


def export_corpus(
    state: CrawlState, out_path: str, through_round: int | None = None
) -> dict:
    """Write the latest-text-per-url corpus for committed rounds
    0..*through_round* (default: the resume anchor) to *out_path* as parquet
    partitioned by pk. Returns ``{"rows", "rounds", "out_path"}``."""
    anchor = last_complete_round(state)
    if anchor is None:
        raise RuntimeError("no committed rounds — nothing to export")
    last = anchor if through_round is None else min(through_round, anchor)

    # pk must match the crawl's committed bucketing, not this invocation's
    # config (an --export CLI run never passes --num-buckets): the bootstrap
    # manifest is authoritative, same as filter_capacity. Config fallback
    # only for state dirs bootstrapped before the manifest carried the field.
    bm = state.io.read_manifest("bootstrap") or {}
    num_buckets = int(bm.get("num_buckets") or state.cfg.num_buckets)

    reclaimed = set((state.io.read_manifest("gc") or {}).get("reclaimed", []))
    rounds, parts = [], []
    for r in range(last + 1):
        table = f"fetched_text/round={r}"
        if table in reclaimed:
            raise RuntimeError(
                f"{table} was reclaimed by gc --gc-drop-outputs; the corpus "
                f"through round {last} can no longer be assembled from this "
                "state dir"
            )
        # a committed round with zero fetches writes an empty table; missing
        # dir → empty frame via the schema fallback either way
        parts.append(
            state.io.read(table, schemas.FETCHED_TEXT).withColumn(
                "fetch_round", F.lit(r)
            )
        )
        rounds.append(r)
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)

    latest = (
        union.select(
            "canon_url",
            F.struct("fetch_round", "text").alias("_row"),
        )
        .groupBy("canon_url")
        .agg(F.max_by("_row", F.col("_row.fetch_round")).alias("_row"))
        .select("canon_url", "_row.fetch_round", "_row.text")
    )
    obs = Observation()
    corpus = latest.select(
        "canon_url",
        host_expr("canon_url").alias("host"),
        pk_expr(host_hash_expr(host_expr("canon_url")), num_buckets).alias("pk"),
        "fetch_round",
        "text",
    ).observe(obs, F.count(F.lit(1)).alias("rows"))
    # layout shuffle: cluster rows by their output partition so each pk dir
    # gets ONE file instead of one per upstream shuffle partition (at
    # production shuffle widths that difference is partitions × buckets
    # small files). File size per pk is governed by num_buckets — the same
    # knob that sizes every other per-bucket structure in the engine.
    corpus = corpus.repartition(F.col("pk"))
    corpus.write.mode("overwrite").partitionBy("pk").parquet(out_path)
    return {"rows": int(obs.get["rows"]), "rounds": rounds, "out_path": out_path}
