"""State GC — reclaim superseded versioned state (SURVEY.md §2.9, E38).

Every engine table is versioned in its name and a round commit is a set of
whole-table replacements, so old versions are never overwritten — a crawl
that runs for months accumulates one ``seen`` delta, one ``frontier``, one
cumulative ``seen_bloom`` and (every N rounds) one ``seen_compact`` snapshot
per round forever. At 10^9 URLs/round that is the storage bill growing
linearly with a term the engine provably never reads again. This module
reclaims exactly that dead set.

The protected set, anchored at L = ``last_complete_round`` and
U = the newest COMPLETE ``seen_compact`` snapshot with upto ≤ L:

* ``seen/round=r`` for r > U (the deltas ``seen_through`` still unions on
  top of the snapshot) and r = L unconditionally (the resume anchor verify,
  ``run_rounds``). With no snapshot yet, every delta is live.
* ``frontier/round=L+1`` — resume anchor + the next round's input. Earlier
  frontiers were consumed by rounds that are already committed.
* ``seen_bloom/round=L`` — the cumulative filter round L+1 folds onto.
  Earlier rounds are strict subsets of it.
* ``seen_compact/upto=U`` — earlier complete snapshots are subsets;
  incomplete snapshot dirs at or below L are kill leftovers that
  ``_compact_uptos`` already ignores and no resume will ever rebuild
  (rebuilds happen only while re-running the killed round itself).
* ``host_budgets/round=L+1`` / ``heavy_hosts_frontier/round=L+1`` /
  ``injected/round=L+1`` — the feedback dimensions and any mid-crawl
  injected seeds entering round L+1; earlier versions are consumed.
* everything unversioned (bootstrap statics, ``retired``, manifests) and
  everything AT OR ABOVE the anchor's horizon (a partially-written round
  L+1 is resume's job to overwrite, not GC's to delete).
* the data products ``fetch_batches`` / ``fetched_text`` /
  ``round_metrics`` for every round — they are the crawl's output, not its
  state — unless the caller passes ``keep_outputs=False`` (products already
  shipped downstream).
* ``links/round=*``, ``links_compact/upto=*`` and ``pagerank/round=*``
  (the PageRank-tick feature, SEMANTICS.md §PageRank priority) are
  deliberately NOT gc families: every future tick re-reads the links
  chain (a graph pass is O(all edges) by nature; the tick itself folds
  the chain into ``links_compact`` snapshots at the seen_compact
  cadence), and the per-tick ``pagerank`` tables are the link-rank
  product history. None are ever reclaimed here.

Reclaimed names are recorded cumulatively in the ``gc`` manifest (written
with the same atomic-rename discipline as round commits) so ``fsck`` can
tell "reclaimed by GC" from "corrupt": a table the GC manifest names is
reported as ``"reclaimed"``, a table that is simply missing still fails the
digest check. GC is an OFFLINE operator tool like ``fsck`` — never run it
concurrently with a live crawl on the same state dir.
"""

from __future__ import annotations

import os

from indigo_crawler_spark.plans.round import CrawlState, last_complete_round

# families whose children are f"{key}=" versioned dirs; outputs listed apart
_STATE_FAMILIES = (
    "seen",
    "frontier",
    "seen_bloom",
    "heavy_hosts_frontier",
    "injected",
)
_OUTPUT_FAMILIES = ("fetch_batches", "fetched_text", "round_metrics")


def _versions(io, family: str, key: str = "round") -> list[int]:
    d = io.path(family)
    if not os.path.isdir(d):
        return []
    out = []
    prefix = key + "="
    for name in os.listdir(d):
        # skip crashed-rewrite leftovers (…__new/…__old) and plain files;
        # TableIO.delete() sweeps the leftovers alongside the base name
        if name.startswith(prefix) and "__" not in name:
            try:
                out.append(int(name[len(prefix):]))
            except ValueError:
                continue
    return sorted(out)


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                continue
    return total


def gc_plan(
    anchor: int,
    compact_uptos_complete: list[int],
    compact_uptos_incomplete: list[int],
    versions: dict[str, list[int]],
    keep_outputs: bool = True,
) -> list[str]:
    """Pure keep/reclaim decision: the table names to reclaim, given the
    resume anchor L, the complete/incomplete compact snapshots, and the
    on-disk versions per family. Split out from the executor so the
    protected-set algebra is unit-testable without running a crawl."""
    lc = anchor
    live_uptos = [u for u in compact_uptos_complete if u <= lc]
    u_max = max(live_uptos) if live_uptos else None

    drop: list[str] = []
    for v in versions.get("seen", ()):
        if u_max is not None and v <= u_max and v != lc:
            drop.append(f"seen/round={v}")
    for v in versions.get("frontier", ()):
        if v <= lc:
            drop.append(f"frontier/round={v}")
    for v in versions.get("seen_bloom", ()):
        if v < lc:
            drop.append(f"seen_bloom/round={v}")
    # injected/round=v (operators/inject.py) is consumed when round v
    # commits — same lifecycle as the feedback dims entering a round
    for fam in ("heavy_hosts_frontier", "host_budgets", "injected"):
        for v in versions.get(fam, ()):
            if v <= lc:
                drop.append(f"{fam}/round={v}")
    for v in compact_uptos_complete:
        if u_max is not None and v < u_max:
            drop.append(f"seen_compact/upto={v}")
    for v in compact_uptos_incomplete:
        if v <= lc:
            drop.append(f"seen_compact/upto={v}")
    if not keep_outputs:
        for fam in _OUTPUT_FAMILIES:
            for v in versions.get(fam, ()):
                if v <= lc:
                    drop.append(f"{fam}/round={v}")
    return sorted(drop)


def gc_state(state: CrawlState, keep_outputs: bool = True) -> dict:
    """Reclaim superseded versioned tables under ``state.io.root`` and
    record them in the cumulative ``gc`` manifest. Returns a report:
    ``{"anchor", "reclaimed", "bytes_reclaimed", "generation"}``. A state
    dir with no committed round has nothing superseded — no-op.

    Parquet backend only: the iceberg backend's versions live in a catalog,
    not a listable directory, and this sandbox cannot exercise that path —
    honest raise rather than a silent wrong branch (same seam discipline as
    TableIO)."""
    io = state.io
    if io.fmt != "parquet":
        raise NotImplementedError(
            "state GC enumerates versioned tables from the parquet directory "
            "tree; the iceberg backend needs a catalog-listing variant this "
            "environment cannot exercise"
        )
    anchor = last_complete_round(state)
    if anchor is None:
        return {"anchor": None, "reclaimed": [], "bytes_reclaimed": 0,
                "generation": 0}

    complete = state._compact_uptos()
    all_uptos = _versions(io, "seen_compact", key="upto")
    incomplete = [u for u in all_uptos if u not in set(complete)]
    versions = {f: _versions(io, f) for f in _STATE_FAMILIES + _OUTPUT_FAMILIES}
    versions["host_budgets"] = _versions(io, "host_budgets")

    drop = gc_plan(anchor, complete, incomplete, versions, keep_outputs)
    freed = 0
    reclaimed = []
    for table in drop:
        freed += _dir_bytes(io.path(table))
        if io.delete(table):
            reclaimed.append(table)

    prev = io.read_manifest("gc") or {}
    generation = int(prev.get("generation", 0)) + 1
    if reclaimed:
        io.write_manifest(
            "gc",
            {
                "generation": generation,
                "anchor": anchor,
                "reclaimed": sorted(set(prev.get("reclaimed", [])) | set(reclaimed)),
            },
        )
    return {
        "anchor": anchor,
        "reclaimed": reclaimed,
        "bytes_reclaimed": freed,
        "generation": generation if reclaimed else int(prev.get("generation", 0)),
    }
