"""Production entrypoint — ship via:

    bash jobs/package.sh
    spark-submit --master <cluster> --py-files dist/engine.zip \\
        jobs/run_rounds.py --state-dir /data/crawl --rounds 10 \\
        [--pages /data/pages.parquet --seeds /data/seeds.parquet \\
         --robots /data/robots.parquet --budgets /data/budgets.parquet] \\
        [--synthetic PAGES[,HOSTS[,SEEDS]]]

Bootstraps on first run (state dir has no bootstrap manifest), then runs /
resumes scheduler rounds up to --rounds. Killing the job at any point is
safe: rerunning the same command resumes bit-exactly (manifest-last commit +
lineage verification, SURVEY.md §2.9).
"""

from __future__ import annotations

import argparse
import sys


def _norm_exts(ap, entries: list[str]) -> tuple[str, ...]:
    """Normalize --exclude-ext values to the matcher's grammar ('.PDF' →
    'pdf') and refuse entries the matcher can NEVER produce — an inner
    dot ('tar.gz') or slash would otherwise leave the knob silently
    inert (url_extension() only ever yields the final dot-segment)."""
    out = []
    for raw in entries:
        e = raw.lstrip(".").lower()
        if not e:
            continue
        if "." in e or "/" in e:
            ap.error(
                f"--exclude-ext {raw!r}: only single-segment extensions "
                "can match (url extension = the final dot-segment); for "
                "'.tar.gz' pass 'gz'"
            )
        out.append(e)
    return tuple(out)


def _norm_hosts(ap, entries: list[str]) -> tuple[str, ...]:
    """Normalize --allow-host values to canonical-host grammar (lowercase,
    trimmed) and refuse entries that can never equal a canonical host —
    a scheme, slash or port would silently exclude the very host the
    operator meant to allow (CrawlConfig re-validates for library users)."""
    out = []
    for raw in entries:
        h = raw.strip().lower()
        if not h:
            continue
        if "/" in h or ":" in h or any(c.isspace() for c in h):
            ap.error(
                f"--allow-host {raw!r}: pass the bare canonical host "
                "('example.org'), not a URL or host:port"
            )
        out.append(h)
    return tuple(out)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument(
        "--fsck", action="store_true",
        help="verify EVERY committed round's lineage digests against the "
        "files on disk (one Spark job), print the report, and exit nonzero "
        "on any mismatch; no rounds are run",
    )
    ap.add_argument(
        "--gc", action="store_true",
        help="reclaim superseded versioned state (old seen deltas behind the "
        "newest compact snapshot, consumed frontiers/filters/feedback dims), "
        "record it in the gc manifest, print the report, and exit; no rounds "
        "are run — never run concurrently with a live crawl",
    )
    ap.add_argument(
        "--gc-drop-outputs", action="store_true",
        help="with --gc: also reclaim fetch_batches/fetched_text/"
        "round_metrics for committed rounds (products already shipped)",
    )
    ap.add_argument(
        "--status", action="store_true",
        help="print a zero-Spark-job summary of the state dir (progress, "
        "lifetime counters, pending frontier, storage by family, gc "
        "lineage) and exit; safe against a live crawl",
    )
    ap.add_argument(
        "--export",
        help="fold the per-round fetched_text deltas into ONE latest-text-"
        "per-url corpus table (parquet, partitioned by pk) at this path and "
        "exit; no rounds are run",
    )
    ap.add_argument(
        "--export-through", type=int, default=None,
        help="with --export: include rounds 0..N only (default: all "
        "committed rounds)",
    )
    ap.add_argument(
        "--export-annotate", action="store_true",
        help="with --export: add training-pipeline columns (text_sha, "
        "token/quality signals, langid) to the corpus — recorded in the "
        "export manifest, cannot be flipped on an existing corpus",
    )
    ap.add_argument(
        "--export-split", action="store_true",
        help="with --export: add the content-addressed train/valid/test "
        "assignment (split_bucket, split) keyed on canon_url — stable "
        "across incremental extends; recorded in the export manifest, "
        "cannot be flipped on an existing corpus",
    )
    ap.add_argument(
        "--export-scrub",
        help="with --export: ALSO write a boilerplate-scrubbed derived "
        "product at this path (lines repeating across >= --scrub-min-docs "
        "distinct documents removed, row count and line order preserved); "
        "downstream --export-filter/--export-dedup read the scrubbed "
        "corpus instead of the raw one",
    )
    ap.add_argument(
        "--scrub-min-docs", type=int, default=10,
        help="with --export-scrub: a line is boilerplate when it appears "
        "in at least this many distinct documents (default 10)",
    )
    ap.add_argument(
        "--export-dedup",
        help="with --export: ALSO write an exact-deduped derived product "
        "(one row per distinct text, keeper = min canon_url) at this path; "
        "reads the filtered corpus when --export-filter is given (else the "
        "scrubbed one, else the raw export) — the pipeline chains "
        "export -> scrub -> filter -> dedup",
    )
    ap.add_argument(
        "--export-mirrors",
        help="with --export: ALSO write a mirror-host report (host pairs "
        "whose distinct text_sha sets overlap by --mirror-overlap%% of the "
        "smaller host) at this path; reads the same source corpus as the "
        "dedup stage — the operator's input for deny-listing one spelling "
        "of a mirrored site",
    )
    ap.add_argument(
        "--export-hoststats",
        help="write the per-host crawl report (emitted/banned/failed, "
        "activity span, fetched pages + word mass — the tuning input for "
        "--max-pages-per-site / --fail-host-threshold / exclusions) at this "
        "path and exit unless --export also runs; honors --export-through",
    )
    ap.add_argument(
        "--mirror-overlap", type=int, default=80, metavar="PCT",
        help="with --export-mirrors: integer overlap percentage against the "
        "smaller host (default 80)",
    )
    ap.add_argument(
        "--dedup-near", type=float, default=None, metavar="JACCARD",
        help="with --export-dedup: follow the exact pass with MinHash+LSH "
        "near-dup removal at this exact-verified Jaccard threshold; "
        "connected components pick one keeper (min canon_url) per dup "
        "cluster",
    )
    ap.add_argument(
        "--export-filter",
        help="with --export: ALSO write a quality-filtered derived product "
        "at this path (rows passing every enabled --filter-* threshold; "
        "signals recomputed when the corpus is unannotated)",
    )
    ap.add_argument(
        "--filter-min-words", type=int, default=0,
        help="with --export-filter: keep rows with n_words >= N (0=off)",
    )
    ap.add_argument(
        "--filter-max-punct", type=float, default=None, metavar="RATIO",
        help="with --export-filter: keep rows with punct_ratio <= RATIO",
    )
    ap.add_argument(
        "--filter-langs", default=None, metavar="CSV",
        help="with --export-filter: keep rows whose langid is in this "
        "comma-separated set (e.g. en,de)",
    )
    ap.add_argument(
        "--export-normalize",
        help="with --export: ALSO write a text-normalized derived product "
        "at this path (CRLF fold, control/zero-width strip, Unicode NFC); "
        "the FIRST stage of the chain — downstream scrub/redact/filter/"
        "dedup/sample/shards read it",
    )
    ap.add_argument(
        "--export-redact",
        help="with --export: ALSO write a PII-redacted derived product at "
        "this path (emails/SSNs/phones/IPv4 masked with <KIND> tokens); "
        "chains after --export-scrub and before --export-filter",
    )
    ap.add_argument(
        "--export-sample",
        help="with --export: ALSO write a deterministically sampled/mixed "
        "derived product at this path (content-addressed keep decision per "
        "canon_url — reproducible, no RNG); chains after dedup and before "
        "shards",
    )
    ap.add_argument(
        "--sample-rate", type=float, default=1.0,
        help="with --export-sample: default keep probability (exact "
        "integer-threshold draw; default 1.0)",
    )
    ap.add_argument(
        "--sample-by", default=None, metavar="COL",
        help="with --export-sample: stratum column for per-value rates "
        "(e.g. langid, split)",
    )
    ap.add_argument(
        "--sample-rates", default=None, metavar="CSV",
        help="with --export-sample and --sample-by: per-stratum keep rates "
        "as value=rate pairs (e.g. en=0.3,de=1.0); unmatched strata use "
        "--sample-rate",
    )
    ap.add_argument(
        "--sample-salt", default="", metavar="S",
        help="with --export-sample: salt for an independent redraw",
    )
    ap.add_argument(
        "--export-shards",
        help="with --export: ALSO write a shard-packed derived product at "
        "this path (shard_id=N parquet dirs of ~--shard-tokens whitespace "
        "tokens each, content-addressed order); reads the LAST product in "
        "the export -> scrub -> redact -> filter -> dedup -> sample chain",
    )
    ap.add_argument(
        "--shard-tokens", type=int, default=1_000_000,
        help="with --export-shards: target token weight per shard "
        "(default 1000000)",
    )
    ap.add_argument(
        "--filter-max-dup-ratio", type=float, default=None, metavar="RATIO",
        help="with --export-filter: keep rows whose Gopher-style repeated-"
        "word occurrence ratio (dup_word_occ / n_words) is <= RATIO — "
        "gates machine-generated/template spam",
    )
    ap.add_argument(
        "--filter-max-pii", type=int, default=None, metavar="N",
        help="with --export-filter: keep rows with at most N PII matches "
        "(emails/SSNs/phones/IPv4) — drops directory/roster pages outright "
        "where redaction would leave token soup",
    )
    ap.add_argument(
        "--recrawl-after", type=int, default=0,
        help="age-based refresh: re-open round R-N's fetched urls before "
        "round R (retire + low-priority re-inject; 0=off). Semantic knob — "
        "enters config_hash",
    )
    ap.add_argument(
        "--recrawl-adaptive", action="store_true",
        help="change-rate-adaptive refresh (requires --recrawl-after N): "
        "per-url revisit intervals start at N rounds, DOUBLE when a "
        "refetch's extracted text is unchanged (sha256 compare) and RESET "
        "to N when it changed — the refresh budget follows where content "
        "actually moves. Semantic knob — enters config_hash",
    )
    ap.add_argument(
        "--recrawl-max-interval", type=int, default=0,
        help="absolute cap in rounds on the adaptive revisit interval "
        "(0=uncapped): bounds how stale a never-changing page can get",
    )
    ap.add_argument(
        "--collapse-www", action="store_true",
        help="collapse www/non-www host aliases: canonicalization drops "
        "leading 'www.' labels (while the remainder keeps a dot), so both "
        "spellings of one host share one seen-set key, frontier row and "
        "politeness slot. Semantic knob — enters config_hash",
    )
    ap.add_argument(
        "--prefer-https", action="store_true",
        help="upgrade http to https at canonicalization (after the "
        "default-port rule against the original scheme), so protocol "
        "spellings of one resource share one seen-set key, frontier row "
        "and politeness slot. Semantic knob — enters config_hash",
    )
    ap.add_argument(
        "--collapse-index", action="store_true",
        help="drop trailing default-document segments (index.html, "
        "default.aspx, ...) at canonicalization, keeping the trailing "
        "slash, so /a/ and /a/index.html share one seen-set key. "
        "Semantic knob — enters config_hash",
    )
    ap.add_argument(
        "--strip-session", action="store_true",
        help="strip session identifiers: canonicalization drops "
        "phpsessid/jsessionid/sid/aspsessionid*-style query params AND "
        ";jsessionid=... path parameters, so per-visitor session echoes "
        "of one resource share one seen-set key, frontier row and "
        "politeness slot. Semantic knob — enters config_hash",
    )
    ap.add_argument(
        "--sort-query", action="store_true",
        help="sort canonical query parameters: canonicalization orders the "
        "query's &-separated tokens by raw bytes (after tracking-param "
        "stripping), so parameter-order spellings of one resource share "
        "one seen-set key, frontier row and politeness slot. Semantic "
        "knob — enters config_hash",
    )
    ap.add_argument(
        "--host-page-cap", type=int, default=0,
        help="per-host LIFETIME emit cap (0=off): at most N urls are ever "
        "emitted per host across the whole crawl — budgets clip to the "
        "remaining headroom, hosts at the cap leave the frontier "
        "permanently and their children stop entering it. Semantic knob — "
        "enters config_hash",
    )
    ap.add_argument(
        "--gc-every", type=int, default=0,
        help="reclaim superseded state after every Nth committed round "
        "(0=off) — keeps a months-long crawl's storage tracking the live "
        "set instead of the round count",
    )
    ap.add_argument("--pages")
    ap.add_argument("--seeds")
    ap.add_argument("--robots")
    ap.add_argument("--budgets")
    ap.add_argument(
        "--synthetic",
        help="deterministic corpus: PAGES or PAGES,HOSTS or PAGES,HOSTS,SEEDS "
        "(defaults: hosts=pages/20, seeds=pages/40)",
    )
    ap.add_argument("--round-limit", type=int, default=100_000)
    ap.add_argument("--num-buckets", type=int, default=256)
    ap.add_argument("--default-budget", type=int, default=8)
    ap.add_argument("--filter-kind", default="bloom", choices=["bloom", "cuckoo", "none"])
    ap.add_argument(
        "--ban-every", type=int, default=0,
        help="EP3 feedback: synthetic ban outcome every Nth url hash (0=off)",
    )
    ap.add_argument("--backoff-rounds", type=int, default=2)
    ap.add_argument(
        "--fail-every", type=int, default=0,
        help="transient-failure retry: synthetic failed fetch on a per-"
        "(url, attempt) hash draw every Nth (0=off); failed urls yield no "
        "page, stay out of seen, and remain in the frontier until "
        "--max-retries retries are exhausted (counted fetch_failed / "
        "retry_exhausted)",
    )
    ap.add_argument(
        "--max-retries", type=int, default=2,
        help="with --fail-every: retries after the first failure before a "
        "url gives up and enters seen (0 = fail once, never retry)",
    )
    ap.add_argument(
        "--age-weight", type=float, default=0.0,
        help="priority aging (0=off): a frontier url's rank-time priority "
        "gains age-weight per round waited since discovery — budget-starved "
        "urls eventually schedule; prefer exact binary fractions (0.125)",
    )
    ap.add_argument(
        "--fail-host-threshold", type=int, default=0,
        help="with --fail-every: a host whose failed fetch count in a round "
        "reaches this backs off like a banned host for --backoff-rounds "
        "rounds (0=off) — a down host stops burning politeness slots on "
        "retries; counted failhost_backoff",
    )
    # round-5 semantic knobs (each default-off; all enter config_hash only
    # at non-default values — config.py extension-field scheme)
    ap.add_argument(
        "--sitemaps", action="store_true",
        help="honor robots.txt Sitemap: directives (round-0 frontier seeds) "
        "and extract <loc> links from fetched sitemap documents",
    )
    ap.add_argument(
        "--trap-max-depth", type=int, default=0,
        help="trap gate: drop urls with more than N path segments (0=off)",
    )
    ap.add_argument(
        "--trap-max-repeat", type=int, default=0,
        help="trap gate: drop urls where one path segment repeats > N times "
        "(0=off)",
    )
    ap.add_argument(
        "--trap-max-url-len", type=int, default=0,
        help="trap gate: drop urls longer than N characters (0=off)",
    )
    ap.add_argument(
        "--round-seconds", type=int, default=0,
        help="honor robots Crawl-delay: cap a host's per-round budget at "
        "max(1, floor(round_seconds/delay)) (0=ignore crawl-delay)",
    )
    ap.add_argument(
        "--domain-budget", type=int, default=0,
        help="registered-domain shared budget: after per-host top-B, keep "
        "at most N urls per last-two-label domain per round (0=off)",
    )
    ap.add_argument(
        "--thin-host-min-words", type=int, default=0,
        help="closed-loop quality feedback: a host whose round's fetches "
        "average fewer than N whitespace tokens of extracted text has its "
        "budget halved (floor 1) entering the next round (0=off)",
    )
    ap.add_argument(
        "--meta-robots", action="store_true",
        help="honor REP meta robots: nofollow pages' out-links are withheld "
        "from discovery and the link graph; noindex pages are excluded from "
        "the corpus export (text still fetched and recorded)",
    )
    ap.add_argument(
        "--rel-canonical", action="store_true",
        help="honor <link rel=canonical>: record each fetched page's "
        "canonical target; the corpus export collapses variants whose "
        "target is itself in the corpus (crawl unaffected)",
    )
    ap.add_argument(
        "--meta-refresh", action="store_true",
        help="follow meta http-equiv=refresh redirects: the resolved "
        "foreign target joins the page's out-links (ordinary discovery); "
        "delay-0 pure redirects are excluded from the corpus export",
    )
    ap.add_argument(
        "--anchor-nofollow", action="store_true",
        help="honor anchor-level rel=nofollow: an <a rel=nofollow> link is "
        "withheld from discovery and the link graph (the link-level half "
        "of REP; page text unchanged)",
    )
    ap.add_argument(
        "--robots-wildcards", action="store_true",
        help="match robots.txt Allow/Disallow with RFC 9309 * and trailing $ "
        "wildcards (longest pattern wins, Allow wins ties) instead of the "
        "stdlib prefix matcher",
    )
    ap.add_argument(
        "--hreflang", action="store_true",
        help="honor <link rel=alternate hreflang>: each page's resolved "
        "language-variant targets join its out-links for ordinary "
        "discovery (self-pointers and duplicates dropped); counted "
        "hreflang_alternates",
    )
    ap.add_argument(
        "--strip-tracking", action="store_true",
        help="strip tracking query parameters (utm_*, gclid, fbclid, …) at "
        "canonicalization everywhere, so tracked-link variants of one "
        "resource share one canon_url / seen-set key / politeness slot",
    )
    ap.add_argument(
        "--exclude-pattern", action="append", default=[], metavar="REGEX",
        help="drop frontier URLs matching this regex at the gate (repeatable; "
        "unanchored contains-match, common Java/Python/RE2 dialect subset) — "
        "matching children never enter the frontier; counted pattern_excluded",
    )
    ap.add_argument(
        "--exclude-ext", action="append", default=[], metavar="EXT",
        help="drop frontier URLs whose final path segment carries this file "
        "extension (repeatable; case-insensitive, leading dot optional — "
        "normalized to lowercase without the dot) — matching children never "
        "enter the frontier; counted ext_excluded",
    )
    ap.add_argument(
        "--allow-host", action="append", default=[], metavar="HOST",
        help="crawl ONLY these canonical hosts (repeatable; exact lowercase "
        "host match — with --collapse-www list the bare host): frontier "
        "rows on other hosts leave at the gate permanently and their "
        "children never enter the frontier; counted host_excluded. "
        "Empty (default) allows every host",
    )
    ap.add_argument(
        "--pagerank-every", type=int, default=0,
        help="link-graph prioritization: every Nth round, re-score the "
        "outgoing frontier with integer PageRank over the accumulated "
        "out-link graph (0=off)",
    )
    ap.add_argument(
        "--pagerank-iters", type=int, default=5,
        help="fixed PageRank iterations per tick (inert unless "
        "--pagerank-every > 0)",
    )
    ap.add_argument(
        "--pagerank-weight", type=float, default=1.0,
        help="priority boost = weight * (rank_int / 1e12) (inert unless "
        "--pagerank-every > 0)",
    )
    ap.add_argument(
        "--retire", help="parquet/text-free path: newline file of urls to retire "
        "before running (re-crawlable on rediscovery)",
    )
    ap.add_argument(
        "--add-seeds",
        help="newline file of urls to inject into the NEXT round's frontier "
        "before running (depth-0 seeds; junk/seen/pending urls skipped)",
    )
    ap.add_argument(
        "--add-robots",
        help="JSON-lines file of {host, robots_txt} replacements applied "
        "before running — the batch analogue of a robots.txt refetch: the "
        "new rules gate from the next round on (tightened rules stop "
        "fetches, loosened rules open gates); committed rounds untouched",
    )
    ap.add_argument("--no-counters", action="store_true")
    args = ap.parse_args(argv)
    if args.rounds is None and not (
        args.fsck or args.gc or args.export or args.status
        or args.export_hoststats
    ):
        ap.error("--rounds is required unless --fsck/--gc/--export/--status")

    if args.status:
        # status is pure driver work over manifests + dir sizes — no Spark
        # session, no JVM, instant even while a crawl is running
        import json

        from indigo_crawler_spark.plans.round import CrawlState as _CS
        from indigo_crawler_spark.plans.status import crawl_status
        from indigo_crawler_spark.sources.table_io import TableIO as _TIO

        report = crawl_status(_CS(io=_TIO(None, args.state_dir)))
        print(json.dumps(report, indent=2, sort_keys=True))
        return 0

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("indigo-crawl-rounds").getOrCreate()

    from indigo_crawler_spark.config import CrawlConfig
    from indigo_crawler_spark.plans import schemas
    from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
    from indigo_crawler_spark.sources.table_io import TableIO

    cfg = CrawlConfig(
        round_limit=args.round_limit,
        num_buckets=args.num_buckets,
        default_budget=args.default_budget,
        filter_kind=args.filter_kind,
        ban_every=args.ban_every,
        fail_every=args.fail_every,
        max_retries=args.max_retries,
        fail_host_threshold=args.fail_host_threshold,
        age_weight=args.age_weight,
        backoff_rounds=args.backoff_rounds,
        recrawl_after=args.recrawl_after,
        recrawl_adaptive=args.recrawl_adaptive,
        recrawl_max_interval=args.recrawl_max_interval,
        host_page_cap=args.host_page_cap,
        collapse_www_enabled=args.collapse_www,
        sort_query_enabled=args.sort_query,
        strip_session_enabled=args.strip_session,
        prefer_https_enabled=args.prefer_https,
        collapse_index_enabled=args.collapse_index,
        sitemaps_enabled=args.sitemaps,
        trap_max_depth=args.trap_max_depth,
        trap_max_repeat=args.trap_max_repeat,
        trap_max_url_len=args.trap_max_url_len,
        round_seconds=args.round_seconds,
        domain_budget=args.domain_budget,
        pagerank_every=args.pagerank_every,
        pagerank_iters=args.pagerank_iters,
        pagerank_weight=args.pagerank_weight,
        thin_host_min_words=args.thin_host_min_words,
        meta_robots_enabled=args.meta_robots,
        rel_canonical_enabled=args.rel_canonical,
        meta_refresh_enabled=args.meta_refresh,
        anchor_nofollow_enabled=args.anchor_nofollow,
        hreflang_enabled=args.hreflang,
        robots_wildcards_enabled=args.robots_wildcards,
        strip_tracking_enabled=args.strip_tracking,
        exclude_patterns=tuple(args.exclude_pattern),
        exclude_extensions=_norm_exts(ap, args.exclude_ext),
        allow_hosts=_norm_hosts(ap, args.allow_host),
    )
    state = CrawlState(io=TableIO(spark, args.state_dir), cfg=cfg)

    if args.fsck:
        import json

        from indigo_crawler_spark.plans.round import fsck

        report = fsck(state)
        print(json.dumps(report, sort_keys=True))
        bad = [r for r, v in report.items() if not all(v.values())]
        if bad:
            print(f"fsck: corruption in round(s) {sorted(bad)}", file=sys.stderr)
            return 2
        print(f"fsck: {len(report)} committed rounds verified clean")
        return 0

    if args.gc:
        import json

        from indigo_crawler_spark.plans.state_gc import gc_state

        report = gc_state(state, keep_outputs=not args.gc_drop_outputs)
        print(json.dumps(report, sort_keys=True))
        print(
            f"gc: reclaimed {len(report['reclaimed'])} tables "
            f"({report['bytes_reclaimed']} bytes) at anchor {report['anchor']}"
        )
        return 0

    if args.export_hoststats:
        from indigo_crawler_spark.plans.export import host_report

        hr = host_report(
            state, args.export_hoststats, through_round=args.export_through
        )
        print(f"host report: {hr['hosts']} hosts -> {hr['out_path']}")
        if not args.export:
            return 0

    if args.export:
        from indigo_crawler_spark.plans.export import export_corpus

        report = export_corpus(
            state,
            args.export,
            through_round=args.export_through,
            annotate=args.export_annotate,
            split=args.export_split,
        )
        folded = (
            f"rounds {report['rounds'][0]}-{report['rounds'][-1]} folded"
            if report["rounds"]
            else "already up to date"
        )
        print(
            f"export[{report['mode']}]: {report['rows']} urls ({folded}, "
            f"{report['pks_rewritten']} buckets rewritten) -> {report['out_path']}"
        )
        # derived products chain: export -> normalize -> scrub -> redact ->
        # filter -> dedup -> sample -> shards, each stage reading the latest
        # upstream product that was requested
        source = args.export
        if args.export_normalize:
            from indigo_crawler_spark.plans.export import normalize_corpus

            nm = normalize_corpus(spark, source, args.export_normalize)
            print(
                f"normalize: {nm['rows_changed']} of {nm['rows']} urls "
                f"changed -> {nm['out_path']}"
            )
            source = args.export_normalize
        if args.export_scrub:
            from indigo_crawler_spark.plans.export import scrub_corpus

            sc = scrub_corpus(
                spark, source, args.export_scrub, min_docs=args.scrub_min_docs,
            )
            print(
                f"scrub: {sc['hot_lines']} boilerplate lines, "
                f"{sc['lines_dropped']} of {sc['lines_in']} line occurrences "
                f"dropped across {sc['rows']} urls -> {sc['out_path']}"
            )
            source = args.export_scrub
        if args.export_redact:
            from indigo_crawler_spark.plans.export import redact_corpus

            rd = redact_corpus(spark, source, args.export_redact)
            kinds = ", ".join(
                f"{k}={v}" for k, v in rd["matches_by_kind"].items() if v
            ) or "none found"
            print(
                f"redact: {kinds} masked across {rd['rows']} urls "
                f"-> {rd['out_path']}"
            )
            source = args.export_redact
        if args.export_filter:
            from indigo_crawler_spark.plans.export import filter_corpus

            fr = filter_corpus(
                spark, source, args.export_filter,
                min_words=args.filter_min_words,
                max_punct_ratio=args.filter_max_punct,
                langs=args.filter_langs.split(",") if args.filter_langs else None,
                max_dup_word_ratio=args.filter_max_dup_ratio,
                max_pii=args.filter_max_pii,
            )
            reasons = ", ".join(
                f"{k}={v}" for k, v in fr["dropped_by_reason"].items()
            ) or "no gates enabled"
            print(
                f"filter: {fr['rows_out']} of {fr['rows_in']} urls kept "
                f"({reasons}) -> {fr['out_path']}"
            )
            source = args.export_filter
        if args.export_mirrors:
            from indigo_crawler_spark.plans.export import mirror_report

            mr = mirror_report(
                spark, source, args.export_mirrors,
                min_overlap_pct=args.mirror_overlap,
            )
            print(
                f"mirrors: {mr['pairs']} host pairs over {mr['hosts']} hosts "
                f"-> {mr['out_path']}"
            )
        if args.export_dedup:
            from indigo_crawler_spark.plans.export import dedup_corpus

            d = dedup_corpus(
                spark, source, args.export_dedup,
                near_threshold=args.dedup_near,
            )
            near = (
                f", {d['near_dropped']} near-dups dropped"
                if "near_dropped" in d
                else ""
            )
            print(
                f"dedup: {d['rows_out']} distinct texts from {d['rows_in']} "
                f"urls{near} -> {d['out_path']}"
            )
            source = args.export_dedup
        if args.export_sample:
            from indigo_crawler_spark.operators.sampling import sample_corpus

            rates = (
                {
                    kv.split("=")[0]: float(kv.split("=")[1])
                    for kv in args.sample_rates.split(",")
                }
                if args.sample_rates
                else None
            )
            sp = sample_corpus(
                spark, source, args.export_sample,
                rate=args.sample_rate, by=args.sample_by, rates=rates,
                salt=args.sample_salt,
            )
            print(
                f"sample: {sp['rows_out']} of {sp['rows_in']} urls kept "
                f"-> {sp['out_path']}"
            )
            source = args.export_sample
        if args.export_shards:
            from indigo_crawler_spark.operators.sharding import shard_corpus

            sh = shard_corpus(
                spark, source, args.export_shards,
                shard_tokens=args.shard_tokens,
            )
            print(
                f"shards: {sh['rows']} urls / {sh['total_tokens']} tokens "
                f"packed into {sh['n_shards']} shards of ~{args.shard_tokens} "
                f"-> {sh['out_path']}"
            )
        return 0

    if state.io.read_manifest("bootstrap") is None:
        if args.synthetic:
            from indigo_crawler_spark.sources import synthetic

            # "PAGES" or "PAGES,HOSTS,SEEDS" (defaults: hosts=pages/20,
            # seeds=pages/40 — the synthetic generator's natural shape)
            parts = [int(x) for x in args.synthetic.split(",")]
            n_pages = parts[0]
            n_hosts = parts[1] if len(parts) > 1 else max(n_pages // 20, 10)
            n_seeds = parts[2] if len(parts) > 2 else max(n_pages // 40, 5)
            cpus = spark.sparkContext.defaultParallelism
            pages = synthetic.pages_df(spark, n_pages, n_hosts, parallelism=cpus * 2)
            seeds = synthetic.seeds_df(spark, n_pages, n_hosts, n_seeds)
            robots = synthetic.robots_df(spark, n_hosts)
            budgets = synthetic.budgets_df(spark, n_hosts)
        else:
            if not (args.pages and args.seeds):
                print("need --pages/--seeds or --synthetic for first run", file=sys.stderr)
                return 2
            pages = spark.read.schema(schemas.PAGES).parquet(args.pages)
            seeds = spark.read.schema(schemas.SEEDS).parquet(args.seeds)
            robots = (
                spark.read.schema(schemas.ROBOTS).parquet(args.robots)
                if args.robots
                else spark.createDataFrame([], schemas.ROBOTS)
            )
            budgets = (
                spark.read.schema(schemas.HOST_BUDGETS).parquet(args.budgets)
                if args.budgets
                else spark.createDataFrame([], schemas.HOST_BUDGETS)
            )
        bootstrap(
            spark, pages, seeds, robots, budgets, state,
            with_counters=not args.no_counters,
        )
        print("bootstrap committed")

    if args.retire:
        from indigo_crawler_spark.operators.retire import retire_urls

        with open(args.retire) as f:
            urls = [(ln.strip(),) for ln in f if ln.strip()]
        n = retire_urls(state, spark.createDataFrame(urls, "url string"))
        print(f"retired {n} urls (re-crawlable on rediscovery)")

    if args.add_seeds:
        from indigo_crawler_spark.operators.inject import inject_seeds

        with open(args.add_seeds) as f:
            urls = [(ln.strip(),) for ln in f if ln.strip()]
        n = inject_seeds(state, spark.createDataFrame(urls, "url string"))
        print(f"injected {n} seeds into the next round's frontier")

    if args.add_robots:
        import json as _json

        from indigo_crawler_spark.operators.inject import update_robots

        with open(args.add_robots) as f:
            rows = [
                (d["host"], d["robots_txt"])
                for d in (_json.loads(ln) for ln in f if ln.strip())
            ]
        n = update_robots(
            state, spark.createDataFrame(rows, "host string, robots_txt string")
        )
        print(f"updated robots for {n} hosts (effective next round)")

    manifests = run_rounds(
        spark,
        state,
        args.rounds,
        with_counters=not args.no_counters,
        gc_every=args.gc_every,
    )
    for m in manifests:
        print(f"round {m['round']} committed: {m.get('counters', {})}")
    print(f"done: {args.rounds} rounds total in {args.state_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
