"""Cross-document boilerplate detection and removal.

Training-data pipelines scrub lines that repeat across many documents
(navigation chrome, cookie banners, footers) before dedup/quality gating —
per-document filters can't see them because each line is locally fine.
Two shapes:

- `boilerplate_ngrams`: the SQL-checkable detector — word n-grams that occur
  in >= min_docs distinct documents, with their document frequency. One
  explode + one distinct + one hash agg; the n-gram strings stay raw so an
  ANSI oracle (DuckDB) re-derives them byte-for-byte (driver query
  `boilerplate_shingles`).
- `remove_boilerplate_lines`: the production scrub over an exported crawl
  corpus (extracted text separates blocks with '\n' — kernels/textextract.py).
  Lines whose 64-bit hash appears in >= min_docs distinct documents are
  dropped and each document's remaining lines are reassembled in original
  order. The heavy joins move (doc, pos, line_hash) only — the line text
  rides the exploded frame and is never a join key, so a hot boilerplate
  line costs one grouped count, not a wide-string shuffle. Documents whose
  every line is boilerplate survive with empty text (row count preserved —
  downstream quality gates decide their fate, not this operator).

At 100 TB: one shuffle keyed by line hash (partial+final agg), one
broadcast-able (boilerplate lines are few) anti join, one shuffle back by
doc id for reassembly. No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ngram_expr(text, n: int):
    """Raw word n-gram array (space-joined) of trim(text); [] when < n words.

    Mirrors the DuckDB fold in `boilerplate_oracle_sql` exactly: tokens from
    regexp-splitting trimmed text on whitespace, windows joined with ' '.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(c), r"\s+")
    win = lambda i: [F.element_at(toks, i + F.lit(j)) for j in range(n)]  # noqa: E731
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", *win(i)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(shingle, n_docs) for every word n-gram in >= min_docs distinct docs.

    Distinct-before-count keeps a shingle repeated inside ONE document from
    inflating its document frequency; the count is a partial+final hash agg
    on the shingle string.
    """
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(ngram_expr(text_col, n)).alias("shingle")
    ).dropDuplicates(["doc_id", "shingle"])
    return (
        exploded.groupBy("shingle")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def boilerplate_oracle_sql(n: int = 5, min_docs: int = 3, table: str = "documents") -> str:
    """DuckDB mirror of boilerplate_ngrams (same tokenization and windows)."""
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return (
        f"WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks"
        f" FROM {table}), "
        f"g AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(toks) >= {n} THEN"
        f" list_transform(range(1, len(toks) - {n - 2}), i -> {parts})"
        f" ELSE [] END) AS shingle FROM t) "
        f"SELECT shingle, CAST(count(*) AS BIGINT) AS n_docs FROM g"
        f" GROUP BY shingle HAVING count(*) >= {min_docs}"
    )


def remove_boilerplate_lines(
    corpus: DataFrame,
    min_docs: int = 10,
    text_col: str = "text",
    id_col: str = "canon_url",
    counters: dict | None = None,
) -> DataFrame:
    """Scrub lines appearing in >= min_docs distinct documents; keep schema.

    Deterministic: line order inside a document is preserved via the explode
    position; a document reassembles to exactly its surviving lines joined
    with '\\n' (documents with no lines, or only boilerplate lines, keep
    their row with text=''). All other columns pass through untouched.

    *counters* may map any of {"lines", "kept", "hot"} to a pyspark
    Observation; each rides the caller's action (zero extra count jobs):
    lines_dropped = lines - kept, boilerplate line count = hot.
    """
    counters = counters or {}
    others = [c for c in corpus.columns if c != text_col]
    lines = corpus.select(
        *others, F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line")
    ).withColumn("_lh", F.xxhash64("_line"))
    if "lines" in counters:
        lines = lines.observe(counters["lines"], F.count(F.lit(1)).alias("n"))
    hot = (
        lines.select(id_col, "_lh")
        .dropDuplicates([id_col, "_lh"])
        .groupBy("_lh")
        .agg(F.count("*").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_lh")
    )
    if "hot" in counters:
        hot = hot.observe(counters["hot"], F.count(F.lit(1)).alias("n"))
    kept = lines.join(F.broadcast(hot), "_lh", "left_anti")
    if "kept" in counters:
        kept = kept.observe(counters["kept"], F.count(F.lit(1)).alias("n"))
    rebuilt = kept.groupBy(*others).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s._line,
            ),
            "\n",
        ).alias(text_col)
    )
    # documents whose every line was boilerplate fall out of `kept` — restore
    # them with empty text so the operator never changes corpus row count
    survivors = corpus.select(*others).join(
        rebuilt.select(*others), others, "left_anti"
    ).withColumn(text_col, F.lit(""))
    return rebuilt.unionByName(survivors).select(*corpus.columns)
