"""Benchmark decontamination — drop (or flag) corpus documents that share a
word n-gram with an evaluation/benchmark set, the standard pre-training
hygiene step (the GPT-3 report's 13-gram collision rule is the classic
instance). Per-document quality signals can't catch contamination; it is a
JOIN between the corpus and the eval set by construction.

Scale shape (100 TB corpus, small eval set): the eval side explodes to its
distinct n-gram set ONCE — eval suites are a few thousand documents, so the
exploded grams broadcast — and the corpus side explodes each document's
grams and left-semi-joins against the broadcast to find collisions. The
corpus n-gram explosion never shuffles: the semi join is map-side against
the broadcast, and the verdict folds back per doc with one hash agg on the
doc id. Gram STRINGS cross the wire only for the (tiny) eval side; corpus
grams are hashed to 8 bytes before the join, and since a false positive
from an xxhash64 collision only costs one extra flagged doc (flag, don't
silently drop, when that matters), the hash join is the default. Set
``exact=True`` to join on raw gram strings instead (no collisions,
broadcast grows by the eval text size).

Tokenization mirrors operators/boilerplate.ngram_expr (whitespace split of
trimmed text, space-joined windows) so one normative gram definition
serves both detectors — and the DuckDB oracle (driver query
``decontaminate_flags``) re-derives it byte-for-byte in the exact mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.operators.boilerplate import ngram_expr


def _grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(ngram_expr(text_col, n)).alias("_gram"),
    )


def contamination_flags(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    corpus_id: str = "canon_url",
    corpus_text: str = "text",
    eval_text: str = "text",
    exact: bool = False,
) -> DataFrame:
    """(id, n_hits) for every corpus document sharing ≥1 word n-gram with
    *eval_df* — n_hits counts the document's DISTINCT colliding grams.
    Documents with zero collisions are absent (semi-join shape); callers
    anti-join or left-join on the id to drop or annotate.
    """
    ev = (
        eval_df.select(F.explode(ngram_expr(eval_text, n)).alias("_gram"))
        .distinct()
    )
    cg = _grams(corpus, corpus_id, corpus_text, n).dropDuplicates(
        ["_id", "_gram"]
    )
    if not exact:
        ev = ev.select(F.xxhash64("_gram").alias("_gh"))
        cg = cg.select("_id", F.xxhash64("_gram").alias("_gh"))
        key = "_gh"
    else:
        key = "_gram"
    hits = cg.join(F.broadcast(ev), key, "left_semi")
    return (
        hits.groupBy("_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
        .withColumnRenamed("_id", corpus_id)
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    corpus_id: str = "canon_url",
    corpus_text: str = "text",
    eval_text: str = "text",
    exact: bool = False,
) -> DataFrame:
    """Corpus rows with NO n-gram collision against *eval_df* (anti join on
    the flagged-id set — ids only, the corpus text never reshuffles)."""
    flagged = contamination_flags(
        corpus, eval_df, n, corpus_id, corpus_text, eval_text, exact
    ).select(corpus_id)
    return corpus.join(F.broadcast(flagged), corpus_id, "left_anti")
