"""Text-analysis column functions for the training-data pipeline.

JVM-side column expressions wherever possible (token counts, quality
ratios — whole-stage codegen, no Python); Arrow-vectorized pandas UDFs only
for the two kernels that need Python (language-ID heuristic, rolling-hash
fingerprint).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

from indigo_crawler_spark.kernels.textstats import fingerprint64, lang_id

# BPE-ish word/number/punctuation tokenizer (GPT-2-style coarse classes)
_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column | str) -> Column:
    """Number of whitespace-delimited tokens (empty text → 0)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def regex_token_count(text: Column | str) -> Column:
    """BPE-ish token count: letter runs + digit runs + single punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(_TOKEN_RE), 0))


def quality_exprs(text: Column | str) -> dict[str, Column]:
    """Quality-scoring signals: length, punct ratio, stopword-ish ratio,
    mean word length — all exact integer/double arithmetic (SQL-checkable)."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_space = n_chars - F.length(F.regexp_replace(c, r"\s", ""))
    n_words = whitespace_token_count(c)
    # try_divide, not `/`: under Spark 4's default ANSI mode a plain divide
    # THROWS on a zero denominator (empty text ⇒ n_chars = 0, and Catalyst
    # constant-folds the throw into plan time when text is a literal — e.g.
    # the all-boilerplate '' branch of remove_boilerplate_lines). NULL ratio
    # for empty text is the documented semantics; the DuckDB oracle mirrors
    # it with a NULLIF divisor.
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "punct_ratio": F.round(
            F.try_divide(n_punct.cast("double"), n_chars.cast("double")), 6
        ),
        "space_ratio": F.round(
            F.try_divide(n_space.cast("double"), n_chars.cast("double")), 6
        ),
        "mean_word_len": F.round(
            F.try_divide((n_chars - n_space).cast("double"), n_words.cast("double")),
            6,
        ),
    }


@F.pandas_udf(StringType())
def lang_id_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: lang_id(t) if isinstance(t, str) else "unknown")


# stopword-count language-ID — the fully declarative (and ANSI-SQL-checkable)
# variant: score(lang) = |distinct tokens ∩ stopwords(lang)|, argmax with
# ties broken by language code ascending; all-zero ⇒ 'und'. Pure column
# expressions → whole-stage codegen, no Python.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "ich", "zu", "mit", "den"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it", "for", "was", "with", "not"],
    "es": ["el", "la", "los", "las", "es", "y", "de", "que", "en", "un", "una", "no"],
    "fr": ["le", "la", "les", "et", "est", "de", "que", "en", "un", "une", "ne", "pas"],
}


def langid_expr(text: Column | str) -> Column:
    """argmax-by-stopword-overlap language code ('und' when no overlap)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.array_distinct(F.split(F.trim(F.lower(c)), r"\s+"))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in sorted(LANG_STOPWORDS.items())
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # descending language order so earlier (ascending) codes win ties
    for lang in sorted(scores, reverse=True):
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def langid_oracle_sql(table: str = "documents", text_col: str = "text") -> str:
    """The DuckDB mirror of langid_expr (same tokenization, scores, ties)."""
    score_cols = ", ".join(
        "len(list_intersect(toks, ["
        + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        + f"])) AS s_{lang}"
        for lang in sorted(LANG_STOPWORDS)
    )
    langs = sorted(LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN best > 0 AND s_{lang} = best THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    return (
        f"WITH toks AS (SELECT *, list_distinct(regexp_split_to_array("
        f"trim(lower({text_col})), '\\s+')) AS toks FROM {table}), "
        f"scored AS (SELECT *, {score_cols} FROM toks), "
        f"best AS (SELECT *, {best} AS best FROM scored) "
        f"SELECT {case} AS lid, count(*) AS n FROM best GROUP BY 1"
    )


@F.pandas_udf(LongType())
def fingerprint_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: fingerprint64(t) if isinstance(t, str) else 0)


def repetition_exprs(text: Column | str) -> dict[str, Column]:
    """Gopher-style repetition signals, exact integers (SQL-checkable):
    top-word occurrence count, occurrences of repeated words, and occurrences
    of repeated word bigrams. High values flag machine-generated / template
    spam that per-document length+punct gates miss.

    Pure per-row array expressions — zero shuffles, which is the right shape
    for this signal (each document is self-contained). Work per row is
    O(distinct_words x words); fine for web documents, and the alternative
    explode+groupBy shape would pay a corpus-wide shuffle to compute a
    per-row number. Callers gate on ratios like
    dup_word_occ / n_words >= threshold.
    """
    c = F.trim(F.col(text) if isinstance(text, str) else text)
    toks = F.split(c, r"\s+")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = lambda arr: F.transform(  # noqa: E731
        F.array_distinct(arr), lambda w: F.size(F.filter(arr, lambda x: x == w))
    )
    dup = lambda cnts: F.aggregate(  # noqa: E731
        cnts, F.lit(0), lambda a, n: a + F.when(n > 1, n).otherwise(F.lit(0))
    )
    wc, bc = occ(toks), occ(bigrams)
    return {
        "n_words": F.size(toks).cast("long"),
        "top_word_count": F.array_max(wc).cast("long"),
        "dup_word_occ": dup(wc).cast("long"),
        "n_bigrams": F.size(bigrams).cast("long"),
        "dup_bigram_occ": dup(bc).cast("long"),
    }


def repetition_oracle_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB mirror of repetition_exprs (same tokenization, same folds;
    empty-text rows are excluded on both sides by the caller)."""
    return (
        f"WITH t AS (SELECT doc_id, regexp_split_to_array(trim({text_col}), '\\s+')"
        f" AS toks FROM {table} WHERE length(trim({text_col})) > 0), "
        "b AS (SELECT doc_id, toks, CASE WHEN len(toks) >= 2 THEN"
        " list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"
        " ELSE [] END AS bgs FROM t), "
        "cnts AS (SELECT doc_id, len(toks) AS n_words,"
        " list_transform(list_distinct(toks), w -> len(list_filter(toks, x -> x = w))) AS wc,"
        " len(bgs) AS n_bigrams,"
        " list_transform(list_distinct(bgs), w -> len(list_filter(bgs, x -> x = w))) AS bc"
        " FROM b) "
        "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,"
        " CAST(list_max(wc) AS BIGINT) AS top_word_count,"
        " CAST(coalesce(list_sum(list_filter(wc, n -> n > 1)), 0) AS BIGINT) AS dup_word_occ,"
        " CAST(n_bigrams AS BIGINT) AS n_bigrams,"
        " CAST(coalesce(list_sum(list_filter(bc, n -> n > 1)), 0) AS BIGINT) AS dup_bigram_occ"
        " FROM cnts"
    )


# train/valid/test fractions for hash_split_expr, out of 100 buckets
SPLIT_BOUNDS = (80, 90)


def hash_split_expr(key: Column | str) -> tuple[Column, Column]:
    """Deterministic dataset-split assignment: (bucket, split) from the first
    4 hex nibbles of md5(key) — bucket in [0, 100), split = train/valid/test
    at 80/10/10. Content-addressed (not positional), so the assignment is
    stable across reruns, repartitions, and corpus growth — the property a
    training pipeline needs so examples never migrate between train and test.
    Pure codegen; md5 (not xxhash64) so ANSI SQL re-derives it byte-for-byte.
    """
    c = F.col(key) if isinstance(key, str) else key
    bucket = F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("long") % 100
    split = (
        F.when(bucket < SPLIT_BOUNDS[0], F.lit("train"))
        .when(bucket < SPLIT_BOUNDS[1], F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return bucket, split


def hash_split_oracle_sql(table: str = "documents", key_col: str = "doc_id") -> str:
    """DuckDB mirror of hash_split_expr (strpos nibble decode of md5 hex)."""
    nib = lambda j: (  # noqa: E731
        f"(strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1)"
    )
    lo, hi = SPLIT_BOUNDS
    return (
        f"WITH m AS (SELECT {key_col}, md5(CAST({key_col} AS VARCHAR)) AS h FROM {table}), "
        f"b AS (SELECT {key_col}, CAST(({nib(0)}*4096 + {nib(1)}*256 + {nib(2)}*16 +"
        f" {nib(3)}) % 100 AS BIGINT) AS bucket FROM m) "
        f"SELECT {key_col}, bucket, CASE WHEN bucket < {lo} THEN 'train'"
        f" WHEN bucket < {hi} THEN 'valid' ELSE 'test' END AS split FROM b"
    )
