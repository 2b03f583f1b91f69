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
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "punct_ratio": F.round(n_punct.cast("double") / n_chars.cast("double"), 6),
        "space_ratio": F.round(n_space.cast("double") / n_chars.cast("double"), 6),
        "mean_word_len": F.round(
            (n_chars - n_space).cast("double") / n_words.cast("double"), 6
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
