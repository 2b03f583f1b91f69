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


@F.pandas_udf(LongType())
def fingerprint_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: fingerprint64(t) if isinstance(t, str) else 0)
