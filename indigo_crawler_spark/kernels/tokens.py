"""Whitespace token count — pure-Python twin of
``functions/text_analysis.whitespace_token_count``, pinned OPERATION-FOR-
OPERATION against the Spark expression so the thin-host demotion loop
(SEMANTICS.md §Thin-host demotion) is engine ≡ oracle on any text:

* Spark ``trim`` strips ASCII SPACE (0x20) only — NOT tabs/newlines — so
  the mirror strips ``' '`` only.
* the emptiness check is on the space-trimmed string (spaces-only text →
  0 tokens; a lone ``"\\n"`` is NOT empty).
* Spark ``split(c, r"\\s+")`` is Java regex with limit -1: ``\\s`` is the
  ASCII class ``[ \\t\\n\\x0b\\f\\r]`` (no Unicode whitespace — a NBSP
  joins its neighbors into one token), and BOTH leading and trailing
  empty strings are kept, so ``"\\ta b\\t"`` counts 4 tokens, not 2.
  Python ``re.split`` with the same explicit class reproduces exactly
  this (``str.split()`` would NOT: it drops empties and splits on
  Unicode whitespace).
"""

from __future__ import annotations

import re

_WS_RUN = re.compile(r"[ \t\n\x0b\f\r]+")


def whitespace_token_count_py(text: str | None) -> int:
    if text is None:
        return 0
    t = text.strip(" ")
    if t == "":
        return 0
    return len(_WS_RUN.split(t))
