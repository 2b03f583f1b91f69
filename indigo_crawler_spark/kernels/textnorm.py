"""Text normalization kernel (normative, pure Python — shared by the Spark
UDF and any oracle): Unicode NFC composition plus control-character
hygiene, the canonical first step over extracted web text. Without it,
byte-distinct but canonically-equal strings ('e'+U+0301 vs 'é') defeat
exact dedup, shingle hashing, and content-addressed sampling, and stray
C0/C1 controls poison tokenizers downstream.

Rules (in order):
1. CRLF / CR → LF (line structure preserved for the boilerplate scrub).
2. Drop C0 controls except TAB and LF, drop DEL (U+007F): the codegen-able
   class ``[\\x00-\\x08\\x0B-\\x1F\\x7F]``.
3. Drop zero-width characters (ZWSP U+200B, ZWNJ U+200C, ZWJ U+200D, BOM
   U+FEFF) — invisible, tokenizer-splitting, common in scraped text.
4. Unicode NFC normalization (compose combining sequences).

NFC is the only step that needs Python (no Spark SQL builtin); steps 1–3
are plain regexp_replace codegen, and the DuckDB oracle runs the whole
chain declaratively (``nfc_normalize`` + the same replaces) — the driver
query ``text_normalize`` pins the parity.
"""

from __future__ import annotations

import re
import unicodedata

_CONTROLS = re.compile("[\x00-\x08\x0b-\x1f\x7f]")
_ZERO_WIDTH = re.compile("[\u200b\u200c\u200d\ufeff]")


def normalize_text(text: str) -> str:
    """Apply the full normalization chain to one string."""
    t = text.replace("\r\n", "\n").replace("\r", "\n")
    t = _CONTROLS.sub("", t)
    t = _ZERO_WIDTH.sub("", t)
    return unicodedata.normalize("NFC", t)
