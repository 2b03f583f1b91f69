"""Text-analysis kernels for the training-data pipeline ops (task brief):
language-ID (n-gram/script heuristic), rolling-hash document fingerprint.

Pure Python/stdlib, deterministic; wrapped in Arrow-vectorized UDFs by
functions/text_analysis.py.
"""

from __future__ import annotations

# tiny per-language stopword profiles (heuristic language-ID; deterministic)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu", "den"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "los"},
}

_MOD = (1 << 61) - 1  # Mersenne prime for the rolling hash
_BASE = 257


def lang_id(text: str | None) -> str:
    """Heuristic language-ID: CJK script share, then stopword-ratio argmax.

    Returns one of en/zh/de/es/unknown — matching the corpus lang domain
    (FIXTURES.md). Deterministic ties: language order en < de < es.
    """
    if not text:
        return "unknown"
    n = len(text)
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk / n > 0.05:
        return "zh"
    words = text.lower().split()
    if not words:
        return "unknown"
    best_lang, best_hits = "unknown", 0
    for lang in ("en", "de", "es"):  # fixed order = deterministic tie-break
        hits = sum(1 for w in words if w in _STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "unknown"


def rolling_hashes(text: str, k: int = 5) -> list[int]:
    """Rabin-Karp rolling hashes of all char k-grams (base 257 mod 2^61-1)."""
    if len(text) < k:
        return []
    h = 0
    power = pow(_BASE, k - 1, _MOD)
    out = []
    data = text.encode("utf-8", errors="replace")
    if len(data) < k:
        return []
    for i, b in enumerate(data):
        h = (h * _BASE + b) % _MOD
        if i >= k - 1:
            out.append(h)
            h = (h - data[i - k + 1] * power) % _MOD
    return out


def fingerprint64(text: str | None, k: int = 5, w: int = 8) -> int:
    """Winnowing-style document fingerprint: XOR of per-window minima of the
    k-gram rolling hashes (Schleimer et al. winnowing, deterministic).

    Small edits perturb few windows, so near-identical docs share most
    window minima; the XOR gives one signed-64 summary value and the full
    window-min set is what MinHash-style dedup would bucket on.
    """
    hs = rolling_hashes(text or "", k)
    if not hs:
        return 0
    acc = 0
    prev_min = None
    for i in range(0, max(1, len(hs) - w + 1)):
        m = min(hs[i : i + w])
        if m != prev_min:
            acc ^= m
            prev_min = m
    v = acc & 0xFFFFFFFFFFFFFFFF
    return v - (1 << 64) if v >= 1 << 63 else v
