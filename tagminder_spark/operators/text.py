"""Text-analysis operators for document pipelines: language-ID heuristic,
quality scoring, token counting, fingerprinting.

All pure Column expressions (regexp/aggregate built-ins) so they run
JVM-side at full codegen speed and are exactly reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Marker stopwords per language for the n-gram-free language heuristic.
#: Deliberately tiny and deterministic; a production pipeline would swap in
#: a char-n-gram profile model behind the same column contract.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "es": ("la", "el", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def word_count(text: Column) -> Column:
    """Whitespace token count (blank-safe)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def regex_token_count(text: Column, pattern: str = "[a-z0-9]+") -> Column:
    """BPE-ish token proxy: count of maximal alnum runs."""
    return F.regexp_count(F.lower(text), F.lit(pattern))


def marker_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Occurrences of any marker word, word-boundary matched."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    total = F.lit(0)
    for wrd in words:
        total = total + F.regexp_count(padded, F.lit(f" {wrd} "))
    return total


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0,1]:
    0.4·length-band + 0.3·mean-word-length-band + 0.3·(1-stopword excess).
    Deterministic integer/decimal arithmetic, rounded to 4 places."""
    n_chars = F.length(text)
    n_words = word_count(text)
    mean_wlen = (n_chars - n_words + 1).cast("double") / n_words
    stop_ratio = marker_hits(text, STOPWORDS).cast("double") / n_words
    len_band = F.when((n_chars >= 100) & (n_chars <= 2000), F.lit(1.0)).otherwise(
        F.lit(0.3)
    )
    wlen_band = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.4)
    )
    stop_band = F.when(stop_ratio <= 0.5, F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        F.lit(0.4) * len_band + F.lit(0.3) * wlen_band + F.lit(0.3) * stop_band, 4
    )


def fingerprint(text: Column, modulus: int = 2_147_483_647) -> Column:
    """Polynomial rolling hash (base 31) over the character stream of the
    normalized text — the document-fingerprint primitive. Left-fold
    aggregate ⇒ sequential, deterministic, portable."""
    chars = F.split(F.lower(F.trim(text)), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * F.lit(31) + F.ascii(ch), F.lit(modulus)),
    )
