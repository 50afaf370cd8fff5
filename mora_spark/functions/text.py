"""Text-analysis column functions for LLM-data pipelines.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen'd) —
no Python UDFs — and each has an exact DuckDB-SQL twin used by the
oracles in ``mora_spark.queries.text``. At 100 TB these run inside the
scan stage with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword list shared verbatim with the SQL oracles.
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for"]

# Marker words for the n-gram-free language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "les", "et", "des", "une"],
}


def normalize_text(col: str | Column = "text") -> Column:
    """lower → strip non-alphanumerics → collapse whitespace → trim.
    Mirrors SQL: trim(regexp_replace(regexp_replace(lower(x),
    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens of the normalized text (no empty tokens)."""
    return F.split(normalize_text(col), " ")


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def distinct_tokens(col: str | Column = "text") -> Column:
    return F.array_distinct(tokens(col))


def bpe_token_estimate(toks: Column) -> Column:
    """BPE-ish subword count estimate: each word contributes
    ceil(len/4) pieces (~4 chars per merged subword, the common
    rule-of-thumb for byte-pair vocabularies). Deterministic and
    JVM-side — the cheap budget estimator you run over 100 TB before
    paying for a real tokenizer."""
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0),
    )


def stopword_ratio(toks: Column) -> Column:
    """Fraction of tokens that are stopwords."""
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return n_stop / F.size(toks)


def type_token_ratio(toks: Column) -> Column:
    """Vocabulary richness: distinct tokens / tokens."""
    return F.size(F.array_distinct(toks)) / F.size(toks)


def quality_score(toks: Column) -> Column:
    """Deterministic doc-quality heuristic in [0, 1]:
    length component + vocabulary richness + non-stopword density.
    Formula mirrored exactly in the SQL oracle."""
    length_c = F.least(F.lit(1.0), F.size(toks) / F.lit(100.0))
    ttr = type_token_ratio(toks)
    stop = stopword_ratio(toks)
    return 0.3 * length_c + 0.4 * ttr + 0.3 * (1.0 - stop)


def lang_guess(toks: Column) -> Column:
    """Marker-word-voting language ID; ties break in fixed order
    en > es > de > fr; no markers → 'und'."""
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        counts[lang] = F.size(
            F.filter(toks, lambda t: F.array_contains(arr, t))
        )
    en, es, de, fr = counts["en"], counts["es"], counts["de"], counts["fr"]
    best = F.greatest(en, es, de, fr)
    return (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def fingerprint(col: str | Column = "text") -> Column:
    """Content fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def prefix_fingerprint(toks: Column, n: int = 10) -> Column:
    """Fingerprint of the first n tokens — cheap clustering key for
    boilerplate/near-dup prefiltering."""
    return F.md5(F.array_join(F.slice(toks, 1, n), " "))


# Conservative regex subset (char classes, +, {n}) that Java regex
# (Spark) and RE2 (DuckDB) interpret identically — richer PII patterns
# (lookarounds) would diverge between engines and are out of scope.
PII_PATTERNS = {
    "email": r"[a-z0-9.]+@[a-z0-9]+\.[a-z]+",
    "phone": r"[0-9]{3}-[0-9]{4}",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (scan-stage, JVM regex)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder. Pure
    scan-stage expression chain: at 100 TB this costs one pass over
    the text bytes, no shuffle, no Python."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out
