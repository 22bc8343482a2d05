"""Text analysis columns for large-scale corpus pipelines.

All functions return Column expressions built from pyspark.sql.functions
only (JVM-side, whole-stage-codegen friendly — no Python UDFs in the hot
path). They power the documents-table queries in ``__spark_entry__``:
token counting, quality scoring, n-gram language ID, and document
fingerprinting — the text-side analog of the reference's per-page
handling hooks (handle.go:83-115) applied to a 100 TB corpus.

Scale notes: every expression here is a narrow per-row projection — no
shuffle, no skew sensitivity; the parquet scan prunes to the referenced
columns only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword marker sets for the n-gram language-ID
# heuristic. Deliberately tiny and deterministic (a real pipeline plugs a
# fastText model into the same column slot via a pandas UDF).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " los ", " que ", " y ", " es "],
}


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,!?;:]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n)


def alpha_ratio(text: Column) -> Column:
    """Fraction of ASCII-alphabetic characters — a cheap quality signal."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(alpha / n)


def mean_word_len(text: Column) -> Column:
    t = F.trim(text)
    nt = token_count(text)
    nospace = F.length(F.regexp_replace(t, r"\s+", ""))
    return F.when(nt == 0, F.lit(0.0)).otherwise(nospace / nt)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long-enough, mostly alphabetic,
    sane punctuation density, plausible word length. Deterministic and
    cross-engine reproducible (same arithmetic in the DuckDB oracle)."""
    nt = token_count(text).cast("double")
    length_term = F.least(nt / F.lit(100.0), F.lit(1.0))
    alpha_term = alpha_ratio(text)
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    wl = mean_word_len(text)
    wl_term = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_term + alpha_term + punct_term + wl_term) / 4.0


def lang_guess(text: Column) -> Column:
    """Stopword-marker vote over LANG_MARKERS; 'und' (undetermined) when
    no marker fires. Pure column logic → identical SQL exists for the
    DuckDB oracle."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            hits = (
                (F.length(padded) - F.length(F.replace(padded, F.lit(m)))) / F.lit(len(m))
            ).cast("long")
            s = hits if s is None else (s + hits)
        scores.append((lang, s))
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # first language (in insertion order) achieving the max wins ties
    for lang, s in reversed(scores):
        out = F.when(s == best_score, F.lit(lang)).otherwise(out)
    return F.when(best_score <= 0, F.lit("und")).otherwise(out)


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed, lowercased text — fingerprint preimage."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint of the normalized text (exact-dup key)."""
    return F.md5(normalized_text(text))


def char_shingles(text: Column, n: int = 3) -> Column:
    """Array of character n-grams of the normalized text (JVM-side:
    sequence + transform higher-order functions, no Python).

    Guard: ``F.sequence(1, 0)`` would generate a *descending* sequence,
    so texts shorter than ``n`` return an empty array explicitly."""
    t = normalized_text(text)
    return F.when(F.length(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        )
    )


def word_shingles(text: Column, n: int = 2) -> Column:
    """Array of word n-grams (space-joined) of the normalized text."""
    toks = F.split(normalized_text(text), " ")
    k = F.size(toks)
    return F.when(k < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - F.lit(n)),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )
