"""Text-analysis functions for the training-data pipeline surface:
tokenization, language ID, quality scoring, token counting, document
fingerprinting. Absent from the reference (SURVEY §2.7) — these are the
Spark-native extension operators the driver's documents table exists for.

Everything is built-in-function composition (whole-stage codegen, no
Python in the row path). Fingerprints use md5 — stable across engines,
so the DuckDB oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic
# language-ID. Deterministic + SQL-expressible (so oracle-checkable);
# a production system would swap in fastText/CLD3 behind the same column
# contract.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
    "zh": ["de", "shi", "le"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization, lowercased. The analyzer the reference's
    sink applies to text fields (standard analyzer, TDD :527-533),
    minus stemming."""
    return F.split(F.lower(text), r"\s+")


def token_count(text: Column) -> Column:
    """Token count (whitespace tokens), BPE-ish proxy for budget
    accounting."""
    return F.size(tokens(text)).cast("long")


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


# GPT-2-style pre-tokenizer pieces, simplified to the lookahead-free
# subset both Java regex and RE2/DuckDB compile identically: a piece is
# an optional leading space plus a letter run, digit run, or punctuation
# run. Non-overlapping left-to-right match counts agree across engines.
BPE_PIECE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer pieces. Tracks real
    BPE budgets far better than whitespace counts on text with digits,
    punctuation, or code; equals the whitespace count on plain prose."""
    return F.regexp_count(text, F.lit(BPE_PIECE_PATTERN)).cast("long")


def bpe_token_count_sql(expr: str = "text") -> str:
    """DuckDB twin of bpe_token_count."""
    return f"len(regexp_extract_all({expr}, '{BPE_PIECE_PATTERN}'))::BIGINT"


def avg_token_len(text: Column) -> Column:
    """Mean token length — a quality-score component."""
    t = tokens(text)
    total_chars = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return F.round(total_chars / F.size(t), 4)


def type_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct/total tokens. Low values flag
    boilerplate/spam — a standard pretraining quality filter."""
    t = tokens(text)
    return F.round(F.size(F.array_distinct(t)) / F.size(t), 4)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Engine-portable (DuckDB md5 matches), so exact-dedup keys built on it
    are oracle-checkable. The rolling-hash variant for shingles is in
    dedup.py."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normalized)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length docs and
    lexical diversity. Components chosen to be engine-portable; weights
    are arbitrary but fixed."""
    t = tokens(text)
    n = F.size(t)
    diversity = F.size(F.array_distinct(t)) / n
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    return F.round(0.5 * diversity + 0.5 * length_score, 4)


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language."""
    t = F.array_distinct(tokens(text))
    return {
        lang: F.size(F.array_intersect(t, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
