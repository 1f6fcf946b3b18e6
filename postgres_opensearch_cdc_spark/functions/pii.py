"""PII redaction for training-data pipelines: regex scrubbing of
emails, phone numbers, and entity-ID tags, entirely inside codegen
(regexp_replace / regexp_count — no Python row path).

Scale shape: map-only per-row transform; at 100 TB this fuses into the
scan projection with zero shuffle. The pattern set is a constant list
shared verbatim with the DuckDB oracle so redaction counts are
value-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# (name, pattern, replacement) — applied in order: most specific first
# so the phone rule never swallows entity tags or bare ID digit runs.
# Patterns avoid lookarounds so they compile identically in Java regex
# and RE2/DuckDB; phone requires >=2 separator-delimited digit groups,
# leaving unseparated runs to long_digits.
REDACTION_RULES = [
    ("id_tag", r"Customer#\d+", "[CUSTOMER_ID]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?\d+([ -]\d+){2,}", "[PHONE]"),
    ("long_digits", r"\d{9,}", "[NUMBER]"),
]


def scrub(col: Column) -> Column:
    """Apply every redaction rule in order; returns the scrubbed text."""
    out = col
    for _, pat, repl in REDACTION_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def redaction_count(col: Column) -> Column:
    """Total matches across all rules, counted on the progressively
    scrubbed text (so overlapping rules don't double-count — identical
    order to scrub())."""
    total = F.lit(0)
    cur = col
    for _, pat, repl in REDACTION_RULES:
        total = total + F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    return total


def scrub_sql(expr: str) -> str:
    """DuckDB twin of scrub() — same rules, same order."""
    out = expr
    for _, pat, repl in REDACTION_RULES:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def redaction_count_sql(expr: str) -> str:
    """DuckDB twin of redaction_count()."""
    terms = []
    cur = expr
    for _, pat, repl in REDACTION_RULES:
        terms.append(f"len(regexp_extract_all({cur}, '{pat}'))")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return "(" + " + ".join(terms) + ")"
