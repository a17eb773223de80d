"""PII detection / redaction over text columns.

The pretraining-pipeline scrubbing stage: detect and mask emails,
IPv4 addresses, SSN-shaped ids and phone-shaped digit runs before a
corpus ever reaches tokenization. Patterns are deliberately written
in the common subset of Java regex (Spark) and RE2 (DuckDB): no
backreferences, no lookaround, no word boundaries — so the exact
same pattern string runs on both engines and the results are
hash-comparable.

Engine-portability note (the round-3 pitfall this module encodes):
Spark SQL *string literals* process backslash escapes, DuckDB's do
not — `'\\.'` reaches Spark's regex engine as `.` and silently
matches any character. The Spark side therefore NEVER interpolates
patterns into SQL text; it binds them as literal columns via
``F.lit`` (``F.regexp_count(col, F.lit(pat))``), while the DuckDB
oracle side interpolates the raw pattern into SQL, where quotes are
escape-free. One pattern string, two safe transports.

Scale: pure per-row expressions — no shuffle, no UDF, stays inside
WholeStageCodegen; a 100 TB scrub is a single map over the corpus
with the patterns baked into the generated code.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in this order; order matters
# because the classes overlap (an SSN also looks like a phone-shaped
# digit run, so SSNs are masked before the phone pass runs).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", r"\+?[0-9][0-9 ()-]{7,}[0-9]", "<PHONE>"),
]


def pii_counts(text_col: str) -> list[Column]:
    """Per-pattern match counts on the raw text (Spark side)."""
    return [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def pii_redact(text_col: str) -> Column:
    """Sequentially mask every PII class (Spark side)."""
    out = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, F.lit(pat), F.lit(repl))
    return out


def pii_counts_duck(text_expr: str) -> str:
    """Comma-joined per-pattern count exprs (DuckDB oracle side)."""
    return ", ".join(
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )


def pii_redact_duck(text_expr: str) -> str:
    """Nested global regexp_replace chain (DuckDB oracle side)."""
    out = text_expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out
