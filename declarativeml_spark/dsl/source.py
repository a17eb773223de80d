"""FROM-source clause classification and safety validation.

The reference compiles training sources in two modes (reference:
dsl/parser.py:201-220, 619-673): a lone unqualified identifier is
quoted as a table name; anything else is a *validated SQL fragment*
passed through to the backing engine. The fragment validator rejects
statement terminators, comments, and DML/DDL/session keywords, and
shape-checks joins/subqueries.

We keep the same contract (identical error messages) because our plan
builder also has a passthrough path — ``spark.sql(f"SELECT ... FROM
{fragment}")`` — and the same injection concerns apply to generated
SQL text. The Spark keyword list is adjusted to Spark SQL's surface
(no LISTEN/NOTIFY/VACUUM in Spark; ADD/REFRESH/RESET/SET exist).
"""

from __future__ import annotations

import re

_RELATION_IDENTIFIER = r'[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*|"(?:[^"]|"")+"'

# Union of the reference's PostgreSQL denylist (dsl/parser.py:185-192)
# and Spark-SQL-specific state-changing commands.
_FORBIDDEN_SOURCE_TOKENS_RE = re.compile(
    r"\b("
    r"INSERT|UPDATE|DELETE|UPSERT|MERGE|CREATE|ALTER|DROP|TRUNCATE|GRANT|REVOKE|"
    r"BEGIN|COMMIT|ROLLBACK|SAVEPOINT|RELEASE|LOCK|CALL|DO|EXECUTE|PREPARE|"
    r"DEALLOCATE|COPY|VACUUM|ANALYZE|REFRESH|SET|SHOW|RESET|LISTEN|UNLISTEN|NOTIFY|"
    r"MSCK|UNCACHE|CACHE|CLEAR|UNION|INTERSECT|EXCEPT"
    r")\b",
    re.IGNORECASE,
)

_SUBQUERY_RE = re.compile(
    # WITH-led bodies support CTE-prefixed DSL statements
    # (reference DSL.md:398-417: standard-SQL data prep feeding TRAIN)
    r"\(\s*(?:SELECT|WITH)\b[\s\S]+\)\s*(?:AS\s+)?[A-Za-z_][A-Za-z0-9_]*\s*",
    re.IGNORECASE,
)

# relation [alias] (JOIN relation [alias] ON cond)* [WHERE][GROUP BY][HAVING][ORDER BY][LIMIT]
_CONDITION_CHARS = r"[\w\s\.\(\)=<>!+\-*/'\"%]+"
# The ON condition inside the REPEATED join group is TEMPERED: it may
# not absorb a following join head. The reference's un-tempered class
# (dsl/parser.py:662) lets every ON condition also swallow later
# "JOIN … ON …" text, so a NON-matching fragment backtracks over
# every partition of the join segments — exponential: 20 joins took
# 6 s, ~30 joins pins a core for hours (a ReDoS inside the safety
# validator itself). Tempering forces the unique real segmentation;
# acceptance is unchanged for every legitimate fragment (columns
# named left/right/full/etc. still work — only an actual
# `[INNER |LEFT |…]JOIN ` head terminates the condition), and the
# sole narrowing is an ON condition containing a literal standalone
# join head, which a join-shape guard should reject anyway.
_ON_COND_TEMPERED = (
    r"(?:(?!\s+(?:(?:INNER|LEFT|RIGHT|FULL|CROSS)\s+)?JOIN\b)"
    r"[\w\s\.\(\)=<>!+\-*/'\"%])+"
)
_RELATION_PATTERN = re.compile(
    rf"^(?:{_RELATION_IDENTIFIER})"
    rf"(?:\s+(?:AS\s+)?[A-Za-z_][A-Za-z0-9_]*)?"
    rf"(?:\s+(?:(?:INNER|LEFT|RIGHT|FULL|CROSS)\s+)?JOIN\s+(?:{_RELATION_IDENTIFIER})"
    rf"(?:\s+(?:AS\s+)?[A-Za-z_][A-Za-z0-9_]*)?"
    rf"\s+(?:ON\s+{_ON_COND_TEMPERED}|USING\s*\(\s*[A-Za-z_][A-Za-z0-9_]*"
    rf"(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*\s*\)))*"
    rf"(?:\s+WHERE\s+{_CONDITION_CHARS})?"
    rf"(?:\s+GROUP\s+BY\s+[\w\s\.,\(\)]+)?"
    rf"(?:\s+HAVING\s+{_CONDITION_CHARS})?"
    rf"(?:\s+ORDER\s+BY\s+[\w\s\.,\(\)]+)?"
    rf"(?:\s+LIMIT\s+\d+)?"
    rf"\s*$",
    re.IGNORECASE,
)


def is_identifier_source(clause: str) -> bool:
    """True only for a single unqualified, unquoted source identifier.

    Matches the reference's classification (dsl/parser.py:201-220):
    ``transactions`` or even ``user-events`` → identifier;
    ``analytics.transactions``, ``"Quoted"``, joins, subqueries →
    fragment mode.
    """
    if not clause:
        return False
    if any(ch.isspace() for ch in clause):
        return False
    if any(ch in '.()"\'' for ch in clause):
        return False
    return True


def validate_source_fragment(clause: str) -> None:
    """Validate a non-identifier FROM fragment; raise ValueError if unsafe.

    Error messages match the reference (dsl/parser.py:633-673) so its
    negative tests port verbatim. One deliberate divergence: we accept
    ``JOIN ... USING (cols)`` — the reference's docs use it
    (DSL.md:398) but its validator rejected it; Spark SQL supports it
    natively (SURVEY.md §2.4 decision).
    """
    if not clause:
        raise ValueError("Training data source clause cannot be empty")
    if ";" in clause:
        raise ValueError("Training data source must not contain statement terminators")
    if "--" in clause or "/*" in clause or "*/" in clause:
        raise ValueError("Training data source must not contain SQL comments")
    if _FORBIDDEN_SOURCE_TOKENS_RE.search(clause):
        raise ValueError("Training data source contains disallowed SQL keywords")

    text = clause.strip()
    if text.startswith("("):
        if not _SUBQUERY_RE.fullmatch(text):
            raise ValueError(
                "Training data subqueries must be parenthesized SELECT statements"
                " with an alias"
            )
        return
    if not _RELATION_PATTERN.fullmatch(text):
        raise ValueError(
            "Training data source must be a relation/join expression or a"
            " parenthesized subquery"
        )
