"""Feature-expression AST: parse, canonical render, Spark SQL compile.

The reference parses feature expressions twice — once inside the
statement grammar and once in a standalone expression parser used at
SQL-emission time (reference: dsl/parser.py:76-101 grammar,
parser.py:676-744 SQL compiler). We keep one AST with two renderers:

* ``render()`` — the canonical text stored in ``TrainModel.features``
  (same surface text the reference stores, e.g.
  ``scale(log(amount + 1))``, kwargs as ``name=value``);
* ``to_spark_sql()`` — a Spark SQL expression string (backtick-quoted
  identifiers) consumed by ``F.expr`` in the plan builder. Staying in
  SQL-expression space keeps every feature inside Catalyst codegen —
  no Python UDF is involved unless the called function resolves to a
  registered kernel.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

from declarativeml_spark.dsl.lexer import DSLSyntaxError, Token, tokenize


@dataclass(frozen=True)
class Identifier:
    parts: Tuple[str, ...]  # dotted path, e.g. ("customer", "age")

    def render(self) -> str:
        return ".".join(self.parts)

    def to_spark_sql(self) -> str:
        return ".".join(f"`{p}`" for p in self.parts)


@dataclass(frozen=True)
class NumberLit:
    value: Union[int, float]

    def render(self) -> str:
        return str(self.value)

    def to_spark_sql(self) -> str:
        return str(self.value)


@dataclass(frozen=True)
class StringLit:
    value: str

    def render(self) -> str:
        return json.dumps(self.value)

    def to_spark_sql(self) -> str:
        escaped = self.value.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"


@dataclass(frozen=True)
class ListLit:
    """List literal in a feature-call argument, e.g. ``periods=[1,7,30]``.

    Extension over the reference feature grammar (its DSL.md:94
    ``time_series.lag(revenue, periods=[1,7,30])`` example doesn't
    parse under its own implemented grammar — we accept it)."""

    items: Tuple["FeatureExpr", ...]

    def render(self) -> str:
        return "[" + ", ".join(i.render() for i in self.items) + "]"

    def to_spark_sql(self) -> str:
        return "array(" + ", ".join(i.to_spark_sql() for i in self.items) + ")"


@dataclass(frozen=True)
class BinOp:
    op: str  # + - * /
    left: "FeatureExpr"
    right: "FeatureExpr"

    def render(self) -> str:
        return f"{self.left.render()} {self.op} {self.right.render()}"

    def to_spark_sql(self) -> str:
        return f"{self.left.to_spark_sql()} {self.op} {self.right.to_spark_sql()}"


@dataclass(frozen=True)
class Neg:
    operand: "FeatureExpr"

    def render(self) -> str:
        return f"-{self.operand.render()}"

    def to_spark_sql(self) -> str:
        return f"-{self.operand.to_spark_sql()}"


@dataclass(frozen=True)
class Group:
    inner: "FeatureExpr"

    def render(self) -> str:
        return f"({self.inner.render()})"

    def to_spark_sql(self) -> str:
        return f"({self.inner.to_spark_sql()})"


# DSL function names → Spark SQL equivalents (reference DSL.md:81
# names DAYS_BETWEEN/CURRENT_DATE; arg-swapping handled below).
_FUNCTION_ALIASES = {
    "days_between": "datediff",  # DAYS_BETWEEN(a, b) == datediff(b, a)
    "DAYS_BETWEEN": "datediff",
    "CURRENT_DATE": "current_date",
}
_ARG_REVERSED = {"days_between", "DAYS_BETWEEN"}


@dataclass(frozen=True)
class Call:
    func: Identifier
    args: Tuple["FeatureExpr", ...]
    kwargs: Tuple[Tuple[str, "FeatureExpr"], ...] = ()

    def render(self) -> str:
        parts = [a.render() for a in self.args]
        parts += [f"{k}={v.render()}" for k, v in self.kwargs]
        return f"{self.func.render()}({', '.join(parts)})"

    def to_spark_sql(self) -> str:
        # kwargs use Spark's named-argument syntax (name => value);
        # only functions that accept named args (or registered
        # kernels, resolved earlier in the plan builder) may use them.
        name = self.func.render()
        args = list(self.args)
        if len(self.func.parts) == 1 and self.func.parts[0] in _FUNCTION_ALIASES:
            if self.func.parts[0] in _ARG_REVERSED:
                args = list(reversed(args))
            name = _FUNCTION_ALIASES[self.func.parts[0]]
        parts = [a.to_spark_sql() for a in args]
        parts += [f"{k} => {v.to_spark_sql()}" for k, v in self.kwargs]
        return f"{name}({', '.join(parts)})"


@dataclass(frozen=True)
class AllColumns:
    """``alias.*`` as a feature-call ARGUMENT (the reference's
    flagship example, DSL.md:44: ``DERIVED
    feature_engineering.recency_frequency_monetary(t.*)``) — rendered
    to Spark SQL as ``struct(alias.*)`` so the call receives one
    struct of the alias's columns. Parse-level parity: the reference's
    own grammar rejects ``*`` in feature expressions, so anything a
    reference user can run still runs here; resolution then depends on
    the alias surviving into the resolved frame."""

    alias: Tuple[str, ...]

    def render(self) -> str:
        return ".".join(self.alias) + ".*"

    def to_spark_sql(self) -> str:
        # backtick-quote the alias parts like every other identifier
        # rendering here — an alias that collides with a SQL keyword
        # (`order`, `table`) must not break only in the .* form
        return "struct(" + ".".join(f"`{p}`" for p in self.alias) + ".*)"


FeatureExpr = Union[
    Identifier, NumberLit, StringLit, ListLit, BinOp, Neg, Group, Call,
    AllColumns,
]


class _ExprParser:
    """Precedence-climbing parser over the shared token stream."""

    def __init__(self, tokens: List[Token], start: int = 0):
        self.tokens = tokens
        self.i = start

    # -- token helpers -------------------------------------------------
    def peek(self) -> Token:
        return self.tokens[self.i]

    def advance(self) -> Token:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def accept_op(self, *ops: str) -> Optional[Token]:
        tok = self.peek()
        if tok.kind == "OP" and tok.value in ops:
            return self.advance()
        return None

    def expect_op(self, op: str) -> Token:
        tok = self.advance()
        if tok.kind != "OP" or tok.value != op:
            raise DSLSyntaxError(f"Expected {op!r}, got {tok.value!r} at {tok.pos}")
        return tok

    # -- grammar -------------------------------------------------------
    def parse_expr(self) -> FeatureExpr:
        return self.parse_sum()

    def parse_sum(self) -> FeatureExpr:
        node = self.parse_term()
        while True:
            tok = self.accept_op("+", "-")
            if tok is None:
                return node
            node = BinOp(tok.value, node, self.parse_term())

    def parse_term(self) -> FeatureExpr:
        node = self.parse_factor()
        while True:
            tok = self.accept_op("*", "/")
            if tok is None:
                return node
            node = BinOp(tok.value, node, self.parse_factor())

    def parse_factor(self) -> FeatureExpr:
        if self.accept_op("-"):
            return Neg(self.parse_factor())
        return self.parse_primary()

    def parse_primary(self) -> FeatureExpr:
        tok = self.peek()
        if tok.kind == "NUMBER":
            self.advance()
            return NumberLit(_to_number(tok.value))
        if tok.kind == "DSTRING":
            self.advance()
            return StringLit(json.loads(tok.value))
        if tok.kind == "SQSTRING":
            # the DSL's own idiomatic string syntax ('...' with ''
            # escaping) — accepted everywhere else in the statement
            # grammar, so feature expressions must take it too
            self.advance()
            return StringLit(tok.value[1:-1].replace("''", "'"))
        if tok.kind == "OP" and tok.value == "(":
            self.advance()
            inner = self.parse_expr()
            self.expect_op(")")
            return Group(inner)
        if tok.kind == "OP" and tok.value == "[":
            self.advance()
            items: list[FeatureExpr] = []
            if not (self.peek().kind == "OP" and self.peek().value == "]"):
                while True:
                    items.append(self.parse_expr())
                    if not self.accept_op(","):
                        break
            self.expect_op("]")
            return ListLit(tuple(items))
        if tok.kind == "NAME":
            ident = self.parse_identifier()
            if isinstance(ident, AllColumns):
                return ident  # alias.* is never callable
            if self.peek().kind == "OP" and self.peek().value == "(":
                return self.parse_call(ident)
            return ident
        raise DSLSyntaxError(
            f"Unexpected token {tok.value!r} at {tok.pos} in feature expression"
        )

    def parse_identifier(self) -> Union[Identifier, AllColumns]:
        parts = [self.advance().value]
        while (
            self.peek().kind == "OP"
            and self.peek().value == "."
            and self.tokens[self.i + 1].kind == "NAME"
        ):
            self.advance()  # '.'
            parts.append(self.advance().value)
        if (
            self.peek().kind == "OP"
            and self.peek().value == "."
            and self.tokens[self.i + 1].kind == "OP"
            and self.tokens[self.i + 1].value == "*"
        ):
            self.advance()  # '.'
            self.advance()  # '*'
            return AllColumns(tuple(parts))
        return Identifier(tuple(parts))

    def parse_call(self, func: Identifier) -> Call:
        self.expect_op("(")
        args: list[FeatureExpr] = []
        kwargs: list[tuple[str, FeatureExpr]] = []
        if not (self.peek().kind == "OP" and self.peek().value == ")"):
            while True:
                # kwarg form: NAME '=' expr (but not NAME '==' ...)
                if (
                    self.peek().kind == "NAME"
                    and self.tokens[self.i + 1].kind == "OP"
                    and self.tokens[self.i + 1].value == "="
                ):
                    key = self.advance().value
                    self.advance()  # '='
                    kwargs.append((key, self.parse_expr()))
                else:
                    args.append(self.parse_expr())
                if not self.accept_op(","):
                    break
        self.expect_op(")")
        return Call(func, tuple(args), tuple(kwargs))


def _to_number(text: str) -> Union[int, float]:
    return float(text) if ("." in text or "e" in text or "E" in text) else int(text)


def parse_feature_expr(text: str) -> FeatureExpr:
    """Parse a standalone feature expression string into an AST."""
    tokens = tokenize(text)
    parser = _ExprParser(tokens)
    node = parser.parse_expr()
    if parser.peek().kind != "EOF":
        tok = parser.peek()
        raise DSLSyntaxError(
            f"Trailing input {tok.value!r} at {tok.pos} in feature expression"
        )
    return node


def feature_to_spark_sql(text: str) -> str:
    """Compile a canonical feature string to a Spark SQL expression."""
    return parse_feature_expr(text).to_spark_sql()
