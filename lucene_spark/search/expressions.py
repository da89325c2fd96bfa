"""The expressions module's scoring language
(``expressions/js/Javascript.g4``, ``JavascriptCompiler.java``,
``JavascriptCompiler.properties``): compile the reference's
JavaScript-like expression syntax into a portable SQL expression that
Spark's Catalyst (and the DuckDB oracle) evaluates — Catalyst IS the
compiled-expression engine, so "compilation" here is translation.

Semantics follow the reference's all-double model:

* every value is a double; integer/hex/octal literals load as doubles;
* comparison (``< <= > >= == !=``) and logical (``! && ||``) operators
  yield 1.0/0.0, with "true" meaning ≠ 0 (the compiled bytecode's
  convention);
* ``cond ? a : b`` tests cond ≠ 0 (right-associative);
* bitwise ``& | ^ ~ << >> >>>`` operate on the long cast of their
  operands and return doubles — these translate to SPARK-dialect SQL
  (shiftleft/shiftrightunsigned, ``^`` as xor); DuckDB reads ``^`` as
  power and lacks the shift functions, so expressions using the bitwise
  family are engine-side only (not oracle-portable, documented);
* IEEE special values: division by zero restores Java's ±Infinity/NaN
  (SQL would NULL it), sqrt/ln/log10/logn guard their out-of-domain
  inputs to NaN/−Infinity (DuckDB would raise).  Residual envelope:
  negative zero loses its sign through SQL comparisons, and NaN
  compared with anything follows SQL ordering (NaN sorts greatest)
  rather than Java's always-false comparisons;
* the default function table (``JavascriptCompiler.properties``): abs,
  ceil/floor, exp/ln/log10/logn, pow/sqrt, min/max, the trig/hyperbolic
  family.  ``haversin*`` is geo and out of scope (raises).

Precedence mirrors the ANTLR grammar (:29-44): unary > muldiv > addsub
> shift > comparison > equality > bwand > bwxor > bwor > booland >
boolor > conditional.
"""

from __future__ import annotations

import re

_INF = "CAST('Infinity' AS DOUBLE)"
_NINF = "CAST('-Infinity' AS DOUBLE)"
_NAN = "CAST('NaN' AS DOUBLE)"

# Java's out-of-domain results, which SQL either NULLs or raises on:
# sqrt(<0) = NaN; ln/log10(0) = -Inf, (<0) = NaN (DuckDB would error)
_SQRT = f"(CASE WHEN ({{0}}) < 0 THEN {_NAN} ELSE sqrt({{0}}) END)"
_LN = (
    f"(CASE WHEN ({{0}}) > 0 THEN ln({{0}}) "
    f"WHEN ({{0}}) = 0 THEN {_NINF} ELSE {_NAN} END)"
)
_LOG10 = (
    f"(CASE WHEN ({{0}}) > 0 THEN log10({{0}}) "
    f"WHEN ({{0}}) = 0 THEN {_NINF} ELSE {_NAN} END)"
)

# name -> (sql template, arity); {0}/{1} are operand slots
_FUNCTIONS: dict[str, tuple[str, int]] = {
    "abs": ("abs({0})", 1),
    "acos": ("acos({0})", 1),
    "acosh": ("acosh({0})", 1),
    "asin": ("asin({0})", 1),
    "asinh": ("asinh({0})", 1),
    "atan": ("atan({0})", 1),
    "atan2": ("atan2({0}, {1})", 2),
    "atanh": ("atanh({0})", 1),
    "ceil": ("ceil({0})", 1),
    "cos": ("cos({0})", 1),
    "cosh": ("cosh({0})", 1),
    "exp": ("exp({0})", 1),
    "floor": ("floor({0})", 1),
    "ln": (_LN, 1),
    "log10": (_LOG10, 1),
    # MathUtil.log(base, x) = ln(x)/ln(base)
    "logn": (f"({_LN.replace('{0}', '{1}')} / {_LN})", 2),
    "max": ("greatest({0}, {1})", 2),
    "min": ("least({0}, {1})", 2),
    "pow": ("power({0}, {1})", 2),
    "sin": ("sin({0})", 1),
    "sinh": ("sinh({0})", 1),
    "sqrt": (_SQRT, 1),
    "tan": ("tan({0})", 1),
    "tanh": ("tanh({0})", 1),
}

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>0x[0-9a-fA-F]+|0[0-7]+|\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+)"
    r"|(?P<var>[_$A-Za-z][_$A-Za-z0-9]*(?:\.[_$A-Za-z][_$A-Za-z0-9]*)*)"
    r"|(?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()!~&^|?:,<>]))"
)


class ExpressionError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            j = i
            while j < len(text) and text[j].isspace():
                j += 1
            if j >= len(text):
                break
            raise ExpressionError(f"unexpected character at {j}: {text[j]!r}")
        i = m.end()
        for kind in ("num", "var", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("end", ""))
    return out


def _num_sql(text: str) -> str:
    if text.startswith(("0x", "0X")):
        v = int(text, 16)
    elif re.fullmatch(r"0[0-7]+", text):
        v = int(text, 8)
    else:
        return f"CAST({text} AS DOUBLE)"
    return f"CAST({v} AS DOUBLE)"


def _bool(sql_cond: str) -> str:
    return f"(CASE WHEN {sql_cond} THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)"


def _truthy(sql: str) -> str:
    return f"({sql}) <> 0"


class _Parser:
    """Pratt parser over the grammar's precedence ladder, emitting SQL."""

    # binary precedence levels, loosest first (grammar :33-44)
    _LEVELS = [
        ("||",),
        ("&&",),
        ("|",),
        ("^",),
        ("&",),
        ("==", "!="),
        ("<", "<=", ">", ">="),
        ("<<", ">>", ">>>"),
        ("+", "-"),
        ("*", "/", "%"),
    ]

    def __init__(self, tokens, bindings):
        self.toks = tokens
        self.i = 0
        self.bindings = bindings

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, op):
        kind, v = self.next()
        if kind != "op" or v != op:
            raise ExpressionError(f"expected {op!r}, got {v!r}")

    def parse(self) -> str:
        sql = self.conditional()
        if self.peek()[0] != "end":
            raise ExpressionError(f"trailing input: {self.peek()[1]!r}")
        return sql

    def conditional(self) -> str:
        cond = self.level(0)
        if self.peek() == ("op", "?"):
            self.next()
            a = self.conditional()
            self.expect(":")
            b = self.conditional()
            return f"(CASE WHEN {_truthy(cond)} THEN {a} ELSE {b} END)"
        return cond

    def level(self, n: int) -> str:
        if n >= len(self._LEVELS):
            return self.unary()
        ops = self._LEVELS[n]
        left = self.level(n + 1)
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.next()[1]
            right = self.level(n + 1)
            left = self._binary(op, left, right)
        return left

    @staticmethod
    def _long(sql: str) -> str:
        return f"CAST({sql} AS BIGINT)"

    def _binary(self, op: str, a: str, b: str) -> str:
        if op == "/":
            # Java doubles: x/0 = ±Infinity (0/0 = NaN); SQL NULLs it —
            # restore the IEEE results (negative-zero sign is lost, the
            # one documented residual)
            return (
                f"(CASE WHEN ({b}) = 0 THEN "
                f"(CASE WHEN ({a}) > 0 THEN {_INF} "
                f"WHEN ({a}) < 0 THEN {_NINF} ELSE {_NAN} END) "
                f"ELSE ({a} / {b}) END)"
            )
        if op in ("+", "-", "*"):
            return f"({a} {op} {b})"
        if op == "%":
            # Java's fmod on doubles: SQL's % matches for the finite cases
            return f"({a} % {b})"
        if op in ("<", "<=", ">", ">="):
            return _bool(f"({a}) {op} ({b})")
        if op == "==":
            return _bool(f"({a}) = ({b})")
        if op == "!=":
            return _bool(f"({a}) <> ({b})")
        if op == "&&":
            return _bool(f"{_truthy(a)} AND {_truthy(b)}")
        if op == "||":
            return _bool(f"{_truthy(a)} OR {_truthy(b)}")
        if op == "&":
            return f"CAST({self._long(a)} & {self._long(b)} AS DOUBLE)"
        if op == "|":
            return f"CAST({self._long(a)} | {self._long(b)} AS DOUBLE)"
        if op == "^":
            return f"CAST(({self._long(a)} ^ {self._long(b)}) AS DOUBLE)"
        if op == "<<":
            return f"CAST(shiftleft({self._long(a)}, CAST({b} AS INT)) AS DOUBLE)"
        if op == ">>":
            return f"CAST(shiftright({self._long(a)}, CAST({b} AS INT)) AS DOUBLE)"
        if op == ">>>":
            return (
                f"CAST(shiftrightunsigned({self._long(a)}, CAST({b} AS INT)) "
                "AS DOUBLE)"
            )
        raise ExpressionError(f"unsupported operator {op!r}")

    def unary(self) -> str:
        kind, v = self.peek()
        if kind == "op" and v in ("!", "~", "+", "-"):
            self.next()
            operand = self.unary()
            if v == "!":
                return _bool(f"NOT {_truthy(operand)}")
            if v == "~":
                return f"CAST(~{self._long(operand)} AS DOUBLE)"
            if v == "+":
                return operand
            return f"(-{operand})"
        return self.primary()

    def primary(self) -> str:
        kind, v = self.next()
        if kind == "num":
            return _num_sql(v)
        if kind == "op" and v == "(":
            inner = self.conditional()
            self.expect(")")
            return inner
        if kind == "var":
            if self.peek() == ("op", "("):
                return self.call(v)
            if v.startswith("haversin"):
                raise ExpressionError("haversin* is geo — out of scope")
            binding = self.bindings.get(v, v)
            return f"CAST({binding} AS DOUBLE)"
        raise ExpressionError(f"unexpected token {v!r}")

    def call(self, name: str) -> str:
        if name.startswith("haversin"):
            raise ExpressionError("haversin* is geo — out of scope")
        if name not in _FUNCTIONS:
            raise ExpressionError(f"unknown function {name!r}")
        template, arity = _FUNCTIONS[name]
        self.expect("(")
        args = [self.conditional()]
        while self.peek() == ("op", ","):
            self.next()
            args.append(self.conditional())
        self.expect(")")
        if len(args) != arity:
            raise ExpressionError(
                f"{name} expects {arity} argument(s), got {len(args)}"
            )
        return template.format(*args)


def compile_expression(text: str, bindings: dict[str, str] | None = None) -> str:
    """Compile a reference-syntax expression to a portable SQL expression
    string.  ``bindings`` maps expression variables to SQL column
    expressions (an unbound variable passes through as its own name —
    ``fromField``-style direct column access)."""
    return _Parser(_tokenize(text), bindings or {}).parse()


def expression_score(docs, text: str, bindings: dict[str, str] | None = None,
                     k: int | None = None):
    """FunctionScoreQuery with a compiled expression: rank docs by the
    expression over their doc-values columns."""
    from lucene_spark.search.collectors import function_score

    return function_score(docs, compile_expression(text, bindings), k=k)
