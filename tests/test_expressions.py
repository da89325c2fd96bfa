"""Expressions-module compiler (``expressions/js/Javascript.g4``,
``JavascriptCompiler.properties``) — reference syntax → portable SQL."""

import math

import pytest

from lucene_spark.search.expressions import (
    ExpressionError,
    compile_expression,
    expression_score,
)


def _eval(expr, bindings=None, **cols):
    """Evaluate a compiled expression through DuckDB on one row."""
    import duckdb

    sql = compile_expression(expr, bindings)
    names = ", ".join(f"{v} AS {k}" for k, v in cols.items()) or "1 AS _x"
    return duckdb.sql(f"SELECT {sql} AS v FROM (SELECT {names})").fetchone()[0]


def test_arithmetic_and_precedence():
    assert _eval("1 + 2 * 3") == 7.0
    assert _eval("(1 + 2) * 3") == 9.0
    assert _eval("-2 * 3") == -6.0
    assert _eval("7 % 4") == 3.0
    assert _eval("0x10 + 010") == 24.0  # hex + octal literals


def test_functions():
    assert _eval("sqrt(16)") == 4.0
    assert _eval("min(3, max(1, 2))") == 2.0
    assert _eval("abs(0 - 5)") == 5.0
    assert _eval("ln(exp(1))") == pytest.approx(1.0)
    assert _eval("logn(2, 8)") == pytest.approx(3.0)
    assert _eval("pow(2, 10)") == 1024.0


def test_comparisons_logic_ternary():
    assert _eval("3 > 2") == 1.0
    assert _eval("3 <= 2") == 0.0
    assert _eval("1 && 0") == 0.0
    assert _eval("1 || 0") == 1.0
    assert _eval("!0") == 1.0
    assert _eval("5 > 4 ? 10 : 20") == 10.0
    # right-associative nesting
    assert _eval("0 ? 1 : 0 ? 2 : 3") == 3.0


def test_variables_and_bindings():
    assert _eval("x * 2 + y", x=3, y=1) == 7.0
    assert (
        _eval("popularity + 1", bindings={"popularity": "n"}, n=4) == 5.0
    )


def test_ieee_special_values():
    """Java's all-double model survives SQL: x/0 = ±Infinity (0/0 NaN),
    sqrt/ln of out-of-domain inputs = NaN / -Infinity instead of SQL
    NULLs or errors."""
    assert _eval("1 / 0") == float("inf")
    assert _eval("(0 - 1) / 0") == float("-inf")
    assert math.isnan(_eval("0 / 0"))
    assert math.isnan(_eval("sqrt(0 - 4)"))
    assert _eval("ln(0)") == float("-inf")
    assert math.isnan(_eval("ln(0 - 1)"))


def test_errors():
    with pytest.raises(ExpressionError):
        compile_expression("sqrt(1, 2)")  # arity
    with pytest.raises(ExpressionError):
        compile_expression("nosuchfn(1)")
    with pytest.raises(ExpressionError):
        compile_expression("1 +")
    with pytest.raises(ExpressionError):
        compile_expression("haversin(1,2,3,4)")  # geo out of scope


def test_expression_score_end_to_end(spark):
    docs = spark.createDataFrame(
        [(0, 100), (1, 400), (2, 900)], "doc_id long, n long"
    )
    rows = expression_score(
        docs, "sqrt(n) + (doc_id == 2 ? 100 : 0)", k=3
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (2, 130.0),
        (1, 20.0),
        (0, 10.0),
    ]
