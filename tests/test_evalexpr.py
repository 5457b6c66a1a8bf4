"""eval expression translation tests — muParser grammar → Spark SQL."""

from __future__ import annotations

import pytest

from akumuli_spark.query.errors import QueryValidationError
from akumuli_spark.query.evalexpr import translate
from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.plan import parse_timestamp_ns
from akumuli_spark.sources.testdata import metrics_view
from tests.conftest import SF_DIR

T96 = parse_timestamp_ns("19960101T000000")
T97 = parse_timestamp_ns("19970101T000000")


def test_power_is_right_associative():
    assert translate("a ^ b ^ c") == "power(`a`, power(`b`, `c`))"


def test_power_not_xor():
    assert "power" in translate("_var_0 ^ 2")


def test_precedence():
    assert translate("a + b * c") == "(`a` + (`b` * `c`))"
    assert translate("(a + b) * c") == "((`a` + `b`) * `c`)"
    assert translate("-a ^ 2") == "power((- `a`), CAST(2 AS DOUBLE))"


def test_functions_pass_through():
    assert translate("sqrt(a) + log(b)") == "(sqrt(`a`) + log(`b`))"
    assert translate("min(a, b, 2)") == "least(`a`, `b`, CAST(2 AS DOUBLE))"
    assert translate("max(a, b)") == "greatest(`a`, `b`)"


def test_column_substitution_is_token_level():
    # metric 'x' is a substring of function 'max' — must not corrupt the call
    assert (
        translate("max(x, 2)", columns={"x": "_var_0"})
        == "greatest(`_var_0`, CAST(2 AS DOUBLE))"
    )
    # dotted metric names substitute as whole identifiers
    assert (
        translate("a.b + a.b.c", columns={"a.b": "_var_0", "a.b.c": "_var_1"})
        == "(`_var_0` + `_var_1`)"
    )
    # a metric literally named '_var_1' doesn't cascade into another's slot
    assert (
        translate("_var_1 + q", columns={"_var_1": "_var_0", "q": "_var_1"})
        == "(`_var_0` + `_var_1`)"
    )
    # function-position identifiers are never substituted
    assert (
        translate("min(min, 2)", columns={"min": "_var_0"})
        == "least(`_var_0`, CAST(2 AS DOUBLE))"
    )


def test_comparison_logical_ternary_grammar():
    # comparisons emit 1.0/0.0 doubles, muParser-style
    assert (
        translate("a < b")
        == "(CASE WHEN (`a`) < (`b`) THEN 1.0D ELSE 0.0D END)"
    )
    assert "(`a`) = (CAST(1 AS DOUBLE))" in translate("a == 1")
    assert "(`a`) <> (`b`)" in translate("a != b")
    # precedence: cmp binds tighter than &&, && tighter than ||
    t = translate("a < b && c_x || d")
    assert t.index("<") < t.index("AND") < t.index("OR")
    # arithmetic binds tighter than comparison: 1 + 2 < 4 ^ 0.5
    t = translate("1 + 2 < 4 ^ 0.5")
    assert ("((CAST(1 AS DOUBLE) + CAST(2 AS DOUBLE))) < (power(CAST(4 AS DOUBLE), CAST(0.5 AS DOUBLE)))" in t)
    # ternary: lazy CASE WHEN, right-associative else-branch nesting
    t = translate("a ? b : c ? d : e")
    assert t == (
        "(CASE WHEN (`a`) <> 0.0D THEN `b` "
        "ELSE (CASE WHEN (`c`) <> 0.0D THEN `d` ELSE `e` END) END)"
    )
    # condition may be any expression; then-branch may nest a ternary
    t = translate("a > 0.5 ? 1 : 0")
    assert t.startswith("(CASE WHEN ((CASE WHEN (`a`) > (CAST(0.5 AS DOUBLE))")
    t = translate("a ? b ? c : d : e")
    assert t.endswith("ELSE `e` END)")


def test_variadic_sum_avg():
    assert translate("sum(a, b, 2)") == "(`a` + `b` + CAST(2 AS DOUBLE))"
    assert translate("avg(a, b)") == "((`a` + `b`) / 2.0D)"
    assert translate("avg(a, b, c_x, 1)") == "((`a` + `b` + `c_x` + CAST(1 AS DOUBLE)) / 4.0D)"


def test_non_identifier_metric_names_pre_substituted():
    # 'cpu-total' tokenizes as three tokens; the literal pre-substitution
    # (reference replace_all parity) must map it before parsing
    assert (
        translate("cpu-total * 2", columns={"cpu-total": "_var_0"})
        == "(`_var_0` * CAST(2 AS DOUBLE))"
    )
    # longest-first: 'cpu-total-max' must not be eaten by 'cpu-total'
    assert (
        translate(
            "cpu-total-max + cpu-total",
            columns={"cpu-total": "_var_0", "cpu-total-max": "_var_1"},
        )
        == "(`_var_1` + `_var_0`)"
    )


def test_rejects_garbage():
    with pytest.raises(QueryValidationError):
        translate("a + ")
    with pytest.raises(QueryValidationError):
        translate("system('rm')")
    with pytest.raises(QueryValidationError):
        translate("a ; b")


def test_eval_power_end_to_end(spark):
    m = metrics_view(spark, SF_DIR)
    rows = execute_query(
        spark,
        {
            "join": ["lineitem.qty", "lineitem.disc"],
            "range": {"from": T96, "to": T96 + 30 * 86400 * 10**9},
            "apply": [{"name": "eval", "expr": "lineitem.disc ^ 2 + lineitem.qty"}],
        },
        m,
    ).limit(500).collect()
    assert rows
    # spot-check: value must equal disc² + qty, never disc XOR 2
    base = execute_query(
        spark,
        {
            "join": ["lineitem.qty", "lineitem.disc"],
            "range": {"from": T96, "to": T96 + 30 * 86400 * 10**9},
        },
        m,
    ).collect()
    expected = {
        (r["series"].replace("lineitem.qty|lineitem.disc", "x"), r["ts_ns"]):
            r["lineitem.disc"] ** 2 + r["lineitem.qty"]
        for r in base
    }
    for r in rows:
        key = (r["series"].replace("lineitem.qty|lineitem.disc", "x"), r["ts_ns"])
        assert r["value"] == pytest.approx(expected[key], rel=1e-12)


def test_translate_property_random_expressions():
    """Property: for random arithmetic expressions over variables, the
    translated Spark SQL evaluates (via a Python re-evaluation of the
    emitted SQL grammar) to the same value as a direct muParser-semantics
    interpreter on the source."""
    import math
    import random

    rng = random.Random(20260813)
    env = {"a": 2.5, "b": -1.25, "c_x": 4.0, "m.v": 0.5}
    colmap = {k: f"_var_{i}" for i, k in enumerate(env)}
    varenv = {colmap[k]: v for k, v in env.items()}

    def gen(depth=0):
        r = rng.random()
        if depth > 3 or r < 0.3:
            return rng.choice(
                [str(rng.randint(0, 9)), "a", "b", "c_x", "m.v",
                 f"{rng.randint(1, 99) / 10}"]
            )
        if r < 0.75:
            op = rng.choice(["+", "-", "*", "/", "^"])
            return f"({gen(depth + 1)} {op} {gen(depth + 1)})"
        fn = rng.choice(["sqrt", "abs", "max", "min", "exp"])
        if fn in ("max", "min"):
            return f"{fn}({gen(depth + 1)}, {gen(depth + 1)})"
        return f"{fn}({gen(depth + 1)})"

    def ev_mu(e):
        # muParser semantics on the source: ^ is power. Substitute variable
        # values on identifier boundaries only (a bare str.replace would
        # rewrite the 'a' inside 'max') and parenthesize them (textual
        # '-1.25 ** 2' would bind as -(1.25**2), unlike a variable ref).
        import re

        py = e.replace("^", "**")
        for name in sorted(env, key=len, reverse=True):
            py = re.sub(
                rf"(?<![A-Za-z0-9_.]){re.escape(name)}(?![A-Za-z0-9_.])",
                f"({env[name]!r})",
                py,
            )
        return eval(py, {"sqrt": lambda x: math.sqrt(abs(x)) if x < 0 else math.sqrt(x),
                         "abs": abs, "max": max, "min": min, "exp": math.exp})

    def ev_sql(e):
        # evaluate the emitted SQL grammar in python; the explicit
        # double-literal casts (CAST(x AS DOUBLE)) become plain parens —
        # Python floats ARE doubles
        import re as _re

        py = (e.replace("`", "")
              .replace("power", "__pow")
              .replace("greatest", "max").replace("least", "min"))
        py = _re.sub(r"CAST\(([^()]*) AS DOUBLE\)", r"(\1)", py)
        return eval(py, {"__pow": lambda x, y: x ** y, "abs": abs,
                         "max": max, "min": min,
                         "exp": math.exp,
                         "sqrt": lambda x: math.sqrt(abs(x)) if x < 0 else math.sqrt(x),
                         **varenv})

    checked = 0
    for _ in range(300):
        src = gen()
        try:
            expected = ev_mu(src)
        except (ZeroDivisionError, OverflowError, ValueError, TypeError):
            # TypeError: negative base ** fractional exponent yields a Python
            # complex, which the math.* shims reject (muParser emits NaN) —
            # out of the property's domain, skip like the other domain errors.
            continue
        got = ev_sql(translate(src, columns=colmap))
        if isinstance(expected, complex) or isinstance(got, complex):
            continue
        assert got == pytest.approx(expected, rel=1e-12, abs=1e-12), src
        checked += 1
    assert checked > 150


def test_full_grammar_property_against_spark(spark):
    """Property over the FULL muParser grammar (comparisons, && ||, ?:,
    variadic sum/avg, power): translate's emitted SQL — evaluated by
    Spark itself in one wide SELECT — must match an independent
    muParser-semantics interpreter over the source expression."""
    import math
    import random

    rng = random.Random(20260814)
    env = {"a": 2.5, "b": -1.25, "c_x": 4.0, "m.v": 0.5}
    colmap = {k: f"_var_{i}" for i, k in enumerate(env)}

    def gen(depth=0):
        r = rng.random()
        if depth >= 3:
            return rng.choice(["a", "b", "c_x", "m.v",
                               str(rng.randint(0, 9)),
                               f"{rng.randint(1, 99) / 10}"])
        if r < 0.30:
            op = rng.choice(["+", "-", "*", "/", "^"])
            return f"({gen(depth + 1)} {op} {gen(depth + 1)})"
        if r < 0.50:
            op = rng.choice(["<", ">", "<=", ">=", "==", "!="])
            return f"({gen(depth + 1)} {op} {gen(depth + 1)})"
        if r < 0.62:
            op = rng.choice(["&&", "||"])
            return f"({gen(depth + 1)} {op} {gen(depth + 1)})"
        if r < 0.74:
            return f"({gen(depth + 1)} ? {gen(depth + 1)} : {gen(depth + 1)})"
        if r < 0.86:
            fn = rng.choice(["sum", "avg", "min", "max"])
            k = rng.randint(2, 3)
            return f"{fn}({', '.join(gen(depth + 1) for _ in range(k))})"
        fn = rng.choice(["sqrt", "abs", "exp"])
        return f"{fn}({gen(depth + 1)})"

    # independent interpreter: tokenizing recursive descent with muParser
    # precedence, evaluating DIRECTLY to floats (no SQL, no translate)
    import re as _re

    def interp(src):
        toks = _re.findall(
            r"\d+\.\d+|\d+|[A-Za-z_][A-Za-z0-9_.]*|<=|>=|==|!=|&&|\|\||[-+*/^()?:,<>]",
            src,
        )
        pos = [0]

        def peek():
            return toks[pos[0]] if pos[0] < len(toks) else None

        def take():
            t = peek(); pos[0] += 1; return t

        def ternary():
            c = lor()
            if peek() == "?":
                take(); t = ternary()
                assert take() == ":"
                e = ternary()
                return t if c != 0.0 else e
            return c

        def lor():
            v = land()
            while peek() == "||":
                take(); r = land()
                v = 1.0 if (v != 0.0 or r != 0.0) else 0.0
            return v

        def land():
            v = cmp_()
            while peek() == "&&":
                take(); r = cmp_()
                v = 1.0 if (v != 0.0 and r != 0.0) else 0.0
            return v

        def cmp_():
            v = add()
            while peek() in ("<", ">", "<=", ">=", "==", "!="):
                op = take(); r = add()
                v = 1.0 if {"<": v < r, ">": v > r, "<=": v <= r,
                            ">=": v >= r, "==": v == r, "!=": v != r}[op] else 0.0
            return v

        def add():
            v = mul()
            while peek() in ("+", "-"):
                op = take(); r = mul()
                v = v + r if op == "+" else v - r
            return v

        def mul():
            v = factor()
            while peek() in ("*", "/"):
                op = take(); r = factor()
                v = v * r if op == "*" else v / r
            return v

        def factor():
            v = unary()
            if peek() == "^":
                take()
                return v ** factor()
            return v

        def unary():
            if peek() == "-":
                take(); return -unary()
            return primary()

        def primary():
            t = take()
            if t == "(":
                v = ternary(); assert take() == ")"; return v
            if _re.fullmatch(r"\d+(\.\d+)?", t):
                return float(t)
            if t in env:
                return float(env[t])
            args = [ternary()] if take() == "(" else None
            while peek() == ",":
                take(); args.append(ternary())
            assert take() == ")"
            return {
                "sqrt": lambda a: math.sqrt(a[0]),
                "abs": lambda a: abs(a[0]),
                "exp": lambda a: math.exp(a[0]),
                "min": lambda a: min(a), "max": lambda a: max(a),
                "sum": lambda a: sum(a), "avg": lambda a: sum(a) / len(a),
            }[t](args)

        v = ternary()
        assert peek() is None
        return v

    cases = []
    while len(cases) < 300:
        src = gen()
        try:
            expected = interp(src)
        except (ZeroDivisionError, OverflowError, ValueError, TypeError):
            # TypeError: negative base ** fractional exponent yields a
            # Python complex mid-interpretation — outside the property's
            # real-number domain, skip like the other domain errors
            continue
        if isinstance(expected, complex) or math.isnan(expected) or math.isinf(expected):
            continue
        sql = translate(src, columns=colmap)
        for k, v in colmap.items():
            sql = sql.replace(f"`{v}`", f"(CAST({env[k]!r} AS DOUBLE))")
        cases.append((src, sql, expected))

    row = spark.sql(
        "SELECT " + ", ".join(f"CAST(({sql}) AS DOUBLE) AS c{i}"
                              for i, (_, sql, _e) in enumerate(cases))
    ).collect()[0]
    for i, (src, _sql, expected) in enumerate(cases):
        got = row[f"c{i}"]
        assert got == pytest.approx(expected, rel=1e-9, abs=1e-9), src
