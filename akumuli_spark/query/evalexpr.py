"""muParser-compatible expression translation for the ``eval`` node.

The reference evaluates ``eval`` expressions with muParser
(/root/reference/libakumuli/query_processing/eval.cpp:36-205, dependency
at CMakeLists.txt:127).  muParser's grammar differs from Spark SQL in one
load-bearing way: ``^`` is **power** (right-associative), while in Spark
SQL it is bitwise XOR.  Passing the raw string to ``F.expr`` would
silently compute the wrong thing, so we parse the muParser grammar and
re-emit Spark SQL.  Stock muParser (as embedded, eval.cpp:90-92 /
muParserBase.cpp InitOprt) also ships comparison, logical, and ternary
operators; precedence mirrors its table (prIF=0 < prLOR=1 < prLAND=2 <
prCMP=4 < prADD=5 < prMUL=6 < prPOW=7, ``^`` right-associative):

    expr    := lor ('?' expr ':' expr)?     # ternary, right-assoc, lazy
    lor     := land ('||' land)*
    land    := cmp  ('&&' cmp)*
    cmp     := sum  (('<'|'>'|'<='|'>='|'=='|'!=') sum)*   # all prCMP
    sum     := term  (('+' | '-') term)*
    term    := factor (('*' | '/') factor)*
    factor  := unary ('^' factor)?          # right-assoc power → power()
    unary   := '-'* primary
    primary := number | identifier | ident '(' expr (',' expr)* ')'
             | '(' expr ')'

Booleans are doubles, as in muParser: comparisons emit 1.0/0.0, ``&&`` /
``||`` / ``?:`` treat any non-zero operand as true.  (NaN nuance: Spark
SQL orders NaN greatest and NaN == NaN true — IEEE/C++ muParser says
false; both SQL engines in the oracle pair agree with each other, which
is what the correctness gate measures.)

Identifiers are metric-column placeholders (``_var_i`` after the rename in
apply._node_eval) or math function names; function calls pass through by
name (sin/cos/log/exp/sqrt/abs/min/max/... exist in both muParser and
Spark SQL); variadic ``sum``/``avg`` expand to chained ``+`` (and a
literal divisor), matching muParser's multi-arg builtins.
"""

from __future__ import annotations

import re

from akumuli_spark.query.errors import QueryValidationError

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z0-9_]+)*)"
    r"|(?P<op><=|>=|==|!=|&&|\|\||[-+*/^(),<>?:]))"
)

#: muParser builtins that exist in Spark SQL under the same name
_ALLOWED_FUNCS = {
    "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
    "asinh", "acosh", "atanh",
    "ln", "log", "log2", "log10", "exp", "sqrt", "abs", "min", "max",
    "sign", "rint", "sum", "avg",
}

_CMP_OPS = {"<": "<", ">": ">", "<=": "<=", ">=": ">=", "==": "=", "!=": "<>"}


def _tokenize(text: str) -> list[str]:
    tokens = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            rest = text[pos:].strip()
            if not rest:
                break
            raise QueryValidationError(f"eval: bad token at {rest[:20]!r}")
        tokens.append(m.group(m.lastgroup))
        pos = m.end()
    return tokens


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        tok = self.peek()
        if tok is None:
            raise QueryValidationError("eval: unexpected end of expression")
        self.i += 1
        return tok

    def expr(self) -> str:
        # ternary if-then-else: lowest precedence, right-associative, lazy
        # (muParser cmIF/cmELSE, prIF=0; condition true iff != 0) — CASE WHEN
        # shares the conditional-evaluation semantics.
        cond = self.lor()
        if self.peek() == "?":
            self.take()
            then = self.expr()
            if self.take() != ":":
                raise QueryValidationError("eval: expected ':' in '?:'")
            other = self.expr()
            return (
                f"(CASE WHEN ({cond}) <> 0.0D THEN {then} ELSE {other} END)"
            )
        return cond

    def lor(self) -> str:
        out = self.land()
        while self.peek() == "||":
            self.take()
            rhs = self.land()
            out = (
                f"(CASE WHEN (({out}) <> 0.0D) OR (({rhs}) <> 0.0D) "
                "THEN 1.0D ELSE 0.0D END)"
            )
        return out

    def land(self) -> str:
        out = self.cmp()
        while self.peek() == "&&":
            self.take()
            rhs = self.cmp()
            out = (
                f"(CASE WHEN (({out}) <> 0.0D) AND (({rhs}) <> 0.0D) "
                "THEN 1.0D ELSE 0.0D END)"
            )
        return out

    def cmp(self) -> str:
        # all six comparisons share prCMP=4, left-assoc; booleans are doubles
        out = self.addsub()
        while self.peek() in _CMP_OPS:
            op = _CMP_OPS[self.take()]
            out = (
                f"(CASE WHEN ({out}) {op} ({self.addsub()}) "
                "THEN 1.0D ELSE 0.0D END)"
            )
        return out

    def addsub(self) -> str:
        out = self.term()
        while self.peek() in ("+", "-"):
            op = self.take()
            out = f"({out} {op} {self.term()})"
        return out

    def term(self) -> str:
        out = self.factor()
        while self.peek() in ("*", "/"):
            op = self.take()
            out = f"({out} {op} {self.factor()})"
        return out

    def factor(self) -> str:
        base = self.unary()
        if self.peek() == "^":
            self.take()
            # right-associative like muParser
            return f"power({base}, {self.factor()})"
        return base

    def unary(self) -> str:
        if self.peek() == "-":
            self.take()
            return f"(- {self.unary()})"
        if self.peek() == "+":
            self.take()
            return self.unary()
        return self.primary()

    def primary(self) -> str:
        tok = self.take()
        if tok == "(":
            inner = self.expr()
            if self.take() != ")":
                raise QueryValidationError("eval: expected ')'")
            return inner
        if re.fullmatch(r"\d.*", tok):
            # typed as DOUBLE explicitly: Spark parses a bare `3.25` as
            # DECIMAL(3,2) and `1` as INT, so a literal-literal division
            # like `1/3.25` would round at DECIMAL scale 6 (0.307692)
            # where muParser computes in double end-to-end (eval.cpp
            # literals are doubles) — caught by the hypothesis
            # mini-evaluator sweep
            return f"CAST({tok} AS DOUBLE)"
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", tok):
            if self.peek() == "(":
                if tok.lower() not in _ALLOWED_FUNCS:
                    raise QueryValidationError(f"eval: unknown function {tok!r}")
                self.take()
                args = [self.expr()]
                while self.peek() == ",":
                    self.take()
                    args.append(self.expr())
                if self.take() != ")":
                    raise QueryValidationError("eval: expected ')'")
                low = tok.lower()
                # muParser's multi-arg builtins (muParser Sum/Avg/Min/Max):
                # sum/avg have no scalar SQL variadic — expand to chained '+'
                if low == "sum":
                    return f"({' + '.join(args)})"
                if low == "avg":
                    return f"(({' + '.join(args)}) / {float(len(args))}D)"
                # muParser min/max are variadic; Spark's least/greatest match
                name = {"min": "least", "max": "greatest"}.get(low, tok)
                return f"{name}({', '.join(args)})"
            return f"`{tok}`"
        raise QueryValidationError(f"eval: unexpected token {tok!r}")


def translate(expr: str, columns: dict[str, str] | None = None) -> str:
    """muParser expression → Spark SQL expression string.

    ``columns`` maps source column names (metric names, may contain dots)
    to safe substitute identifiers.  Substitution happens on whole
    identifier tokens in a single pass — the reference's ``_var_i``
    rewrite (eval.cpp:52-76) over exact variable positions, immune to
    substring collisions (a metric ``x`` never corrupts ``max(x, 2)``) —
    except in function-call position (an identifier followed by ``(``),
    which stays a function name.

    Metric names that don't tokenize as one identifier (``cpu-total``,
    ``disk io``) are pre-substituted literally, longest name first — the
    only semantics the reference's textual replace_all ever gave them.
    """
    if columns:
        literal = {
            k: v for k, v in columns.items()
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z0-9_]+)*", k)
        }
        for name in sorted(literal, key=len, reverse=True):
            expr = expr.replace(name, literal[name])
    tokens = _tokenize(expr)
    if columns:
        renamed = []
        for i, tok in enumerate(tokens):
            nxt = tokens[i + 1] if i + 1 < len(tokens) else None
            if tok in columns and nxt != "(":
                renamed.append(columns[tok])
            else:
                renamed.append(tok)
        tokens = renamed
    p = _Parser(tokens)
    out = p.expr()
    if p.peek() is not None:
        raise QueryValidationError(f"eval: trailing tokens at {p.toks[p.i:]}")
    return out
