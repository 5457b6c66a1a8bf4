"""muParser-compatible expression translation for the ``eval`` node.

The reference evaluates ``eval`` expressions with muParser
(/root/reference/libakumuli/query_processing/eval.cpp:36-205, dependency
at CMakeLists.txt:127).  muParser's grammar differs from Spark SQL in one
load-bearing way: ``^`` is **power** (right-associative), while in Spark
SQL it is bitwise XOR.  Passing the raw string to ``F.expr`` would
silently compute the wrong thing, so we parse the muParser subset and
re-emit Spark SQL:

    expr    := term  (('+' | '-') term)*
    term    := factor (('*' | '/') factor)*
    factor  := unary ('^' factor)?          # right-assoc power → power()
    unary   := '-'* primary
    primary := number | identifier | ident '(' expr (',' expr)* ')'
             | '(' expr ')'

Identifiers are metric-column placeholders (``_var_i`` after the rename in
apply._node_eval) or math function names; function calls pass through by
name (sin/cos/log/exp/sqrt/abs/min/max/... exist in both muParser and
Spark SQL).
"""

from __future__ import annotations

import re

from akumuli_spark.query.errors import QueryValidationError

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z0-9_]+)*)"
    r"|(?P<op>[-+*/^(),]))"
)

#: muParser builtins that exist in Spark SQL under the same name
_ALLOWED_FUNCS = {
    "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
    "ln", "log", "log2", "log10", "exp", "sqrt", "abs", "min", "max",
    "sign", "rint",
}


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
            return tok
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
                # muParser min/max are variadic; Spark's least/greatest match
                name = {"min": "least", "max": "greatest"}.get(tok.lower(), tok)
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
    """
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
