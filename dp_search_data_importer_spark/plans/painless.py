"""Restricted Painless-subset compiler: ES ``script_score`` scripts →
ONE Catalyst Column.

The reference delegates scoring scripts to Elasticsearch verbatim
(``handler/handler.go:95`` forwards the request body); the subset here
covers the arithmetic the published ES 7.10 ``script_score`` examples
use — nothing dynamic survives to execution, the script compiles once
on the driver into a single JVM-side expression (zero Python per row):

- ``_score`` — the query score of the wrapped query
- ``doc['field'].value`` (and the ``doc.field.value`` sugar)
- ``params.name`` — script parameters, bound as literals at compile time
- numeric literals, ``+ - * / %``, unary minus, parentheses
- ``Math.log / log10 / sqrt / abs / exp / pow / max / min / floor / ceil``
- the script_score helpers ``saturation(v, k) = v/(v+k)`` and
  ``sigmoid(v, k, a) = v^a / (k^a + v^a)`` (public ES 7.10
  script-score-query docs)
- comparisons ``> >= < <= == !=`` and logicals ``&& || !`` — the
  ``bucket_selector`` pipeline-aggregation script shape
  (``params.total > 100``); precedence ``||`` < ``&&`` < comparison
  < additive, as in Painless/Java

Unknown names, fields, or syntax raise ``PainlessError`` at compile
time — a malformed script never reaches the executors.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PainlessError", "compile_script"]


class PainlessError(ValueError):
    """Raised when a script uses syntax outside the supported subset."""


_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>\d+\.\d+|\d+|\.\d+)
    | (?P<doc>doc\[\s*'(?P<docq>[A-Za-z_][\w.]*)'\s*\]\.value
        |doc\.(?P<docd>[A-Za-z_]\w*)\.value)
    | (?P<param>params\.(?P<pname>[A-Za-z_]\w*))
    | (?P<name>[A-Za-z_][\w.]*)
    | (?P<op>&&|\|\||[><!=]=|[-+*/%(),><!])
    )""", re.VERBOSE)

_FUNCS_1 = {
    "Math.log": F.log,          # natural log, the Java Math.log
    "Math.log10": F.log10,
    "Math.sqrt": F.sqrt,
    "Math.abs": F.abs,
    "Math.exp": F.exp,
    "Math.floor": F.floor,
    "Math.ceil": F.ceil,
}
_FUNCS_N = {"Math.pow": 2, "Math.max": 2, "Math.min": 2,
            "saturation": 2, "sigmoid": 3}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if m is None or m.end() == i:
            if src[i:].strip() == "":
                break
            raise PainlessError(f"unsupported script syntax at: "
                                f"{src[i:i + 20]!r}")
        if m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("doc") is not None:
            out.append(("doc", m.group("docq") or m.group("docd")))
        elif m.group("param") is not None:
            out.append(("param", m.group("pname")))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
        i = m.end()
    return out


class _Parser:
    """Recursive-descent over the token stream; every production returns
    a Catalyst Column (all doubles — the painless scoring type)."""

    def __init__(self, toks: list[tuple[str, str]], params: dict,
                 score: Column, field: Callable[[str], Column]):
        self.toks = toks
        self.pos = 0
        self.params = params
        self.score = score
        self.field = field
        self.fields_used: set[str] = set()

    def _peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def _next(self):
        t = self._peek()
        if t is None:
            raise PainlessError("unexpected end of script")
        self.pos += 1
        return t

    def _expect(self, op: str) -> None:
        t = self._next()
        if t != ("op", op):
            raise PainlessError(f"expected {op!r}, got {t}")

    def expr(self) -> Column:
        c = self.and_expr()
        while self._peek() == ("op", "||"):
            self._next()
            c = c | self.and_expr()
        return c

    def and_expr(self) -> Column:
        c = self.cmp()
        while self._peek() == ("op", "&&"):
            self._next()
            c = c & self.cmp()
        return c

    _CMP = {">": Column.__gt__, ">=": Column.__ge__,
            "<": Column.__lt__, "<=": Column.__le__,
            "==": Column.__eq__, "!=": Column.__ne__}

    def cmp(self) -> Column:
        c = self.add()
        while (t := self._peek()) is not None and t[0] == "op" \
                and t[1] in self._CMP:
            (_, op) = self._next()
            c = self._CMP[op](c, self.add())
        return c

    def add(self) -> Column:
        c = self.term()
        while self._peek() in (("op", "+"), ("op", "-")):
            (_, op) = self._next()
            rhs = self.term()
            c = c + rhs if op == "+" else c - rhs
        return c

    def term(self) -> Column:
        c = self.unary()
        while self._peek() in (("op", "*"), ("op", "/"), ("op", "%")):
            (_, op) = self._next()
            rhs = self.unary()
            c = c * rhs if op == "*" else (c / rhs if op == "/" else c % rhs)
        return c

    def unary(self) -> Column:
        if self._peek() == ("op", "-"):
            self._next()
            return -self.unary()
        if self._peek() == ("op", "!"):
            self._next()
            return ~self.unary()
        return self.primary()

    def _args(self, n: int, fname: str) -> list[Column]:
        self._expect("(")
        args = [self.expr()]
        while self._peek() == ("op", ","):
            self._next()
            args.append(self.expr())
        self._expect(")")
        if len(args) != n:
            raise PainlessError(f"{fname} takes {n} args, got {len(args)}")
        return args

    def primary(self) -> Column:
        kind, val = self._next()
        if kind == "num":
            return F.lit(float(val))
        if kind == "doc":
            self.fields_used.add(val)
            return self.field(val).cast("double")
        if kind == "param":
            if val not in self.params:
                raise PainlessError(f"undefined script param {val!r}")
            v = self.params[val]
            # bucket_selector binds params to bucket COLUMNS; script_score
            # binds numbers — both are literals by compile time
            return v if isinstance(v, Column) else F.lit(float(v))
        if kind == "name":
            if val == "_score":
                return self.score
            if val in _FUNCS_1:
                (a,) = self._args(1, val)
                return _FUNCS_1[val](a)
            if val in _FUNCS_N:
                args = self._args(_FUNCS_N[val], val)
                if val == "Math.pow":
                    return F.pow(*args)
                if val == "Math.max":
                    return F.greatest(*args)
                if val == "Math.min":
                    return F.least(*args)
                if val == "saturation":
                    v, k = args
                    return v / (v + k)
                v, k, a = args
                return F.pow(v, a) / (F.pow(k, a) + F.pow(v, a))
            raise PainlessError(f"unknown identifier {val!r}")
        if (kind, val) == ("op", "("):
            c = self.expr()
            self._expect(")")
            return c
        raise PainlessError(f"unexpected token {val!r}")


def compile_script(source: str, params: dict | None,
                   score: Column,
                   field: Callable[[str], Column]) -> tuple[Column,
                                                            set[str]]:
    """Compile ``source`` to a Catalyst Column. Returns (column,
    doc-fields-referenced) so the caller can project exactly those
    columns into the join — column pruning stays exact."""
    p = _Parser(_tokenize(source), params or {}, score, field)
    col = p.expr()
    if p._peek() is not None:
        raise PainlessError(f"trailing tokens at {p._peek()!r}")
    return col, p.fields_used
