"""Lucene-style ``query_string`` / ``simple_query_string`` parsers.

The reference forwards ES ``_search`` bodies verbatim
(``/root/reference/handler/handler.go:95``); both query types are part of
that surface and compile here to the SAME node tree ``plans/es_dsl.py``
already executes — the parser produces plain DSL dicts (``match``,
``match_phrase``, ``prefix``, ``wildcard``, ``fuzzy``, ``range``, ``term``,
``bool``), so scoring, statistics memoization, and ranking are shared with
every other query type and nothing new touches the data path.

Supported ``query_string`` syntax (the documented ES 7.10 subset):

* bare terms, analyzed against the default field; ``field:term`` overrides
  the field (meta fields — resolved via the caller's ``is_meta`` predicate
  — become exact ``term`` filters, text fields become ``match``);
* ``"a b"`` phrases with optional ``~N`` slop;
* ``term*`` / ``te?m`` wildcards, ``term~`` / ``term~N`` fuzzy
  (``~`` alone = AUTO: 0 edits under 3 chars, 1 under 6, else 2);
* ``field:[a TO b]`` inclusive / ``{a TO b}`` exclusive ranges (``*``
  as an open endpoint);
* ``^N`` boosts on any clause, including groups;
* ``AND`` / ``&&``, ``OR`` / ``||``, ``NOT`` / ``!``, ``+`` / ``-``
  prefixes, and ``( … )`` grouping, with ``field:(a b)`` field-scoped
  groups.

Operator semantics: clauses are collected into ONE Boolean level per
parenthesis group — ``+``/``-``/``NOT`` pin a clause to must/must_not
regardless of surrounding operators (Lucene's occur model), explicit
``AND`` binds its neighbors into a must-group, and remaining plain clauses
join via ``default_operator``. ``a +b -c d`` with default OR therefore
compiles to ``bool(must=[b], must_not=[c], should=[a, d], msm=0)`` —
exactly Lucene's BooleanQuery for that input. We deliberately do NOT
reproduce Lucene's historical left-associative operator quirks for mixed
``a AND b OR c`` chains (AND binds tighter here, the behavior every ES
user expects and what ``simple_query_string`` documents).

``simple_query_string`` is the reduced dialect: ``+`` is binary AND,
``|`` binary OR, ``-`` prefix negation, ``"…"`` phrases (``~N`` slop),
``trailing*`` prefix queries, ``term~N`` fuzzy, ``(…)`` groups; no
field:term syntax, no boosts, no AND/OR/NOT words — and it NEVER raises on
malformed input (the ES contract): unparseable constructs degrade to
literal terms.
"""

from __future__ import annotations

from collections.abc import Callable

MUST, MUST_NOT, PLAIN = "must", "must_not", "plain"
_WORD_STOP = set(" \t\r\n()")


class QueryStringError(ValueError):
    pass


def _auto_fuzziness(term: str) -> int:
    if len(term) < 3:
        return 0
    return 1 if len(term) < 6 else 2


def _num_or_str(s: str):
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


class _Scanner:
    def __init__(self, text: str):
        self.s = text
        self.i = 0

    def skip_ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i] in " \t\r\n":
            self.i += 1

    def eof(self) -> bool:
        self.skip_ws()
        return self.i >= len(self.s)

    def peek(self) -> str:
        self.skip_ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def word_ahead(self) -> str:
        """The bare word starting at the cursor (no consumption)."""
        self.skip_ws()
        j = self.i
        while j < len(self.s) and self.s[j] not in _WORD_STOP:
            j += 1
        return self.s[self.i:j]

    def take_word(self) -> str:
        w = self.word_ahead()
        self.i += len(w)
        return w

    def take_until(self, ch: str) -> str:
        j = self.s.find(ch, self.i)
        if j < 0:
            raise QueryStringError(
                f"unterminated {ch!r} at {self.i} in {self.s!r}")
        out = self.s[self.i:j]
        self.i = j + 1
        return out

    def take_number(self) -> float | None:
        j = self.i
        while j < len(self.s) and (self.s[j].isdigit()
                                   or self.s[j] in ".-"):
            j += 1
        if j == self.i:
            return None
        try:
            v = float(self.s[self.i:j])
        except ValueError:
            return None
        self.i = j
        return v


def _boost(node: dict, boost: float | None) -> dict:
    """Attach ^boost onto a leaf/bool node in the shape es_dsl reads."""
    if boost is None or boost == 1.0:
        return node
    (kind, spec), = node.items()
    if kind == "bool":
        spec = dict(spec)
        spec["boost"] = boost
        return {kind: spec}
    if kind in ("term", "range"):
        # the planner's filter-leaf scoring reads boost at the SPEC level
        # (``score()``'s constant_score branch), not inside the field dict
        spec = dict(spec)
        spec["boost"] = boost
        return {kind: spec}
    if kind in ("match", "match_phrase", "prefix", "wildcard", "fuzzy"):
        (field, inner), = spec.items()
        inner = dict(inner) if isinstance(inner, dict) else (
            {"query": inner} if kind in ("match", "match_phrase")
            else {"value": inner})
        inner["boost"] = boost
        return {kind: {field: inner}}
    spec = dict(spec)
    spec["boost"] = boost
    return {kind: spec}


def _build_bool(clauses: list[tuple[str, str | None, dict]],
                default_operator: str) -> dict:
    """One Boolean level from [(occur, op_before, node)]: pinned
    must/must_not first, then explicit-AND runs over the plain clauses,
    runs joined by the default operator / OR."""
    must = [n for occ, _, n in clauses if occ == MUST]
    must_not = [n for occ, _, n in clauses if occ == MUST_NOT]
    plain = [(op, n) for occ, op, n in clauses if occ == PLAIN]

    groups: list[dict] = []
    run: list[dict] = []
    for op, node in plain:
        eff = op or default_operator
        if run and eff != "AND":
            groups.append(run[0] if len(run) == 1
                          else {"bool": {"must": run}})
            run = []
        run.append(node)
    if run:
        groups.append(run[0] if len(run) == 1 else {"bool": {"must": run}})

    if not groups and not must and not must_not:
        raise QueryStringError("empty query")
    if len(groups) == 1 and not must and not must_not:
        return groups[0]
    body: dict = {}
    if len(groups) == 1:
        # a single plain group is required exactly like a must clause
        # (one should with msm=1 ≡ must — Lucene's implicit-msm rule);
        # pure must-groups splice flat so the tree stays one level
        (gk, gs), = groups[0].items()
        if gk == "bool" and set(gs) == {"must"}:
            must = must + list(gs["must"])
        else:
            must = must + groups
        groups = []
    if must:
        body["must"] = must
    if groups:
        body["should"] = groups
        body["minimum_should_match"] = 0 if must else 1
    if must_not:
        body["must_not"] = must_not
        if not must and not groups:
            body["must"] = [{"match_all": {}}]
    return {"bool": body}


def _leaf(field: str, kind: str, value, params: dict,
          is_meta: Callable[[str], bool]) -> dict:
    if kind == "phrase":
        inner = {"query": value}
        inner.update(params)
        return {"match_phrase": {field: inner}}
    if kind == "range":
        boost = params.pop("boost", None)
        spec: dict = {field: params}
        if boost is not None:
            spec["boost"] = boost
        return {"range": spec}
    if kind == "fuzzy":
        inner = {"value": value}
        inner.update(params)
        return {"fuzzy": {field: inner}}
    if kind == "wildcard":
        return {"wildcard": {field: {"value": value, **params}}}
    if kind == "prefix":
        return {"prefix": {field: {"value": value, **params}}}
    if is_meta(field):
        boost = params.pop("boost", None)
        spec = {field: {"value": _num_or_str(str(value)), **params}}
        if boost is not None:
            spec["boost"] = boost
        return {"term": spec}
    inner = {"query": value}
    inner.update(params)
    return {"match": {field: inner}}


class _QueryStringParser:
    def __init__(self, text: str, default_field: str,
                 default_operator: str,
                 is_meta: Callable[[str], bool]):
        self.sc = _Scanner(text)
        self.default_operator = default_operator.upper()
        self.is_meta = is_meta
        self.field_stack = [default_field]

    # sequence := clause+  (operators read between clauses)
    def parse_group(self) -> dict:
        clauses: list[tuple[str, str | None, dict]] = []
        op_before: str | None = None
        while not self.sc.eof() and self.sc.peek() != ")":
            w = self.sc.word_ahead()
            if w in ("AND", "&&"):
                self.sc.take_word()
                op_before = "AND"
                continue
            if w in ("OR", "||"):
                self.sc.take_word()
                op_before = "OR"
                continue
            if w in ("NOT", "!"):
                self.sc.take_word()
                node = self.parse_clause()[1]
                clauses.append((MUST_NOT, op_before, node))
                op_before = None
                continue
            occ, node = self.parse_clause()
            clauses.append((occ, op_before, node))
            op_before = None
        return _build_bool(clauses, self.default_operator)

    def parse_clause(self) -> tuple[str, dict]:
        sc = self.sc
        occ = PLAIN
        ch = sc.peek()
        if ch == "+":
            sc.i += 1
            occ = MUST
        elif ch == "-":
            sc.i += 1
            occ = MUST_NOT
        elif ch == "!":
            sc.i += 1
            occ = MUST_NOT
        node = self.parse_atom()
        return occ, node

    def parse_atom(self) -> dict:
        sc = self.sc
        field = self.field_stack[-1]
        ch = sc.peek()
        # optional field: prefix (word ending in ':' before ( " [ { or text)
        if ch not in ("(", '"', "[", "{"):
            w = sc.word_ahead()
            colon = w.find(":")
            if colon > 0:
                sc.skip_ws()
                field = w[:colon]
                sc.i += colon + 1
                ch = sc.s[sc.i] if sc.i < len(sc.s) else ""
            else:
                ch = sc.peek()
        if ch == "(":
            sc.skip_ws()
            sc.i += 1
            self.field_stack.append(field)
            node = self.parse_group()
            self.field_stack.pop()
            if self.sc.peek() != ")":
                raise QueryStringError("unbalanced parenthesis")
            sc.i += 1
            return _boost(node, self._trailing_boost())
        if ch == '"':
            sc.skip_ws()
            sc.i += 1
            text = sc.take_until('"')
            params: dict = {}
            if sc.i < len(sc.s) and sc.s[sc.i] == "~":
                sc.i += 1
                n = sc.take_number()
                params["slop"] = int(n) if n is not None else 0
            b = self._trailing_boost()
            if b is not None:
                params["boost"] = b
            return _leaf(field, "phrase", text, params, self.is_meta)
        if ch in ("[", "{"):
            sc.skip_ws()
            lo_incl = ch == "["
            sc.i += 1
            body = sc.take_until("]" if lo_incl else "}")
            parts = body.split()
            if len(parts) != 3 or parts[1].upper() != "TO":
                raise QueryStringError(f"bad range [{body}]")
            params = {}
            if parts[0] != "*":
                params["gte" if lo_incl else "gt"] = _num_or_str(parts[0])
            if parts[2] != "*":
                params["lte" if lo_incl else "lt"] = _num_or_str(parts[2])
            return _leaf(field, "range", None, params, self.is_meta)
        # bare term (may carry wildcards / ~fuzz / ^boost)
        w = sc.take_word()
        if not w:
            raise QueryStringError(
                f"expected a clause at {sc.i} in {sc.s!r}")
        term, fuzz, boost = w, None, None
        if "^" in term:
            term, _, btxt = term.rpartition("^")
            try:
                boost = float(btxt)
            except ValueError:
                raise QueryStringError(f"bad boost in {w!r}") from None
        if "~" in term:
            term, _, ftxt = term.rpartition("~")
            fuzz = _auto_fuzziness(term) if ftxt == "" else int(float(ftxt))
        params = {} if boost is None else {"boost": boost}
        if fuzz is not None:
            params["fuzziness"] = fuzz
            return _leaf(field, "fuzzy", term.lower(), params, self.is_meta)
        if "*" in term or "?" in term:
            return _leaf(field, "wildcard", term.lower(), params,
                         self.is_meta)
        return _leaf(field, "term", term, params, self.is_meta)

    def _trailing_boost(self) -> float | None:
        sc = self.sc
        if sc.i < len(sc.s) and sc.s[sc.i] == "^":
            sc.i += 1
            n = sc.take_number()
            if n is None:
                raise QueryStringError("dangling ^")
            return float(n)
        return None


def parse_query_string(query: str, default_field: str = "text",
                       default_operator: str = "OR",
                       is_meta: Callable[[str], bool] = lambda f: False,
                       ) -> dict:
    """Compile a ``query_string`` query to an es_dsl node tree."""
    p = _QueryStringParser(query, default_field, default_operator, is_meta)
    node = p.parse_group()
    if not p.sc.eof():
        raise QueryStringError(
            f"trailing input at {p.sc.i} in {query!r}")
    return node


def parse_simple_query_string(query: str, default_field: str = "text",
                              default_operator: str = "OR",
                              is_meta: Callable[[str], bool]
                              = lambda f: False) -> dict:
    """Compile a ``simple_query_string`` query: ``+`` binary AND, ``|``
    binary OR, ``-`` prefix NOT, phrases, trailing-``*`` prefix queries,
    ``~N`` fuzzy/slop, groups. Malformed input NEVER raises (the ES
    contract): offending constructs degrade to literal term matches."""
    try:
        return _parse_sqs(query, default_field, default_operator, is_meta)
    except QueryStringError:
        terms = [t for t in query.replace("|", " ").replace("+", " ")
                 .replace("(", " ").replace(")", " ").replace('"', " ")
                 .replace("-", " ").split() if t]
        if not terms:
            return {"match_all": {}}
        return {"match": {default_field: {"query": " ".join(terms)}}}


def _parse_sqs(query: str, default_field: str, default_operator: str,
               is_meta: Callable[[str], bool]) -> dict:
    sc = _Scanner(query)
    dop = default_operator.upper()

    def group() -> dict:
        clauses: list[tuple[str, str | None, dict]] = []
        op_before: str | None = None
        while not sc.eof() and sc.peek() != ")":
            ch = sc.peek()
            if ch == "+":
                sc.i += 1
                op_before = "AND"
                continue
            if ch == "|":
                sc.i += 1
                op_before = "OR"
                continue
            occ = PLAIN
            if ch == "-":
                sc.i += 1
                occ = MUST_NOT
                ch = sc.s[sc.i] if sc.i < len(sc.s) else ""
            if ch == "(":
                sc.skip_ws()
                sc.i += 1
                node = group()
                if sc.peek() != ")":
                    raise QueryStringError("unbalanced parenthesis")
                sc.i += 1
            elif ch == '"':
                sc.skip_ws()
                sc.i += 1
                text = sc.take_until('"')
                params: dict = {}
                if sc.i < len(sc.s) and sc.s[sc.i] == "~":
                    sc.i += 1
                    n = sc.take_number()
                    params["slop"] = int(n) if n is not None else 0
                node = _leaf(default_field, "phrase", text, params,
                             is_meta)
            else:
                w = sc.take_word().replace("|", "").replace("+", "")
                if not w:
                    raise QueryStringError("expected a clause")
                if "~" in w:
                    term, _, ftxt = w.rpartition("~")
                    fz = (_auto_fuzziness(term) if ftxt == ""
                          else int(float(ftxt)))
                    node = _leaf(default_field, "fuzzy", term.lower(),
                                 {"fuzziness": fz}, is_meta)
                elif w.endswith("*"):
                    node = _leaf(default_field, "prefix", w[:-1].lower(),
                                 {}, is_meta)
                else:
                    node = _leaf(default_field, "term", w, {}, is_meta)
            clauses.append((occ, op_before, node))
            op_before = None
        return _build_bool(clauses, dop)

    node = group()
    if not sc.eof():
        raise QueryStringError(f"trailing input in {query!r}")
    return node
