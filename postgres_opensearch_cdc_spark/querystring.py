"""Lucene query-string parser: the search-bar syntax a reference user
types into OpenSearch Dashboards (DASHBOARD_GUIDE.md:89 —
``status:ACTIVE AND card_type:DEBIT``; :122-135 —
``is_active:true AND pending_amount > 0``, wildcards ``card*``),
parsed into the same node dicts the request-body DSL compiler
(dsl.py) already executes, so both interfaces share one compilation
path and produce identical Catalyst plans.

Supported syntax (the subset the reference's dashboards exercise):

    field:value                 term (true/false/numbers coerced)
    field:"a phrase"            match_phrase
    field:val*                  wildcard (* any run, ? one char)
    field:>N  :>=N  :<N  :<=N   one-sided range
    field > N  (>=, <, <=)      same, spaced comparison form
    field:[a TO b]              range, [ ] inclusive, { } exclusive,
                                * for an open end; mixed [a TO b}
    field:(a OR b*)             field grouping — the field distributes
                                over the parenthesized values (terms /
                                wildcards / phrases)
    term~  term~1               fuzzy (edit distance; default 2)
    _exists_:field              exists
    bare terms / "phrase" / w*  analyzed against default_field
    +clause  -clause            Lucene required / prohibited: adjacent
                                signed clauses are cumulative must /
                                must_not constraints; mixing a signed
                                clause with an adjacent BARE one
                                raises (the bare clause would be
                                scoring-only "optional", and this
                                engine filters)
    foo\\:bar  \\*                backslash escapes — the escaped char
                                loses its special meaning
    AND OR NOT ( )              boolean structure, NOT binds tightest;
                                adjacent clauses join with
                                default_operator (OR, like ES)

Output is a plain DSL node tree (term / range / wildcard /
match_phrase / match / exists / bool) — dsl.compile_query turns it
into pushdown-friendly Column expressions; nothing here touches a
DataFrame. Errors raise QueryStringError with the offending text.
"""

from __future__ import annotations

import re

from pyspark.sql import Column


class QueryStringError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<quoted>"[^"]*")
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<lbrack>[\[{])
      | (?P<rbrack>[\]}])
      | (?P<cmp>>=|<=|>|<)
      | (?P<colon>:)
      | (?P<plus>\+(?=\S))
      | (?P<minus>-(?=[^\s\d]))
      | (?P<word>(?:\\.|[^\s():<>=\[\]{}"\\])+)
    )""",
    re.X,
)

_RESERVED = {"AND", "OR", "NOT", "TO"}


def _unescape(tok: str) -> str:
    """Resolve backslash escapes (``foo\\:bar`` → ``foo:bar``)."""
    return re.sub(r"\\(.)", r"\1", tok)


def _has_live_wildcard(tok: str) -> bool:
    return re.search(r"(?<!\\)[*?]", tok) is not None


def _fuzzy_suffix(val: str) -> "tuple[str, int] | None":
    """Split a Lucene fuzzy suffix (``term~`` → distance 2, ``term~N``).
    Greedy prefix anchors the split at the LAST tilde, so the whole
    numeric suffix is captured: ``term~25`` is a parse error (Lucene
    caps edit distance at 2), not a silent fuzziness-5 query on
    ``term~2`` or a literal term. Returns (raw_prefix, fuzziness), or
    None when ``val`` has no fuzzy suffix (escaped tilde, or non-digit
    text after the tilde)."""
    fm = re.fullmatch(r"(.+)~(\d*)", val)
    if not fm or fm.group(1).endswith("\\"):
        return None
    fuzz = int(fm.group(2)) if fm.group(2) else 2
    if fuzz > 2:
        raise QueryStringError(
            f"fuzziness {fuzz} out of range 0..2 in {val!r}"
        )
    return fm.group(1), fuzz


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == m.start():
            if text[pos:].strip() == "":
                break
            raise QueryStringError(f"cannot tokenize at: {text[pos:]!r}")
        for name, val in m.groupdict().items():
            if val is not None:
                toks.append((name, val))
        pos = m.end()
    return toks


def _coerce(tok: str):
    """Literal coercion for term/range values: booleans and numbers
    become typed Python literals so `is_active:true` compares a
    boolean column against True, not the string 'true'; everything
    else stays a string (dsl._lit upgrades ISO dates to timestamps)."""
    low = tok.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    if re.fullmatch(r"-?\d+\.\d+", tok):
        return float(tok)
    return tok


class _Parser:
    def __init__(self, toks, default_field, default_operator):
        self.toks = toks
        self.i = 0
        self.default_field = default_field
        if default_operator not in ("OR", "AND"):
            raise QueryStringError(
                f"default_operator must be OR or AND: {default_operator!r}"
            )
        self.default_operator = default_operator
        self._field_group: str | None = None  # inside field:(...)

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    # -- grammar ----------------------------------------------------
    # Adjacent clauses with no connective join with default_operator;
    # explicit AND binds tighter than OR (Lucene precedence), NOT
    # tightest.  Parsing collects a flat [node, op, node, ...] chain,
    # then groups AND runs inside OR.

    def parse(self) -> dict:
        node = self._or_chain()
        kind, val = self._peek()
        if kind is not None:
            raise QueryStringError(f"unexpected trailing token: {val!r}")
        return node

    def _signed_unary(self):
        """Consume an optional leading +/- (Lucene required/prohibited
        operator) and the clause it applies to. Returns (node, signed):
        ``-x`` compiles to must_not; ``+x`` is the clause itself (a
        filter engine has no scoring, so required == plain must)."""
        kind, _ = self._peek()
        sign = None
        if kind in ("plus", "minus"):
            self._next()
            sign = kind
        node = self._unary()
        if sign == "minus":
            node = {"bool": {"must_not": [node]}}
        return node, sign is not None

    def _or_chain(self) -> dict:
        node, last_signed = self._signed_unary()
        groups = [[node]]  # list of AND-groups
        while True:
            kind, val = self._peek()
            if kind is None or kind == "rparen":
                break
            if kind == "word" and val == "OR":
                self._next()
                node, last_signed = self._signed_unary()
                groups.append([node])
            elif kind == "word" and val == "AND":
                self._next()
                node, last_signed = self._signed_unary()
                groups[-1].append(node)
            else:  # implicit connective
                node, signed = self._signed_unary()
                if signed or last_signed:
                    # Lucene: adjacent +/- clauses are cumulative
                    # constraints (must / must_not), not default-
                    # operator alternatives — but MIXING a signed
                    # clause with a bare one leaves the bare clause
                    # "optional", which only affects scoring, and this
                    # engine filters. Require explicit operators there
                    # rather than silently dropping or tightening it.
                    if not (signed and last_signed):
                        raise QueryStringError(
                            "mixing +/- clauses with bare ones needs "
                            "explicit AND/OR (no scoring: an optional "
                            "bare clause would be dropped)"
                        )
                    groups[-1].append(node)
                elif self.default_operator == "AND":
                    groups[-1].append(node)
                else:
                    groups.append([node])
                last_signed = signed
        ands = [
            g[0] if len(g) == 1 else {"bool": {"must": g}} for g in groups
        ]
        if len(ands) == 1:
            return ands[0]
        return {"bool": {"should": ands, "minimum_should_match": 1}}

    def _unary(self) -> dict:
        kind, val = self._peek()
        if kind == "word" and val == "NOT":
            self._next()
            return {"bool": {"must_not": [self._unary()]}}
        if kind == "lparen":
            self._next()
            node = self._or_chain()
            k2, v2 = self._next()
            if k2 != "rparen":
                raise QueryStringError(f"expected ')', got {v2!r}")
            return node
        return self._clause()

    def _clause(self) -> dict:
        kind, val = self._next()
        if kind == "quoted":
            if self._field_group is not None:
                return {"match_phrase": {self._field_group: val[1:-1]}}
            return self._default_clause("match_phrase", val[1:-1])
        if kind != "word":
            raise QueryStringError(f"expected a clause, got {val!r}")
        if val in _RESERVED:
            raise QueryStringError(f"operator {val} is not a value")
        nk, _ = self._peek()
        if nk == "colon":
            self._next()
            return self._field_clause(_unescape(val))
        if nk == "cmp":
            _, op = self._next()
            vk, vv = self._next()
            if vk != "word":
                raise QueryStringError(f"{val} {op} needs a value, got {vv!r}")
            return {"range": {
                _unescape(val): {_CMP_OP[op]: _coerce(_unescape(vv))}
            }}
        if self._field_group is not None:
            # inside field:(...) bare values are TERMS on that field
            # (Lucene field grouping), not analyzed default-field text
            return self._value_node(self._field_group, val)
        return self._default_clause("term", val)

    def _field_clause(self, field: str) -> dict:
        if field == "_exists_":
            vk, vv = self._next()
            if vk != "word":
                raise QueryStringError(f"_exists_: needs a field, got {vv!r}")
            return {"exists": {"field": _unescape(vv)}}
        kind, val = self._next()
        if kind == "lparen":
            # field grouping: field:(a OR b*) distributes the field
            # over the parenthesized values
            prev, self._field_group = self._field_group, field
            node = self._or_chain()
            k2, v2 = self._next()
            if k2 != "rparen":
                raise QueryStringError(f"expected ')', got {v2!r}")
            self._field_group = prev
            return node
        if kind == "quoted":
            return {"match_phrase": {field: val[1:-1]}}
        if kind == "cmp":
            vk, vv = self._next()
            if vk != "word":
                raise QueryStringError(
                    f"{field}:{val} needs a value, got {vv!r}"
                )
            return {"range": {field: {_CMP_OP[val]: _coerce(_unescape(vv))}}}
        if kind == "lbrack":
            return self._bracket_range(field, val)
        if kind != "word" or val in _RESERVED:
            raise QueryStringError(f"{field}: needs a value, got {val!r}")
        return self._value_node(field, val)

    def _value_node(self, field: str, val: str) -> dict:
        """Term or wildcard node for a raw value token, resolving
        escapes. A value with LIVE (unescaped) wildcards next to
        escaped ones can't be represented in the DSL wildcard node
        (its * / ? are unconditionally special) — raise rather than
        match the wrong set."""
        if _has_live_wildcard(val):
            if "\\" in val:
                raise QueryStringError(
                    f"cannot mix escaped and live wildcards: {val!r}"
                )
            return {"wildcard": {field: val}}
        fz = _fuzzy_suffix(val)
        if fz is not None:
            # Lucene fuzzy suffix: term~ (edit distance 2) / term~1
            return {"fuzzy": {field: {
                "value": _unescape(fz[0]), "fuzziness": fz[1],
            }}}
        return {"term": {field: _coerce(_unescape(val))}}

    def _bracket_range(self, field: str, open_br: str) -> dict:
        lk, lo = self._next()
        tk, to_kw = self._next()
        hk, hi = self._next()
        ck, close_br = self._next()
        if (lk, hk) != ("word", "word") or (tk, to_kw) != ("word", "TO") \
                or ck != "rbrack":
            raise QueryStringError(
                f"bad range on {field}: expected [a TO b] / {{a TO b}}"
            )
        bounds: dict = {}
        if lo != "*":
            bounds["gte" if open_br == "[" else "gt"] = _coerce(_unescape(lo))
        if hi != "*":
            bounds["lte" if close_br == "]" else "lt"] = _coerce(_unescape(hi))
        if not bounds:
            raise QueryStringError(f"unbounded range on {field}")
        return {"range": {field: bounds}}

    def _default_clause(self, kind: str, text: str) -> dict:
        if self.default_field is None:
            raise QueryStringError(
                f"bare {text!r} needs default_field (no field: prefix)"
            )
        f = self.default_field
        if kind == "term":
            if _has_live_wildcard(text):
                if "\\" in text:
                    raise QueryStringError(
                        f"cannot mix escaped and live wildcards: {text!r}"
                    )
                return {"wildcard": {f: text}}
            fz = _fuzzy_suffix(text)
            if fz is not None:
                return {"fuzzy": {f: {
                    "value": _unescape(fz[0]), "fuzziness": fz[1],
                }}}
            # bare free text is ANALYZED against the default field
            # (ES query_string semantics), not exact-term-matched
            return {"match": {f: _unescape(text)}}
        return {kind: {f: text}}


_CMP_OP = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}


def parse_query_string(
    text: str,
    default_field: str | None = None,
    default_operator: str = "OR",
) -> dict:
    """Parse a Lucene query string into a DSL node tree (the dict
    shape dsl.compile_query executes)."""
    toks = _tokenize(text)
    if not toks:
        raise QueryStringError("empty query string")
    return _Parser(toks, default_field, default_operator).parse()


def compile_query_string(
    text: str,
    default_field: str | None = None,
    default_operator: str = "OR",
    id_col: str = "doc_id",
) -> Column:
    """Parse + compile to a pushdown-friendly Column predicate."""
    from postgres_opensearch_cdc_spark.dsl import compile_query

    return compile_query(
        parse_query_string(text, default_field, default_operator), id_col
    )


# ---------------------------------------------------------------------------
# simple_query_string — the LENIENT search-bar variant (never errors on
# user input; reference stack exposes it beside query_string for
# user-facing search boxes where a syntax error must not 400)
# ---------------------------------------------------------------------------

_SQS_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<quoted>"[^"]*"?)          # phrase; unterminated quote tolerated
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<op>[|+])
      | (?P<minus>-)
      | (?P<word>[^\s()|+"-][^\s()|"]*)
    )""",
    re.X,
)


def _sqs_tokenize(text: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(text):
        m = _SQS_TOKEN_RE.match(text, pos)
        if not m or m.end() == m.start():
            pos += 1  # lenient: skip any char the grammar can't place
            continue
        for name, val in m.groupdict().items():
            if val is not None:
                toks.append((name, val))
        pos = m.end()
    return toks


class _SQSParser:
    """simple_query_string grammar: ``+`` AND, ``|`` OR, leading ``-``
    NOT, ``"phrase"``, trailing ``*`` prefix, ``( )`` grouping,
    whitespace = default_operator. Clauses left-fold with per-separator
    operators (ES documents no precedence for this query — the fold IS
    the contract here, pinned by tests). Lenient by specification:
    stray operators and unbalanced parens degrade to no-ops, never
    raise.

    Negation scope (deliberate, matches Lucene — NOT the intuitive
    search-bar reading): ``-x`` compiles to a standalone NOT-x node
    that participates in the fold like any positive clause, so
    ``foo -bar`` with default_operator=OR means ``foo OR NOT bar``
    (over-broad by design), and only with AND means ``foo AND NOT
    bar``. This is exactly Lucene's SimpleQueryParser contract, which
    ES/OpenSearch use unmodified: buildQueryTree (a PRIVATE method —
    subclasses cannot rewire it) wraps a negated branch as
    ``BooleanQuery[MUST_NOT branch, SHOULD MatchAllDocsQuery]``
    (pinned by Lucene's own TestSimpleQueryParser.testNegationTerm)
    and then combines that wrapper with the default operator exactly
    like a positive clause — negations are NEVER hoisted to a shared
    must_not of the enclosing boolean (that is the CLASSIC QueryParser
    / query_string behavior, see _Parser._or_chain above). Users who
    want exclusion semantics set default_operator=AND — the same
    guidance ES gives. Pinned by test_sqs_negation_fold_*."""

    def __init__(self, toks, fields, default_operator):
        self.toks = toks
        self.fields = list(fields)
        self.default_and = str(default_operator).upper() == "AND"

    def parse(self) -> dict:
        node = self._expr(stop_at_rparen=False)
        return node if node is not None else {"match_all": {}}

    def _leaf(self, node_of_field) -> dict:
        if len(self.fields) == 1:
            return node_of_field(self.fields[0])
        return {"bool": {
            "should": [node_of_field(f) for f in self.fields],
            "minimum_should_match": 1,
        }}

    def _combine(self, acc, node, op_and: bool) -> dict:
        if op_and:
            return {"bool": {"must": [acc, node]}}
        return {"bool": {"should": [acc, node], "minimum_should_match": 1}}

    def _expr(self, stop_at_rparen: bool) -> "dict | None":
        acc, pending = None, None
        while self.toks:
            kind, val = self.toks[0]
            if kind == "rparen":
                self.toks.pop(0)
                if stop_at_rparen:
                    break
                continue  # unbalanced ')' — lenient skip
            if kind == "op":
                self.toks.pop(0)
                pending = val
                continue
            node = self._clause()
            if node is None:
                continue
            if acc is None:
                acc = node
            else:
                op_and = pending == "+" or (pending is None and self.default_and)
                acc = self._combine(acc, node, op_and)
            pending = None
        return acc

    def _clause(self) -> "dict | None":
        kind, val = self.toks.pop(0)
        if kind == "minus":
            inner = self._clause() if self.toks else None
            if inner is None:
                return None  # trailing '-' — lenient no-op
            return {"bool": {"must_not": [inner]}}
        if kind == "lparen":
            return self._expr(stop_at_rparen=True)
        if kind == "quoted":
            phrase = val.strip('"')
            if not phrase:
                return None
            return self._leaf(lambda f: {"match_phrase": {f: phrase}})
        if kind == "word":
            if val.endswith("*") and len(val) > 1:
                stem = val.rstrip("*")
                return self._leaf(lambda f, s=stem: {"prefix": {f: s}})
            if val == "*":
                return None  # bare wildcard — lenient no-op
            return self._leaf(lambda f, v=val: {"match": {f: v}})
        return None  # any other token — lenient skip


def parse_simple_query_string(
    text: str,
    fields: "list[str] | tuple[str, ...]" = ("text",),
    default_operator: str = "OR",
) -> dict:
    """Parse an ES ``simple_query_string`` into the same DSL node tree
    dsl.compile_query executes — one plan path for every interface.
    Unlike parse_query_string this NEVER raises on user input (the
    query's documented contract): anything unparseable degrades."""
    return _SQSParser(
        _sqs_tokenize(text), fields, default_operator
    ).parse()
