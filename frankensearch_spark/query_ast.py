"""Engine-neutral query trees + lenient parser + canonicalizer.

Re-expresses the reference's default lenient grammar
(``crates/frankensearch-quill/src/query.rs``: AST :124-184, parser
:753-830, canonicalizer :379-436, limits :17-27) from its public
semantics, verified against the ``default_lenient`` ``parse_tree_cases``
of ``tests/fixtures/quill_language_contract.json``.

Grammar (lenient — malformed input is recovered or dropped with a
diagnostic, never an error):

    terms                 rust ownership        -> Boolean(Should...)
    quoted phrase         "error handling"      -> Phrase (1 token degrades to Term)
    multi-token word      src/main.rs           -> Phrase (analyzer splits it)
    AND / OR / NOT        uppercase only; AND binds tighter than OR
    +must / -mustnot      prefix markers; all-negative root repaired with All
    field:term            explicit field target; unknown field -> dropped
    field:(...)           field-scoped group
    field:[a TO b}        string range (bounds: [/{ incl/excl, * unbounded)
    field: IN [a b]       string set, stable dedup
    boosts                rust^3, (a b)^2       -> Boost
    globs                 ru*t, inde?           -> Glob (expanded at lowering)
    slop / prefix         "a b"~2, "a b"*       -> parse, rejected at lowering

Limits: ``MAX_QUERY_LENGTH`` 10,000 scalars (truncate + flag),
``MAX_QUERY_DEPTH`` 64 (deeper groups dropped),
``GLOB_EXPANSION_LIMIT`` 16,384 (config.rs:33).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from frankensearch_spark.analyze import analyze_default

MAX_QUERY_LENGTH = 10_000  # query.rs:18
MAX_QUERY_DEPTH = 64  # query.rs:24
TITLE_BOOST = 2.0  # query.rs:27
GLOB_EXPANSION_LIMIT = 16_384  # config.rs:33


def cap_glob_expansion(terms) -> list[str]:
    """ONE shared cap rule for every glob-expansion site (Spark executor,
    single- and multi-field oracle): the sorted, deduplicated union of all
    per-field matches, capped at GLOB_EXPANSION_LIMIT — so Spark/oracle
    parity holds even past 16,384 expansions (grimoire.rs:1374-1460)."""
    return sorted(set(terms))[:GLOB_EXPANSION_LIMIT]

MUST = "Must"
SHOULD = "Should"
MUST_NOT = "MustNot"

TEXT = "text"
KEYWORD = "keyword"
NUMERIC = "numeric"


@dataclass(frozen=True)
class QueryField:
    """One queryable field: name, parser-time boost, kind (query.rs:31-37 +
    schema.rs FieldKind).  ``text`` analyzes; ``keyword`` matches raw;
    ``numeric`` serves I64 ranges.  ``basic`` = Tantivy's Basic record
    option (positions=false fields like the CASS prefix fields,
    schema.rs:442-458): term frequency is forced to 1 at scoring time
    (argus.rs TermScorer record_option)."""

    name: str
    boost: float = 1.0
    kind: str = TEXT
    basic: bool = False


@dataclass(frozen=True)
class ParserSchema:
    """Known fields + the default expansion for bare terms."""

    fields: tuple[QueryField, ...]
    default_names: tuple[str, ...]

    def by_name(self, name: str) -> QueryField | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    @property
    def defaults(self) -> tuple[QueryField, ...]:
        return tuple(f for f in self.fields if f.name in self.default_names)


# The reference's DEFAULT_SCHEMA surface (content^1 + title^2 text defaults,
# id keyword — schema.rs:295-298, query.rs:25-27); kept for parity tests.
REFERENCE_SCHEMA = ParserSchema(
    fields=(
        QueryField("content", 1.0, TEXT),
        QueryField("title", TITLE_BOOST, TEXT),
        QueryField("id", 1.0, KEYWORD),
    ),
    default_names=("content", "title"),
)

# Our engine's corpus schema per BASELINE.json input_hint: one analyzed
# content field + the natural-key keyword columns.
ENGINE_SCHEMA = ParserSchema(
    fields=(
        QueryField("content", 1.0, TEXT),
        QueryField("repo", 1.0, KEYWORD),
        QueryField("path", 1.0, KEYWORD),
        QueryField("commit", 1.0, KEYWORD),
        QueryField("lang", 1.0, KEYWORD),
        # numeric fast-column analogue (I64{fast}, schema.rs:58): admitted
        # token count, served from docmeta for range predicates
        QueryField("doclen", 1.0, NUMERIC),
    ),
    default_names=("content",),
)

ENGINE_FIELDS = ENGINE_SCHEMA.defaults
REFERENCE_FIELDS = REFERENCE_SCHEMA.defaults


# ---------------------------------------------------------------------------
# AST


@dataclass(frozen=True)
class Empty:
    pass


@dataclass(frozen=True)
class All:
    pass


@dataclass(frozen=True)
class Term:
    fields: tuple[QueryField, ...]
    text: str


@dataclass(frozen=True)
class PositionedTerm:
    position: int
    text: str


@dataclass(frozen=True)
class Phrase:
    fields: tuple[QueryField, ...]
    terms: tuple[PositionedTerm, ...]
    slop: int = 0
    prefix: bool = False


@dataclass(frozen=True)
class Clause:
    occur: str  # MUST / SHOULD / MUST_NOT
    query: "Query"


@dataclass(frozen=True)
class Boolean:
    clauses: tuple[Clause, ...]
    operator: str | None = None  # "AND" / "OR" when explicit in source


@dataclass(frozen=True)
class Boost:
    query: "Query"
    factor: float


@dataclass(frozen=True)
class Glob:
    fields: tuple[QueryField, ...]
    pattern: str


@dataclass(frozen=True)
class RangeBound:
    bound: str  # "Included" / "Excluded" / "Unbounded"
    value: str | int | None = None


@dataclass(frozen=True)
class RangeStr:
    field: str
    lower: RangeBound
    upper: RangeBound


@dataclass(frozen=True)
class RangeI64:
    field: str
    lower: RangeBound
    upper: RangeBound


@dataclass(frozen=True)
class SetStr:
    field: str
    values: tuple[str, ...]


Query = (
    Empty | All | Term | Phrase | Boolean | Boost | Glob | RangeStr | RangeI64 | SetStr
)


@dataclass
class ParsedQuery:
    query: Query
    diagnostics: list[str] = field(default_factory=list)
    was_truncated: bool = False


# ---------------------------------------------------------------------------
# Lexer


@dataclass
class _Tok:
    kind: str  # LPAREN RPAREN AND OR NOT WORD QUOTE
    text: str = ""
    fieldname: str | None = None
    boost: float | None = None
    occur: str | None = None  # from +/- prefix
    slop: int = 0
    prefix: bool = False


_FIELD_QUOTE_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_.\-]*):(?=[\"])")


def _lex(text: str, diagnostics: list[str]) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(text)
    open_groups = 0
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "(":
            toks.append(_Tok("LPAREN"))
            open_groups += 1
            i += 1
            continue
        if ch == ")":
            if open_groups == 0:
                # the reference stops lexing at an unmatched top-level
                # ')' and discards the remainder, WITH a diagnostic
                # (query.rs lex: "unmatched closing parenthesis dropped")
                diagnostics.append(
                    "unmatched closing parenthesis; remainder dropped"
                )
                break
            open_groups -= 1
            tok = _Tok("RPAREN")
            i += 1
            i = _suffixes(text, i, tok)
            toks.append(tok)
            continue
        occur = None
        if ch in "+-" and i + 1 < n and not text[i + 1].isspace() and text[i + 1] != ")":
            occur = MUST if ch == "+" else MUST_NOT
            i += 1
            ch = text[i] if i < n else ""
        if ch == "(":
            # occur marker applies to the group ('-(a b)' excludes the
            # group — the reference lexes Plus/Minus as standalone
            # tokens that unary applies to the next primary incl. groups)
            toks.append(_Tok("LPAREN", occur=occur))
            open_groups += 1
            i += 1
            continue
        # field:"quoted phrase" — the field scope rides the quote token
        # (reference lex() hands the field into lex_quoted)
        fm = _FIELD_QUOTE_RE.match(text, i) if ch not in "\"'" else None
        fieldname = None
        if fm is not None:
            fieldname = fm.group(1)
            i = fm.end()  # now AT the opening quote (lookahead unconsumed)
            ch = '"'
        if ch == '"':
            end = text.find('"', i + 1)
            if end == -1:
                diagnostics.append("unterminated quote recovered as terms")
                tok = _Tok("QUOTE", text[i + 1 :], occur=occur,
                           fieldname=fieldname)
                toks.append(tok)
                i = n
                continue
            tok = _Tok("QUOTE", text[i + 1 : end], occur=occur,
                       fieldname=fieldname)
            i = _suffixes(text, end + 1, tok)
            toks.append(tok)
            continue
        # bare word up to whitespace / paren / quote; brackets capture
        # everything until their close so ranges/sets may contain spaces
        j = i
        bracket = False
        while j < n:
            cj = text[j]
            if bracket:
                if cj in "]}":
                    bracket = False
                j += 1
                continue
            if cj.isspace() or cj in '()"':
                break
            if cj in "[{":
                bracket = True
            j += 1
        word = text[i:j]
        i = j
        if occur is None and word in ("AND", "OR", "NOT"):
            toks.append(_Tok(word))
            continue
        tok = _Tok("WORD", word, occur=occur)
        _split_word(tok)
        toks.append(tok)
    return toks


def _suffixes(text: str, i: int, tok: _Tok) -> int:
    """Consume ``~slop`` / ``*`` / ``^boost`` after a quote or rparen."""
    n = len(text)
    while i < n and text[i] in "~*^":
        if text[i] == "~":
            j = i + 1
            while j < n and text[j].isdigit():
                j += 1
            if j > i + 1:
                tok.slop = int(text[i + 1 : j])
            i = j
        elif text[i] == "*":
            tok.prefix = True
            i += 1
        else:  # ^boost
            j = i + 1
            while j < n and (text[j].isdigit() or text[j] in ".eE+-"):
                j += 1
            try:
                tok.boost = float(text[i + 1 : j])
            except ValueError:
                pass
            i = j
    return i


def _split_word(tok: _Tok) -> None:
    """Field prefix + boost suffix on a bare word."""
    word = tok.text
    if "^" in word and not word.endswith(("]", "}")):
        body, _, boost_s = word.rpartition("^")
        try:
            tok.boost = float(boost_s)
            word = body
        except ValueError:
            pass
    if ":" in word and not word.startswith(("[", "{")):
        fieldname, _, rest = word.partition(":")
        tok.fieldname = fieldname
        word = rest
    tok.text = word


# ---------------------------------------------------------------------------
# Parser


class _Parser:
    def __init__(self, toks: list[_Tok], schema: ParserSchema,
                 diagnostics: list[str]):
        self.toks = toks
        self.pos = 0
        self.schema = schema
        self.diagnostics = diagnostics

    def peek(self) -> _Tok | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> _Tok:
        tok = self.toks[self.pos]
        self.pos += 1
        return tok

    # or_expr := and_expr ((OR | juxtaposition) and_expr)*
    def or_expr(self, depth: int, scope: QueryField | None):
        clauses: list[Clause] = []
        seen: set[Clause] = set()  # O(1) dedup (frozen dataclasses hash)
        operator: str | None = None
        attempted = 0
        deduped = False
        while True:
            tok = self.peek()
            if tok is None or tok.kind == "RPAREN":
                break
            if tok.kind == "OR":
                self.next()
                operator = "OR"
                continue
            attempted += 1
            got = self.and_expr(depth, scope)
            if got is None:
                continue
            occur, q = got
            clause = Clause(occur, q)
            if clause in seen:
                deduped = True  # stable dedup of exact raw siblings
                continue
            seen.add(clause)
            clauses.append(clause)
        return clauses, operator, attempted, deduped

    # and_expr := unary (AND unary)*
    def and_expr(self, depth: int, scope) -> tuple[str, Query] | None:
        first = self.unary(depth, scope)
        group: list[Clause] = []
        explicit_and = False
        while True:
            tok = self.peek()
            if tok is not None and tok.kind == "AND":
                self.next()
                explicit_and = True
                nxt = self.unary(depth, scope)
                if first is not None and not group:
                    occur0, q0 = first
                    group.append(Clause(MUST if occur0 is None else occur0, q0))
                if nxt is not None:
                    occur, q = nxt
                    group.append(Clause(MUST if occur is None else occur, q))
                continue
            break
        if explicit_and and group:
            return SHOULD, Boolean(tuple(group), "AND")
        if first is None:
            return None
        occur, q = first
        return (SHOULD if occur is None else occur), q

    # unary := NOT* primary — ITERATIVE prefix consumption (a recursive
    # formulation stack-overflows on 'NOT '*2000 inputs, breaking the
    # never-erroring contract)
    def unary(self, depth: int, scope) -> tuple[str | None, Query] | None:
        not_count = 0
        while True:
            tok = self.peek()
            if tok is None or tok.kind == "RPAREN":
                if not_count:
                    self.diagnostics.append("dangling NOT dropped")
                return None
            if tok.kind == "NOT":
                self.next()
                not_count += 1
                continue
            if tok.kind in ("AND", "OR"):
                self.next()
                self.diagnostics.append(f"dangling {tok.kind} dropped")
                continue
            break
        got = self.primary(depth, scope)
        if got is None:
            if not_count:
                self.diagnostics.append("dangling NOT dropped")
            return None
        occur, q = got
        if not_count:
            # reference NOT-stacking law (query.rs:2375-2393): each NOT
            # past the first wraps one MustNot boolean (so NOT NOT x
            # composes as a double negation), the outermost NOT sets the
            # clause occur, and a NOT stacked on an explicit +/- prefix
            # collapses to ONE exclusion.  Nesting is capped at
            # MAX_QUERY_DEPTH parity-preserving (a 2000-NOT chain must
            # not build a 2000-deep tree — hashing/canon would blow the
            # Python stack, breaking the never-erroring contract).
            wraps = not_count - 1
            if wraps > MAX_QUERY_DEPTH:
                capped = MAX_QUERY_DEPTH - ((MAX_QUERY_DEPTH - wraps) % 2)
                self.diagnostics.append(
                    "NOT chain deeper than the depth limit collapsed "
                    "parity-preserving"
                )
                wraps = capped
            for _ in range(wraps):
                q = Boolean((Clause(MUST_NOT, q),), None)
            occur = MUST_NOT
        return occur, q

    def primary(self, depth: int, scope) -> tuple[str | None, Query] | None:
        tok = self.next()
        if tok.kind == "LPAREN":
            return self._group(depth, scope, occur=tok.occur)
        if tok.kind == "QUOTE":
            q = self._text_leaf(tok, scope)
            if q is None:
                return None
            if tok.boost is not None:
                q = Boost(q, tok.boost)
            return tok.occur, q
        if tok.kind == "WORD":
            return self._word(tok, depth, scope)
        return None

    def _group(self, depth: int, scope, occur) -> tuple[str | None, Query] | None:
        if depth + 1 > MAX_QUERY_DEPTH:
            self.diagnostics.append("group depth limit exceeded; group dropped")
            self._skip_group()
            return None
        clauses, operator, attempted, deduped = self.or_expr(depth + 1, scope)
        boost = None
        closing = self.peek()
        if closing is not None and closing.kind == "RPAREN":
            rp = self.next()
            boost = rp.boost
        q: Query = _boolean_of(clauses, operator, attempted, deduped)
        if isinstance(q, Empty):
            if attempted == 0:
                self.diagnostics.append("empty group dropped")
            return None
        if boost is not None:
            q = Boost(q, boost)
        return occur, q

    def _word(self, tok: _Tok, depth: int, scope):
        # field-scope prefix: "field:" followed by a group / IN set / range
        if tok.fieldname is not None and not tok.text:
            f = self.schema.by_name(tok.fieldname)
            if f is None:
                self.diagnostics.append(f"unknown field {tok.fieldname}")
                self._maybe_skip_scope_payload()
                return None
            nxt = self.peek()
            if nxt is not None and nxt.kind == "LPAREN":
                self.next()
                return self._group(depth, f, occur=tok.occur)
            if nxt is not None and nxt.kind == "WORD" and nxt.text == "IN":
                self.next()
                return self._set_leaf(tok, f)
            self.diagnostics.append(f"dangling field scope {tok.fieldname} dropped")
            return None
        if tok.fieldname is not None:
            f = self.schema.by_name(tok.fieldname)
            if f is None:
                self.diagnostics.append(f"unknown field {tok.fieldname}")
                return None
            target: QueryField | None = f
        else:
            target = scope
        raw = tok.text
        if raw.startswith(("[", "{")):
            if target is None:
                self.diagnostics.append("range without field scope dropped")
                return None
            q = self._range_of(raw, target)
            if q is None:
                return None
            if tok.boost is not None:
                q = Boost(q, tok.boost)
            return tok.occur, q
        if raw == "IN":
            nxt = self.peek()
            if target is not None and nxt is not None and nxt.kind == "WORD" \
                    and nxt.text.startswith(("[", "{")):
                self.next()
                return self._set_of(nxt.text, target, tok.occur)
            # plain word 'IN' — falls through to analysis
        q = self._text_leaf(tok, scope)
        if q is None:
            return None
        if tok.boost is not None:
            q = Boost(q, tok.boost)
        return tok.occur, q

    def _maybe_skip_scope_payload(self) -> None:
        """After an unknown field scope, swallow its payload leniently."""
        nxt = self.peek()
        if nxt is None:
            return
        if nxt.kind == "LPAREN":
            self.next()
            self._skip_group()
        elif nxt.kind == "WORD" and nxt.text == "IN":
            self.next()
            after = self.peek()
            if after is not None and after.kind == "WORD" and \
                    after.text.startswith(("[", "{")):
                self.next()

    def _set_leaf(self, field_tok: _Tok, f: QueryField):
        nxt = self.peek()
        if nxt is None or nxt.kind != "WORD" or not nxt.text.startswith(("[", "{")):
            self.diagnostics.append(f"IN without value list on field {f.name} dropped")
            return None
        self.next()
        return self._set_of(nxt.text, f, field_tok.occur)

    def _set_of(self, raw: str, f: QueryField, occur):
        body = raw[1:-1] if raw[-1:] in "]}" else raw[1:]
        if f.kind == NUMERIC:
            # numeric fields compare int64 — string values can never
            # match (the reference parses bare terms on I64 fields
            # numerically, query.rs:2759; unparseable values drop)
            ivals: list[int] = []
            for v in body.split():
                try:
                    iv = int(v)
                except ValueError:
                    self.diagnostics.append(
                        f"non-numeric set value {v!r} on field "
                        f"{f.name} dropped"
                    )
                    continue
                if iv not in ivals:
                    ivals.append(iv)
            if not ivals:
                return None
            return occur, SetStr(f.name, tuple(ivals))
        values: list[str] = []
        for v in body.split():
            vv = v if f.kind == KEYWORD else v.lower()
            if vv not in values:
                values.append(vv)  # stable source-order dedup
        if not values:
            self.diagnostics.append(f"empty set on field {f.name} dropped")
            return None
        return occur, SetStr(f.name, tuple(values))

    def _range_of(self, raw: str, f: QueryField) -> Query | None:
        open_ch = raw[0]
        if raw[-1] in "]}":
            close_ch = raw[-1]
            body = raw[1:-1]
        elif any(c in raw[1:] for c in "]}"):
            # a closing bracket WITH trailing junk ('[a TO b]x'):
            # folding the junk into the upper bound would match a
            # garbage value (and silently read a '}' close as
            # inclusive) — drop like any other malformed range
            self.diagnostics.append(f"malformed range {raw!r} dropped")
            return None
        else:
            close_ch = "]"  # genuinely unclosed: lenient recovery
            body = raw[1:]
        parts = body.split()
        if len(parts) != 3 or parts[1] != "TO":
            self.diagnostics.append(f"malformed range {raw!r} dropped")
            return None
        lo_raw, hi_raw = parts[0], parts[2]

        def mk(v: str, incl: bool, numeric: bool) -> RangeBound | None:
            if v == "*":
                return RangeBound("Unbounded")
            kind = "Included" if incl else "Excluded"
            if numeric:
                try:
                    return RangeBound(kind, int(v))
                except ValueError:
                    return None
            return RangeBound(kind, v if f.kind == KEYWORD else v.lower())

        numeric = f.kind == NUMERIC
        lower = mk(lo_raw, open_ch == "[", numeric)
        upper = mk(hi_raw, close_ch == "]", numeric)
        if lower is None or upper is None:
            self.diagnostics.append(f"malformed range {raw!r} dropped")
            return None
        if numeric:
            return RangeI64(f.name, lower, upper)
        return RangeStr(f.name, lower, upper)

    def _skip_group(self) -> None:
        depth = 1
        while depth > 0:
            tok = self.peek()
            if tok is None:
                return
            self.next()
            if tok.kind == "LPAREN":
                depth += 1
            elif tok.kind == "RPAREN":
                depth -= 1

    def _target_fields(self, tok: _Tok, scope) -> tuple[QueryField, ...] | None:
        if tok.fieldname is not None:
            f = self.schema.by_name(tok.fieldname)
            if f is None:
                self.diagnostics.append(f"unknown field {tok.fieldname}")
                return None
            return (f,)
        if scope is not None:
            return (scope,)
        return self.schema.defaults

    def _text_leaf(self, tok: _Tok, scope) -> Query | None:
        fields = self._target_fields(tok, scope)
        if fields is None:
            return None
        raw = tok.text
        if not raw:
            return None
        if tok.kind == "WORD" and any(c in raw for c in "*?"):
            # keyword fields match raw text (schema.rs:39-74) — their
            # globs must not lowercase, or 'repo:Foo*' can never match
            keep_raw = len(fields) == 1 and fields[0].kind == KEYWORD
            return Glob(fields, raw if keep_raw else raw.lower())
        if len(fields) == 1 and fields[0].kind == KEYWORD:
            # Keyword fields match raw text, no analysis (schema.rs:39-74)
            return Term(fields, raw)
        tokens = analyze_default(raw)
        if not tokens:
            self.diagnostics.append(f"term {raw!r} produced no tokens; dropped")
            return None
        if len(tokens) == 1 and not tok.prefix and tok.slop == 0:
            return Term(fields, tokens[0].text)
        return Phrase(
            fields,
            tuple(PositionedTerm(t.position, t.text) for t in tokens),
            tok.slop,
            tok.prefix,
        )


def _boolean_of(
    clauses: list[Clause], operator: str | None, attempted: int, deduped: bool
) -> Query:
    if not clauses:
        return Empty()
    if (
        len(clauses) == 1
        and clauses[0].occur in (SHOULD, MUST)
        and operator is None
        and attempted == 1
        and not deduped
    ):
        return clauses[0].query
    return Boolean(tuple(clauses), operator)


# ---------------------------------------------------------------------------
# Canonicalizer (query.rs:379-436 — score-neutral rewrites)


def canonicalize(q: Query) -> Query:
    q = _canon(q)
    q = _repair_all_negative_root(q)
    return q


def _canon(q: Query) -> Query:
    if isinstance(q, Boost):
        inner = _canon(q.query)
        if isinstance(inner, Empty):
            return inner
        return Boost(inner, q.factor)
    if not isinstance(q, Boolean):
        return q
    out: list[Clause] = []
    out_seen: set[Clause] = set()  # mirrors out for O(1) membership
    seen_not: set = set()
    for c in q.clauses:
        cq = _canon(c.query)
        if isinstance(cq, Empty):
            if c.occur == MUST:
                return Empty()  # required clause can never match
            continue  # Should/MustNot Empty is droppable
        # flatten Should-of-Should: an operator-less all-Should boolean
        # inside a Should clause splices its children up (query.rs:3058)
        if c.occur == SHOULD and isinstance(cq, Boolean) and cq.operator is None \
                and all(cc.occur == SHOULD for cc in cq.clauses):
            for cc in cq.clauses:
                if cc not in out_seen:
                    out_seen.add(cc)
                    out.append(cc)
            continue
        if c.occur == MUST_NOT:
            if cq in seen_not:
                continue  # dedup MustNot
            seen_not.add(cq)
        cl = Clause(c.occur, cq)
        out_seen.add(cl)
        out.append(cl)
    if not out:
        return Empty()
    return Boolean(tuple(out), q.operator)


def _is_all_negative(q: Query) -> bool:
    if isinstance(q, Boolean):
        return bool(q.clauses) and all(
            c.occur == MUST_NOT or _is_all_negative(c.query) for c in q.clauses
        )
    if isinstance(q, Boost):
        return _is_all_negative(q.query)
    return False


def _repair_all_negative_root(q: Query) -> Query:
    """All-negative root gains a Should All clause (query.rs:3261-3301)."""
    if not _is_all_negative(q):
        return q
    if isinstance(q, Boolean):
        return Boolean(q.clauses + (Clause(SHOULD, All()),), q.operator)
    if isinstance(q, Boost):
        return Boost(_repair_all_negative_root(q.query), q.factor)
    return q


# ---------------------------------------------------------------------------
# Entry point


def parse_lenient(text: str, schema: ParserSchema = ENGINE_SCHEMA) -> ParsedQuery:
    """Never-erroring parse of user input into a canonical query tree."""
    diagnostics: list[str] = []
    was_truncated = False
    if len(text) > MAX_QUERY_LENGTH:
        text = text[:MAX_QUERY_LENGTH]
        was_truncated = True
        diagnostics.append("query truncated to 10000 scalars")
    toks = _lex(text, diagnostics)
    parser = _Parser(toks, schema, diagnostics)
    clauses, operator, attempted, deduped = parser.or_expr(0, None)
    query = _canon(_boolean_of(clauses, operator, attempted, deduped))
    repaired = _repair_all_negative_root(query)
    if repaired is not query:
        diagnostics.append("all-negative query repaired with All")
    return ParsedQuery(repaired, diagnostics, was_truncated)


# ---------------------------------------------------------------------------
# Glob translation (shared by oracle + Spark so expansions agree exactly)


def glob_to_regex(pattern: str) -> str:
    """Anchored regex for a ``*``/``?`` glob (same semantics both engines)."""
    import re as _re

    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def glob_match(pattern: str, term: str) -> bool:
    import re as _re

    return _re.fullmatch(glob_to_regex(pattern), term) is not None


def glob_to_like(pattern: str) -> str:
    """SQL LIKE pattern for the same glob (Spark/DuckDB term-dict filter)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# Tree helpers shared by lowering / execution


def walk_leaf_terms(q: Query) -> list[tuple[str, bool]]:
    """All text-field (term, needs_positions) pairs (dedup, stable order)."""
    seen: dict[str, bool] = {}
    order: list[str] = []

    def collect(node: Query) -> None:
        if isinstance(node, Term):
            if any(f.kind == TEXT for f in node.fields):
                if node.text not in seen:
                    seen[node.text] = False
                    order.append(node.text)
        elif isinstance(node, Phrase):
            for pt in node.terms:
                if pt.text not in seen:
                    seen[pt.text] = False
                    order.append(pt.text)
                seen[pt.text] = True
        elif isinstance(node, Boolean):
            for c in node.clauses:
                collect(c.query)
        elif isinstance(node, Boost):
            collect(node.query)

    collect(q)
    return [(t, seen[t]) for t in order]


def walk_text_fields(q: Query) -> list[str]:
    """Text field names referenced by Term/Phrase/Glob leaves (stable order)."""
    out: list[str] = []

    def add(fields) -> None:
        for f in fields:
            if f.kind == TEXT and f.name not in out:
                out.append(f.name)

    def collect(node: Query) -> None:
        if isinstance(node, (Term, Phrase, Glob)):
            add(node.fields)
        elif isinstance(node, Boolean):
            for c in node.clauses:
                collect(c.query)
        elif isinstance(node, Boost):
            collect(node.query)

    collect(q)
    return out


def walk_metadata_fields(q: Query) -> list[str]:
    """Keyword/numeric field names referenced by metadata leaves."""
    out: list[str] = []

    def add(name: str) -> None:
        if name not in out:
            out.append(name)

    def collect(node: Query) -> None:
        if isinstance(node, Term):
            for f in node.fields:
                if f.kind != TEXT:
                    add(f.name)
        elif isinstance(node, Glob):
            # keyword-field globs evaluate against the docmeta column
            # (kernel._eval_keyword_glob) — its values must load into
            # the eval context like any other metadata leaf's
            for f in node.fields:
                if f.kind != TEXT:
                    add(f.name)
        elif isinstance(node, (RangeStr, RangeI64, SetStr)):
            add(node.field)
        elif isinstance(node, Boolean):
            for c in node.clauses:
                collect(c.query)
        elif isinstance(node, Boost):
            collect(node.query)

    collect(q)
    return out


def contains_all_node(q: Query) -> bool:
    if isinstance(q, All):
        return True
    if isinstance(q, (RangeStr, RangeI64, SetStr)):
        return True  # metadata leaves match beyond the posting candidates
    if isinstance(q, Term):
        return any(f.kind != TEXT for f in q.fields)
    if isinstance(q, Glob):
        # a keyword-field glob is a metadata leaf too (kernel evaluates
        # it against the docmeta column): without this, a pure
        # `repo:org0/*` query fell through the executors' empty gate
        return any(f.kind != TEXT for f in q.fields)
    if isinstance(q, Boolean):
        return any(contains_all_node(c.query) for c in q.clauses)
    if isinstance(q, Boost):
        return contains_all_node(q.query)
    return False


def collect_globs(q: Query) -> list[Glob]:
    out: list[Glob] = []
    if isinstance(q, Glob):
        out.append(q)
    elif isinstance(q, Boolean):
        for c in q.clauses:
            out.extend(collect_globs(c.query))
    elif isinstance(q, Boost):
        out.extend(collect_globs(q.query))
    return out


def substitute_globs(q: Query, expansion: dict[Glob, Query]) -> Query:
    if isinstance(q, Glob):
        return expansion.get(q, Empty())
    if isinstance(q, Boolean):
        return Boolean(
            tuple(Clause(c.occur, substitute_globs(c.query, expansion)) for c in q.clauses),
            q.operator,
        )
    if isinstance(q, Boost):
        return Boost(substitute_globs(q.query, expansion), q.factor)
    return q
