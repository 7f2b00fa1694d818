"""CASS semantic-search query surface (SURVEY.md T4/Q1-adjacent —
re-expression of ``quill/query.rs:3386-4320``).

The CASS grammar is intentionally non-standard (query.rs:3580-3585):

* implicit conjunction — juxtaposed operands are Must;
* **OR binds tighter than AND** (the reverse of the default parser);
* ``&&`` / ``||`` symbolic operators; ``AND``/``OR``/``NOT`` any case;
* ``NOT`` / leading ``-`` is idempotent, not parity-based; a negative OR
  operand or all-negative root is complemented via ``All + MustNot``;
* empty input parses to All;
* sanitization replaces every scalar except alnum / ``*`` / ``"`` / ``-``
  with a space (``?`` is NOT a wildcard);
* wildcard classes: Exact / Prefix lower through exact term queries over
  the four searchable fields, Suffix / Substring / Complex lower through
  FST-regex globs over (content, title);
* CJK runs become character bigrams joined with AND;
* structured filters (agents / workspaces / created range / source)
  append Must clauses to the root in pinned order.

Verified against all 39 ``parser: cass`` parse_tree_cases of the
language contract fixture.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import pandas as pd

from frankensearch_spark.query_ast import (
    KEYWORD,
    MUST,
    MUST_NOT,
    NUMERIC,
    SHOULD,
    TEXT,
    All,
    Boolean,
    Clause,
    Empty,
    Glob,
    MAX_QUERY_LENGTH,
    ParsedQuery,
    ParserSchema,
    Phrase,
    PositionedTerm,
    Query,
    QueryField,
    RangeBound,
    RangeI64,
    Term,
)

CASS_SCHEMA = ParserSchema(
    fields=(
        QueryField("title", 1.0, TEXT),
        QueryField("content", 1.0, TEXT),
        QueryField("title_prefix", 1.0, TEXT, basic=True),
        QueryField("content_prefix", 1.0, TEXT, basic=True),
        QueryField("agent", 1.0, KEYWORD),
        QueryField("workspace", 1.0, KEYWORD),
        QueryField("source_id", 1.0, KEYWORD),
        QueryField("origin_kind", 1.0, KEYWORD),
        QueryField("created_at", 1.0, NUMERIC),
    ),
    default_names=("title", "content", "title_prefix", "content_prefix"),
)

_SEARCHABLE = tuple(
    CASS_SCHEMA.by_name(n)
    for n in ("title", "content", "title_prefix", "content_prefix")
)
_REGEX_FIELDS = tuple(CASS_SCHEMA.by_name(n) for n in ("content", "title"))
_PHRASE_FIELDS = tuple(CASS_SCHEMA.by_name(n) for n in ("title", "content"))


@dataclass
class CassQueryFilters:
    """Structured filters appended to the native query (query.rs:3400-3412)."""

    agents: list[str] = dc_field(default_factory=list)
    workspaces: list[str] = dc_field(default_factory=list)
    created_from: int | None = None
    created_to: int | None = None
    source_filter: str = "all"  # all | local | remote | source_id
    source_id: str | None = None


# ---------------------------------------------------------------------------
# Wildcard classification (query.rs:3415-3467)


@dataclass(frozen=True)
class CassWildcard:
    kind: str  # Exact | Prefix | Suffix | Substring | Complex
    core: str  # lowercased core (pattern for Complex)

    def to_regex(self) -> str | None:
        if self.kind == "Suffix":
            return ".*" + _escape_regex(self.core)
        if self.kind == "Substring":
            return ".*" + _escape_regex(self.core) + ".*"
        if self.kind == "Complex":
            return _complex_regex(self.core)
        return None


_REGEX_SPECIALS = set("\\.+*?()[]{}|^$")


def _escape_regex(value: str) -> str:
    return "".join(("\\" + c) if c in _REGEX_SPECIALS else c for c in value)


def _complex_regex(pattern: str) -> str:
    out = []
    if pattern.startswith("*"):
        out.append(".*")
    core = pattern.lstrip("*").rstrip("*")
    for ch in core:
        if ch == "*":
            out.append(".*")
        elif ch in _REGEX_SPECIALS - {"*"}:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if pattern.endswith("*"):
        out.append(".*")
    return "".join(out)


def classify_wildcard(term: str) -> CassWildcard:
    starts = term.startswith("*")
    ends = term.endswith("*")
    core = term.strip("*")
    if not core:
        return CassWildcard("Exact", "")
    if "*" in core:
        return CassWildcard("Complex", term.lower())
    core = core.lower()
    if starts and ends:
        return CassWildcard("Substring", core)
    if starts:
        return CassWildcard("Suffix", core)
    if ends:
        return CassWildcard("Prefix", core)
    return CassWildcard("Exact", core)


# ---------------------------------------------------------------------------
# Sanitize / lex (query.rs:3469-3479, 4041-4117)


def cass_sanitize_query(raw: str) -> str:
    return "".join(
        ch if (ch.isalnum() or ch in '*"-') else " " for ch in raw
    )


@dataclass
class _Tok:
    kind: str  # TERM PHRASE AND OR NOT
    text: str = ""


def cass_lex(query: str, diagnostics: list[str]) -> list[_Tok]:
    tokens: list[_Tok] = []
    word: list[str] = []

    def flush() -> None:
        if not word:
            return
        text = "".join(word)
        word.clear()
        up = text.upper()
        if up == "AND":
            tokens.append(_Tok("AND"))
        elif up == "OR":
            tokens.append(_Tok("OR"))
        elif up == "NOT":
            tokens.append(_Tok("NOT"))
        else:
            tokens.append(_Tok("TERM", text))

    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if ch == '"':
            flush()
            end = query.find('"', i + 1)
            if end == -1:
                phrase = query[i + 1 :]
                diagnostics.append("CASS syntax recovery: unterminated phrase")
                i = n
            else:
                phrase = query[i + 1 : end]
                i = end + 1
            if phrase:
                tokens.append(_Tok("PHRASE", phrase))
            continue
        if ch == "&" and i + 1 < n and query[i + 1] == "&":
            flush()
            tokens.append(_Tok("AND"))
            i += 2
            continue
        if ch == "|" and i + 1 < n and query[i + 1] == "|":
            flush()
            tokens.append(_Tok("OR"))
            i += 2
            continue
        if ch == "-" and not word:
            tokens.append(_Tok("NOT"))
            i += 1
            continue
        if ch in " \t\n":
            flush()
            i += 1
            continue
        word.append(ch)
        i += 1
    flush()
    return tokens


# ---------------------------------------------------------------------------
# Lowering (query.rs:3787-3940)


def _is_cjk_str(s: str) -> bool:
    from frankensearch_spark.analyze import is_cass_cjk

    return any(is_cass_cjk(c) for c in s)


def _cjk_terms(term: str) -> list[str]:
    from frankensearch_spark.analyze import is_cass_cjk

    chars = [c for c in term if is_cass_cjk(c)]
    if len(chars) <= 1:
        return chars
    return [chars[k] + chars[k + 1] for k in range(len(chars) - 1)]


def _required_query(queries: list[Query]) -> Query:
    queries = [q for q in queries if not isinstance(q, Empty)]
    if not queries:
        return Empty()
    if len(queries) == 1:
        return queries[0]
    return Boolean(tuple(Clause(MUST, q) for q in queries), "AND")


def _complement(q: Query) -> Query:
    return Boolean((Clause(MUST, All()), Clause(MUST_NOT, q)), None)


def _lower_term_part(raw: str) -> Query | None:
    wc = classify_wildcard(raw)
    if wc.kind in ("Exact", "Prefix"):
        if not wc.core:
            return None
        if _is_cjk_str(wc.core):
            return _required_query(
                [Term(_SEARCHABLE, t) for t in _cjk_terms(wc.core)]
            )
        return Term(_SEARCHABLE, wc.core)
    return Glob(_REGEX_FIELDS, raw.lower())


def _lower_compound(parts: list[str]) -> Query:
    lowered = [_lower_term_part(p) for p in parts]
    return _required_query([q for q in lowered if q is not None])


def lower_term(raw: str) -> Query:
    return _lower_compound(cass_sanitize_query(raw).split())


def lower_phrase(raw: str) -> Query:
    terms = [
        t.strip("*").lower()
        for t in cass_sanitize_query(raw).split()
    ]
    terms = [t for t in terms if t]
    if len(terms) <= 1 or any(_is_cjk_str(t) for t in terms):
        return _lower_compound(terms)
    return Phrase(
        _PHRASE_FIELDS,
        tuple(PositionedTerm(i, t) for i, t in enumerate(terms)),
        0,
        False,
    )


# ---------------------------------------------------------------------------
# Grammar (query.rs:4133-4316): OR tighter than AND, idempotent NOT


def _flush_or_group(pending: list[Query], clauses: list[Clause]) -> None:
    if not pending:
        return
    q = Boolean(tuple(Clause(SHOULD, x) for x in pending), "OR")
    pending.clear()
    clauses.append(Clause(MUST, q))


def _apply_query(
    query: Query,
    next_occur: str,
    state: dict,
    pending: list[Query],
    clauses: list[Clause],
) -> None:
    if state["in_or"] and state["just_or"]:
        if not pending and clauses and clauses[-1].occur in (MUST, MUST_NOT):
            prev = clauses.pop()
            pending.append(
                _complement(prev.query) if prev.occur == MUST_NOT else prev.query
            )
        pending.append(_complement(query) if next_occur == MUST_NOT else query)
    else:
        _flush_or_group(pending, clauses)
        state["in_or"] = False
        clauses.append(Clause(next_occur, query))
    state["just_or"] = False


def _finish(clauses: list[Clause]):
    if len(clauses) == 1:
        c = clauses[0]
        return c.query, c.occur == MUST_NOT
    if not clauses:
        return None, False
    if all(c.occur == MUST_NOT for c in clauses):
        clauses = [Clause(MUST, All())] + clauses
    return Boolean(tuple(clauses), "AND"), False


def parse_cass(
    raw_query: str, filters: CassQueryFilters | None = None
) -> ParsedQuery:
    """Never-erroring CASS parse (query.rs:3649-3731)."""
    filters = filters or CassQueryFilters()
    diagnostics: list[str] = []
    was_truncated = False
    if len(raw_query) > MAX_QUERY_LENGTH:
        raw_query = raw_query[:MAX_QUERY_LENGTH]
        was_truncated = True
        diagnostics.append(
            f"CASS query truncated to {MAX_QUERY_LENGTH} Unicode scalar values"
        )

    tokens = cass_lex(raw_query, diagnostics)
    clauses: list[Clause] = []
    pending: list[Query] = []
    state = {"in_or": False, "just_or": False}
    next_occur = MUST
    saw_operand = False
    last_binary = False
    dangling_not = False

    for tok in tokens:
        if tok.kind == "AND":
            if not saw_operand or last_binary:
                diagnostics.append(
                    "CASS syntax recovery: AND without an adjacent operand was recovered"
                )
            if dangling_not:
                diagnostics.append("CASS syntax recovery: NOT has no operand before AND")
                dangling_not = False
            _flush_or_group(pending, clauses)
            state["in_or"] = False
            state["just_or"] = False
            next_occur = MUST
            last_binary = True
        elif tok.kind == "OR":
            if not saw_operand or last_binary:
                diagnostics.append(
                    "CASS syntax recovery: OR without an adjacent operand was recovered"
                )
            state["in_or"] = True
            state["just_or"] = True
            last_binary = True
        elif tok.kind == "NOT":
            if not state["just_or"]:
                _flush_or_group(pending, clauses)
                state["in_or"] = False
                state["just_or"] = False
            next_occur = MUST_NOT
            dangling_not = True
            last_binary = False
        else:
            q = lower_term(tok.text) if tok.kind == "TERM" else lower_phrase(tok.text)
            if isinstance(q, Empty):
                diagnostics.append(
                    f"CASS syntax recovery: empty {tok.kind.lower()} operand was skipped"
                )
                continue
            _apply_query(q, next_occur, state, pending, clauses)
            next_occur = MUST
            saw_operand = True
            last_binary = False
            dangling_not = False

    _flush_or_group(pending, clauses)
    if dangling_not:
        diagnostics.append("CASS syntax recovery: dangling NOT has no operand")
    if last_binary:
        diagnostics.append(
            "CASS syntax recovery: dangling binary operator has no operand"
        )

    node, negative = _finish(clauses)
    root: Query = All() if node is None else (
        _complement(node) if negative else node
    )
    query = _apply_filters(root, filters)
    return ParsedQuery(query, diagnostics, was_truncated)


def _apply_filters(root: Query, f: CassQueryFilters) -> Query:
    if (
        not f.agents
        and not f.workspaces
        and f.created_from is None
        and f.created_to is None
        and f.source_filter == "all"
    ):
        return root
    clauses: list[Clause] = [Clause(MUST, root)]

    def string_filter(field_name: str, values: list[str]) -> Query | None:
        if not values:
            return None
        fld = (CASS_SCHEMA.by_name(field_name),)
        return Boolean(
            tuple(Clause(SHOULD, Term(fld, v)) for v in values), None
        )

    agents = string_filter("agent", f.agents)
    if agents is not None:
        clauses.append(Clause(MUST, agents))
    workspaces = string_filter("workspace", f.workspaces)
    if workspaces is not None:
        clauses.append(Clause(MUST, workspaces))
    if f.created_from is not None or f.created_to is not None:
        clauses.append(
            Clause(
                MUST,
                RangeI64(
                    "created_at",
                    RangeBound("Included", f.created_from)
                    if f.created_from is not None
                    else RangeBound("Unbounded"),
                    RangeBound("Included", f.created_to)
                    if f.created_to is not None
                    else RangeBound("Unbounded"),
                ),
            )
        )
    source = None
    if f.source_filter == "local":
        source = ("origin_kind", "local")
    elif f.source_filter == "remote":
        source = ("origin_kind", "ssh")
    elif f.source_filter == "source_id":
        if f.source_id is None:
            # the reference makes this state unrepresentable
            # (SourceFilter::SourceId(String)); silently applying NO
            # filter would widen a filtering surface to all sources
            raise ValueError(
                "source_filter='source_id' requires source_id"
            )
        source = ("source_id", f.source_id)
    if source is not None:
        fld = (CASS_SCHEMA.by_name(source[0]),)
        clauses.append(Clause(MUST, Term(fld, source[1])))
    if len(clauses) == 1:
        return clauses[0].query
    return Boolean(tuple(clauses), None)


# ---------------------------------------------------------------------------
# Prefix-field build support (CASS_SEMANTIC_SCHEMA fields 8/9,
# schema.rs:442-458; document-side expansion cass_compat.rs:1704-1707)

CASS_CONTENT_PREFIX_MAX_BYTES = 4 * 1024  # cass_compat.rs:2037


def with_cass_prefix_columns(
    df,
    title_col: str = "title",
    content_col: str = "content",
    title_out: str = "title_prefix_text",
    content_out: str = "content_prefix_text",
):
    """Derive the pre-expanded edge-ngram prefix columns for a CASS
    corpus: ``title_prefix`` over the whole title, ``content_prefix``
    over the largest char-boundary prefix of content ≤ 4 KiB
    (cass_prefix_source, cass_compat.rs:2047-2063).  The emitted text is
    space-separated ngram tokens — the downstream default analyzer
    re-tokenizes them verbatim, so the indexed terms are exactly the
    ngrams.  These fields carry the Basic record option (tf=1 scoring,
    ``CASS_SCHEMA`` basic=True)."""
    from pyspark.sql.pandas.functions import pandas_udf

    from frankensearch_spark.analyze import cass_generate_edge_ngrams

    def derive(series, cap):
        out = []
        for v in series:
            if v is None:
                out.append(None)
                continue
            s = v
            if cap is not None:
                b = s.encode("utf-8")
                if len(b) > cap:
                    # largest char boundary <= cap: drop the partial char
                    s = b[:cap].decode("utf-8", errors="ignore")
            out.append(" ".join(cass_generate_edge_ngrams(s)))
        return pd.Series(out, dtype=object)

    @pandas_udf("string")
    def title_ngrams(s: pd.Series) -> pd.Series:
        return derive(s, None)

    @pandas_udf("string")
    def content_ngrams(s: pd.Series) -> pd.Series:
        return derive(s, CASS_CONTENT_PREFIX_MAX_BYTES)

    from pyspark.sql import functions as F

    return df.withColumn(title_out, title_ngrams(F.col(title_col))).withColumn(
        content_out, content_ngrams(F.col(content_col))
    )
