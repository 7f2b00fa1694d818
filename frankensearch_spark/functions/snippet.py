"""Snippet generation (SURVEY.md E13 — quill/snippet.rs re-expressed).

Pinned behavior (snippet.rs:1-12, 165-253): token offsets are BYTE
offsets on the trimmed source; fragment score sums one document-frequency
weight ``1/(1+df)`` (f32) per matching token occurrence; equal-score
fragments prefer the earliest then shortest window
(snippet.rs:267-272); fragment boundaries never split a token, so one
oversized token may exceed ``max_chars``; source text is HTML-escaped
before trusted highlight tags are inserted (snippet.rs:274-335).

The Spark integration (:func:`snippets_for_topk`) joins top-k rows with
their source text and runs the generator in one pandas pass.
"""

from __future__ import annotations

import html

import numpy as np

from frankensearch_spark.analyze import analyze_default
from frankensearch_spark.contract import MAX_TERM_BYTES

DEFAULT_SNIPPET_MAX_CHARS = 200  # snippet.rs:22


def _escape_html(text: str) -> str:
    # stdlib html.escape(quote=True) emits exactly the reference's five
    # entities (&amp; &lt; &gt; &quot; &#x27;) — byte-identical to the
    # per-char loop it replaces, but in C
    return html.escape(text, quote=True)


def _collapse_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    ranges = sorted(set(ranges))
    out: list[list[int]] = []
    for s, e in ranges:
        if out and out[-1][1] > s:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [(s, e) for s, e in out]


class _Fragment:
    __slots__ = ("score", "start", "stop", "highlighted")

    def __init__(self, start: int):
        self.score = np.float32(0.0)
        self.start = start
        self.stop = start
        self.highlighted: list[tuple[int, int]] = []


def _better(cand: _Fragment, best: _Fragment | None) -> bool:
    if best is None:
        return True
    if cand.score != best.score:
        return cand.score > best.score
    if cand.start != best.start:
        return cand.start < best.start  # earliest
    return cand.stop < best.stop  # then shortest


def generate_snippet(
    source: str,
    term_dfs: dict[str, int],
    max_chars: int = DEFAULT_SNIPPET_MAX_CHARS,
    highlight_prefix: str = "<b>",
    highlight_postfix: str = "</b>",
    fallback_prefix: bool = False,
) -> str | None:
    """Oracle-compatible highlighted snippet, or None when nothing matches.

    ``term_dfs``: analyzed term -> snapshot document frequency; empty
    terms and df==0 are ignored; duplicate text keeps the greatest weight
    (snippet.rs:120-145)."""
    source = source.strip() if source else ""
    if not source:
        return None

    weights: dict[str, np.float32] = {}
    for text, df in term_dfs.items():
        if not text or df == 0:
            continue
        w = np.float32(1.0) / (np.float32(1.0) + np.float32(df))
        if text not in weights or w > weights[text]:
            weights[text] = w

    src_bytes = source.encode("utf-8")
    current = _Fragment(0)
    best: _Fragment | None = None
    fallback_stop = 0

    for tok in analyze_default(source):
        if tok.offset_to <= max_chars:
            fallback_stop = tok.offset_to
        if tok.offset_to - current.start > max_chars:
            completed = current
            current = _Fragment(tok.offset_from)
            if completed.score > 0 and _better(completed, best):
                best = completed
        current.stop = tok.offset_to
        if len(tok.text.encode("utf-8")) <= MAX_TERM_BYTES and tok.text in weights:
            current.score = np.float32(current.score + weights[tok.text])
            current.highlighted.append((tok.offset_from, tok.offset_to))
    if current.score > 0 and _better(current, best):
        best = current

    if best is not None:
        text_bytes = src_bytes[best.start : best.stop]
        rel = [(s - best.start, e - best.start) for s, e in best.highlighted]
        out = []
        cursor = 0
        for s, e in _collapse_ranges(rel):
            out.append(_escape_html(text_bytes[cursor:s].decode("utf-8")))
            out.append(highlight_prefix)
            out.append(_escape_html(text_bytes[s:e].decode("utf-8")))
            out.append(highlight_postfix)
            cursor = e
        out.append(_escape_html(text_bytes[cursor:].decode("utf-8")))
        return "".join(out)

    if not fallback_prefix:
        return None
    if len(src_bytes) <= max_chars:
        stop = len(src_bytes)
    elif fallback_stop == 0:
        stop = max_chars
        while stop > 0 and (src_bytes[stop] & 0xC0) == 0x80:
            stop -= 1  # back off to a char boundary
    else:
        stop = fallback_stop
    if stop == 0:
        return None
    return _escape_html(src_bytes[:stop].decode("utf-8"))


def snippets_for_topk(
    index,
    corpus,
    topk_rows,
    query_terms: list[str],
    content_col: str = "content",
    max_chars: int = DEFAULT_SNIPPET_MAX_CHARS,
    key_cols: list[str] | None = None,
) -> list[tuple[int, str | None]]:
    """Generate snippets for collected top-k rows.

    ``topk_rows``: [(docid, score)] as returned by the search paths;
    the k source texts are fetched with one semi-joined collect (k is
    small — this is driver-side post-processing, E13).  A docid-less
    ``corpus`` needs explicit ``key_cols`` to attach docids via
    docmeta — joining on "whatever columns happen to be shared" could
    silently match nothing (every snippet None) or cross-join."""
    from pyspark.sql import functions as F

    docids = [int(d) for d, _s in topk_rows]
    if not docids:
        return []
    # the index's own df lookup serves from the preload_termstats cache
    # (with negative caching) — a raw termstats collect here would pay
    # an extra Spark job per call even on a fully warmed engine.
    # Multi-field wrappers expose it on their primary field (snippets
    # df-weight by the content field, matching the reference).
    sub = index if hasattr(index, "df_of_terms") else index.primary
    dfs = sub.df_of_terms(list(dict.fromkeys(query_terms)))
    term_dfs = {t: int(dfs.get(t) or 0) for t in query_terms}
    if "docid" in corpus.columns:
        src = corpus
    elif key_cols:
        src = index.docmeta.select("docid", *key_cols).join(
            corpus, list(key_cols)
        )
    else:
        raise ValueError(
            "corpus has no docid column and no key_cols were given; "
            "pass key_cols=[...] so docids attach via docmeta"
        )
    texts = {
        int(r["docid"]): r[content_col]
        for r in src.filter(F.col("docid").isin(docids))
        .select("docid", content_col)
        .collect()
    }
    return [
        (d, generate_snippet(texts.get(d, ""), term_dfs, max_chars))
        for d in docids
    ]
