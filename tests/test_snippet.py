"""Snippet generator (E13) + CASS helper parity with the language contract."""

import json

import pytest

from frankensearch_spark.analyze import cass_build_preview, cass_generate_edge_ngrams
from frankensearch_spark.functions.snippet import generate_snippet

FIXTURE = "/root/reference/tests/fixtures/quill_language_contract.json"


def _helper_cases(helper):
    with open(FIXTURE) as fh:
        return [c for c in json.load(fh)["helper_cases"] if c["helper"] == helper]


@pytest.mark.parametrize("case", _helper_cases("cass_generate_edge_ngrams"),
                         ids=lambda c: c["id"])
def test_edge_ngram_helper_cases(case):
    got = cass_generate_edge_ngrams(case["input"])
    if "expected" in case:
        assert " ".join(got) == case["expected"]
    if "expected_prefix_count" in case:
        assert len(got) == case["expected_prefix_count"]
    if "last_expected_prefix" in case:
        assert got[-1] == case["last_expected_prefix"]


@pytest.mark.parametrize("case", _helper_cases("cass_build_preview"),
                         ids=lambda c: c["id"])
def test_preview_helper_cases(case):
    assert cass_build_preview(case["input"], case["max_chars"]) == case["expected"]


# --- snippet kernel -------------------------------------------------------


def test_no_match_returns_none():
    assert generate_snippet("plain text here", {"absent": 3}) is None
    assert generate_snippet("", {"x": 1}) is None


def test_basic_highlight_and_escape():
    out = generate_snippet(
        'rust <ownership> & "borrowing"', {"rust": 2, "borrowing": 5}
    )
    # the fragment spans window-start .. last TOKEN end — the trailing
    # quote after 'borrowing' is outside the fragment
    assert out == '<b>rust</b> &lt;ownership&gt; &amp; &quot;<b>borrowing</b>'


def test_rare_term_window_wins():
    # df weights 1/(1+df): rare term dominates (snippet.rs test
    # document_frequency_weights_choose_the_rare_term_window)
    left = "common common common common"
    right = "rareterm plain"
    src = left + " " + "x " * 300 + right
    out = generate_snippet(src, {"common": 1000, "rareterm": 1}, max_chars=30)
    assert "<b>rareterm</b>" in out
    assert "common" not in out


def test_equal_score_prefers_earliest():
    src = "alpha one two three " + "y " * 200 + " alpha later words"
    out = generate_snippet(src, {"alpha": 3}, max_chars=25)
    assert out.startswith("<b>alpha</b> one")


def test_window_cap_respected():
    words = " ".join(f"w{i:03d}" for i in range(100))
    src = words + " target " + words
    out = generate_snippet(src, {"target": 1}, max_chars=40)
    plain = out.replace("<b>", "").replace("</b>", "")
    assert "target" in plain
    assert len(plain.encode()) <= 40 + 7  # window + one unsplit token slack


def test_fallback_prefix():
    out = generate_snippet(
        "no match at all " * 30, {"zzz": 5}, max_chars=20, fallback_prefix=True
    )
    assert out is not None and len(out) <= 21


def test_df_zero_terms_ignored():
    assert generate_snippet("hello world", {"hello": 0}) is None


def test_overlapping_highlights_collapse():
    out = generate_snippet("aa aa", {"aa": 1})
    assert out == "<b>aa</b> <b>aa</b>"


def test_unicode_byte_offsets():
    out = generate_snippet("éclair au café", {"café": 2})
    assert out == "éclair au <b>café</b>"
