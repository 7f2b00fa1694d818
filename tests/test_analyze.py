"""Analyzer tests — ported default-analyzer cases from the reference's
``tests/fixtures/quill_language_contract.json`` (analyzer_cases) plus the
token-admission boundary cases (scribe.rs:214-243)."""

from frankensearch_spark.analyze import (
    admit,
    analyze_default,
    split_code_token,
    tokenize_code_aware,
    tokenize_fast,
)
from frankensearch_spark.contract import MAX_TERM_BYTES

# (input, [(text, position, offset_from, offset_to)]) — byte offsets
DEFAULT_CASES = [
    # analyzer-default-ascii-split-lower
    ("Rust POL-358", [("rust", 0, 0, 4), ("pol", 1, 5, 8), ("358", 2, 9, 12)]),
    # analyzer-default-unicode-lower-offsets
    ("ÉCLAIR 東京", [("éclair", 0, 0, 7), ("東京", 1, 8, 14)]),
    # analyzer-default-unicode-lower-expansion (İ -> i + combining dot)
    ("İ", [("i̇", 0, 0, 2)]),
]


def test_default_analyzer_contract_cases():
    for text, expected in DEFAULT_CASES:
        got = [(t.text, t.position, t.offset_from, t.offset_to) for t in analyze_default(text)]
        assert got == expected, f"input {text!r}: {got} != {expected}"
        assert all(t.position_length == 1 for t in analyze_default(text))


def test_fast_tokenizer_matches_reference_stream():
    cases = [
        "Rust POL-358",
        "ÉCLAIR 東京",
        "İ",
        "snake_case_identifier camelCaseIdentifier",
        "src/main.rs config.toml",
        "  ---  ",
        "",
        "a1b2 C3d4 éé 42",
        "emoji \U0001F600 mixed",
    ]
    for text in cases:
        ref = [(t.text, t.position) for t in admit(analyze_default(text))]
        assert tokenize_fast(text) == ref, text


def test_snake_case_splits_camel_does_not():
    # '_' is non-alphanumeric -> splits; camelCase stays whole in default
    assert [t for t, _ in tokenize_fast("snake_case_id")] == ["snake", "case", "id"]
    assert [t for t, _ in tokenize_fast("camelCaseIdentifier")] == [
        "camelcaseidentifier"
    ]


def test_admission_boundary_65530_kept_65531_dropped_with_gap():
    # analyzer-tantivy-index-limit cases
    kept = "x" * MAX_TERM_BYTES
    dropped = "x" * (MAX_TERM_BYTES + 1)
    assert tokenize_fast(f"a {kept} b") == [("a", 0), (kept, 1), ("b", 2)]
    # dropped token leaves a position gap
    assert tokenize_fast(f"a {dropped} b") == [("a", 0), ("b", 2)]
    toks = admit(analyze_default(f"a {dropped} b"))
    assert [(t.text, t.position) for t in toks] == [("a", 0), ("b", 2)]


def test_multibyte_admission_counts_bytes():
    # 32766 three-byte chars = 98298 bytes > 65530 -> dropped
    tok = "東" * 32766
    assert tokenize_fast(f"a {tok}") == [("a", 0)]
    # 21843 three-byte chars = 65529 bytes -> kept
    tok = "東" * 21843
    assert tokenize_fast(f"a {tok}") == [("a", 0), (tok, 1)]


def test_code_aware_extension():
    got = tokenize_code_aware("camelCaseIdentifier HTTPServer2")
    # whole tokens at their positions plus parts at the same position
    assert ("camelcaseidentifier", 0) in got
    assert ("camel", 0) in got and ("case", 0) in got and ("identifier", 0) in got
    assert ("httpserver2", 1) in got
    assert ("http", 1) in got and ("server", 1) in got and ("2", 1) in got
    assert split_code_token("simple") == []
    assert split_code_token("HTTPServer2") == ["http", "server", "2"]


# --- CASS analyzer family (T4, scribe.rs:794-1010) ------------------------

FIXTURE = "/root/reference/tests/fixtures/quill_language_contract.json"


def _cass_cases():
    import json

    with open(FIXTURE) as fh:
        data = json.load(fh)
    return [
        c
        for c in data["analyzer_cases"]
        if c.get("analyzer") in ("hyphen_normalize", "prefix_normalize")
    ]


def test_cass_analyzer_contract_cases():
    from frankensearch_spark.analyze import analyze_cass

    ran = 0
    for c in _cass_cases():
        hyphen = c["analyzer"] == "hyphen_normalize"
        if "input" in c:
            toks = analyze_cass(c["input"], hyphen_decompose=hyphen)
            got = [
                [t.text, t.position, t.offset_from, t.offset_to] for t in toks
            ]
            exp = [
                [t["text"], t["position"], t["offset_from"], t["offset_to"]]
                for t in c["expected_tokens"]
            ]
            assert got == exp, c["id"]
            ran += 1
        elif "generated_input" in c:
            gi = c["generated_input"]
            text = gi["repeat"] * gi.get("count", gi.get("count_bytes", 0))
            toks = analyze_cass(text, hyphen_decompose=hyphen)
            if "expected_token_count" in c:
                assert len(toks) == c["expected_token_count"], c["id"]
                assert len(toks[0].text.encode()) == c["expected_token_bytes"]
                assert set(toks[0].text) == {c["expected_token_repeat"]}
            else:
                assert [
                    [t.text] for t in toks
                ] == [[t["text"]] for t in c["expected_tokens"]], c["id"]
            ran += 1
    assert ran == 8  # every CASS analyzer case exercised


def test_cass_prefix_skips_hyphen_decompose():
    from frankensearch_spark.analyze import analyze_cass

    full = analyze_cass("BD-Q3FY", hyphen_decompose=True)
    pre = analyze_cass("BD-Q3FY", hyphen_decompose=False)
    assert [t.text for t in full] == ["bd-q3fy", "bd", "q3fy"]
    assert [t.text for t in pre] == ["bd-q3fy"]


def test_final_sigma_lowering_matches_reference():
    """str.lower applies Unicode's context-sensitive final-sigma rule
    (trailing Σ -> ς) but the reference lowers per character (Σ -> σ
    always); the fast tokenizers must match analyze_default exactly, or
    Greek index terms never match parsed query terms."""
    for text in ("ΟΔΟΣ", "κείμενο ΤΕΛΟΣ εδώ", "ΣΟΦΙΑ ΟΔΟΣ ς", "mixed ΛΟΓΟΣ tail"):
        exp = [(t.text, t.position) for t in admit(analyze_default(text))]
        assert tokenize_fast(text) == exp, text
        code = tokenize_code_aware(text)
        # code-aware emits the default stream plus parts — the default
        # stream must embed exactly
        assert [p for p in code if p in exp] == exp, text
