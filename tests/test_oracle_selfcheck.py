"""Hand-verified golden expectations for the test oracle itself (SURVEY.md §5.2.2).

Every row here was computed by hand from the reference source
(OCRPage.java:64-121, 140-145) once, then frozen.  If these fail, the oracle
drifted from the Java semantics and all downstream parity tests are void.
"""

from __future__ import annotations

import pytest

from . import oracle

# (token, expected category) — FIXTURES.md §4, hand-derived.
CLASSIFY_CASES = [
    (";", "punct"),
    (".", "punct"),
    ("1,234.56", "number_objects"),
    ("$100", "number_objects"),
    ("12/25/1694", "number_objects"),
    ("12%", "number_objects"),
    ("1694", "number_objects"),
    ("I", "single_letter"),
    ("é", "single_letter"),
    ("ſ", "single_letter"),
    ("mmmm", "ge4_repeated"),
    ("a----b", "ge4_repeated"),
    ("bookkkkeeper", "ge4_repeated"),
    ("MMMM", "ge4_repeated"),          # lowercased before the find
    ("!!", "len_gt1_nonalpha"),        # cleans to "" → 0==0 → garbage
    ("***", "len_gt1_nonalpha"),
    ("?!?", "len_gt1_nonalpha"),
    ("a.", "clean_short"),             # cleans to "a", len 1
    ("(at", "clean_short"),            # cleans to "at", len 2
    ("to", "clean_short"),
    ("whereunto", "clean_all_alpha"),
    ("eſtimation", "clean_all_alpha"),
    ("cœlum", "clean_all_alpha"),
    ("vn'to", "clean_one_nonalpha"),
    ("qu3en", "clean_one_nonalpha"),   # digit is \P{L}
    ("q3e1n", "clean_two_nonalpha"),
    ("h0u5e", "clean_two_nonalpha"),
    ("h0u5e9", "clean_3plus_nonalpha"),
    (".token...", "clean_all_alpha"),  # ≤1 leading + ≤3 trailing stripped
    ("..token", "clean_one_nonalpha"), # only ONE leading punct removed
    ("token....", "ge4_repeated"),        # repeated-run check precedes cleaning
    ("token.!?,", "clean_one_nonalpha"),  # only THREE trailing removed → "token."
    ("....", "ge4_repeated"),          # 4-run of '.' caught before cleaning
    ("don’t", "clean_one_nonalpha"),   # U+2019 is NOT ASCII punct → survives clean
    ("«", "single_letter_not"),        # placeholder replaced below
]
CLASSIFY_CASES[-1] = ("«", "len_gt1_nonalpha")  # 1 char, not ASCII punct, not letter


@pytest.mark.parametrize("token,expected", CLASSIFY_CASES)
def test_classify_token(token, expected):
    assert oracle.classify_token(token) == expected


def test_clean_token():
    # OCRPage.java:140-145: ≤1 leading, ≤3 trailing ASCII punct.
    assert oracle.clean_token(".token...") == "token"
    assert oracle.clean_token("..token") == ".token"
    assert oracle.clean_token("token....") == "token."
    assert oracle.clean_token("!!") == ""
    assert oracle.clean_token("don’t") == "don’t"
    assert oracle.clean_token("(at") == "at"


def test_java_trim():
    assert oracle.java_trim("\x00\x1f hello \t\n") == "hello"
    assert oracle.java_trim(" x ") == " x "  # nbsp NOT trimmed


def test_simple_tokenizer_class_runs():
    # OpenNLP SimpleTokenizer: '...' one token, '?!' two tokens.
    assert oracle.simple_tokenize("wait... what?!") == ["wait", "...", "what", "?", "!"]
    assert oracle.simple_tokenize("ab12cd") == ["ab", "12", "cd"]
    assert oracle.simple_tokenize("a--b  c") == ["a", "--", "b", "c"]
    assert oracle.simple_tokenize("") == []
    assert oracle.simple_tokenize("   ") == []
    assert oracle.simple_tokenize("don’t") == ["don", "’", "t"]


def test_txt_parse_dehyphenation():
    # TxtPage.java:50-52 — estima-\ntion → estimation.
    page = oracle.parse_txt("is not estima-\ntion now\n")
    assert [t.text for t in page.tokens] == ["is", "not", "estimation", "now"]


def test_txt_hyphen_chain_no_rescan():
    # replaceAll scans left-to-right without re-scanning replaced text:
    # "aaa-\nbbb-\nccc" → "aaabbb-\nccc"; the leftover '-' then becomes its own
    # token under SimpleTokenizer's class-run rule.
    page = oracle.parse_txt("aaa-\nbbb-\nccc\n")
    assert [t.text for t in page.tokens] == ["aaabbb", "-", "ccc"]


def test_hyphen_join_semantics():
    toks = [oracle.Token("con-", True), oracle.Token("tin-", True),
            oracle.Token("ua-", True), oracle.Token("tion", False)]
    assert oracle.final_tokens(toks) == ["contin-", "uation"]
    # trailing hyphen with no next token is kept
    assert oracle.final_tokens([oracle.Token("end-", True)]) == ["end-"]
    # not last on line → no join
    assert oracle.final_tokens([oracle.Token("mid-", False), oracle.Token("x", False)]) \
        == ["mid-", "x"]
    # consumed token may be empty → hyphen dropped, nothing appended
    assert oracle.final_tokens([oracle.Token("half-", True), oracle.Token("  ", False)]) \
        == ["half"]


def test_scores_formula():
    s = oracle.PageStats(token_count=10, clean_all_alpha=4, clean_one_nonalpha=2,
                         clean_two_nonalpha=1, punct=1, number_objects=1,
                         single_letter=0, clean_short=1)
    # correctable = 7 / (10 - 2 - 1) = 1.0; quality = 7/10
    assert s.correctable_score == pytest.approx(7 / 7)
    assert s.quality_score == pytest.approx(0.7)
    empty = oracle.PageStats()
    assert empty.correctable_score == -1.0
    assert empty.quality_score == -1.0
    # ignored-only page: quality 0, correctable -1 (0/0)
    ign = oracle.PageStats(token_count=3, punct=1, number_objects=1, single_letter=1)
    assert ign.correctable_score == -1.0
    assert ign.quality_score == 0.0


def test_hocr_parse_fixture():
    from page_evaluator_spark.corpus import make_hocr

    xml = make_hocr([["Quality", "eſti-"], ["mation", "of", "pages"], []])
    page = oracle.parse_hocr(xml)
    assert page.error is None
    assert page.page_id == "page_1"
    assert page.ocr_engine == "tesseract 3.02"
    assert [t.text for t in page.tokens] == ["Quality", "eſti-", "mation", "of", "pages"]
    assert [t.is_last_on_line for t in page.tokens] == [False, True, False, False, True]
    assert oracle.final_tokens(page.tokens) == ["Quality", "eſtimation", "of", "pages"]


def test_hocr_missing_meta_capabilities():
    from page_evaluator_spark.corpus import make_hocr

    page = oracle.parse_hocr(make_hocr([["w"]], with_meta=False))
    assert page.ocr_engine == ""
    assert page.ocr_capabilities == [""]  # "".split(" ") — HOCRPage.java:49-51


def test_hocr_quarantine_cases():
    from page_evaluator_spark.corpus import make_hocr

    assert oracle.parse_hocr(make_hocr([["w"]], with_page=False)).error is not None
    assert oracle.parse_hocr(make_hocr([["a", "b"]], bad_title_at=2)).error is not None
    assert oracle.parse_hocr("not xml at all").error is not None
