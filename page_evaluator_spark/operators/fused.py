"""Zero-shuffle fused scorer: parse + classify + aggregate inside one Arrow
mapInPandas pass over whole documents (SURVEY.md §2.5 A1 "zero-shuffle
alternative", §2.6 UDAF surface).

Trade-off vs the standard plan (operators/score.py): classification runs in
Python (`regex` module — same patterns, CANON_EQ handled by the pipeline-wide
NFC rule) instead of codegen'd JVM regex, but the job becomes a single
map-only stage: scan → kernel → sink, no exchange anywhere.  The right choice
when ONLY scores are needed and the corpus is already well-partitioned
(e.g. Iceberg bucket(doc_id)); the standard plan wins when spans_out or
downstream relational work shares the parse.

Equivalence with the standard plan is pinned by tests/test_fused.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import regex
from pyspark.sql import DataFrame

from .parse import MEDIA_KINDS, _parse_hocr, _tokenize_txt, join_hyphen_tokens

# The reference's classification patterns (OCRPage.java:15-19) with the Java
# deltas applied: ASCII \p{Punct}, NFC standing in for CANON_EQ.
_PUNCT_CC = "[" + regex.escape(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""") + "]"
_P_PUNCT = regex.compile("^" + _PUNCT_CC + "$")
_P_NUMBER = regex.compile(r"^\p{Sc}?[.,/\-]?(\p{N}+[.,/%\-]?)+\p{Sc}?$")
_P_ONE_ALPHA = regex.compile(r"^\p{L}$")
_P_REPEATED = regex.compile(r"(\P{N})\1{3,}")
_P_NON_ALPHA = regex.compile(r"\P{L}")
_P_CLEAN_LEAD = regex.compile("^" + _PUNCT_CC + "{0,1}")
_P_CLEAN_TRAIL = regex.compile(_PUNCT_CC + "{0,3}$")

# counter order == page_scores schema (FIXTURES.md §2)
_CATS = ["punct", "number_objects", "single_letter", "ge4_repeated",
         "len_gt1_nonalpha", "clean_short", "clean_all_alpha",
         "clean_one_nonalpha", "clean_two_nonalpha", "clean_3plus_nonalpha"]
_CAT_IDX = {c: i for i, c in enumerate(_CATS)}

FUSED_SCHEMA = (
    "doc_id string, token_count int, "
    + ", ".join(f"{c} int" for c in _CATS)
    + ", correctable_score float, quality_score float"
)


def _classify(tok: str) -> int:
    """Category index, first-match-wins (OCRPage.java:64-121).

    The first three are Matcher.matches() in the reference → fullmatch here
    (whole-token consumption; ^$-anchored search would wrongly accept tokens
    ending in a line terminator).
    """
    if _P_PUNCT.fullmatch(tok):
        return 0
    if _P_NUMBER.fullmatch(tok):
        return 1
    if _P_ONE_ALPHA.fullmatch(tok):
        return 2
    norm = tok.lower()
    if _P_REPEATED.search(norm):
        return 3
    clean = _P_CLEAN_TRAIL.sub("", _P_CLEAN_LEAD.sub("", norm, count=1), count=1)
    non_alpha = len(_P_NON_ALPHA.findall(clean))
    if non_alpha == len(clean):
        return 4
    if len(clean) < 3:
        return 5
    if non_alpha == 0:
        return 6
    if non_alpha == 1:
        return 7
    if non_alpha == 2:
        return 8
    return 9


def _doc_tokens(spans) -> list[str]:
    toks: list[str] = []
    for sp in sorted(spans, key=lambda s: s["offset"]):
        kind = sp["kind"]
        if kind in MEDIA_KINDS:
            continue
        try:
            if kind == "hocr":
                texts, last, *_ = _parse_hocr(sp["text"] or "")
            elif kind in ("text", "html"):
                raw = sp["text"] or ""
                if kind == "html":
                    from ..functions.html import extract_main_text

                    raw = extract_main_text(raw)
                texts = _tokenize_txt(raw)
                last = [False] * len(texts)
            else:
                continue  # unknown kind — standard plan quarantines it
        except ValueError:
            continue  # quarantined span contributes no tokens
        toks.extend(join_hyphen_tokens(texts, last))
    return toks


def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            counts = [0] * len(_CATS)
            toks = _doc_tokens(spans) if spans is not None and len(spans) else []
            for t in toks:
                counts[_classify(t)] += 1
            n = len(toks)
            num = counts[6] + counts[7] + counts[8]
            corr_den = n - (counts[1] + counts[0] + counts[2]) - counts[5]
            corr = -1.0 if corr_den == 0 else num / corr_den
            qual = -1.0 if n == 0 else num / n
            rows.append([doc_id, n, *counts, corr, qual])
        yield pd.DataFrame(rows, columns=["doc_id", "token_count", *_CATS,
                                          "correctable_score", "quality_score"])


def score_pages_fused(docs: DataFrame) -> DataFrame:
    """documents (doc_id, spans) → page_scores, map-only (zero shuffle)."""
    return docs.select("doc_id", "spans").mapInPandas(_kernel, schema=FUSED_SCHEMA)


def score_words_grouped(words: DataFrame) -> DataFrame:
    """applyInPandas per-page scorer (the UDAF shape, SURVEY.md §2.6): final
    token rows (doc_id, text) grouped by doc_id → one score row per doc.

    The group-by shuffle moves token rows (vs the standard plan's 11-int
    partials), so this exists for API-surface completeness and for callers
    that already hold a token relation partitioned by doc_id.
    """
    import pandas as pd  # noqa: F811 — worker-side import

    def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = [0] * len(_CATS)
        for t in pdf["text"]:
            counts[_classify(t)] += 1
        n = len(pdf)
        num = counts[6] + counts[7] + counts[8]
        corr_den = n - (counts[1] + counts[0] + counts[2]) - counts[5]
        corr = -1.0 if corr_den == 0 else num / corr_den
        qual = -1.0 if n == 0 else num / n
        return pd.DataFrame([[pdf["doc_id"].iloc[0], n, *counts, corr, qual]],
                            columns=["doc_id", "token_count", *_CATS,
                                     "correctable_score", "quality_score"])

    return (words.select("doc_id", "text")
            .groupBy("doc_id").applyInPandas(scorer, schema=FUSED_SCHEMA))
