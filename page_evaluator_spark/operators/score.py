"""Per-document counter aggregation + scores (SURVEY.md §2.5 A1-A4).

Native Catalyst end-to-end: classification is a codegen'd CASE/regex cascade,
aggregation is partial+final hash agg (the shuffle carries ≤ one 11-int row
per (doc, partition)).  Docs with zero tokens still get a score row
(-1.0/-1.0), matching the reference's behavior on empty pages
(OCRPageStats.java:129,135).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.classify import CATEGORIES, category_expr, counter_aggs, with_scores

SCORE_COLUMNS = ["doc_id", "token_count", *CATEGORIES,
                 "correctable_score", "quality_score"]


def classify_words(parsed: DataFrame) -> DataFrame:
    """word rows → + category column (native regex cascade)."""
    return (parsed.where(F.col("kind") == "word")
            .withColumn("category", category_expr(F.col("text"))))


def score_pages(parsed: DataFrame, all_docs: DataFrame | None = None) -> DataFrame:
    """Parsed relation → page_scores (FIXTURES.md §2).

    ``all_docs``: optional (doc_id) relation guaranteeing a score row for every
    document, including media-only / empty / fully-quarantined docs.
    """
    stats = classify_words(parsed).groupBy("doc_id").agg(*counter_aggs())
    if all_docs is not None:
        base = all_docs.select("doc_id").distinct()
        stats = base.join(stats, "doc_id", "left").na.fill(
            0, ["token_count", *CATEGORIES])
    return with_scores(stats).select(*SCORE_COLUMNS)
