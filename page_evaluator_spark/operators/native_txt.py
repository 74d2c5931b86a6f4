"""Pure-Catalyst TXT scoring: the ENTIRE reference pipeline for plain-text
corpora with zero Python — scan → explode → native reflow/dehyphenate/
tokenize (Java regex) → classify cascade → agg → scores, all inside
whole-stage codegen.

Scope/caveats (documented, tested):
  * span kind 'text' only (hOCR needs the DOM kernel);
  * no NFC normalization (no native NFC in vanilla Spark) — exact parity with
    the standard pipeline holds for NFC-stable input (all ASCII, and any text
    already in NFC), which the equivalence test pins;
  * TXT tokens never hyphen-join at the token level (TxtToken.java:19-21), so
    the sequential fold is not needed — dehyphenation is the page-level regex.

This is the maximum-throughput path for text-only corpora: no Arrow boundary,
no Python workers, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.classify import CATEGORIES, category_expr, with_scores
from ..functions.textnorm import dehyphenate_txt, reflow_txt, tokenize_txt
from .parse import explode_docs
from .score import SCORE_COLUMNS


def score_text_docs_native(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) with text-kind spans → page_scores, zero Python.

    Non-text spans contribute no tokens (media passes through elsewhere);
    posexplode_outer keeps every doc_id alive so token-less docs still score
    (-1.0 sentinels), mirroring the standard plan's marker rows.
    """
    spans = explode_docs(docs)
    toks = spans.select(
        "doc_id",
        F.posexplode_outer(
            F.when(F.col("kind") == "text",
                   tokenize_txt(dehyphenate_txt(reflow_txt(F.col("text")))))
            .otherwise(F.array().cast("array<string>"))
        ).alias("tok_idx", "token"),
    )
    cat = F.when(F.col("token").isNotNull(), category_expr(F.col("token")))
    counted = toks.withColumn("category", cat)
    aggs = [F.sum(F.when(F.col("category").isNotNull(), 1).otherwise(0))
            .cast("int").alias("token_count")]
    for c in CATEGORIES:
        aggs.append(F.sum(F.when(F.col("category") == c, 1).otherwise(0))
                    .cast("int").alias(c))
    return with_scores(counted.groupBy("doc_id").agg(*aggs)).select(*SCORE_COLUMNS)
