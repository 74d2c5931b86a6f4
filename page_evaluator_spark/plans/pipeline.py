"""End-to-end pipeline assembly: documents table → {page_scores, spans_out,
quarantine, page_meta} (the Spark re-expression of Main.java:26-50's
parse → calculateStatistics → scores flow, widened to a corpus).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators.parse import parse_documents
from ..operators.score import score_pages
from ..operators.spans import page_meta, quarantine, spans_out, token_props


@dataclass
class PipelineOutputs:
    parsed: DataFrame
    page_scores: DataFrame
    spans_out: DataFrame
    quarantine: DataFrame
    page_meta: DataFrame
    token_props: DataFrame


def evaluate_documents(docs: DataFrame, repartition: int | None = None,
                       cache_parsed: bool = False) -> PipelineOutputs:
    """Build the full logical plan (lazy; nothing executes here).

    cache_parsed=True persists the parse-UDF output (MEMORY_AND_DISK) so the
    four output branches share one parse pass instead of re-running the
    Python stage per sink — the right call whenever ≥2 outputs are written.

    cache_parsed=False (each sink re-runs its own parse) gives every branch a
    COLUMN-PRUNED parse kernel instead: the opaque Python stage otherwise
    computes and ships all 13 PARSED_SCHEMA columns through the Arrow
    boundary when e.g. the scores branch reads three of them (guide §4.1).
    Branch outputs are bit-identical either way — the kernel's parsing work
    (incl. error-row parity) does not depend on the declared columns.
    """
    parsed = parse_documents(docs, repartition=repartition)
    if cache_parsed:
        from pyspark import StorageLevel

        parsed = parsed.persist(StorageLevel.MEMORY_AND_DISK)
        return PipelineOutputs(
            parsed=parsed,
            page_scores=score_pages(parsed),
            spans_out=spans_out(parsed),
            quarantine=quarantine(parsed),
            page_meta=page_meta(parsed),
            token_props=token_props(parsed),
        )

    def pruned(columns: tuple[str, ...]) -> DataFrame:
        return parse_documents(docs, repartition=repartition, columns=columns)

    return PipelineOutputs(
        parsed=parsed,
        page_scores=score_pages(pruned(("doc_id", "kind", "text"))),
        spans_out=spans_out(pruned(("doc_id", "span_offset", "pos", "kind",
                                    "text", "media_ref"))),
        quarantine=quarantine(pruned(("doc_id", "span_offset", "kind",
                                      "error"))),
        page_meta=page_meta(pruned(("doc_id", "span_offset", "kind", "page_id",
                                    "ocr_engine", "ocr_capabilities"))),
        token_props=token_props(pruned(("doc_id", "span_offset", "pos", "kind",
                                        "text", "props"))),
    )
