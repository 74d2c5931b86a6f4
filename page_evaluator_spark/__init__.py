"""page_evaluator_spark — a PySpark-native OCR page-quality evaluation engine
(from-scratch rebuild of Early-Modern-OCR/page-evaluator's semantics, widened
to a 10^12-document corpus engine; see README.md / SURVEY.md).

Public API:
  get_spark(...)                     scale-tuned SparkSession factory
  evaluate_documents(docs, ...)      (doc_id, spans) table → PipelineOutputs
                                     {page_scores, spans_out, quarantine,
                                      page_meta, token_props, parsed}
  score_pages_fused(docs)            zero-shuffle map-only scorer variant
  IncrementalRunner(spark, out_dir)  resumable lineage-tracked execution
  queries / oracle_sql               the 51-query harness (queries module)
"""

from .plans.incremental import IncrementalRunner
from .plans.pipeline import PipelineOutputs, evaluate_documents
from .session import get_spark

__all__ = ["IncrementalRunner", "PipelineOutputs", "evaluate_documents", "get_spark"]


def __getattr__(name):  # lazy: keep fused/queries imports off the cold path
    if name == "score_pages_fused":
        from .operators.fused import score_pages_fused

        return score_pages_fused
    raise AttributeError(name)
