"""Differential parity: the Spark pipeline vs the transliterated oracle,
on fixtures + a seeded random corpus.  This is the BASELINE.json per-row
invariant: exact (kind, text, media_ref, order) span-sequence equality and
counter/score equality per doc_id.
"""

from __future__ import annotations

import pytest

from page_evaluator_spark.corpus import corpus_to_spark_df, fixtures_docs, gen_corpus
from page_evaluator_spark.plans.pipeline import evaluate_documents

from . import oracle


def _run_and_compare(spark, docs, repartition=None):
    out = evaluate_documents(corpus_to_spark_df(spark, docs), repartition=repartition)
    scores = {r["doc_id"]: r.asDict() for r in out.page_scores.collect()}
    spans: dict[str, list] = {}
    for r in out.spans_out.collect():
        spans.setdefault(r["doc_id"], []).append((r["ord"], r["kind"], r["text"], r["media_ref"]))
    quar: dict[str, list] = {}
    for r in out.quarantine.collect():
        quar.setdefault(r["doc_id"], []).append(r["span_ord"])

    assert len(scores) == len(docs), "every doc must get a score row"
    for d in docs:
        did = d["doc_id"]
        exp = oracle.doc_expected(d["spans"])
        got = scores[did]
        for n in oracle.COUNTER_NAMES:
            assert got[n] == getattr(exp["counters"], n), (did, n)
        assert got["correctable_score"] == pytest.approx(exp["correctable_score"], abs=1e-5), did
        assert got["quality_score"] == pytest.approx(exp["quality_score"], abs=1e-5), did
        assert sorted(spans.get(did, [])) == exp["spans_out"], did
        assert sorted(quar.get(did, [])) == sorted(q[0] for q in exp["quarantined"]), did


def test_fixtures_parity(spark):
    _run_and_compare(spark, fixtures_docs())


def test_random_corpus_parity(spark):
    _run_and_compare(spark, gen_corpus(80, seed=123, include_fixtures=False))


def test_random_corpus_parity_repartitioned(spark):
    # same corpus through the skew-spreading repartition path
    _run_and_compare(spark, gen_corpus(40, seed=7, include_fixtures=False), repartition=16)


def test_skew_doc_parity(spark):
    docs = gen_corpus(5, seed=99, include_fixtures=False, skew_docs=1, skew_spans=300)
    _run_and_compare(spark, docs, repartition=16)


def test_page_meta(spark):
    docs = fixtures_docs()
    out = evaluate_documents(corpus_to_spark_df(spark, docs))
    meta = {(r["doc_id"], r["span_offset"]): r.asDict() for r in out.page_meta.collect()}
    m = meta[("f001_hocr_canonical", 0)]
    assert m["page_id"] == "page_1"
    assert m["ocr_engine"] == "tesseract 3.02"
    assert m["ocr_capabilities"] == ["ocr_page", "ocr_line", "ocrx_word"]
    # missing meta → "" engine and [""] capabilities (HOCRPage.java:48-51)
    m9 = meta[("f009_hocr_no_meta", 0)]
    assert m9["ocr_engine"] == ""
    assert m9["ocr_capabilities"] == [""]


def test_nested_markup_fixture(spark):
    """f019: descendant text concatenation + hyphen join across the line
    boundary when the '-' lives inside nested markup."""
    docs = [d for d in fixtures_docs() if d["doc_id"] == "f019_nested_markup"]
    out = evaluate_documents(corpus_to_spark_df(spark, docs))
    spans = [r["text"] for r in out.spans_out.orderBy("ord").collect()]
    assert spans == ["word.", "hyphen"]
    exp = oracle.doc_expected(docs[0]["spans"])
    assert [s[2] for s in exp["spans_out"]] == spans
