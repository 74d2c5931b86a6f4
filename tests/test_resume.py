"""Lineage + resume: interrupted runs pick up exactly the uncommitted parts;
final outputs are complete and duplicate-free (north_rule resumability)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from page_evaluator_spark.corpus import corpus_to_spark_df, gen_corpus
from page_evaluator_spark.plans.incremental import IncrementalRunner


@pytest.fixture()
def docs(spark):
    return corpus_to_spark_df(spark, gen_corpus(40, seed=11, include_fixtures=True))


def test_interrupted_run_resumes(spark, docs, tmp_path):
    runner = IncrementalRunner(spark, str(tmp_path / "out"), n_parts=6)

    # simulated kill: first invocation only commits 2 parts
    first = runner.run(docs, run_id="r1", max_parts=2)
    assert len(first) == 2
    assert sorted(runner.committed_parts()) == sorted(first)
    assert len(runner.pending_parts()) == 4

    # resume: second invocation processes ONLY the remaining parts
    second = runner.run(docs, run_id="r2")
    assert sorted(first + second) == list(range(6))
    assert runner.pending_parts() == []

    # completeness + no duplicates
    n_docs = docs.count()
    scores = runner.page_scores()
    assert scores.count() == n_docs
    assert scores.select("doc_id").distinct().count() == n_docs

    # lineage metrics add up to the real totals
    lineage = runner.lineage()
    assert lineage.count() == 6
    total = lineage.agg(F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")).collect()[0]
    assert total["d"] == n_docs
    real_tokens = scores.agg(F.sum("token_count")).collect()[0][0]
    assert total["t"] == real_tokens


def test_rerun_is_noop(spark, docs, tmp_path):
    runner = IncrementalRunner(spark, str(tmp_path / "out"), n_parts=4)
    assert len(runner.run(docs, run_id="r1")) == 4
    assert runner.run(docs, run_id="r2") == []  # nothing pending
    assert runner.page_scores().count() == docs.count()


def test_stable_part_assignment(spark, docs):
    from page_evaluator_spark.plans.incremental import part_id_expr

    a = {r["doc_id"]: r["p"] for r in
         docs.select("doc_id", part_id_expr(8).alias("p")).collect()}
    b = {r["doc_id"]: r["p"] for r in
         docs.select("doc_id", part_id_expr(8).alias("p")).collect()}
    assert a == b
    assert all(0 <= p < 8 for p in a.values())
