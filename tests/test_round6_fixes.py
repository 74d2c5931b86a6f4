"""Round-6 regression pins: the sharded mixture selection (VERDICT r5 #1),
the hash-first repeated-substring counting pass (VERDICT r5 #3 / ADVICE r5),
and the exact-substring dedup completion (VERDICT r5 #5).
"""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mix_docs(spark, seed=11):
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "kappa"]
    rows = []
    did = 0
    for s, n_docs in [("big", 220), ("mid", 40), ("small", 9)]:
        for _ in range(n_docs):
            rows.append((did, s, " ".join(rng.choice(words)
                                          for _ in range(rng.randrange(0, 40)))))
            did += 1
    return spark.createDataFrame(rows, "doc_id: long, source: string, text: string")


def _brute_mixture_keep(docs):
    """The r4 single-window reference form: one cumulative-sum window
    partitioned by source alone.  Kept as the test-only semantics oracle
    for the sharded selection."""
    from page_evaluator_spark.functions.textstats import PORTABLE_TOKEN_RE
    from page_evaluator_spark.operators.curation import source_mixture_targets

    targets = source_mixture_targets(docs)
    tgt = docs.sparkSession.createDataFrame(
        targets, "source: string, total_tokens: long, target_tokens: long")
    n_tok = F.size(F.regexp_extract_all(F.col("text"),
                                        F.lit(PORTABLE_TOKEN_RE), 0))
    base = docs.select(F.col("doc_id"), "source",
                       n_tok.cast("long").alias("n_tok"),
                       F.md5(F.col("doc_id").cast("string")).alias("shuf"))
    w = (Window.partitionBy("source").orderBy("shuf", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = base.withColumn("cum", F.sum("n_tok").over(w)).join(tgt, "source")
    return cum.where(F.col("cum") <= F.col("target_tokens")).select("doc_id")


def test_sharded_mixture_keep_set_identical_to_single_window(spark):
    from page_evaluator_spark.operators.curation import domain_mixture_keep

    d = _mix_docs(spark)
    got = sorted(r["doc_id"] for r in domain_mixture_keep(d).collect())
    ref = sorted(r["doc_id"] for r in _brute_mixture_keep(d).collect())
    assert got == ref and len(got) > 0


def test_mixture_windows_never_partition_by_source_alone(spark):
    """The scale pin for VERDICT r5 #1: every per-doc window in the mixture
    plans must partition by (source, shard) — a dominant source may never
    funnel through one cumulative-sum task again."""
    from page_evaluator_spark.operators.curation import (
        domain_mixture_keep,
        domain_mixture_sample,
    )

    d = _mix_docs(spark)
    for df in (domain_mixture_sample(d), domain_mixture_keep(d)):
        plan = _plan(df)
        specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
        assert specs, "expected the boundary-shard window in the plan"
        for spec in specs:
            assert "shard" in spec, f"window not sharded: {spec}"


def test_mixture_boundary_window_input_is_boundary_only(spark):
    """At most ONE boundary shard per source; the windowed frame holds only
    those shards' docs — a small fraction of the corpus."""
    from page_evaluator_spark.operators.curation import (
        _boundary_cum,
        _mixture_selection,
    )

    d = _mix_docs(spark)
    sel, keepall = _mixture_selection(d, 1, 2, 50, "text", "source", "doc_id")
    per_cls = {r["cls"]: r["n"] for r in
               sel.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    n_bnd_shards = (sel.where(F.col("cls") == "boundary")
                    .select("source", "shard").distinct().count())
    assert n_bnd_shards <= 3  # one per source
    assert per_cls.get("boundary", 0) < d.count()
    # boundary window sees exactly the boundary rows
    assert _boundary_cum(sel).count() == per_cls.get("boundary", 0)
    # keep-all partials exist for every source
    assert {r[0] for r in keepall} == {"big", "mid", "small"}


def test_repeated_substrings_counting_shuffle_carries_hashes_only(spark):
    """ADVICE r5 / VERDICT r5 #3: the corpus-wide counting agg groups by
    xxhash64(span); no Exchange in the counting pass carries the substring
    column."""
    from page_evaluator_spark.operators.dedup import (
        _span_hash_counts,
        _span_windows,
    )

    d = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again") for i in range(6)],
        "doc_id: long, text: string")
    counts = _span_hash_counts(_span_windows(d, 24, "text", "doc_id"), 2)
    plan = _plan(counts)
    assert "xxhash64" in plan
    for part in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "span" not in part, f"counting shuffle carries span text: {part}"


def test_repeated_substrings_matches_brute_text_grouping(spark):
    from page_evaluator_spark.operators.dedup import (
        _span_windows,
        repeated_substrings,
    )

    rng = random.Random(3)
    shared = "shared boilerplate sentence that repeats everywhere verbatim"
    rows = []
    for i in range(40):
        filler = " ".join(rng.choice(["aa", "bb", "cc", "dd"]) for _ in range(30))
        rows.append((i, filler + (" " + shared if i % 2 == 0 else "")))
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = [tuple(r) for r in repeated_substrings(d, width=24, top_k=25).collect()]
    brute = (_span_windows(d, 24, "text", "doc_id")
             .groupBy("span")
             .agg(F.countDistinct("doc_id").alias("n_docs"),
                  F.count("*").alias("n_occ"))
             .where(F.col("n_docs") >= 2)
             .orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "span")
             .limit(25))
    assert got == [tuple(r) for r in brute.collect()] and len(got) == 25


def test_repeated_substrings_empty_result_schema(spark):
    from page_evaluator_spark.operators.dedup import repeated_substrings

    d = spark.createDataFrame([(1, "abcdefgh"), (2, "zzzzyyyy")],
                              "doc_id: long, text: string")
    out = repeated_substrings(d, width=24)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["span", "n_docs", "n_occ"]


def test_mixture_zero_token_docs_and_empty_source_edge(spark):
    """Zero-token docs sort inside shards like any other row and are kept
    while cum <= target (cum unchanged) — parity with the single-window
    form on a corpus dense in empty texts."""
    from page_evaluator_spark.operators.curation import domain_mixture_keep

    rows = [(i, "only", "" if i % 3 else "alpha beta gamma") for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    got = sorted(r["doc_id"] for r in domain_mixture_keep(d).collect())
    ref = sorted(r["doc_id"] for r in _brute_mixture_keep(d).collect())
    assert got == ref
