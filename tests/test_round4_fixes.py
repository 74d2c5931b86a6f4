"""Round-4 items: hot-shingle df cap (VERDICT r3 #2), k-means IVF refinement
(#3), SemDeDup composition (#4), model-based quality filter (#5), star-CC
single-action convergence (#6), plus the ADVICE r3 fixes (explicit-stage
detection, ivf_centroids guard, scan-parts cache invalidation, boilerplate
NULL-text contract).
"""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# VERDICT #2: ngram_jaccard document-frequency cap
# ---------------------------------------------------------------------------

def test_ngram_jaccard_max_df_bounds_hot_shingle_buckets(spark):
    """A boilerplate shingle shared by k docs makes k(k-1)/2 join rows; with
    max_df below k those pairs never exist.  Docs whose capped shingle set is
    empty drop out; genuinely-similar pairs survive with Jaccard computed
    over the capped (informative) sets."""
    from page_evaluator_spark.operators.dedup import ngram_jaccard_pairs

    k = 12
    boiler = "all rights reserved"  # one 3-token shingle per doc
    rows = [(f"b{i:02d}", boiler) for i in range(k)]
    # two genuinely similar docs sharing informative shingles (plus boiler)
    rows.append(("x1", f"{boiler} quick brown fox jumps"))
    rows.append(("x2", f"{boiler} quick brown fox leaps"))
    docs = spark.createDataFrame(rows, "doc_id: string, text: string")

    uncapped = ngram_jaccard_pairs(docs).collect()
    assert len(uncapped) == (k + 2) * (k + 1) // 2  # every pair shares boiler

    capped = ngram_jaccard_pairs(docs, max_df=5).collect()
    got = {(r["doc_a"], r["doc_b"]): r for r in capped}
    # the k²-sized boilerplate bucket is gone; only the informative pair stays
    assert set(got) == {("x1", "x2")}
    r = got[("x1", "x2")]
    # capped sets: the df-14 'all rights reserved' shingle is dropped, the
    # df-2 boundary/content trigrams stay → 4 shingles per doc, 3 shared,
    # union 5 → Jaccard over informative shingles = 0.6
    assert r["n_common"] == 3 and r["jaccard"] == pytest.approx(3 / 5, abs=1e-6)


# ---------------------------------------------------------------------------
# VERDICT #3: k-means-refined IVF centroids
# ---------------------------------------------------------------------------

def _clustered_corpus(spark, n_clusters=16, per=12, dim=64, seed=7):
    """Deterministic clustered embeddings whose 16 lowest ids cover only FOUR
    clusters — a deliberately bad seed set for the coarse quantizer."""
    rng = random.Random(seed)
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
    order = [c % 4 for c in range(16)] + \
        [c % n_clusters for c in range(16, n_clusters * per)]
    rows = [(i, [float(centers[c][d] + rng.gauss(0, 0.15)) for d in range(dim)])
            for i, c in enumerate(order)]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_ivf_kmeans_refinement_recall_and_determinism(spark):
    from page_evaluator_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
        ivf_kmeans_centroids,
    )

    e = _clustered_corpus(spark)
    q = (e.where((F.col("vec_id") >= 30) & (F.col("vec_id") < 40))
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    bf_sets: dict[int, set] = {}
    for r in brute_force_topk(e, q, k=10).collect():
        bf_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(rounds: int) -> float:
        s: dict[int, set] = {}
        for r in ivf_ann_topk(e, q, k=10, n_cells=16, nprobe=2,
                              kmeans_rounds=rounds).collect():
            s.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(bf_sets[k] & s.get(k, set())) / 10 for k in bf_sets) / len(bf_sets)

    r0, r1 = recall(0), recall(1)
    assert r1 >= r0  # refinement fixes the bad seeds (measured 0.88 -> 1.0)
    assert r1 >= 0.95

    # fixed-point means ⇒ bit-identical centroids regardless of partitioning
    c1 = ivf_kmeans_centroids(e.repartition(1), 16, n_rounds=2)
    c7 = ivf_kmeans_centroids(e.repartition(7), 16, n_rounds=2)
    assert c1 == c7


def test_ivf_centroids_rejects_sparse_or_small_corpora(spark):
    """ADVICE r3: fewer vectors than n_cells (or non-dense ids) must raise,
    not silently build an empty/short centroid list."""
    from page_evaluator_spark.operators.similarity import ivf_centroids

    e = spark.createDataFrame(
        [(100 + i, [float(i)] * 4) for i in range(8)],
        "vec_id: long, embedding: array<double>")
    with pytest.raises(ValueError, match="dense ids"):
        ivf_centroids(e, 8)


# ---------------------------------------------------------------------------
# VERDICT #4: SemDeDup composition
# ---------------------------------------------------------------------------

def test_semantic_dedup_known_clusters_and_no_cross_cell_pairs(spark):
    from page_evaluator_spark.operators.similarity import semantic_dedup

    e = _clustered_corpus(spark)
    out = semantic_dedup(e, threshold=0.9, n_cells=16, kmeans_rounds=1)
    rows = out.collect()
    # total keep-list: one row per input vector
    assert len(rows) == e.count()
    by_id = {r["vec_id"]: r for r in rows}
    # same-cluster points (noise 0.15 around a shared center) are near-dups at
    # 0.9 — clusters collapse to their min ids.  Within-cell pairing means a
    # point landing in a different IVF cell than its clustermates stays a
    # keeper (the documented recall/cost trade of cell bucketing), so allow a
    # small overshoot above the 16 true clusters.
    n_kept = sum(1 for r in rows if r["keep"])
    assert 16 <= n_kept <= 20
    for r in rows:
        assert r["keep"] == (r["vec_id"] == r["cluster_id"])
        assert by_id[r["cluster_id"]]["keep"]  # canonical ids are kept rows
    # plan shape: pair generation joins on the cell id — never a cartesian
    # product (the candidate stage is exposed so this is directly testable)
    from page_evaluator_spark.operators.similarity import semantic_dedup_pairs

    pairs = semantic_dedup_pairs(e, threshold=0.9, n_cells=16, kmeans_rounds=1)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "cell" in plan


# ---------------------------------------------------------------------------
# VERDICT #5: model-based quality filter
# ---------------------------------------------------------------------------

def _py_model_wsum(text: str) -> tuple[int, int]:
    """Pure-Python twin of textstats.model_quality_wsum."""
    import regex

    toks = regex.findall(r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]", text.lower())
    wsum = 0
    for t in toks:
        bucket = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1024
        h = int(hashlib.md5(f"w:{bucket}".encode()).hexdigest()[:8], 16)
        wsum += h % 2001 - 1000
    return wsum, len(toks)


def test_model_quality_matches_python_twin(spark):
    from page_evaluator_spark.functions.textstats import model_quality_wsum

    texts = ["The quick brown fox!", "", "ein kleines deutsches Beispiel 42",
             "punctuation... heavy;;; text---", "word " * 50]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id: int, text: string")
    st = model_quality_wsum(F.col("text"))
    got = {r["doc_id"]: (r["s"]["wsum"], r["s"]["n_tokens"])
           for r in df.select("doc_id", st.alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_model_wsum(t), (i, t)


# ---------------------------------------------------------------------------
# VERDICT #6: star CC converges with one action per round
# ---------------------------------------------------------------------------

def test_star_cc_exact_verification_runs_once(spark, monkeypatch):
    """Per-round convergence checking is a single agg action (count +
    order-independent checksum); the exact exceptAll verification runs only
    at the nominated fixpoint — exactly once on a multi-round chain graph."""
    from page_evaluator_spark.operators.curation import connected_components_star

    calls = {"n": 0}
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a: long, doc_b: long")
    cls = type(chain)  # the concrete (classic) DataFrame class, not the ABC
    orig = cls.exceptAll

    def counting(self, other):
        calls["n"] += 1
        return orig(self, other)

    monkeypatch.setattr(cls, "exceptAll", counting)
    labels = {r["doc_id"]: r["cluster_id"]
              for r in connected_components_star(chain).collect()}
    assert labels == {i: 0 for i in range(13)}
    assert calls["n"] == 1


# ---------------------------------------------------------------------------
# ADVICE r3: explicit-stage detection, cache invalidation, NULL-text contract
# ---------------------------------------------------------------------------

def test_curation_explicit_full_stage_list_errors_without_benchmark():
    """Typing out the full canonical --stages list is EXPLICIT: requesting
    decontaminate without --benchmark must error, never silently no-op."""
    from jobs.run_curation import ALL_STAGES, parse_args

    argv = ["--input", "in", "--output", "out", "--stages", ",".join(ALL_STAGES)]
    with pytest.raises(SystemExit):
        parse_args(argv)
    # implicit default (no --stages): decontaminate quietly skipped
    args = parse_args(["--input", "in", "--output", "out"])
    assert "decontaminate" not in args.stage_list
    assert args.stage_list == ["strip", "filter", "cluster", "pack"]
    # explicit subset without decontaminate: fine
    args = parse_args(["--input", "in", "--output", "out", "--stages", "filter,pack"])
    assert args.stage_list == ["filter", "pack"]


def test_clear_scan_parts_cache():
    from page_evaluator_spark.operators import skew

    skew._SCAN_PARTS_CACHE[("/tmp/corpus_a", 8)] = 1
    skew._SCAN_PARTS_CACHE[("/tmp/corpus_b", 8)] = 2
    skew.clear_scan_parts_cache("/tmp/corpus_a")
    assert ("/tmp/corpus_a", 8) not in skew._SCAN_PARTS_CACHE
    assert ("/tmp/corpus_b", 8) in skew._SCAN_PARTS_CACHE
    skew.clear_scan_parts_cache()
    assert not skew._SCAN_PARTS_CACHE


def test_remove_boilerplate_lines_null_text_passthrough(spark):
    """NULL text → clean_text NULL (not a fabricated ''), n_lines/n_removed 0
    (not NULL) — the per-doc stats contract stays total."""
    from page_evaluator_spark.operators.curation import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [("a", "keep me\nboiler"), ("b", "boiler\nother"), ("c", "boiler\nmore"),
         ("d", None)],
        "doc_id: string, text: string")
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(docs, min_docs=3).collect()}
    assert out["d"]["clean_text"] is None
    assert out["d"]["n_lines"] == 0 and out["d"]["n_removed"] == 0
    assert out["a"]["clean_text"] == "keep me" and out["a"]["n_removed"] == 1


def test_curation_model_filter_stage(spark, tmp_path):
    """model_filter is opt-in (absent from the default stage list) and, when
    enabled, drops exactly the docs whose integer weight sum is negative at
    the default 0.5 score threshold — audited, NULL text included."""
    from jobs.run_curation import parse_args, run

    docs = [("a", "The quick brown fox jumps over the lazy dog", "en"),
            ("b", "ein kleines deutsches Beispiel mit mehr Text", "de"),
            ("c", "zzz qqq xxx vvv kkk jjj", "en"),
            ("d", None, "en"),
            ("e", "numbers 123 456 789 and words in between", "en")]
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id: string, text: string, lang: string") \
        .write.parquet(src)

    # opt-in: not in the implicit default list
    implicit = parse_args(["--input", src, "--output", str(tmp_path / "o0")])
    assert "model_filter" not in implicit.stage_list

    args = parse_args(["--input", src, "--output", str(tmp_path / "out"),
                       "--stages", "model_filter"])
    assert args.stage_list == ["model_filter"]
    counts = run(spark, args)
    audit = {r["doc_id"]: r["drop_stage"] for r in
             spark.read.parquet(str(tmp_path / "out/curation_audit")).collect()}
    assert len(audit) == 5
    expected_drop = {d for d, t, _ in docs
                     if t is None or _py_model_wsum(t)[0] < 0}
    assert {d for d, s in audit.items() if s == "model_filter"} == expected_drop
    assert counts["kept"] == 5 - len(expected_drop)
    with pytest.raises(SystemExit):
        parse_args(["--input", src, "--output", "o", "--model-min-score", "1.5"])


def test_boilerplate_strip_oracle_null_text_parity(spark, tmp_path):
    """The doc_boilerplate_strip DuckDB twin must reproduce the NULL-text
    contract (clean_md5 NULL, counts 0) — the sf corpora contain no NULL
    texts, so this injects one and runs BOTH engines."""
    import duckdb

    from page_evaluator_spark.queries import QUERIES, oracle_sql

    rows = [(i, "shared line\nunique %d" % i, "en") for i in range(1, 7)]
    rows.append((7, None, "en"))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    got = QUERIES["doc_boilerplate_strip"](spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet/*.parquet'")  # Spark writes a dir
    exp = con.execute(oracle_sql()["doc_boilerplate_strip"]).df()
    assert len(got) == len(exp) == 7
    g = got.set_index("doc_id").sort_index()
    e = exp.set_index("doc_id").sort_index()
    assert (g["n_lines"].to_numpy() == e["n_lines"].to_numpy()).all()
    assert (g["n_removed"].to_numpy() == e["n_removed"].to_numpy()).all()
    gm, em = g["clean_md5"].where(g["clean_md5"].notna(), None), \
        e["clean_md5"].where(e["clean_md5"].notna(), None)
    assert list(gm) == list(em)
    assert gm.loc[7] is None and g.loc[7, "n_lines"] == 0


def test_model_filter_zero_token_docs_respect_threshold(spark, tmp_path):
    """Zero-token docs score sigmoid(0)=0.5 — kept at the default 0.5
    threshold, dropped above it (the raw wsum inequality would keep them at
    ANY threshold)."""
    from jobs.run_curation import parse_args, run

    docs = [("w", "   ", "en"),  # whitespace-only -> 0 tokens, wsum 0
            ("a", "The quick brown fox jumps over the lazy dog", "en")]
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id: string, text: string, lang: string") \
        .write.parquet(src)

    run(spark, parse_args(["--input", src, "--output", str(tmp_path / "o1"),
                           "--stages", "model_filter"]))
    audit1 = {r["doc_id"]: r["drop_stage"] for r in
              spark.read.parquet(str(tmp_path / "o1/curation_audit")).collect()}
    assert audit1["w"] is None  # 0.5 >= 0.5 -> kept

    run(spark, parse_args(["--input", src, "--output", str(tmp_path / "o2"),
                           "--stages", "model_filter", "--model-min-score", "0.9"]))
    audit2 = {r["doc_id"]: r["drop_stage"] for r in
              spark.read.parquet(str(tmp_path / "o2/curation_audit")).collect()}
    assert audit2["w"] == "model_filter"  # 0.5 < 0.9 -> dropped


def test_ivf_kmeans_degenerate_inputs_raise(spark):
    """n_cells < 1 and empty/ragged seed vectors must raise, not silently
    produce empty centroids (dim=0 would NULL every downstream cosine)."""
    from page_evaluator_spark.operators.similarity import (
        ivf_centroids,
        ivf_kmeans_centroids,
    )

    e = spark.createDataFrame([(0, []), (1, [1.0, 2.0]), (2, [3.0, 4.0])],
                              "vec_id: long, embedding: array<double>")
    with pytest.raises(ValueError, match="n_cells >= 1"):
        ivf_centroids(e, 0)
    # seed 0 is an empty vector: since r5 the zero-norm guard fires first
    # (an empty vector is zero-norm — NaN cosine either way)
    with pytest.raises(ValueError, match="zero-norm"):
        ivf_kmeans_centroids(e, 2)
    # ragged NON-empty seeds still reach the dim-inference guard
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0]), (2, [3.0, 4.0])],
        "vec_id: long, embedding: array<double>")
    with pytest.raises(ValueError, match="infer embedding dim"):
        ivf_kmeans_centroids(ragged, 2)


def test_unigram_lm_scores_semantics_and_determinism(spark):
    """Self-trained unigram LM: rare-token docs score strictly higher NLL
    than common-token docs; token-less docs come back bucket 'empty'; the
    fixed-point cost sums make nll bit-identical across partitionings."""
    from page_evaluator_spark.operators.curation import unigram_lm_scores

    rows = [("common%d" % i, "aaa bbb aaa bbb aaa bbb") for i in range(8)]
    rows += [("rare", "zzz qqq xxx"), ("empty", "   ")]
    docs = spark.createDataFrame(rows, "doc_id: string, text: string")
    out = {r["doc_id"]: r for r in
           unigram_lm_scores(docs, head_nll=1.0, tail_nll=2.5).collect()}
    assert len(out) == 10
    assert out["empty"]["lm_bucket"] == "empty" and out["empty"]["nll"] is None
    assert out["rare"]["nll"] > out["common0"]["nll"]
    assert out["common0"]["lm_bucket"] == "head"   # -ln(24/51)~0.75, -ln(27/51)
    assert out["rare"]["lm_bucket"] == "tail"      # -ln(1/51) ~ 3.93

    a = unigram_lm_scores(docs.repartition(1)).collect()
    b = unigram_lm_scores(docs.repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cross_corpus_minhash_pairs(spark):
    """Incremental-ingest dedup: a new doc duplicating a ref doc is flagged;
    near-dups WITHIN one side are not (the join is new x ref only)."""
    from page_evaluator_spark.operators.dedup import cross_corpus_minhash_pairs

    body = "the quick brown fox jumps over the lazy dog again and again"
    ref = spark.createDataFrame(
        [("r1", body), ("r2", body + " tail"), ("r3", "completely different text here")],
        "doc_id: string, text: string")
    new = spark.createDataFrame(
        [("n1", body), ("n2", body), ("n3", "unrelated fresh content entirely new")],
        "doc_id: string, text: string")
    pairs = {(r["new_id"], r["ref_id"])
             for r in cross_corpus_minhash_pairs(new, ref).collect()}
    assert ("n1", "r1") in pairs and ("n2", "r1") in pairs
    # n1/n2 duplicate each other but are both NEW — never paired together
    assert all(a.startswith("n") and b.startswith("r") for a, b in pairs)
    assert not any(b == "r3" for _, b in pairs)


def test_pagerank_int_properties(spark):
    """Integer PageRank: a node with many in-links outranks sparse nodes,
    results are bit-identical across partitionings, one hand-checked round
    matches, degenerate damping raises."""
    from page_evaluator_spark.operators.graph import PR_FXP, pagerank_int

    # hub: everyone links to h; plus a chain a->b
    edges = [("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"), ("a", "b")]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    got = {r["node"]: r["rank_i"] for r in pagerank_int(df, iters=10).collect()}
    assert got["h"] == max(got.values())
    assert got["h"] > got["b"] > got["a"]  # b gets a's split mass, a only teleport

    # one iteration by hand: n=5 nodes (a b c d h), base=FXP//5,
    # teleport=(FXP*15)//(100*5)
    one = {r["node"]: r["rank_i"] for r in pagerank_int(df, iters=1).collect()}
    base, tel = PR_FXP // 5, (PR_FXP * 15) // (100 * 5)
    assert one["a"] == tel  # no in-links
    assert one["b"] == tel + (base // 2) * 85 // 100  # half of a's mass
    assert one["h"] == tel + (base // 2 + base * 3) * 85 // 100

    d1 = sorted(map(tuple, pagerank_int(df.repartition(1), iters=5).collect()))
    d7 = sorted(map(tuple, pagerank_int(df.repartition(7), iters=5).collect()))
    assert d1 == d7

    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_int(df, damping_pct=100)


def test_lm_score_oracle_empty_doc_parity(spark, tmp_path):
    """The doc_lm_score twin must bucket token-less docs 'empty' like the
    Spark side (a CASE with ELSE 'tail' would misbucket them) — the sf
    corpora have no token-less docs, so inject one and run both engines."""
    import duckdb

    from page_evaluator_spark.queries import QUERIES, oracle_sql

    rows = [(1, "normal words here", "en"), (2, "   ", "en"), (3, "more text", "en")]
    spark.createDataFrame(rows, "doc_id: long, text: string, lang: string") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    got = QUERIES["doc_lm_score"](spark, str(tmp_path)).toPandas().set_index("doc_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet/*.parquet'")
    exp = con.execute(oracle_sql()["doc_lm_score"]).df().set_index("doc_id")
    assert list(got["lm_bucket"]) == list(exp["lm_bucket"])
    assert got.loc[2, "lm_bucket"] == "empty" and got.loc[2, "n_tokens"] == 0


def test_pageeval_stream_detects_mutated_landing_dir(spark, tmp_path):
    """Deleting an already-planned landing file must fail LOUDLY on replay,
    never silently change the batch contents."""
    from page_evaluator_spark.sources.pagesource import PageEvalDataSource

    land = tmp_path / "landing"
    land.mkdir()
    spark.dataSource.register(PageEvalDataSource)
    (land / "a1.txt").write_text("one", encoding="utf-8")
    (land / "a2.txt").write_text("two", encoding="utf-8")

    def run_once(out, ckpt):
        q = (spark.readStream.format("pageeval").load(str(land))
             .writeStream.format("parquet").option("path", str(out))
             .option("checkpointLocation", str(ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run_once(tmp_path / "o1", tmp_path / "c1")
    # mutate BELOW the watermark, then start a FRESH stream: planning sees a
    # prefix that no longer matches the offset signature it just produced…
    # (simulate the crash-replay case directly via the reader API)
    from page_evaluator_spark.sources.pagesource import PageEvalStreamReader

    rdr = PageEvalStreamReader({"path": str(land)})
    end = rdr.latestOffset()
    (land / "a1.txt").unlink()
    import pytest as _pt

    with _pt.raises(ValueError, match="changed under a planned batch"):
        rdr.partitions(rdr.initialOffset(), end)


def test_pq_ann_recall_and_encoding(spark, sf01_dir):
    """PQ ANN (r4): codes stay in [0, n_codes); scores are deterministic
    across partitionings; recall@10 vs brute force clears the documented
    floor for 8x16 unrefined codebooks on this corpus (measured 0.32)."""
    from page_evaluator_spark.operators.similarity import (
        brute_force_topk,
        pq_ann_topk,
        pq_code_expr,
        pq_codebooks,
    )

    e = spark.read.parquet(f"{sf01_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"),
                                            "embedding")
    bs: dict[int, set] = {}
    for r in brute_force_topk(e, q, k=10).collect():
        bs.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    pq = pq_ann_topk(e, q, k=10).collect()
    ps: dict[int, set] = {}
    for r in pq:
        ps.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(len(bs[k] & ps.get(k, set())) / 10 for k in bs) / len(bs)
    assert recall >= 0.25

    cbs = pq_codebooks(e, m=8, n_codes=16)
    assert len(cbs) == 8 and all(len(cb) == 16 for cb in cbs)
    assert all(len(cv) == 8 for cb in cbs for cv in cb)
    codes = e.select(*[pq_code_expr(F.col("embedding"), cbs[j], j, 8).alias(f"c{j}")
                       for j in range(8)]).collect()
    assert all(0 <= r[f"c{j}"] < 16 for r in codes for j in range(8))

    a = sorted(map(tuple, pq_ann_topk(e.repartition(1), q, k=5).collect()))
    b = sorted(map(tuple, pq_ann_topk(e.repartition(7), q, k=5).collect()))
    assert a == b


def test_lm_filter_stage_and_calibration(spark, tmp_path):
    """Opt-in lm_filter: the calibrated tail cutoff drops the
    out-of-distribution doc, token-less docs are dropped too (no likelihood
    — mirrors model_filter's zero-token decision), common docs survive, and
    the flags validate."""
    from jobs.run_curation import parse_args, run
    from page_evaluator_spark.operators.curation import calibrate_lm_cutoffs

    rows = [("c%d" % i, "aaa bbb ccc aaa bbb ccc", "en") for i in range(9)]
    rows.append(("rare", "zzz qqq www yyy xxx vvv", "en"))
    rows.append(("empty", "   ", "en"))
    docs = spark.createDataFrame(rows, "doc_id: string, text: string, lang: string")
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    head, tail = calibrate_lm_cutoffs(docs)
    assert head <= tail
    args = parse_args(["--input", src, "--output", str(tmp_path / "out"),
                       "--stages", "lm_filter"])
    assert args.stage_list == ["lm_filter"]
    counts = run(spark, args)
    audit = {r["doc_id"]: r["drop_stage"] for r in
             spark.read.parquet(str(tmp_path / "out/curation_audit")).collect()}
    assert audit["rare"] == "lm_filter"      # the out-of-distribution doc
    assert audit["empty"] == "lm_filter"     # token-less: no likelihood
    assert audit["c0"] is None               # common docs survive
    assert counts["kept"] == 11 - sum(1 for v in audit.values() if v)
    # opt-in: absent from the implicit default list; flag validation
    implicit = parse_args(["--input", src, "--output", "o"])
    assert "lm_filter" not in implicit.stage_list
    with pytest.raises(SystemExit):
        parse_args(["--input", src, "--output", "o", "--lm-tail", "-1"])
    # degenerate corpus: loud error, not a NoneType crash
    nulls = spark.createDataFrame([("x", None, "en")],
                                  "doc_id: string, text: string, lang: string")
    with pytest.raises(ValueError, match="no tokenized documents"):
        calibrate_lm_cutoffs(nulls)


def test_ivfpq_candidates_from_probed_cells_only(spark, sf01_dir):
    """IVF-PQ (r4): every returned neighbor's cell is among its query's
    probed cells; the candidate join is an equi-join on cell (no full
    cross-scan); recall clears the documented floor (measured 0.34)."""
    from page_evaluator_spark.operators.similarity import (
        brute_force_topk,
        ivf_cell_expr,
        ivf_kmeans_centroids,
        ivf_probe_cells_expr,
        ivfpq_ann_topk,
    )

    e = spark.read.parquet(f"{sf01_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"),
                                            "embedding")
    out = ivfpq_ann_topk(e, q, k=10_000, n_cells=16, nprobe=4, kmeans_rounds=1)
    rows = out.collect()
    assert len(rows) > 30

    cents = ivf_kmeans_centroids(e, 16, n_rounds=1)
    cells = {r["vec_id"]: r["cell"] for r in
             e.select("vec_id", ivf_cell_expr(F.col("embedding"), cents)
                      .alias("cell")).collect()}
    probed = {r["query_id"]: set(r["p"]) for r in q.select(
        "query_id",
        ivf_probe_cells_expr(F.col("embedding"), cents, 4).alias("p")).collect()}
    for r in rows:
        assert cells[r["neighbor_id"]] in probed[r["query_id"]], r

    # recall floor at k=10
    bs: dict[int, set] = {}
    for r in brute_force_topk(e, q, k=10).collect():
        bs.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    top = ivfpq_ann_topk(e, q, k=10, kmeans_rounds=1).collect()
    ps: dict[int, set] = {}
    for r in top:
        ps.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert sum(len(bs[k] & ps.get(k, set())) / 10 for k in bs) / len(bs) >= 0.25

    # plan: candidate generation is an equi-join keyed by cell
    df = ivfpq_ann_topk(e, q, k=10, kmeans_rounds=1)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [cell" in plan or "ShuffledHashJoin [cell" in plan \
        or "SortMergeJoin [cell" in plan, plan[:1200]


def test_bpe_train_matches_reference_algorithm(spark):
    """BPE training (r4): the learned merge table equals a pure-Python
    reference implementation (word-frequency table, greedy leftmost merge,
    lexicographic ties) on the classic low/lower/newest corpus — including
    run handling ('aaa' merges leftmost-first) and the merge order."""
    import collections
    import re

    from page_evaluator_spark.operators.tokenizer import bpe_train

    text = "low lower lowest low low new newer newest new low new aaa"
    docs = spark.createDataFrame([(1, text)], "doc_id: int, text: string")
    got = bpe_train(docs, n_merges=8)

    words = collections.Counter(re.findall(r"[a-z]+", text))
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for rank in range(8):
        pc: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        m = max(pc.values())
        pair = sorted(" ".join(k) for k, v in pc.items() if v == m)[0]
        a, b = pair.split(" ")
        merges.append((rank, pair, a + b, m))
        newv: dict = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            newv[tuple(out)] = newv.get(tuple(out), 0) + c
        vocab = newv
    assert got == merges
