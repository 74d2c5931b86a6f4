"""Corpus-curation operators a large-scale training-data pipeline needs on
top of pair-wise dedup: duplicate CLUSTERS (connected components), canonical
selection, deterministic stratified sampling, and token-budget packing.

Scale notes:
  * connected components — iterative min-label propagation on the candidate-
    pair edge set (a driver loop of DataFrame joins, the standard Spark shape
    for iterative graph algorithms).  Near-dup clusters are shallow (diameter
    2-4 for boilerplate/dup families), so few iterations; each iteration is
    one shuffle on the label join, lineage truncated per round — reliable
    checkpoint() when a checkpoint dir is configured (cluster-safe),
    localCheckpoint() otherwise.  The large-star/small-star variant
    (connected_components_star, provably O(log n) rounds with non-growing
    edge sets) is implemented alongside for adversarial-diameter graphs —
    both equivalence-pinned against union-find ground truth.
  * stratified sampling — deterministic md5-hash thresholding, NOT rand():
    reproducible across runs, retries and cluster sizes, and exactly
    re-derivable in SQL for the oracle.
  * token-budget packing — sort by a stable key, prefix-sum token counts,
    bin = cumsum div budget.  One window shuffle; bins can overflow by at
    most one document (documented contract — exact greedy packing is
    inherently sequential and not worth a single-threaded pass at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import PORTABLE_TOKEN_RE, minhash_lsh_candidates


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Per-round lineage truncation for iterative algorithms: RELIABLE
    checkpoint() when a checkpoint dir is configured (executor-loss-safe on a
    real cluster), localCheckpoint() as the no-dir single-box fallback."""
    sc = df.sparkSession.sparkContext
    return df.checkpoint() if sc.getCheckpointDir() is not None else df.localCheckpoint()


def doc_hash_bucket(col: Column, n: int = 100) -> Column:
    """Deterministic bucket in [0, n): first 32 bits of md5 of the STRING id,
    mod n — identical in DuckDB
    (('0x' || substr(md5(CAST(x AS VARCHAR)),1,8))::BIGINT % n)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long") % n


def connected_components(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b",
                         max_iter: int = 50) -> DataFrame:
    """(src, dst) edge list → (doc_id, cluster_id) where cluster_id is the
    MINIMUM doc_id reachable from the node (canonical representative).

    Min-label propagation WITH POINTER DOUBLING: each round a node takes the
    min over (its label, its neighbors' labels, its label's label).  The
    label-of-label jump halves remaining path lengths, so convergence is
    O(log diameter) rounds — an adversarial million-node chain converges in
    ~20 rounds where plain propagation needs a million.  Runs to a VERIFIED
    fixpoint (raises rather than ever returning non-converged labels);
    deterministic regardless of partitioning or run order.

    Fault tolerance: per-round lineage truncation uses RELIABLE
    ``checkpoint()`` (HDFS/object-store) whenever a checkpoint dir is
    configured — ``localCheckpoint()`` stores blocks on executors, so on a
    real cluster an executor loss mid-loop would kill the job (the truncated
    lineage cannot recompute).  The local fallback only fires where no
    checkpoint dir exists (single-box sandbox); at 100 TB set
    ``spark.sparkContext.setCheckpointDir(...)`` and rounds become
    individually recoverable.
    """
    edges = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = edges.union(edges.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    labels = (sym.select(F.col("s").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(max_iter):
        nbr = (sym.join(labels.withColumnRenamed("node", "d2"),
                        sym["d"] == F.col("d2"))
               .select(F.col("s").alias("node"), "label"))
        # pointer doubling: label(label) — every node's label is itself a node
        # (labels start as identity and only ever move to existing node ids)
        jump = (labels.select("node", F.col("label").alias("mid"))
                .join(labels.select(F.col("node").alias("mid"),
                                    F.col("label").alias("jlabel")), "mid")
                .select("node", F.col("jlabel").alias("label")))
        new_labels = (labels.unionByName(nbr).unionByName(jump)
                      .groupBy("node").agg(F.min("label").alias("label")))
        new_labels = _truncate_lineage(new_labels)
        changed = (labels.withColumnRenamed("label", "old")
                   .join(new_labels, "node")
                   .where(F.col("old") != F.col("label")).count())
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("node").alias("doc_id"),
                                 F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        f"with pointer doubling this needs a component diameter > 2^{max_iter}")


def connected_components_star(pairs: DataFrame, src: str = "doc_a",
                              dst: str = "doc_b", max_iter: int = 50) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond", 2014) —
    the adversarial-scale alternative to min-label propagation: provably
    O(log n) rounds with edge-set size that never grows beyond the input.

    large-star(u): link every strictly-greater neighbor of u to
    m = min(Γ(u) ∪ {u});  small-star(u): link every ≤-neighbor and u itself
    to the min of that set.  At fixpoint every component is a star centered
    at its minimum node; labels read directly off the edges.  Each half-round
    is one groupBy(min) + one join — the same shuffle primitives as the
    pointer-doubling variant (equivalence-pinned by test), but with
    per-round edge-count monotonicity that survives adversarial diameters.
    """
    def _mins(sym: DataFrame) -> DataFrame:
        return (sym.groupBy("u").agg(F.min("v").alias("minv"))
                .select("u", F.least(F.col("u"), F.col("minv")).alias("m")))

    def _edge_sig(df: DataFrame) -> tuple[int, int]:
        # ONE action per round: (count, order-independent checksum).  An
        # unchanged signature nominates a fixpoint, which is then verified
        # EXACTLY (checksum collisions can't fake convergence) — the exact
        # exceptAll shuffle is paid once at the end, not every round.
        row = df.agg(F.count("*").alias("n"),
                     F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                                F.lit(0)).alias("chk")).collect()[0]
        # decimal sum: exact and order-independent, never overflows (ANSI
        # mode makes a plain long sum of 64-bit hashes abort the job)
        return int(row["n"]), int(row["chk"])

    edges = (pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
             .where(F.col("u") != F.col("v")).distinct())
    sig = _edge_sig(edges)
    for _ in range(max_iter):
        sym = (edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
               .distinct())
        # large-star
        large = (sym.where(F.col("v") > F.col("u"))
                 .join(_mins(sym), "u")
                 .select(F.col("m").alias("u"), "v")
                 .where(F.col("u") != F.col("v")).distinct())
        sym2 = (large.union(large.select(F.col("v").alias("u"), F.col("u").alias("v")))
                .distinct())
        # small-star over the ≤ neighborhood (plus u itself via least())
        le = sym2.where(F.col("v") < F.col("u"))
        small_m = (le.groupBy("u").agg(F.min("v").alias("minv"))
                   .select("u", F.least(F.col("u"), F.col("minv")).alias("m")))
        small = (le.join(small_m, "u")
                 .select(F.col("m").alias("nu"), F.col("v"), F.col("u").alias("ou"))
                 .select(F.explode(F.array(
                     F.struct(F.col("nu").alias("u"), F.col("v").alias("v")),
                     F.struct(F.col("nu").alias("u"), F.col("ou").alias("v")))).alias("e"))
                 .select("e.u", "e.v")
                 .where(F.col("u") != F.col("v")).distinct())
        new_edges = _truncate_lineage(small)
        # both sets are distinct, so a verified equal set means fixpoint
        new_sig = _edge_sig(new_edges)
        changed = (new_sig != sig) or new_edges.exceptAll(edges).count() > 0
        sig = new_sig
        edges = new_edges
        if not changed:
            # fixpoint: stars centered at component minima — (center, node)
            nodes = edges.select(F.col("v").alias("doc_id"),
                                 F.col("u").alias("cluster_id"))
            centers = edges.select(F.col("u").alias("doc_id"),
                                   F.col("u").alias("cluster_id")).distinct()
            labels = nodes.unionByName(centers).distinct()
            # self-loop-only nodes were dropped by the u != v entry filter but
            # ARE labeled (with themselves) by connected_components — keep the
            # two variants row-for-row interchangeable
            all_nodes = (pairs.select(F.col(src).alias("doc_id"))
                         .union(pairs.select(F.col(dst).alias("doc_id"))).distinct())
            singletons = (all_nodes.join(labels, "doc_id", "left_anti")
                          .withColumn("cluster_id", F.col("doc_id")))
            return labels.unionByName(singletons)
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds")


def dedup_clusters(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Near-dup clusters over the MinHash-LSH candidate pairs: every doc that
    appears in a candidate pair, with its cluster's canonical (min) doc_id."""
    pairs = minhash_lsh_candidates(docs, text_col=text_col, id_col=id_col)
    return connected_components(pairs)


def stratified_sample(docs: DataFrame, strata_col: str, rates: dict[str, int],
                      default_pct: int = 0, id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    md5-bucket(id) < pct(stratum).  Rates are integer percents (0-100)."""
    pct = F.lit(default_pct)
    expr = None
    for value, p in sorted(rates.items()):
        cond = F.col(strata_col) == value
        expr = F.when(cond, p) if expr is None else expr.when(cond, p)
    pct = expr.otherwise(default_pct) if expr is not None else pct
    return docs.where(doc_hash_bucket(F.col(id_col)) < pct)


def benchmark_contamination(docs: DataFrame, benchmark_grams: DataFrame,
                            shingle_n: int = 3, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Test-set decontamination scan: per document, how many of its distinct
    token n-grams appear in a benchmark gram set (the GPT-3-style n-gram
    overlap check a training pipeline runs before training).

    Scale shape: the document side explodes its shingles as a PIPELINED
    Generate (never shuffled raw — at 100 TB the gram stream exists only
    inside map tasks); the benchmark set is evaluation-suite-sized →
    broadcast, so matching happens map-side; the only shuffle carries one
    partially-aggregated count row per doc.  Returns every input document:
    (doc_id, n_contaminated, contaminated).
    """
    from .dedup import token_shingles

    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(token_shingles(F.col(text_col), shingle_n)).alias("gram"))
    bench = F.broadcast(benchmark_grams.select("gram").distinct()
                        .withColumn("_hit", F.lit(1)))
    return (grams.join(bench, "gram", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("int")
                 .alias("n_contaminated"))
            .withColumn("contaminated", F.col("n_contaminated") > 0))


def remove_boilerplate_lines(docs: DataFrame, min_docs: int = 3,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """CCNet/RefinedWeb-style inter-document boilerplate removal: a line whose
    trimmed form appears in ≥ min_docs DISTINCT documents is stripped from
    every document; whitespace-only lines always survive (they are structure,
    not boilerplate).

    Scale shape: line explode is pipelined; the frequency pass is a two-phase
    count-distinct on md5(line) (the shuffle carries hashes, never text); the
    frequent-line set is small relative to the corpus — AQE broadcasts the
    membership join when it fits and skew-splits it when a web-scale corpus
    makes it genuinely large (no forced broadcast hint for exactly that
    reason); reconstruction is ONE doc_id shuffle carrying kept lines
    (doc-sized groups, the spans_out pattern).  Returns every input document:
    (doc_id, n_lines, n_removed, clean_text).

    NULL-text documents pass through unchanged: clean_text stays NULL (so a
    downstream gate audits them as NULL-text drops instead of seeing a
    silently fabricated empty string) and n_lines/n_removed are 0 — never
    NULL, keeping the per-doc stats contract total.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    key = F.md5(F.trim(F.col("line")))
    nonempty = lines.where(F.trim("line") != "")
    boiler = (nonempty.groupBy(key.alias("k"))
              .agg(F.count_distinct("doc_id").alias("nd"))
              .where(F.col("nd") >= min_docs)
              .select("k", F.lit(True).alias("_boiler")))
    kept = (lines.withColumn("k", key)
            .join(boiler, "k", "left")
            .where(F.col("_boiler").isNull() | (F.trim("line") == "")))
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.concat_ws("\n", F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"])).alias("clean_text"),
                    F.count("*").alias("n_kept")))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).isNull().alias("_null_text"),
        F.coalesce(F.size(F.split(F.col(text_col), "\n")), F.lit(0)).alias("n_lines"))
    return (base.join(rebuilt, "doc_id", "left")
            .select("doc_id", "n_lines",
                    (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
                    .cast("int").alias("n_removed"),
                    F.when(F.col("_null_text"), F.lit(None).cast("string"))
                    .otherwise(F.coalesce("clean_text", F.lit("")))
                    .alias("clean_text")))


LM_FXP = 1 << 20  # fixed-point scale for per-token LM costs


def unigram_lm_scores(docs: DataFrame, head_nll: float = 6.0, tail_nll: float = 8.0,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """CCNet-style language-model quality scoring, self-trained: a unigram LM
    estimated from the corpus itself scores every document by mean negative
    log-likelihood, and fixed cutoffs bucket docs into head/middle/tail
    (CCNet trains KenLM offline and buckets by perplexity with per-language
    cutoffs computed on a sample; the engine shape is identical).

    Scale shape: token explode is PIPELINED (never shuffled raw); the LM
    "training" is one map-side-combined count aggregate (shuffle carries
    vocabulary rows, not tokens); the corpus total is a broadcast scalar;
    scoring joins per-token costs back to the exploded stream on the token
    key (AQE broadcasts a small vocabulary, shuffles a web-scale one) and
    reduces to one count+sum row per doc.  Bucketing is a comparison against
    FIXED thresholds — no global sort/window, the shape that survives 10¹²
    docs (corpus-relative tercile cutoffs would need a global quantile; run
    approx_percentile offline to calibrate head_nll/tail_nll, as CCNet does).

    Determinism: per-token cost = floor(−ln(count/total) · 2²⁰) as a LONG, so
    per-doc sums are exact and order-independent; the final mean divides two
    exact integers (< 2⁵³) — bit-identical at any parallelism and in DuckDB.
    (The ln itself is evaluated once per VOCABULARY entry; a 1-ulp libm
    difference could flip a floor only if −ln(p)·2²⁰ lands within ~1e-10 of
    an integer — negligible, and confined to one vocab row, not per token.)

    Returns every input doc: (doc_id, n_tokens, nll, lm_bucket); token-less
    docs carry NULL nll and bucket 'empty'.
    """
    per_doc = _lm_doc_nll(docs, text_col, id_col)
    nll = F.col("_sc").cast("double") / (F.col("n_tokens").cast("double")
                                         * F.lit(float(LM_FXP)))
    scored = per_doc.select(
        "doc_id", "n_tokens", F.round(nll, 6).alias("nll"),
        F.when(nll < head_nll, "head").when(nll < tail_nll, "middle")
        .otherwise("tail").alias("lm_bucket"))
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (base.join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    "nll",
                    F.coalesce("lm_bucket", F.lit("empty")).alias("lm_bucket")))


def _lm_doc_nll(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, _sc fixed-point cost sum, n_tokens) under the self-trained
    unigram LM — the shared core of scoring and cutoff calibration."""
    from .skew import ensure_min_parallelism

    toks = (ensure_min_parallelism(docs)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(F.regexp_extract_all(
                        F.lower(F.col(text_col)), F.lit(PORTABLE_TOKEN_RE), 0))
                    .alias("tok")))
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = F.broadcast(counts.agg(F.sum("c").alias("_total")))
    costs = (counts.crossJoin(total)
             .select("tok", F.floor(-F.log(F.col("c").cast("double")
                                           / F.col("_total").cast("double"))
                                    * F.lit(float(LM_FXP))).alias("cost")))
    return (toks.join(costs, "tok")
            .groupBy("doc_id")
            .agg(F.sum("cost").alias("_sc"),
                 F.count("*").cast("int").alias("n_tokens")))


def calibrate_lm_cutoffs(docs: DataFrame, head_frac: float = 1 / 3,
                         tail_frac: float = 2 / 3, text_col: str = "text",
                         id_col: str = "doc_id") -> tuple[float, float]:
    """The CCNet 'cutoffs computed on a sample' step: approximate NLL
    quantiles of the corpus (approx_percentile sketch — mergeable, one pass,
    no global sort; run on a sample/partition of the corpus offline) whose
    outputs feed unigram_lm_scores' FIXED thresholds.  Returns
    (head_nll, tail_nll), each nudged one ulp ABOVE the quantile: the bucket
    rule is strict-< and corpora have NLL atoms (many docs share one score),
    so a cutoff sitting exactly on an atom would otherwise push the whole
    atom into the worse bucket instead of keeping at-quantile docs."""
    import math

    per_doc = _lm_doc_nll(docs, text_col, id_col)
    nll = (F.col("_sc").cast("double")
           / (F.col("n_tokens").cast("double") * F.lit(float(LM_FXP))))
    row = (per_doc.select(nll.alias("nll"))
           .agg(F.percentile_approx("nll", [head_frac, tail_frac], 10_000)
                .alias("q")).collect()[0])
    if row["q"] is None:
        raise ValueError(
            "calibrate_lm_cutoffs: the corpus yielded no tokenized documents "
            "(every text NULL/whitespace-only?) — no NLL distribution to "
            "calibrate against")
    return (math.nextafter(float(row["q"][0]), math.inf),
            math.nextafter(float(row["q"][1]), math.inf))


def assign_packed_seq_ids(costed: DataFrame, budget: int,
                          cost_col: str) -> DataFrame:
    """THE sharded prefix-sum bin assignment (shared by pack_token_budget and
    media.pack_interleaved_sequences — hold the idiom in ONE place so the
    window definition, the 2^40 bins-per-shard constant, and the
    overflow-by-one contract cannot diverge between the text and multimodal
    packers or their DuckDB twins).

    Input must carry (doc_id, shard, <cost_col>); within a shard, stable
    order (doc_id), prefix-sum of cost, local bin = (cumsum - cost) div
    budget; seq_id = shard * 2^40 + local bin (2^40 bins/shard ≈ 5×10^14
    tokens per shard at budget 512 — no collision at any realistic scale;
    raise n_shards, not the multiplier, beyond that).  A bin may overflow by
    at most one doc: every bin's total cost < budget + (its last doc's
    cost), because the bin's start offset ≥ bin·budget and its last doc
    starts below (bin+1)·budget — exact greedy packing is inherently
    sequential; the per-shard prefix sum is the scalable contract."""
    from pyspark.sql import Window

    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return costed.withColumn(
        "seq_id",
        F.col("shard") * F.lit(1 << 40)
        + F.floor((F.sum(cost_col).over(w) - F.col(cost_col)) / budget))


def pack_token_budget(docs: DataFrame, budget: int = 512, n_shards: int = 16,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Assign docs to training-sequence bins of ~`budget` tokens.

    SHARDED packing (a global ordered window would be one task at 100 TB):
    docs hash into n_shards independent streams; the bin math (and the
    overflow-by-one contract) lives in assign_packed_seq_ids, shared with
    the multimodal packer.  Returns (seq_id, n_docs, total_tokens).
    """
    from .skew import ensure_min_parallelism

    n_tok = F.regexp_count(F.col(text_col), F.lit(PORTABLE_TOKEN_RE))
    toks = (ensure_min_parallelism(docs)
            .select(F.col(id_col).alias("doc_id"),
                    doc_hash_bucket(F.col(id_col), n_shards).alias("shard"),
                    n_tok.cast("long").alias("n_tokens")))
    packed = assign_packed_seq_ids(toks, budget, "n_tokens")
    return (packed.groupBy("seq_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens")))


def source_mixture_targets(docs: DataFrame, alpha_num: int = 1, alpha_den: int = 2,
                           budget_pct: int = 50, text_col: str = "text",
                           source_col: str = "source") -> list[tuple[str, int, int]]:
    """Temperature-scaled corpus mixture targets (the multilingual-training
    α-sampling rule, e.g. mBERT/XLM-R's p^α rebalancing): per-source token
    share p_s is flattened to p_s^α (α = alpha_num/alpha_den, default 0.5)
    and renormalized, then a global token budget (budget_pct% of corpus
    tokens) is split across sources proportionally.

    Returns [(source, total_tokens, target_tokens)] sorted by source — a
    dimension-table collect (|sources| rows, like the IVF centroid seeds).
    Float steps are pinned to one evaluation order (fold over sources sorted
    by name; left-assoc B*w/W) so the Python values are bit-identical to the
    DuckDB twin's list_reduce fold.  Only α ∈ {1/2, 1} keeps the power exact
    (sqrt is correctly rounded; pow() is not) — guarded."""
    _mixture_alpha_guard(alpha_num, alpha_den)
    n_tok = F.regexp_count(F.col(text_col), F.lit(PORTABLE_TOKEN_RE))
    rows = (docs.groupBy(F.col(source_col).alias("source"))
            .agg(F.coalesce(F.sum(n_tok.cast("long")), F.lit(0))
                 .alias("toks"))
            .collect())
    # fail loudly on NULL sources (code-review r5): they cannot take part in
    # per-source quotas (the shard-class inner join would silently drop
    # them) and a None key breaks the deterministic sorted fold below
    if any(r["source"] is None for r in rows):
        raise ValueError(
            f"source_mixture_targets: NULL values in '{source_col}' — assign "
            f"an explicit bucket (e.g. 'unknown') before mixture sampling")
    return _targets_from_totals(sorted((r["source"], int(r["toks"]))
                                       for r in rows),
                                alpha_den, budget_pct)


def _mixture_alpha_guard(alpha_num: int, alpha_den: int) -> None:
    if (alpha_num, alpha_den) not in ((1, 2), (1, 1)):
        raise ValueError("alpha must be 1/2 or 1: x**0.5 (sqrt) and x**1 are "
                         "the correctly-rounded powers both engines agree on")


def _targets_from_totals(totals: list[tuple[str, int]], alpha_den: int,
                         budget_pct: int) -> list[tuple[str, int, int]]:
    """The pure-Python quota math behind source_mixture_targets, shared with
    the sharded selection path (which derives per-source totals from the
    same collect that classifies shards).  `totals` must be sorted by
    source — the float fold order IS the cross-engine contract."""
    import math

    grand = sum(t for _, t in totals)
    if grand == 0:
        return [(s, 0, 0) for s, _ in totals]
    # ADVICE r5: the bit-identical-to-DuckDB claim needs t/grand (one
    # correctly-rounded big-int division) to equal the twin's
    # double(t)/double(grand) (two conversions then a divide) — true only
    # while every operand is exactly representable.  Same invariant class
    # as ivf_kmeans_centroids: fail loudly, don't drift in the last bit.
    if grand >= 1 << 53:
        raise ValueError(
            f"source_mixture_targets: corpus token total {grand} exceeds "
            f"2^53 — the Python t/grand share and the DuckDB "
            f"double-cast division are no longer guaranteed bit-identical; "
            f"compute targets with a fixed-point rational share instead")
    budget = grand * budget_pct // 100
    weights = []
    for s, t in totals:
        p = t / grand
        weights.append(math.sqrt(p) if alpha_den == 2 else p)
    wsum = 0.0
    for w in weights:
        wsum += w
    return [(s, t, int(math.floor(budget * w / wsum)))
            for (s, t), w in zip(totals, weights)]


def _mixture_base(docs: DataFrame, text_col: str, source_col: str,
                  id_col: str, with_n_tok: bool = True) -> DataFrame:
    """(doc_id, source, n_tok, shuf, shard, doc_key) — the narrow per-doc
    frame every mixture pass projects.  shard = first two hex chars of the
    md5 shuffle key: a CONTIGUOUS md5-range slice of the per-source
    (shuf, doc_id) order (lowercase hex strings sort like their numeric
    value), so per-shard token totals prefix-sum to exactly the global
    per-source running total.

    with_n_tok=False carries the raw text as `_text` instead of the token
    count (r7): the selection pass only needs n_tok INSIDE boundary shards
    (~1/256 of one source), but an eager n_tok is evaluated for every row
    that reaches the shard-class join — deferring the tokenization to
    after the boundary filter removes a full corpus tokenize pass from
    domain_mixture_sample / domain_mixture_keep (the phase-1 stats pass
    still pays exactly one)."""
    from .skew import ensure_min_parallelism

    if with_n_tok:
        payload = (F.regexp_count(F.col(text_col), F.lit(PORTABLE_TOKEN_RE))
                   .cast("long").alias("n_tok"))
    else:
        payload = F.col(text_col).alias("_text")
    return (ensure_min_parallelism(docs)
            .select(F.col(id_col).alias("doc_id"),
                    F.col(source_col).alias("source"),
                    payload,
                    F.md5(F.col(id_col).cast("string")).alias("shuf"))
            .withColumn("shard", F.conv(F.substring("shuf", 1, 2), 16, 10)
                        .cast("int"))
            .withColumn("doc_key", F.conv(F.substring("shuf", 1, 12), 16, 10)
                        .cast("long")))


def _mixture_selection(docs: DataFrame, alpha_num: int, alpha_den: int,
                       budget_pct: int, text_col: str, source_col: str,
                       id_col: str):
    """Two-phase SHARDED mixture selection (VERDICT r5 #1 — the r4 form
    funnelled each source's whole corpus slice through ONE cumulative-sum
    window task; a dominant source serialized the job).

    Phase 1 — one map-side-combined agg over the corpus, collected at
    dimension size (≤ |sources| × 256 rows, the same collect class as the
    IVF centroid seeds): per-(source, md5-shard) token totals, doc counts
    and 48-bit-key xors.  Driver-side, shards are prefix-summed IN SHARD
    ORDER (= the global per-source order, since shards are contiguous
    md5 ranges) and classified: `keep` (whole shard fits under the quota),
    `drop` (the quota was already exhausted before the shard), `boundary`
    (the quota lands inside it — at most ONE per source).

    Phase 2 — the per-doc windowed scan runs ONLY inside boundary shards,
    partitioned by (source, shard): ~1/256 of the dominant source per task
    instead of all of it.  Keep-all shard contributions come straight from
    the phase-1 stats.  The keep set is IDENTICAL to the single-window
    form (pinned by tests/test_round6_fixes.py).

    Returns (sel, keepall_rows): `sel` = the per-doc base inner-joined to
    the broadcast shard-class table; `keepall_rows` = per-source Python
    rows (source, total_tokens, target_tokens, kept_docs, kept_tokens,
    keep_check) aggregated over the keep-all shards (every source present,
    zeros when none)."""
    _mixture_alpha_guard(alpha_num, alpha_den)
    stats = (_mixture_base(docs, text_col, source_col, id_col)
             .groupBy("source", "shard")
             .agg(F.coalesce(F.sum("n_tok"), F.lit(0)).alias("toks"),
                  F.count("*").alias("n_docs"),
                  F.coalesce(F.expr("bit_xor(doc_key)"), F.lit(0))
                  .alias("key_xor"))
             .collect())
    if any(r["source"] is None for r in stats):
        raise ValueError(
            f"domain_mixture: NULL values in '{source_col}' — assign an "
            f"explicit bucket (e.g. 'unknown') before mixture sampling")
    stats = sorted((r["source"], int(r["shard"]), int(r["toks"]),
                    int(r["n_docs"]), int(r["key_xor"])) for r in stats)
    totals: dict[str, int] = {}
    for s, _, t, _, _ in stats:
        totals[s] = totals.get(s, 0) + t
    targets = _targets_from_totals(sorted(totals.items()), alpha_den,
                                   budget_pct)
    tgt = {s: (tot, quota) for s, tot, quota in targets}
    cls_rows = []
    keepall = {s: [0, 0, 0] for s in tgt}
    off: dict[str, int] = {}
    for s, sh, t, n, x in stats:
        o = off.get(s, 0)
        quota = tgt[s][1]
        if o + t <= quota:
            cls = "keep"
            ka = keepall[s]
            ka[0] += n
            ka[1] += t
            ka[2] ^= x
        elif o > quota:
            cls = "drop"
        else:
            cls = "boundary"
        cls_rows.append((s, sh, cls, o, quota))
        off[s] = o + t
    spark = docs.sparkSession
    cls_df = F.broadcast(spark.createDataFrame(
        cls_rows, "source: string, shard: int, cls: string, "
                  "shard_off: long, target_tokens: long"))
    # the selection side defers tokenization (`_text`, not n_tok) — only
    # _boundary_cum's post-filter projection pays it, on boundary rows only
    sel = (_mixture_base(docs, text_col, source_col, id_col,
                         with_n_tok=False)
           .join(cls_df, ["source", "shard"]))
    keepall_rows = [(s, tgt[s][0], tgt[s][1], ka[0], ka[1], ka[2])
                    for s, ka in sorted(keepall.items())]
    return sel, keepall_rows


def _boundary_cum(sel: DataFrame) -> DataFrame:
    """Per-doc running token totals inside boundary shards only: the window
    partitions by (source, shard) — never by source alone — and the global
    cum is shard_off + the within-shard prefix sum (exact because shards
    are contiguous slices of the (shuf, doc_id) order).  n_tok is computed
    HERE, after the boundary filter and before the window exchange (so the
    exchange carries a long, never text) — the r6 shape tokenized every
    row that reached the shard-class join (r7, guide §1.2)."""
    from pyspark.sql import Window

    w = (Window.partitionBy("source", "shard").orderBy("shuf", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n_tok = F.regexp_count(F.col("_text"), F.lit(PORTABLE_TOKEN_RE))
    return (sel.where(F.col("cls") == "boundary")
            .withColumn("n_tok", n_tok.cast("long")).drop("_text")
            .withColumn("cum", F.col("shard_off") + F.sum("n_tok").over(w)))


def domain_mixture_keep(docs: DataFrame, alpha_num: int = 1, alpha_den: int = 2,
                        budget_pct: int = 50, text_col: str = "text",
                        source_col: str = "source", id_col: str = "doc_id"
                        ) -> DataFrame:
    """The kept doc ids of the mixture resample — the form a curation STAGE
    consumes (semi/anti joins against the corpus); domain_mixture_sample
    aggregates the same selection into the per-source audit rollup.

    Cost shape: three narrow corpus scans (phase-1 stats, the keep-all
    filter, the boundary filter) and zero corpus-wide sorts — at 100 TB a
    streamed re-scan of a ~50-byte projection beats re-shuffling and
    sorting every dominant-source row through one window task."""
    sel, _ = _mixture_selection(docs, alpha_num, alpha_den, budget_pct,
                                text_col, source_col, id_col)
    keep_all = sel.where(F.col("cls") == "keep").select("doc_id")
    bnd = (_boundary_cum(sel)
           .where(F.col("cum") <= F.col("target_tokens"))
           .select("doc_id"))
    return keep_all.unionByName(bnd)


def domain_mixture_sample(docs: DataFrame, alpha_num: int = 1, alpha_den: int = 2,
                          budget_pct: int = 50, text_col: str = "text",
                          source_col: str = "source", id_col: str = "doc_id"
                          ) -> DataFrame:
    """Deterministic mixture resampling to the source_mixture_targets quota:
    within each source, docs are ordered by (md5(id), id) — a fixed
    pseudo-random shuffle — and kept while the running token count stays
    within the source's target.  The keep set is therefore a pure function
    of the corpus (idempotent across retries/partitionings).

    Returns the per-source audit rollup (source, total_tokens,
    target_tokens, kept_docs, kept_tokens, keep_check) where keep_check is
    the bit_xor of 48-bit md5 doc keys — an order-independent, overflow-free
    set-equality probe for the kept ids that both engines compute
    identically (a DECIMAL(38,0) sum survives the engines but not pandas:
    DuckDB's .df() narrows it to float64).

    Scale shape (VERDICT r5 #1): the two-phase sharded selection of
    _mixture_selection — keep-all shard contributions come from the
    dimension-sized phase-1 stats; only the single boundary shard per
    source (~1/256 of it) is windowed, partitioned by (source, shard).
    No task ever scans a whole source."""
    sel, keepall_rows = _mixture_selection(docs, alpha_num, alpha_den,
                                           budget_pct, text_col, source_col,
                                           id_col)
    spark = docs.sparkSession
    schema = ("source: string, total_tokens: long, target_tokens: long, "
              "kept_docs: long, kept_tokens: long, keep_check: long")
    ka = spark.createDataFrame(keepall_rows, schema)
    kept = F.col("cum") <= F.col("target_tokens")
    bnd = (_boundary_cum(sel)
           .withColumn("kept_key", F.when(kept, F.col("doc_key")))
           .groupBy("source")
           .agg(F.sum(kept.cast("long")).alias("kept_docs"),
                F.coalesce(F.sum(F.when(kept, F.col("n_tok"))), F.lit(0))
                .cast("long").alias("kept_tokens"),
                F.coalesce(F.expr("bit_xor(kept_key)"), F.lit(0))
                .cast("long").alias("keep_check"))
           .select("source",
                   F.lit(0).cast("long").alias("total_tokens"),
                   F.lit(0).cast("long").alias("target_tokens"),
                   "kept_docs", "kept_tokens", "keep_check"))
    # combine: ka carries every source (with the real total/target), the
    # boundary partial carries at most one row per source — max/sum/xor
    # fold the two.
    return (ka.unionByName(bnd).groupBy("source")
            .agg(F.max("total_tokens").alias("total_tokens"),
                 F.max("target_tokens").alias("target_tokens"),
                 F.sum("kept_docs").cast("long").alias("kept_docs"),
                 F.sum("kept_tokens").cast("long").alias("kept_tokens"),
                 F.expr("bit_xor(keep_check)").cast("long")
                 .alias("keep_check"))
            .orderBy("source"))


def dsir_importance_sample(docs: DataFrame, n_buckets: int = 256, top_k: int = 100,
                           quality_threshold: float = 0.5, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """DSIR-shaped hashed-n-gram importance resampling (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    documents are scored by how much their hashed unigram distribution looks
    like a TARGET domain (here: the corpus' own high-quality slice,
    quality_score >= threshold) relative to the RAW distribution, and the
    top-k by score are selected.

    Deviation from the paper, on purpose: the per-feature log-likelihood
    ratio log((t_b+1)/(r_b+1)) is replaced by the FIXED-POINT RATIONAL ratio
    (t_b+1)·2^20 // (r_b+1) — ln() is not correctly rounded and diverges
    across libms, while integer floor division is bit-exact in every engine
    (the repo-wide fixed-point doctrine).  Per-feature monotonicity is
    preserved; scores are comparable within a corpus, which is all top-k
    selection needs.

    Scale shape: token explode → per-bucket count aggs (two n_buckets-row
    tables) → broadcast join back onto the exploded tokens → per-doc long
    sum → top-k as orderBy(...).limit(k), which Spark executes as
    TakeOrderedAndProject: per-partition top-k heaps merged on the driver —
    k rows cross the wire per partition, never the corpus.  (A global
    row_number window would funnel every doc through ONE partition: plan-
    checked and rejected — no WindowGroupLimit pushdown fires for the
    unpartitioned rank filter in Spark 4.1.)  The rank column is then a
    window over the k-row result only.  Everything shuffles hashes and
    longs, never text."""
    from pyspark.sql import Window

    from ..functions.textstats import quality_score
    from .skew import ensure_min_parallelism

    fxp = 1 << 20
    toks = (ensure_min_parallelism(docs)
            .select(F.col(id_col).alias("doc_id"),
                    quality_score(F.col(text_col)).alias("q"),
                    F.explode(F.regexp_extract_all(F.lower(F.col(text_col)),
                                                   F.lit(PORTABLE_TOKEN_RE), 0))
                    .alias("tok")))
    bucket = (F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
              .cast("long") % n_buckets)
    tb = toks.select("doc_id", "q", bucket.alias("b"))
    # NOTE (optimization round): two restructures of this three-pass shape
    # were measured SLOWER at sf1.0 and rejected — a (doc_id, bucket)
    # pre-reduction (trades the map-side combine for a corpus-sized
    # exchange, 3.8 s → 5.8 s) and a merged conditional raw/target agg
    # (defeats column pruning: the raw and scoring passes currently never
    # evaluate quality_score at all, and the target pass tokenizes only the
    # quality-filtered docs).  The original is the optimum of the shapes
    # tried.
    raw = tb.groupBy("b").agg(F.count("*").alias("r_cnt"))
    tgt = (tb.where(F.col("q") >= quality_threshold)
           .groupBy("b").agg(F.count("*").alias("t_cnt")))
    lr = F.broadcast(
        raw.join(tgt, "b", "left")
        .select("b", F.expr(f"(coalesce(t_cnt, 0L) + 1L) * {fxp} "
                            f"div (r_cnt + 1L)").alias("lr_fx")))
    scored = (tb.join(lr, "b")
              .groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_tok"),
                   F.sum("lr_fx").cast("long").alias("score_sum")))
    per_tok = F.expr("score_sum div n_tok")
    topk = (scored.where(F.col("n_tok") > 0)
            .withColumn("score_fx", per_tok)
            .orderBy(F.col("score_fx").desc(), "doc_id")
            .limit(top_k))
    w = Window.orderBy(F.col("score_fx").desc(), "doc_id")
    return (topk.withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id", "n_tok", "score_fx"))
