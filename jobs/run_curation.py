#!/usr/bin/env python
"""Corpus-curation job entry point (ship path: spark-submit --py-files).

Composes the training-data curation operators into the pass a 100 TB
pipeline runs before tokenization — each stage is an operator this package
already exposes (and that the driver harness hash-verifies individually):

  strip         inter-document boilerplate-line removal (curation.remove_boilerplate_lines)
  filter        min-token / quality / language gates + exact-dup canonicalization
  model_filter  model-based quality gate (textstats.model_quality_wsum — the
                fastText-classifier-shaped linear scorer); OPT-IN: not in the
                default stage list, enable via --stages
  lm_filter     LM-perplexity gate (CCNet shape, curation._lm_doc_nll core):
                drops docs above the tail NLL cutoff AND token-less docs;
                cutoff from --lm-tail or, when omitted, calibrated on the
                input at the 2/3 NLL quantile; OPT-IN
  exact_substring cross-document exact-substring removal (Lee et al. 2021,
                dedup.exact_substring_clean): duplicated windows merge into
                maximal spans and are CUT from the text (case-preserved,
                whitespace-collapsed form; untouched docs pass through
                verbatim), keeping one canonical occurrence corpus-wide;
                rewrites affected text, drops nothing; OPT-IN
  decontaminate benchmark n-gram overlap drop (curation.benchmark_contamination)
  cluster       MinHash-LSH near-dup clusters; keep each cluster's canonical doc
  pack          token-budget sequence packing (curation.pack_token_budget)

  spark-submit --py-files pageeval.zip jobs/run_curation.py \
      --input <documents table/path> --output <root> \
      [--stages strip,filter,model_filter,cluster,pack] \
      [--benchmark <gram table/path>] \
      [--min-tokens 10] [--min-quality 0.4] [--model-min-score 0.5] \
      [--langs en,de,fr,es] [--budget 512] [--quiet]

  --benchmark is REQUIRED whenever --stages names decontaminate (the job
  errors rather than silently skipping an explicitly requested stage).

Outputs under --output: `clean_docs` (survivors, cleaned text),
`curation_audit` (every input doc with its drop stage or NULL),
`sequences` (packed training bins).  Stages are pure batch transforms; for
resumable chunked execution wrap the INPUT with jobs/run_pipeline.py's
lineage runner — this job's contract is one deterministic pass.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# canonical stage order; model_filter/lm_filter/exact_substring/mixture/dsir
# are opt-in (mixture needs a `source` column; dsir imposes a hard global doc
# count; exact_substring rewrites text to its normalized form).
# exact_substring runs BEFORE decontaminate/cluster so the gram scan and the
# near-dup signatures see the final text.
ALL_STAGES = ["strip", "filter", "model_filter", "lm_filter",
              "exact_substring", "decontaminate", "cluster", "mixture",
              "dsir", "pack"]
DEFAULT_STAGES = [s for s in ALL_STAGES
                  if s not in ("model_filter", "lm_filter", "exact_substring",
                               "mixture", "dsir")]


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Curate a documents corpus for training")
    p.add_argument("--input", required=True, help="documents table (doc_id, text, lang)")
    p.add_argument("--output", required=True, help="output root")
    p.add_argument("--stages", default=None,
                   help=f"comma-separated subset of {ALL_STAGES}, applied in canonical "
                        f"order (default: {','.join(DEFAULT_STAGES)} — model_filter "
                        f"is opt-in)")
    p.add_argument("--benchmark", default=None,
                   help="gram table/path (column `gram`) for decontamination")
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--min-quality", type=float, default=0.4)
    p.add_argument("--model-min-score", type=float, default=0.5,
                   help="model_filter keeps docs with sigmoid score >= this")
    p.add_argument("--lm-tail", type=float, default=None,
                   help="lm_filter drops docs with NLL >= this (default: "
                        "calibrated at the input's 2/3 NLL quantile)")
    p.add_argument("--substring-width", type=int, default=24,
                   help="exact_substring stage: duplicated-window width in "
                        "chars (>= 8 — shorter windows flag common phrases, "
                        "not duplicated passages)")
    p.add_argument("--langs", default="en,de,fr,es")
    p.add_argument("--boiler-min-docs", type=int, default=3)
    p.add_argument("--budget", type=int, default=512)
    p.add_argument("--mixture-budget-pct", type=int, default=50,
                   help="mixture stage: token budget as %% of corpus tokens "
                        "(1-100)")
    p.add_argument("--dsir-top-k", type=int, default=1000,
                   help="dsir stage: number of most target-like docs to keep "
                        "(>= 1)")
    p.add_argument("--master", default=None)
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args(argv)
    # ANY user-supplied --stages is explicit — including one that happens to
    # spell out the full canonical list.  (Comparing the string to the default
    # list would silently drop an explicitly requested decontaminate below.)
    explicit = args.stages is not None
    stages_str = args.stages if explicit else ",".join(DEFAULT_STAGES)
    stages = [s.strip() for s in stages_str.split(",") if s.strip()]
    unknown = set(stages) - set(ALL_STAGES)
    if unknown:
        p.error(f"unknown stages: {sorted(unknown)}")
    if not 0.0 < args.model_min_score < 1.0:
        p.error("--model-min-score must be in (0, 1) — it is a sigmoid score")
    if args.lm_tail is not None and args.lm_tail <= 0:
        p.error("--lm-tail must be positive (it is a mean NLL in nats)")
    if not 1 <= args.mixture_budget_pct <= 100:
        # out-of-range quotas silently write an EMPTY corpus with exit 0 —
        # the same worst-failure-mode class the decontaminate guard names
        p.error("--mixture-budget-pct must be in [1, 100]")
    if args.dsir_top_k < 1:
        p.error("--dsir-top-k must be >= 1")
    if args.substring_width < 8:
        p.error("--substring-width must be >= 8 (the removal cuts every "
                "window duplicated across docs — tiny widths would shred "
                "ordinary prose)")
    if "decontaminate" in stages and not args.benchmark:
        if explicit:
            # an explicitly requested stage must never silently no-op —
            # shipping eval-contaminated data with a green exit code is the
            # worst failure mode this job has
            p.error("--stages includes 'decontaminate' but no --benchmark "
                    "gram table was given")
        stages = [s for s in stages if s != "decontaminate"]
    args.stage_list = [s for s in ALL_STAGES if s in stages]  # canonical order
    return args


def run(spark, args) -> dict[str, int]:
    """The job body (session-injectable for tests).  Returns stage counts."""
    import pyspark.sql.functions as F

    from page_evaluator_spark.functions import textstats as TS
    from page_evaluator_spark.operators.curation import (
        benchmark_contamination,
        dedup_clusters,
        pack_token_budget,
        remove_boilerplate_lines,
    )
    from page_evaluator_spark.operators.dedup import (
        PORTABLE_TOKEN_RE,
        exact_dedup_groups,
        normalized_text,
    )
    from page_evaluator_spark.sources.catalog import Catalog

    catalog = Catalog(spark)
    docs = catalog.read(args.input)
    counts: dict[str, int] = {"input": docs.count()}
    # audit starts as all-NULL drop reasons; each stage fills its casualties
    audit = docs.select("doc_id").withColumn("drop_stage", F.lit(None).cast("string"))

    def mark(dropped, stage: str):
        nonlocal audit
        d = dropped.select("doc_id").withColumn("_s", F.lit(stage))
        audit = (audit.join(d, "doc_id", "left")
                 .select("doc_id", F.coalesce("drop_stage", "_s").alias("drop_stage")))

    persisted: list = []

    def checkpoint_stage(df):
        # stage boundaries persist: downstream stages, the audit joins and the
        # two output writes each trigger actions — without this the strip
        # shuffles / dedup aggregates would re-execute once per action
        df = df.persist()
        persisted.append(df)
        return df

    if "strip" in args.stage_list:
        cleaned = remove_boilerplate_lines(docs, min_docs=args.boiler_min_docs)
        docs = checkpoint_stage(
            docs.join(cleaned.select("doc_id", "clean_text"), "doc_id")
            .drop("text").withColumnRenamed("clean_text", "text"))

    if "filter" in args.stage_list:
        # gates FIRST, exact-dup canonicalization among the gate SURVIVORS:
        # canonicalizing over all docs would delete a whole dup group whenever
        # its min-id copy happens to fail a gate (e.g. wrong language).
        # NULL text/lang must evaluate to keep=False (audited), never to a
        # silent three-valued-logic drop.
        n_tok = F.size(F.regexp_extract_all("text", F.lit(PORTABLE_TOKEN_RE), 0))
        quality = TS.quality_score(F.col("text"))
        langs = [x.strip() for x in args.langs.split(",") if x.strip()]
        gates = F.coalesce((F.col("text").isNotNull())
                           & (n_tok >= args.min_tokens)
                           & (quality >= args.min_quality)
                           & F.col("lang").isin(langs), F.lit(False))
        staged = docs.withColumn("_keep", gates)
        mark(staged.where(~F.col("_keep")), "filter")
        survivors = staged.where(F.col("_keep")).drop("_keep")
        canon = exact_dedup_groups(survivors).select(
            F.col("content_hash").alias("_h"), F.col("canonical_id"))
        with_canon = (survivors
                      .withColumn("_h", F.md5(normalized_text(F.col("text"))))
                      .join(canon, "_h", "left"))
        dup = F.col("doc_id") != F.coalesce("canonical_id", F.col("doc_id"))
        mark(with_canon.where(dup), "filter")
        docs = checkpoint_stage(
            with_canon.where(~dup).drop("_h", "canonical_id"))

    if "model_filter" in args.stage_list:
        # model-based quality gate: linear logit >= log-odds of the score
        # threshold.  The comparison is on the exact integer weight sum
        # (wsum >= thr·1000·n_tokens), so the gate has no float-sum hazard;
        # NULL text ⇒ NULL wsum ⇒ coalesce(FALSE) — audited, never silently
        # three-valued-logic dropped.
        import math

        s = args.model_min_score
        logit_thr = math.log(s / (1.0 - s))
        st = TS.model_quality_wsum(F.col("text"))
        # zero-token docs score sigmoid(0) = 0.5 by convention — decide them
        # against the threshold explicitly (the wsum inequality degenerates to
        # 0 >= 0 at n_tokens == 0 and would keep them at ANY threshold)
        keep = F.coalesce(
            F.when(st["n_tokens"] == 0, F.lit(logit_thr <= 0.0))
            .otherwise(st["wsum"].cast("double")
                       >= F.lit(logit_thr) * TS.MODEL_WEIGHT_SPAN
                       * st["n_tokens"].cast("double")),
            F.lit(False))
        staged = docs.withColumn("_keep", keep)
        mark(staged.where(~F.col("_keep")), "model_filter")
        docs = checkpoint_stage(staged.where(F.col("_keep")).drop("_keep"))

    if "lm_filter" in args.stage_list:
        import math

        from page_evaluator_spark.operators.curation import LM_FXP, _lm_doc_nll

        # ONE LM pass: the train+score pipeline (token explode, vocab agg,
        # cost join, per-doc agg) is the most expensive DAG in the job —
        # persist its per-doc output and derive BOTH the calibration
        # quantiles and the gate from it (separate calibrate + score calls
        # would execute it twice, and the audit join a third time)
        per_doc = _lm_doc_nll(docs).persist()
        persisted.append(per_doc)
        nll = (F.col("_sc").cast("double")
               / (F.col("n_tokens").cast("double") * F.lit(float(LM_FXP))))
        if args.lm_tail is not None:
            tail = args.lm_tail
        else:
            row = (per_doc.select(nll.alias("nll"))
                   .agg(F.percentile_approx("nll", [2.0 / 3.0], 10_000)
                        .alias("q")).collect()[0])
            if row["q"] is None:
                raise ValueError("lm_filter: no tokenized documents to "
                                 "calibrate against")
            # exclusive upper bound, nudged above the quantile (NLL atoms)
            tail = math.nextafter(float(row["q"][0]), math.inf)
        # tail-bucket docs are dropped; token-less docs have NO likelihood —
        # dropped too (audited), mirroring model_filter's zero-token decision
        tail_docs = per_doc.where(nll >= tail).select("doc_id")
        empty_docs = docs.select("doc_id").join(per_doc.select("doc_id"),
                                                "doc_id", "left_anti")
        bad = tail_docs.unionByName(empty_docs)
        mark(bad, "lm_filter")
        docs = checkpoint_stage(docs.join(bad, "doc_id", "left_anti"))

    if "exact_substring" in args.stage_list:
        # cross-document exact-substring removal: REWRITES affected docs'
        # text (case-preserved, whitespace-collapsed, duplicated spans cut;
        # untouched docs verbatim), drops no docs — audited via counters,
        # not the drop ledger
        from page_evaluator_spark.operators.dedup import exact_substring_clean

        cleaned = checkpoint_stage(
            docs.join(exact_substring_clean(
                          docs, width=args.substring_width)
                      .select("doc_id", "text_clean", "n_spans_removed",
                              "chars_removed"),
                      "doc_id")
            .drop("text").withColumnRenamed("text_clean", "text"))
        row = cleaned.agg(
            F.sum((F.col("n_spans_removed") > 0).cast("long")).alias("d"),
            F.sum("chars_removed").alias("c")).collect()[0]
        counts["substring_cleaned_docs"] = int(row["d"] or 0)
        counts["substring_removed_chars"] = int(row["c"] or 0)
        docs = cleaned.drop("n_spans_removed", "chars_removed")

    if "decontaminate" in args.stage_list:
        bench = catalog.read(args.benchmark)
        hits = benchmark_contamination(docs, bench)
        bad = hits.where(F.col("contaminated")).select("doc_id")
        mark(bad, "decontaminate")
        docs = checkpoint_stage(docs.join(bad, "doc_id", "left_anti"))

    if "cluster" in args.stage_list:
        clusters = dedup_clusters(docs)
        dupes = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
        mark(dupes, "cluster")
        docs = checkpoint_stage(docs.join(dupes, "doc_id", "left_anti"))

    if "mixture" in args.stage_list:
        # temperature-α source-mixture resample to the token budget (runs
        # AFTER dedup so quotas are spent on unique content)
        if "source" not in docs.columns:
            raise ValueError("mixture stage needs a 'source' column in the "
                             "input table (per-source quotas)")
        from page_evaluator_spark.operators.curation import domain_mixture_keep

        # persist the (small) keep-set: it feeds both the audit anti-join
        # and the survivor semi-join — unpersisted, the windowed prefix-sum
        # selection would execute twice (the lm_filter per_doc precedent)
        kept = domain_mixture_keep(docs, budget_pct=args.mixture_budget_pct) \
            .persist()
        persisted.append(kept)
        mark(docs.join(kept, "doc_id", "left_anti"), "mixture")
        docs = checkpoint_stage(docs.join(kept, "doc_id", "left_semi"))

    if "dsir" in args.stage_list:
        # DSIR-shaped importance selection: keep the top-k most
        # target-distribution-like docs (target = the corpus' own
        # high-quality slice; see operators/curation.py)
        from page_evaluator_spark.operators.curation import dsir_importance_sample

        kept = dsir_importance_sample(docs, top_k=args.dsir_top_k) \
            .select("doc_id").persist()  # ≤ top_k rows; see mixture comment
        persisted.append(kept)
        mark(docs.join(kept, "doc_id", "left_anti"), "dsir")
        docs = checkpoint_stage(docs.join(kept, "doc_id", "left_semi"))

    catalog.overwrite(docs, f"{args.output}/clean_docs")
    catalog.overwrite(audit, f"{args.output}/curation_audit")

    # summary from the WRITTEN outputs (one read-back each; intermediate
    # per-stage counts would each replay the DAG)
    audit_back = catalog.read(f"{args.output}/curation_audit")
    for r in audit_back.groupBy("drop_stage").count().collect():
        counts[f"dropped_{r['drop_stage'] or 'none'}"] = r["count"]
    clean_back = catalog.read(f"{args.output}/clean_docs")
    if "pack" in args.stage_list:
        seqs = pack_token_budget(clean_back, budget=args.budget)
        catalog.overwrite(seqs, f"{args.output}/sequences")
        counts["sequences"] = catalog.read(f"{args.output}/sequences").count()
    counts["kept"] = clean_back.count()
    for df in persisted:
        df.unpersist()
    return counts


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    from page_evaluator_spark.session import get_spark

    spark = get_spark(app_name="corpus-curation", master=args.master)
    if args.quiet:
        spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    counts = run(spark, args)
    dt = time.time() - t0
    if args.quiet:
        print(f"{counts['kept']},{dt:.3f}")
    else:
        print(f"stages={args.stage_list} counts={counts} seconds={dt:.1f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
