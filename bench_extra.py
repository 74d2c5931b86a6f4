#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual queries with the
noop sink, optionally dumping .explain("formatted") to a directory.

NOT the driver bench — bench.py stays the frozen measurement contract.  This
harness exists so an optimization round can (a) isolate one query without
paying the full suite + pipeline scaling protocol, (b) capture plan files
for plans/r07/, and (c) run against any data directory (e.g. a scaled-up
copy) without touching the frozen methodology.

Usage:
  python bench_extra.py [query ...]            # time queries (warmup + 2, min)
  python bench_extra.py --explain DIR [q ...]  # dump explain files instead
  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
       BENCH_EXTRA_RUNS (timed runs after warmup, default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "2"))

DEFAULT = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "broadcast_part_revenue", "window_top_orders_per_cust", "events_sessionize",
    "doc_quality", "dedup_minhash_pairs", "ann_cosine_topk",
    "curation_source_prior", "graph_pagerank_dangling", "domain_mixture_sample",
    "dsir_importance_sample", "html_block_scores", "repeated_substrings",
    "bpe_token_counts", "corpus_report", "exact_substring_dedup",
    "corpus_snapshot_diff", "eval_split_assignment", "embedding_int8_quantize",
]


def main() -> None:
    args = sys.argv[1:]
    explain_dir: str | None = None
    if args and args[0] == "--explain":
        explain_dir = args[1]
        args = args[2:]
    names = args or DEFAULT

    from page_evaluator_spark.queries import EXTRA_QUERIES, QUERIES
    from page_evaluator_spark.session import get_spark

    all_queries = {**QUERIES, **EXTRA_QUERIES}
    spark = get_spark(app_name="pageeval-bench-extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        for name in names:
            df = all_queries[name](spark, SF_DIR)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            Path(explain_dir, f"{name}.txt").write_text(txt)
            print(f"wrote {explain_dir}/{name}.txt")
        spark.stop()
        return

    times: dict[str, float] = {}
    for name in names:
        fn = all_queries[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")

        def run():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        run()  # warmup
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        print(f"  {name}: {times[name]}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": times,
                      "total": round(sum(times.values()), 3)}))


if __name__ == "__main__":
    main()
