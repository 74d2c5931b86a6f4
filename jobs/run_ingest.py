#!/usr/bin/env python
"""Daily-ingest dedup job entry point (ship path: spark-submit --py-files).

The streaming consumer of the incremental-dedup machinery (VERDICT r5 #7):
newly landed document files are deduplicated against the STORED reference
band index, survivors are published and their bands appended to the index —
so each day's ingest dedups against everything already accepted.

  spark-submit --py-files pageeval.zip jobs/run_ingest.py \
      --new <dir where daily files land> --output <root> \
      --run-id <day label, e.g. 2026-08-17> \
      [--reference <docs table/path>]   # bootstrap index on first run

Outputs under --output: `clean_new` (accepted docs per run),
`ref_band_index` (the growing reference index), `ingest_docs` /
`ingest_bands` / `ingest_matches` (per-batch ledgers), `checkpoint`
(file-source progress — keep it: it is what makes re-runs process only
newly landed files).

Idempotent per (run_id, landed files): re-running the same day replays
nothing already checkpointed and keyed-batch writes replace their own rows.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Dedup newly landed documents against the stored corpus index")
    p.add_argument("--new", required=True,
                   help="directory where daily document parquet files land")
    p.add_argument("--output", required=True, help="output root")
    p.add_argument("--run-id", required=True,
                   help="label for this ingest run (e.g. the day) — keys "
                        "the idempotent writes; must not contain quotes")
    p.add_argument("--reference", default=None,
                   help="reference documents table/path to bootstrap the "
                        "band index from (first run only; ignored once "
                        "<output>/ref_band_index exists)")
    p.add_argument("--master", default=None)
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args(argv)
    if "'" in args.run_id or "\\" in args.run_id:
        # run_id is interpolated into replace_where predicates
        p.error("--run-id must not contain quotes or backslashes")
    return args


def run(spark, args) -> dict[str, int]:
    """The job body (session-injectable for tests).  Returns counts."""
    from page_evaluator_spark.sources.catalog import Catalog
    from page_evaluator_spark.streaming.jobs import run_daily_ingest_dedup

    ref_docs = Catalog(spark).read(args.reference) if args.reference else None
    return run_daily_ingest_dedup(spark, args.new, args.output, args.run_id,
                                  ref_docs=ref_docs)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    from page_evaluator_spark.session import get_spark

    spark = get_spark(app_name="daily-ingest-dedup", master=args.master)
    if args.quiet:
        spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    counts = run(spark, args)
    dt = time.time() - t0
    if args.quiet:
        print(f"{counts['survivors']},{dt:.3f}")
    else:
        print(f"run_id={args.run_id} counts={counts} seconds={dt:.1f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
