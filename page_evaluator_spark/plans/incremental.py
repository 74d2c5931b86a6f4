"""Resumable, lineage-tracked execution (north_rule: "resumable from checkpoint
with per-partition lineage + metrics").

Documents are assigned a STABLE partition id — pmod(xxhash64(doc_id), n_parts)
— so the work breakdown is identical across runs and cluster sizes.  Each part
is processed as its own job whose outputs (page_scores, spans_out, quarantine)
are appended atomically-per-part through the Catalog facade, followed by one
lineage row carrying row-count metrics.  An interrupted run leaves complete
parts committed; the next invocation anti-joins the lineage table and
processes only the remainder.  Re-processing a part is idempotent on BOTH
backends — even when the retry runs under a fresh --run-id: the parquet
emulation keys the commit directory by the PART alone (commit=part{N},
mode=overwrite), and the Iceberg branch passes ``replace_where="part_id =
{N}"`` so Catalog.append atomically overwrites the rows that part owns
(one snapshot commit — every output row carries a part_id column for
exactly this; on Iceberg create the output tables PARTITIONED BY (part_id)
so overwrite-by-filter stays file-aligned even after compaction — the
Catalog.append alignment contract).

At 10^12 docs the input table would be bucketed by the same hash so each
part-job prunes to its buckets instead of re-scanning (Iceberg
bucket(n_parts, doc_id) partition transform).  The parquet fallback gets the
same property by STAGING: the input is written ONCE partitioned by _part, and
every per-part job then reads only its own partition directory (partition
pruning) — one extra full write instead of n_parts full scans.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Catalog
from .pipeline import evaluate_documents

LINEAGE_SCHEMA = ("run_id string, part_id int, n_docs bigint, n_tokens bigint, "
                  "committed_at timestamp, metrics map<string,string>")


def part_id_expr(n_parts: int):
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_parts)).cast("int")


@dataclass
class IncrementalRunner:
    spark: SparkSession
    out_dir: str
    n_parts: int = 8
    repartition: int | None = None
    catalog: Catalog = field(init=False)

    def __post_init__(self) -> None:
        self.catalog = Catalog(self.spark)

    # --- table refs -----------------------------------------------------
    def _ref(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    @property
    def lineage_ref(self) -> str:
        return self._ref("lineage")

    def lineage(self) -> DataFrame:
        if self.catalog.exists(self.lineage_ref):
            return self.catalog.read(self.lineage_ref)
        return self.spark.createDataFrame([], LINEAGE_SCHEMA)

    # --- resume logic ----------------------------------------------------
    def committed_parts(self) -> set[int]:
        return {r["part_id"] for r in self.lineage().select("part_id").distinct().collect()}

    def pending_parts(self) -> list[int]:
        return [p for p in range(self.n_parts) if p not in self.committed_parts()]

    # --- input staging (parquet-fallback bucketing) -----------------------
    def _stage_docs(self, docs: DataFrame) -> DataFrame:
        """Write the input once, partitioned by _part, so per-part jobs prune
        to one directory instead of rescanning the full input (the parquet
        stand-in for Iceberg bucket(n_parts, doc_id)).

        Idempotent: reused on resume when the staged write completed
        (_SUCCESS present) AND it was staged with the SAME n_parts — a resume
        under a different --n-parts re-stages, since the old _part layout
        would assign docs to the wrong parts.  (Resume semantics assume the
        same logical input across invocations, as lineage does.)
        """
        import json

        staged = self._ref("staged_docs")
        meta_path = os.path.join(self.out_dir, "_staging_meta.json")
        ok = os.path.exists(os.path.join(staged, "_SUCCESS"))
        if ok and os.path.exists(meta_path):
            with open(meta_path) as f:
                ok = json.load(f).get("n_parts") == self.n_parts
        else:
            ok = False
        if not ok:
            (docs.withColumn("_part", part_id_expr(self.n_parts))
                 .write.mode("overwrite").partitionBy("_part").parquet(staged))
            os.makedirs(self.out_dir, exist_ok=True)
            with open(meta_path, "w") as f:
                json.dump({"n_parts": self.n_parts}, f)
        return self.spark.read.parquet(staged)

    # --- execution ---------------------------------------------------------
    def run(self, docs: DataFrame, run_id: str, max_parts: int | None = None,
            stage_input: bool | None = None) -> list[int]:
        """Process pending parts (optionally capped — simulates interruption).

        stage_input (default: auto — stage when >1 part is pending and the
        output root is a path) controls the write-once/prune-per-part staging;
        on Iceberg the input table's own bucket(doc_id) layout replaces it.
        Returns the list of parts committed by THIS invocation.
        """
        done: list[int] = []
        pending = self.pending_parts()
        if max_parts is not None:
            pending = pending[:max_parts]
        if stage_input is None:
            stage_input = len(pending) > 1 and "/" in self.out_dir
        if stage_input:
            docs_p = self._stage_docs(docs)
        else:
            docs_p = docs.withColumn("_part", part_id_expr(self.n_parts))
        for part in pending:
            # Commit token derived from the PART, not the run id: if a prior
            # run crashed after appending outputs but before the lineage
            # commit, the part is still pending and re-processing OVERWRITES
            # the orphaned commit=part{N} dir (parquet) / atomically overwrites
            # the part's rows (Iceberg, replace_where snapshot commit) instead
            # of duplicating them — resume is idempotent across fresh --run-ids.
            commit = f"part{part}"
            owns = f"part_id = {part}"
            part_docs = docs_p.where(F.col("_part") == part).drop("_part")
            out = evaluate_documents(part_docs, repartition=self.repartition,
                                     cache_parsed=True)
            try:
                scores = out.page_scores.withColumn("part_id", F.lit(part))
                self.catalog.append(scores, self._ref("page_scores"), run_id=commit,
                                    replace_where=owns)
                self.catalog.append(out.spans_out.withColumn("part_id", F.lit(part)),
                                    self._ref("spans_out"), run_id=commit,
                                    replace_where=owns)
                self.catalog.append(out.quarantine.withColumn("part_id", F.lit(part)),
                                    self._ref("quarantine"), run_id=commit,
                                    replace_where=owns)
                agg = scores.agg(F.count("*").alias("n_docs"),
                                 F.sum("token_count").alias("n_tokens")).collect()[0]
            finally:
                out.parsed.unpersist()
            lineage_row = self.spark.createDataFrame(
                [(run_id, part, agg["n_docs"] or 0, int(agg["n_tokens"] or 0),
                  None, {"pipeline": "evaluate_documents"})],
                LINEAGE_SCHEMA,
            ).withColumn("committed_at", F.current_timestamp())
            # lineage commit LAST: a crash before this line leaves the part
            # uncommitted and it will be re-done (idempotent per-part dirs)
            self.catalog.append(lineage_row, self.lineage_ref, run_id=commit,
                                replace_where=owns)
            done.append(part)
        return done

    # --- outputs ---------------------------------------------------------
    def page_scores(self) -> DataFrame:
        return self.catalog.read(self._ref("page_scores"))

    def spans_out(self) -> DataFrame:
        return self.catalog.read(self._ref("spans_out"))

    def quarantine_rows(self) -> DataFrame:
        return self.catalog.read(self._ref("quarantine"))
