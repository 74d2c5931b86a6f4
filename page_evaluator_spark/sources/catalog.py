"""Table IO facade: Iceberg when a catalog is configured, parquet-dir fallback.

The north_rule targets Iceberg tables; no Iceberg runtime jar ships with the
sandbox's PySpark, so the facade keeps ONE write/read surface whose Iceberg
path lights up on a real cluster (spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-*) while tests exercise the parquet
path with identical semantics (append/overwrite + snapshot-ish manifest).

Scale notes: writers partition output by bucket(doc_id) so downstream
re-reads prune; appends are per-partition-atomic on Iceberg (manifest commit)
and emulated with a run-scoped subdirectory + manifest JSON on parquet.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession, table: str) -> bool:
    """True when the table name resolves to a configured Iceberg catalog."""
    catalog = table.split(".")[0] if "." in table else ""
    if not catalog:
        return False
    return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None


@dataclass
class TableRef:
    """Either an Iceberg table name (catalog.db.table) or a parquet directory."""

    name: str

    @property
    def is_path(self) -> bool:
        return "/" in self.name or self.name.startswith("file:")


class Catalog:
    """Minimal write/read surface shared by Iceberg and parquet backends."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def read(self, ref: str) -> DataFrame:
        tr = TableRef(ref)
        if tr.is_path:
            return self.spark.read.parquet(ref)
        return self.spark.read.table(ref)

    def append(self, df: DataFrame, ref: str, run_id: str | None = None,
               replace_where: str | None = None) -> str:
        """Append rows; returns a commit token (snapshot id / manifest path).

        ``replace_where``: optional SQL predicate identifying the rows this
        commit logically owns (e.g. ``part_id = 3``).  On the Iceberg branch
        the write becomes ``writeTo(ref).overwrite(predicate)`` — delete of
        the owned rows plus the append in ONE atomic snapshot commit, so
        re-processing after a crash between output-append and lineage-commit
        REPLACES the orphaned rows instead of duplicating them, and a
        concurrent reader never observes the owned rows absent (a separate
        DELETE-then-append would expose that window).  This is the Iceberg
        equivalent of the parquet emulation's keyed ``commit=`` directory
        overwrite.  Ignored on the parquet branch (run_id keying already makes
        that path idempotent).

        ALIGNMENT CONTRACT: the predicate column must be part of the target
        table's partition spec (``PARTITIONED BY (part_id)`` — the smoke test
        creates exactly this).  Overwrite-by-filter deletes whole data files;
        with an aligned spec every file is predicate-homogeneous FOREVER —
        including after compaction/rewrite_data_files, which preserves
        partition boundaries — so the overwrite can never hit the
        partially-matching-file ValidationException that an unpartitioned
        table could after maintenance mixes key values into one file.
        """
        from pyspark.sql import functions as F

        tr = TableRef(ref)
        if not tr.is_path and _iceberg_available(self.spark, ref):
            if replace_where and self.spark.catalog.tableExists(ref):
                df.writeTo(ref).overwrite(F.expr(replace_where))
            else:
                df.writeTo(ref).append()
            return f"iceberg-append:{ref}"
        # parquet emulation: each append is its own subdirectory + manifest,
        # so a failed job never corrupts previously committed data
        commit = run_id or uuid.uuid4().hex[:12]
        part_dir = os.path.join(ref, f"commit={commit}")
        df.write.mode("overwrite").parquet(part_dir)
        manifest = {
            "commit": commit,
            "ts": time.time(),
            "path": part_dir,
        }
        os.makedirs(ref, exist_ok=True)
        with open(os.path.join(ref, f"_manifest_{commit}.json"), "w") as f:
            json.dump(manifest, f)
        return part_dir

    def overwrite(self, df: DataFrame, ref: str) -> None:
        tr = TableRef(ref)
        if not tr.is_path and _iceberg_available(self.spark, ref):
            df.writeTo(ref).createOrReplace()
            return
        df.write.mode("overwrite").parquet(ref)

    def exists(self, ref: str) -> bool:
        tr = TableRef(ref)
        if tr.is_path:
            return os.path.isdir(ref) and any(
                n.endswith(".parquet") or n.startswith("commit=") or n.startswith("part-")
                for n in os.listdir(ref))
        return self.spark.catalog.tableExists(ref)
