"""Iceberg-runtime smoke (VERDICT r1 #8): executes the Catalog's writeTo()
append path against a real Iceberg hadoop catalog WHEN the runtime jar is
available (skip-if-absent — no jar ships in the offline sandbox).

Provide the jar via $SPARK_GRAFT_ICEBERG_JAR or by dropping
iceberg-spark-runtime-*.jar into pyspark's jars/ directory.
"""

from __future__ import annotations

import glob
import os

import pytest


def _iceberg_jar() -> str | None:
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import pyspark

    hits = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars",
                                  "iceberg-spark-runtime-*.jar"))
    return hits[0] if hits else None


JAR = _iceberg_jar()


def test_iceberg_available_probe_routes_correctly(spark):
    """The facade's catalog probe: unset catalog → parquet fallback; a
    configured catalog name → Iceberg branch (independent of the jar)."""
    from page_evaluator_spark.sources.catalog import TableRef, _iceberg_available

    assert not _iceberg_available(spark, "nosuch.db.table")
    assert not TableRef("/tmp/x/y").is_path is False  # path refs stay parquet
    assert TableRef("cat.db.t").is_path is False


@pytest.mark.skipif(JAR is None, reason="no iceberg-spark-runtime jar in this environment")
def test_iceberg_write_read_roundtrip(tmp_path):
    """Real Iceberg append + read-back through the Catalog facade, plus the
    incremental runner's bucket-pruning premise (bucket partition transform)."""
    from pyspark.sql import SparkSession

    from page_evaluator_spark.sources.catalog import Catalog

    warehouse = str(tmp_path / "wh")
    spark = (SparkSession.builder.master("local[2]")
             .appName("iceberg-smoke")
             .config("spark.jars", JAR)
             .config("spark.sql.catalog.smoke", "org.apache.iceberg.spark.SparkCatalog")
             .config("spark.sql.catalog.smoke.type", "hadoop")
             .config("spark.sql.catalog.smoke.warehouse", warehouse)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    try:
        spark.sql("CREATE TABLE smoke.db.scores (doc_id STRING, quality DOUBLE) "
                  "PARTITIONED BY (bucket(4, doc_id)) USING iceberg")
        cat = Catalog(spark)
        df = spark.createDataFrame([("d1", 0.5), ("d2", 0.9)], "doc_id string, quality double")
        token = cat.append(df, "smoke.db.scores")
        assert token.startswith("iceberg-append:")
        got = cat.read("smoke.db.scores")
        assert got.count() == 2
        # second append accumulates (snapshot commit, not overwrite)
        cat.append(df, "smoke.db.scores")
        assert cat.read("smoke.db.scores").count() == 4
        assert cat.exists("smoke.db.scores")
        # replace_where idempotency (incremental-runner resume contract):
        # re-appending the rows a crashed part owns REPLACES, never duplicates
        # PARTITIONED BY the replace_where column: the Catalog alignment
        # contract — keeps every data file predicate-homogeneous even after
        # compaction, so overwrite-by-filter stays file-aligned
        spark.sql("CREATE TABLE smoke.db.parts (doc_id STRING, part_id INT) "
                  "PARTITIONED BY (part_id) USING iceberg")
        pdf = spark.createDataFrame([("d1", 0), ("d2", 0), ("d3", 1)],
                                    "doc_id string, part_id int")
        cat.append(pdf, "smoke.db.parts", replace_where="part_id = 0")
        retry = spark.createDataFrame([("d1", 0), ("d2", 0)], "doc_id string, part_id int")
        cat.append(retry, "smoke.db.parts", replace_where="part_id = 0")
        got = cat.read("smoke.db.parts")
        assert got.count() == 3  # part 0 replaced (2 rows), part 1 untouched
        assert got.where("part_id = 0").count() == 2
    finally:
        spark.stop()
