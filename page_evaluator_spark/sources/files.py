"""File-mode compatibility source (SURVEY.md §2 S2): read raw hOCR/TXT page
files — the reference's actual input unit (one file per page,
Main.java:36) — into the engine's (doc_id, spans) documents model.

wholetext text scan: one row per file, doc_id = file name, a single span of
the requested kind at offset 0.  binaryFile variant covers media sidecars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_page_files(spark: SparkSession, path_glob: str, kind: str = "hocr") -> DataFrame:
    """Page files → input_hint-shaped documents table (one text span each)."""
    if kind not in ("hocr", "text"):
        raise ValueError(f"kind must be 'hocr' or 'text', got {kind!r}")
    raw = (spark.read.format("text").option("wholetext", "true").load(path_glob)
           .select(F.input_file_name().alias("path"), F.col("value").alias("content")))
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("doc_id"),
        F.array(F.struct(
            F.lit(kind).alias("kind"),
            F.col("content").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )).alias("spans"),
    )


def read_media_files(spark: SparkSession, path_glob: str, kind: str = "image") -> DataFrame:
    """Binary media files → media-span documents (bytes stay out of the span;
    media_ref carries the path, the opaque content is its own column)."""
    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("doc_id"),
        F.col("content").alias("media_bytes"),
        F.col("length").alias("media_length"),
        F.array(F.struct(
            F.lit(kind).alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.col("path").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )).alias("spans"),
    )
