"""Explicit skew handling: salting + size-aware partitioning on doc_id
(BASELINE.json north_star: "Skewed pages (image-heavy or long-text documents)
are handled with explicit salting and adaptive partition sizing on doc_id").

Three levers, composable:
  * size hints — native per-doc byte estimates (no UDF) for deciding what is
    skewed before any expensive work runs;
  * salting — deterministic salt on (doc_id, span_offset) so one hot doc_id
    spreads over k reducers; used by parse_spans' repartition and available
    for any doc_id-keyed shuffle;
  * adaptive partition sizing — choose the shuffle width from the measured
    total size hint and a target bytes-per-partition, so the same job sizes
    itself correctly at sf0.001 and at 100 TB.

AQE complements these at runtime (skew-JOIN splitting, partition coalescing)
but cannot split a single oversized doc row — explode + salt does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_TARGET_PARTITION_BYTES = 32 * 1024 * 1024  # parse-stage working set


def doc_size_hint(spans_col: str = "spans") -> Column:
    """Approximate per-doc payload bytes (text lengths + media stub cost),
    computed natively from the spans array — no parse, no Python."""
    return F.aggregate(
        F.col(spans_col), F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]).cast("long"), F.lit(64)))


def with_size_hint(docs: DataFrame) -> DataFrame:
    return docs.withColumn("size_hint", doc_size_hint())


def salt_expr(n_salts: int, *cols: str) -> Column:
    """Deterministic salt in [0, n_salts): stable across runs/retries
    (xxhash64 of the key columns, NOT rand())."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def adaptive_partition_count(docs: DataFrame, target_bytes: int = DEFAULT_TARGET_PARTITION_BYTES,
                             min_parts: int = 8, max_parts: int = 100_000) -> int:
    """Shuffle width from measured total size hint (one cheap agg job)."""
    total = with_size_hint(docs).agg(F.sum("size_hint")).collect()[0][0] or 0
    return int(min(max(total // target_bytes + 1, min_parts), max_parts))


def rebalance_spans(span_rows: DataFrame, n_parts: int | None = None,
                    n_salts: int = 16) -> DataFrame:
    """Salted repartition of exploded span rows.

    (doc_id, span_offset) already distributes a giant doc's spans; adding the
    salt also spreads pathological cases where offsets collide or a single
    offset repeats across retries of upstream producers.
    """
    salted = span_rows.withColumn("_salt", salt_expr(n_salts, "doc_id", "span_offset"))
    if n_parts:
        out = salted.repartition(n_parts, "doc_id", "span_offset", "_salt")
    else:
        out = salted.repartition("doc_id", "span_offset", "_salt")
    return out.drop("_salt")


# split-count memo: the partition probe (df.rdd.getNumPartitions) is a
# driver-side plan→RDD conversion, wasteful to repeat for the same scan.
# Keyed by a caller-supplied stable key (e.g. the parquet path) + min_parts;
# scan splitting is deterministic for fixed files and session read confs.
# CONTRACT: a cache_key must name a path whose file layout is immutable for
# the process lifetime — rewriting a keyed path with a different layout
# (e.g. regenerating a bench corpus in place) must call
# clear_scan_parts_cache() or the stale split count can skip a needed
# repartition and serialize expression-heavy work.
_SCAN_PARTS_CACHE: dict[tuple[str, int], int] = {}


def clear_scan_parts_cache(prefix: str | None = None) -> None:
    """Drop memoized split counts (all of them, or keys starting with
    ``prefix``) after rewriting a cache-keyed path in-process."""
    if prefix is None:
        _SCAN_PARTS_CACHE.clear()
    else:
        for k in [k for k in _SCAN_PARTS_CACHE if k[0].startswith(prefix)]:
            del _SCAN_PARTS_CACHE[k]


def _probe_partitions(df: DataFrame) -> int:
    """The expensive driver-side plan→RDD conversion, isolated for memoization
    (and for tests to count)."""
    return df.rdd.getNumPartitions()


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None,
                           cache_key: str | None = None) -> DataFrame:
    """Round-robin rebalance when the scan yielded too few splits.

    Small files arrive as one partition (maxPartitionBytes ≫ file size), which
    serializes expression-heavy per-row work; at real scale inputs have many
    splits and this is a no-op.  One cheap shuffle of the raw rows buys full
    parallelism for everything downstream.

    The partition probe is paid at most once per DataFrame object (results are
    marked), and at most once per ``cache_key`` process-wide when one is given
    — repeated ``load()``s of the same table never re-touch ``df.rdd``.
    """
    if min_parts is None:
        min_parts = df.sparkSession.sparkContext.defaultParallelism
    if getattr(df, "_pe_min_parallelism", 0) >= min_parts:
        return df
    if cache_key is not None:
        key = (cache_key, min_parts)
        n = _SCAN_PARTS_CACHE.get(key)
        if n is None:
            n = _probe_partitions(df)
            _SCAN_PARTS_CACHE[key] = n
    else:
        n = _probe_partitions(df)
    out = df.repartition(min_parts) if n < min_parts else df
    out._pe_min_parallelism = min_parts  # idempotent re-calls skip the probe
    return out


def skewed_doc_ids(docs: DataFrame, threshold_bytes: int = 8 * 1024 * 1024) -> DataFrame:
    """The hot-doc report: docs whose payload exceeds the threshold (feeds
    monitoring and, on Iceberg, a sort-order/bucketing decision)."""
    return (with_size_hint(docs)
            .where(F.col("size_hint") >= threshold_bytes)
            .select("doc_id", "size_hint", F.size("spans").alias("n_spans")))
