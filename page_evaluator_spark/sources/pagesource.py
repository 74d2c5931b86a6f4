"""Custom Python DataSource (Spark 4 DataSource API) for page-file corpora.

`spark.read.format("pageeval")` reads a DIRECTORY of raw page files — the
reference's actual input unit (one file per page, Main.java:36) — straight
into the engine's input_hint span-table shape:

    (doc_id string, spans array<struct<kind,text,media_ref,offset>>)

This is the first-class connector face of sources/files.py's wholetext
compatibility path: format dispatch happens per file by extension
(.hocr/.html/.xml → hocr span, .txt → text span, anything else → an
`unknown` span the pipeline quarantines — Main.java's unsupported-format
throw, reproduced as data).  Unlike the wholetext scan, the planner controls
split granularity explicitly: files are listed once on the driver, sorted
(deterministic), and grouped into `numPartitions` balanced-by-bytes input
partitions, so one giant page cannot serialize a whole split's parse work
behind it at 100 TB (the same skew lever operators/skew.py pulls after the
fact, applied at the SOURCE).

Options:
    path           directory (required)
    numPartitions  target input partitions (default 8)

Register + use:
    spark.dataSource.register(PageEvalDataSource)
    spark.read.format("pageeval").option("numPartitions", 16).load(dir)
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

PAGE_SCHEMA = ("doc_id string, spans array<struct<"
               "kind:string,text:string,media_ref:string,offset:int>>")

_HOCR_EXTS = {".hocr", ".html", ".htm", ".xml"}
_TEXT_EXTS = {".txt", ".text"}


def _kind_for(name: str) -> str:
    ext = os.path.splitext(name)[1].lower()
    if ext in _HOCR_EXTS:
        return "hocr"
    if ext in _TEXT_EXTS:
        return "text"
    return "unknown"  # flows through parse → quarantine (format-dispatch parity)


class _FilesPartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class PageEvalDataSource(DataSource):
    """format("pageeval") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "pageeval"

    def schema(self) -> str:
        return PAGE_SCHEMA

    def reader(self, schema) -> "PageEvalReader":
        return PageEvalReader(self.options)

    def streamReader(self, schema) -> "PageEvalStreamReader":
        return PageEvalStreamReader(self.options)


class PageEvalReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('pageeval') requires .load(<directory>)")
        self.n_parts = int(options.get("numPartitions", "8"))

    def partitions(self):
        # one driver-side listing; deterministic order; greedy balance by
        # size so a few huge pages spread across splits instead of stacking
        entries = [os.path.join(self.path, f) for f in os.listdir(self.path)
                   if os.path.isfile(os.path.join(self.path, f))]
        return _balanced(entries, self.n_parts)

    def read(self, partition: _FilesPartition):
        return _read_files(partition)


def _read_files(partition: _FilesPartition):
    for path in partition.paths:
        with open(path, encoding="utf-8", errors="replace") as fh:
            content = fh.read()
        name = os.path.basename(path)
        yield (name, [(_kind_for(name), content, None, 0)])


def _balanced(paths: list[str], n_parts: int) -> list[_FilesPartition]:
    """Greedy size-balanced grouping (shared by batch and stream planners):
    one stat per file, index-based bucket selection."""
    if not paths:
        return [_FilesPartition([])]
    sized = sorted(((os.path.getsize(p), p) for p in paths),
                   key=lambda t: (-t[0], t[1]))
    n = min(n_parts, len(sized))
    totals = [0] * n
    groups: list[list[str]] = [[] for _ in range(n)]
    for size, p in sized:
        i = min(range(n), key=lambda k: totals[k])
        totals[i] += size
        groups[i].append(p)
    return [_FilesPartition(g) for g in groups if g]


class PageEvalStreamReader(DataSourceStreamReader):
    """readStream.format("pageeval") — incremental page-file ingest.

    Offset model: the lexicographic HIGH-WATERMARK of ingested file names
    plus an md5 signature of the full name prefix ≤ that watermark.  Landing
    zones conventionally write monotonically named files (timestamped /
    part-numbered), so "name > watermark" identifies exactly the new
    arrivals and the offset stays O(1) regardless of corpus size — unlike
    the built-in file source's seen-file map, which grows without bound at
    10¹² files.

    CONTRACT (documented): producers must land files with lexicographically
    increasing names, and landed files are immutable/undeleted for the
    stream's lifetime.  partitions() re-derives a batch from the directory,
    so a crash-replayed batch whose files were deleted (or a late file named
    below the watermark) would otherwise silently change the replayed data —
    the prefix signature turns that into a LOUD error instead of quiet row
    loss (the built-in source pins per-batch file lists in its own log for
    the same reason; an O(1) offset buys its size by making directory
    mutation a detected contract violation rather than a tolerated one).
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("readStream.format('pageeval') requires .load(<directory>)")
        self.n_parts = int(options.get("numPartitions", "8"))

    def _names(self) -> list[str]:
        return sorted(f for f in os.listdir(self.path)
                      if os.path.isfile(os.path.join(self.path, f)))

    @staticmethod
    def _sig(names: list[str]) -> str:
        import hashlib

        return hashlib.md5("\n".join(names).encode()).hexdigest()

    def initialOffset(self):
        return {"watermark": "", "sig": self._sig([])}

    def latestOffset(self):
        names = self._names()
        hi = names[-1] if names else ""
        return {"watermark": hi, "sig": self._sig([f for f in names if f <= hi])}

    def partitions(self, start, end):
        lo, hi = start["watermark"], end["watermark"]
        names = self._names()
        prefix = [f for f in names if f <= hi]
        if self._sig(prefix) != end["sig"]:
            raise ValueError(
                f"pageeval landing directory changed under a planned batch "
                f"(watermark {hi!r}): files at or below the watermark were "
                f"added, renamed, or deleted — replay would silently return "
                f"different data.  Landed files must be immutable and new "
                f"files must sort above the watermark.")
        fresh = [os.path.join(self.path, f) for f in names if lo < f <= hi]
        return _balanced(fresh, self.n_parts)

    def read(self, partition: _FilesPartition):
        return _read_files(partition)

    def commit(self, end) -> None:
        pass  # the offset is self-contained; nothing external to clean up
