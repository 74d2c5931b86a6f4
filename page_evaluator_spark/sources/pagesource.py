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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class PageEvalReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('pageeval') requires .load(<directory>)")
        self.n_parts = int(options.get("numPartitions", "8"))

    def partitions(self):
        # one driver-side listing; deterministic order; greedy balance by
        # size so a few huge pages spread across splits instead of stacking
        entries = sorted(
            (os.path.join(self.path, f) for f in os.listdir(self.path)
             if os.path.isfile(os.path.join(self.path, f))))
        if not entries:
            return [_FilesPartition([])]
        n = min(self.n_parts, len(entries))
        buckets: list[tuple[int, list[str]]] = [(0, []) for _ in range(n)]
        for p in sorted(entries, key=lambda p: (-os.path.getsize(p), p)):
            size, paths = min(buckets, key=lambda b: b[0])
            i = buckets.index((size, paths))
            buckets[i] = (size + os.path.getsize(p), paths + [p])
        return [_FilesPartition(b[1]) for b in buckets if b[1]]

    def read(self, partition: _FilesPartition):
        for path in partition.paths:
            with open(path, encoding="utf-8", errors="replace") as fh:
                content = fh.read()
            name = os.path.basename(path)
            yield (name, [(_kind_for(name), content, None, 0)])
