"""Parse/extract stage: interleaved-span documents → token/media/meta/error rows.

The ONLY Python boundary in the pipeline (Arrow-batched ``mapInPandas``; no
per-row Python UDFs, per BASELINE.json input_hint).  Everything downstream
(classification, aggregation, scoring) is native Catalyst.

Skew design: the unit of work is a *span* (one page), not a document —
``explode_docs`` posexplodes the spans array natively, and a repartition
spreads a pathological document's 10^6 spans across the cluster
(SURVEY.md §4.2 "skew: giant pages/docs").  Hyphen-join state is span-local
(a span == one reference page), so per-span parallelism loses nothing.

Semantics transliterated from the read-only reference (citations inline):
  hOCR:  HOCRPage.java:37-62, HOCRTokenIterator.java:21-82, HOCRToken.java:20-42
  TXT:   TxtPage.java:37-61 + OpenNLP SimpleTokenizer 1.5.3
  fold:  OCRPage.java:38-49 (trim → EOL-hyphen join → drop empty)
Deviation (required at 10^12-doc scale): parse failures become quarantine rows
instead of the reference's process-kill (Main.java:46-49) — SURVEY.md §2 S5.
"""

from __future__ import annotations

import unicodedata
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import regex
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "table", "figure")
TEXT_KINDS = ("text", "hocr", "html")

# Output relation of the parse stage.  kind: 'word' (a final token),
# media pass-through ('image'/'table'/'figure'), 'page' (per-parsed-span
# metadata), 'error' (quarantine).  pos = 0-based emit position within the
# span (words) / the span itself (media) — (span_offset, pos) is the total
# order that defines spans_out.  props = the word's hOCR title properties
# (HOCRToken.java:20-38: split on ';', trailing empties dropped, each segment
# Java-trimmed then split at its FIRST space); null for TXT tokens.
PARSED_SCHEMA = (
    "doc_id string, span_offset int, pos int, kind string, text string, "
    "media_ref string, line_idx int, tok_idx int, "
    "page_id string, ocr_engine string, ocr_capabilities array<string>, "
    "props map<string,string>, error string"
)

# (DDL type, Arrow type) per PARSED_SCHEMA field, in schema order — the
# column-pruned kernels (guide §4.1: an opaque Python function ships every
# declared output column through the Arrow boundary, so each pipeline branch
# declares only the columns it consumes) build their subset schema from this.
_FIELDS: dict[str, tuple[str, pa.DataType]] = {
    "doc_id": ("string", pa.string()),
    "span_offset": ("int", pa.int32()),
    "pos": ("int", pa.int32()),
    "kind": ("string", pa.string()),
    "text": ("string", pa.string()),
    "media_ref": ("string", pa.string()),
    "line_idx": ("int", pa.int32()),
    "tok_idx": ("int", pa.int32()),
    "page_id": ("string", pa.string()),
    "ocr_engine": ("string", pa.string()),
    "ocr_capabilities": ("array<string>", pa.list_(pa.string())),
    "props": ("map<string,string>", pa.map_(pa.string(), pa.string())),
    "error": ("string", pa.string()),
}
ALL_COLUMNS: tuple[str, ...] = tuple(_FIELDS)

# --- TXT path (TxtPage.java:24,41-54) --------------------------------------
# Java \s / \S here are ASCII-only (no UNICODE_CHARACTER_CLASS).
_NWS = r"[^ \t\n\x0B\f\r]"
_WS = r"[ \t\n\x0B\f\r]"
_HYPHEN_WORD = regex.compile("(" + _NWS + r"*\p{L})-\n(\p{L}" + _NWS + r"*)" + _WS + "*")
# OpenNLP SimpleTokenizer as one scan: letter runs | digit runs (Nd) |
# same-char runs of other.  Whitespace = Character.isWhitespace ∪ Zs.
_TOKEN = regex.compile(r"\p{L}+|\p{Nd}+|([^\p{L}\p{Nd}\p{Zs}\p{Zl}\p{Zp}\t-\r\x1c-\x1f])\1*")
_JAVA_TRIM = "".join(chr(i) for i in range(0x21))
# BufferedReader.readLine (TxtPage.java:41) splits ONLY on \n, \r, \r\n —
# never on \f/\x0B/\x1c-\x1e/NEL/U+2028/9 the way Python str.splitlines does.
_LINE_SPLIT = regex.compile(r"\r\n|\r|\n")


def _tokenize_txt(text: str) -> list[str]:
    """TxtPage.parse: reflow (:41-47) → dehyphenate (:50-52) → tokenize (:54)."""
    if "\n" not in text and "\r" not in text:
        # single-line fast path (readLine yields one line): trim; if empty the
        # reflow emits nothing; no '-\n' can exist so dehyphenation is a no-op
        ln = text.strip(_JAVA_TRIM)
        if not ln:
            return []
        return [m.group(0) for m in _TOKEN.finditer(ln + "\n")]
    kept = [ln.strip(_JAVA_TRIM) for ln in _LINE_SPLIT.split(text)]
    body = "".join(ln + "\n" for ln in kept if ln)
    body = _HYPHEN_WORD.sub(r"\1\2\n", body)
    return [m.group(0) for m in _TOKEN.finditer(body)]


# --- hOCR path (HOCRPage.java, HOCRTokenIterator.java) ----------------------

def _title_props(title: str) -> dict[str, str]:
    """hOCR ``title`` → property dict (HOCRToken.java:20-29, exact Java split).

    Java ``String.split(";")`` drops TRAILING empty segments (so a trailing
    ';' is fine) but keeps leading/interior ones, and ``"".split(";")`` is
    ``[""]`` — both reproduced here.  Each kept segment is Java-trimmed and
    split at its first space; a space-less segment (including an empty one)
    crashes the reference (StringIndexOutOfBounds) → ValueError here.
    """
    segs = title.split(";")
    if len(segs) > 1:  # Java: trailing-empty removal never applies to [""]
        while segs and segs[-1] == "":
            segs.pop()
    props: dict[str, str] = {}
    for seg in segs:
        seg = seg.strip(_JAVA_TRIM)  # prop.trim(), HOCRToken.java:24
        idx = seg.find(" ")  # prop.indexOf(" "), HOCRToken.java:25
        if idx < 0:
            raise ValueError(f"bad hOCR title segment: {seg!r}")
        props[seg[:idx]] = seg[idx + 1:]  # Properties.put — last wins per key
    return props


def _title_props_check(title: str) -> None:
    """Validation-only `_title_props`: raises the IDENTICAL ValueError on the
    same (first) malformed segment, but skips the dict build.  Used by the
    column-pruned kernels that do not emit `props` — the crash parity that
    turns a bad title into an error row must hold regardless of which output
    columns a branch consumes."""
    segs = title.split(";")
    if len(segs) > 1:
        while segs and segs[-1] == "":
            segs.pop()
    for seg in segs:
        seg = seg.strip(_JAVA_TRIM)
        if seg.find(" ") < 0:
            raise ValueError(f"bad hOCR title segment: {seg!r}")


def _parse_hocr(
    xml_text: str,
    want_props: bool = True,
) -> tuple[list[str], list[bool], list[dict[str, str]] | None, list[int],
           list[int], str, str, list[str]]:
    """→ (token_texts, is_last_on_line flags, per-token title props,
    per-token line indices, per-token within-line indices, page_id, engine,
    capabilities).

    Raises ValueError on anything the reference turns into PageParserException
    or a crash (missing ocr_page → NPE, HOCRPage.java:53-61; malformed title
    segment → StringIndexOutOfBounds, HOCRToken.java:22-29).

    want_props=False validates every title (same errors, same order) but
    returns None instead of the per-token dicts — the pruned-kernel path.
    """
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as e:
        raise ValueError(f"PageParserException: {e}") from e

    engine, caps = "", ""
    head = root.find("head")
    if head is not None:  # /html/head/meta[@name=...]/@content, HOCRPage.java:48-51
        for meta in head.iter("meta"):
            name = meta.get("name")
            if name == "ocr-system":
                engine = meta.get("content", "")
            elif name == "ocr-capabilities":
                caps = meta.get("content", "")

    page = next((e for e in root.iter() if e.get("class") == "ocr_page"), None)
    if page is None:  # first //*[@class='ocr_page'] only, HOCRPage.java:53-55
        raise ValueError("PageParserException: no ocr_page element")
    page_id = page.get("id", "")

    texts: list[str] = []
    last: list[bool] = []
    props: list[dict[str, str]] | None = [] if want_props else None
    lines: list[int] = []
    toks: list[int] = []
    li = -1
    for line in (e for e in page.iter() if e is not page and e.get("class") == "ocr_line"):
        words = [e for e in line.iter() if e is not line and e.get("class") == "ocrx_word"]
        n = len(words)  # zero-word lines skipped, HOCRTokenIterator.java:60-82
        if n:
            li += 1
        for i, w in enumerate(words):
            if want_props:  # HOCRToken.java:20-29 (check-only keeps crash parity)
                props.append(_title_props(w.get("title", "")))
            else:
                _title_props_check(w.get("title", ""))
            texts.append("".join(w.itertext()))  # getTextContent, HOCRToken.java:40-42
            last.append(i == n - 1)  # HOCRTokenIterator.java:45
            lines.append(li)
            toks.append(i)
    return texts, last, props, lines, toks, page_id, engine, caps.split(" ")


# --- the sequential fold, vectorized (OCRPage.java:38-49) --------------------

def join_hyphen_tokens(texts: list[str], is_last: list[bool]) -> list[str]:
    """Trim → EOL-hyphen join → drop empties → NFC (OCRPage.java:38-49).

    Sequential semantics: a candidate (is_last ∧ endswith('-') ∧ hasNext)
    consumes the NEXT token; the consumed token never joins on its own and the
    joined result is not re-checked (no chains).  Within a maximal run of
    consecutive candidates, joins therefore alternate — computed vectorized
    via run-position parity instead of a Python loop.
    """
    n = len(texts)
    if n == 0:
        return []
    t = np.array([s.strip(_JAVA_TRIM) for s in texts], dtype=object)
    cand = np.fromiter(
        (bool(is_last[i]) and t[i].endswith("-") and i < n - 1 for i in range(n)),
        dtype=bool, count=n)
    idx = np.arange(n)
    run_start = np.maximum.accumulate(np.where(cand, 0, idx + 1))  # start of candidate run
    join = cand & (((idx - run_start) % 2) == 0)
    consumed = np.zeros(n, dtype=bool)
    consumed[1:] = join[:-1]
    out: list[str] = []
    for i in range(n):
        if consumed[i]:
            continue
        s = t[i][:-1] + t[i + 1] if join[i] else t[i]
        if s:  # OCRPage.java:48-49
            # frozen NFC rule (CANON_EQ); identity on ASCII, skipped cheaply
            out.append(s if s.isascii() else unicodedata.normalize("NFC", s))
    return out


# --- hyphen fold with provenance (for the token relation) --------------------

def _fold_tokens(texts: list[str], is_last: list[bool]) -> tuple[list[str], list[int]]:
    """join_hyphen_tokens + the ORIGINAL index of each surviving (first) token.

    Returns parallel lists (token_texts, src_idxs); callers index any
    per-source-token payload (line/tok provenance, hOCR title props) by
    src_idxs.  Fast path for spans with no join candidates (all TXT spans,
    most hOCR spans).
    """
    n = len(texts)
    if n == 0:
        return [], []
    t = [s.strip(_JAVA_TRIM) for s in texts]
    _nfc = unicodedata.normalize
    # NFC of pure-ASCII text is the identity; str.isascii is a cheap C check
    # that skips the normalize call for the common case
    if not any(last and s.endswith("-") for s, last in zip(t, is_last)):
        out_t, out_i = [], []
        for i, s in enumerate(t):
            if s:
                out_t.append(s if s.isascii() else _nfc("NFC", s))
                out_i.append(i)
        return out_t, out_i
    out_t, out_i = [], []
    i = 0
    while i < n:
        s = t[i]
        src = i
        if is_last[i] and s.endswith("-") and i + 1 < n:
            s = s[:-1] + t[i + 1]
            i += 2
        else:
            i += 1
        if s:
            out_t.append(s if s.isascii() else _nfc("NFC", s))
            out_i.append(src)
    return out_t, out_i


class _Out:
    """Column accumulator for one output batch (subset-aware: only the
    columns a branch declared are materialized and serialized)."""

    __slots__ = ("names", "cols")

    def __init__(self, names: tuple[str, ...]) -> None:
        self.names = names
        self.cols: dict[str, list] = {n: [] for n in names}

    def add(self, doc_id, span_offset, pos, kind, text=None, media_ref=None,
            line_idx=None, tok_idx=None, page_id=None, engine=None, caps=None,
            props=None, error=None) -> None:
        all_vals = {"doc_id": doc_id, "span_offset": span_offset, "pos": pos,
                    "kind": kind, "text": text, "media_ref": media_ref,
                    "line_idx": line_idx, "tok_idx": tok_idx,
                    "page_id": page_id, "ocr_engine": engine,
                    "ocr_capabilities": caps, "props": props, "error": error}
        for n, col in self.cols.items():
            col.append(all_vals[n])

    def add_words(self, doc_id, span_offset: int, toks: list[str],
                  lines: list[int] | None, tok_idxs: list[int] | None,
                  props: list[dict] | None = None) -> None:
        """Bulk emit of a span's word rows (one list-extend per DECLARED
        column instead of 13×n appends — the kernel's hot path)."""
        k = len(toks)
        if k == 0:
            return
        c = self.cols
        nones = None
        for n in self.names:
            if n == "doc_id":
                c["doc_id"].extend([doc_id] * k)
            elif n == "span_offset":
                c["span_offset"].extend([span_offset] * k)
            elif n == "pos":
                c["pos"].extend(range(k))
            elif n == "kind":
                c["kind"].extend(["word"] * k)
            elif n == "text":
                c["text"].extend(toks)
            elif n == "line_idx":
                c["line_idx"].extend(lines)
            elif n == "tok_idx":
                c["tok_idx"].extend(tok_idxs)
            elif n == "props" and props is not None:
                c["props"].extend(props)
            else:  # media_ref / page_id / ocr_engine / caps / error / null props
                if nones is None:
                    nones = [None] * k
                c[n].extend(nones)

    def batch(self) -> pa.RecordBatch:
        # build Arrow arrays directly from the python lists: no pandas frame,
        # no object-ndarray detour, no serializer-side re-conversion
        arrays = [pa.array(self.cols[n], type=_FIELDS[n][1]) for n in self.names]
        return pa.RecordBatch.from_arrays(arrays, names=list(self.names))


def _make_parse_kernel(columns: tuple[str, ...]):
    """mapInArrow kernel factory over exploded span rows
    (doc_id, span_offset, kind, text, media_ref), emitting only `columns`.

    Parsing work is IDENTICAL for every column subset (a branch that never
    reads `props` still validates each hOCR title so error rows match); only
    the materialization/serialization of the dropped columns is skipped.
    """
    want_props = "props" in columns
    want_lines = "line_idx" in columns
    want_toks = "tok_idx" in columns

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            out = _Out(columns)
            for doc_id, span_offset, kind, text, media_ref in zip(
                    rb.column("doc_id").to_pylist(),
                    rb.column("span_offset").to_pylist(),
                    rb.column("kind").to_pylist(),
                    rb.column("text").to_pylist(),
                    rb.column("media_ref").to_pylist()):
                if kind is None or span_offset is None:
                    out.add(doc_id, 0, 0, "empty")  # zero-span document marker
                    continue
                if kind in MEDIA_KINDS:
                    out.add(doc_id, span_offset, 0, kind, media_ref=media_ref)
                    continue
                try:
                    if kind == "hocr":
                        (texts, last, tprops, lines, toks,
                         page_id, engine, caps) = _parse_hocr(
                            text or "", want_props=want_props)
                        out.add(doc_id, span_offset, -1, "page", page_id=page_id,
                                engine=engine, caps=caps)
                        folded_t, src = _fold_tokens(texts, last)
                        out_lines = [lines[i] for i in src] if want_lines else None
                        out_toks = [toks[i] for i in src] if want_toks else None
                        out_props = [tprops[i] for i in src] if want_props else None
                    elif kind in ("text", "html"):
                        if kind == "html":
                            # boilerplate strip first (functions/html.py frozen
                            # rule), then the TXT tokenizer path
                            from ..functions.html import extract_main_text

                            text = extract_main_text(text or "")
                        tok_texts = _tokenize_txt(text or "")
                        # TxtToken.isLastTokenOnLine() == false always (TxtToken.java:19-21)
                        folded_t, src = _fold_tokens(tok_texts, [False] * len(tok_texts))
                        out_lines = [0] * len(folded_t) if want_lines else None
                        out_toks = src if want_toks else None
                        out_props = None
                    else:
                        raise ValueError(f"Unsupported format: {kind}")  # Main.java:87-88
                except ValueError as e:
                    out.add(doc_id, span_offset, -1, "error", error=str(e))
                    continue
                if not folded_t and kind in ("text", "html"):
                    # token-less TXT span: keep the doc_id alive in the parsed
                    # relation (hOCR spans already emit a 'page' metadata row)
                    out.add(doc_id, span_offset, -1, "empty")
                out.add_words(doc_id, span_offset, folded_t, out_lines, out_toks,
                              out_props)
            yield out.batch()

    return kernel


def explode_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) → one row per span, natively (skew-splitting explode)."""
    return docs.select(
        "doc_id",
        F.explode_outer("spans").alias("span"),
    ).select(
        "doc_id",
        F.col("span.offset").alias("span_offset"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )
    # explode_outer keeps zero-span docs as a null-span row; the parse kernel
    # turns those into kind='empty' markers so every doc_id survives into the
    # parsed relation (and therefore gets a score row) without any extra join.


def parse_spans(span_rows: DataFrame, repartition: int | None = None,
                columns: tuple[str, ...] | None = None) -> DataFrame:
    """Span rows → parsed relation (PARSED_SCHEMA) via Arrow-native mapInArrow.

    columns (default: every PARSED_SCHEMA field) prunes the kernel's OUTPUT
    to the subset a branch consumes — Spark cannot see through the opaque
    Python function, so undeclared columns would otherwise be computed and
    shipped through the Arrow boundary just to be dropped (guide §4.1).
    Parsing semantics (incl. which spans become error rows) are identical
    for every subset.
    """
    if columns is None:
        columns = ALL_COLUMNS
    else:  # normalize to PARSED_SCHEMA order (and reject unknown names)
        unknown = set(columns) - set(ALL_COLUMNS)
        if unknown:
            raise ValueError(f"unknown parsed columns: {sorted(unknown)}")
        columns = tuple(n for n in ALL_COLUMNS if n in set(columns))
    if repartition:
        # hash-spread spans (incl. a giant doc's spans) across the cluster
        span_rows = span_rows.repartition(repartition, "doc_id", "span_offset")
    schema = ", ".join(f"{n} {_FIELDS[n][0]}" for n in columns)
    return span_rows.mapInArrow(_make_parse_kernel(columns), schema=schema)


def parse_documents(docs: DataFrame, repartition: int | None = None,
                    columns: tuple[str, ...] | None = None) -> DataFrame:
    """(doc_id, spans) documents table → parsed relation."""
    return parse_spans(explode_docs(docs), repartition=repartition,
                       columns=columns)
