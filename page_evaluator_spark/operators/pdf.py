"""PDF / layout parsing surface (north_rule: "PDF/layout parse").

No PDF library ships in this container, so — exactly like media decode
(operators/media.py) — the Spark-side plumbing is real and tested while the
codec kernel is stubbed behind an import-guard: `parse_pdf_spans(...,
decode_stub=True)` substitutes a deterministic fake layout so the dataflow
(schema, Arrow batching, block ordering, downstream tokenization) is
exercisable end-to-end.  A real deployment replaces ONLY `_decode_real`.

Layout model: a PDF span (kind='pdf', media_ref = object-store ref) decodes
to ordered layout blocks (page_no, block_no, block_kind, text, bbox) —
block_kind ∈ {'heading','paragraph','caption','table'}.  Text-ish blocks can
then be fed to the engine's TXT tokenizer path, exactly like 'html' spans.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PDF_BLOCKS_SCHEMA = (
    "doc_id string, media_ref string, page_no int, block_no int, "
    "block_kind string, text string, x0 float, y0 float, x1 float, y1 float, "
    "decode_error string"
)

_BLOCK_KINDS = ("heading", "paragraph", "paragraph", "caption", "table")
_FAKE_WORDS = ("layout", "block", "column", "figure", "page", "text",
               "heading", "caption", "margin", "footnote")


def _fake_layout(ref: str) -> list[dict]:
    """Deterministic stand-in for a real PDF layout parser."""
    h = hashlib.sha256((ref or "").encode()).digest()
    blocks = []
    n_pages = 1 + h[0] % 3
    bno = 0
    for page in range(n_pages):
        for i in range(1 + h[(page + 1) % 32] % 4):
            seed = h[(page * 7 + i) % 32]
            words = [_FAKE_WORDS[(seed + k) % len(_FAKE_WORDS)] for k in range(3 + seed % 8)]
            blocks.append({
                "page_no": page, "block_no": bno,
                "block_kind": _BLOCK_KINDS[seed % len(_BLOCK_KINDS)],
                "text": " ".join(words),
                "x0": float(seed % 50), "y0": float(10 * i),
                "x1": float(50 + seed % 50), "y1": float(10 * i + 9),
            })
            bno += 1
    return blocks


def _decode_real(ref: str) -> list[dict]:
    try:
        import pypdf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real PDF parsing requires a PDF library not present in this "
            "environment; use decode_stub=True") from e
    raise NotImplementedError("real PDF layout wiring is deployment-specific")


def parse_pdf_spans(pdf_rows: DataFrame, decode_stub: bool = True) -> DataFrame:
    """(doc_id, media_ref) pdf-span rows → ordered layout blocks (Arrow batched)."""
    decode = _fake_layout if decode_stub else _decode_real

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "media_ref", "page_no", "block_no", "block_kind",
                "text", "x0", "y0", "x1", "y1", "decode_error"]
        for pdf in batches:
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                try:
                    for b in decode(ref):
                        rows.append([doc_id, ref, b["page_no"], b["block_no"],
                                     b["block_kind"], b["text"], b["x0"], b["y0"],
                                     b["x1"], b["y1"], None])
                except NotImplementedError as e:
                    rows.append([doc_id, ref, None, None, None, None,
                                 None, None, None, None, str(e)])
            out = pd.DataFrame(rows, columns=cols)
            for c in ("page_no", "block_no"):
                out[c] = out[c].astype("Int32")
            yield out

    return pdf_rows.mapInPandas(kernel, schema=PDF_BLOCKS_SCHEMA)


def pdf_block_tokens(blocks: DataFrame) -> DataFrame:
    """Layout blocks → token rows via the native TXT tokenizer (reading order
    = (page_no, block_no); headings/paragraphs/captions only)."""
    from ..functions.textnorm import tokenize_txt

    return (blocks.where(F.col("block_kind").isin("heading", "paragraph", "caption"))
            .select("doc_id", "page_no", "block_no",
                    F.posexplode(tokenize_txt(F.col("text"))).alias("tok_idx", "text")))
