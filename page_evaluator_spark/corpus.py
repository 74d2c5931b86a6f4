"""Deterministic synthetic corpus generator for the interleaved-span documents table.

Emits rows of exactly the BASELINE.json input_hint shape:
    (doc_id: string, spans: array<struct<kind:string, text:string,
                                         media_ref:string, offset:int32>>)

kind ∈ {'text','hocr','image','table','figure'} (FIXTURES.md §1).  Seeded and
fully deterministic — the same (n_docs, seed, knobs) always produce the same
corpus, so golden outputs are stable and benchmark inputs reproducible.

Covers every branch of the reference algorithm (see fixtures_docs()):
all 11 token categories, EOL hyphen joins incl. consecutive-candidate runs,
zero-word lines, clean-to-empty tokens, empty pages, missing ocr_page,
malformed hOCR title (quarantine), media-only docs, interleaved text/media,
non-ASCII letters (é ſ æ — Unicode \\p{L} vs ASCII \\p{Punct} deltas), and
pathological skew docs for salting tests.
"""

from __future__ import annotations

import random

# Vocabulary spanning all 11 reference categories (FIXTURES.md §4).
CATEGORY_EXEMPLARS = {
    "punct": [";", ".", ",", "?"],
    "number_objects": ["1,234.56", "$100", "12/25/1694", "12%", "1694", "3.5"],
    "single_letter": ["I", "a", "é"],
    "ge4_repeated": ["mmmm", "a----b", "lllll", "bookkkkeeper"],
    "len_gt1_nonalpha": ["!!", "***", "?!?", "-+-"],
    "clean_short": ["a.", "(at", "to", "of."],
    "clean_all_alpha": ["whereunto", "quality", "eſtimation", "cœlum", "thee", "hath"],
    "clean_one_nonalpha": ["vn'to", "qu3en", "pag*e"],
    "clean_two_nonalpha": ["q3e1n", "h0u5e", "w0r*d"],
    "clean_3plus_nonalpha": ["h0u5e9", "w0%r*d9x"],
}

_WORDS = [w for ws in CATEGORY_EXEMPLARS.values() for w in ws]

MEDIA_KINDS = ("image", "table", "figure")


def _hocr_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


def make_hocr(lines: list[list[str]], page_id: str = "page_1", engine: str = "tesseract 3.02",
              with_meta: bool = True, with_page: bool = True, bad_title_at: int = -1) -> str:
    """Build a well-formed hOCR page from a list of lines of word texts."""
    parts = ["<html><head>"]
    if with_meta:
        parts.append(f'<meta name="ocr-system" content="{_hocr_escape(engine)}"/>')
        parts.append('<meta name="ocr-capabilities" content="ocr_page ocr_line ocrx_word"/>')
    parts.append("</head><body>")
    if with_page:
        parts.append(f'<div class="ocr_page" id="{page_id}" title="bbox 0 0 2488 3507">')
    wid = 0
    for words in lines:
        parts.append('<span class="ocr_line" title="bbox 0 0 100 20">')
        for w in words:
            wid += 1
            title = "bbox 1 2 3 4; x_wconf 85" if wid != bad_title_at else "malformed_no_space"
            parts.append(
                f'<span class="ocrx_word" id="w{wid}" title="{title}">{_hocr_escape(w)}</span>'
            )
        parts.append("</span>")
    if with_page:
        parts.append("</div>")
    parts.append("</body></html>")
    return "".join(parts)


def _img_span(doc_id: str, offset: int, kind: str = "image") -> dict:
    return {"kind": kind, "text": None, "media_ref": f"img://{doc_id}/{offset}", "offset": offset}


def _txt_span(text: str, offset: int) -> dict:
    return {"kind": "text", "text": text, "media_ref": None, "offset": offset}


def _hocr_span(xml: str, offset: int) -> dict:
    return {"kind": "hocr", "text": xml, "media_ref": None, "offset": offset}


def fixtures_docs() -> list[dict]:
    """Hand-built edge-case documents (FIXTURES.md §3-5). Deterministic."""
    docs = []

    # f001: canonical hOCR page — hyphen join across lines, long-s, zero-word line.
    docs.append({"doc_id": "f001_hocr_canonical", "spans": [_hocr_span(make_hocr(
        [["Quality", "eſti-"], ["mation", "of", "pages"], []]), 0)]})

    # f002: every category exemplar on one hOCR page.
    docs.append({"doc_id": "f002_hocr_all_categories", "spans": [_hocr_span(make_hocr(
        [list(ws) for ws in CATEGORY_EXEMPLARS.values()]), 0)]})

    # f003: three consecutive hyphen-join candidates (run-alternation parity).
    docs.append({"doc_id": "f003_hocr_hyphen_chain", "spans": [_hocr_span(make_hocr(
        [["con-"], ["tin-"], ["ua-"], ["tion"]]), 0)]})

    # f004: hyphen at page end (kept); hyphen not-last-on-line (no join).
    docs.append({"doc_id": "f004_hocr_hyphen_edges", "spans": [_hocr_span(make_hocr(
        [["mid-", "line"], ["trailing-"]]), 0)]})

    # f005: empty page → scores -1/-1.
    docs.append({"doc_id": "f005_hocr_empty", "spans": [_hocr_span(make_hocr([[]]), 0)]})

    # f006: punct+numbers only → correctable -1, quality 0.
    docs.append({"doc_id": "f006_hocr_ignored_only", "spans": [_hocr_span(make_hocr(
        [[";", "1,234.56", "$100", "I"]]), 0)]})

    # f007: missing ocr_page → quarantine.
    docs.append({"doc_id": "f007_hocr_no_page", "spans": [_hocr_span(make_hocr(
        [["word"]], with_page=False), 0)]})

    # f008: malformed title → quarantine (reference crashes, HOCRToken.java:22-29).
    docs.append({"doc_id": "f008_hocr_bad_title", "spans": [_hocr_span(make_hocr(
        [["good", "words"], ["here"]], bad_title_at=2), 0)]})

    # f009: missing meta → engine "" and capabilities [""].
    docs.append({"doc_id": "f009_hocr_no_meta", "spans": [_hocr_span(make_hocr(
        [["plain", "page"]], with_meta=False), 0)]})

    # f010: TXT page — blank lines, EOL hyphen pair, punct runs, digits, money.
    docs.append({"doc_id": "f010_txt_canonical", "spans": [_txt_span(
        "The quality of  mercy\n\n   \nis not estima-\ntion...  but?! rather\n"
        "12/25/1694 coſts $100 or 1,234.56 now\n", 0)]})

    # f011: TXT with whitespace-only page.
    docs.append({"doc_id": "f011_txt_blank", "spans": [_txt_span("  \n\t\n   \n", 0)]})

    # f012: TXT hyphen chain (regex replaceAll left-to-right, no re-scan).
    docs.append({"doc_id": "f012_txt_hyphen_chain", "spans": [_txt_span(
        "aaa-\nbbb-\nccc ddd-\neee\n", 0)]})

    # f013: media-only doc.
    docs.append({"doc_id": "f013_media_only", "spans": [
        _img_span("f013_media_only", 0),
        _img_span("f013_media_only", 1, "table"),
        _img_span("f013_media_only", 2, "figure"),
    ]})

    # f014: interleaved text–image–hocr–image by offset.
    docs.append({"doc_id": "f014_interleaved", "spans": [
        _txt_span("first part of the doc\n", 0),
        _img_span("f014_interleaved", 1),
        _hocr_span(make_hocr([["second", "part"]]), 2),
        _img_span("f014_interleaved", 3, "figure"),
        _txt_span("final words here\n", 4),
    ]})

    # f015: clean-to-empty + leading/trailing punct cleaning boundaries.
    docs.append({"doc_id": "f015_clean_edges", "spans": [_hocr_span(make_hocr(
        [[".token...", "..token", "token....", "!!", "...."]]), 0)]})

    # f016: non-ASCII letters & unicode punct (NOT ASCII punct → stays non-alpha).
    docs.append({"doc_id": "f016_unicode", "spans": [_txt_span(
        "naïve cœur æther ſtill don’t « quoted »\n", 0)]})

    # f017: empty spans array.
    docs.append({"doc_id": "f017_no_spans", "spans": []})

    # f018: text span with empty string.
    docs.append({"doc_id": "f018_empty_text", "spans": [_txt_span("", 0)]})

    # f019: nested markup inside ocrx_word — getTextContent concatenates all
    # descendant text (HOCRToken.java:40-42); also a word split across an
    # inner element boundary ("wo<em>r</em>d." → "word.").
    nested = (
        '<html><head><meta name="ocr-system" content="tess"/></head><body>'
        '<div class="ocr_page" id="p1" title="bbox 0 0 1 1">'
        '<span class="ocr_line" title="bbox 0 0 1 1">'
        '<span class="ocrx_word" id="w1" title="bbox 1 2 3 4">wo<em>r</em>d.</span>'
        '<span class="ocrx_word" id="w2" title="bbox 1 2 3 4"><b>hy-</b></span>'
        "</span>"
        '<span class="ocr_line" title="bbox 0 0 1 1">'
        '<span class="ocrx_word" id="w3" title="bbox 1 2 3 4">phen</span>'
        "</span></div></body></html>"
    )
    docs.append({"doc_id": "f019_nested_markup", "spans": [_hocr_span(nested, 0)]})

    # f020: HTML main-content extraction — nav/footer (link-dense), script,
    # comments, and short blocks are boilerplate; two long paragraphs stay.
    html_page = (
        "<html><head><title>t</title><script>var x = 'dropme &amp; all';</script>"
        "<style>p { color: red }</style></head><body>"
        '<div class="nav"><a href="/">Home</a> <a href="/a">Archive</a> '
        '<a href="/b">About</a></div>'
        "<!-- boilerplate comment that is quite long but still a comment -->"
        "<h1>Short title</h1>"
        "<p>The quality of mercy is not strained, it droppeth as the gentle "
        "rain from heaven upon the place beneath.</p>"
        "<p>It is twice bless&#39;d: it blesseth him that gives and him that "
        "takes — mightiest in the mightiest.</p>"
        '<p>See <a href="/x">this link</a> in a long enough sentence that '
        "survives because its link density stays low.</p>"
        '<div class="footer"><a href="/tos">Terms</a> <a href="/p">Privacy</a></div>'
        "</body></html>"
    )
    docs.append({"doc_id": "f020_html_boilerplate", "spans": [
        {"kind": "html", "text": html_page, "media_ref": None, "offset": 0}]})

    # f021: html interleaved with media + empty html span.
    docs.append({"doc_id": "f021_html_interleaved", "spans": [
        {"kind": "html", "text": "<p>A first paragraph long enough to keep "
                                 "for the extraction test.</p>", "media_ref": None,
         "offset": 0},
        _img_span("f021_html_interleaved", 1),
        {"kind": "html", "text": "<div><a href='/'>only links</a></div>",
         "media_ref": None, "offset": 2},
    ]})

    return docs


def random_doc(doc_id: str, rng: random.Random, n_spans: int, media_fraction: float = 0.2,
               words_per_line: int = 6, lines_per_span: int = 8) -> dict:
    """One random document with n_spans interleaved spans."""
    spans = []
    for off in range(n_spans):
        r = rng.random()
        if r < media_fraction:
            spans.append(_img_span(doc_id, off, rng.choice(MEDIA_KINDS)))
        elif r < media_fraction + (1 - media_fraction) / 2:
            lines = []
            for _ in range(rng.randint(1, lines_per_span)):
                line = [rng.choice(_WORDS) for _ in range(rng.randint(1, words_per_line))]
                if rng.random() < 0.15:
                    line[-1] = rng.choice(["esti-", "con-", "mid-"])
                lines.append(line)
            spans.append(_hocr_span(make_hocr(lines, page_id=f"{doc_id}_p{off}"), off))
        else:
            lns = []
            for _ in range(rng.randint(1, lines_per_span)):
                lns.append(" ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, words_per_line))))
                if rng.random() < 0.1:
                    lns[-1] += " wrap-"
            spans.append(_txt_span("\n".join(lns) + "\n", off))
    return {"doc_id": doc_id, "spans": spans}


def gen_corpus(n_docs: int, seed: int = 42, include_fixtures: bool = True,
               media_fraction: float = 0.2, mean_spans: int = 4,
               skew_docs: int = 0, skew_spans: int = 2000) -> list[dict]:
    """Deterministic corpus: fixtures + n_docs random docs (+ skew_docs giants)."""
    rng = random.Random(seed)
    docs = fixtures_docs() if include_fixtures else []
    for i in range(n_docs):
        n_spans = 1 + min(int(rng.expovariate(1.0 / max(mean_spans - 1, 1))), 40)
        docs.append(random_doc(f"d{i:07d}", rng, n_spans, media_fraction))
    for i in range(skew_docs):
        docs.append(random_doc(f"skew{i:03d}", rng, skew_spans, media_fraction=0.1))
    return docs


SPANS_DDL = ("doc_id string, spans array<struct<kind:string, text:string, "
             "media_ref:string, offset:int>>")


def corpus_to_spark_df(spark, docs: list[dict]):
    """Materialize generator output as a Spark DataFrame with the input_hint schema."""
    rows = [
        (d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
        for d in docs
    ]
    return spark.createDataFrame(rows, schema=SPANS_DDL)


def write_corpus_parquet(path: str, docs: list[dict], row_group_size: int = 256) -> None:
    """Write the corpus with pyarrow (no Spark needed; used to pre-generate bench
    input).  Small row groups keep the single file splittable into many scan
    tasks — a 1-row-group file would serialize the whole parse stage."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    span_type = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ])
    table = pa.table({
        "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
        "spans": pa.array(
            [[(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]]
             for d in docs],
            pa.list_(span_type)),
    })
    pq.write_table(table, path, row_group_size=row_group_size)
