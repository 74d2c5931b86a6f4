"""Round-3 fixes pinned by test (VERDICT r2 + ADVICE r2 items).

- native hocr_title_to_map crash-parity guard (ADVICE #3): titles the Java
  reference crashes on → NULL from the twin, ValueError from the kernel;
- simhash_near_pairs rejects n_bands != 4 (ADVICE #2);
- token_props x_wconf survives fractional confidences (ADVICE #5);
- golden oracle dir is derived from the package location (ADVICE #4);
- ensure_min_parallelism memoizes its partition probe (VERDICT #7).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from page_evaluator_spark.operators.parse import _title_props

# Titles HOCRToken.java:20-29 parses fine (well-formed per the Java split;
# ";"/";;" split to the EMPTY array → empty Properties, no crash).
TITLE_GOOD = ["bbox 393 604 442 620; x_wconf 85", "a 1;b 2 3;  c x y z  ",
              "bbox 1 2 3 4;", "a 1;;", "a 1;;;", "a 1 ; b 2", "a  1",
              ";", ";;",
              # repeated keys: java.util.Properties last-put-wins — must NOT
              # abort under Spark's default mapKeyDedupPolicy=EXCEPTION
              "bbox 1 2 3 4; bbox 5 6 7 8", "a 1;a 2;a 3"]

# Titles the reference CRASHES on (StringIndexOutOfBounds): empty title,
# leading/interior empty segment, whitespace-only trailing segment, segment
# with no post-trim literal space (tabs don't count for indexOf(" ")).
# Trailing \n/\r: Java's $ would match before the terminator — anchors are \z.
TITLE_BAD = ["", " ", "; ", "a 1; ", "a 1;;b 2", ";a 1", "a 1; ;b 2",
             "abc", "a\t1", "a 1;b", "a 1;\n", "a 1;\r", ";;\n"]


def test_kernel_title_props_good_and_bad():
    for t in TITLE_GOOD:
        assert isinstance(_title_props(t), dict), repr(t)
    for t in TITLE_BAD:
        with pytest.raises(ValueError):
            _title_props(t)


def test_native_title_map_crash_parity(spark):
    """The native twin returns NULL exactly where the kernel raises — lenient
    divergence on malformed titles (ADVICE r2 #3) is closed."""
    from page_evaluator_spark.functions.textnorm import hocr_title_to_map

    cases = TITLE_GOOD + TITLE_BAD
    df = spark.createDataFrame([(t,) for t in cases], "title string")
    got = {r["title"]: r["m"]
           for r in df.withColumn("m", hocr_title_to_map(F.col("title"))).collect()}
    for t in TITLE_GOOD:
        assert got[t] is not None, repr(t)
        assert dict(got[t]) == _title_props(t), repr(t)
    for t in TITLE_BAD:
        assert got[t] is None, repr(t)


def test_simhash_rejects_unsupported_band_count(spark):
    from page_evaluator_spark.operators.dedup import simhash_near_pairs

    docs = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    with pytest.raises(ValueError, match="4 16-bit bands"):
        simhash_near_pairs(docs, n_bands=8)
    # default still constructs a plan
    assert simhash_near_pairs(docs).columns == ["doc_a", "doc_b", "hamming"]


def test_token_props_fractional_x_wconf(spark):
    """Tesseract emits fractional confidences ('85.3'); the convenience column
    must not NULL them out (ADVICE r2 #5: cast via double)."""
    from page_evaluator_spark.corpus import corpus_to_spark_df
    from page_evaluator_spark.operators.parse import parse_documents
    from page_evaluator_spark.operators.spans import token_props

    xml = ('<html><body><div class="ocr_page" id="p1" title="bbox 0 0 9 9">'
           '<span class="ocr_line" title="bbox 0 0 9 9">'
           '<span class="ocrx_word" title="bbox 1 2 3 4; x_wconf 85.3">Word</span>'
           '<span class="ocrx_word" title="bbox 5 6 7 8; x_wconf 40">Next</span>'
           '</span></div></body></html>')
    docs = corpus_to_spark_df(spark, [{
        "doc_id": "d1",
        "spans": [{"kind": "hocr", "text": xml, "media_ref": None, "offset": 0}]}])
    rows = {r["text"]: r for r in token_props(parse_documents(docs)).collect()}
    assert rows["Word"]["x_wconf"] == 85  # double→int truncation, not NULL
    assert rows["Next"]["x_wconf"] == 40
    assert rows["Word"]["props"]["x_wconf"] == "85.3"  # raw value untouched


def test_golden_dir_is_package_relative():
    from pathlib import Path

    import page_evaluator_spark.queries as Q

    assert not Q._GOLDEN_DIR.startswith("/root/repo") or (
        Path(Q.__file__).resolve().parent.parent == Path("/root/repo"))
    assert Path(Q._GOLDEN_DIR) == (
        Path(Q.__file__).resolve().parent.parent / "fixtures" / "golden")
    assert (Path(Q._GOLDEN_DIR) / "ocr_page_scores.parquet").exists()


def test_ensure_min_parallelism_memoizes_probe(spark, sf01_dir, monkeypatch):
    """The partition probe (a driver-side plan→RDD conversion) runs at most
    once per cache_key and never re-runs on an already-marked DataFrame."""
    from page_evaluator_spark.operators import skew

    skew._SCAN_PARTS_CACHE.clear()
    probes = {"n": 0}
    orig = skew._probe_partitions

    def counting_probe(df):
        probes["n"] += 1
        return orig(df)

    monkeypatch.setattr(skew, "_probe_partitions", counting_probe)
    d1 = skew.ensure_min_parallelism(
        spark.read.parquet(f"{sf01_dir}/documents.parquet"), cache_key="k1")
    assert probes["n"] == 1
    skew.ensure_min_parallelism(
        spark.read.parquet(f"{sf01_dir}/documents.parquet"), cache_key="k1")
    assert probes["n"] == 1  # second load: cache hit, no df.rdd access
    skew.ensure_min_parallelism(d1)  # marked object: no probe either
    assert probes["n"] == 1
    skew.ensure_min_parallelism(spark.range(10).toDF("x"))  # unkeyed: probes
    assert probes["n"] == 2


def test_native_title_map_fuzz_parity(spark):
    """Seeded fuzz over the title grammar's awkward alphabet: the native twin
    must return NULL exactly when the kernel raises, and the identical map
    otherwise — for EVERY generated title, not just the hand-picked sets."""
    import random

    rng = random.Random(1234)
    alphabet = ["a", "b", "x1", "bbox", "85.3", ";", " ", "  ", "\t", "\x0b",
                ";;", "; ", " ;", "\n", "\r", "a 1;a 2"]
    titles = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 10)))
              for _ in range(400)]
    expected = {}
    for t in titles:
        try:
            expected[t] = _title_props(t)
        except ValueError:
            expected[t] = None

    from page_evaluator_spark.functions.textnorm import hocr_title_to_map

    df = spark.createDataFrame([(i, t) for i, t in enumerate(titles)],
                               "i int, title string")
    got = {r["i"]: r["m"] for r in
           df.withColumn("m", hocr_title_to_map(F.col("title"))).collect()}
    for i, t in enumerate(titles):
        g = got[i] if got[i] is None else dict(got[i])
        assert g == expected[t], f"{t!r}: native={g} kernel={expected[t]}"
