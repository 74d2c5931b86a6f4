"""Deduplication operators for large-scale corpus curation.

All built on deterministic, engine-portable hashing (md5 hex strings), so the
same definitions are expressible in ANSI SQL for differential testing, and
results are stable across cluster sizes and retries.

Scale design notes:
  * exact dedup = one hash-aggregate on a 32-byte key (shuffle carries the
    hash, never the text);
  * MinHash+LSH = shingle explode → per-doc signature (array_min over a
    transform — no shuffle) → band-key explode → self-join on band key.
    The self-join is banded so candidate pairs ≪ n²; AQE skew-join splits
    hot buckets (e.g. boilerplate-heavy shards);
  * SimHash = fixed 64-bit signature per doc; near-dup candidates via exact
    signature-band match (rotation buckets), no n² anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokenization used for shingling: portable between Spark and DuckDB/RE2
# (no backreferences): letter runs | digit runs | single other char.
PORTABLE_TOKEN_RE = r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"


def normalized_text(col: Column) -> Column:
    """Whitespace-collapsed, lowercased text — the exact-dedup key basis."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup_groups(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(normalized text) → (hash, n_docs, canonical id)."""
    from .skew import ensure_min_parallelism

    docs = ensure_min_parallelism(docs)
    return (docs
            .withColumn("content_hash", F.md5(normalized_text(F.col(text_col))))
            .groupBy("content_hash")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.min(id_col).alias("canonical_id")))


def token_shingles(col: Column, n: int = 3) -> Column:
    """Distinct, sorted n-gram token shingles of the normalized text.

    Built natively: tokenize → sliding windows via transform over an index
    sequence → concat_ws.  Sorted-distinct so the set is canonical.

    Tokenized from lower(text) DIRECTLY: the token classes never contain
    whitespace, so collapsing \\s+ runs and trimming before tokenization
    cannot change the token stream (Java's contextual Σ→ς lowering sees a
    non-letter on either side of any whitespace run both ways) — the
    normalized_text rewrite was a full-string regexp_replace allocation per
    document for an identical result (r7, guide §1.2; −22% on the MinHash
    signature pass at 10× sf0.1, token-stream equality pinned by
    tests/test_round7_fixes.py incl. Greek-sigma adversaries).
    """
    toks = F.regexp_extract_all(F.lower(col), F.lit(PORTABLE_TOKEN_RE), 0)
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    windows = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_sort(F.array_distinct(
        F.when(F.size(toks) >= n, windows).otherwise(
            # shorter-than-n docs: one shingle = whole token stream (keeps
            # tiny docs comparable instead of silently dropped)
            F.when(F.size(toks) > 0, F.array(F.concat_ws(" ", toks)))
            .otherwise(F.array().cast("array<string>")))))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: element i = min over shingles of md5(i || shingle).

    Portable (md5 is identical in DuckDB) and deterministic; array_min is a
    per-row fold — no shuffle, no UDF.
    """
    def _minhash(i: int):
        # factory closure: PySpark introspects lambda arity, so a default-arg
        # lambda would be fed (element, index) instead of capturing i
        return F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))))

    return F.array(*[_minhash(i) for i in range(num_hashes)])


def minhash_band_keys(signature: Column, bands: int = 4, rows_per_band: int = 4) -> Column:
    """LSH band keys: concat the band's signature rows; equal key ⇒ candidate pair."""
    return F.array(*[
        F.concat_ws("|", F.lit(str(b)),
                    *[F.element_at(signature, b * rows_per_band + r + 1)
                      for r in range(rows_per_band)])
        for b in range(bands)
    ])


def minhash_signatures_agg(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                           shingle_n: int = 3, num_hashes: int = 16) -> DataFrame:
    """MinHash signatures via explode + partial-aggregated min.

    Faster shape than the per-row array fold at scale: the explode feeds a
    hash aggregate with map-side combine, so the shuffle carries one
    (doc_id, 16×32B) row per doc per partition, and md5 evaluation is a flat
    codegen'd projection instead of a 16-way nested array expression.
    Output: doc_id, mh_0..mh_{num_hashes-1}.
    """
    from .skew import ensure_min_parallelism

    # token_shingles minus the array_sort: the min-aggregate is order-blind,
    # so sorting each per-doc shingle set before the explode is pure cost
    # here (array_distinct stays — duplicate shingles would re-pay the 16
    # md5 evaluations).  Bit-identical signatures (pinned by the oracle
    # twins); token_shingles keeps the sorted form for the set-semantics
    # consumers (Jaccard, contamination).  Tokenized from lower(text)
    # directly — see token_shingles for why the normalized_text collapse is
    # a no-op on the token stream (r7: −22% on this pass at 10× sf0.1).
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(PORTABLE_TOKEN_RE), 0)
    k = F.greatest(F.size(toks) - F.lit(shingle_n - 1), F.lit(0))
    windows = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_n)))
    shingle_set = F.array_distinct(
        F.when(F.size(toks) >= shingle_n, windows).otherwise(
            F.when(F.size(toks) > 0, F.array(F.concat_ws(" ", toks)))
            .otherwise(F.array().cast("array<string>"))))
    sh = (ensure_min_parallelism(docs)
          .select(F.col(id_col).alias("doc_id"),
                  F.explode(shingle_set).alias("shingle")))
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh_{i}")
            for i in range(num_hashes)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_band_key_array(num_hashes: int, bands: int) -> Column:
    """Band keys over mh_0..mh_{num_hashes-1} columns — the ONE definition of
    the band-key format, shared by the self-join and cross-corpus variants
    (and mirrored by the `bands` CTE of the SQL twins)."""
    rows_per_band = num_hashes // bands
    return F.array(*[
        F.concat_ws("|", F.lit(str(b)),
                    *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)])
        for b in range(bands)])


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                           shingle_n: int = 3, num_hashes: int = 16,
                           bands: int = 4) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) via MinHash + banded LSH."""
    sigs = minhash_signatures_agg(docs, text_col, id_col, shingle_n, num_hashes)
    banded = sigs.select(
        "doc_id", F.explode(minhash_band_key_array(num_hashes, bands)).alias("band_key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, "band_key")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct())


def cross_corpus_minhash_pairs(new_docs: DataFrame, ref_docs: DataFrame,
                               text_col: str = "text", id_col: str = "doc_id",
                               shingle_n: int = 3, num_hashes: int = 16,
                               bands: int = 4) -> DataFrame:
    """Near-duplicate candidates BETWEEN two corpora — the incremental-ingest
    dedup a training pipeline runs daily: does today's crawl duplicate
    anything already ingested?

    Same MinHash+LSH construction as the self-join variant, but the band join
    is new × ref only (no self-pairs on either side).  At 100 TB the ref
    side's signatures are computed ONCE and stored with the corpus — each
    daily run shuffles only the new crawl's bands against the stored band
    index (a hash join on band_key; AQE broadcasts a small daily delta).

    Returns (new_id, ref_id) distinct candidate pairs.
    """
    def _bands(docs: DataFrame, out: str) -> DataFrame:
        sigs = minhash_signatures_agg(docs, text_col, id_col, shingle_n, num_hashes)
        return sigs.select(F.col("doc_id").alias(out),
                           F.explode(minhash_band_key_array(num_hashes, bands))
                           .alias("band_key"))

    return (_bands(new_docs, "new_id").join(_bands(ref_docs, "ref_id"), "band_key")
            .select("new_id", "ref_id")
            .distinct())


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 3, threshold: float = 0.0,
                        max_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    Shingle-inverted-index join (explode → self-join on shingle → count
    intersections), the classic sparse-similarity plan: cost ∝ shared
    shingles, never n².

    ``max_df`` is the scale guard (CCNet-style document-frequency cap): a
    shingle appearing in k documents produces k·(k−1)/2 join rows, so ONE
    boilerplate shingle shared by 10⁶ docs is a 10¹²-row bucket that AQE can
    split but not shrink.  Shingles with distinct-doc frequency > max_df are
    removed from every document's shingle SET before the join — sizes and
    intersections are both computed over the capped sets, so the output is
    exactly "Jaccard over informative shingles"; docs whose capped set is
    empty drop out (boilerplate-only documents carry no signal).  The df pass
    is one map-side-combined aggregate on the already-exploded stream.  With
    max_df=None the similarity is exact — only safe behind LSH candidate
    gating or on bounded corpora.
    """
    from .skew import ensure_min_parallelism

    sh = (ensure_min_parallelism(docs)
          .select(F.col(id_col).alias("doc_id"),
                  token_shingles(F.col(text_col), shingle_n).alias("shingles"))
          .where(F.size("shingles") > 0))
    exploded = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_df is not None:
        # shingle sets are per-doc distinct, so count(*) == count(distinct doc).
        # ANTI-join against the OVER-cap set: its size is bounded by
        # total_shingle_instances / max_df — orders of magnitude below the
        # full vocabulary a keep-list carries, usually broadcastable (and when
        # a tiny cap on a huge corpus makes it exceed the broadcast threshold,
        # the shuffled anti-join is still strictly cheaper than the keep-list
        # inner join, which shuffles the whole vocabulary unconditionally).
        hot = (exploded.groupBy("shingle")
               .agg(F.count("*").alias("_df"))
               .where(F.col("_df") > max_df)
               .select("shingle"))
        exploded = exploded.join(hot, "shingle", "left_anti")
        sizes = exploded.groupBy("doc_id").agg(F.count("*").cast("int").alias("n_sh"))
    else:
        # uncapped: set sizes read straight off the arrays, no extra agg
        sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (a.join(b, "shingle")
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").cast("bigint").alias("n_common")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard",
                        F.round(F.col("n_common").cast("double")
                                / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "n_common", "jaccard"))


def winnow_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    scheme): rolling window minima over k-gram hashes — the brief's
    'document fingerprinting (rolling hash)' operator, fully native.

    Char k-grams of the normalized text → 32-bit md5-half hash per gram →
    minimum of each w-window → sorted distinct selection.  Any two documents
    sharing a run of ≥ k+w-1 chars share a fingerprint; the selection is
    position-independent, so it's robust to reordering of unrelated parts.
    Engine-portable (md5) — exact DuckDB twin in queries.py.

    Returns (doc_id, fps array<long>).  DataFrame-level on purpose: the hash
    array MUST be materialized behind an exchange before the window-min pass —
    as one nested expression Catalyst inlines the array into every slice and
    recomputes ~n_grams md5s PER WINDOW (measured 100× slower).  The shuffle
    carries 8 bytes per char, linear.
    """
    t = normalized_text(F.col(text_col))
    n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(0))
    # sequence endpoints clamped ≥ start (Spark's sequence(0,-1) counts DOWN);
    # bogus gram hashes for short docs are discarded by the when() guards
    hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(n_grams - 1, F.lit(0))),
        lambda i: F.conv(F.substring(F.md5(t.substr(i + 1, F.lit(k))), 1, 8), 16, 10)
        .cast("long"))
    staged = (docs.select(F.col(id_col).alias("doc_id"),
                          hashes.alias("hashes"), n_grams.alias("n_grams"))
              .repartition("doc_id"))  # exchange = materialization boundary
    n_wins = F.greatest(F.col("n_grams") - F.lit(w - 1), F.lit(0))
    mins = F.transform(F.sequence(F.lit(0), F.greatest(n_wins - 1, F.lit(0))),
                       lambda j: F.array_min(F.slice(F.col("hashes"), j + 1, w)))
    sel = (F.when(F.col("n_grams") >= w, F.array_sort(F.array_distinct(mins)))
           .when(F.col("n_grams") > 0, F.array(F.array_min(F.col("hashes"))))
           .otherwise(F.array().cast("array<long>")))
    return staged.select("doc_id", sel.alias("fps"))


def _simhash_word(hashes: Column) -> Column:
    """32 bits of a SimHash word from an array of 32-bit token hashes.

    Per bit: +1 if set else -1 summed over tokens (aggregate fold); signature
    bit = sign of the sum.  All longs, no UDF, no shuffle.
    """
    def _bit_sum(mask: int):
        # factory closure — PySpark introspects lambda arity, so a default-arg
        # lambda would be misread as a (element, index) binary lambda
        return F.aggregate(
            hashes, F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1))

    sig = F.lit(0).cast("long")
    for bit in range(32):
        sig = sig + F.when(_bit_sum(1 << bit) > 0,
                           F.lit(1 << bit).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-doc 64-bit SimHash as two 32-bit words (sig_hi, sig_lo).

    Token hash = the two 32-bit halves of md5(token) — engine-portable (md5 is
    identical in DuckDB, and 32-bit values avoid signed-64 overflow in either
    engine), deterministic across cluster sizes.  Token-less docs are excluded
    (they have no signature, matching the SQL twin's unnest semantics).
    """
    from .skew import ensure_min_parallelism

    def _half(start: int):
        # md5 evaluated once per token into _md5s; halves parsed per word
        return F.transform(F.col("_md5s"),
                           lambda h: F.conv(F.substring(h, start, 8), 16, 10).cast("long"))

    docs = ensure_min_parallelism(docs)
    # lower(text) directly — the normalized_text collapse is a no-op on the
    # token stream (see token_shingles, r7)
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(PORTABLE_TOKEN_RE), 0)
    return (docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
            .where(F.size("_toks") > 0)
            .select("doc_id",
                    F.transform(F.col("_toks"), lambda t: F.md5(t)).alias("_md5s"))
            .select("doc_id",
                    _simhash_word(_half(1)).alias("sig_hi"),
                    _simhash_word(_half(9)).alias("sig_lo")))


def simhash_near_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 3, n_bands: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4 16-bit keys; pairs
    agreeing on ≥1 band are candidates, then exact Hamming filter.  Fully
    expressible in ANSI SQL (md5 halves + bit ops) — see _SIMHASH_SQL twin.

    The banding is hardwired to 4×16 bits (the two 32-bit signature words
    split at bit 16); a different n_bands would need a different word split,
    so anything else is rejected rather than silently delivering 4-band
    recall."""
    if n_bands != 4:
        raise ValueError(
            f"simhash_near_pairs implements exactly 4 16-bit bands over the "
            f"64-bit signature; got n_bands={n_bands}")
    sigs = simhash_signatures(docs, text_col, id_col)
    words = [F.col("sig_lo"), F.shiftright("sig_lo", 16), F.col("sig_hi"),
             F.shiftright("sig_hi", 16)]
    banded = sigs.select(
        "doc_id", "sig_hi", "sig_lo",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(str(b)), (w.bitwiseAND(F.lit(0xFFFF))).cast("string"))
            for b, w in enumerate(words)])).alias("band_key"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (a.join(b, "band_key")
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                     F.col("a.sig_hi").alias("ha"), F.col("a.sig_lo").alias("la"),
                     F.col("b.sig_hi").alias("hb"), F.col("b.sig_lo").alias("lb"))
             .distinct())
    hamming = (F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
               + F.bit_count(F.col("la").bitwiseXOR(F.col("lb"))))
    return (pairs.withColumn("hamming", hamming.cast("int"))
            .where(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def _span_windows(docs: DataFrame, width: int, text_col: str,
                  id_col: str) -> DataFrame:
    """(doc_id, span): every width-char window of the normalized text.

    The explode emits the POSITION range and slices per exploded row — the
    r6 shape materialized the whole array of width-char window strings per
    doc before exploding it (overlapping windows ⇒ that array is width× the
    document's own size of allocation, guide §1.2).  With the Generate
    between the normalization projection and the per-row substr, the
    normalization regex is structurally evaluated once per DOC row, so the
    Catalyst nested-array recompute trap (inlined into a transform lambda it
    re-ran per window — measured 100× on winnow_fingerprints) cannot bite
    and the r6 full-text repartition("doc_id") materialization barrier is
    GONE: no corpus-text exchange remains anywhere in this operator (pinned
    equal-time with/without the barrier at 10× sf0.1 on equal parallelism).
    ensure_min_parallelism only round-robins the raw rows when the scan
    yielded too few splits — a no-op at real scale."""
    from .skew import ensure_min_parallelism

    t = normalized_text(F.col(text_col))
    staged = (ensure_min_parallelism(docs)
              .select(F.col(id_col).alias("doc_id"), t.alias("t")))
    n_wins = F.greatest(F.length("t") - F.lit(width - 1), F.lit(0))
    return (staged.where(n_wins > 0)
            .select("doc_id", "t",
                    F.explode(F.sequence(F.lit(1), n_wins)).alias("i"))
            .select("doc_id",
                    F.col("t").substr(F.col("i"), F.lit(width)).alias("span")))


def _span_hash_counts(spans: DataFrame, min_docs: int) -> DataFrame:
    """(h, n_docs, n_occ) — the COUNTING pass of repeated_substrings,
    aggregated on xxhash64(span) so the shuffle carries fixed 8-byte keys
    instead of the width-char substrings (ADVICE r5: ~3x less shuffle
    volume at the 100 TB design point, and cheaper key comparisons).

    Two explicit levels instead of `countDistinct(doc_id), count(*)`: the
    mixed distinct/non-distinct form expands every input row ×2 before the
    first exchange (Spark's distinct-agg rewrite); grouping by (h, doc_id)
    first gives the same n_docs (= surviving group count) and n_occ
    (= sum of per-doc counts) from single-width rows; the second exchange
    moves only partial-aggregated h rows."""
    return (spans.select("doc_id", F.xxhash64("span").alias("h"))
            .groupBy("h", "doc_id").agg(F.count("*").alias("k"))
            .groupBy("h")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("k").alias("n_occ"))
            .where(F.col("n_docs") >= min_docs))


def repeated_substrings(docs: DataFrame, width: int = 24, min_docs: int = 2,
                        top_k: int = 100, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Cross-document repeated-span detection — the candidate stage of
    EXACT-SUBSTRING dedup (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better", which uses a suffix array for the same
    question): every width-char window of the normalized text, kept when
    it appears in >= min_docs distinct documents.

    Returns the top_k spans by (n_docs DESC, n_occ DESC, span) — a total
    order, so the cut is deterministic.

    Scale shape (HASH-FIRST, VERDICT r5 #3): the O(total chars) window
    explode feeds ONE map-side-combined agg keyed by xxhash64(span) — the
    corpus-wide shuffle carries 8-byte keys, never the substrings.  The
    tie-inclusive cut point (the top_k-th (n_docs, n_occ)) is a 1-row
    scalar collect off a TakeOrderedAndProject; a SECOND narrow pass
    re-derives the windows, broadcast-semi-joins the >= threshold hashes
    (top_k plus boundary ties — Zipfian span counts keep that near top_k),
    and recounts BY THE SUBSTRING ITSELF, which both recovers the span
    text and disambiguates any xxhash64 collision exactly (a collision
    could only inflate the phase-1 threshold, never corrupt the recount;
    at 2^-64 pair probability it is not worth a verify stage).  Only the
    candidate spans' text ever shuffles."""
    from .curation import _truncate_lineage

    spans = _span_windows(docs, width, text_col, id_col)
    # The FILTERED hash counts (only spans in >= min_docs docs survive — a
    # tiny fraction of the window stream) are materialized ONCE: the r6
    # shape re-derived this aggregate as two separate plan subtrees (the
    # tie threshold and the candidate filter), and AQE exchange reuse only
    # shared the shuffle BELOW the aggregate — the O(total chars) window
    # explode and the two-level counting agg each ran twice per execution
    # (visible as duplicate Generate+HashAggregate chains in the r6 plan).
    # One lineage truncation of the small filtered table feeds both
    # consumers; the only remaining O(chars) work is the single counting
    # pass plus the narrow recount below (guide §5: materialise when
    # recomputing costs more).
    counts = _truncate_lineage(_span_hash_counts(spans, min_docs))
    # The tie-inclusive threshold (the top_k-th (n_docs, n_occ)) stays a
    # 1-row aggregate broadcast-joined back onto counts.  An empty corpus
    # gives an empty threshold row, hence an empty candidate set and an
    # empty (same-schema) result.
    thr = (counts.orderBy(F.col("n_docs").desc(), F.col("n_occ").desc())
           .limit(top_k)
           .agg(F.min(F.struct("n_docs", "n_occ")).alias("m"))
           .where(F.col("m").isNotNull()))
    cand = F.broadcast(
        counts.crossJoin(F.broadcast(thr))
        .where(F.struct("n_docs", "n_occ") >= F.col("m"))
        .select("h"))
    exact = spans.join(cand, F.xxhash64("span") == F.col("h"), "left_semi")
    return (exact.groupBy("span")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_occ"))
            .where(F.col("n_docs") >= min_docs)
            .orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "span")
            .limit(top_k))


def ws_collapsed(col: Column) -> Column:
    """Whitespace-collapsed, CASE-PRESERVED text — the canonical form the
    exact-substring removal operates on.  Deliberately not lowercased:
    Lee et al. 2021 match raw bytes, and a dedup stage must not destroy
    case information corpus-wide as a side effect (code-review r6)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _dup_window_positions(docs: DataFrame, width: int, min_docs: int,
                          text_col: str, id_col: str) -> DataFrame:
    """(doc_id, pos): 1-based positions (in the whitespace-collapsed text) of
    width-char windows occurring in >= min_docs distinct documents, MINUS the
    single canonical occurrence per window — min (doc_id, pos) keeps its
    copy, every other occurrence is marked for removal (Lee et al. 2021
    semantics: duplicated spans survive exactly once in the corpus).

    Scale shape: the counting agg and the position join are keyed by a
    128-bit double-xxhash64 of the window — fixed 16-byte shuffle keys,
    never text.  Two independent 64-bit hashes must BOTH collide for a
    false removal (~2^-128 per pair — the same hash-equality doctrine as
    the md5-keyed exact_dedup_groups); a single 64-bit key was judged too
    weak for a path that REWRITES corpus text (~10^14 windows at the
    100 TB design point → ~10^8 expected 64-bit collisions)."""
    from .skew import ensure_min_parallelism

    t = ws_collapsed(F.col(text_col))
    # no materialization barrier needed: the position explode keeps the
    # collapse regex per-DOC (see _span_windows); the round-robin fires only
    # on too-few scan splits.  The r6 full-text repartition("doc_id") is
    # gone — the ONLY corpus-wide exchange left in this operator is the
    # 16-byte (h1, h2) repartition below.
    staged = (ensure_min_parallelism(docs)
              .select(F.col(id_col).alias("doc_id"), t.alias("t")))
    n_wins = F.greatest(F.length("t") - F.lit(width - 1), F.lit(0))

    # ONE corpus-wide exchange: the window stream is hashed by (h1, h2)
    # once; the per-(window, doc) agg (grouping is a superset of the
    # partitioning), the per-window agg, and the removal join (same key) are
    # all satisfied by that partitioning, so the explode runs once and no
    # further 25M-row shuffle exists.  The shuffle still carries only the
    # 16-byte double hash + (doc_id, pos) — never text (the r6 pinned
    # contract).  The explode emits POSITIONS and the two hashes are
    # computed per exploded row from one shared substring (codegen CSE) —
    # the old shape materialized the whole array of (h1, h2) structs per
    # doc before exploding it (guide §1.2: pure allocation).
    win = F.col("t").substr(F.col("pos"), F.lit(width))
    occ = (staged.where(n_wins > 0)
           .select("doc_id", "t",
                   F.explode(F.sequence(F.lit(1), n_wins)).alias("pos"))
           .select("doc_id", F.col("pos").cast("int").alias("pos"),
                   F.xxhash64(win).alias("h1"),
                   F.xxhash64(F.lit(0x9E3779B9), win).alias("h2"))
           .repartition("h1", "h2"))
    # The dup aggregation must stay HASH-aggregable end to end: the original
    # one-shot `countDistinct(doc_id), min(struct(doc_id, pos))` compiled to
    # SortAggregates (struct min has no mutable buffer) — two full sorts of
    # the O(total chars) window stream, 17.2 s of this operator's 20.6 s at
    # sf1.0.  Replaced by (a) a per-(window, doc) min-pos level whose count
    # IS the distinct-doc count, and (b) a canonical occurrence encoded as
    # ONE decimal(38,0) = doc_id·2³² + pos — order-isomorphic to the
    # (doc_id, pos) struct (0 ≤ pos < 2³² and |doc_id·2³²| < 2⁹⁵ ≪ 10³⁸,
    # exact integer arithmetic), and decimals have fixed-width mutable agg
    # buffers, so every aggregate runs as a HashAggregate.  Numeric ids only
    # (this corpus); non-numeric ids keep the generic struct form.
    if dict(docs.dtypes)[id_col] in ("tinyint", "smallint", "int", "bigint"):
        enc = (F.col("doc_id").cast("decimal(38,0)") * F.lit(1 << 32)
               + F.col("pos"))
        per_doc = (occ.groupBy("h1", "h2", "doc_id")
                   .agg(F.min("pos").alias("pos")))
        # SHUFFLE_HASH build on the dup side (r7, guide §3.1): both sides
        # share occ's (h1, h2) partitioning via exchange reuse, and dup
        # (aggregated + filtered to >= min_docs windows) is the small side
        # per partition at any scale — the hint pins the join sort-free
        # where a sort-merge fallback would SORT the O(total chars) window
        # stream once dup outgrows the broadcast threshold (measured
        # equal-or-better locally; the point is the 100 TB plan shape).
        dup = (per_doc.groupBy("h1", "h2")
               .agg(F.count("*").alias("n_docs"), F.min(enc).alias("cenc"))
               .where(F.col("n_docs") >= min_docs)
               .select("h1", "h2", "cenc")
               .hint("shuffle_hash"))
        return (occ.join(dup, ["h1", "h2"])
                .where(enc != F.col("cenc"))
                .select("doc_id", "pos"))
    dup = (occ.groupBy("h1", "h2")
           .agg(F.countDistinct("doc_id").alias("n_docs"),
                F.min(F.struct("doc_id", "pos")).alias("canon"))
           .where(F.col("n_docs") >= min_docs)
           .select("h1", "h2", "canon"))
    return (occ.join(dup, ["h1", "h2"])
            .where(~((F.col("doc_id") == F.col("canon.doc_id"))
                     & (F.col("pos") == F.col("canon.pos"))))
            .select("doc_id", "pos"))


def exact_substring_clean(docs: DataFrame, width: int = 24, min_docs: int = 2,
                          text_col: str = "text", id_col: str = "doc_id"
                          ) -> DataFrame:
    """EXACT-SUBSTRING dedup, completed (VERDICT r5 #5; Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): the
    repeated-window candidates are extended to MAXIMAL duplicated spans —
    per doc, overlapping/adjacent flagged windows [pos, pos+width) merge
    into intervals — and a removal pass cuts those intervals out of the
    text, keeping the canonical first occurrence corpus-wide.

    Keep-one caveat (ADVICE r6): the canonical occurrence is chosen
    independently PER width-char WINDOW (min (doc_id, pos)), not per
    maximal span — when a duplicated passage's windows also occur in other
    contexts, different windows' canonicals can land in different docs and
    every complete copy of the passage may be partially cut, i.e. the
    guarantee is weaker than Lee et al.'s keep-one-occurrence-per-span: a
    passage whose windows are shared with other contexts may survive
    nowhere intact.

    The rule operates on the WHITESPACE-COLLAPSED, CASE-PRESERVED text:
    matching is case-sensitive exactly as the paper's raw-byte suffix-array
    matching, and case survives the rewrite (lowercasing a training corpus
    as a dedup side effect destroys signal — code-review r6).  Docs with
    nothing to remove pass through VERBATIM (original whitespace included);
    affected docs come back in the collapsed form their cut positions are
    defined in.

    Returns EVERY input doc: (doc_id, text_clean, n_spans_removed,
    chars_removed).  All interval math is pure Catalyst expressions over
    the per-doc sorted position array (positions are bounded by doc
    length, so the array is no bigger than the text it describes):
    consecutive positions p, q with q - p > width start a new interval;
    union length = width + Σ least(q - p, width); the kept text is the
    head before the first removal, the between-interval gaps, and the
    tail — cursor after each window is monotone (pos sorted), so every
    kept gap is substring(t, p + width, max(q - p - width, 0))."""
    rm = _dup_window_positions(docs, width, min_docs, text_col, id_col)
    ps_df = (rm.groupBy("doc_id")
             .agg(F.sort_array(F.collect_list("pos")).alias("ps")))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("orig"),
                       ws_collapsed(F.col(text_col)).alias("t"))
    j = base.join(ps_df, "doc_id", "left")
    w = int(width)
    expr_n = (
        "CASE WHEN ps IS NULL THEN 0 ELSE 1 + IF(size(ps) > 1, "
        "aggregate(sequence(2, size(ps)), 0, (a, i) -> "
        f"a + IF(element_at(ps, i) - element_at(ps, i - 1) > {w}, 1, 0)), 0) "
        "END")
    expr_chars = (
        f"CASE WHEN ps IS NULL THEN CAST(0 AS BIGINT) ELSE "
        f"CAST({w} AS BIGINT) + IF(size(ps) > 1, "
        f"aggregate(sequence(2, size(ps)), CAST(0 AS BIGINT), (a, i) -> "
        f"a + CAST(least(element_at(ps, i) - element_at(ps, i - 1), {w}) "
        f"AS BIGINT)), CAST(0 AS BIGINT)) END")
    expr_clean = (
        "CASE WHEN ps IS NULL THEN orig ELSE concat("
        "substring(t, 1, element_at(ps, 1) - 1), "
        "IF(size(ps) > 1, concat_ws('', transform(sequence(2, size(ps)), "
        f"i -> substring(t, element_at(ps, i - 1) + {w}, "
        f"greatest(element_at(ps, i) - element_at(ps, i - 1) - {w}, 0)))), "
        f"''), substring(t, element_at(ps, -1) + {w})) END")
    return j.select("doc_id",
                    F.expr(expr_clean).alias("text_clean"),
                    F.expr(expr_n).cast("int").alias("n_spans_removed"),
                    F.expr(expr_chars).alias("chars_removed"))


def minhash_band_keys_expr(text: Column, shingle_n: int = 3,
                           num_hashes: int = 16, bands: int = 4) -> Column:
    """Per-row MinHash band keys — NO aggregation, so a STREAMING source can
    band its documents statelessly (the agg shape would be a stateful
    streaming aggregation needing watermark/output-mode machinery).

    Bit-identical to minhash_signatures_agg + minhash_band_key_array
    (pinned by tests/test_round5_fixes.py): per hash i, min over the shingle
    array of md5('i:' || shingle), then the shared 'b|mh|mh|..' band format.
    NULL when the document has no shingles — the agg path emits no row for
    those docs, so both shapes contribute nothing to a band join.

    The md5 work is identical to the agg path (16 × n_shingles either way);
    the shingle-array expression is inlined into each of the 16 folds (the
    documented Catalyst inlining behavior), re-running tokenization 16× per
    row — acceptable for per-document streaming ingest, NOT the shape to
    batch-scan 100 TB with (use minhash_signatures_agg there).

    Composition of the existing minhash_signature + minhash_band_keys
    helpers — the band-key format stays defined in exactly one place."""
    sh = token_shingles(text, shingle_n)
    keys = minhash_band_keys(minhash_signature(sh, num_hashes), bands,
                             num_hashes // bands)
    return F.when(F.size(sh) > 0, keys)


def reference_band_index(ref_docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", shingle_n: int = 3,
                         num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """(ref_id, band_key) — the stored-at-rest band index of an already-
    ingested corpus (computed ONCE via the scalable agg path; at production
    scale this table is persisted and bucketed by band_key)."""
    sigs = minhash_signatures_agg(ref_docs, text_col, id_col, shingle_n,
                                  num_hashes)
    return sigs.select(F.col("doc_id").alias("ref_id"),
                       F.explode(minhash_band_key_array(num_hashes, bands))
                       .alias("band_key"))
