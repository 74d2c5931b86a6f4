"""Multimodal span processing: image/audio/video as opaque binary + metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas signatures,
partitioning) is real and tested; the codec kernels are stubbed behind
import-guards because no image/audio libraries ship in this container —
`decode_stub=True` substitutes a deterministic fake so the dataflow is
exercisable end-to-end.

At 100 TB the pattern is: media bytes live in object storage referenced by
``media_ref``; this stage maps metadata + (optionally inlined) bytes through
Arrow batches, emitting fixed-size feature rows — the shuffle only ever sees
features, never raw media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = (
    "doc_id string, media_ref string, media_kind string, "
    "byte_len bigint, content_sha int, width int, height int, "
    "n_frames int, feature array<float>, decode_error string"
)

_FEATURE_DIM = 8


def _fake_decode(ref: str, kind: str) -> dict:
    """Deterministic stand-in for a real decoder (PIL/ffmpeg not available).

    Derives stable pseudo-metadata from the media_ref hash so tests are
    reproducible.  A real deployment replaces ONLY this function.
    """
    h = hashlib.sha256((ref or "").encode()).digest()
    return {
        "width": 64 + h[0] % 192 if kind in ("image", "figure") else None,
        "height": 64 + h[1] % 192 if kind in ("image", "figure") else None,
        "n_frames": 1 + h[2] % 300 if kind == "video" else None,
        "feature": [round(b / 255.0, 6) for b in h[:_FEATURE_DIM]],
    }


def _decode_real(ref: str, kind: str) -> dict:
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decode requires imaging/audio libraries not present "
            "in this environment; use decode_stub=True") from e
    raise NotImplementedError("real decoder wiring is deployment-specific")


def extract_media_features(media_rows: DataFrame, decode_stub: bool = True) -> DataFrame:
    """(doc_id, media_ref, kind) rows → feature rows via Arrow-batched mapInPandas."""
    decode = _fake_decode if decode_stub else _decode_real

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "media_ref", "media_kind", "byte_len",
                                    "content_sha", "width", "height", "n_frames",
                                    "feature", "decode_error")}
            for doc_id, ref, kind in zip(pdf["doc_id"], pdf["media_ref"], pdf["kind"]):
                rows["doc_id"].append(doc_id)
                rows["media_ref"].append(ref)
                rows["media_kind"].append(kind)
                rows["byte_len"].append(len(ref or ""))
                rows["content_sha"].append(
                    int.from_bytes(hashlib.sha256((ref or "").encode()).digest()[:3], "big"))
                try:
                    meta = decode(ref, kind)
                    rows["width"].append(meta["width"])
                    rows["height"].append(meta["height"])
                    rows["n_frames"].append(meta["n_frames"])
                    rows["feature"].append(meta["feature"])
                    rows["decode_error"].append(None)
                except NotImplementedError as e:
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["n_frames"].append(None)
                    rows["feature"].append(None)
                    rows["decode_error"].append(str(e))
            out = pd.DataFrame(rows)
            for c in ("width", "height", "n_frames", "content_sha"):
                out[c] = out[c].astype("Int32")
            yield out

    return media_rows.mapInPandas(kernel, schema=MEDIA_FEATURES_SCHEMA)


RESIZED_SCHEMA = ("doc_id string, media_ref string, media_kind string, "
                  "out_width int, out_height int, resized_sha string, decode_error string")

FRAMES_SCHEMA = ("doc_id string, media_ref string, media_kind string, "
                 "frame_idx int, frame_sha string")


def resize_media(media_rows: DataFrame, width: int = 224, height: int = 224,
                 decode_stub: bool = True) -> DataFrame:
    """Resize kernel plumbing (brief: 'decode / feature-extract / resize /
    frame-sample as Pandas UDFs over mapInPandas').  The pixel work is the
    deterministic stub (no imaging libs in this container); the Arrow batch
    shape, schema and partitioning are the real deployment surface —
    a real deployment swaps ONLY the per-ref body."""
    if not decode_stub:
        _decode_real("", "image")  # raises NotImplementedError with guidance

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "media_ref", "media_kind",
                                   "out_width", "out_height", "resized_sha",
                                   "decode_error")}
            for doc_id, ref, kind in zip(pdf["doc_id"], pdf["media_ref"], pdf["kind"]):
                out["doc_id"].append(doc_id)
                out["media_ref"].append(ref)
                out["media_kind"].append(kind)
                out["out_width"].append(width)
                out["out_height"].append(height)
                out["resized_sha"].append(
                    hashlib.sha256(f"{ref or ''}|{width}x{height}".encode()).hexdigest())
                out["decode_error"].append(None)
            o = pd.DataFrame(out)
            o["out_width"] = o["out_width"].astype("Int32")
            o["out_height"] = o["out_height"].astype("Int32")
            yield o

    return media_rows.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def sample_frames(media_rows: DataFrame, every_n: int = 30,
                  decode_stub: bool = True) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    Frame counts come from the same deterministic stub metadata the feature
    kernel uses (video → 1 + sha[2] % 300 frames; stills → 1 frame), so the
    fan-out shape — a 300-frame video becomes ~10 rows — is exercised for
    real even though the decoded pixels are stubbed."""
    if not decode_stub:
        _decode_real("", "video")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "media_ref", "media_kind",
                                   "frame_idx", "frame_sha")}
            for doc_id, ref, kind in zip(pdf["doc_id"], pdf["media_ref"], pdf["kind"]):
                h = hashlib.sha256((ref or "").encode()).digest()
                n_frames = 1 + h[2] % 300 if kind == "video" else 1
                for idx in range(0, n_frames, every_n):
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(ref)
                    out["media_kind"].append(kind)
                    out["frame_idx"].append(idx)
                    out["frame_sha"].append(
                        hashlib.sha256(f"{ref or ''}#frame{idx}".encode()).hexdigest())
            o = pd.DataFrame(out)
            o["frame_idx"] = o["frame_idx"].astype("Int32")
            yield o

    return media_rows.mapInPandas(kernel, schema=FRAMES_SCHEMA)


def media_spans(docs: DataFrame) -> DataFrame:
    """Pull media spans out of the documents table (native explode + filter)."""
    from .parse import MEDIA_KINDS, explode_docs

    return (explode_docs(docs)
            .where(F.col("kind").isin(*MEDIA_KINDS))
            .select("doc_id", "media_ref", "kind"))
