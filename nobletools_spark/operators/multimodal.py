"""Multimodal (image/audio/video) column plumbing for the interleaved
documents table. Media spans (kind='media', media_ref) are carried
through the KG pipeline untouched (per-row span invariant); this module
gives them a typed side-table and the decode / feature-extract / resize /
frame-sample operators a training-data pipeline needs.

Design: media payloads are opaque ``binary`` columns with typed metadata
(media_type, width/height/duration where known). All heavy work runs in
Arrow-batched ``mapInPandas`` — one Python worker call per batch of
media rows, the right shape for multi-GB media partitions. The actual
codec calls are STUBBED in this environment (no PIL/ffmpeg in the
container): ``decoder='fake'`` produces deterministic bytes-derived
outputs so the plumbing (schemas, batching, partitioning, joins) is real
and tested; ``decoder='pil'``/'ffmpeg' raise NotImplementedError unless
the library import succeeds on the executor.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_DDL = ("media_ref string, media_type string, content binary, "
             "metadata map<string,string>")

FEATURES_DDL = ("media_ref string, media_type string, feature array<float>, "
                "width int, height int")

FRAMES_DDL = ("media_ref string, frame_idx int, frame binary, ts_ms int")

_FEATURE_DIM = 16


def media_table_from_docs(docs_df: DataFrame) -> DataFrame:
    """Derive the typed media side-table from interleaved documents:
    one row per media span, deterministic fake payload derived from the
    media_ref (content would come from object storage at scale — the
    fetch is a mapInPandas stage keyed by media_ref, not shown here)."""
    refs = (docs_df
            .select(F.explode("spans").alias("s"))
            .filter(F.col("s.kind") == "media")
            .select(F.col("s.media_ref").alias("media_ref"))
            .distinct())
    return refs.select(
        "media_ref",
        F.element_at(F.split("media_ref", "//"), 2).alias("_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.concat(F.lit("payload:"), F.col("media_ref")), "UTF-8")
         .alias("content"),
        F.create_map(F.lit("origin"), F.col("media_ref")).alias("metadata"),
    ).drop("_id")


def _fake_decode(content: bytes) -> tuple[int, int, bytes]:
    """Deterministic stand-in for an image codec: dimensions and pixel
    bytes derived from a content digest. STUB — replace with PIL decode
    on a cluster image that has it."""
    d = hashlib.md5(content or b"").digest()
    width = 16 + d[0] % 16
    height = 16 + d[1] % 16
    pixels = (d * ((width * height) // len(d) + 1))[: width * height]
    return width, height, pixels


def decode_media(media_df: DataFrame, decoder: str = "fake") -> DataFrame:
    """(media_ref, media_type, width, height, pixels binary) via
    mapInPandas. decoder='pil' requires PIL on executors."""
    if decoder not in ("fake", "pil"):
        raise ValueError(decoder)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "decoder='pil' needs Pillow on executors; use "
                    "decoder='fake' in this environment") from e
        for pdf in batches:
            rows = []
            for ref, mtype, content in zip(pdf["media_ref"],
                                           pdf["media_type"], pdf["content"]):
                w, h, px = _fake_decode(bytes(content) if content is not None
                                        else b"")
                rows.append((ref, mtype, w, h, px))
            yield pd.DataFrame(rows, columns=["media_ref", "media_type",
                                              "width", "height", "pixels"])

    return media_df.select("media_ref", "media_type", "content").mapInPandas(
        fn, "media_ref string, media_type string, width int, height int, "
            "pixels binary")


def extract_features(media_df: DataFrame, dim: int = _FEATURE_DIM) -> DataFrame:
    """Deterministic feature vector per media row (mapInPandas, Arrow
    batches) — the embedding-extraction stage shape; the fake extractor
    hashes content into `dim` floats in [0,1)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, mtype, content in zip(pdf["media_ref"],
                                           pdf["media_type"], pdf["content"]):
                w, h, _ = _fake_decode(bytes(content) if content is not None
                                       else b"")
                d = hashlib.sha256(bytes(content or b"")).digest()
                feat = [d[i % len(d)] / 256.0 for i in range(dim)]
                rows.append((ref, mtype, feat, w, h))
            yield pd.DataFrame(rows, columns=["media_ref", "media_type",
                                              "feature", "width", "height"])

    return media_df.select("media_ref", "media_type", "content") \
        .mapInPandas(fn, FEATURES_DDL)


def sample_frames(media_df: DataFrame, every_ms: int = 1000,
                  max_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing for video rows (stub codec): emits up to
    ``max_frames`` deterministic frames per media row — a row-expanding
    mapInPandas (the real ffmpeg-backed version has the same shape)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                d = hashlib.md5(bytes(content or b"")).digest()
                n = 1 + d[2] % max_frames
                for i in range(n):
                    frame = hashlib.md5(d + bytes([i])).digest()
                    rows.append((ref, i, frame, i * every_ms))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx",
                                              "frame", "ts_ms"])

    return media_df.select("media_ref", "content").mapInPandas(fn, FRAMES_DDL)


def media_concept_triples(docs_df: DataFrame, mentions_df: DataFrame) -> DataFrame:
    """(media_ref, 'illustrates-concept', cui): connect media spans to
    the concepts mentioned in the same document — the multimodal edge of
    the KG. Broadcast-friendly: the exploded media side is tiny relative
    to mentions."""
    media = (docs_df.select("doc_id", F.explode("spans").alias("s"))
             .filter(F.col("s.kind") == "media")
             .select("doc_id", F.col("s.media_ref").alias("media_ref")))
    dc = mentions_df.select("doc_id", "cui").distinct()
    return (media.join(dc, "doc_id")
            .select(F.col("media_ref").alias("subj"),
                    F.lit("illustrates-concept").alias("pred"),
                    F.col("cui").alias("obj"))
            .distinct())
