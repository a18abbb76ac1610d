"""Multimodal plumbing: media side-table, stub decode/features/frames,
media-concept triples, and the span invariant under the full pipeline."""

import pytest

from nobletools_spark.model import MatchConfig
from nobletools_spark.operators.matcher import annotate, span_invariant_violations
from nobletools_spark.operators.multimodal import (
    decode_media,
    extract_features,
    media_concept_triples,
    media_table_from_docs,
    sample_frames,
)
from nobletools_spark.sources.fixtures import pytest_index, synthetic_corpus_df


@pytest.fixture(scope="module")
def docs(spark):
    return synthetic_corpus_df(spark, 80, seed=3, media_frac=0.5).cache()


@pytest.fixture(scope="module")
def media(spark, docs):
    return media_table_from_docs(docs).cache()


def test_media_table(spark, docs, media):
    rows = media.collect()
    assert rows
    r = rows[0]
    assert r.media_type == "image/fake" and isinstance(r.content, (bytes, bytearray))
    assert r.metadata["origin"] == r.media_ref


def test_decode_deterministic(spark, media):
    a = {r.media_ref: (r.width, r.height, bytes(r.pixels))
         for r in decode_media(media).collect()}
    b = {r.media_ref: (r.width, r.height, bytes(r.pixels))
         for r in decode_media(media).collect()}
    assert a == b and a
    for w, h, px in a.values():
        assert 16 <= w < 32 and 16 <= h < 32 and len(px) == w * h


def test_features_shape(spark, media):
    rows = extract_features(media, dim=16).collect()
    assert rows and all(len(r.feature) == 16 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r.feature)


def test_frame_sampling(spark, media):
    rows = sample_frames(media).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    assert all(1 <= len(v) <= 4 for v in by_ref.values())
    for v in by_ref.values():
        assert [f.frame_idx for f in sorted(v, key=lambda x: x.ts_ms)] == \
               list(range(len(v)))


def test_media_concept_triples(spark, docs, media):
    mentions = annotate(docs, pytest_index(), MatchConfig())
    t = media_concept_triples(docs, mentions)
    rows = t.collect()
    assert rows and all(r.pred == "illustrates-concept" for r in rows)
    # every subject is a real media_ref
    refs = {r.media_ref for r in media.collect()}
    assert {r.subj for r in rows} <= refs


def test_span_invariant_after_media_ops(spark, docs, media):
    # media processing never mutates the documents table
    decode_media(media).count()
    assert span_invariant_violations(docs, docs.select("doc_id", "spans")) == 0
