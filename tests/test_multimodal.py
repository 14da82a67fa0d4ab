"""Multimodal plumbing tests: binary payload column, metadata struct,
mapInPandas decode stage (stubbed codec, deterministic fake)."""

from __future__ import annotations

import pytest

from arcon_spark.functions.multimodal import (
    decode_image_stub,
    decode_media,
    media_frame,
    multimodal_meta,
)


def test_media_frame_schema(spark, sf_dir):
    mf = media_frame(spark, sf_dir)
    dt = dict(mf.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<media_type:string,n_bytes:bigint,digest:string")


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"xx", deterministic_fake=False)


def test_mapinpandas_decode_matches_jvm_path(spark, sf_dir):
    """The Python mapInPandas decode and the JVM expression form must
    produce identical metadata (same deterministic-fake arithmetic)."""
    py = {
        r.doc_id: (r.n_bytes, r.width, r.height, r.n_frames)
        for r in decode_media(media_frame(spark, sf_dir)).collect()
    }
    jvm = {
        r.doc_id: (r.n_bytes, r.width, r.height, r.n_frames)
        for r in multimodal_meta(spark, sf_dir).collect()
    }
    assert py == jvm
    assert len(py) > 0
