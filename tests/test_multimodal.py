"""Multimodal plumbing tests: binary payload column, metadata struct,
mapInPandas decode stage (stubbed codec, deterministic fake)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_resize_stub_contract():
    from arcon_spark.functions.multimodal import resize_dims_stub

    assert resize_dims_stub(448, 224) == (224, 112)
    assert resize_dims_stub(224, 448) == (112, 224)
    assert resize_dims_stub(1, 10000) == (1, 224)  # floor clamps to >= 1
    assert resize_dims_stub(224, 224) == (224, 224)


def test_frame_sample_python_path_matches_jvm(spark, sf_dir):
    """A mapInPandas frame sampler (the shape a real video decoder
    plugs into) must agree with the registered JVM sequence+explode
    form."""
    from collections.abc import Iterator

    import pandas as pd

    from arcon_spark.functions.multimodal import (
        FRAME_STRIDE,
        media_frame,
        multimodal_frame_sample,
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload, digest in zip(
                pdf["doc_id"], pdf["payload"], pdf["digest"]
            ):
                n_frames = 1 + len(payload) % 16
                for f in range(0, n_frames, FRAME_STRIDE):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "n_frames": n_frames,
                            "frame_idx": f,
                            "frame_digest": hashlib.md5(
                                f"{digest}:{f}".encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    mf = media_frame(spark, sf_dir).select(
        "doc_id", "payload", F.col("meta.digest").alias("digest")
    )
    py = {
        (r.doc_id, r.frame_idx): (r.n_frames, r.frame_digest)
        for r in mf.mapInPandas(
            _sample,
            "doc_id long, n_frames int, frame_idx int, frame_digest string",
        ).collect()
    }
    jvm = {
        (r.doc_id, r.frame_idx): (r.n_frames, r.frame_digest)
        for r in multimodal_frame_sample(spark, sf_dir).collect()
    }
    assert py == jvm and len(py) > 0


def test_sniff_media_magic_bytes():
    from arcon_spark.functions.codecs import (
        h264_encode_ipcm,
        jpeg_encode_gray,
        png_encode,
        wav_encode,
    )
    from arcon_spark.functions.multimodal import decode_media_info, sniff_media

    png = png_encode(b"\x01\x02\x03" * 48, 48, 1, color_type=2, filter_type=0)
    jpg = jpeg_encode_gray(bytes(range(64)) * 2, 16, 8)
    wav = wav_encode(b"\x00\x01" * 8)
    vid = h264_encode_ipcm([b"\xaa" * 512], 32, 16)
    assert sniff_media(png) == "png"
    assert sniff_media(jpg) == "jpeg"
    assert sniff_media(wav) == "wav"
    assert sniff_media(vid) == "h264"
    assert sniff_media(b"plain text") == "unknown"
    # dispatch decodes the real containers, not the fake
    assert decode_media_info(png)["width"] == 48
    assert decode_media_info(jpg)["height"] == 8
    assert decode_media_info(wav)["n_frames"] == 8
    assert decode_media_info(vid)["content"] == b"\xaa" * 512
