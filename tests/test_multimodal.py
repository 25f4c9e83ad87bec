"""Multimodal plumbing: schema, actor stages, batch sizing with a huge
payload, stubbed codec failure path."""

import numpy as np
import pyarrow as pa
import pytest

from neurostore_text_extraction_ray.stages.multimodal import (
    DecodeActor,
    FeatureActor,
    FrameSampleActor,
    ResizeActor,
    StubCodec,
    media_table,
    synthesize_media,
)


def test_media_table_schema():
    t = media_table(9)
    assert t.column_names == ["media_id", "kind", "payload", "meta"]
    assert t["meta"][0].as_py()["width"] > 0
    kinds = set(t["kind"].to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_stub_codec_roundtrip_and_stub_error():
    row = synthesize_media(5, "video")
    c = StubCodec()
    d = c.decode(row["payload"])
    assert d["kind"] == "video"
    assert d["width"] == row["meta"]["width"]
    with pytest.raises(NotImplementedError):
        c.decode(b"\x89PNG\r\n...real image bytes...")


def test_decode_actor_failure_tolerance():
    t = media_table(4)
    # corrupt one payload -> decoded_ok False, batch survives
    payloads = t["payload"].to_pylist()
    payloads[2] = b"JFIF not our format"
    t = t.set_column(2, "payload", pa.array(payloads, pa.binary()))
    out = DecodeActor()(t)
    assert out["decoded_ok"].to_pylist() == [True, True, False, True]
    assert out["dec_width"][2].as_py() is None


def test_feature_actor_deterministic():
    t = media_table(6)
    a = FeatureActor(dim=16)(t)
    b = FeatureActor(dim=16)(t)
    va = np.array(a["feature"].to_pylist())
    vb = np.array(b["feature"].to_pylist())
    assert va.shape == (6, 16)
    assert np.allclose(va, vb)
    assert np.allclose(np.linalg.norm(va, axis=1), 1.0, atol=1e-5)


def test_resize_actor_shrinks_payload():
    t = media_table(3, size_bytes=8192)
    out = ResizeActor(width=8, height=8)(t)
    assert out["resized"].to_pylist() == [True, True, True]
    for before, after in zip(t["payload"].to_pylist(), out["payload"].to_pylist()):
        assert len(after) < len(before)
    d = StubCodec().decode(out["payload"][0].as_py())
    assert (d["width"], d["height"]) == (8, 8)


def test_frame_sampler_explodes_video():
    t = media_table(6)
    out = FrameSampleActor(every=8)(t)
    by_kind = {}
    for mid, kind, fi in zip(out["media_id"].to_pylist(), out["kind"].to_pylist(),
                             out["frame_index"].to_pylist()):
        by_kind.setdefault(kind, []).append((mid, fi))
    assert all(fi == 0 for _, fi in by_kind["image"])
    assert all(fi == 0 for _, fi in by_kind["audio"])
    video_rows = by_kind["video"]
    assert len(video_rows) >= 2  # at least one video exploded to >1 frame


def test_pipeline_with_huge_payload(ray_session):
    """Multi-MB payload rides through a small batch actor-pool stage."""
    import ray.data as rd

    t = media_table(8, size_bytes=4096, huge_every=5)  # rows 0,5 are ~2MB
    # feed the pool >=2 blocks and autoscale (1,2) so it neither warns about
    # a single input nor pins a small cluster (CLAUDE.md deadlock rule)
    ds = rd.from_arrow([t.slice(0, 4), t.slice(4, 4)])
    out = (
        ds.map_batches(DecodeActor, batch_format="pyarrow", batch_size=4,
                       concurrency=(1, 2))
        .map_batches(FeatureActor, fn_constructor_kwargs={"dim": 8},
                     batch_format="pyarrow", batch_size=4, concurrency=(1, 2))
        .to_pandas()
    )
    assert len(out) == 8
    assert out.feature.map(len).eq(8).all()
