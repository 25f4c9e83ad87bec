"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested. The codec itself is STUBBED: real decoders
(Pillow/ffmpeg/torchaudio) are not in this environment, so the default
``codec`` is a deterministic fake that parses the tiny self-describing
header produced by ``synthesize_media`` and derives features from the
payload bytes. Swap ``codec=RealImageCodec()`` (implementing the same
three methods) when the libraries exist; ``StubCodec`` raises
``NotImplementedError`` for genuinely external formats.

Schema:
  media(media_id:int64, kind:string{image,audio,video}, payload:binary,
        meta:struct<width:int32, height:int32, sample_rate:int32,
                    n_frames:int32, codec:string>)

Stages:
- ``DecodeActor``      -> + decoded_ok:bool, width/height/... validated
- ``FeatureActor``     -> + feature:list<float32>[dim] (pooled payload stats)
- ``ResizeActor``      -> payload replaced by deterministic resized bytes
- ``FrameSampleActor`` -> video rows exploded to one row per sampled frame

Large binary payloads => small ``batch_size`` (callers pass it; tests
cover a multi-MB payload in a batch of 4).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"NSEM"  # fake self-describing header: MAGIC kind w h sr nf

META_TYPE = pa.struct([
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("n_frames", pa.int32()),
    ("codec", pa.string()),
])

KINDS = ("image", "audio", "video")


def synthesize_media(media_id: int, kind: str, size_bytes: int = 4096) -> dict:
    """Deterministic fake media row (header + pseudo-random payload)."""
    rng = np.random.RandomState(media_id % (2**31))
    w, h = (16 + media_id % 64) * 8, (9 + media_id % 32) * 8
    sr = 16000 if kind == "audio" else 0
    nf = 1 + media_id % 48 if kind == "video" else (1 if kind == "image" else 0)
    header = MAGIC + struct.pack("<BIIII", KINDS.index(kind), w, h, sr, nf)
    body = rng.bytes(max(0, size_bytes - len(header)))
    return {
        "media_id": media_id,
        "kind": kind,
        "payload": header + body,
        "meta": {"width": w, "height": h, "sample_rate": sr,
                 "n_frames": nf, "codec": "nsem-fake"},
    }


def media_table(n: int, size_bytes: int = 4096, huge_every: int = 0) -> pa.Table:
    rows = []
    for i in range(n):
        kind = KINDS[i % 3]
        sz = size_bytes * 512 if (huge_every and i % huge_every == 0) else size_bytes
        rows.append(synthesize_media(i, kind, sz))
    return pa.table({
        "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
        "kind": pa.array([r["kind"] for r in rows], pa.string()),
        "payload": pa.array([r["payload"] for r in rows], pa.binary()),
        "meta": pa.array([r["meta"] for r in rows], META_TYPE),
    })


class StubCodec:
    """Deterministic fake codec for the NSEM header format. Real
    formats raise NotImplementedError (decode libraries absent)."""

    def decode(self, payload: bytes) -> dict:
        if not payload.startswith(MAGIC):
            raise NotImplementedError(
                "real media decoding requires Pillow/ffmpeg (not in this env)"
            )
        kind_i, w, h, sr, nf = struct.unpack("<BIIII", payload[4:21])
        return {"kind": KINDS[kind_i], "width": w, "height": h,
                "sample_rate": sr, "n_frames": nf,
                "body": payload[21:]}

    def features(self, decoded: dict, dim: int) -> np.ndarray:
        body = decoded["body"][:65536]
        seed = int.from_bytes(hashlib.blake2b(body, digest_size=4).digest(), "little")
        v = np.random.RandomState(seed).standard_normal(dim)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def resize(self, decoded: dict, width: int, height: int) -> bytes:
        header = MAGIC + struct.pack(
            "<BIIII", KINDS.index(decoded["kind"]), width, height,
            decoded["sample_rate"], decoded["n_frames"],
        )
        # deterministic downsample of the body proportional to area change
        scale = max(1, (decoded["width"] * decoded["height"]) // max(1, width * height))
        return header + decoded["body"][::scale]

    def sample_frames(self, decoded: dict, every: int) -> list[int]:
        return list(range(0, max(1, decoded["n_frames"]), every))


class DecodeActor:
    """Validate/decode payloads; per-row failure tolerance."""

    def __init__(self, codec=None):
        self.codec = codec or StubCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok, widths, heights = [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                d = self.codec.decode(payload)
                ok.append(True)
                widths.append(d["width"])
                heights.append(d["height"])
            except Exception:
                ok.append(False)
                widths.append(None)
                heights.append(None)
        return (
            batch.append_column("decoded_ok", pa.array(ok, pa.bool_()))
            .append_column("dec_width", pa.array(widths, pa.int32()))
            .append_column("dec_height", pa.array(heights, pa.int32()))
        )


class FeatureActor:
    def __init__(self, dim: int = 32, codec=None):
        self.dim = dim
        self.codec = codec or StubCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            try:
                d = self.codec.decode(payload)
                feats.append(self.codec.features(d, self.dim))
            except Exception:
                feats.append(np.zeros(self.dim, dtype=np.float32))
        flat = np.concatenate([f for f in feats]) if feats else np.zeros(0, np.float32)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.float32()), self.dim
            ),
        })


class ResizeActor:
    def __init__(self, width: int = 64, height: int = 64, codec=None):
        self.width = width
        self.height = height
        self.codec = codec or StubCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, ok = [], []
        for payload in batch["payload"].to_pylist():
            try:
                d = self.codec.decode(payload)
                payloads.append(self.codec.resize(d, self.width, self.height))
                ok.append(True)
            except Exception:
                payloads.append(payload)
                ok.append(False)
        out = batch.set_column(
            batch.column_names.index("payload"), "payload",
            pa.array(payloads, pa.binary()),
        )
        return out.append_column("resized", pa.array(ok, pa.bool_()))


class FrameSampleActor:
    """Explode video rows to one row per sampled frame (flat_map-shaped
    batch transform); non-video rows pass through with frame_index 0."""

    def __init__(self, every: int = 8, codec=None):
        self.every = every
        self.codec = codec or StubCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, frames = [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                ids.append(mid)
                kinds.append(kind)
                frames.append(0)
                continue
            try:
                d = self.codec.decode(payload)
                for fi in self.codec.sample_frames(d, self.every):
                    ids.append(mid)
                    kinds.append(kind)
                    frames.append(fi)
            except Exception:
                ids.append(mid)
                kinds.append(kind)
                frames.append(-1)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "frame_index": pa.array(frames, pa.int32()),
        })
