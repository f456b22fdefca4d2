"""Multimodal (binary-column) stages.

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages with small batch sizes (large payloads × batch
size must fit the worker heap).

The image/audio codec libraries are not in this container, so the
decode kernels are STUBBED: they raise ``NotImplementedError`` unless
the optional library imports, with a deterministic fake available for
tests.  The Ray-side plumbing — schema, actor signature, batch sizing,
output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MULTIMODAL_SCHEMA = pa.schema(
    [
        pa.field("item_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("meta", pa.string()),  # JSON metadata sidecar
    ]
)


class BinaryFeatureExtractor:
    """Actor-pool stage: binary payload → cheap features (length, md5,
    and a deterministic pseudo-embedding derived from the digest).

    ``__init__`` is where a real model would load (once per actor);
    ``__call__`` only does per-batch work.
    """

    def __init__(self, embedding_dim: int = 16):
        self.dim = embedding_dim  # stand-in for model load

    def _pseudo_embedding(self, digest: bytes) -> list[float]:
        # deterministic stand-in for a real encoder forward pass
        raw = (digest * ((self.dim * 4) // len(digest) + 1))[: self.dim * 4]
        arr = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
        return (arr / np.iinfo(np.uint32).max).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        lens, md5s, embs = [], [], []
        for p in payloads:
            p = p or b""
            d = hashlib.md5(p)
            lens.append(len(p))
            md5s.append(d.hexdigest())
            embs.append(self._pseudo_embedding(d.digest()))
        out = pa.table(
            {
                "item_id": pc.cast(batch["item_id"], pa.int64()),
                "payload_len": pa.array(lens, pa.int64()),
                "payload_md5": pa.array(md5s, pa.string()),
                "embedding": pa.array(embs, pa.list_(pa.float64())),
            }
        )
        return out


class ImageDecoder:
    """Decode stub: real implementation requires PIL/cv2 (absent here).

    Output contract: ``(item_id, height, width, channels,
    pixels: binary)`` — the layout downstream resize/embed stages
    consume.  ``fake=True`` produces a deterministic 8×8 grey image from
    the payload digest so pipelines are testable end-to-end.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake
        self._pil = None
        if not fake:
            try:
                import PIL.Image  # noqa: F401

                self._pil = True
            except ImportError:
                self._pil = None

    def _decode(self, payload: bytes):
        if self.fake:
            d = hashlib.md5(payload or b"").digest()
            px = bytes(d * 4)  # 64 bytes → 8x8x1
            return 8, 8, 1, px
        if self._pil is None:
            raise NotImplementedError(
                "image decoding requires PIL, which is not available in this "
                "environment; construct ImageDecoder(fake=True) for the "
                "deterministic test double"
            )
        raise NotImplementedError("real decode path not exercised in this sandbox")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hs, ws, cs, px = [], [], [], [], []
        for item_id, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            h, w, c, pixels = self._decode(payload)
            ids.append(item_id)
            hs.append(h)
            ws.append(w)
            cs.append(c)
            px.append(pixels)
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "pixels": pa.array(px, pa.binary()),
            }
        )


class ImageResizer:
    """Resize stage over decoded pixel rows (``ImageDecoder`` output
    layout).  Real path needs PIL/cv2 (absent) → ``NotImplementedError``;
    ``fake=True`` does deterministic nearest-neighbor subsampling on the
    raw pixel buffer so the plumbing (schema in/out, batch sizing) runs
    end-to-end in tests.
    """

    def __init__(self, target_h: int = 4, target_w: int = 4, fake: bool = False):
        self.h, self.w = target_h, target_w
        self.fake = fake

    def _resize(self, h: int, w: int, c: int, pixels: bytes) -> bytes:
        if not self.fake:
            raise NotImplementedError(
                "image resize requires PIL/cv2, absent here; use "
                "ImageResizer(fake=True) for the deterministic test double"
            )
        arr = np.frombuffer(pixels, dtype=np.uint8)[: h * w * c].reshape(h, w, c)
        ys = np.linspace(0, h - 1, self.h).astype(int)
        xs = np.linspace(0, w - 1, self.w).astype(int)
        return arr[np.ix_(ys, xs)].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_px = [
            self._resize(h, w, c, p)
            for h, w, c, p in zip(
                batch["height"].to_pylist(),
                batch["width"].to_pylist(),
                batch["channels"].to_pylist(),
                batch["pixels"].to_pylist(),
            )
        ]
        n = batch.num_rows
        return pa.table(
            {
                "item_id": pc.cast(batch["item_id"], pa.int64()),
                "height": pa.array([self.h] * n, pa.int32()),
                "width": pa.array([self.w] * n, pa.int32()),
                "channels": batch["channels"],
                "pixels": pa.array(out_px, pa.binary()),
            }
        )


class FrameSampler:
    """Video frame-sample stage: opaque video ``payload`` → ``n_frames``
    evenly-spaced frame rows (one output row per frame — flat_map
    shape).  Real path needs a video codec (absent) →
    ``NotImplementedError``; ``fake=True`` derives deterministic
    fixed-size pseudo-frames from the payload digest + frame index.
    """

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decoding requires an absent codec library; use "
                "FrameSampler(fake=True) for the deterministic test double"
            )
        ids, fidx, frames = [], [], []
        for item_id, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            d = hashlib.md5(payload or b"").digest()
            for i in range(self.n):
                ids.append(item_id)
                fidx.append(i)
                frames.append(hashlib.md5(d + bytes([i])).digest() * 4)  # 8x8x1
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "height": pa.array([8] * len(ids), pa.int32()),
                "width": pa.array([8] * len(ids), pa.int32()),
                "channels": pa.array([1] * len(ids), pa.int32()),
                "pixels": pa.array(frames, pa.binary()),
            }
        )


def documents_as_binary(sf_dir: str):
    """Adapter: the documents table viewed as a multimodal binary corpus
    (utf-8 payloads) — exercises the binary plumbing with a payload the
    oracle can recompute (md5(text), length(text))."""

    def adapt(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        return pa.table(
            {
                "item_id": pc.cast(b["doc_id"], pa.int64()),
                "payload": pa.array([t.encode("utf-8") for t in texts], pa.binary()),
                "mime": pa.array(["text/plain"] * len(texts), pa.string()),
                "meta": pa.array(["{}"] * len(texts), pa.string()),
            }
        )

    from ..io import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        adapt, batch_format="pyarrow"
    )


def multimodal_features(sf_dir: str):
    """Binary corpus → actor-pool feature extraction (driver-checkable:
    payload_len/payload_md5 reproducible in SQL)."""
    ds = documents_as_binary(sf_dir)
    feats = ds.map_batches(
        BinaryFeatureExtractor, batch_format="pyarrow", concurrency=2, batch_size=256
    )
    return feats.map_batches(
        lambda b: b.select(["item_id", "payload_len", "payload_md5"]),
        batch_format="pyarrow",
    )
