"""Multimodal (binary-column) stages.

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages with small batch sizes (large payloads × batch
size must fit the worker heap).

Decode support:

- **BMP (24-bit uncompressed) and PPM/PGM (P6/P5 binary)** are decoded
  by real pure-Python parsers (:func:`decode_bmp`, :func:`decode_ppm`)
  — no codec library needed, header fields / row padding / bottom-up
  row order handled for real.  Resize is a real nearest-neighbor numpy
  kernel.
- JPEG/PNG/video need codec libraries absent in this container, so
  those kernels raise ``NotImplementedError``; a deterministic fake is
  available for tests.  The Ray-side plumbing — schema, actor
  signature, batch sizing, output layout — is real and tested either
  way.
"""

from __future__ import annotations

import hashlib
import struct

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


def encode_bmp_gray(height: int, width: int, gray: bytes) -> bytes:
    """Encode a row-major grayscale buffer as a standard 24-bit
    uncompressed BMP (BITMAPINFOHEADER, 4-byte row padding, bottom-up
    rows, B=G=R=gray) — the synthesizer for the oracle-checkable decode
    pipeline and a real-format fixture generator for tests."""
    if len(gray) != height * width:
        raise ValueError("gray buffer size != height*width")
    row_len = width * 3
    pad = (4 - row_len % 4) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            g = gray[y * width + x]
            row += bytes((g, g, g))  # B G R
        row += b"\x00" * pad
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 14 + 40)
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """Real BMP parser: 24-bit uncompressed BITMAPINFOHEADER files →
    (height, width, 3, row-major top-down RGB bytes).  Handles the
    pixel-data offset, 4-byte row padding and bottom-up (or top-down,
    negative-height) row order."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); only 24-bit uncompressed here"
        )
    bottom_up = height_raw > 0
    height = abs(height_raw)
    row_len = width * 3
    stride = row_len + (4 - row_len % 4) % 4
    if len(payload) < data_offset + stride * height:
        raise ValueError("truncated BMP pixel data")
    buf = np.frombuffer(payload, dtype=np.uint8, count=stride * height,
                        offset=data_offset).reshape(height, stride)
    rows = buf[:, :row_len].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    rgb = rows[:, :, ::-1]  # BGR → RGB
    return height, width, 3, np.ascontiguousarray(rgb).tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Real PPM/PGM binary parser (P6 → RGB, P5 → gray): ASCII header
    with ``#`` comments, maxval ≤ 255, raw pixel body."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if payload[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            end = payload.find(b"\n", pos)
            pos = len(payload) if end < 0 else end + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = height * width * channels
    if len(payload) < pos + n:
        raise ValueError("truncated PPM pixel data")
    return height, width, channels, payload[pos : pos + n]


def sniff_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Dispatch on magic bytes: BMP / PPM / PGM are decoded for real;
    other formats (JPEG/PNG/...) need absent codec libraries."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    raise NotImplementedError(
        "only BMP/PPM/PGM decode in this environment (JPEG/PNG need "
        "codec libraries absent from the container)"
    )


class ImageDecoder:
    """Actor-pool decode stage.

    Output contract: ``(item_id, height, width, channels,
    pixels: binary)`` (row-major top-down) — the layout downstream
    resize/embed stages consume.  BMP/PPM/PGM payloads decode for real
    via :func:`sniff_decode`; ``fake=True`` instead produces a
    deterministic 8×8 grey image from the payload digest (for plumbing
    tests with arbitrary payloads).  ``on_error="skip"`` quarantines
    undecodable payloads (poison-image pattern, same design as the RDFa
    extractor's poison pages).
    """

    def __init__(self, fake: bool = False, on_error: str = "raise"):
        self.fake = fake
        self.on_error = on_error

    def _decode(self, payload: bytes):
        if self.fake:
            d = hashlib.md5(payload or b"").digest()
            px = bytes(d * 4)  # 64 bytes → 8x8x1
            return 8, 8, 1, px
        return sniff_decode(payload or b"")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hs, ws, cs, px = [], [], [], [], []
        for item_id, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                h, w, c, pixels = self._decode(payload)
            except (ValueError, NotImplementedError):
                if self.on_error == "raise":
                    raise
                continue  # poison image → quarantined (skipped)
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
    layout).  Real nearest-neighbor resampling (numpy index selection,
    ``np.linspace`` source grid) — no codec library needed.  ``fake``
    is retained for API compatibility and ignored (the kernel is real
    either way).
    """

    def __init__(self, target_h: int = 4, target_w: int = 4, fake: bool = False):
        self.h, self.w = target_h, target_w
        self.fake = fake

    def _resize(self, h: int, w: int, c: int, pixels: bytes) -> bytes:
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


def documents_as_bmp(sf_dir: str):
    """Adapter: a REAL image corpus derived deterministically from the
    documents table — each doc becomes an actual 24-bit BMP file whose
    8×8 grayscale content is ``md5(text).digest() * 4`` (so the DuckDB
    oracle can reconstruct every pixel from ``md5(text)``)."""

    def adapt(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        payloads = [
            encode_bmp_gray(8, 8, hashlib.md5(t.encode()).digest() * 4)
            for t in texts
        ]
        return pa.table(
            {
                "item_id": pc.cast(b["doc_id"], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(["image/bmp"] * len(texts), pa.string()),
                "meta": pa.array(['{"h":8,"w":8}'] * len(texts), pa.string()),
            }
        )

    from ..io import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        adapt, batch_format="pyarrow"
    )


def multimodal_decode(sf_dir: str, target: int = 4):
    """Real decode→resize pipeline: BMP corpus → actor-pool
    :class:`ImageDecoder` (real 24-bit BMP parse) → :class:`ImageResizer`
    (real nearest-neighbor) → (item_id, height, width, channels,
    pixels_hex).  Small ``batch_size``: payload bytes × batch ×
    concurrency must fit the worker heap (the multimodal sizing rule).
    """
    ds = documents_as_bmp(sf_dir)
    decoded = ds.map_batches(
        ImageDecoder, batch_format="pyarrow", concurrency=2, batch_size=128
    )
    resized = decoded.map_batches(
        ImageResizer,
        batch_format="pyarrow",
        concurrency=2,
        batch_size=128,
        fn_constructor_kwargs={"target_h": target, "target_w": target},
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "item_id": b["item_id"],
                "height": pc.cast(b["height"], pa.int32()),
                "width": pc.cast(b["width"], pa.int32()),
                "channels": pc.cast(b["channels"], pa.int32()),
                "pixels_hex": pa.array(
                    [p.hex() for p in b["pixels"].to_pylist()], pa.string()
                ),
            }
        )

    return resized.map_batches(finish, batch_format="pyarrow")


def multimodal_decode_oracle_sql(target: int = 4) -> str:
    """DuckDB reconstruction of :func:`multimodal_decode`: gray pixel i
    of the synthesized image is md5-digest byte ``i % 16``, nearest-
    neighbor source rows/cols are ``linspace(0,7,target).astype(int)``,
    and each output RGB pixel repeats the gray hex pair 3× — so
    ``pixels_hex`` is a fixed concatenation of ``substr(md5(text))``
    slices, generated here from the SAME index math numpy uses."""
    idx = np.linspace(0, 7, target).astype(int)
    parts = []
    for y in idx:
        for x in idx:
            j = int((y * 8 + x) % 16)  # digest byte for this pixel
            parts.extend([f"substr(md5(text), {2 * j + 1}, 2)"] * 3)  # R=G=B
    expr = " || ".join(parts)
    return f"""SELECT doc_id AS item_id,
       CAST({target} AS INTEGER) AS height, CAST({target} AS INTEGER) AS width,
       CAST(3 AS INTEGER) AS channels,
       {expr} AS pixels_hex
FROM documents"""


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
