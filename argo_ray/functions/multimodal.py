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
- **PNG (8-bit gray / gray+alpha / RGB / RGBA, non-interlaced)** is
  decoded for real by :func:`decode_png` — stdlib ``zlib`` inflate +
  all five scanline unfilters per the public PNG spec (RFC 2083);
  interlaced / 16-bit / palette variants quarantine.
- **Baseline JPEG (SOF0, 8-bit gray or YCbCr 4:4:4/4:2:2/4:2:0,
  restart intervals)** is decoded for real by
  :func:`argo_ray.functions.jpeg.decode_jpeg` — T.81 Huffman entropy
  decode + vectorized dequant/IDCT, standard Annex K tables;
  progressive / arithmetic / subsampled variants quarantine.
- Compressed video needs codec libraries absent in this container, so
  those kernels raise ``NotImplementedError``; a deterministic fake is
  available for tests.  The Ray-side plumbing — schema, actor
  signature, batch sizing, output layout — is real and tested either
  way.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .jpeg import decode_jpeg, encode_jpeg_gray

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only); palette (3) is
# one index sample per pixel, expanded through PLTE (+ tRNS → RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §6.6) over int32 arrays."""
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))


def encode_png(
    height: int,
    width: int,
    pixels: bytes,
    channels: int = 1,
    filter_type: int = 0,
) -> bytes:
    """Encode a row-major 8-bit pixel buffer as a real non-interlaced
    PNG (public spec, stdlib ``zlib`` only).  ``filter_type`` selects
    the scanline filter (0–4) applied to EVERY row — the fixture
    generator uses different values per item so the decoder's five
    unfilter paths are all exercised by real files."""
    if channels not in (1, 2, 3, 4):
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != height * width * channels:
        raise ValueError("pixel buffer size != height*width*channels")
    if filter_type not in range(5):
        raise ValueError(f"invalid PNG filter type {filter_type}")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, -1).astype(np.int32)
    stride = width * channels
    # forward filtering is recurrence-free (uses RAW neighbors), so the
    # whole image filters as vectorized shifts
    prev = np.vstack([np.zeros((1, stride), np.int32), img[:-1]])
    left = np.zeros_like(img)
    left[:, channels:] = img[:, :-channels]
    upleft = np.zeros_like(img)
    upleft[:, channels:] = prev[:, :-channels]
    if filter_type == 0:
        filt = img
    elif filter_type == 1:
        filt = img - left
    elif filter_type == 2:
        filt = img - prev
    elif filter_type == 3:
        filt = img - (left + prev) // 2
    else:
        filt = img - _paeth_vec(left, prev, upleft)
    filt = (filt % 256).astype(np.uint8)
    raw = b"".join(
        bytes((filter_type,)) + filt[y].tobytes() for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    height: int,
    width: int,
    indices: bytes,
    palette: bytes,
    trns: bytes | None = None,
) -> bytes:
    """Encode an 8-bit palettized PNG (color type 3): ``indices`` is
    the row-major index buffer, ``palette`` the PLTE RGB triples,
    ``trns`` optional per-entry alpha — the fixture generator for the
    decoder's palette-expansion path."""
    if len(indices) != height * width:
        raise ValueError("index buffer size != height*width")
    if not palette or len(palette) % 3 != 0:
        raise ValueError("palette must be non-empty RGB triples")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    raw = b"".join(
        b"\x00" + indices[y * width : (y + 1) * width] for y in range(height)
    )
    parts = [_PNG_SIG, _png_chunk(b"IHDR", ihdr), _png_chunk(b"PLTE", palette)]
    if trns is not None:
        parts.append(_png_chunk(b"tRNS", trns))
    parts.append(_png_chunk(b"IDAT", zlib.compress(raw)))
    parts.append(_png_chunk(b"IEND", b""))
    return b"".join(parts)


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Real PNG decoder: stdlib ``zlib`` inflate + per-scanline
    unfiltering (all five filter types) per the public spec →
    ``(height, width, channels, row-major top-down bytes)``.  Supports
    8-bit gray / gray+alpha / RGB / RGBA, non-interlaced; 16-bit,
    palette and Adam7-interlaced files raise ``ValueError`` into the
    poison-image quarantine.  Sub unfilters as a per-channel ``cumsum``
    and Up as one vectorized add; Average/Paeth walk pixel columns
    (vectorized across channels) because their recurrence reads the
    just-reconstructed left neighbor."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    plte, trns = None, None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, comp, filt_m, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color_type}); "
            "only 8-bit gray/gray+alpha/palette/RGB/RGBA here"
        )
    if color_type == 3 and (plte is None or len(plte) % 3 != 0 or not plte):
        raise ValueError("palette PNG missing/invalid PLTE chunk")
    if comp != 0 or filt_m != 0 or interlace != 0:
        raise ValueError("unsupported PNG compression/filter/interlace method")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    lines = np.frombuffer(
        raw, dtype=np.uint8, count=height * (stride + 1)
    ).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = int(lines[y, 0])
        row = lines[y, 1:].astype(np.int32)
        if f == 0:
            rec = row
        elif f == 1:  # Sub: prefix sum per channel offset
            rec = row.copy()
            for k in range(channels):
                rec[k::channels] = np.cumsum(row[k::channels]) % 256
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f in (3, 4):  # Average / Paeth: left-recurrence per pixel
            rpx = row.reshape(width, channels)
            ppx = prev.reshape(width, channels)
            rec_px = np.zeros_like(rpx)
            left = np.zeros(channels, dtype=np.int32)
            for x in range(width):
                if f == 3:
                    pred = (left + ppx[x]) // 2
                else:
                    ul = ppx[x - 1] if x else np.zeros(channels, np.int32)
                    pred = _paeth_vec(left, ppx[x], ul)
                left = (rpx[x] + pred) % 256
                rec_px[x] = left
            rec = rec_px.reshape(-1)
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = rec
        prev = rec
    pixels = out.astype(np.uint8)
    if color_type == 3:
        # palette expansion: index → PLTE RGB (+ tRNS alpha → RGBA)
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = pixels.reshape(-1)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette PNG index out of PLTE range")
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, np.uint8)
            t = np.frombuffer(trns, dtype=np.uint8)
            alpha[: len(t)] = t
            rgba = np.concatenate([rgb, alpha[idx][:, None]], axis=1)
            return height, width, 4, rgba.tobytes()
        return height, width, 3, rgb.tobytes()
    return height, width, channels, pixels.tobytes()


def sniff_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Dispatch on magic bytes: BMP / PPM / PGM / PNG are decoded for
    real; other formats (JPEG/...) need absent codec libraries."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    raise NotImplementedError(
        "only BMP/PPM/PGM/PNG/baseline-JPEG decode in this environment "
        "(video codecs need libraries absent from the container)"
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


# ---------------------------------------------------------------------------
# Audio: real RIFF/WAVE PCM-16 codec (no library needed)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(sample_rate: int, samples: np.ndarray) -> bytes:
    """int16 mono samples → standard RIFF/WAVE file (PCM fmt chunk +
    data chunk) — real-format fixture generator for the audio path."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real RIFF/WAVE parser: walks chunks (tolerating extras like
    LIST/fact), requires PCM 16-bit → (sample_rate, channels,
    int16 sample array).  Raises ``ValueError`` on non-PCM/invalid."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    rate = channels = bits = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only PCM-16 WAV supported (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, np.frombuffer(data, dtype="<i2")


class AudioFeatures:
    """Actor-pool stage: WAV payload → exact integer features
    (n_samples, sample_rate, sum of squared samples, peak) — integers so
    the oracle reconstructs them bit-exactly; a real spectral model
    would load in ``__init__`` the same way."""

    def __init__(self, on_error: str = "raise"):
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, rates, sums, peaks = [], [], [], [], []
        for item_id, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                rate, _, samples = decode_wav(payload or b"")
            except ValueError:
                if self.on_error == "raise":
                    raise
                continue
            s = samples.astype(np.int64)
            ids.append(item_id)
            ns.append(len(s))
            rates.append(rate)
            sums.append(int((s * s).sum()))
            peaks.append(int(np.abs(s).max()) if len(s) else 0)
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "sum_sq": pa.array(sums, pa.int64()),
                "peak": pa.array(peaks, pa.int64()),
            }
        )


def documents_as_wav(sf_dir: str, repeats: int = 8):
    """Adapter: real WAV corpus — 8 kHz mono PCM-16, samples =
    ``16 × md5(text) digest bytes`` tiled ``repeats`` times (so every
    feature is reconstructable from ``md5(text)`` in SQL)."""

    def adapt(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        payloads = []
        for t in texts:
            d = np.frombuffer(hashlib.md5(t.encode()).digest(), dtype=np.uint8)
            samples = np.tile(d.astype(np.int16) * 16, repeats)
            payloads.append(encode_wav_pcm16(8000, samples))
        return pa.table(
            {
                "item_id": pc.cast(b["doc_id"], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(["audio/wav"] * len(texts), pa.string()),
                "meta": pa.array(['{"rate":8000}'] * len(texts), pa.string()),
            }
        )

    from ..io import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        adapt, batch_format="pyarrow"
    )


def audio_wav_features(sf_dir: str, repeats: int = 8):
    """Real decode path for audio: WAV corpus → actor-pool RIFF parse →
    exact integer features."""
    return documents_as_wav(sf_dir, repeats).map_batches(
        AudioFeatures, batch_format="pyarrow", concurrency=2, batch_size=128
    )


def audio_wav_oracle_sql(repeats: int = 8) -> str:
    """DuckDB reconstruction of :func:`audio_wav_features`: digest byte
    i = ``CAST('0x'||substr(md5(text),2i+1,2) AS INT)``; sample value =
    16 × byte, tiled ``repeats`` times → n_samples = 16×repeats,
    sum_sq = repeats × Σ(16 b_i)², peak = 16 × max(b_i)."""
    bytes_ = [
        f"CAST(concat('0x', substr(md5(text), {2 * i + 1}, 2)) AS INTEGER)"
        for i in range(16)
    ]
    sum_sq = " + ".join(f"({b} * {b})" for b in bytes_)
    peak = "greatest({})".format(", ".join(bytes_))
    return f"""SELECT doc_id AS item_id,
       CAST({16 * repeats} AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST({repeats} * 256 * ({sum_sq}) AS BIGINT) AS sum_sq,
       CAST(16 * {peak} AS BIGINT) AS peak
FROM documents"""


# ---------------------------------------------------------------------------
# Video: real YUV4MPEG2 (Y4M) frame parser
# ---------------------------------------------------------------------------


def encode_y4m(width: int, height: int, frames: list[bytes]) -> bytes:
    """Mono (Cmono) YUV4MPEG2 stream — real-format fixture generator;
    one ``FRAME`` marker + W×H luma bytes per frame."""
    head = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 Cmono\n".encode()
    out = [head]
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError("frame size != W*H")
        out.append(b"FRAME\n")
        out.append(fr)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Real Y4M parser: stream header (W/H/C tags), then FRAME-delimited
    raw planes.  Mono only (color would need chroma-plane math); raises
    ``ValueError`` otherwise."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M header")
    width = height = None
    colorspace = "C420"
    for tag in payload[9:nl].split():
        t = tag.decode("ascii", "replace")
        if t[0] == "W":
            width = int(t[1:])
        elif t[0] == "H":
            height = int(t[1:])
        elif t[0] == "C":
            colorspace = t
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "Cmono":
        raise ValueError(f"only Cmono Y4M supported (got {colorspace})")
    frame_len = width * height
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise ValueError("expected FRAME marker")
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_len > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(payload[fnl + 1 : fnl + 1 + frame_len])
        pos = fnl + 1 + frame_len
    return width, height, frames


class FrameSampler:
    """Video frame-sample stage: video ``payload`` → ``n_frames``
    evenly-spaced frame rows (one output row per frame — flat_map
    shape).  YUV4MPEG2 payloads parse for REAL (:func:`decode_y4m`);
    other containers (mp4/mkv…) need absent codec libraries.
    ``fake=True`` derives deterministic fixed-size pseudo-frames from
    the payload digest + frame index (plumbing tests with arbitrary
    payloads)."""

    def __init__(self, n_frames: int = 4, fake: bool = False,
                 on_error: str = "raise"):
        self.n = n_frames
        self.fake = fake
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            ids, fidx, hs, ws, px = [], [], [], [], []
            for item_id, payload in zip(
                batch["item_id"].to_pylist(), batch["payload"].to_pylist()
            ):
                payload = payload or b""
                try:
                    if not payload.startswith(b"YUV4MPEG2"):
                        raise NotImplementedError(
                            "only YUV4MPEG2 video parses in this environment "
                            "(mp4/mkv need codec libraries absent from the "
                            "container); FrameSampler(fake=True) is the test "
                            "double for opaque payloads"
                        )
                    w, h, frames = decode_y4m(payload)
                except (ValueError, NotImplementedError):
                    if self.on_error == "raise":
                        raise
                    continue  # poison video → quarantined (skipped)
                take = np.linspace(0, len(frames) - 1, min(self.n, len(frames)))
                for i in take.astype(int):
                    ids.append(item_id)
                    fidx.append(int(i))
                    hs.append(h)
                    ws.append(w)
                    px.append(frames[i])
            return pa.table(
                {
                    "item_id": pa.array(ids, pa.int64()),
                    "frame_idx": pa.array(fidx, pa.int32()),
                    "height": pa.array(hs, pa.int32()),
                    "width": pa.array(ws, pa.int32()),
                    "channels": pa.array([1] * len(ids), pa.int32()),
                    "pixels": pa.array(px, pa.binary()),
                }
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


def documents_as_y4m(sf_dir: str, total_frames: int = 10):
    """Adapter: real Y4M video corpus — 8×8 mono, frame i's 64 luma
    bytes = ``md5(text + '#' + i).digest() × 4`` (every sampled frame
    reconstructable from SQL md5)."""

    def adapt(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        payloads = []
        for t in texts:
            frames = [
                hashlib.md5(f"{t}#{i}".encode()).digest() * 4
                for i in range(total_frames)
            ]
            payloads.append(encode_y4m(8, 8, frames))
        return pa.table(
            {
                "item_id": pc.cast(b["doc_id"], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(["video/x-yuv4mpeg"] * len(texts), pa.string()),
                "meta": pa.array(['{"w":8,"h":8}'] * len(texts), pa.string()),
            }
        )

    from ..io import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        adapt, batch_format="pyarrow"
    )


def video_frame_sample(sf_dir: str, n_frames: int = 4, total_frames: int = 10):
    """Real video path: Y4M corpus → actor-pool frame sampling →
    (item_id, frame_idx, frame_hex) with every sampled frame's pixels
    oracle-checked."""
    ds = documents_as_y4m(sf_dir, total_frames)
    sampled = ds.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        concurrency=2,
        batch_size=64,
        fn_constructor_kwargs={"n_frames": n_frames},
    )
    return sampled.map_batches(
        lambda b: pa.table(
            {
                "item_id": b["item_id"],
                "frame_idx": pc.cast(b["frame_idx"], pa.int32()),
                "frame_hex": pa.array(
                    [p.hex() for p in b["pixels"].to_pylist()], pa.string()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def video_frame_oracle_sql(n_frames: int = 4, total_frames: int = 10) -> str:
    """DuckDB reconstruction of :func:`video_frame_sample`: sampled
    indices = ``linspace(0, total-1, n).astype(int)`` (computed here
    with the same numpy call), frame hex = ``repeat(md5(text||'#'||i),
    4)``."""
    idx = np.linspace(0, total_frames - 1, n_frames).astype(int)
    rows = ", ".join(f"({int(i)})" for i in idx)
    return f"""SELECT d.doc_id AS item_id,
       CAST(f.i AS INTEGER) AS frame_idx,
       repeat(md5(d.text || '#' || CAST(f.i AS VARCHAR)), 4) AS frame_hex
FROM documents d CROSS JOIN (VALUES {rows}) AS f(i)"""


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


def documents_as_png(sf_dir: str):
    """Adapter: a REAL PNG corpus derived deterministically from the
    documents table — each doc becomes an actual 8-bit grayscale PNG
    whose 8×8 content is ``md5(text).digest() * 4``, encoded with
    scanline filter ``doc_id % 5`` so the corpus exercises all five
    unfilter paths of :func:`decode_png` with real files."""

    def adapt(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_pylist()
        payloads = [
            encode_png(
                8, 8, hashlib.md5(t.encode()).digest() * 4,
                channels=1, filter_type=int(i) % 5,
            )
            for i, t in zip(ids, texts)
        ]
        return pa.table(
            {
                "item_id": pc.cast(b["doc_id"], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(["image/png"] * len(texts), pa.string()),
                "meta": pa.array(['{"h":8,"w":8}'] * len(texts), pa.string()),
            }
        )

    from ..io import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        adapt, batch_format="pyarrow"
    )


def image_png_decode(sf_dir: str):
    """Real PNG decode pipeline: PNG corpus (five filter types across
    the items) → actor-pool :class:`ImageDecoder` (stdlib-zlib
    :func:`decode_png`) → ``(item_id, height, width, channels,
    pixels_hex)``.  The decoded grayscale buffer is exactly
    ``md5(text).digest() * 4`` whatever filter the file used, so the
    DuckDB oracle is ``repeat(md5(text), 4)``."""
    ds = documents_as_png(sf_dir)
    decoded = ds.map_batches(
        ImageDecoder, batch_format="pyarrow", concurrency=2, batch_size=128
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

    return decoded.map_batches(finish, batch_format="pyarrow")


def image_png_oracle_sql() -> str:
    """DuckDB reconstruction of :func:`image_png_decode`: the decoded
    pixel buffer is ``md5(text).digest()`` tiled 4× regardless of the
    per-item scanline filter."""
    return """SELECT doc_id AS item_id,
       CAST(8 AS INTEGER) AS height, CAST(8 AS INTEGER) AS width,
       CAST(1 AS INTEGER) AS channels,
       repeat(md5(text), 4) AS pixels_hex
FROM documents"""


def documents_as_jpeg(sf_dir: str):
    """Adapter: a REAL baseline-JPEG corpus derived deterministically
    from the documents table — each doc becomes an actual 32×32
    grayscale JPEG of sixteen constant 8×8 tiles, tile (tr, tc) =
    ``md5(text).digest()[tr*4+tc]``.  Constant blocks with the
    DC-quantizer-8 table round-trip BIT-EXACTLY through the lossy
    pipeline (pure DC, exactly divisible), so DuckDB reconstructs
    every decoded pixel; ``restart_interval = doc_id % 4`` exercises
    the DRI/RSTn scan structure on real files."""

    def adapt(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_pylist()
        payloads = []
        for i, t in zip(ids, texts):
            d = hashlib.md5(t.encode()).digest()
            tiles = np.zeros((32, 32), np.uint8)
            for j, byte in enumerate(d):
                tr, tc = divmod(j, 4)
                tiles[tr * 8 : tr * 8 + 8, tc * 8 : tc * 8 + 8] = byte
            payloads.append(
                encode_jpeg_gray(
                    32, 32, tiles.tobytes(), restart_interval=int(i) % 4
                )
            )
        return pa.table(
            {
                "item_id": pc.cast(b["doc_id"], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(["image/jpeg"] * len(texts), pa.string()),
                "meta": pa.array(['{"h":32,"w":32}'] * len(texts), pa.string()),
            }
        )

    from ..io import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        adapt, batch_format="pyarrow"
    )


def image_jpeg_decode(sf_dir: str):
    """Real baseline-JPEG decode pipeline: JPEG corpus (restart
    intervals varying per item) → actor-pool :class:`ImageDecoder`
    (T.81 Huffman + vectorized dequant/IDCT,
    :func:`argo_ray.functions.jpeg.decode_jpeg`) → (item_id, height,
    width, channels, pixels_hex), every pixel oracle-reconstructed
    from ``md5(text)``."""
    ds = documents_as_jpeg(sf_dir)
    decoded = ds.map_batches(
        ImageDecoder, batch_format="pyarrow", concurrency=2, batch_size=64
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

    return decoded.map_batches(finish, batch_format="pyarrow")


def image_jpeg_oracle_sql() -> str:
    """DuckDB reconstruction of :func:`image_jpeg_decode`: tile
    (tr, tc) is digest byte ``tr*4+tc``; one pixel row of the image is
    four 8-wide repeats, one tile-row is that row repeated 8 times."""
    tile_rows = []
    for tr in range(4):
        row_hex = " || ".join(
            f"repeat(substr(md5(text), {2 * (tr * 4 + tc) + 1}, 2), 8)"
            for tc in range(4)
        )
        tile_rows.append(f"repeat({row_hex}, 8)")
    expr = " || ".join(tile_rows)
    return f"""SELECT doc_id AS item_id,
       CAST(32 AS INTEGER) AS height, CAST(32 AS INTEGER) AS width,
       CAST(1 AS INTEGER) AS channels,
       {expr} AS pixels_hex
FROM documents"""


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


def image_ahash_dedup(sf_dir: str):
    """Perceptual-hash (aHash) image near-dup: decode the BMP corpus
    for real, average-threshold each 8×8 grayscale image into a 64-bit
    hash (emitted as a 64-char bit string), and mark each image's
    canonical representative (min item_id per hash) — the visual-dedup
    stage of a multimodal training-data pipeline.

    Vectorized: one ``frombuffer`` reshape per batch (all decoded
    images are 8×8×3), mean + threshold as numpy matrix ops, bit rows
    viewed as U64 strings without a per-bit Python loop; the keep
    decision is ONE sort by hash + an in-block groupby-min (the
    grouping.py colocation contract).  Oracle: every pixel is
    ``md5(text)`` digest byte ``i % 16``, so DuckDB reconstructs the
    hash bit-for-bit (mean = sum/64 is exact — a power-of-two
    divisor)."""
    import numpy as np

    from ..stages import grouping as _colocation_guard  # noqa: F401

    ds = documents_as_bmp(sf_dir)
    decoded = ds.map_batches(
        ImageDecoder, batch_format="pyarrow", concurrency=2, batch_size=128
    )

    hash_schema = pa.schema([("item_id", pa.int64()), ("ahash", pa.string())])

    def ahash(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return hash_schema.empty_table()
        raw = b"".join(b["pixels"].to_pylist())
        gray = np.frombuffer(raw, np.uint8).reshape(n, -1)[:, ::3]  # R=G=B
        mean = gray.mean(axis=1)  # sum/64: exact (power-of-two divisor)
        bits = gray > mean[:, None]
        chars = np.where(bits, "1", "0").astype("<U1")
        strs = np.ascontiguousarray(chars).view(f"<U{bits.shape[1]}").ravel()
        return pa.table(
            {
                "item_id": pc.cast(b["item_id"], pa.int64()),
                "ahash": pa.array(strs, pa.string()),
            }
        )

    out_schema = pa.schema(
        [("item_id", pa.int64()), ("ahash", pa.string()), ("keep_id", pa.int64())]
    )

    def mark(df):
        if len(df) == 0 or "ahash" not in df.columns:
            return out_schema.empty_table()
        keep = df.groupby("ahash", sort=False)["item_id"].transform("min")
        return pa.table(
            {
                "item_id": pa.array(
                    df["item_id"].to_numpy(dtype=np.int64), pa.int64()
                ),
                "ahash": pa.array(df["ahash"], pa.string()),
                "keep_id": pa.array(keep.to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    return (
        decoded.map_batches(ahash, batch_format="pyarrow")
        .sort("ahash")
        .map_batches(mark, batch_format="pandas", batch_size=None)
    )


def image_ahash_oracle_sql() -> str:
    """DuckDB twin of :func:`image_ahash_dedup`: pixel i of the decoded
    8×8 gray image is md5-digest byte ``i % 16``, the mean is the exact
    sum/64, each hash bit compares its pixel against the mean, and the
    keep decision is MIN(item_id) per hash."""
    byte = [
        f"CAST('0x' || substr(md5(text), {2 * j + 1}, 2) AS INT)" for j in range(16)
    ]
    mean = "CAST(4 * (" + " + ".join(byte) + ") AS DOUBLE) / 64.0"
    bits = " || ".join(
        f"CASE WHEN {byte[i % 16]} > m THEN '1' ELSE '0' END" for i in range(64)
    )
    return f"""WITH px AS (
  SELECT doc_id AS item_id, text, {mean} AS m FROM documents
), hashed AS (
  SELECT item_id, {bits} AS ahash FROM px
)
SELECT item_id, ahash, MIN(item_id) OVER (PARTITION BY ahash) AS keep_id
FROM hashed"""


def image_patches(sf_dir: str, patch: int = 4):
    """ViT-style patch extraction: the real-decoded 8×8 BMP corpus cut
    into non-overlapping ``patch×patch`` tiles, one row per tile with
    its integer gray-sum — the patch-embedding prep stage of a
    vision-training pipeline (sums stay integer-exact so the DuckDB
    oracle reconstructs them from ``md5(text)`` digest bytes).
    Actor-pool decode (payload bytes never leave the workers), one
    vectorized reshape+sum per batch, zero shuffles."""
    ds = documents_as_bmp(sf_dir)
    decoded = ds.map_batches(
        ImageDecoder, batch_format="pyarrow", concurrency=2, batch_size=128
    )

    def tiles(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table(
                {
                    "item_id": pa.array([], pa.int64()),
                    "patch_row": pa.array([], pa.int64()),
                    "patch_col": pa.array([], pa.int64()),
                    "patch_sum": pa.array([], pa.int64()),
                }
            )
        h = int(b["height"][0].as_py())
        w = int(b["width"][0].as_py())
        px = np.frombuffer(
            b"".join(p.as_py() for p in b["pixels"]), dtype=np.uint8
        ).reshape(n, h, w, 3)
        gray = px[:, :, :, 0].astype(np.int64)  # R=G=B for this corpus
        ph, pw = h // patch, w // patch
        # (n, ph, patch, pw, patch) → sum the two patch axes
        sums = gray.reshape(n, ph, patch, pw, patch).sum(axis=(2, 4))
        ids = np.repeat(
            np.asarray(b["item_id"].to_pylist(), dtype=np.int64), ph * pw
        )
        pr = np.tile(np.repeat(np.arange(ph, dtype=np.int64), pw), n)
        pcn = np.tile(np.tile(np.arange(pw, dtype=np.int64), ph), n)
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "patch_row": pa.array(pr, pa.int64()),
                "patch_col": pa.array(pcn, pa.int64()),
                "patch_sum": pa.array(sums.reshape(-1), pa.int64()),
            }
        )

    return decoded.map_batches(tiles, batch_format="pyarrow")


def image_patches_oracle_sql(patch: int = 4, h: int = 8, w: int = 8) -> str:
    """Per-tile gray sums rebuilt from md5 digest bytes (pixel (y,x) =
    digest byte ``(y*w+x) % 16``), hex pairs decoded with strpos."""

    def byte_expr(j: int) -> str:
        hi = f"(strpos('0123456789abcdef', substr(md5(text), {2 * j + 1}, 1)) - 1)"
        lo = f"(strpos('0123456789abcdef', substr(md5(text), {2 * j + 2}, 1)) - 1)"
        return f"({hi} * 16 + {lo})"

    selects = []
    for pr in range(h // patch):
        for pc_ in range(w // patch):
            terms = []
            for dy in range(patch):
                for dx in range(patch):
                    y, x = pr * patch + dy, pc_ * patch + dx
                    terms.append(byte_expr((y * w + x) % 16))
            selects.append(
                f"SELECT doc_id AS item_id, CAST({pr} AS BIGINT) AS patch_row, "
                f"CAST({pc_} AS BIGINT) AS patch_col, "
                f"CAST({' + '.join(terms)} AS BIGINT) AS patch_sum FROM documents"
            )
    return "\nUNION ALL\n".join(selects)


def audio_frame_energy(sf_dir: str, frame: int = 10, repeats: int = 8):
    """Frame-level audio features (the VAD/energy-gate prep stage of a
    speech pipeline): the real WAV corpus decoded in an actor pool,
    samples cut into non-overlapping ``frame``-sample windows (full
    frames only — the tail is dropped, n_frames = n_samples // frame),
    one row per frame with its integer energy (sum of absolute PCM16
    values — exact, oracle-reconstructable from md5 digest bytes).
    Frame length 10 is deliberately coprime to the 16-byte digest tile
    so consecutive frames differ."""

    class FrameEnergy:
        def __init__(self):
            pass

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, frames, energies = [], [], []
            for item, payload in zip(
                b["item_id"].to_pylist(), b["payload"].to_pylist()
            ):
                rate, n, samples = decode_wav(payload)
                s = np.abs(samples.astype(np.int64))
                nf = len(s) // frame
                sums = s[: nf * frame].reshape(nf, frame).sum(axis=1)
                ids.extend([item] * nf)
                frames.extend(range(nf))
                energies.extend(sums.tolist())
            return pa.table(
                {
                    "item_id": pa.array(ids, pa.int64()),
                    "frame_idx": pa.array(frames, pa.int64()),
                    "energy": pa.array(energies, pa.int64()),
                }
            )

    return documents_as_wav(sf_dir, repeats).map_batches(
        FrameEnergy, batch_format="pyarrow", concurrency=2, batch_size=128
    )


def audio_frame_energy_oracle_sql(frame: int = 10, repeats: int = 8) -> str:
    """Per-frame energies from digest bytes: sample i = 16·b(i%16)."""
    n_samples = 16 * repeats
    nf = n_samples // frame

    def byte_expr(j: int) -> str:
        return f"CAST(concat('0x', substr(md5(text), {2 * j + 1}, 2)) AS INTEGER)"

    selects = []
    for f in range(nf):
        terms = [
            f"16 * {byte_expr((f * frame + k) % 16)}" for k in range(frame)
        ]
        selects.append(
            f"SELECT doc_id AS item_id, CAST({f} AS BIGINT) AS frame_idx, "
            f"CAST({' + '.join(terms)} AS BIGINT) AS energy FROM documents"
        )
    return "\nUNION ALL\n".join(selects)


def video_frame_diff(sf_dir: str, total_frames: int = 10):
    """Scene-cut / keyframe prep: per consecutive frame pair the
    integer sum of absolute luma differences (the shot-boundary signal
    video-training pipelines threshold before sampling).  Real Y4M
    parse in an actor pool, one vectorized diff per video, zero
    shuffles; exact integers → oracle-reconstructable from the
    per-frame md5 digests."""

    class FrameDiff:
        def __init__(self):
            pass

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, pairs, diffs = [], [], []
            for item, payload in zip(
                b["item_id"].to_pylist(), b["payload"].to_pylist()
            ):
                w, h, frames = decode_y4m(payload)
                arr = np.stack(
                    [np.frombuffer(f, dtype=np.uint8) for f in frames]
                ).astype(np.int64)
                d = np.abs(arr[1:] - arr[:-1]).sum(axis=1)
                ids.extend([item] * len(d))
                pairs.extend(range(len(d)))
                diffs.extend(d.tolist())
            return pa.table(
                {
                    "item_id": pa.array(ids, pa.int64()),
                    "pair_idx": pa.array(pairs, pa.int64()),
                    "abs_diff": pa.array(diffs, pa.int64()),
                }
            )

    return documents_as_y4m(sf_dir, total_frames).map_batches(
        FrameDiff, batch_format="pyarrow", concurrency=2, batch_size=64
    )


def video_frame_diff_oracle_sql(total_frames: int = 10) -> str:
    """Pair diffs from digest bytes: each 64-byte frame is the 16-byte
    digest ×4, so the pair diff is 4 × Σ|b_f(j) − b_{f+1}(j)|."""

    def byte_expr(frame: str, j: int) -> str:
        return (
            f"CAST(concat('0x', substr(md5(text || '#' || {frame}), "
            f"{2 * j + 1}, 2)) AS INTEGER)"
        )

    selects = []
    for f in range(total_frames - 1):
        terms = [
            f"abs({byte_expr(str(f), j)} - {byte_expr(str(f + 1), j)})"
            for j in range(16)
        ]
        selects.append(
            f"SELECT doc_id AS item_id, CAST({f} AS BIGINT) AS pair_idx, "
            f"CAST(4 * ({' + '.join(terms)}) AS BIGINT) AS abs_diff "
            f"FROM documents"
        )
    return "\nUNION ALL\n".join(selects)


def image_norm_stats(sf_dir: str):
    """Dataset NORMALIZATION statistics over the real-decoded BMP
    corpus — the torchvision-style mean/std every vision-training
    pipeline precomputes: per-batch exact integer Σpx and Σpx² over
    the gray channel (R=G=B here), ONE global aggregate, float finish
    computed from the three exact integers with the same expression
    the oracle uses (IEEE sqrt is correctly rounded, so both sides
    are bit-identical).  Actor-pool decode, zero shuffles."""
    from ray.data.aggregate import Sum

    ds = documents_as_bmp(sf_dir)
    decoded = ds.map_batches(
        ImageDecoder, batch_format="pyarrow", concurrency=2, batch_size=128
    )

    def partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "s2": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "npx": pa.array([], pa.int64()),
                }
            )
        # per-image dims may vary: each RGB buffer's length is a
        # multiple of 3, so channel-0 bytes sit at global indices
        # ≡ 0 (mod 3) of the concatenation — no uniform-shape
        # assumption, and the true pixel count rides along like the
        # audio/video partials' n_tot
        allb = np.frombuffer(
            b"".join(p.as_py() for p in b["pixels"]), dtype=np.uint8
        )
        gray = allb[0::3].astype(np.int64)
        return pa.table(
            {
                "s": pa.array([int(gray.sum())], pa.int64()),
                "s2": pa.array([int((gray * gray).sum())], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "npx": pa.array([len(gray)], pa.int64()),
            }
        )

    agg = decoded.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"),
        Sum("s2", alias_name="s2"),
        Sum("n", alias_name="n"),
        Sum("npx", alias_name="npx"),
    )
    import math

    s, s2, n = int(agg["s"]), int(agg["s2"]), int(agg["n"])
    npx = float(int(agg["npx"]))
    mean = s / npx
    std = math.sqrt(s2 / npx - mean * mean)
    return pa.table(
        {
            "n_images": pa.array([n], pa.int64()),
            "sum_px": pa.array([s], pa.int64()),
            "sum_px2": pa.array([s2], pa.int64()),
            "mean_px": pa.array([round(mean, 6)], pa.float64()),
            "std_px": pa.array([round(std, 6)], pa.float64()),
        }
    )


def audio_norm_stats(sf_dir: str, repeats: int = 8):
    """Audio dataset normalization stats — the per-corpus mean/std a
    speech pipeline standardizes PCM input with: exact integer Σs and
    Σs² over every decoded sample (samples are non-negative 16·byte
    values in this corpus), one global aggregate, the same shared
    IEEE float finish as :func:`image_norm_stats`."""
    import math

    from ray.data.aggregate import Sum

    class Partial:
        def __init__(self):
            pass

        def __call__(self, b: pa.Table) -> pa.Table:
            s_tot, s2_tot, n_tot = 0, 0, 0
            for payload in b["payload"].to_pylist():
                rate, n, samples = decode_wav(payload)
                s = samples.astype(np.int64)
                s_tot += int(s.sum())
                s2_tot += int((s * s).sum())
                n_tot += len(s)
            return pa.table(
                {
                    "s": pa.array([s_tot], pa.int64()),
                    "s2": pa.array([s2_tot], pa.int64()),
                    "n": pa.array([n_tot], pa.int64()),
                }
            )

    agg = (
        documents_as_wav(sf_dir, repeats)
        .map_batches(Partial, batch_format="pyarrow", concurrency=2, batch_size=128)
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("s2", alias_name="s2"),
            Sum("n", alias_name="n"),
        )
    )
    s, s2, n = int(agg["s"]), int(agg["s2"]), int(agg["n"])
    mean = s / (1.0 * n)
    std = math.sqrt(s2 / (1.0 * n) - mean * mean)
    return pa.table(
        {
            "n_samples": pa.array([n], pa.int64()),
            "sum_s": pa.array([s], pa.int64()),
            "sum_s2": pa.array([s2], pa.int64()),
            "mean_s": pa.array([round(mean, 6)], pa.float64()),
            "std_s": pa.array([round(std, 6)], pa.float64()),
        }
    )


def audio_norm_stats_oracle_sql(repeats: int = 8) -> str:
    """Σs / Σs² from digest bytes: each of the 16 bytes appears
    ``repeats``× per doc as sample value 16·byte."""

    def byte_expr(j: int) -> str:
        return f"CAST(concat('0x', substr(md5(text), {2 * j + 1}, 2)) AS INTEGER)"

    s_terms = " + ".join(f"16 * {byte_expr(j)}" for j in range(16))
    s2_terms = " + ".join(
        f"(16 * {byte_expr(j)}) * (16 * {byte_expr(j)})" for j in range(16)
    )
    return f"""WITH per AS (
  SELECT doc_id, {repeats} * ({s_terms}) AS s_doc,
         {repeats} * ({s2_terms}) AS s2_doc
  FROM documents
), tot AS (
  SELECT SUM(s_doc) AS s, SUM(s2_doc) AS s2,
         16 * {repeats} * COUNT(*) AS n FROM per
), m AS (
  SELECT s, s2, n, s / (1.0 * n) AS mean FROM tot
)
SELECT CAST(n AS BIGINT) AS n_samples, CAST(s AS BIGINT) AS sum_s,
       CAST(s2 AS BIGINT) AS sum_s2, ROUND(mean, 6) AS mean_s,
       ROUND(sqrt(s2 / (1.0 * n) - mean * mean), 6) AS std_s
FROM m"""


def video_norm_stats(sf_dir: str, total_frames: int = 10):
    """Video (luma) normalization stats — the per-corpus pixel mean/std
    completing the image/audio/video trio: exact integer Σy and Σy²
    over every decoded luma byte of every frame, one global aggregate,
    shared IEEE float finish."""
    import math

    from ray.data.aggregate import Sum

    class Partial:
        def __init__(self):
            pass

        def __call__(self, b: pa.Table) -> pa.Table:
            s_tot, s2_tot, n_tot = 0, 0, 0
            for payload in b["payload"].to_pylist():
                w, h, frames = decode_y4m(payload)
                y = np.frombuffer(b"".join(frames), dtype=np.uint8).astype(
                    np.int64
                )
                s_tot += int(y.sum())
                s2_tot += int((y * y).sum())
                n_tot += len(y)
            return pa.table(
                {
                    "s": pa.array([s_tot], pa.int64()),
                    "s2": pa.array([s2_tot], pa.int64()),
                    "n": pa.array([n_tot], pa.int64()),
                }
            )

    agg = (
        documents_as_y4m(sf_dir, total_frames)
        .map_batches(Partial, batch_format="pyarrow", concurrency=2, batch_size=128)
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("s2", alias_name="s2"),
            Sum("n", alias_name="n"),
        )
    )
    s, s2, n = int(agg["s"]), int(agg["s2"]), int(agg["n"])
    mean = s / (1.0 * n)
    std = math.sqrt(s2 / (1.0 * n) - mean * mean)
    return pa.table(
        {
            "n_luma": pa.array([n], pa.int64()),
            "sum_y": pa.array([s], pa.int64()),
            "sum_y2": pa.array([s2], pa.int64()),
            "mean_y": pa.array([round(mean, 6)], pa.float64()),
            "std_y": pa.array([round(std, 6)], pa.float64()),
        }
    )


def video_norm_stats_oracle_sql(total_frames: int = 10) -> str:
    """Σy / Σy² from the per-frame digests (each of a frame's 16 bytes
    appears 4× in the 64 luma bytes).  One UNNEST row per (doc, frame)
    keeps each sum at 16 terms — a flat 160-term chain trips DuckDB's
    binder recursion cap (128)."""

    def byte_expr(j: int) -> str:
        return f"CAST(concat('0x', substr(h, {2 * j + 1}, 2)) AS INTEGER)"

    s_terms = " + ".join(byte_expr(j) for j in range(16))
    s2_terms = " + ".join(f"{byte_expr(j)} * {byte_expr(j)}" for j in range(16))
    n_per_doc = 64 * total_frames
    return f"""WITH fr AS (
  SELECT doc_id, md5(text || '#' || u.i) AS h
  FROM documents, UNNEST(range({total_frames})) AS u(i)
), per AS (
  SELECT doc_id, 4 * ({s_terms}) AS s_f, 4 * ({s2_terms}) AS s2_f FROM fr
), tot AS (
  SELECT SUM(s_f) AS s, SUM(s2_f) AS s2,
         {n_per_doc} * COUNT(DISTINCT doc_id) AS n FROM per
), m AS (
  SELECT s, s2, n, s / (1.0 * n) AS mean FROM tot
)
SELECT CAST(n AS BIGINT) AS n_luma, CAST(s AS BIGINT) AS sum_y,
       CAST(s2 AS BIGINT) AS sum_y2, ROUND(mean, 6) AS mean_y,
       ROUND(sqrt(s2 / (1.0 * n) - mean * mean), 6) AS std_y
FROM m"""
