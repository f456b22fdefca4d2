"""Baseline JPEG codec — pure numpy + stdlib, public spec only
(ITU-T T.81 / ISO 10918-1; the standard Annex K quantization and
Huffman tables).  No codec library.

Decoder scope: baseline sequential DCT (SOF0), 8-bit, grayscale or
3-component YCbCr with per-axis sampling factors 1 or 2 — 4:4:4,
4:2:2 and the dominant web layout 4:2:0 all decode — plus optional
restart intervals.  Progressive (SOF2), arithmetic coding, 12-bit
precision and sampling factors beyond 2 raise ``ValueError`` into
the poison-image quarantine — the honest refusal,
same contract as :func:`argo_ray.functions.multimodal.decode_png`.

Encoder scope: grayscale baseline with a caller-chosen quantization
table.  The oracle fixtures use constant 8×8 blocks and a DC
quantizer of 8: a constant block's DCT is pure DC ``8·g − 1024``
(divisible by 8 exactly), every AC coefficient is zero, so
quantize→dequantize→IDCT reproduces the block BIT-EXACTLY and DuckDB
can reconstruct every decoded pixel from ``md5(text)`` — while the
decoder still runs its full general path (Huffman trees, zigzag,
dequant, 2-D IDCT).  Lossy general content is pinned by tolerance
round-trip tests instead.

Entropy decoding walks bits in Python (Huffman is inherently
bit-serial) but every block-level transform — dequantization, inverse
zigzag, the 2-D IDCT over ALL blocks at once — is a vectorized numpy
einsum, so cost per image is dominated by the O(symbols) bit walk,
not per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

# -- 8×8 DCT basis ----------------------------------------------------------

_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _DCT[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# -- standard Huffman tables (T.81 Annex K.3) -------------------------------
# (bits[i] = #codes of length i+1, then the symbol values in code order)

_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# the oracle fixtures' quantization table: DC quantizer 8 (a constant
# block's DC 8·g−1024 divides exactly), AC quantizers 1 (unused for
# constant blocks but keeps general content near-lossless)
EXACT_DC_QUANT = np.ones(64, dtype=np.int64)
EXACT_DC_QUANT[0] = 8


def _build_code_table(bits, vals):
    """(bits, vals) → {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, vals):
    """(bits, vals) → {(length, code): symbol} for the bit-walk."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; an RSTn marker
    mid-stream resets to the next byte boundary (handled by the MCU
    loop); any other marker ends the segment."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_past_rst(self) -> None:
        """Consume padding + one RSTn marker (restart interval)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        # skip pad bits already discarded; find the marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _decode_huff(r: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw ``size``-bit value to its
    signed difference."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _plane_qcoefs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """8-bit plane → quantized zigzag coefficients per raster block
    (edge blocks replicate the last row/column)."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ).astype(np.float64) - 128.0
    coefs = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
    return np.round(coefs.reshape(-1, 64)[:, _ZIGZAG] / q).astype(np.int64)


def _write_block(w: _BitWriter, blk, pred: int, dc_codes, ac_codes) -> int:
    diff = int(blk[0]) - pred
    pred = int(blk[0])
    size = _category(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.nonzero(blk[1:])[0][-1]) + 1 if (blk[1:] != 0).any() else 0
    for i in range(1, last_nz + 1):
        v = int(blk[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return pred


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _encode_planes(
    height: int,
    width: int,
    planes: list[np.ndarray],
    q: np.ndarray,
    restart_interval: int,
) -> bytes:
    """Shared marker/entropy writer for 1 (gray) or 3 (YCbCr 4:4:4)
    planes — all components use quant table 0 and the Annex K
    luminance Huffman tables (legal: SOS declares the tables per
    component)."""
    nc = len(planes)
    per_comp = [_plane_qcoefs(p, q) for p in planes]
    n_mcu = per_comp[0].shape[0]
    dc_codes = _build_code_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _build_code_table(_AC_LUM_BITS, _AC_LUM_VALS)

    parts = []
    w = _BitWriter()
    preds = [0] * nc
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            parts.append(w.flush())
            parts.append(bytes([0xFF, 0xD0 + ((m // restart_interval) - 1) % 8]))
            w = _BitWriter()
            preds = [0] * nc
        for ci in range(nc):
            preds[ci] = _write_block(
                w, per_comp[ci][m], preds[ci], dc_codes, ac_codes
            )
    parts.append(w.flush())
    payload = b"".join(parts)

    dqt = _seg(0xFFDB, bytes([0x00]) + bytes(int(x) for x in q))
    comp_specs = b"".join(bytes([i + 1, 0x11, 0]) for i in range(nc))
    sof = _seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, nc) + comp_specs
    )
    dht = _seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    dri = (
        _seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    scan_specs = b"".join(bytes([i + 1, 0x00]) for i in range(nc))
    sos = _seg(0xFFDA, bytes([nc]) + scan_specs + bytes([0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + payload + b"\xff\xd9"


def encode_jpeg_gray(
    height: int,
    width: int,
    gray: bytes,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Row-major 8-bit grayscale → baseline JPEG (SOF0, standard
    Annex K luminance Huffman tables, caller-chosen zigzag-order
    quantization table — default :data:`EXACT_DC_QUANT`).  Edge
    blocks replicate the last row/column; ``restart_interval`` writes
    DRI + RSTn markers every N MCUs (the resumable-scan structure a
    robust decoder must handle)."""
    if len(gray) != height * width:
        raise ValueError("gray buffer size != height*width")
    q = (EXACT_DC_QUANT if quant is None else np.asarray(quant)).astype(np.int64)
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 64 zigzag-order values in 1..255")
    img = np.frombuffer(gray, dtype=np.uint8).reshape(height, width)
    return _encode_planes(height, width, [img], q, restart_interval)


def encode_jpeg_rgb(
    height: int,
    width: int,
    rgb: bytes,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Row-major 8-bit RGB → baseline JPEG, YCbCr (T.871 full-range
    BT.601 forward transform) — the color twin of
    :func:`encode_jpeg_gray`.  ``subsampling="420"`` writes the
    dominant web layout (2×2 Y blocks + box-averaged Cb/Cr per MCU);
    ``"444"`` keeps full-resolution chroma."""
    if len(rgb) != height * width * 3:
        raise ValueError("rgb buffer size != height*width*3")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    q = (EXACT_DC_QUANT if quant is None else np.asarray(quant)).astype(np.int64)
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 64 zigzag-order values in 1..255")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [
        np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)
    ]
    if subsampling == "444":
        return _encode_planes(height, width, planes, q, restart_interval)
    return _encode_planes_420(height, width, planes, q, restart_interval)


def _encode_planes_420(
    height: int,
    width: int,
    planes: list[np.ndarray],
    q: np.ndarray,
    restart_interval: int,
) -> bytes:
    """YCbCr 4:2:0 writer: MCU = four Y blocks (2×2) + one Cb + one
    Cr; chroma is the 2×2 box mean of the edge-padded full-res plane.
    Same Annex K Huffman tables on every component."""
    ph = -(-height // 16) * 16
    pw = -(-width // 16) * 16
    ypad = np.pad(
        planes[0], ((0, ph - height), (0, pw - width)), mode="edge"
    )
    chroma = []
    for p in planes[1:]:
        pad = np.pad(
            p.astype(np.float64),
            ((0, ph - height), (0, pw - width)),
            mode="edge",
        )
        down = pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        chroma.append(np.clip(np.round(down), 0, 255).astype(np.uint8))

    y_q = _plane_qcoefs(ypad, q)          # (ph/8 × pw/8) raster blocks
    c_q = [_plane_qcoefs(c, q) for c in chroma]  # (ph/16 × pw/16)
    gx = pw // 8          # Y blocks per row
    mcx, mcy = pw // 16, ph // 16

    dc_codes = _build_code_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _build_code_table(_AC_LUM_BITS, _AC_LUM_VALS)
    parts = []
    w = _BitWriter()
    preds = [0, 0, 0]
    for m in range(mcx * mcy):
        if restart_interval and m and m % restart_interval == 0:
            parts.append(w.flush())
            parts.append(bytes([0xFF, 0xD0 + ((m // restart_interval) - 1) % 8]))
            w = _BitWriter()
            preds = [0, 0, 0]
        my, mx = divmod(m, mcx)
        for by in range(2):
            for bx in range(2):
                blk = y_q[(2 * my + by) * gx + (2 * mx + bx)]
                preds[0] = _write_block(w, blk, preds[0], dc_codes, ac_codes)
        for ci in (0, 1):
            blk = c_q[ci][my * mcx + mx]
            preds[ci + 1] = _write_block(
                w, blk, preds[ci + 1], dc_codes, ac_codes
            )
    parts.append(w.flush())
    payload = b"".join(parts)

    dqt = _seg(0xFFDB, bytes([0x00]) + bytes(int(x) for x in q))
    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x22, 0])   # Y: 2×2
        + bytes([2, 0x11, 0])   # Cb
        + bytes([3, 0x11, 0]),  # Cr
    )
    dht = _seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    dri = (
        _seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    sos = _seg(
        0xFFDA, bytes([3]) + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + bytes([0, 63, 0])
    )
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + payload + b"\xff\xd9"


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG → ``(height, width, channels, row-major top-down
    bytes)`` — grayscale (1 channel) or YCbCr 4:4:4 (→ RGB, 3
    channels).  Progressive / arithmetic / 12-bit / subsampled files
    raise ``ValueError`` (poison-image quarantine)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    sof = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported 16-bit quant table")
                qtables[tq] = np.frombuffer(
                    body[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("unsupported JPEG precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = samp >> 4, samp & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(
                        f"unsupported JPEG sampling factors {hs}x{vs} "
                        "(1 or 2 per axis here)"
                    )
                comps.append((cid, hs, vs, tq))
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            if nc == 1 and comps[0][1:3] != (1, 1):
                raise ValueError("unsupported sampling on grayscale JPEG")
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG variant (non-baseline SOF)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            data_pos = pos + 2 + length
            return _decode_scan(
                payload, data_pos, sof, scan, qtables, htables,
                restart_interval,
            )
        pos += 2 + length
    raise ValueError("JPEG missing SOS scan")


def _idct_blocks(qz: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficient rows → clipped uint8 8×8 blocks
    (vectorized over ALL blocks)."""
    deq = (qz * q)[:, _UNZIGZAG].reshape(-1, 8, 8)
    pix = np.einsum("ux,nuv,vy->nxy", _DCT, deq.astype(np.float64), _DCT)
    return np.clip(np.round(pix) + 128.0, 0, 255).astype(np.uint8)


def _decode_scan(payload, pos, sof, scan, qtables, htables, restart_interval):
    h, w, comps = sof
    nc = len(comps)
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    n_mcu = mcx * mcy
    # per component: block grid (mcy*vs, mcx*hs) of zigzag rows
    qcoefs = [
        np.zeros((mcy * vs, mcx * hs, 64), dtype=np.int64)
        for _, hs, vs, _ in comps
    ]
    comp_t = {cs: (td, ta) for cs, td, ta in scan}
    r = _BitReader(payload, pos)
    preds = [0] * nc
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            r.align_past_rst()
            preds = [0] * nc
        my, mx = divmod(m, mcx)
        for ci, (cid, hs, vs, _tq) in enumerate(comps):
            td, ta = comp_t[cid]
            dc_t = htables.get((0, td))
            ac_t = htables.get((1, ta))
            if dc_t is None or ac_t is None:
                raise ValueError("JPEG scan references missing Huffman table")
            for by in range(vs):
                for bx in range(hs):
                    blk = qcoefs[ci][my * vs + by, mx * hs + bx]
                    size = _decode_huff(r, dc_t)
                    preds[ci] += _extend(r.bits(size), size)
                    blk[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(r, ac_t)
                        run, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overflow")
                        blk[k] = _extend(r.bits(size), size)
                        k += 1

    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError("JPEG component references missing quant table")
        gy, gx = mcy * vs, mcx * hs
        pix = _idct_blocks(qcoefs[ci].reshape(-1, 64), qtables[tq])
        plane = (
            pix.reshape(gy, gx, 8, 8).transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8)
        )
        # crop to the component's true dims, then upsample to full res
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        plane = plane[:ch, :cw]
        if hs != hmax:
            plane = np.repeat(plane, hmax // hs, axis=1)
        if vs != vmax:
            plane = np.repeat(plane, vmax // vs, axis=0)
        planes.append(plane[:h, :w])
    if nc == 1:
        return h, w, 1, planes[0].tobytes()
    # YCbCr (BT.601 full-range, T.871) → RGB
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return h, w, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
