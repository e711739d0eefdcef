"""Baseline JPEG (ITU-T T.81) codec in pure stdlib + numpy.

Closes the last image-codec plug point in ``multimodal.py`` without any
external library: a baseline sequential DCT encoder (4:4:4, standard
Annex-K quantization + Huffman tables, libjpeg quality scaling) for
deterministic test fixtures, and a decoder covering what real-world
baseline files use — SOF0, 8-bit, grayscale or YCbCr with 4:4:4 / 4:2:2
/ 4:2:0 chroma subsampling, restart intervals.  Progressive (SOF2),
arithmetic coding, and 12-bit precision raise ``NotImplementedError``
(the honest boundary; they are rare in training corpora and decode via
PIL/libjpeg-turbo on a real cluster).

Everything block-level is vectorized: the DCT/IDCT are one
``D @ blocks @ D.T`` einsum over ALL blocks at once; only the entropy
(Huffman) layer walks the bitstream in Python, which is inherent to the
format (each symbol's length depends on the previous symbol).

Reference analog: the reference pipeline ships opaque binary assets
around (reference s3-tasks/ sync scripts); this engine treats them as
typed binary columns with decode-on-demand (SURVEY.md multimodal rows).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------- #
# tables (ITU-T T.81 Annex K)
# --------------------------------------------------------------------- #
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# standard Huffman tables: (bits[1..16] counts, symbol values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II basis: X = D @ x @ D.T over 8x8 blocks."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    d *= np.sqrt(2.0 / 8.0)
    d[0] /= np.sqrt(2.0)
    return d


_D = _dct_matrix()


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality→table scaling."""
    quality = max(1, min(100, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * s + 50) // 100
    return np.clip(out, 1, 255)


def _build_code_table(bits, vals):
    """(bits, vals) → {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return codes


def _build_decode_table(bits, vals):
    """(bits, vals) → {(length, code): symbol} for the decoder."""
    table = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF full-range color transform (float64 in, float64 out)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) edge-padded to 8-multiples → (n, 8, 8) in raster order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).swapaxes(1, 2).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    bh, bw = -(-h // 8), -(-w // 8)
    plane = (
        blocks.reshape(bh, bw, 8, 8).swapaxes(1, 2).reshape(bh * 8, bw * 8)
    )
    return plane[:h, :w]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size, raw bits) per T.81 F.1.2.1 (one's-complement for
    negatives)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block_zz(bw, zz, pred, dc_tab, ac_tab):
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg_baseline(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 RGB (h, w, 3) or grayscale (h, w) → baseline JFIF bytes
    (Annex-K Huffman tables).  ``subsampling`` ∈ {"444", "420"} for
    color; ``restart_interval`` > 0 writes DRI + RSTn markers every that
    many MCUs.  Block transforms fully vectorized; the entropy write is
    the per-symbol loop the format requires."""
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encoder expects uint8 (h, w, 3) RGB or (h, w) gray")
    if img.dtype != np.uint8:
        raise ValueError("encoder expects uint8 input")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    ql = _quality_scale(Q_LUMA, quality)
    qc = _quality_scale(Q_CHROMA, quality)

    def _zz_blocks(plane, q):
        blocks = _to_blocks(plane) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        qd = np.round(coef / q[None, :, :]).astype(np.int64)
        return qd.reshape(-1, 64)[:, ZIGZAG]

    if gray:
        comps = [("y", 1, 1, 0)]
        comp_zz = {"y": _zz_blocks(img.astype(np.float64), ql)}
        bx = {"y": -(-w // 8)}
    else:
        ycc = rgb_to_ycbcr(img.astype(np.float64))
        if subsampling == "420":
            # pad to even, then 2x2 box-average the chroma planes
            ph, pw = -h % 2, -w % 2
            ycc_p = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
            cb = ycc_p[0::2, 0::2, 1:3] / 4 + ycc_p[0::2, 1::2, 1:3] / 4 \
                + ycc_p[1::2, 0::2, 1:3] / 4 + ycc_p[1::2, 1::2, 1:3] / 4
            comps = [("y", 2, 2, 0), ("cb", 1, 1, 1), ("cr", 1, 1, 1)]
            # Y blocks must tile the MCU grid (16x16): pad to 16-multiples
            yp = np.pad(
                ycc[..., 0],
                ((0, -h % 16), (0, -w % 16)),
                mode="edge",
            )
            cbp = np.pad(
                cb[..., 0],
                ((0, -cb.shape[0] % 8), (0, -cb.shape[1] % 8)),
                mode="edge",
            )
            crp = np.pad(
                cb[..., 1],
                ((0, -cb.shape[0] % 8), (0, -cb.shape[1] % 8)),
                mode="edge",
            )
            comp_zz = {
                "y": _zz_blocks(yp, ql),
                "cb": _zz_blocks(cbp, qc),
                "cr": _zz_blocks(crp, qc),
            }
            bx = {"y": yp.shape[1] // 8, "cb": cbp.shape[1] // 8,
                  "cr": crp.shape[1] // 8}
        else:
            comps = [("y", 1, 1, 0), ("cb", 1, 1, 1), ("cr", 1, 1, 1)]
            comp_zz = {
                "y": _zz_blocks(ycc[..., 0], ql),
                "cb": _zz_blocks(ycc[..., 1], qc),
                "cr": _zz_blocks(ycc[..., 2], qc),
            }
            bx = {k: -(-w // 8) for k in comp_zz}
    dc_tabs = {"y": _build_code_table(*_DC_LUM),
               "cb": _build_code_table(*_DC_CHR),
               "cr": _build_code_table(*_DC_CHR)}
    ac_tabs = {"y": _build_code_table(*_AC_LUM),
               "cb": _build_code_table(*_AC_CHR),
               "cr": _build_code_table(*_AC_CHR)}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    bw = _BitWriter()
    out_entropy = bytearray()
    pred = {c[0]: 0 for c in comps}
    rst = 0
    m = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and m and m % restart_interval == 0:
                bw.flush()
                out_entropy += bw.out
                out_entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                bw = _BitWriter()
                pred = {c[0]: 0 for c in comps}
            for name, hs, vs, _tq in comps:
                for v in range(vs):
                    for u in range(hs):
                        bi = (my * vs + v) * bx[name] + (mx * hs + u)
                        pred[name] = _encode_block_zz(
                            bw, comp_zz[name][bi], pred[name],
                            dc_tabs[name], ac_tabs[name],
                        )
            m += 1
    bw.flush()
    out_entropy += bw.out

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(ql.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, bytes([1]) + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_name, hs, vs, tq) in enumerate(comps):
        sof += bytes([i + 1, (hs << 4) | vs, tq])
    out += seg(0xFFC0, sof)
    tabs = [(0, 0, _DC_LUM), (1, 0, _AC_LUM)]
    if not gray:
        tabs += [(0, 1, _DC_CHR), (1, 1, _AC_CHR)]
    for cls, tid, (bits, vals) in tabs:
        out += seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += out_entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------- #
# decoder
# --------------------------------------------------------------------- #
class _BitReader:
    """Entropy-segment bit reader (0xFF00 unstuffed up front; RST markers
    handled by the caller via segment splits)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.take(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_baseline(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 ndarray (h, w, 3) RGB (grayscale is
    replicated to 3 channels).  SOF0 only; SOF2/progressive and
    arithmetic coding raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps = [(cid, hs, vs, tq)])
    restart = 0
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _build_decode_table(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (marker 0xFF{marker:02X}: "
                "progressive/lossless/arithmetic) — plug libjpeg here"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            # entropy data follows until the next non-RST marker
            start = pos
            segs = []
            i = pos
            while i < len(payload) - 1:
                if payload[i] == 0xFF and payload[i + 1] not in (0x00,):
                    m2 = payload[i + 1]
                    if 0xD0 <= m2 <= 0xD7:
                        segs.append(payload[start:i])
                        start = i + 2
                        i += 2
                        continue
                    segs.append(payload[start:i])
                    pos = i
                    break
                i += 1
            else:
                segs.append(payload[start:])
                pos = len(payload)
            entropy_segments = [
                s.replace(b"\xff\x00", b"\xff") for s in segs
            ]
            return _decode_scan(
                frame, scan, qt, huff_dc, huff_ac, entropy_segments, restart
            )
    raise ValueError("no SOS scan found")


def _decode_scan(frame, scan, qt, huff_dc, huff_ac, segments, restart):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    order = [by_id[cid] for cid, _, _ in scan]
    tabs = {cid: (td, ta) for cid, td, ta in scan}
    # per-component coefficient store (n_blocks, 64), MCU-interleaved fill
    store: dict[int, list] = {c[0]: [] for c in comps}
    pred = {c[0]: 0 for c in comps}
    n_mcu = mcux * mcuy
    seg_idx = 0
    br = _BitReader(segments[0])
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            seg_idx += 1
            br = _BitReader(segments[seg_idx])
            pred = {c[0]: 0 for c in comps}
        for cid, hs, vs, _tq in order:
            td, ta = tabs[cid]
            for _ in range(hs * vs):
                zz = np.zeros(64, dtype=np.int64)
                size = br.huff(huff_dc[td])
                diff = _extend(br.take(size), size)
                pred[cid] += diff
                zz[0] = pred[cid]
                k = 1
                while k < 64:
                    rs = br.huff(huff_ac[ta])
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _extend(br.take(s), s)
                    k += 1
                store[cid].append(zz)
    # dequantize + IDCT, fully vectorized per component
    planes = {}
    for cid, hs, vs, tq in comps:
        zzs = np.stack(store[cid])  # (n, 64) zigzag order
        coef = np.zeros_like(zzs)
        coef[:, ZIGZAG] = zzs
        coef = coef.reshape(-1, 8, 8) * qt[tq][None, :, :]
        blocks = np.einsum("ji,njk,kl->nil", _D, coef.astype(np.float64), _D)
        blocks += 128.0
        # blocks arrive MCU-interleaved: (mcuy, mcux, vs, hs) grid
        bw_c = mcux * hs
        bh_c = mcuy * vs
        grid = np.zeros((bh_c, bw_c, 8, 8))
        i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for v in range(vs):
                    for u in range(hs):
                        grid[my * vs + v, mx * hs + u] = blocks[i]
                        i += 1
        plane = grid.swapaxes(1, 2).reshape(bh_c * 8, bw_c * 8)
        # upsample to full resolution (nearest — what the fixtures need;
        # a real viewer would use fancy upsampling)
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[cid] = plane[:h, :w]
    if len(comps) == 1:
        y = np.clip(np.round(planes[comps[0][0]]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack([planes[c[0]] for c in comps], axis=-1)
    rgb = ycbcr_to_rgb(ycc)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
