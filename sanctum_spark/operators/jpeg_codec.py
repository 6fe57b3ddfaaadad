"""Pure-Python baseline JPEG codec (ITU T.81 sequential DCT, 8-bit).

Why this exists: the container has no imaging library (PIL/cv2/imageio
all absent — probed every round), and the multimodal surface previously
stubbed JPEG behind ``NotImplementedError``.  Baseline JPEG needs only
integer/byte plumbing plus an 8x8 DCT, all expressible in numpy — so,
like the PNG/BMP/PPM/WAV codecs in ``multimodal.py``, it is implemented
for real.

Scope and honesty:

- **Decoder** (``decode_jpeg``): baseline sequential DCT (SOF0), 8-bit,
  1 or 3 components, any sampling factors in {1,2} (4:4:4, 4:2:2,
  4:2:0), generic DQT/DHT parsing (so streams from OTHER encoders with
  standard Annex-K tables decode too), DRI/RSTn restart markers,
  APPn/COM skipping, 0xFF00 byte-stuffing.  Progressive (SOF2),
  arithmetic coding (SOF9+), 12-bit precision, and 4-component CMYK
  raise ``NotImplementedError``; malformed/truncated streams raise
  ``ValueError``.
- **Encoder** (``encode_jpeg``): grayscale or RGB, 4:4:4 or 4:2:0,
  quality 1-100, optional restart interval.  It writes its OWN valid
  canonical Huffman tables (DC: twelve 4-bit codes; AC: 162 8-bit
  codes) and its own quantization tables into DHT/DQT — any tables are
  spec-legal since the stream carries them; this deliberately avoids
  transcribing the Annex-K constants (nothing in this env to verify a
  transcription against), at a few percent compression cost.
- **Verification**: the pair is self-consistent (round-trips within the
  quantization-error bound, pinned in tests plus param-fuzz family F at
  random shapes/qualities/subsampling/restart intervals), and the DCT is
  pinned against a direct O(n^4) evaluation of the DCT-II definition.
  Spec-compliance against external encoders is untestable in this env
  (no codec libs, no network); the decoder's generic table/marker
  parsing follows T.81's structure to maximize the chance real files
  decode, and unsupported variants fail loudly, never silently wrong.

Reference for parity bookkeeping: the reference engine has no media
codecs at all (its only I/O is msgpack events — reference src/zlmp.zig);
this module serves SURVEY.md §2's multimodal-column roadmap item.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ---------------------------------------------------------------- tables

# Zigzag scan order computed from its definition (diagonals alternate
# direction; even u+v runs bottom-left -> top-right) — no transcribed
# constant table to get wrong.
_ZIGZAG = np.array(
    sorted(
        range(64),
        key=lambda i: (
            (i >> 3) + (i & 7),
            -(i & 7) if ((i >> 3) + (i & 7)) % 2 else (i & 7),
        ),
    ),
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Orthonormal DCT-II matrix: F = C @ f @ C.T, f = C.T @ F @ C.
_C = np.array(
    [
        [
            math.sqrt((1.0 if u else 0.5) / 4.0)
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Luma/chroma quantization tables at an IJG-style quality scaling.

    The base shape is a plain frequency ramp (coarser for chroma) — NOT
    the Annex-K tables (see module docstring); any table is valid JPEG
    because DQT ships it with the stream."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    u = np.arange(8)
    ramp = u[:, None] + u[None, :]
    ql = np.clip(np.floor(((1 + 2 * ramp) * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor(((1 + 4 * ramp) * scale + 50) / 100), 1, 255)
    return ql.astype(np.int32), qc.astype(np.int32)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 canonical assignment (C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# Encoder Huffman tables: flat canonical codes (all DC symbols 4 bits,
# all 162 AC symbols 8 bits).  Kraft sums 12/16 and 162/256 are < 1 and
# the all-ones code of each length is unused, so both are valid T.81
# tables; the decoder reads them back from DHT like any other table.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALUES = list(range(12))
_AC_VALUES = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_VALUES.sort()
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALUES)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALUES)


# ---------------------------------------------------------------- bits


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    """Reads one entropy-coded segment (byte-stuffing already removed)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------- encode


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (H//8 * W//8, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_block(
    writer: _BitWriter, blk: np.ndarray, qt: np.ndarray, dc_pred: int
) -> int:
    coeffs = _C @ (blk - 128.0) @ _C.T
    q = np.round(coeffs / qt).astype(np.int64)
    zz = q.ravel()[_ZIGZAG]
    # baseline AC size caps at 10 (DC diff at 11); the degenerate
    # max-energy block can quantize to 1024 at qt=1 — clamp (legal lossy
    # encoder choice) instead of emitting an out-of-range category
    zz[1:] = np.clip(zz[1:], -1023, 1023)
    dc = int(zz[0])
    diff = dc - dc_pred
    s = _category(diff)
    code, length = _DC_CODES[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = _AC_CODES[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = _AC_CODES[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = _AC_CODES[0x00]  # EOB
        writer.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits: list[int], values: list[int]) -> bytes:
    return bytes([tc_th] + bits + values)


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """Encode HxWx3 uint8 RGB (or HxW grayscale) to baseline JPEG bytes.

    ``subsampling``: "4:4:4", "4:2:2", or "4:2:0" (ignored for
    grayscale).  ``restart_interval``: emit DRI + RSTn every N MCUs when
    > 0 (exists mainly so the decoder's restart path has a round-trip
    exerciser)."""
    arr = np.asarray(pixels)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"expected HxWx3 RGB or HxW gray, got {arr.shape}")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        raise ValueError(f"image {h}x{w} exceeds the baseline JPEG 65535 limit")
    if not (0 <= restart_interval <= 65535):
        raise ValueError(f"restart_interval {restart_interval} out of range 0..65535")
    ql, qc = _quant_tables(quality)

    sub_h = 2 if (not gray and subsampling != "4:4:4") else 1
    sub_v = 2 if (not gray and subsampling == "4:2:0") else 1
    mcu_h, mcu_w = 8 * sub_v, 8 * sub_h
    ph = (h + mcu_h - 1) // mcu_h * mcu_h
    pw = (w + mcu_w - 1) // mcu_w * mcu_w
    pad = ((0, ph - h), (0, pw - w)) + (((0, 0),) if not gray else ())
    padded = np.pad(arr.astype(np.float64), pad, mode="edge")

    if gray:
        planes = [padded]
        samp = [(1, 1)]
        qts = [ql]
    else:
        ycc = _rgb_to_ycbcr(padded)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if sub_v == 2:
            cb = cb.reshape(ph // 2, 2, pw, 1).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw, 1).mean(axis=(1, 3))
        if sub_h == 2:
            cb = cb.reshape(cb.shape[0], 1, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0], 1, pw // 2, 2).mean(axis=(1, 3))
        samp = [(sub_h, sub_v), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [ql, qc, qc]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(ql.ravel()[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qc.ravel()[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0x00, _DC_BITS, _DC_VALUES))
    out += _seg(0xC4, _dht_payload(0x10, _AC_BITS, _AC_VALUES))
    if not gray:
        out += _seg(0xC4, _dht_payload(0x01, _DC_BITS, _DC_VALUES))
        out += _seg(0xC4, _dht_payload(0x11, _AC_BITS, _AC_VALUES))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcux = pw // (8 * max_h)
    mcuy = ph // (8 * max_v)
    comp_blocks = []
    for plane, (sh, sv) in zip(planes, samp):
        bl = _blocks(plane)
        bw = plane.shape[1] // 8
        comp_blocks.append((bl, bw, sh, sv))

    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            out += writer.flush()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            writer = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            bl, bw, sh, sv = comp_blocks[ci]
            for by in range(sv):
                for bx in range(sh):
                    idx = (my * sv + by) * bw + (mx * sh + bx)
                    preds[ci] = _encode_block(writer, bl[idx], qts[ci], preds[ci])
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode


def _parse_dht(payload: bytes, tables: dict) -> None:
    pos = 0
    while pos < len(payload):
        tc_th = payload[pos]
        bits = list(payload[pos + 1 : pos + 17])
        if len(bits) != 16:
            raise ValueError("JPEG DHT truncated")
        n = sum(bits)
        values = list(payload[pos + 17 : pos + 17 + n])
        if len(values) != n:
            raise ValueError("JPEG DHT truncated")
        codes = _canonical_codes(bits, values)
        tables[(tc_th >> 4, tc_th & 0x0F)] = {
            (length, code): sym for sym, (code, length) in codes.items()
        }
        pos += 17 + n


def _parse_dqt(payload: bytes, tables: dict) -> None:
    pos = 0
    while pos < len(payload):
        pq_tq = payload[pos]
        if pq_tq >> 4:
            raise NotImplementedError("16-bit quantization tables not supported")
        raw = np.frombuffer(payload[pos + 1 : pos + 65], dtype=np.uint8)
        if len(raw) != 64:
            raise ValueError("JPEG DQT truncated")
        qt = np.zeros(64, dtype=np.int32)
        qt[_ZIGZAG] = raw  # DQT stores zigzag order
        tables[pq_tq & 0x0F] = qt.reshape(8, 8)
        pos += 65


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline sequential JPEG bytes to an HxWx3 uint8 RGB array
    (grayscale replicates to 3 channels, matching decode_image's
    contract).  See the module docstring for supported scope."""
    data = payload or b""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], dict] = {}
    sof = None
    dri = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1] if pos + 1 < len(data) else None
        if marker is None:
            raise ValueError("JPEG truncated at marker")
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # stray SOI / TEM / RSTn: standalone markers, no length field
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG has no scan data")
        if pos + 4 > len(data):
            raise ValueError("JPEG truncated in segment header")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xC4:
            _parse_dht(body, hts)
        elif marker == 0xDB:
            _parse_dqt(body, qts)
        elif marker == 0xC0 or marker == 0xC1:
            sof = body
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG coding process SOF{marker - 0xC0} not supported"
            )
        elif marker == 0xDD:
            if len(body) != 2:
                raise ValueError("JPEG DRI segment malformed")
            (dri,) = struct.unpack(">H", body)
        elif marker == 0xDA:
            scan = (body, pos + 2 + seglen)
            break
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    if len(sof) < 6:
        raise ValueError("JPEG SOF segment malformed")
    precision, h, w, ncomp = struct.unpack_from(">BHHB", sof, 0)
    if h == 0 or w == 0:
        raise ValueError("JPEG declares an empty frame")
    if precision != 8:
        raise NotImplementedError(f"JPEG precision {precision} not supported")
    if ncomp not in (1, 3):
        raise NotImplementedError(f"{ncomp}-component JPEG not supported")
    comps = []
    for i in range(ncomp):
        cid, hv, tq = sof[6 + 3 * i : 9 + 3 * i]
        sh, sv = hv >> 4, hv & 0x0F
        if sh not in (1, 2) or sv not in (1, 2):
            raise NotImplementedError(f"sampling factor {sh}x{sv} not supported")
        comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})

    sos_body, entropy_start = scan
    if not sos_body:
        raise ValueError("JPEG SOS segment malformed")
    ns = sos_body[0]
    if ns != ncomp:
        raise NotImplementedError("multi-scan JPEG not supported")
    for i in range(ns):
        cs, tdta = sos_body[1 + 2 * i : 3 + 2 * i]
        for c in comps:
            if c["id"] == cs:
                c["td"], c["ta"] = tdta >> 4, tdta & 0x0F
                break
        else:
            raise ValueError(f"JPEG scan component id {cs} not in frame")

    # split the entropy stream into restart segments, removing stuffing
    segments: list[bytes] = []
    cur = bytearray()
    p = entropy_start
    while p < len(data):
        b = data[p]
        if b != 0xFF:
            cur.append(b)
            p += 1
            continue
        nxt = data[p + 1] if p + 1 < len(data) else None
        if nxt == 0x00:
            cur.append(0xFF)
            p += 2
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            p += 2
        else:  # EOI or next marker ends the scan
            break
    segments.append(bytes(cur))

    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcux = (w + 8 * max_h - 1) // (8 * max_h)
    mcuy = (h + 8 * max_v - 1) // (8 * max_v)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["plane"] = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.float64)
        if c["tq"] not in qts:
            raise ValueError(f"JPEG references missing quant table {c['tq']}")

    seg_i = 0
    reader = _BitReader(segments[0])
    preds = [0] * ncomp
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if dri and m and m % dri == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_i])
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            dc_tab = hts.get((0, c.get("td", 0)))
            ac_tab = hts.get((1, c.get("ta", 0)))
            if dc_tab is None or ac_tab is None:
                raise ValueError("JPEG references missing Huffman table")
            qt = qts[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    s = reader.decode_symbol(dc_tab)
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    preds[ci] += diff
                    zz = np.zeros(64, dtype=np.float64)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tab)
                        if rs == 0x00:  # EOB
                            break
                        run, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if run != 15:
                                raise ValueError("invalid JPEG AC symbol")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overrun")
                        zz[k] = _extend(reader.read_bits(size), size)
                        k += 1
                    coeffs = (zz[_UNZIGZAG].reshape(8, 8)) * qt
                    blk = _C.T @ coeffs @ _C + 128.0
                    y0, x0 = (my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8
                    c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk

    # upsample to full resolution and crop
    full = []
    for c in comps:
        plane = c["plane"]
        ry, rx = max_v // c["v"], max_h // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if ncomp == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(np.stack(full, axis=-1))
