"""Baseline JPEG codec pins (sanctum_spark/operators/jpeg_codec.py).

The env has no imaging library, so spec-compliance against an external
encoder is untestable here (documented in the codec's module docstring);
these tests pin what IS checkable offline:

- the DCT matrix against a direct O(n^4) evaluation of the DCT-II
  definition (independent formula, no shared code);
- encode->decode round-trips within quantization-error bounds across
  gray/RGB, 4:4:4/4:2:0, qualities, non-multiple-of-8/16 shapes, and
  restart intervals (4:2:0 tolerance asserted on smooth-chroma images
  only — destroying per-pixel chroma noise is what 2x2 subsampling IS);
- decoder error discipline: truncation/garbage -> ValueError,
  progressive/12-bit/CMYK -> NotImplementedError, never a wrong array;
- decode_image magic dispatch.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from sanctum_spark.operators.jpeg_codec import _C, decode_jpeg, encode_jpeg
from sanctum_spark.operators.multimodal import decode_image


def test_dct_matches_definition():
    rng = np.random.default_rng(1)
    f = rng.uniform(-128, 127, (8, 8))
    F = _C @ f @ _C.T
    D = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = sum(
                f[x, y]
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
                for x in range(8)
                for y in range(8)
            )
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            D[u, v] = 0.25 * cu * cv * s
    assert np.abs(F - D).max() < 1e-9
    # orthonormal: inverse is the transpose
    assert np.abs(_C.T @ F @ _C - f).max() < 1e-9


def test_gray_roundtrip_noise():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95, subsampling="4:4:4"))
    assert dec.shape == (24, 17, 3)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 3
    assert (dec[:, :, 0] == dec[:, :, 1]).all()  # gray replicates


def test_rgb_444_roundtrip_noise():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:4:4"))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 10


def test_rgb_420_roundtrip_smooth_and_odd_size():
    yy, xx = np.mgrid[0:33, 0:46]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)
    for q, tol in ((95, 6), (75, 12)):
        dec = decode_jpeg(encode_jpeg(img, quality=q, subsampling="4:2:0"))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol


def test_flat_image_exact_at_q100():
    flat = np.full((16, 16, 3), 130, np.uint8)
    dec = decode_jpeg(encode_jpeg(flat, quality=100, subsampling="4:4:4"))
    assert (dec == flat).all()


def test_extreme_shapes():
    one = np.array([[[200, 10, 50]]], np.uint8)
    assert (decode_jpeg(encode_jpeg(one, quality=95)) == one).all()
    rng = np.random.default_rng(4)
    row = rng.integers(0, 256, (1, 300, 3), np.uint8)
    dec = decode_jpeg(encode_jpeg(row, quality=95, subsampling="4:4:4"))
    assert dec.shape == row.shape
    assert np.abs(dec.astype(int) - row.astype(int)).max() <= 10


def test_422_roundtrip():
    """4:2:2 exercises the decoder's asymmetric (2,1) sampling path —
    gray-as-RGB keeps chroma constant so subsampling is lossless."""
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (21, 35), dtype=np.uint8)
    g3 = np.stack([g, g, g], axis=-1)
    dec = decode_jpeg(
        encode_jpeg(g3, quality=92, subsampling="4:2:2", restart_interval=2)
    )
    assert dec.shape == g3.shape
    assert np.abs(dec.astype(int) - g3.astype(int)).max() <= 8


def test_restart_interval_roundtrip():
    yy, xx = np.mgrid[0:33, 0:46]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)
    enc = encode_jpeg(img, quality=90, subsampling="4:2:0", restart_interval=2)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc  # DRI + RST0 present
    dec = decode_jpeg(enc)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_decoder_error_discipline():
    img = np.full((8, 8, 3), 99, np.uint8)
    enc = encode_jpeg(img, quality=90)
    for bad in (b"", b"\xff\xd8", b"\xff\xd8\xff\xd9", b"garbage", enc[: len(enc) // 2]):
        with pytest.raises(ValueError):
            decode_jpeg(bad)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(enc.replace(b"\xff\xc0", b"\xff\xc2", 1))


def test_decoder_tolerates_trailing_bytes_and_rejects_16bit_dqt():
    img = np.full((10, 10, 3), 42, np.uint8)
    enc = encode_jpeg(img, quality=90)
    # trailing garbage after EOI and a stripped EOI both still decode
    # (the scan is complete either way)
    for payload in (enc + b"trailing-garbage", enc[:-2]):
        assert np.abs(decode_jpeg(payload).astype(int) - 42).max() <= 2
    i = enc.index(b"\xff\xdb")
    bad = enc[: i + 4] + bytes([0x10 | enc[i + 4]]) + enc[i + 5 :]
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(bad)


def test_decode_image_dispatches_jpeg():
    img = np.full((9, 9, 3), 77, np.uint8)
    dec = decode_image(encode_jpeg(img, quality=95))
    assert dec.shape == (9, 9, 3)
    assert np.abs(dec.astype(int) - 77).max() <= 2
    # malformed JPEG magic still raises without fake=True
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8junk")
    # and falls through to the deterministic fake with fake=True
    assert decode_image(b"\xff\xd8junk", fake=True).shape == (8, 8, 3)


def test_decoder_corruption_hardening():
    """Random byte corruption must decode or raise ValueError/
    NotImplementedError — never a parser crash (struct.error,
    IndexError) or a wrong-shaped array.  (The 12k-trial sweep lives in
    param-fuzz family F; this is the deterministic suite core.)"""
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (24, 31, 3), np.uint8)
    enc = encode_jpeg(img, quality=88, subsampling="4:2:0", restart_interval=2)
    for trial in range(120):
        b = bytearray(enc)
        mode = trial % 3
        if mode == 0:
            for _ in range(rng.integers(1, 6)):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
        elif mode == 1:
            b = b[: rng.integers(1, len(b))]
        else:
            i = int(rng.integers(0, len(b)))
            j = int(rng.integers(i, min(len(b), i + 40)))
            b[i:j] = bytes(int(x) for x in rng.integers(0, 256, j - i))
        try:
            out = decode_jpeg(bytes(b))
            assert out.ndim == 3 and out.shape[2] == 3 and 0 not in out.shape
        except (ValueError, NotImplementedError):
            pass


def test_encoder_determinism_and_validation():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 20, 3), np.uint8)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(img, subsampling="4:1:1")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))


# T.81 Figure A.6 zigzag sequence, independently derived by the diagonal
# walk (odd diagonals top-right -> bottom-left, even diagonals
# bottom-left -> top-right).  Pinned as a literal so a transposed table
# (which round-trips in-repo but scrambles interop) cannot reappear.
_T81_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_t81():
    from sanctum_spark.operators.jpeg_codec import _UNZIGZAG, _ZIGZAG

    assert list(_ZIGZAG) == _T81_ZIGZAG
    # independent re-derivation by walking the matrix (no sort-key reuse)
    walk = []
    for d in range(15):
        rows = range(max(0, d - 7), min(d, 7) + 1)
        rows = rows if d % 2 else reversed(rows)  # even diag: row descending
        walk.extend(r * 8 + (d - r) for r in rows)
    assert walk == _T81_ZIGZAG
    assert [int(_ZIGZAG[int(u)]) for u in _UNZIGZAG] == list(range(64))


def test_marker_loop_fill_bytes_and_tem():
    """T.81 B.1.1.2 fill bytes (0xFF padding before a marker) and the
    standalone TEM marker (0x01, no length field) must both parse."""
    img = np.full((8, 8, 3), 50, np.uint8)
    enc = encode_jpeg(img, quality=90)
    i = enc.index(b"\xff\xdb")  # before the first DQT
    with_fill = enc[:i] + b"\xff\xff\xff" + enc[i:]
    assert np.abs(decode_jpeg(with_fill).astype(int) - 50).max() <= 2
    with_tem = enc[:i] + b"\xff\x01" + enc[i:]
    assert np.abs(decode_jpeg(with_tem).astype(int) - 50).max() <= 2


def test_sos_unknown_component_raises():
    img = np.full((8, 8), 120, np.uint8)
    enc = encode_jpeg(img, quality=90)
    i = enc.index(b"\xff\xda")
    # SOS payload: len(2) ns(1) then [cs td/ta]; component id byte is i+5
    assert enc[i + 5] == 1
    bad = enc[: i + 5] + b"\x07" + enc[i + 6 :]
    with pytest.raises(ValueError, match="scan component"):
        decode_jpeg(bad)


def test_encode_rejects_oversize_dimensions_and_dri():
    row = np.zeros((1, 70000, 3), np.uint8)
    with pytest.raises(ValueError, match="65535"):
        encode_jpeg(row)
    img = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg(img, restart_interval=70000)
