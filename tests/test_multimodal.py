

def test_png_roundtrip_and_all_filters():
    import struct as _struct
    import zlib

    import numpy as np

    from sanctum_spark.operators.multimodal import (
        PNG_SIG,
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()
    assert (decode_image(encode_png(img)) == img).all()  # dispatch by magic

    # hand-filter each row with filter y%5 (None/Sub/Up/Average/Paeth)
    # and assert the decoder unfilters all five correctly
    h, w, c = img.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        f = y % 5
        out = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            out[x] = (cur[x] - pred) & 0xFF
        raw += bytes([f]) + out.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return _struct.pack(">I", len(body)) + ctype + body + _struct.pack(">I", crc)

    png = (
        PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img).all()


def test_png_grayscale_and_rgba_and_errors():
    import struct as _struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from sanctum_spark.operators.multimodal import PNG_SIG, decode_png

    def make(color, channels, w=4, h=3):
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

        def chunk(ctype, body):
            crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
            return (
                _struct.pack(">I", len(body)) + ctype + body + _struct.pack(">I", crc)
            )

        return px, (
            PNG_SIG
            + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    gray, png_gray = make(0, 1)
    out = decode_png(png_gray)
    assert out.shape == (3, 4, 3) and (out[:, :, 0] == gray[:, :, 0]).all()

    rgba, png_rgba = make(6, 4)
    out = decode_png(png_rgba)
    assert (out == rgba[:, :, :3]).all()

    with _pytest.raises(ValueError):
        decode_png(b"nope")
    with _pytest.raises(ValueError):
        decode_png(PNG_SIG + b"\x00" * 20)  # no IHDR/IDAT chunks


def test_truncated_ihdr_degrades_not_crashes():
    import struct as _struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from sanctum_spark.operators.multimodal import PNG_SIG, decode_image, decode_png

    # IHDR declares 13 bytes but the payload is truncated mid-chunk
    bad = PNG_SIG + _struct.pack(">I", 13) + b"IHDR" + b"\x00\x00"
    with _pytest.raises(ValueError):  # not struct.error
        decode_png(bad)
    fake = decode_image(bad, fake=True)  # falls through to the fake decoder
    assert fake.shape == (8, 8, 3)
