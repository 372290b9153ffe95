"""decode_png variant coverage: sub-byte depths, palette, alpha-drop —
the reference's own example data includes 1-bit page scans."""

import os
import struct
import zlib

import numpy as np
import pytest

from pdftabextract_spark.kernels.png import decode_png

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def _png(w, h, depth, ct, rows, palette=None):
    """rows: list of (filter_type, row_bytes)."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(r) for f, r in rows)
    out = SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", bytes(palette))
    out += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return out


def test_gray_1bit_with_filters():
    # 10px wide: 2 bytes/row. Row1 None-filtered, row2 Sub, row3 Up.
    r1 = [0b10110010, 0b01000000]
    row2_raw = [r1[0], (0x40 - r1[0]) & 0xFF]    # Sub reconstructs [r1[0], 0x40]
    png = _png(10, 3, 1, 0, [(0, r1), (1, row2_raw), (2, [0, 0])])
    img = decode_png(png)
    assert img.shape == (3, 10) and img.dtype == np.uint8
    bits1 = [1, 0, 1, 1, 0, 0, 1, 0, 0, 1]
    assert list(img[0] // 255) == bits1
    # row2: sub-filter reconstructs the same two bytes as row1
    assert np.array_equal(img[1], img[0])
    # row3: Up filter copies row2
    assert np.array_equal(img[2], img[1])


@pytest.mark.parametrize("depth,vals", [(2, [0, 1, 2, 3]), (4, [0, 5, 10, 15])])
def test_gray_subbyte_scaling(depth, vals):
    per_byte = 8 // depth
    packed = 0
    for i, v in enumerate(vals[:per_byte]):
        packed |= v << (8 - (i + 1) * depth)
    row = [packed] + [0] * ((4 * depth + 7) // 8 - 1)
    png = _png(4, 1, depth, 0, [(0, row)])
    img = decode_png(png)
    scale = 255 // ((1 << depth) - 1)
    assert list(img[0][:per_byte]) == [v * scale for v in vals[:per_byte]]


def test_palette_4bit_and_8bit():
    pal = [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30]
    png4 = _png(3, 1, 4, 3, [(0, [0x01, 0x20])], palette=pal)
    img4 = decode_png(png4)
    assert img4.shape == (1, 3, 3)
    assert [tuple(p) for p in img4[0]] == [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    png8 = _png(2, 1, 8, 3, [(0, [3, 0])], palette=pal)
    img8 = decode_png(png8)
    assert [tuple(p) for p in img8[0]] == [(10, 20, 30), (255, 0, 0)]


def test_alpha_variants_dropped():
    rgba = _png(2, 1, 8, 6, [(0, [1, 2, 3, 255, 4, 5, 6, 0])])
    img = decode_png(rgba)
    assert img.shape == (1, 2, 3)
    assert [tuple(p) for p in img[0]] == [(1, 2, 3), (4, 5, 6)]
    ga = _png(2, 1, 8, 4, [(0, [200, 255, 100, 0])])
    img2 = decode_png(ga)
    assert img2.shape == (1, 2) and list(img2[0]) == [200, 100]


REF_1BIT = "/root/reference/examples/schoolinspections_imageproc/samplepage.png"
REF_ALA0 = "/root/reference/examples/catalogue_30s/data/ALA1934_RR-excerpt.pdf-000.png"
REF_ALA8 = "/root/reference/examples/catalogue_30s/data/ALA1934_RR-excerpt.pdf-1_1.png"


@pytest.mark.skipif(not os.path.exists(REF_1BIT),
                    reason="reference example data not present")
def test_reference_1bit_scans_decode():
    img = decode_png(open(REF_1BIT, "rb").read())
    assert img.shape == (1263, 892)
    assert set(np.unique(img)) <= {0, 255}
    # a real scan has both ink and paper
    frac_black = (img == 0).mean()
    assert 0.01 < frac_black < 0.6

    # ALA page 1: the 1-bit render must agree with the 8-bit render of
    # the SAME page (independent files) after thresholding
    one = decode_png(open(REF_ALA0, "rb").read())
    eight = decode_png(open(REF_ALA8, "rb").read())
    assert one.shape == eight.shape[:2] == (3505, 2480)
    gray8 = eight.mean(axis=2)
    agree = ((one > 127) == (gray8 > 127)).mean()
    assert agree > 0.9, agree


def test_missing_ihdr_raises_valueerror():
    """ADVICE r3: valid signature but no IHDR must hit the module's
    ValueError contract, not KeyError/TypeError."""
    bad = SIG + _chunk(b"IDAT", zlib.compress(b"\x00\x00")) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="missing IHDR"):
        decode_png(bad)
