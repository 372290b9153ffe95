"""Minimal pure-python PNG codec (stdlib zlib/struct only).

The execution environment has no OpenCV/Pillow, so synthetic page images
(the ``media_ref`` targets of kind='image' spans) are encoded/decoded here.
Supports 8-bit grayscale and RGB, no interlace; encoder always writes
filter-0 rows; decoder implements the five standard PNG filters so any
conforming baseline PNG of those color types can be read.

Also provides the header-sniffing size probe reproducing
/root/reference/pdftabextract/common.py:322-359 (get_image_size) — with the
reference's bytes-vs-str JPEG signature bug fixed, as flagged in
SURVEY.md §2.8 (the quirk is unreachable from the verified surface).
"""

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """uint8 array (H,W) grayscale or (H,W,3) RGB -> PNG bytes.
    ``level``: zlib level — use 1 for internal intermediates (split-page
    blobs) where encode speed matters and the bytes never leave the
    job."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = a.astype(np.uint8)
    if a.ndim == 2:
        color_type = 0
        h, w = a.shape
        raw_rows = a
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type = 2
        h, w = a.shape[:2]
        raw_rows = a.reshape(h, w * 3)
    else:
        raise ValueError("expected (H,W) gray or (H,W,3) RGB uint8")

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    filt = np.zeros((h, raw_rows.shape[1] + 1), dtype=np.uint8)
    filt[:, 1:] = raw_rows
    idat = zlib.compress(filt.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    rows = data.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need sequential left
            line = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                line[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError("unknown PNG filter type %d" % ftype)
        out[y] = line.astype(np.uint8)
    return out


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H,W) gray or (H,W,3) RGB.

    Supported: grayscale (color type 0) at bit depth 1/2/4/8, RGB (2) at
    8, palette (3) at 1/2/4/8, gray+alpha (4) and RGBA (6) at 8 — alpha
    is dropped (cv2.imread IMREAD_COLOR parity, the reference's loader).
    Interlaced and 16-bit stay unsupported (pdftohtml/scan tooling never
    emits them). Sub-byte rows are unfiltered at the byte level (PNG
    filters operate on bytes with bpp=1 below 8 bits) then bit-unpacked;
    grayscale samples scale to 8 bits by 255/(2^d - 1) (exact integers).
    The reference's own example data needs this: its page scans include
    1-bit PNGs (e.g. schoolinspections samplepage.png,
    catalogue ALA1934_RR-excerpt.pdf-000.png)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    depth = color_type = None
    idat = b""
    palette = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if interlace != 0 or color_type not in _CHANNELS:
                raise ValueError("unsupported PNG variant")
            if color_type in (2, 4, 6) and depth != 8:
                raise ValueError("unsupported PNG variant")
            if color_type in (0, 3) and depth not in (1, 2, 4, 8):
                raise ValueError("unsupported PNG variant")
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if color_type is None:
        raise ValueError("missing IHDR")
    channels = _CHANNELS[color_type]
    if depth == 8:
        stride, bpp = w * channels, channels
    else:
        stride, bpp = (w * depth + 7) // 8, 1
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    px = _unfilter(raw, h, stride, bpp)

    if depth < 8:
        bits = np.unpackbits(px, axis=1)[:, :w * depth]
        if depth == 1:
            idx = bits
        else:
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            idx = (bits.reshape(h, w, depth) * weights).sum(axis=2)
        if color_type == 0:
            return (idx * (255 // ((1 << depth) - 1))).astype(np.uint8)
        if palette is None:
            raise ValueError("paletted PNG without PLTE")
        return palette[idx.astype(np.int64)]

    arr = px.reshape(h, w, channels)
    if color_type == 0:
        return arr[:, :, 0]
    if color_type == 2:
        return arr
    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG without PLTE")
        return palette[arr[:, :, 0].astype(np.int64)]
    if color_type == 4:
        return arr[:, :, 0]
    return arr[:, :, :3].copy()


def get_image_size(head24: bytes):
    """Probe (width, height) from the first 24 bytes of PNG/GIF, or None.
    (JPEG needs more bytes; callers with full buffers can use
    get_image_size_from_bytes.) Parity: common.py:322-359."""
    head = head24[:24]
    if len(head) != 24:
        return None
    if head[:8] == _PNG_SIG:
        if struct.unpack(">i", head[4:8])[0] != 0x0D0A1A0A:
            return None
        return struct.unpack(">ii", head[16:24])
    if head[:6] in (b"GIF87a", b"GIF89a"):
        return struct.unpack("<HH", head[6:10])
    return None


def get_image_size_from_bytes(buf: bytes):
    """Full-buffer probe: PNG/GIF via header, JPEG via SOF scan."""
    size = get_image_size(buf[:24])
    if size is not None:
        return size
    if buf[:3] == b"\xff\xd8\xff":  # JPEG SOI
        pos = 2
        while pos + 9 < len(buf):
            if buf[pos] != 0xFF:
                pos += 1
                continue
            marker = buf[pos + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", buf[pos + 5:pos + 9])
                return w, h
            (seg,) = struct.unpack(">H", buf[pos + 2:pos + 4])
            pos += 2 + seg
    return None
