"""Raster decode dispatch: sniff magic bytes, route to the pure-numpy
codecs. This is what the media-resolving operators (imgstage,
splitpages, multimodal) call so JPEG page scans (the reference's
schoollist examples) and PNG renders (catalogue + synthetic corpus) go
through one entry point.

Reference chain parity: ImageProc._load_imgfile wraps cv2.imread
(imgproc.py:444-451), which dispatches by content the same way; our JPEG
decode matches libjpeg within ±1 LSB (validated against the reference's
committed cv2-written PNG overlays of the same scans).
"""

import numpy as np

from .png import decode_png
from .jpeg import decode_jpeg

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_raster(buf: bytes, luma_only: bool = False) -> np.ndarray:
    """Image blob -> uint8 array. ``luma_only`` returns (H, W) grayscale
    directly where the codec can (JPEG skips the chroma IDCT — the
    Canny/Hough consumers only need luma)."""
    buf = bytes(buf)
    if buf[:8] == _PNG_SIG:
        img = decode_png(buf)
        if luma_only and img.ndim == 3:
            # BT.601, matching kernels.imgproc.grayscale
            f = img.astype(np.float32)
            y = (np.float32(0.299) * f[..., 0] + np.float32(0.587) * f[..., 1]
                 + np.float32(0.114) * f[..., 2])
            return np.clip(np.round(y), 0, 255).astype(np.uint8)
        return img
    if buf[:2] == b"\xff\xd8":
        return decode_jpeg(buf, luma_only=luma_only)
    raise NotImplementedError(
        "unsupported image codec (only PNG and baseline JPEG decoders "
        "exist in this runtime); magic=%r" % buf[:4])
