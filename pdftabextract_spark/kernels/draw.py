"""Debug overlay rendering — the engine-native equivalent of the
reference's visual diagnostics (draw_lines / draw_line_clusters /
_baseimg_for_drawing, /root/reference/pdftabextract/imgproc.py:364-442),
which are the first tool a user reaches for when tuning Hough/cluster
thresholds on a new corpus. Pure numpy (no cv2 in the runtime): polar
lines are projected to canvas segments with the same
project_polarcoord_lines math the reference passes to cv2.line, then
rasterized by dense sampling (<=1px from the ideal segment — cv2.line's
8-connected Bresenham has the same bound).
"""

import numpy as np

from .geom import project_polarcoord_lines

# deterministic cluster palette (the reference uses random_color,
# imgproc.py:406-411 — deterministic is strictly better for diffing)
CLUSTER_PALETTE = np.array([
    (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
    (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
    (210, 245, 60), (250, 190, 190), (0, 128, 128), (170, 110, 40),
], dtype=np.uint8)


def to_rgb(img):
    """Grayscale (H,W) or RGB (H,W,3) -> fresh RGB canvas (copy —
    _baseimg_for_drawing semantics: never draw on the source)."""
    a = np.asarray(img)
    if a.ndim == 2:
        return np.repeat(a[:, :, None], 3, axis=2).astype(np.uint8)
    return a.astype(np.uint8).copy()


def draw_segment(img, x0, y0, x1, y1, color, width=1):
    """Rasterize one segment in place by dense sampling (n = max span + 1
    points, rounded) — every painted pixel is within 0.5px of the ideal
    line; ``width`` thickens symmetrically along the minor axis."""
    h, w = img.shape[:2]
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.rint(np.linspace(x0, x1, n)).astype(np.int64)
    ys = np.rint(np.linspace(y0, y1, n)).astype(np.int64)
    half = width // 2
    col = np.asarray(color, dtype=np.uint8)
    for d in range(-half, width - half):
        if abs(x1 - x0) >= abs(y1 - y0):
            yy, xx = ys + d, xs        # mostly-horizontal: thicken in y
        else:
            yy, xx = ys, xs + d
        m = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        img[yy[m], xx[m]] = col


def draw_polar_lines(img, lines, color=(255, 0, 0), width=2):
    """Draw (rho, theta) Hough lines projected onto the canvas —
    draw_lines parity (imgproc.py:375-385: project_polarcoord_lines +
    cv2.line). ``lines`` is any iterable of rows whose first two fields
    are rho, theta. Mutates and returns ``img``."""
    h, w = img.shape[:2]
    pts = project_polarcoord_lines([(l[0], l[1]) for l in lines], w, h)
    for p1, p2 in pts:
        draw_segment(img, p1[0], p1[1], p2[0], p2[1], color, width)
    return img


def draw_line_clusters(img, clusters_lines, width=2):
    """Draw lines colored by cluster id — draw_line_clusters parity
    (imgproc.py:395-411) with a deterministic palette.
    ``clusters_lines``: iterable of (cluster_id, lines)."""
    for cid, lines in clusters_lines:
        color = CLUSTER_PALETTE[int(cid) % len(CLUSTER_PALETTE)]
        draw_polar_lines(img, lines, color=tuple(int(c) for c in color),
                         width=width)
    return img


def draw_grid(img, col_positions, row_positions, color=(255, 0, 0),
              width=1, scale_x=1.0, scale_y=1.0):
    """Draw full-span grid border lines at the given page-space positions
    (scaled into image space) — the overlay a user compares against
    save_page_grids output. Vectorized slicing, no per-pixel work."""
    h, w = img.shape[:2]
    col = np.asarray(color, dtype=np.uint8)
    half = width // 2
    for x in np.rint(np.asarray(col_positions, dtype=float) * scale_x).astype(int):
        lo, hi = max(x - half, 0), min(x - half + width, w)
        if lo < hi:
            img[:, lo:hi] = col
    for y in np.rint(np.asarray(row_positions, dtype=float) * scale_y).astype(int):
        lo, hi = max(y - half, 0), min(y - half + width, h)
        if lo < hi:
            img[lo:hi, :] = col
    return img
