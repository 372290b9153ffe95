"""Deterministic synthetic interleaved span corpus (FIXTURES.md §1/§4).

Every document is generated purely from ``(seed, doc_index)`` so generation
is distributed (mapInPandas over ``spark.range``), reproducible under any
partitioning, and needs no external data. The corpus models the reference's
flagship scenario (catalogue_30s / schoollist layouts): a *layout family*
fixes the column grid for the whole corpus; each page draws its own row
grid; columns randomly drop out on pages (all their cells empty) so the
corpus-level column-model repair (get_adjusted_cluster_centers) has real
work to do; optional page images carry ruled lines at the grid borders
(drawn analytically in polar form so a known rotation can be injected
exactly — the Hough stage must recover it).

Ground truth comes for free: the generating grid and cell texts define the
expected output spans (kind, text, media_ref, order) independently of the
pipeline.
"""

from dataclasses import dataclass, field, replace

import numpy as np
import pandas as pd

from ..kernels.geom import rotate_xy
from ..kernels.png import encode_png

PAGE_DIST = ((1, 0.80), (4, 0.15), (16, 0.05))  # heavy-tailed pages/doc


@dataclass(frozen=True)
class CorpusParams:
    seed: int = 42
    n_docs: int = 100
    n_cols: int = 6                    # columns in the layout family
    rows_min: int = 3
    rows_max: int = 12
    col_width_min: int = 80
    col_width_max: int = 200
    row_height_min: int = 30
    row_height_max: int = 60
    margin_x: int = 50
    margin_y: int = 60
    p_empty: float = 0.10              # empty-cell probability
    p_col_dropout: float = 0.08        # per (page, column): all cells empty
    p_zero_area: float = 0.02          # extra degenerate boxes to drop at scan
    jitter: int = 6
    with_images: bool = False
    rotation_deg: float = 0.0          # injected page rotation (images + boxes)
    page_dist: tuple = PAGE_DIST

    # pipeline params implied by the layout (used by callers)
    @property
    def min_col_width(self):
        return self.col_width_min

    @property
    def min_row_height(self):
        return self.row_height_min


def family_layout(params: CorpusParams):
    """Corpus-wide column layout, from the corpus seed only."""
    rng = np.random.RandomState(params.seed)
    widths = rng.randint(params.col_width_min, params.col_width_max + 1, params.n_cols)
    col_positions = params.margin_x + np.concatenate([[0], np.cumsum(widths)])
    return col_positions.astype(float)


def _doc_rng(params: CorpusParams, doc_idx: int) -> np.random.RandomState:
    return np.random.RandomState((params.seed * 1_000_003 + doc_idx) % (2 ** 32))


def _n_pages(rng, page_dist):
    u = rng.rand()
    acc = 0.0
    for n, p in page_dist:
        acc += p
        if u < acc:
            return n
    return page_dist[-1][0]


def gen_doc(doc_idx: int, params: CorpusParams, col_positions: np.ndarray):
    """Generate one document: list of page dicts with grid, boxes, texts."""
    rng = _doc_rng(params, doc_idx)
    doc_id = "doc%08d" % doc_idx
    n_pages = _n_pages(rng, params.page_dist)
    C = params.n_cols
    pages = []
    for page in range(1, n_pages + 1):
        R = rng.randint(params.rows_min, params.rows_max + 1)
        row_heights = rng.randint(params.row_height_min, params.row_height_max + 1, R)
        row_positions = params.margin_y + np.concatenate([[0], np.cumsum(row_heights)]).astype(float)
        page_w = int(col_positions[-1] + params.margin_x)
        page_h = int(row_positions[-1] + params.margin_y)

        dropped = rng.rand(C) < params.p_col_dropout
        # the reference's model repair anchors at the first detected column
        # (find_best_matching_array adds base_arr[0] as the model offset,
        # clustering.py:489,502) — its corpora always have the first column
        # present, so the generator keeps that invariant: column 0 never
        # drops out and always carries at least one box per page
        dropped[0] = False

        # cell text matrix; '' = empty
        texts = np.empty((R, C), dtype=object)
        for r in range(R):
            for c in range(C):
                if dropped[c] or rng.rand() < params.p_empty:
                    texts[r, c] = ""
                else:
                    n_words = rng.randint(1, 4)
                    texts[r, c] = " ".join("w%04d" % rng.randint(0, 10000) for _ in range(n_words))
        # guarantee every row has at least one box (rows are inferred from text)
        live_cols = np.flatnonzero(~dropped)
        for r in range(R):
            if all(texts[r, c] == "" for c in range(C)):
                c = live_cols[rng.randint(len(live_cols))]
                texts[r, c] = "w%04d" % rng.randint(0, 10000)
        # ... and column 0 has at least one box (model anchor, see above)
        if all(texts[r, 0] == "" for r in range(R)):
            texts[rng.randint(R), 0] = "w%04d" % rng.randint(0, 10000)

        boxes = []  # (left, top, width, height, value)
        for r in range(R):
            for c in range(C):
                val = texts[r, c]
                if not val:
                    continue
                cell_w = col_positions[c + 1] - col_positions[c]
                cell_h = row_positions[r + 1] - row_positions[r]
                jx = rng.randint(0, params.jitter + 1)
                jy = rng.randint(0, max(1, params.jitter // 2) + 1)
                left = col_positions[c] + 2 + jx
                top = row_positions[r] + 2 + jy
                width = min(cell_w - 14.0, 6.0 * len(val) + 4)
                height = min(cell_h - 12.0, 18.0)
                boxes.append((float(left), float(top), float(width), float(height), val))
        # degenerate zero-area boxes the scan must drop (common.py:138-141)
        n_zero = rng.binomial(len(boxes), params.p_zero_area) if boxes else 0
        for _ in range(n_zero):
            boxes.append((float(rng.randint(0, page_w)), float(rng.randint(0, page_h)),
                          0.0, float(rng.randint(1, 10)), "ZERO"))

        theta = np.deg2rad(params.rotation_deg) if params.rotation_deg else 0.0
        if theta:
            arr = np.array([(b[0], b[1]) for b in boxes], dtype=float)
            if len(arr):
                nx, ny = rotate_xy(arr[:, 0], arr[:, 1], theta, 0.0, 0.0)
                boxes = [(float(nx[i]), float(ny[i]), b[2], b[3], b[4])
                         for i, b in enumerate(boxes)]

        media_ref = "mem://%s/%d.png" % (doc_id, page) if params.with_images else None
        pages.append({
            "doc_id": doc_id, "page": page,
            "page_w": page_w, "page_h": page_h,
            "row_positions": row_positions,
            "texts": texts, "boxes": boxes,
            "media_ref": media_ref, "theta": theta,
        })
    return doc_id, pages


def render_page_image(page_dict, col_positions, line_width=2):
    """White canvas with black ruled lines at the grid borders, rotated by
    the page's injected theta about the origin (lines drawn in polar form
    (rho, theta) exactly as the Hough stage models them)."""
    w, h = page_dict["page_w"], page_dict["page_h"]
    img = np.full((h, w), 255, dtype=np.uint8)
    theta = page_dict["theta"]
    cos_a, sin_a = np.cos(theta), np.sin(theta)
    ys = np.arange(h)
    xs = np.arange(w)
    for p in col_positions:  # vertical line x=p -> polar (p, theta)
        x_of_y = (p - ys * sin_a) / cos_a
        xi = np.rint(x_of_y).astype(int)
        for off in range(line_width):
            sel = (xi + off >= 0) & (xi + off < w)
            img[ys[sel], xi[sel] + off] = 0
    for q in page_dict["row_positions"]:  # horizontal y=q -> polar (q, pi/2+theta)
        y_of_x = (q + xs * sin_a) / cos_a
        yi = np.rint(y_of_x).astype(int)
        for off in range(line_width):
            sel = (yi + off >= 0) & (yi + off < h)
            img[yi[sel] + off, xs[sel]] = 0
    return img


# ---------------------------------------------------------------- Spark side

def _doc_iter(index_batches, params, col_positions):
    for pdf in index_batches:
        for doc_idx in pdf["id"].tolist():
            yield gen_doc(int(doc_idx), params, col_positions)


def textboxes_df(spark, params: CorpusParams):
    col_positions = family_layout(params)

    def gen(batches):
        for doc_id, pages in _doc_iter(batches, params, col_positions):
            rows = []
            for p in pages:
                for i, (l, t, w, h, v) in enumerate(p["boxes"]):
                    rows.append((doc_id, p["page"], i, l, t, w, h, v))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "doc_id", "page", "box_id", "left", "top", "width", "height", "value"])

    return spark.range(params.n_docs).mapInPandas(
        gen, schema="doc_id string, page int, box_id int, left double, "
                    "top double, width double, height double, value string")


def pages_df(spark, params: CorpusParams):
    col_positions = family_layout(params)

    def gen(batches):
        for doc_id, pages in _doc_iter(batches, params, col_positions):
            rows = [(doc_id, p["page"], p["page_w"], p["page_h"], p["media_ref"],
                     p["page_w"], p["page_h"]) for p in pages]
            yield pd.DataFrame(rows, columns=[
                "doc_id", "page", "width", "height", "media_ref", "img_w", "img_h"])

    return spark.range(params.n_docs).mapInPandas(
        gen, schema="doc_id string, page int, width int, height int, "
                    "media_ref string, img_w int, img_h int")


def media_df(spark, params: CorpusParams):
    """PNG bytes per media_ref (only for with_images corpora)."""
    col_positions = family_layout(params)

    def gen(batches):
        for doc_id, pages in _doc_iter(batches, params, col_positions):
            rows = []
            for p in pages:
                if p["media_ref"]:
                    img = render_page_image(p, col_positions)
                    rows.append((p["media_ref"], encode_png(img)))
            if rows:
                yield pd.DataFrame(rows, columns=["media_ref", "bytes"])

    return spark.range(params.n_docs).mapInPandas(
        gen, schema="media_ref string, bytes binary")


def gt_cells_df(spark, params: CorpusParams):
    """Ground-truth cells (doc_id, page, row_idx, col_idx, cell_text)."""
    col_positions = family_layout(params)

    def gen(batches):
        for doc_id, pages in _doc_iter(batches, params, col_positions):
            rows = []
            for p in pages:
                R, C = p["texts"].shape
                for r in range(R):
                    for c in range(C):
                        rows.append((doc_id, p["page"], r, c, p["texts"][r, c]))
            yield pd.DataFrame(rows, columns=["doc_id", "page", "row_idx", "col_idx", "cell_text"])

    return spark.range(params.n_docs).mapInPandas(
        gen, schema="doc_id string, page int, row_idx int, col_idx int, cell_text string")


def span_docs_df(spark, params: CorpusParams):
    """The north-rule input table: interleaved text+media spans per doc.
    Page order: one kind='image' span (when images are on) followed by one
    kind='text' span per textbox in reading order; offsets run 0..n-1."""
    col_positions = family_layout(params)

    def gen(batches):
        for doc_id, pages in _doc_iter(batches, params, col_positions):
            spans = []
            off = 0
            for p in pages:
                if p["media_ref"]:
                    spans.append(("image", None, p["media_ref"], off))
                    off += 1
                order = sorted(range(len(p["boxes"])),
                               key=lambda i: (p["boxes"][i][1], p["boxes"][i][0]))
                for i in order:
                    l, t, w, h, v = p["boxes"][i]
                    # geometry is JSON-encoded into the text span payload;
                    # corpus prep splits it back out (sources/spans.py)
                    payload = '{"v":%s,"l":%r,"t":%r,"w":%r,"h":%r,"p":%d}' % (
                        _json_str(v), l, t, w, h, p["page"])
                    spans.append(("text", payload, None, off))
                    off += 1
            yield pd.DataFrame([(doc_id, spans)], columns=["doc_id", "spans"])

    return spark.range(params.n_docs).mapInPandas(
        gen, schema="doc_id string, spans array<struct<kind string, text string, "
                    "media_ref string, offset int>>")


def expected_spans_df(spark, params: CorpusParams):
    """Ground-truth OUTPUT spans: per doc, pages ascending, one image span
    per page (when images on) then one text span per grid cell in row-major
    order (empty cells -> empty text). The pipeline must reproduce this
    sequence exactly: (kind, text, media_ref, order)."""
    col_positions = family_layout(params)

    def gen(batches):
        for doc_id, pages in _doc_iter(batches, params, col_positions):
            rows = []
            off = 0
            for p in pages:
                if p["media_ref"]:
                    rows.append((doc_id, "image", None, p["media_ref"], off))
                    off += 1
                R, C = p["texts"].shape
                for r in range(R):
                    for c in range(C):
                        rows.append((doc_id, "text", p["texts"][r, c], None, off))
                        off += 1
            yield pd.DataFrame(rows, columns=["doc_id", "kind", "text", "media_ref", "offset"])

    return spark.range(params.n_docs).mapInPandas(
        gen, schema="doc_id string, kind string, text string, media_ref string, offset int")


def _json_str(s):
    import json
    return json.dumps(s)
