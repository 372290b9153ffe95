"""Double-page splitting (schoollist paths, §3.2/§3.3):
find the separator line, split each double page's textboxes into two new
pages with renumbering, split page images into two blobs.

Parity: /root/reference/pdftabextract/splitpages.py:20-146 and
imgproc.py:75-151 — re-expressed as: an as-of pick (cluster center nearest
a relative position) + a conditional projection with posexplode-style
renumbering (row_number window), + a batch media kernel.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

PAGE_KEY = ("doc_id", "page")


def find_separator_positions(line_centers: DataFrame, pages: DataFrame,
                             direction: str = "v",
                             around_rel_position: float = 0.5) -> DataFrame:
    """find_pages_separator_line (imgproc.py:75-102): among the page's line
    cluster centers (``line_centers``: doc_id, page, center), pick the one
    nearest img_dim * around_rel_position. Window top-1 by |center-target|."""
    dim = F.col("img_w") if direction == "v" else F.col("img_h")
    j = line_centers.join(
        pages.select(*PAGE_KEY, dim.alias("_dim")), list(PAGE_KEY))
    target = F.col("_dim") * F.lit(float(around_rel_position))
    w = W.partitionBy(*PAGE_KEY).orderBy(F.abs(F.col("center") - target).asc(),
                                         F.col("center").asc())
    return (j.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1)
             .select(*PAGE_KEY, F.col("center").alias("split_pos")))


def split_boxes(boxes: DataFrame, separators: DataFrame,
                pages: DataFrame, direction: str = "v") -> DataFrame:
    """split_page_texts + renumbering (splitpages.py:20-58, 84-139):
    a box goes to half A when its center along the split axis is
    < split_pos, else to half B with coordinates shifted by -split_pos.
    New page numbers run 1..2N per doc in (orig_page, half) order.
    Returns boxes with new page ids plus new page dims."""
    if direction == "v":
        pos_attr, dim_attr = "left", "width"
    else:
        pos_attr, dim_attr = "top", "height"

    b = boxes.join(separators, list(PAGE_KEY))
    center = F.col(pos_attr) + F.col(dim_attr) / 2
    half = F.when(center < F.col("split_pos"), 0).otherwise(1)
    b = b.withColumn("half", half)
    shifted = F.when(F.col("half") == 1,
                     F.col(pos_attr) - F.col("split_pos")).otherwise(F.col(pos_attr))
    b = b.withColumn(pos_attr, shifted)

    # dense renumbering over all (page, half) pairs of a doc — including
    # halves that end up with no boxes, so derive the mapping from pages
    halves = (pages.join(separators, list(PAGE_KEY))
              .select(*PAGE_KEY, "split_pos", "width", "height")
              .withColumn("half", F.explode(F.array(F.lit(0), F.lit(1)))))
    wn = W.partitionBy("doc_id").orderBy("page", "half")
    if direction == "v":
        new_dim_w = F.when(F.col("half") == 0, F.col("split_pos")) \
                     .otherwise(F.col("width") - F.col("split_pos"))
        new_dim_h = F.col("height").cast("double")
    else:
        new_dim_w = F.col("width").cast("double")
        new_dim_h = F.when(F.col("half") == 0, F.col("split_pos")) \
                     .otherwise(F.col("height") - F.col("split_pos"))
    page_map = halves.select(
        *PAGE_KEY, "half",
        F.row_number().over(wn).alias("new_page"),
        F.round(new_dim_w).cast("int").alias("new_width"),
        F.round(new_dim_h).cast("int").alias("new_height"))

    out = (b.join(page_map, ["doc_id", "page", "half"])
           .select("doc_id",
                   F.col("new_page").alias("page"),
                   "box_id", "left", "top", "width", "height", "value"))
    return out, page_map


def split_media(media: DataFrame, pages: DataFrame, separators: DataFrame,
                direction: str = "v") -> DataFrame:
    """split_image (imgproc.py:104-151) as a batch kernel: decode each
    double-page blob, slice at round(split_pos), re-encode two blobs with
    derived media_refs ('<ref>#A', '<ref>#B')."""
    from ..kernels.png import encode_png
    from ..kernels.raster import decode_raster

    j = (pages.select(*PAGE_KEY, "media_ref").join(separators, list(PAGE_KEY))
         .join(media, "media_ref"))

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_raster(bytes(r.bytes))
                pos = int(round(r.split_pos))
                if direction == "v":
                    a, bimg = img[:, :pos].copy(), img[:, pos:].copy()
                else:
                    a, bimg = img[:pos, :].copy(), img[pos:, :].copy()
                rows.append((r.media_ref + "#A", encode_png(a, level=1)))
                rows.append((r.media_ref + "#B", encode_png(bimg, level=1)))
            yield pd.DataFrame(rows, columns=["media_ref", "bytes"])

    return j.mapInPandas(kernel, schema="media_ref string, bytes binary")
