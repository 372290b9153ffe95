"""Differential tests: DataFrame textbox operators vs the pure-numpy
kernels (and a fold-style oracle for the nearby-merge) on randomized
pages."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdftabextract_spark.kernels import textflow as TK
from pdftabextract_spark.operators import textboxes as TOP


def _random_boxes(seed, n_pages=6, boxes_per_page=25):
    rng = np.random.RandomState(seed)
    rows = []
    for p in range(1, n_pages + 1):
        for i in range(rng.randint(5, boxes_per_page)):
            left = float(rng.randint(0, 800))
            top = float(rng.randint(0, 1000))
            w = float(rng.randint(5, 120))
            h = float(rng.randint(5, 40))
            rows.append(("d1", p, i, left, top, w, h, "t%d_%d" % (p, i)))
    return pd.DataFrame(rows, columns=[
        "doc_id", "page", "box_id", "left", "top", "width", "height", "value"])


def test_line_ids_matches_kernel(spark):
    pdf = _random_boxes(3)
    sdf = spark.createDataFrame(pdf)
    got = TOP.line_ids(sdf).select("page", "box_id", "line_id").toPandas()
    for p, grp in pdf.groupby("page"):
        ids_kernel = TK.line_ids(grp.reset_index(drop=True))
        sub = got[got.page == p].sort_values("box_id")
        kernel_by_box = dict(zip(grp["box_id"], ids_kernel))
        spark_by_box = dict(zip(sub["box_id"], sub["line_id"]))
        assert kernel_by_box == spark_by_box, f"page {p}"


def test_split_by_positions_matches_kernel(spark):
    pdf = _random_boxes(7)
    positions = [150.0, 400.0, 700.0, 1100.0]
    sdf = spark.createDataFrame(pdf)
    pos_df = (sdf.select("doc_id", "page").distinct()
              .withColumn("positions", F.array(*[F.lit(p) for p in positions])))
    for direction in ("v", "h"):
        for alignment in ("low", "middle", "high"):
            got = (TOP.split_by_positions(sdf, pos_df, direction, alignment)
                   .select("page", "box_id", "section_id").toPandas())
            for p, grp in pdf.groupby("page"):
                edges = TK.split_section_edge(grp, direction, alignment)
                expect = TK.section_ids_by_positions(edges, np.array(positions))
                sub = got[got.page == p].sort_values("box_id")
                by_box = dict(zip(sub["box_id"], sub["section_id"]))
                for b, e in zip(grp["box_id"], expect):
                    assert by_box[b] == e, (direction, alignment, p, b)


def _merge_nearby_oracle(boxes: pd.DataFrame, direction, max_nearby, max_axis,
                         join_str):
    """Fold-style oracle implementing the reference semantics
    (clustering.py:168-241, axis_align='low' mode)."""
    from pdftabextract_spark.kernels.clustering import find_clusters_1d_break_dist
    if direction == "h":
        nlo, nhi, axis = "left", "right", "top"
    else:
        nlo, nhi, axis = "top", "bottom", "left"
    b = boxes.copy()
    b["right"] = b.left + b.width
    b["bottom"] = b.top + b.height
    b = b.sort_values([axis, "box_id"], kind="stable").reset_index(drop=True)
    groups = find_clusters_1d_break_dist(b[axis].to_numpy(), max_axis)
    out = []
    for idx in groups:
        members = b.iloc[sorted(idx, key=lambda i: (b[nlo].iloc[i], b["box_id"].iloc[i]))]
        chain = [members.iloc[0].to_dict()]
        chains = []
        prev = members.iloc[0]
        for _, cur in list(members.iterrows())[1:]:
            gap = cur[nlo] - prev[nhi]
            if 0 <= gap <= max_nearby:
                chain.append(cur.to_dict())
            else:
                chains.append(chain)
                chain = [cur.to_dict()]
            prev = cur
        chains.append(chain)
        for ch in chains:
            first, last = ch[0], ch[-1]
            if direction == "h":
                w, h = last["right"] - first["left"], first["height"]
            else:
                w, h = first["width"], last["bottom"] - first["top"]
            out.append((first["box_id"], first["left"], first["top"], w, h,
                        join_str.join(c["value"] for c in ch)))
    return sorted(out)


def test_merge_nearby_matches_oracle(spark):
    pdf = _random_boxes(11, n_pages=4)
    sdf = spark.createDataFrame(pdf)
    got = (TOP.merge_nearby_boxes(sdf, "h", max_nearby_dist=30.0,
                                  max_same_axis_dist=12.0)
           .toPandas())
    for p, grp in pdf.groupby("page"):
        expect = _merge_nearby_oracle(grp, "h", 30.0, 12.0, " ")
        sub = got[got.page == p]
        actual = sorted(
            (int(r.box_id), r.left, r.top, r.width, r.height, r.value)
            for r in sub.itertuples())
        assert actual == expect, f"page {p}"


def test_merge_small_sections_islands(spark):
    rows = [("d1", 1, i, n) for i, n in enumerate([5, 1, 6, 1, 1, 7])]
    sdf = spark.createDataFrame(rows, "doc_id string, page int, section_id int, n_texts int")
    got = {r["section_id"]: r["island"]
           for r in TOP.merge_small_sections(sdf, 1).collect()}
    # sections with n_texts <= 1 merge into their predecessor
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 2, 5: 3}


def test_merge_overlapping_sections_islands(spark):
    rows = [("d1", 1, 0, 0.0, 10.0), ("d1", 1, 1, 9.0, 20.0),
            ("d1", 1, 2, 25.0, 30.0), ("d1", 1, 3, 30.5, 40.0)]
    sdf = spark.createDataFrame(
        rows, "doc_id string, page int, section_id int, sec_lo double, sec_hi double")
    got = {r["section_id"]: r["island"]
           for r in TOP.merge_overlapping_sections(sdf, 2.0).collect()}
    # gap 0->1 is -1 (<2: merge), 1->2 is 5 (>=2: new), 2->3 is 0.5 (<2: merge)
    assert got == {0: 1, 1: 1, 2: 2, 3: 2}
