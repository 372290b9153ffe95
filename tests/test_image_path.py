"""Image-stage e2e: rotated page images + rotated textboxes -> Hough line
detection -> rotation estimate -> repair -> line-derived columns -> cells
matching the unrotated ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdftabextract_spark.sources import synth
from pdftabextract_spark.plans.pipeline import PipelineParams, extract_cells_image_path
from pdftabextract_spark.kernels import imgproc as K
from pdftabextract_spark.kernels.png import encode_png, decode_png


def test_png_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (40, 60), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)
    rgb = rng.randint(0, 256, (20, 30, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)


def test_hough_recovers_known_lines():
    img = np.full((300, 400), 255, dtype=np.uint8)
    for x in (50, 180, 320):
        img[:, x:x + 2] = 0
    for y in (40, 150, 260):
        img[y:y + 2, :] = 0
    edges = K.edges_simple(K.grayscale(img))
    lines = K.hough_lines(edges, 1.0, np.pi / 500, 80)
    cl = K.classify_hough_lines(lines)
    # positions via canvas projection (rho alone is ambiguous: vertical
    # lines also vote near theta=pi with negative rho — same physical line;
    # the reference clusters projected positions for this reason,
    # imgproc.py:311-314)
    h, w = img.shape
    v_pos, _ = K.line_positions_in_direction(cl, "v", w, h)
    h_pos, _ = K.line_positions_in_direction(cl, "h", w, h)
    assert len(v_pos) and len(h_pos)
    # individual positions smear (off-axis theta bins above threshold);
    # the engine clusters positions and takes exact medians — assert that
    from pdftabextract_spark.kernels.clustering import (
        find_clusters_1d_break_dist, zip_clusters_and_values, calc_cluster_centers_1d)
    for pos, truth in ((v_pos, (50, 180, 320)), (h_pos, (40, 150, 260))):
        cw = zip_clusters_and_values(find_clusters_1d_break_dist(pos, 30), pos)
        centers = sorted(calc_cluster_centers_1d(cw))
        assert len(centers) == len(truth)
        for c, t in zip(centers, truth):
            assert abs(c - t) <= 4, (centers, truth)


def test_rotation_estimation_kernel():
    params = synth.CorpusParams(seed=5, n_docs=1, n_cols=4, with_images=True,
                                rotation_deg=1.0, page_dist=((1, 1.0),))
    colpos = synth.family_layout(params)
    _, pages = synth.gen_doc(0, params, colpos)
    img = synth.render_page_image(pages[0], colpos)
    edges = K.canny_edges(K.grayscale(img))
    lines = K.hough_lines(edges, 1.0, np.pi / 500, int(0.2 * img.shape[1]))
    cl = K.classify_hough_lines(lines)
    (rt, rr), _ = K.find_rotation_or_skew(
        cl, np.deg2rad(0.5), np.deg2rad(1.0), omit_on_rot_thresh=np.deg2rad(0.5))
    assert rt == "r"
    assert abs(np.rad2deg(rr) - 1.0) < 0.3  # within hough theta quantization


@pytest.mark.slow
def test_image_path_cells_match_ground_truth(spark):
    params = synth.CorpusParams(seed=13, n_docs=6, n_cols=4, with_images=True,
                                rotation_deg=1.0,
                                page_dist=((1, 0.7), (2, 0.3)))
    pipe = PipelineParams(n_cols=4, min_col_width=params.min_col_width,
                          min_row_height=params.min_row_height)
    boxes_df = synth.textboxes_df(spark, params)
    pages_df = synth.pages_df(spark, params)
    media = synth.media_df(spark, params)
    cells = extract_cells_image_path(boxes_df, pages_df, media, pipe)
    gt = synth.gt_cells_df(spark, params)
    joined = cells.join(
        gt.withColumnRenamed("cell_text", "gt_text"),
        ["doc_id", "page", "row_idx", "col_idx"], "full_outer")
    bad = joined.where(~F.col("cell_text").eqNullSafe(F.col("gt_text")))
    rows = bad.limit(10).collect()
    assert not rows, "image-path cell mismatches: %s" % rows


def test_rotation_sign_convention():
    """Pin the repair-sign convention (ADVICE r1): under the cv2
    parameterization rho = x*cos(theta)+y*sin(theta), content rotated by
    +alpha yields found = +alpha through the reference deviation chain,
    and STRAIGHTENING requires theta -= found (our sign=-1 default).
    The reference's literal `theta += radians` (imgproc.py:169) leaves a
    2*alpha residual — a reference quirk, not a mismatch in our Hough."""
    import math
    from pdftabextract_spark.kernels.geom import normalize_angle

    alpha = math.radians(2.0)
    page = {"page_w": 600, "page_h": 800, "theta": alpha,
            "row_positions": [100.0, 300.0, 500.0, 700.0]}
    cols = [50.0, 200.0, 350.0, 500.0]
    img = synth.render_page_image(page, cols)
    edges = K.canny_edges(K.grayscale(img))
    lines = K.hough_lines(edges, 1.0, math.pi / 500, int(0.2 * img.shape[1]))
    cl = K.classify_hough_lines(lines)
    (rt, rr), filt = K.find_rotation_or_skew(
        cl, math.radians(0.5), math.radians(1.0),
        omit_on_rot_thresh=math.radians(0.5))
    assert rt == "r"
    # found rotation = +alpha (same sign as injected), within one theta bin
    theta_bin = math.degrees(math.pi / 500)
    assert abs(math.degrees(rr) - 2.0) <= theta_bin + 1e-9

    def max_residual_deg(sign):
        devs = []
        for rho, th, tn, d in filt:
            tn2 = normalize_angle(th + sign * rr)
            devs.append(abs(K.line_deviations([tn2], [d])[0]))
        return math.degrees(max(devs))

    # corrective convention straightens to quantization noise...
    assert max_residual_deg(-1.0) <= theta_bin + 1e-9
    # ...while the reference-literal += doubles the tilt (~2*alpha)
    assert max_residual_deg(+1.0) >= 2 * 2.0 - 2 * theta_bin


def test_rotation_row_survives_empty_line_filter(spark):
    """A page whose lines are ALL dropped by the stray-line filter keeps
    its rotations row (the decision is filter-independent in the
    reference, imgproc.py:264-275), so box repair still applies
    (ADVICE r1). Two horizontal lines with deviations 0.3/0.5 rad:
    median 0.4 -> SKEW_Y, but both lines sit 0.1 rad from the median,
    beyond omit thresh 0.05 -> filtered set empty."""
    import math
    from pdftabextract_spark.operators.imgstage import find_rotation_per_page

    rows = []
    for dev in (0.3, 0.5):
        tn = math.pi / 2 + dev  # dev_append = tn - pi/2
        rows.append(("d", 1, 100.0, tn, tn, "h"))
    lines = spark.createDataFrame(
        rows, "doc_id string, page int, rho double, theta double, "
              "theta_norm double, direction string")
    rotations, filtered = find_rotation_per_page(
        lines, rot_thresh=0.2, rot_same_dir_thresh=1.0,
        omit_on_rot_thresh=0.05)
    rot = rotations.collect()
    assert len(rot) == 1
    assert rot[0]["rot_type"] == "sy"
    assert abs(rot[0]["rot_radians"] - 0.4) < 1e-9
    assert filtered.count() == 0


def _hough_lines_dense(edges, rho_res=1.0, theta_res=np.pi / 500,
                       votes_thresh=100):
    """Dense-accumulator reference formulation of hough_lines (the pre-
    round-5 shipping implementation): materializes the full
    (n_theta x n_rho) matrix and runs the peak test as whole-matrix
    slice comparisons. The shipping kernel streams a rolling 3-row
    window instead; this differential pins their bit-equality."""
    import math
    ys, xs = np.nonzero(edges)
    if len(xs) == 0:
        return np.empty((0, 2), dtype=float)
    h, w = edges.shape
    thetas = np.arange(0, np.pi, theta_res)
    n_theta = len(thetas)
    diag = math.hypot(w, h)
    n_rho = int(math.ceil(diag / rho_res)) * 2 + 1
    rho_offset = (n_rho - 1) // 2
    xf = xs.astype(np.float32)
    yf = ys.astype(np.float32)
    inv_rho = np.float32(1.0 / rho_res)
    cos_t = np.cos(thetas).astype(np.float32)
    sin_t = np.sin(thetas).astype(np.float32)
    acc = np.empty((n_theta, n_rho), dtype=np.int32)
    off = np.float32(rho_offset)
    scaled = inv_rho != np.float32(1.0)
    for j in range(n_theta):
        v = xf * cos_t[j] + yf * sin_t[j]
        if scaled:
            v *= inv_rho
        v = np.rint(v) + off
        acc[j, :] = np.bincount(v.astype(np.int32), minlength=n_rho)
    cond = acc > votes_thresh - 1
    cond[:, 1:] &= acc[:, 1:] > acc[:, :-1]
    cond[:, 0] &= acc[:, 0] > 0
    cond[:, :-1] &= acc[:, :-1] >= acc[:, 1:]
    cond[1:, :] &= acc[1:, :] > acc[:-1, :]
    cond[0, :] &= acc[0, :] > 0
    cond[:-1, :] &= acc[:-1, :] >= acc[1:, :]
    hit_t, hit_r = np.nonzero(cond)
    if len(hit_t) == 0:
        return np.empty((0, 2), dtype=float)
    votes = acc[hit_t, hit_r]
    rhos = (hit_r - rho_offset) * rho_res
    ths = thetas[hit_t]
    order = np.lexsort((ths, rhos, -votes))
    return np.stack([rhos[order], ths[order]], axis=1)


def test_hough_rolling_window_matches_dense():
    """The rolling 3-row peak finder must be bit-equal to the dense
    accumulator formulation on rendered pages (incl. rotation), random
    noise, and degenerate inputs across rho_res/theta_res/thresholds."""
    cases = []
    # rendered synthetic pages, straight and rotated
    params = synth.CorpusParams(seed=9, n_docs=4, n_cols=5,
                                with_images=True, rotation_deg=1.0,
                                page_dist=((1, 0.5), (2, 0.5)))
    cols = synth.family_layout(params)
    for d in range(3):
        _, pages = synth.gen_doc(d, params, cols)
        img = synth.render_page_image(pages[0], cols)
        cases.append(K.canny_edges(img))
    straight = synth.CorpusParams(seed=5, n_docs=2, n_cols=6, with_images=True)
    cols2 = synth.family_layout(straight)
    _, pages2 = synth.gen_doc(0, straight, cols2)
    cases.append(K.canny_edges(synth.render_page_image(pages2[0], cols2)))
    # salt noise (exercises many sub-threshold rows + scattered peaks)
    rng = np.random.RandomState(3)
    cases.append(rng.rand(180, 240) > 0.97)
    # single point, empty map
    one = np.zeros((50, 60), dtype=bool)
    one[20, 30] = True
    cases.append(one)
    cases.append(np.zeros((40, 40), dtype=bool))

    grids = [(1.0, np.pi / 500, None), (2.0, np.pi / 180, None),
             (1.0, np.pi / 500, 2), (0.5, np.pi / 360, 25)]
    for edges in cases:
        for rho_res, theta_res, thr in grids:
            votes = thr if thr is not None else max(
                int(round(0.2 * edges.shape[1])), 2)
            got = K.hough_lines(edges, rho_res, theta_res, votes)
            want = _hough_lines_dense(edges, rho_res, theta_res, votes)
            assert got.shape == want.shape
            assert np.array_equal(got, want)


def test_fused_detect_rotation_matches_unfused(spark):
    """detect_lines_with_rotation (one kernel stage) must produce exactly
    the same rotations and filtered-lines rows as the unfused
    detect_lines -> groupBy -> find_rotation_per_page pair."""
    import math
    from pdftabextract_spark.operators.imgstage import (
        detect_lines, find_rotation_per_page, detect_lines_with_rotation)
    params = synth.CorpusParams(seed=31, n_docs=8, n_cols=5,
                                with_images=True, rotation_deg=1.0,
                                page_dist=((1, 0.5), (2, 0.5)))
    pages = synth.pages_df(spark, params)
    media = synth.media_df(spark, params)
    args = (math.radians(0.5), math.radians(1.0))
    kw = dict(omit_on_rot_thresh=math.radians(0.5))

    lines = detect_lines(pages, media)
    rot_u, filt_u = find_rotation_per_page(lines, *args, **kw)
    rot_f, filt_f = detect_lines_with_rotation(pages, media, *args, **kw)

    assert rot_f.exceptAll(rot_u).count() == 0
    assert rot_u.exceptAll(rot_f).count() == 0
    assert filt_f.exceptAll(filt_u).count() == 0
    assert filt_u.exceptAll(filt_f).count() == 0
    assert rot_f.count() > 0 and filt_f.count() > 0

    # only_direction variant (schoollist_2 stage 3 shape)
    rot_u2, filt_u2 = find_rotation_per_page(lines, *args,
                                             only_direction="h", **kw)
    rot_f2, filt_f2 = detect_lines_with_rotation(pages, media, *args,
                                                 only_direction="h", **kw)
    assert rot_f2.exceptAll(rot_u2).count() == 0
    assert rot_u2.exceptAll(rot_f2).count() == 0
    assert filt_f2.exceptAll(filt_u2).count() == 0
    assert filt_u2.exceptAll(filt_f2).count() == 0
