"""Geometry-kernel contract tests (pdftabextract_spark.kernels.geom).

Written from the kernels' documented contracts (the same behaviors the
reference library documents for its geom module); table-driven and
property-based rather than example-enumerated. Covers: pt/ptdist,
vecangle, vecrotate/rotate_xy, 1-D overlap, segment/line intersection,
rect construction + center/area/intersection (incl. normalization and
the touch-vs-disjoint edge), angle normalization, and polar-line canvas
projection.
"""

import math

import numpy as np
import pytest
from hypothesis import given
import hypothesis.strategies as st

from pdftabextract_spark.kernels.geom import (
    pt, ptdist, vecangle, vecrotate, overlap, lineintersect,
    rect, rectcenter, rectarea, rectintersect,
    normalize_angle, normalize_angle_halfcircle,
    project_polarcoord_lines, rotate_xy,
)

finite = st.floats(min_value=-1e18, max_value=1e18)


# ---------------------------------------------------------------- points

def test_pt_is_float_ndarray_by_default():
    p = pt(3, 7)
    assert isinstance(p, np.ndarray) and p.dtype == float
    assert tuple(p) == (3.0, 7.0)
    assert pt(3, 7, int).dtype == int


@pytest.mark.parametrize("a,b,d", [
    ((0, 0), (3, 4), 5.0),          # 3-4-5 triangle
    ((-2, 1), (-2, 1), 0.0),        # coincident
    ((1, 1), (2, 2), math.sqrt(2)),
    ((5, 0), (0, 0), 5.0),
])
def test_ptdist_cases(a, b, d):
    assert ptdist(pt(*a), pt(*b)) == pytest.approx(d)
    assert ptdist(pt(*b), pt(*a)) == pytest.approx(d)  # symmetric


# ---------------------------------------------------------------- angles

@pytest.mark.parametrize("u,v,deg", [
    ((1, 0), (0, 1), 90),
    ((1, 0), (5, 5), 45),
    ((2, 0), (7, 0), 0),
    ((0, 3), (0, -4), 180),
    ((1, 0), (-1, 1), 135),
])
def test_vecangle_known_angles(u, v, deg):
    assert vecangle(pt(*u), pt(*v)) == pytest.approx(math.radians(deg))


def test_vecangle_zero_vector_is_nan():
    assert np.isnan(vecangle(pt(0, 0), pt(2, 3)))
    assert np.isnan(vecangle(pt(2, 3), pt(0, 0)))


@given(finite, finite, finite, finite)
def test_vecangle_range_property(x1, y1, x2, y2):
    try:
        a = vecangle(pt(x1, y1), pt(x2, y2))
    except ValueError:
        return
    zero1 = x1 == 0 and y1 == 0
    zero2 = x2 == 0 and y2 == 0
    if zero1 or zero2:
        assert np.isnan(a)
    elif not np.isnan(a):  # overflow in norms may yield nan; range otherwise
        assert 0.0 <= a <= np.pi


def test_vecrotate_quarter_turns_and_about_point():
    # rotating the origin about the origin is a no-op for any angle
    assert np.allclose(vecrotate(pt(0, 0), 0.77), pt(0, 0))
    # quarter turn: +x axis -> +y axis
    assert np.allclose(vecrotate(pt(2, 0), math.pi / 2), pt(0, 2))
    # half turn about a pivot: point reflects through the pivot
    assert np.allclose(vecrotate(pt(3, 1), math.pi, about=pt(2, 1)), pt(1, 1))


@given(st.floats(min_value=-10, max_value=10),
       st.floats(min_value=-10, max_value=10),
       st.floats(min_value=-math.pi, max_value=math.pi))
def test_vecrotate_preserves_distance_to_pivot(x, y, theta):
    pivot = pt(1.25, -0.5)
    rotated = vecrotate(pt(x, y), theta, about=pivot)
    assert ptdist(rotated, pivot) == pytest.approx(
        ptdist(pt(x, y), pivot), abs=1e-9)


def test_rotate_xy_is_vectorized_vecrotate():
    rng = np.random.RandomState(7)
    xs, ys = rng.uniform(-5, 5, 10), rng.uniform(-5, 5, 10)
    nx, ny = rotate_xy(xs, ys, 0.41, -1.0, 2.5)
    expected = np.array([vecrotate(pt(x, y), 0.41, about=pt(-1.0, 2.5))
                         for x, y in zip(xs, ys)])
    assert np.allclose(np.column_stack([nx, ny]), expected)


@pytest.mark.parametrize("theta_factor,expected_parity", [
    (k, k % 2) for k in range(-6, 7)
])
def test_normalize_angle_multiples_of_pi(theta_factor, expected_parity):
    n = normalize_angle(theta_factor * np.pi)
    assert 0 <= n < 2 * np.pi
    assert n == pytest.approx(expected_parity * np.pi)


@pytest.mark.parametrize("k", range(-8, 8))
def test_normalize_angle_halfcircle_multiples(k):
    n = normalize_angle_halfcircle(k * np.pi / 2)
    assert 0 <= n < np.pi
    assert n == pytest.approx((k % 2) * np.pi / 2)


# ---------------------------------------------------------------- intervals

@pytest.mark.parametrize("a,b,expected", [
    ((2, 6), (5, 9), True),      # partial
    ((2, 6), (6, 9), True),      # touching counts as overlap
    ((2, 6), (7, 9), False),     # disjoint
    ((0, 100), (40, 60), True),  # containment
    ((-5, -1), (-1, 3), True),
    ((-5, -2), (-1, 3), False),
])
def test_overlap_1d(a, b, expected):
    assert overlap(a[0], a[1], b[0], b[1]) is expected
    assert overlap(b[0], b[1], a[0], a[1]) is expected  # symmetric


# ---------------------------------------------------------------- lines

def _nanpoint(v):
    return v is not None and np.isnan(np.asarray(v, dtype=float)).all()


def test_lineintersect_segments():
    # proper crossing of two diagonals of a square
    hit = lineintersect(pt(0, 0), pt(4, 4), pt(0, 4), pt(4, 0))
    assert np.allclose(hit, pt(2, 2))
    # sharing exactly one endpoint -> that endpoint
    hit = lineintersect(pt(1, 1), pt(1, 5), pt(1, 5), pt(6, 6))
    assert np.allclose(hit, pt(1, 5))
    # parallel verticals never meet
    assert lineintersect(pt(0, 0), pt(0, 3), pt(2, 0), pt(2, 3)) is None
    # lines cross, but outside both segments -> None in segment mode
    assert lineintersect(pt(0, 0), pt(1, 1), pt(0, 9), pt(9, 0)) is None
    # coincident segments -> all-nan marker
    assert _nanpoint(lineintersect(pt(0, 0), pt(0, 2), pt(0, 0), pt(0, 2)))
    # degenerate zero-length inputs -> all-nan marker
    assert _nanpoint(lineintersect(pt(3, 3), pt(3, 3), pt(3, 3), pt(3, 3)))


def test_lineintersect_infinite_mode():
    # same geometry, check_in_segm=False extends segments to lines
    hit = lineintersect(pt(0, 0), pt(1, 1), pt(0, 9), pt(9, 0), False)
    assert hit is not None and not np.isnan(hit).any()
    # vertical line through x=0 meets an off-segment diagonal at (0,0)
    assert np.allclose(
        lineintersect(pt(0, 0), pt(0, 1), pt(2, 2), pt(3, 3), False), pt(0, 0))
    # collinear (same infinite line) -> all-nan marker
    assert _nanpoint(
        lineintersect(pt(0, 0), pt(1, 1), pt(5, 5), pt(6, 6), False))


# ---------------------------------------------------------------- rects

def test_rect_rejects_degenerate_and_inverted():
    for a, b in [((0, 0), (0, 0)),    # zero area
                 ((2, 2), (1, 1)),    # inverted both axes
                 ((0, 0), (5, 0)),    # zero height
                 ((0, 0), (0, 5))]:   # zero width
        with pytest.raises(ValueError):
            rect(pt(*a), pt(*b))
    with pytest.raises(ValueError):  # mixed dtypes
        rect(pt(0, 0), pt(1, 1, int))


def test_rect_layout():
    r = rect(pt(-1.5, 2), pt(4, 9))
    assert r.shape == (2, 2)
    assert tuple(r[0]) == (-1.5, 2) and tuple(r[1]) == (4, 9)


@pytest.mark.parametrize("lo,hi,center,area", [
    ((0, 0), (4, 2), (2, 1), 8),
    ((-6, -2), (-1, 8), (-3.5, 3), 50),
    ((0.5, 0.5), (1.5, 2.5), (1, 1.5), 2),
])
def test_rectcenter_and_area(lo, hi, center, area):
    r = rect(pt(*lo), pt(*hi))
    assert np.allclose(rectcenter(r), pt(*center))
    assert rectarea(r) == pytest.approx(area)


def test_rectintersect_overlap_geometry():
    base = rect(pt(0, 0), pt(10, 10))
    quarter = rect(pt(5, 5), pt(15, 15))   # overlaps 5x5
    assert rectintersect(base, quarter) == pytest.approx(25)
    assert rectintersect(quarter, base) == pytest.approx(25)
    inner = rect(pt(2, 2), pt(4, 4))       # fully inside
    assert rectintersect(base, inner) == pytest.approx(rectarea(inner))
    # self-intersection is own area; normalized either way it's 1
    assert rectintersect(base, base) == pytest.approx(rectarea(base))
    assert rectintersect(base, base, norm_intersect_area="a") == 1
    assert rectintersect(base, base, norm_intersect_area="b") == 1


def test_rectintersect_normalization_sides():
    big = rect(pt(0, 0), pt(10, 10))
    small = rect(pt(0, 0), pt(2, 2))       # contained, area 4
    # normalize by the contained rect -> full coverage; by the big -> 4%
    assert rectintersect(small, big, norm_intersect_area="a") == pytest.approx(1)
    assert rectintersect(big, small, norm_intersect_area="b") == pytest.approx(1)
    assert rectintersect(big, small, norm_intersect_area="a") == pytest.approx(0.04)
    assert rectintersect(small, big, norm_intersect_area="b") == pytest.approx(0.04)
    with pytest.raises(ValueError):
        rectintersect(big, small, norm_intersect_area="bogus")


def test_rectintersect_touch_is_zero_disjoint_is_none():
    a = rect(pt(0, 0), pt(2, 2))
    touching = rect(pt(2, 2), pt(3, 3))    # corner contact only
    assert rectintersect(a, touching) == 0
    gap = rect(pt(2.01, 2.01), pt(3, 3))
    assert rectintersect(a, gap) is None


@given(st.floats(min_value=0.1, max_value=9.9))
def test_rectintersect_sliding_window_property(shift):
    """A unit square slid diagonally by s in (0,1) overlaps (1-s)^2."""
    s = shift % 1.0
    if s == 0:
        return
    a = rect(pt(0, 0), pt(1, 1))
    b = rect(pt(s, s), pt(s + 1, s + 1))
    assert rectintersect(a, b) == pytest.approx((1 - s) ** 2)


# -------------------------------------------------------- polar projection

def test_project_polarcoord_lines_rejects_bad_canvas():
    for w, h in [(0, 10), (10, 0), (-3, 10), (10, -3)]:
        with pytest.raises(ValueError):
            project_polarcoord_lines([(1.0, 0.0)], w, h)


def test_project_polarcoord_lines_axis_aligned():
    w, h = 200, 100
    segs = project_polarcoord_lines([(50.0, 0.0),            # vertical x=50
                                     (30.0, math.pi / 2)],   # horizontal y=30
                                    w, h)
    (a1, b1), (a2, b2) = segs
    assert a1[0] == pytest.approx(50) and b1[0] == pytest.approx(50)
    assert sorted([a1[1], b1[1]]) == pytest.approx([0, h])
    assert a2[1] == pytest.approx(30) and b2[1] == pytest.approx(30)
    assert sorted([a2[0], b2[0]]) == pytest.approx([0, w])


@given(st.lists(st.tuples(st.floats(-500, 500),
                          st.floats(0, math.pi - 1e-6)), max_size=20),
       st.integers(1, 800), st.integers(1, 800))
def test_project_polarcoord_lines_shape_and_bounds(lines, w, h):
    segs = project_polarcoord_lines([list(l) for l in lines], w, h)
    assert isinstance(segs, list) and len(segs) == len(lines)
    for seg in segs:
        assert len(seg) == 2
        for endpoint in seg:
            assert isinstance(endpoint, np.ndarray) and endpoint.shape == (2,)
