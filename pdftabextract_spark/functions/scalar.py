"""Scalar geometry/string expressions.

Each mirrors a reference scalar (cited) as a pure Column expression so it
participates in whole-stage codegen — these are the building blocks the
SQL variants of the join/assignment operators use.
"""

from pyspark.sql import Column, functions as F


def _c(x):
    return x if isinstance(x, Column) else F.lit(float(x)) if isinstance(x, (int, float)) else F.col(x)


def interval_overlap(a1, a2, b1, b2) -> Column:
    """1-D interval overlap predicate (geom.py:55-65)."""
    a1, a2, b1, b2 = map(_c, (a1, a2, b1, b2))
    a_min, a_max = F.least(a1, a2), F.greatest(a1, a2)
    b_min, b_max = F.least(b1, b2), F.greatest(b1, b2)
    return (a_min <= b_max) & (b_min <= a_max)


def rect_area(l, t, r, b) -> Column:
    """(geom.py:172-174)."""
    l, t, r, b = map(_c, (l, t, r, b))
    return (r - l) * (b - t)


def rect_intersect(al, at, ar, ab, bl, bt, br, bb, norm=None) -> Column:
    """Rect intersection area, NULL when disjoint, 0 on touch, clamped to
    min(area_a, area_b), optionally normalized by 'a' or 'b'
    (geom.py:177-220)."""
    al, at, ar, ab, bl, bt, br, bb = map(_c, (al, at, ar, ab, bl, bt, br, bb))
    d0 = br - al
    d1 = ar - bl
    d2 = bb - at
    d3 = ab - bt
    disjoint = (d0 < 0) | (d1 < 0) | (d2 < 0) | (d3 < 0)
    raw = F.least(F.abs(d0), F.abs(d1)) * F.least(F.abs(d2), F.abs(d3))
    area_a = rect_area(al, at, ar, ab)
    area_b = rect_area(bl, bt, br, bb)
    raw = F.least(raw, F.least(area_a, area_b))
    if norm == "a":
        raw = raw / area_a
    elif norm == "b":
        raw = raw / area_b
    return F.when(disjoint, F.lit(None).cast("double")).otherwise(raw)


def rect_center_dist(al, at, ar, ab, bl, bt, br, bb) -> Column:
    """Distance between rect centers (geom.py:159-169)."""
    al, at, ar, ab, bl, bt, br, bb = map(_c, (al, at, ar, ab, bl, bt, br, bb))
    return F.sqrt(F.pow((al + ar) / 2 - (bl + br) / 2, 2)
                  + F.pow((at + ab) / 2 - (bt + bb) / 2, 2))


def pt_dist(x1, y1, x2, y2) -> Column:
    """(geom.py:20-22)."""
    x1, y1, x2, y2 = map(_c, (x1, y1, x2, y2))
    return F.sqrt(F.pow(x2 - x1, 2) + F.pow(y2 - y1, 2))


def vec_rotate_x(x, y, theta, about_x=0.0, about_y=0.0) -> Column:
    """x' of a rotation about a point (geom.py:44-52)."""
    x, y, theta, about_x, about_y = map(_c, (x, y, theta, about_x, about_y))
    return (F.cos(theta) * x - F.sin(theta) * y
            + about_x - F.cos(theta) * about_x + F.sin(theta) * about_y)


def vec_rotate_y(x, y, theta, about_x=0.0, about_y=0.0) -> Column:
    """y' of a rotation about a point (geom.py:44-52)."""
    x, y, theta, about_x, about_y = map(_c, (x, y, theta, about_x, about_y))
    return (F.sin(theta) * x + F.cos(theta) * y
            + about_y - F.sin(theta) * about_x - F.cos(theta) * about_y)


def rel_levenshtein(a, b) -> Column:
    """Levenshtein normalized to [0,1] (common.py:255-261); 0 for two
    empty strings."""
    a, b = _c(a), _c(b)
    maxlen = F.greatest(F.length(a), F.length(b))
    return F.when(maxlen > 0, F.levenshtein(a, b) / maxlen).otherwise(F.lit(0.0))
