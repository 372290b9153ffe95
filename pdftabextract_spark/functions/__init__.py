"""Scalar SQL function surface: the reference's geometry/string helpers as
Column expressions (JVM-side, codegen-able). Import as
``from pdftabextract_spark.functions import rect_intersect, ...``."""

from .scalar import (  # noqa: F401
    rect_intersect, interval_overlap, rect_center_dist, pt_dist,
    rel_levenshtein, rect_area, vec_rotate_x, vec_rotate_y,
)
