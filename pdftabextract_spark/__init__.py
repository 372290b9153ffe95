"""pdftabextract_spark — a PySpark-native table-extraction analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
WZBSocialScienceCenter/pdftabextract (reference at /root/reference) on top of
Apache Spark DataFrames:

* pure-numpy kernel library (``kernels/``) holding all numeric semantics
  (geometry, 1-D clustering, model fitting, chi-square repair, Hough lines),
  unit-tested against the reference's own pytest+hypothesis suites;
* DataFrame/window/aggregation operators (``operators/``) that express the
  reference's imperative loops as Catalyst-optimizable plans
  (gaps-and-islands clustering, band joins, interval-join argmax, exact
  medians, sessionized merges);
* sources (``sources/``): the north-rule interleaved span corpus
  (doc_id, spans array<struct<kind,text,media_ref,offset>>), a deterministic
  synthetic corpus generator, and a pdf2xml ingester;
* the end-to-end extraction pipeline (``plans/``) with per-partition
  checkpoint/resume;
* large-scale training-data utilities (dedup, similarity search, text stats)
  in ``operators/``.

Nothing here imports from the reference; all semantics are re-derived and
cited by file:line in docstrings for parity checking.
"""

__version__ = "0.1.0"

ROTATION = "r"
SKEW_X = "sx"
SKEW_Y = "sy"

DIRECTION_HORIZONTAL = "h"
DIRECTION_VERTICAL = "v"
