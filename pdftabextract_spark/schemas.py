"""Canonical StructTypes for every pipeline stage.

The primary input is the north-rule interleaved span corpus
(BASELINE.json input_hint):

    documents(doc_id STRING,
              spans ARRAY<STRUCT<kind STRING, text STRING,
                                 media_ref STRING, offset INT>>)

Geometry rides in the sidecar ``textboxes`` table (FIXTURES.md §1), pages
metadata in ``pages``, page-image bytes in ``media`` (media_ref -> PNG
bytes), mirroring an Iceberg layout where blobs live next to metadata.
Coordinates are DOUBLE throughout (reference boxes become float64 after
any geometric repair — /root/reference/pdftabextract/textboxes.py:186-188).
"""

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType([
    T.StructField("kind", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("media_ref", T.StringType(), True),
    T.StructField("offset", T.IntegerType(), False),
])

SPAN_DOCS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
])

TEXTBOXES = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("page", T.IntegerType(), False),
    T.StructField("box_id", T.IntegerType(), False),
    T.StructField("left", T.DoubleType(), False),
    T.StructField("top", T.DoubleType(), False),
    T.StructField("width", T.DoubleType(), False),
    T.StructField("height", T.DoubleType(), False),
    T.StructField("value", T.StringType(), True),
])

PAGES = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("page", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("media_ref", T.StringType(), True),
    T.StructField("img_w", T.IntegerType(), True),
    T.StructField("img_h", T.IntegerType(), True),
])

MEDIA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), False),
])

HOUGH_LINES = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("page", T.IntegerType(), False),
    T.StructField("rho", T.DoubleType(), False),
    T.StructField("theta", T.DoubleType(), False),
    T.StructField("theta_norm", T.DoubleType(), False),
    T.StructField("direction", T.StringType(), False),
])

PAGE_POSITIONS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("page", T.IntegerType(), False),
    T.StructField("col_positions", T.ArrayType(T.DoubleType()), False),
    T.StructField("row_positions", T.ArrayType(T.DoubleType()), False),
])

CELLS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("page", T.IntegerType(), False),
    T.StructField("row_idx", T.IntegerType(), False),
    T.StructField("col_idx", T.IntegerType(), False),
    T.StructField("cell_text", T.StringType(), False),
])

GT_CELLS = CELLS  # generator ground truth shares the cells shape
