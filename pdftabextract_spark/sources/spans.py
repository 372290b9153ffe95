"""Span-corpus scan: explode the north-rule interleaved span table into the
engine's internal textbox/page rows — entirely with JVM-side expressions
(explode + from_json + filters), so Catalyst prunes columns and pushes the
kind/zero-area filters into the scan. No Python runs here.

Parity notes: the zero-area drop replicates parse_pages' rect-validation
skip (/root/reference/pdftabextract/common.py:138-141); page/image pairing
replicates the page dict's image field (common.py:125-132).
"""

from pyspark.sql import DataFrame, functions as F

# geometry payload carried in text spans during corpus prep (sources/synth.py)
_BOX_JSON_SCHEMA = "struct<v string, l double, t double, w double, h double, p int>"


def explode_spans(span_docs: DataFrame) -> DataFrame:
    """One row per span with its array position preserved."""
    return span_docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id", "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def textboxes_from_spans(span_docs: DataFrame) -> DataFrame:
    """kind='text' spans -> textbox rows; drops zero-area boxes at scan
    (width<=0 or height<=0) exactly like the reference parse."""
    spans = explode_spans(span_docs).where(F.col("kind") == "text")
    box = F.from_json("text", _BOX_JSON_SCHEMA).alias("box")
    out = spans.select("doc_id", "offset", box).select(
        "doc_id",
        F.col("box.p").alias("page"),
        F.col("offset").alias("box_id"),
        F.col("box.l").alias("left"),
        F.col("box.t").alias("top"),
        F.col("box.w").alias("width"),
        F.col("box.h").alias("height"),
        F.col("box.v").alias("value"),
    )
    return out.where((F.col("width") > 0) & (F.col("height") > 0))


def pages_from_spans(span_docs: DataFrame) -> DataFrame:
    """kind='image' spans -> (doc_id, page, media_ref).

    The page an image belongs to is derived from its POSITION among the
    doc's text spans, not from its rank among image spans: in the
    interleaved layout (both synth and pdf2xml ingestion) a page's image
    span immediately precedes that page's text spans, so the image takes
    the page of the next text span by offset. Rank-based numbering
    misattributes images whenever some pages carry no image span (e.g.
    pdf2xml docs where only a few pages were scanned). Fallbacks: the
    k-th trailing image with no following text takes prev-text-page + k
    (monotone — multiple trailing images never collide on a page); a doc
    with no text spans at all falls back to image rank. One media row per
    (doc_id, page) — lowest offset wins, the reference's
    select_image='first' (common.py:97-122)."""
    from pyspark.sql import Window as W

    spans = explode_spans(span_docs)
    text_page = F.when(
        F.col("kind") == "text",
        F.from_json("text", _BOX_JSON_SCHEMA)["p"])
    w = W.partitionBy("doc_id").orderBy("offset")
    w_next = w.rowsBetween(W.currentRow, W.unboundedFollowing)
    w_prev = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    enriched = (
        spans.withColumn("_tp", text_page)
        .withColumn("_next_pg", F.first("_tp", ignorenulls=True).over(w_next))
        .withColumn("_prev_pg", F.last("_tp", ignorenulls=True).over(w_prev))
    )
    imgs = enriched.where(F.col("kind") == "image")
    w_img = W.partitionBy("doc_id").orderBy("offset")
    # trailing images (no following text) form the offset-ordered suffix,
    # so this running count numbers them 1..k past the last text page
    trail_k = F.sum(
        F.when(F.col("_next_pg").isNull(), 1).otherwise(0)
    ).over(w_img.rowsBetween(W.unboundedPreceding, W.currentRow))
    imgs = imgs.select(
        "doc_id", "media_ref", "offset",
        F.coalesce(
            F.col("_next_pg"),
            F.col("_prev_pg") + trail_k,
            F.row_number().over(w_img),
        ).cast("int").alias("page"),
    )
    w_pg = W.partitionBy("doc_id", "page").orderBy("offset")
    return (imgs.withColumn("_rn", F.row_number().over(w_pg))
                .where(F.col("_rn") == 1)
                .select("doc_id", "page", "media_ref"))


def assemble_span_table(result_spans: DataFrame) -> DataFrame:
    """Exploded result spans (doc_id, kind, text, media_ref, offset) ->
    north-rule span-doc table (collect_list ordered by offset)."""
    return (
        result_spans
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct(
            F.col("offset"), F.col("kind"), F.col("text"), F.col("media_ref")
        ))).alias("_s"))
        .select(
            "doc_id",
            F.transform("_s", lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            )).alias("spans"),
        )
    )
