"""HTML main-content extraction (boilerplate strip + DOM heuristics) —
the web half of the north rule's extraction surface. The reference
(pdftabextract) covers the PDF/layout side; a web-scale training-data
pipeline also ingests HTML, so the engine ships a DOM-block extractor:

  html_blocks       HTML string -> one row per text block with DOM
                    features (tag path, depth, text, link-char count),
                    parsed executor-side with the stdlib html.parser in
                    one Arrow-batched kernel (no external deps)
  classify_blocks   jusText/Arc90-style context-free classification:
                    link density, block length, stopword density ->
                    is_content (pure JVM expressions)
  main_content      docs -> (doc_id, content): the ' '-joined text of
                    content blocks in document order
  strip_tags_expr   pure-SQL tag strip + whitespace normalization
                    (the trivially-SQL-expressible baseline; the
                    correctness gate cross-checks it against DuckDB)

Scale notes: parsing is per-document independent (mapInPandas, no
shuffle); classification and the content join are JVM expressions and a
single groupBy(doc_id) — the same shape as the textstats operators.
Blocks inherit the document's partitioning; no skew beyond document
length itself (a pathological single document is bounded by the Arrow
batch, not a group).
"""

from html.parser import HTMLParser

from pyspark.sql import DataFrame, functions as F

# tags whose subtree is never content
_IGNORE = {"script", "style", "noscript", "template", "head", "svg"}
# tags that terminate a text block
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "aside", "header", "footer",
    "nav", "ul", "ol", "li", "table", "tr", "td", "th", "h1", "h2", "h3",
    "h4", "h5", "h6", "blockquote", "pre", "form", "body", "html", "br",
    "hr", "figure", "figcaption"}

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been for on with as by at "
    "it this that from not have has had but they you we he she his her its "
    "their our your i".split())

_BLOCKS_SCHEMA = ("doc_id string, block_id int, tag_path string, "
                  "dom_depth int, text string, n_chars int, "
                  "n_link_chars int")


class _BlockParser(HTMLParser):
    """Accumulate text into blocks delimited by block-level tags; track
    the open-tag stack and how many characters sit under an <a>."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks = []
        self.stack = []
        self.ignore_depth = 0
        self.link_depth = 0
        self._parts = []
        self._link_chars = 0
        self._path = ""

    def _flush(self):
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append(
                (self._path, len(self.stack), text, len(text),
                 min(self._link_chars, len(text))))
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _IGNORE:
            self.ignore_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self.link_depth += 1
        if tag not in ("br", "hr", "img", "meta", "link", "input"):
            self.stack.append(tag)
            self._path = "/".join(self.stack[-4:])

    def handle_endtag(self, tag):
        if tag in _IGNORE and self.ignore_depth:
            self.ignore_depth -= 1
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a" and self.link_depth:
            self.link_depth -= 1
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] == tag:
                del self.stack[i:]
                break
        self._path = "/".join(self.stack[-4:])

    def handle_data(self, data):
        if self.ignore_depth:
            return
        if data and data.isspace():
            # keep ONE separator so adjacent inline elements ("<a>Home</a>
            # <a>About</a>") don't glue; the flush re-normalizes anyway
            if self._parts:
                self._parts.append(" ")
            return
        if data:
            self._parts.append(data)
            if self.link_depth:
                self._link_chars += len(data.strip())

    def close(self):
        super().close()
        self._flush()


def parse_blocks(html: str):
    """One HTML string -> list of block tuples (pure function, unit-
    testable without Spark)."""
    p = _BlockParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        # malformed beyond html.parser's tolerance: whatever blocks were
        # accumulated stand; never fail a whole batch on one document
        pass
    return p.blocks


def html_blocks(docs: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """docs -> one row per DOM text block with features."""
    import pandas as pd

    sel = docs.select(F.col(id_col).cast("string").alias("doc_id"),
                      F.col(text_col).alias("html"))

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for bid, (path, depth, text, n, nl) in enumerate(
                        parse_blocks(r.html)):
                    rows.append((r.doc_id, bid, path, depth, text, n, nl))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "block_id", "tag_path", "dom_depth", "text",
                "n_chars", "n_link_chars"])

    return sel.mapInPandas(kernel, schema=_BLOCKS_SCHEMA)


def classify_blocks(blocks: DataFrame, min_len: int = 40,
                    max_link_density: float = 0.33,
                    min_stopword_density: float = 0.18) -> DataFrame:
    """Context-free jusText-style classification, pure JVM expressions:
    a block is content when it is long enough, not link-dominated, and
    stopword-dense (prose, not navigation/labels). Blocks inside
    nav/footer/aside/header are never content (DOM heuristic)."""
    words = F.split(F.lower("text"), " ")
    sw_array = F.array(*[F.lit(w) for w in sorted(_STOPWORDS)])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), sw_array))
    # density over distinct words is cheap and monotone enough; exact
    # multiset counting would need a per-word explode
    stop_density = n_stop / F.greatest(F.size(F.array_distinct(words)), F.lit(1))
    link_density = F.col("n_link_chars") / F.greatest("n_chars", F.lit(1))
    in_chrome = (F.col("tag_path").rlike("(^|/)(nav|footer|aside|header)(/|$)"))
    is_content = ((F.col("n_chars") >= min_len)
                  & (link_density <= max_link_density)
                  & (stop_density >= min_stopword_density)
                  & ~in_chrome)
    return (blocks
            .withColumn("link_density", F.round(link_density, 6))
            .withColumn("stop_density", F.round(stop_density, 6))
            .withColumn("is_content", is_content))


def main_content(docs: DataFrame, text_col="text", id_col="doc_id",
                 **classify_kwargs) -> DataFrame:
    """docs with HTML -> (doc_id, content, n_blocks, n_content_blocks)."""
    cls = classify_blocks(html_blocks(docs, text_col, id_col),
                          **classify_kwargs)
    return (cls.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.when(
                    F.col("is_content"),
                    F.struct("block_id", "text")))),
                lambda s: s["text"]),
            " ").alias("content"),
        F.count("*").alias("n_blocks"),
        F.sum(F.col("is_content").cast("int")).alias("n_content_blocks")))


def strip_tags_expr(col):
    """Tag strip + whitespace normalize as a single SQL expression —
    portable across Spark and DuckDB (the gate's oracle runs the same
    regexes)."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(col, "<[^>]*>", " "), " +", " "))
