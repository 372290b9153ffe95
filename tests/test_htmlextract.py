"""HTML main-content extraction: DOM block parsing, boilerplate
classification, content assembly (north-rule web-extraction surface)."""

import pytest
from pyspark.sql import functions as F

from pdftabextract_spark.operators.htmlextract import (
    parse_blocks, html_blocks, classify_blocks, main_content,
    strip_tags_expr)

PAGE = """<html><head><title>T</title><style>.x{color:red}</style>
<script>var a=1;</script></head><body>
<nav><a href=x>Home</a> <a href=y>About</a> <a href=z>Contact</a></nav>
<article><h1>The Grand Title</h1>
<p>This is the first paragraph of the article and it is long enough to be
considered real content by any of the heuristics that we apply here.</p>
<p>Short.</p>
<p>Another substantial paragraph of the main content follows with plenty
of common stopwords in it for the density check to pass easily.</p>
</article>
<aside><p>Related links and other boilerplate that is fairly long but it
is in an aside so the DOM heuristic must reject it as chrome anyway.</p>
</aside>
<footer>Copyright 2026 <a href=l>Legal</a> <a href=p>Privacy</a></footer>
</body></html>"""


def test_parse_blocks_pure():
    blocks = parse_blocks(PAGE)
    texts = [b[2] for b in blocks]
    assert "The Grand Title" in texts
    assert any(t.startswith("This is the first paragraph") for t in texts)
    # script/style content never appears
    assert not any("var a=1" in t or "color:red" in t for t in texts)
    # whitespace between inline anchors is preserved
    nav = [b for b in blocks if "nav" in b[0]][0]
    assert nav[2] == "Home About Contact"
    # nav text is fully link text
    assert nav[4] == len("HomeAboutContact")


def test_parse_blocks_malformed_and_empty():
    assert parse_blocks("") == []
    assert parse_blocks(None) == []
    blocks = parse_blocks("<p>unclosed <div><b>nested <p>more")
    assert any("unclosed" in b[2] for b in blocks)


def test_main_content_end_to_end(spark):
    docs = spark.createDataFrame([("d1", PAGE), ("d2", "<p>tiny</p>")],
                                 "doc_id string, text string")
    blocks = classify_blocks(html_blocks(docs))
    rows = {(r["doc_id"], r["text"][:20]): r for r in blocks.collect()}
    # the two long article paragraphs are content
    content_texts = [r["text"] for r in rows.values() if r["is_content"]]
    assert len(content_texts) == 2
    assert all("paragraph" in t for t in content_texts)
    # nav is rejected by link density AND chrome path
    nav = [r for r in rows.values() if "nav" in r["tag_path"]][0]
    # 16 of 18 chars are anchor text (the two preserved separators are not)
    assert not nav["is_content"] and nav["link_density"] > 0.8

    mc = {r["doc_id"]: r for r in main_content(docs).collect()}
    assert mc["d1"]["n_content_blocks"] == 2
    assert mc["d1"]["content"].startswith("This is the first paragraph")
    # blocks join in document order
    assert mc["d1"]["content"].index("first paragraph") < \
        mc["d1"]["content"].index("Another substantial")
    assert mc["d2"]["n_content_blocks"] == 0
    assert mc["d2"]["content"] == ""


def test_aside_rejected_even_when_prose(spark):
    docs = spark.createDataFrame([("d1", PAGE)], "doc_id string, text string")
    blocks = classify_blocks(html_blocks(docs)).collect()
    aside = [r for r in blocks if "aside" in r["tag_path"]]
    assert aside and not any(r["is_content"] for r in aside)


def test_strip_tags_expr(spark):
    docs = spark.createDataFrame([("d1", "<p>a  <b>b</b></p><br>c")],
                                 "doc_id string, text string")
    out = docs.select(strip_tags_expr(F.col("text")).alias("t")).first()
    assert out["t"] == "a b c"
