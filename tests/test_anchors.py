"""Anchor-text aggregation (operators/anchors.py)."""
from azuresearchcrawlervector_spark.operators.anchors import (
    anchor_text_local, anchor_text_table, extract_anchors,
)


def test_extract_anchors_nested_and_entities():
    html = ('<p>pre</p><a href="/x">click <b>here</b> now</a>'
            '<a href="/y">R&amp;D</a><a name="no-href">skip</a>'
            '<a href="#frag"></a>')
    assert extract_anchors(html) == [
        ("/x", "click here now"), ("/y", "R&D"), ("#frag", "")]
    assert extract_anchors(None) == []


def test_anchor_table_aggregates_and_filters(spark):
    pages = [
        ("http://h.example.com/", '<a href="/a.html">Alpha page</a>'
                                  '<a href="/a.html">Alpha page</a>'
                                  '<a href="#top">skip</a>'
                                  '<a href="mailto:x@y">skip</a>'),
        ("http://h.example.com/b", '<a href="/a.html">The A</a>'
                                   '<a href="/c.html"></a>'),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    got = {r["target"]: (r["n_refs"], r["n_sources"], r["anchors"])
           for r in anchor_text_table(df).collect()}
    a = got["http://h.example.com/a.html"]
    assert a[0] == 3 and a[1] == 2
    assert a[2] == "Alpha page, The A"
    # empty anchor text aggregates to '' (dropped from the set)
    assert got["http://h.example.com/c.html"] == (1, 1, "")


def test_anchor_table_matches_local_twin_on_fixture(spark):
    from azuresearchcrawlervector_spark.sources.fixtures import test_website
    from azuresearchcrawlervector_spark.sources.synthetic import pages_df
    g = test_website()
    pg = pages_df(spark, g).select("url", "html")
    got = {r["target"]: (r["n_refs"], r["n_sources"], r["anchors"])
           for r in anchor_text_table(pg).collect()}
    want = anchor_text_local(
        [(r["url"], r["html"]) for r in pg.collect()])
    assert got == want
    assert len(got) > 5


def test_extract_anchors_malformed_autoclose_and_eof():
    # browsers auto-close an open <a> at the next <a>; and an unclosed
    # trailing anchor must still be emitted
    html = '<a href="/x">one<a href="/y">two</a><a href="/z">tail'
    assert extract_anchors(html) == [
        ("/x", "one"), ("/y", "two"), ("/z", "tail")]
