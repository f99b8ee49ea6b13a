"""Anchor-text aggregation per link target — the classic web-index
signal (how OTHER pages describe a URL), used for search ranking and
crawl prioritization (a target accumulating many distinct anchor
descriptions is worth fetching early).

Standalone from the crawl hot path: a dedicated stdlib anchor parser
(rather than widening the flagship extraction kernel's link tuple) and
one Arrow-batched extraction pass, then pure DataFrame aggregation.
Scale shape: mapInPandas extraction (one parse per page, same cost
class as the flagship extractor) → explode → groupBy(target) with
combinable aggregates; anchor-text sets are collect_set over the
target's in-links — bounded by in-degree, and a 10^10 deployment caps
it with slice() exactly like the repo's other collect_set sites.
"""
from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core.urls import canonicalize, href_is_crawlable


class _AnchorParser(HTMLParser):
    """(href, text) for every <a href=...>, text = concatenated data
    inside the anchor (nested tags contribute their text), whitespace
    collapsed; entity refs decoded by convert_charrefs (default)."""

    def __init__(self):
        super().__init__()
        self.out: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []

    def _flush(self):
        if self._href is not None:
            text = " ".join("".join(self._buf).split())
            self.out.append((self._href, text))
            self._href = None

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            # browsers auto-close an open <a> when the next one starts
            # (anchors cannot nest); malformed real-web HTML must not
            # silently lose the first link
            self._flush()
            href = dict(attrs).get("href")
            if href is not None:
                self._href = href
                self._buf = []

    def handle_endtag(self, tag):
        if tag == "a":
            self._flush()

    def close(self):
        super().close()
        self._flush()               # unclosed trailing anchor at EOF

    def handle_data(self, data):
        if self._href is not None:
            self._buf.append(data)


def extract_anchors(html: str | None) -> list[tuple[str, str]]:
    """All (href, anchor_text) pairs in document order."""
    if not html:
        return []
    p = _AnchorParser()
    p.feed(html)
    p.close()
    return p.out


def anchor_text_table(
    pages: DataFrame, html_col: str = "html", url_col: str = "url",
) -> DataFrame:
    """(target, n_refs, n_sources, anchors): per canonical crawlable
    link target — total in-references, distinct referring pages, and
    the sorted distinct anchor texts (comma-joined, '' dropped)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                for href, text in extract_anchors(html):
                    if not href_is_crawlable(href):
                        continue
                    tgt = canonicalize(url, href)
                    if tgt:
                        rows.append((url, tgt, text))
            yield pd.DataFrame(rows, columns=["src", "target", "text"])

    refs = pages.mapInPandas(
        batches, "src string, target string, text string")
    return (
        refs.groupBy("target")
        .agg(
            F.count("*").alias("n_refs"),
            F.countDistinct("src").alias("n_sources"),
            F.array_join(
                F.array_sort(F.collect_set(
                    F.when(F.col("text") != "", F.col("text")))),
                ", ").alias("anchors"),
        )
    )


def anchor_text_local(pages: list[tuple[str, str]]) -> dict:
    """Pure-python golden twin: {target: (n_refs, n_sources, anchors)}
    with identical canonicalization/crawlability/aggregation rules."""
    agg: dict[str, list] = {}
    for url, html in pages:
        for href, text in extract_anchors(html):
            if not href_is_crawlable(href):
                continue
            tgt = canonicalize(url, href)
            if not tgt:
                continue
            a = agg.setdefault(tgt, [0, set(), set()])
            a[0] += 1
            a[1].add(url)
            if text:
                a[2].add(text)
    return {t: (n, len(srcs), ", ".join(sorted(txts)))
            for t, (n, srcs, txts) in agg.items()}
