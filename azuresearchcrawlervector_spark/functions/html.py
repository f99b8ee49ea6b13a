"""HTML extraction UDF: one Arrow-batched pass per page producing
title + cleaned text + the ordered link list (T1/T2 + F5/F6 semantics,
TextExtractor.cs:19-72 / AbotCrawler.cs:68-88). Parsing happens ONCE per
page; downstream link handling is pure built-ins (explode/filter).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..core.htmlkit import extract_body_html, extract_page

LINK_TYPE = StructType(
    [
        StructField("href", StringType()),
        StructField("link_pos", IntegerType()),
        StructField("in_selector", BooleanType()),
    ]
)

EXTRACT_TYPE = StructType(
    [
        StructField("title", StringType()),
        StructField("content", StringType()),
        StructField("links", ArrayType(LINK_TYPE)),
    ]
)


@F.pandas_udf(EXTRACT_TYPE)
def extract_page_udf(html: pd.Series, selector: pd.Series) -> pd.DataFrame:
    titles, contents, links = [], [], []
    for doc, sel in zip(html, selector):
        t, c, ls = extract_page(doc, sel if isinstance(sel, str) and sel else None)
        titles.append(t)
        contents.append(c)
        links.append([{"href": h, "link_pos": p, "in_selector": s} for h, p, s in ls])
    return pd.DataFrame({"title": titles, "content": contents, "links": links})


def with_extraction(df, html_col: str = "html", selector: str | None = None):
    """df + (title, content, links) columns from one parse pass."""
    ext = extract_page_udf(F.col(html_col), F.lit(selector))
    return (
        df.withColumn("_ext", ext)
        .withColumn("title", F.col("_ext.title"))
        .withColumn("content", F.col("_ext.content"))
        .withColumn("links", F.col("_ext.links"))
        .drop("_ext")
    )


@F.pandas_udf(StringType())
def raw_body_udf(html: pd.Series) -> pd.Series:
    """T3 raw-HTML mode: inner HTML of <body>, scripts kept
    (TextExtractor.cs:45-48; test TextExtractorTests.cs:109-119)."""
    return html.map(extract_body_html, na_action="ignore")


def clean_whitespace_col(text: Column) -> Column:
    """The reference's whitespace collapse (TextExtractor.cs:74-80) as pure
    built-ins, for text already extracted: [\\r\\n]+ → ' ', [ \\t]+ → ' ', trim."""
    return F.trim(F.regexp_replace(F.regexp_replace(text, r"[\r\n]+", " "), r"[ \t]+", " "))
