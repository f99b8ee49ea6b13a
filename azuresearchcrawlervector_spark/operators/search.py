"""BM25 keyword search over a document corpus.

Okapi BM25 (Robertson/Spärck Jones; the Lucene +1 idf variant) as a
declarative Spark plan — the lexical complement to the vector paths in
operators/similarity.py and operators/pq.py.

Scale shape: the per-term postings are built by exploding tokens and
filtering to the query's terms BEFORE any shuffle (a literal isin — a
map-side filter, so only matching postings cross the wire; this is
the access pattern of an inverted index, derived on the fly). Document
lengths are one combinable groupBy; N and avgdl are one scalar agg;
per-term document frequencies come from the tiny per-term tf table and
are broadcast back. At a persistent 100 TB deployment the tf/dl tables
are the precomputed inverted index (write them bucketed by term) —
``bm25_index``/``bm25_search_index`` below split build from query so
repeated queries reuse the build, exactly like write_ivf_partitioned
splits layout from probe.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TOKS = "filter(split(lower({col}), '\\\\s+'), x -> x != '')"


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.expr(_TOKS.format(col=text_col)).alias("_ts"))
        .select("doc_id", F.size("_ts").alias("dl"),
                F.explode("_ts").alias("tok"))
    )


def bm25_index(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """(postings, doclens): postings = (tok, doc_id, tf) — the
    inverted index; doclens = (doc_id, dl). Postings are one combinable
    groupBy; doclens is a NARROW projection (dl = token-array size, no
    explode, no shuffle), filtered to dl > 0 so the doc set is exactly
    the docs-with-≥1-token set the exploded form produced. Persist
    them bucketed by tok / doc_id for a standing index."""
    toks = _tokens(df, text_col, id_col)
    postings = toks.groupBy("tok", "doc_id").agg(F.count("*").alias("tf"))
    doclens = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.size(F.expr(_TOKS.format(col=text_col))).alias("dl"))
        .filter(F.col("dl") > 0)
    )
    return postings, doclens


def bm25_search_index(
    postings: DataFrame, doclens: DataFrame, query: str,
    k: int = 10, k1: float = 1.2, b: float = 0.75,
) -> DataFrame:
    """Top-k (doc_id, score) for ``query`` over a prebuilt index.
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf = ln((N − df + 0.5)/(df + 0.5) + 1); rounded to 4 before the
    (score DESC, doc_id) order so ranking is engine-stable."""
    terms = sorted({t for t in query.lower().split() if t})
    n_docs, avgdl = doclens.agg(
        F.count("*"), F.avg("dl")).first()
    if not n_docs or avgdl is None or not terms:
        # empty corpus / all-empty docs / empty query: empty result,
        # not a float(None) crash
        return (doclens.select(F.col("doc_id"),
                               F.lit(0.0).alias("score")).limit(0))
    hit = postings.filter(F.col("tok").isin(terms))
    dfreq = hit.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    idf = dfreq.withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
              / (F.col("df") + 0.5) + 1.0))
    scored = (
        hit.join(F.broadcast(idf.select("tok", "idf")), "tok")
        .join(doclens, "doc_id")
        .withColumn(
            "contrib",
            F.col("idf") * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf")
               + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bm25_topk(
    df: DataFrame, query: str, k: int = 10,
    k1: float = 1.2, b: float = 0.75,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """One-shot convenience: build the (transient) index and search."""
    postings, doclens = bm25_index(df, text_col, id_col)
    return bm25_search_index(postings, doclens, query, k, k1, b)


def tfidf_keywords(
    df: DataFrame, top_k: int = 5,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, keywords) — the top-k terms per document by smoothed
    tf-idf (sklearn convention: idf = ln((1+N)/(1+df)) + 1), keywords
    comma-joined in (score DESC, token ASC) order. Scores are rounded
    to 6 BEFORE ranking so the selection is engine-stable.

    Scale: tf and document frequency are two combinable groupBys (df
    derives from the tf table, so tokens are hashed once); N is one
    scalar. The per-doc top-k is array_sort+slice inside the doc
    groupBy — no window, no second shuffle over token rows."""
    toks = _tokens(df, text_col, id_col).select("doc_id", "tok")
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("dfq"))
    n_docs = df.count()
    sc = (
        tf.join(dfreq, "tok")
        .withColumn(
            "sc",
            F.round(
                F.col("tf")
                * (F.log(F.lit(1.0 + n_docs) / (F.col("dfq") + 1)) + 1.0),
                6))
    )
    return (
        sc.groupBy("doc_id")
        .agg(F.expr(
            f"slice(array_sort(collect_list(struct(-sc AS nsc, tok))),"
            f" 1, {top_k})").alias("_top"))
        .select(
            "doc_id",
            F.expr("array_join(transform(_top, s -> s.tok), ',')")
             .alias("keywords"))
    )
