"""BM25 keyword search (operators/search.py)."""
import math

from azuresearchcrawlervector_spark.operators.search import (
    bm25_index, bm25_search_index, bm25_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "spark shuffles data between stages"),
    (2, "spark spark spark tuning guide"),
    (3, "cats and dogs and more cats"),
    (4, "data data data data data data data data"),
    (5, "spark data pipeline"),
]


def _py_bm25(rows, query, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    terms = sorted(set(query.lower().split()))
    out = {}
    for i, toks in docs.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            df = sum(1 for tt in docs.values() if t in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s:
            out[i] = round(s, 4)
    return out


def test_bm25_matches_python_reference(spark):
    df = _docs(spark, CORPUS)
    got = {r["doc_id"]: r["score"] for r in
           bm25_topk(df, "spark data", k=10).collect()}
    want = _py_bm25(CORPUS, "spark data")
    assert got == want


def test_bm25_ranking_properties(spark):
    df = _docs(spark, CORPUS)
    ranked = [r["doc_id"] for r in bm25_topk(df, "spark", k=3).collect()]
    # doc 2 has tf=3 of a rarer term profile; doc 3 has no hit at all
    assert ranked[0] == 2
    assert 3 not in ranked
    # common term "data" (in 3 docs) contributes less than rarer "cats"
    cats = bm25_topk(df, "cats", k=1).collect()[0]
    assert cats["doc_id"] == 3


def test_bm25_split_index_equals_oneshot(spark):
    df = _docs(spark, CORPUS)
    postings, doclens = bm25_index(df)
    a = bm25_search_index(postings, doclens, "spark data", k=10).collect()
    b = bm25_topk(df, "spark data", k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_term_filter_pushes_below_postings_shuffle(spark):
    # the isin(term) filter must run map-side (below the tf groupBy's
    # exchange), so only matching postings shuffle — assert the Filter
    # sits under the first aggregate in the postings subtree
    df = _docs(spark, CORPUS)
    plan = (bm25_topk(df, "spark", k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # generator (explode) feeds a filter containing the literal term
    gen = plan.index("Generate explode")
    assert "spark" in plan[gen - 600:gen + 600]


def test_tfidf_keywords_python_reference(spark):
    from azuresearchcrawlervector_spark.operators.search import tfidf_keywords
    corpus = [
        (1, "rare gems rare gems shine common common common"),
        (2, "common words fill this common document"),
        (3, "gems appear here too with common words"),
    ]
    df = _docs(spark, corpus)
    got = {r["doc_id"]: r["keywords"] for r in
           tfidf_keywords(df, top_k=3).collect()}

    docs = {i: t.split() for i, t in corpus}
    n = len(docs)
    dfq = {}
    for toks in docs.values():
        for t in set(toks):
            dfq[t] = dfq.get(t, 0) + 1
    want = {}
    for i, toks in docs.items():
        sc = {t: round(toks.count(t) * (math.log((1.0 + n) / (dfq[t] + 1)) + 1.0), 6)
              for t in set(toks)}
        top = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want[i] = ",".join(t for t, _ in top)
    assert got == want
    # the ubiquitous term never outranks the distinctive ones
    assert not got[1].startswith("common")


def test_tfidf_no_window_single_doc_shuffle(spark):
    from azuresearchcrawlervector_spark.operators.search import tfidf_keywords
    df = _docs(spark, CORPUS)
    plan = (tfidf_keywords(df, top_k=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan


def test_bm25_empty_corpus_and_empty_query(spark):
    empty = _docs(spark, [])
    assert bm25_topk(empty, "spark").collect() == []
    df = _docs(spark, CORPUS)
    assert bm25_topk(df, "   ").collect() == []
