"""Composed curation pipeline (operators/curation.py)."""
from pyspark.sql import functions as F

from azuresearchcrawlervector_spark.operators.curation import curate_corpus

GOOD_EN = ("the quick brown fox jumps over the lazy dog and runs to the "
           "river in the morning light with a friend and a song " * 4)
GOOD_DE = ("der hund und die katze laufen und das ist ein guter tag "
           "und der wald ist still " * 5)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_quality_and_lang_gates(spark):
    df = _docs(spark, [
        (1, GOOD_EN),
        (2, GOOD_EN),            # exact dup of 1 -> dropped (keeper=1)
        (3, GOOD_DE),            # german -> dropped by langs=('en',)
        (4, "x!!! ???"),         # junk -> dropped by quality gate
        (5, GOOD_EN + " extra tail words here"),
    ])
    out = {r["doc_id"]: r for r in
           curate_corpus(df, min_quality=0.5, langs=("en",)).collect()}
    assert set(out) == {1, 5}
    assert out[1]["lang_pred"] == "en"
    assert out[1]["quality"] >= 0.5
    assert out[1]["n_tokens"] > 50


def test_lang_allowlist_extends(spark):
    df = _docs(spark, [(1, GOOD_EN), (2, GOOD_DE)])
    out = curate_corpus(df, min_quality=0.3, langs=("en", "de"))
    assert {r["lang_pred"] for r in out.collect()} == {"en", "de"}


def test_single_corpus_scan_plan(spark):
    # the composed pipeline must not re-scan the table per stage: one
    # scan feeds the dedup groupBy, one feeds the scoring projection
    df = spark.range(10).selectExpr("id as doc_id",
                                    "concat('the and is with ', id) as text")
    plan = curate_corpus(df)._jdf.queryExecution().executedPlan().toString()
    # no cartesian / no broadcast nested loop — semi join on doc_id
    assert "Cartesian" not in plan
    assert "LeftSemi" in plan
