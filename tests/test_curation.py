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


def test_curate_corpus_v2_stage_semantics(spark):
    from azuresearchcrawlervector_spark.operators.curation import (
        curate_corpus_v2,
    )
    bench_text = "what is the capital of france"
    docs = spark.createDataFrame([
        # 1: contaminated (contains the benchmark 3-grams) -> dropped
        (1, f"padding {bench_text} padding", "en"),
        # 2: clean, unique passages, no repetition -> survives
        (2, "alpha beta gamma delta epsilon zeta eta theta", "en"),
        # 3: all its passages duplicate doc 2's -> n_kept 0 -> dropped
        (3, "alpha beta gamma delta epsilon zeta eta theta", "en"),
        # 4: heavy bigram repetition -> repetition gate drops it
        (4, "spam ham spam ham spam ham spam ham spam ham spam ham", "en"),
        # 5: clean german doc -> survives
        (5, "eins zwei drei vier fuenf sechs sieben acht", "de"),
    ], "doc_id long, text string, lang string")
    bench = spark.createDataFrame([(9, bench_text)],
                                  "bench_id long, text string")
    out = {r["doc_id"]: r for r in curate_corpus_v2(
        docs, bench, words_per_passage=4, max_dup_bigram_frac=0.1,
        target_shares={"en": 0.5, "de": 0.5}, total=100).collect()}
    # rates cap at 1.0 (total >> survivors) so every survivor samples
    assert set(out) == {2, 5}
    assert out[2]["n_kept"] == 2 and out[2]["dup_bigram_frac"] == 0.0
    assert out[5]["lang"] == "de"


def test_curation_v2_barrier_scan_count(spark):
    """The materialization barriers (round-5 VERDICT #3) must collapse
    the composed plan: with materialize=True the FINAL plan reads only
    the checkpointed stage outputs plus the base table for the
    group-col join — a handful of scans, not the audited 38-scan /
    128-Exchange re-derivation. And both modes agree exactly."""
    from azuresearchcrawlervector_spark.operators.curation import (
        curate_corpus_v2,
    )
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} alpha beta gamma "
             f"delta epsilon zeta eta theta iota kappa", "en")
         for i in range(40)],
        "doc_id long, text string, lang string")
    bench = spark.createDataFrame([(9, "tok1 tok2 tok3")],
                                  "bench_id long, text string")
    fast = curate_corpus_v2(docs, bench, target_shares={"en": 1.0},
                            total=100)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan ")
    assert n_scans <= 8, plan
    slow = curate_corpus_v2(docs, bench, target_shares={"en": 1.0},
                            total=100, materialize=False)
    assert sorted(map(tuple, fast.collect())) == \
        sorted(map(tuple, slow.collect()))
