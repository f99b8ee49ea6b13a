"""Contamination detection, deterministic sampling, passage dedup."""
import hashlib

import pytest
from pyspark.sql import functions as F

from azuresearchcrawlervector_spark.operators.contamination import (
    contamination_report, decontaminate,
)
from azuresearchcrawlervector_spark.operators.dedup import passage_dedup
from azuresearchcrawlervector_spark.operators.sampling import (
    mixture_rates, mixture_sample, stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- contamination

BENCH_Q = "what is the capital of france"


def test_contamination_report_counts(spark):
    docs = _docs(spark, [
        (1, f"intro words then {BENCH_Q} closing words"),   # contains the 5-gram
        (2, "totally unrelated text about fast tables and rows"),
        (3, BENCH_Q),                                       # the benchmark itself
    ])
    bench = spark.createDataFrame([(100, BENCH_Q)], "bench_id long, text string")
    rep = {r["doc_id"]: r for r in
           contamination_report(docs, bench, k=3).collect()}
    assert set(rep) == {1, 2, 3}
    # doc 3 IS the benchmark text: every shingle hits
    assert rep[3]["n_hit"] == rep[3]["n_shingles"]
    assert rep[3]["contam"] == 1.0
    assert rep[2]["n_hit"] == 0 and rep[2]["contam"] == 0.0
    # doc 1 embeds the question: all 4 of its 3-gram hits come from it
    assert rep[1]["n_hit"] == 4
    assert 0.0 < rep[1]["contam"] < 1.0


def test_contamination_min_ratio_filters(spark):
    docs = _docs(spark, [(1, BENCH_Q), (2, "other text entirely here")])
    bench = spark.createDataFrame([(1, BENCH_Q)], "bench_id long, text string")
    out = contamination_report(docs, bench, k=3, min_ratio=0.5).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_decontaminate_drops_hits_keeps_schema(spark):
    docs = _docs(spark, [
        (1, f"padding {BENCH_Q} padding"),
        (2, "clean document with no overlap at all"),
        (3, "tiny"),  # < k words: no shingles, must survive
    ])
    bench = spark.createDataFrame([(1, BENCH_Q)], "bench_id long, text string")
    out = decontaminate(docs, bench, k=3, max_ratio=0.0)
    assert out.columns == docs.columns
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]


def test_contamination_broadcast_no_corpus_shuffle_for_probe(spark):
    docs = _docs(spark, [(i, f"doc {i} words alpha beta gamma") for i in range(20)])
    bench = spark.createDataFrame([(1, "alpha beta gamma")], "bench_id long, text string")
    plan = (contamination_report(docs, bench, k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan


# ---------------------------------------------------------------- sampling

def _u60(salt: str, key) -> float:
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16) / float(1 << 60)


def test_stratified_sample_matches_python_oracle(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.3, "de": 0.7}
    got = sorted(r["doc_id"] for r in
                 stratified_sample(df, rates, "lang", "doc_id", salt="t1").collect())
    want = sorted(i for i, g in rows if _u60("t1", i) < rates[g])
    assert got == want
    assert 0 < len(got) < 400


def test_stratified_sample_default_rate_drops_unlisted(spark):
    df = spark.createDataFrame([(1, "en"), (2, "xx")], "doc_id long, lang string")
    out = stratified_sample(df, {"en": 1.0}, "lang", "doc_id")
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_stratified_sample_is_narrow_no_shuffle(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    plan = (stratified_sample(df, {"en": 0.5}, "lang", "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_mixture_rates_and_sample(spark):
    rows = ([(i, "en") for i in range(300)]
            + [(i, "de") for i in range(300, 400)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = mixture_rates(df, {"en": 0.5, "de": 0.5}, total=100, group_col="lang")
    assert rates["en"] == pytest.approx(50 / 300)
    assert rates["de"] == pytest.approx(50 / 100)
    out = mixture_sample(df, {"en": 0.5, "de": 0.5}, total=100, group_col="lang")
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # expectation 50/50; md5 deviates are uniform, allow wide tolerance
    assert 25 <= by_lang["en"] <= 75
    assert 25 <= by_lang["de"] <= 75


def test_mixture_rates_caps_at_one_and_skips_absent(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    rates = mixture_rates(df, {"en": 1.0, "fr": 0.5}, total=10)
    assert rates == {"en": 1.0}


# ---------------------------------------------------------------- passage dedup

def test_passage_dedup_newline_mode(spark):
    docs = _docs(spark, [
        (1, "alpha line\nshared boilerplate\nbeta line"),
        (2, "shared boilerplate\ngamma line"),
        (3, "shared boilerplate"),
    ])
    out = {r["doc_id"]: r for r in passage_dedup(docs).collect()}
    assert out[1]["clean_text"] == "alpha line\nshared boilerplate\nbeta line"
    assert out[1]["n_passages"] == 3 and out[1]["n_kept"] == 3
    # doc 2 loses the boilerplate (first seen in doc 1)
    assert out[2]["clean_text"] == "gamma line"
    assert out[2]["n_kept"] == 1
    # doc 3 is ALL boilerplate: survives with empty text
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
    assert out[3]["n_passages"] == 1


def test_passage_dedup_first_occurrence_is_positional(spark):
    # within one doc, a repeated line keeps only its first position
    docs = _docs(spark, [(7, "x\ny\nx")])
    out = passage_dedup(docs).collect()[0]
    assert out["clean_text"] == "x\ny"
    assert out["n_passages"] == 3 and out["n_kept"] == 2


def test_passage_dedup_word_window_mode(spark):
    docs = _docs(spark, [
        (1, "a b c d e f"),          # windows of 3: "a b c", "d e f"
        (2, "a b c g h i"),          # first window duplicates doc 1's
    ])
    out = {r["doc_id"]: r for r in
           passage_dedup(docs, words_per_passage=3).collect()}
    assert out[1]["clean_text"] == "a b c d e f"
    assert out[2]["clean_text"] == "g h i"
    assert out[2]["n_passages"] == 2 and out[2]["n_kept"] == 1


def test_passage_dedup_no_window_operator_in_plan(spark):
    # first-occurrence selection must be the combinable groupBy(min),
    # not a per-occurrence window shuffle
    docs = _docs(spark, [(1, "a\nb")])
    plan = passage_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
