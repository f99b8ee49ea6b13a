"""Bigram LM training and CCNet-style quality scoring."""
import math

from azuresearchcrawlervector_spark.operators.lm import (
    doc_bigrams, lm_quality, lm_score, train_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_bigrams_occurrences_and_short_docs(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "solo"), (3, "x y")])
    got = sorted((r["doc_id"], r["bg"]) for r in doc_bigrams(df).collect())
    # occurrences, not distinct: "a b" twice in doc 1
    assert got == [(1, "a b"), (1, "a b"), (1, "b a"), (3, "x y")]


def test_train_counts(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "a c")])
    model, v = train_bigram_lm(df)
    rows = {r["bg"]: (r["c2"], r["c1"]) for r in model.collect()}
    # prefixes: a(x3: ab,ab,ac), b(x1: ba) -> V = 2
    assert v == 2
    assert rows["a b"] == (2, 3)
    assert rows["a c"] == (1, 3)
    assert rows["b a"] == (1, 1)


def test_lm_score_matches_python(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "a c")])
    model, v = train_bigram_lm(df)
    out = {r["doc_id"]: r for r in lm_score(df, model, v, alpha=0.5).collect()}

    def p(c2, c1):
        return (c2 + 0.5) / (c1 + 0.5 * v)

    d1 = (2 * math.log10(p(2, 3)) + math.log10(p(1, 1))) / 3
    d2 = math.log10(p(1, 3))
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["avg_logp"] - round(d1, 4)) < 1e-9
    assert abs(out[2]["avg_logp"] - round(d2, 4)) < 1e-9


def test_lm_quality_separates_fluent_from_shuffled(spark):
    # corpus dominated by a repeated fluent pattern: a doc following the
    # pattern outscores a doc of the same tokens in scrambled order
    base = [(i, "the cat sat on the mat") for i in range(20)]
    df = _docs(spark, base + [(100, "the cat sat on the mat"),
                              (101, "mat the on sat cat the")])
    out = {r["doc_id"]: r["avg_logp"] for r in lm_quality(df).collect()}
    assert out[100] > out[101]


def test_unseen_bigram_backs_off(spark):
    train = _docs(spark, [(1, "a b c")])
    test = _docs(spark, [(9, "a z")])   # prefix 'a' seen, bigram unseen
    model, v = train_bigram_lm(train)
    out = lm_score(test, model, v, alpha=0.5).collect()[0]
    # P = (0 + .5) / (c1('a')=1 + .5*V=2) -> .5/2
    assert abs(out["avg_logp"] - round(math.log10(0.5 / 2.0), 4)) < 1e-9


def test_min_count_prunes_but_keeps_prefix_marginals(spark):
    df = _docs(spark, [(1, "a b a b a c")])
    model, v = train_bigram_lm(df, min_count=2)
    kept = {r["bg"] for r in model.collect()}
    assert kept == {"a b", "b a"}       # "a c" (count 1) pruned
    out = lm_score(df, model, v).collect()[0]
    # scoring still runs; pruned bigrams hit the backoff floor with the
    # TRUE c1 for prefix 'a' (from the surviving "a b" row)
    assert out["n_bigrams"] == 5


def test_repetition_stats_exact(spark):
    from azuresearchcrawlervector_spark.operators.lm import repetition_stats
    df = _docs(spark, [
        (1, "a a a b"),        # toks 4, top 'a' 3/4; bgs: aa,aa,ab -> top 2/3, dup 2/3
        (2, "x y z w"),        # no repetition: top_tok 1/4, bigram fracs 1/3, 0
        (3, "solo"),           # 1 token: no bigrams -> fracs 1.0 / 0 / 0
    ])
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["top_tok_frac"] == 0.75
    assert out[1]["top_bigram_frac"] == round(2 / 3, 6)
    assert out[1]["dup_bigram_frac"] == round(2 / 3, 6)
    assert out[2]["top_tok_frac"] == 0.25
    assert out[2]["top_bigram_frac"] == round(1 / 3, 6)
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[3]["n_tokens"] == 1
    assert out[3]["top_tok_frac"] == 1.0
    assert out[3]["top_bigram_frac"] == 0.0 and out[3]["dup_bigram_frac"] == 0.0


def test_repetition_flags_boilerplate(spark):
    from azuresearchcrawlervector_spark.operators.lm import repetition_stats
    df = _docs(spark, [
        (1, "click here to buy " * 20),
        (2, "a genuinely varied sentence with many different words here"),
    ])
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["dup_bigram_frac"] > 0.9
    assert out[2]["dup_bigram_frac"] == 0.0


def test_min_count_keeps_orphan_prefix_marginals(spark):
    # prefix 'c' loses its ONLY bigram to pruning; its true c1 must
    # still reach scoring (via a bg=NULL carrier row), not default to 0
    train = _docs(spark, [(1, "a b a b c d c e")])
    model, v = train_bigram_lm(train, min_count=2)
    c1 = {r["w1"]: r["c1"] for r in
          model.select("w1", "c1").distinct().collect()}
    assert c1["c"] == 2                      # carried by an orphan row
    out = lm_score(_docs(spark, [(9, "c z")]), model, v).collect()[0]
    # P = (0 + .5) / (c1('c')=2 + .5*V)
    assert abs(out["avg_logp"]
               - round(math.log10(0.5 / (2 + 0.5 * v)), 4)) < 1e-9
