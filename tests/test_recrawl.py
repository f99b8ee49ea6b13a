"""Incremental recrawl delta (operators/recrawl.py)."""
from azuresearchcrawlervector_spark.operators.recrawl import (
    recrawl_delta, with_fingerprint)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_delta_classification(spark):
    prev = _docs(spark, [
        (1, "stable content"),
        (2, "old content"),
        (3, "will vanish"),
        (4, "Whitespace   Only\nchange"),
    ])
    cur = _docs(spark, [
        (1, "stable content"),
        (2, "rewritten content"),
        (4, "whitespace only CHANGE"),   # normalized-equal fingerprint
        (5, "brand new page"),
    ])
    got = {r["doc_id"]: r["status"]
           for r in recrawl_delta(prev, cur).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "gone",
                   4: "unchanged", 5: "new"}


def test_projection_is_two_columns(spark):
    df = _docs(spark, [(1, "a b c")])
    assert with_fingerprint(df).columns == ["doc_id", "fp"]


def test_plan_prunes_to_id_and_text(spark):
    # the join must read only (doc_id, text) from wide inputs
    wide = _docs(spark, [(1, "x")]).selectExpr(
        "doc_id", "text", "repeat('p', 10) as payload",
        "doc_id * 2 as other")
    plan = recrawl_delta(wide, wide)._jdf.queryExecution(
        ).optimizedPlan().toString()
    assert "payload" not in plan
    assert "FullOuter" in plan or "full_outer" in plan.lower()


def test_null_text_presence_not_misread_as_new(spark):
    # NULL text (failed fetch) has a NULL fingerprint but the url is
    # still PRESENT — it must never classify as 'new'
    prev = _docs(spark, [(1, None), (2, None), (3, None)])
    cur = _docs(spark, [(1, "recovered"), (2, None)])  # 3 vanishes
    got = {r["doc_id"]: r["status"]
           for r in recrawl_delta(prev, cur).collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "gone"}
