"""Sequence packing (operators/packing.py)."""
from azuresearchcrawlervector_spark.operators.packing import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_matches_serial_reference(spark):
    rows = [(i, " ".join(["w"] * (3 + i % 7))) for i in range(50)]
    df = _docs(spark, rows)
    got = {r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_off"])
           for r in pack_sequences(df, seq_len=16, shard_size=7).collect()}
    start = 0
    for i, text in rows:
        n = len(text.split())
        assert got[i] == (n, start // 16, start % 16), i
        start += n


def test_pack_shard_size_invariant(spark):
    # the distributed prefix sum must give identical output for ANY
    # shard size (it is pure parallel decomposition, not semantics)
    rows = [(i * 3, " ".join(["t"] * (1 + i % 11))) for i in range(80)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, pack_sequences(df, 32, shard_size=5).collect()))
    b = sorted(map(tuple, pack_sequences(df, 32, shard_size=1000).collect()))
    assert a == b


def test_pack_stream_is_gapless(spark):
    # consecutive docs tile the token stream exactly: next start ==
    # prev start + prev len
    rows = [(i, " ".join(["x"] * (5 + (i * 7) % 13))) for i in range(40)]
    df = _docs(spark, rows)
    out = sorted(
        ((r["seq_id"] * 64 + r["seq_off"], r["n_tokens"]) for r in
         pack_sequences(df, seq_len=64).collect()))
    pos = 0
    for start, n in out:
        assert start == pos
        pos += n


# ------------------------------------------------------- repeated spans

def test_repeated_spans_cross_doc(spark):
    from azuresearchcrawlervector_spark.operators.dedup import repeated_spans
    common = "one two three four five six"
    docs = spark.createDataFrame([
        (1, f"aa bb {common} cc dd"),
        (2, f"zz {common} yy"),
        (3, "totally different words here entirely now"),
    ], "doc_id long, text string")
    out = {(r["doc_id"]): (r["start_tok"], r["end_tok"], r["span_len"])
           for r in repeated_spans(docs, k=3).collect()}
    # doc 1: common run is tokens 2..7 -> k-gram starts 2..5, span [2, 8)
    assert out[1] == (2, 8, 6)
    # doc 2: tokens 1..6 -> span [1, 7)
    assert out[2] == (1, 7, 6)
    assert 3 not in out


def test_repeated_spans_intra_doc_and_merge(spark):
    from azuresearchcrawlervector_spark.operators.dedup import repeated_spans
    # the same 3-gram twice WITHIN one doc; two disjoint marked runs
    docs = spark.createDataFrame([
        (1, "p q r xx p q r"),
    ], "doc_id long, text string")
    out = sorted(map(tuple, repeated_spans(docs, k=3).collect()))
    assert out == [(1, 0, 3, 3), (1, 4, 7, 3)]


def test_repeated_spans_adjacent_positions_merge(spark):
    from azuresearchcrawlervector_spark.operators.dedup import repeated_spans
    # two overlapping duplicated k-grams chain into ONE maximal span
    docs = spark.createDataFrame([
        (1, "a b c d e"),
        (2, "a b c d e"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: (r["start_tok"], r["end_tok"])
           for r in repeated_spans(docs, k=4).collect()}
    assert out[1] == (0, 5) and out[2] == (0, 5)


def test_pack_rejects_non_integral_id(spark):
    import pytest
    df = spark.createDataFrame([("k1", "a b")], "doc_id string, text string")
    with pytest.raises(TypeError):
        pack_sequences(df)


def test_passage_dedup_null_text_survives(spark):
    from azuresearchcrawlervector_spark.operators.dedup import passage_dedup
    df = spark.createDataFrame([(1, "alpha beta"), (2, None)],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           passage_dedup(df, words_per_passage=4).collect()}
    assert set(out) == {1, 2}
    assert out[2]["n_kept"] in (0, 1)   # empty passage, never dropped
