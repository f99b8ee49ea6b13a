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
