"""BPE tokenizer (functions/bpe.py): deterministic training from word
counts, greedy encoding, and the distributed train + encode operators."""
import pytest

from azuresearchcrawlervector_spark.functions.bpe import (
    END_OF_WORD, bpe_encode_table, encode_word, train_bpe,
    train_bpe_from_counts)


def _ranks(merges):
    return {tuple(m): i for i, m in enumerate(merges)}


def test_first_merge_is_most_frequent_pair():
    # "ab" pair appears 30x ('abc' 10 + 'abd' 20), beats everything
    merges = train_bpe_from_counts(
        [("abc", 10), ("abd", 20), ("xy", 5)], vocab_size=9)
    assert merges[0] == ("a", "b")


def test_tie_breaks_lexicographic():
    # every pair ties at 5 — order is purely lexicographic: ('a','b')
    # first, then the merged ('ab', marker) beats ('c','d')
    merges = train_bpe_from_counts([("ab", 5), ("cd", 5)], vocab_size=9)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", END_OF_WORD)
    assert ("c", "d") in merges


def test_merges_compose_into_full_words():
    # one dominant word ends up a single token (incl. end marker)
    merges = train_bpe_from_counts([("hello", 100), ("hell", 2)],
                                   vocab_size=64)
    enc = encode_word("hello", _ranks(merges))
    assert enc == ["hello" + END_OF_WORD]
    # 'hell' shares prefix merges but stays multi-token or whole —
    # either way the concatenation reconstructs the word
    enc2 = encode_word("hell", _ranks(merges))
    assert "".join(enc2) == "hell" + END_OF_WORD


def test_encode_reconstructs_and_unknown_chars_pass_through():
    merges = train_bpe_from_counts([("abab", 10)], vocab_size=16)
    r = _ranks(merges)
    for w in ("abab", "ababab", "zq", "a"):
        assert "".join(encode_word(w, r)) == w + END_OF_WORD


def test_no_merges_means_char_tokens():
    enc = encode_word("abc", {})
    assert enc == ["a", "b", "c", END_OF_WORD]


def test_singleton_pairs_not_merged():
    # every pair occurs once — merging memorizes noise; trainer stops
    merges = train_bpe_from_counts([("abcdef", 1)], vocab_size=1000)
    assert merges == []


def test_vocab_size_bounds_merge_count():
    counts = [("aaa", 9), ("aab", 8), ("abb", 7), ("bbb", 6)]
    syms = 3  # 'a', 'b', end marker
    for vs in (syms + 1, syms + 3, syms + 5):
        merges = train_bpe_from_counts(counts, vocab_size=vs)
        assert len(merges) <= vs - syms


def test_train_bpe_distributed_matches_local(spark):
    texts = ["the cat sat on the mat", "the cat ate the rat",
             "a cat and a rat sat"] * 4
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = train_bpe(df, vocab_size=40)
    # local reference: same word counts, same loop
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    want = train_bpe_from_counts(
        sorted(wc.items(), key=lambda kv: (-kv[1], kv[0])), vocab_size=40)
    assert got == want
    assert got == train_bpe(df, vocab_size=40)  # deterministic re-run


def test_bpe_encode_table(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the the the"), (3, "")],
        "doc_id long, text string")
    merges = train_bpe(df, vocab_size=30)
    out = {r["doc_id"]: r for r in
           bpe_encode_table(df, merges, keep_tokens=True).collect()}
    assert out[3]["n_bpe_tokens"] == 0
    assert out[1]["n_bpe_tokens"] == len(out[1]["bpe_tokens"])
    # 'the' is the most frequent word -> fully merged single token
    assert "the" + END_OF_WORD in out[2]["bpe_tokens"]
    assert out[2]["n_bpe_tokens"] == 3
    # token concatenation reconstructs the normalized text
    joined = "".join(out[1]["bpe_tokens"]).replace(END_OF_WORD, " ").strip()
    assert joined == "the cat sat"


def test_bpe_on_documents_table(spark):
    df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(100)
    merges = train_bpe(df, vocab_size=300)
    assert len(merges) > 0
    enc = bpe_encode_table(df, merges)
    rows = enc.collect()
    assert len(rows) == 100
    # a learned vocab compresses: fewer BPE tokens than characters
    from pyspark.sql import functions as F
    chars = df.select(F.sum(F.length("text"))).collect()[0][0]
    assert sum(r["n_bpe_tokens"] for r in rows) < chars


def test_hamming_pairs_over_image_phash(spark):
    # the input_hint catalog carries phash:int64 — near-dup images are
    # exactly hamming_pairs over that column (no text involved)
    import numpy as np

    from azuresearchcrawlervector_spark.core.images import (
        generate_pixels, phash64)
    from azuresearchcrawlervector_spark.operators.dedup import hamming_pairs

    base = generate_pixels("ph-a", 64, 48)
    tweak = base.copy()
    tweak[0, 0] = (tweak[0, 0].astype(np.int32) ^ 3).astype(np.uint8)
    other = generate_pixels("ph-b", 64, 48)
    rows = [(1, phash64(base)), (2, phash64(tweak)), (3, phash64(other))]
    df = spark.createDataFrame(rows, "image_id long, phash long")
    got = hamming_pairs(df, "phash", id_col="image_id",
                        max_hamming=2).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (1, 2) in pairs          # one-pixel tweak: near-identical
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_null_text_yields_zero_tokens(spark):
    df = spark.createDataFrame([(1, "the cat"), (2, None)],
                               "doc_id long, text string")
    merges = train_bpe(df.filter("text is not null"), vocab_size=20)
    out = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_encode_table(df, merges).collect()}
    assert out[2] == 0 and out[1] > 0
