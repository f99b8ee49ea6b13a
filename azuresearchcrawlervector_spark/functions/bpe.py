"""Real byte-pair-encoding tokenizer for training-data pipelines:
deterministic distributed training + Arrow-batched encoding.

Spark-first split of the classic Sennrich-style BPE trainer:
- the CORPUS-sized work — word frequency counting — is ONE distributed
  groupBy (map-side combinable, scales to any corpus); the result is
  capped at the top `max_words` by (count desc, word asc), a bounded
  table that covers almost all token mass at any scale,
- the merge loop runs driver-side over that compact word-frequency
  table (the standard practice: sentencepiece/subword-nmt train from
  word counts, not from the raw corpus), fully deterministic —
  ties broken by (count desc, pair lexicographic).

Encoding is an Arrow-batched mapInPandas kernel with per-batch
word-level memoization (each DISTINCT word is merged once per batch),
the merge table riding along as a broadcast-sized plain list.

The reference repo has no tokenizer (its indexer truncates raw text,
AzureSearchIndexer.cs); this operator is part of the LLM-data-pipeline
family the Spark engine adds (token statistics with a REAL learned
vocab instead of the regex estimate in functions/text.py).
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

END_OF_WORD = "▁"  # marks word end inside symbol sequences


# ------------------------------------------------------------- training
def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END_OF_WORD,)


def train_bpe_from_counts(word_counts: list[tuple[str, int]],
                          vocab_size: int) -> list[tuple[str, str]]:
    """Driver-side merge loop over a (word, count) table. Returns the
    ordered merge list; vocab = initial symbols (distinct characters
    incl. the end-of-word marker) + one entry per merge, so
    len(merges) = vocab_size - |symbols|. Deterministic: pair ties
    break lexicographically."""
    words = {_word_symbols(w): int(c) for w, c in word_counts if w}
    chars = {s for syms in words for s in syms}
    merges: list[tuple[str, str]] = []
    target_merges = max(0, vocab_size - len(chars))
    # pair counts maintained incrementally: recount only words that
    # contained the merged pair
    pair_counts: dict[tuple[str, str], int] = {}
    for syms, c in words.items():
        for i in range(len(syms) - 1):
            pair_counts[syms[i], syms[i + 1]] = (
                pair_counts.get((syms[i], syms[i + 1]), 0) + c)
    while len(merges) < target_merges and pair_counts:
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing repeats — further merges are noise
        merges.append(best)
        a, b = best
        merged = a + b
        new_words = {}
        for syms, c in words.items():
            if best not in zip(syms, syms[1:]):
                new_words[syms] = new_words.get(syms, 0) + c
                continue
            # un-count old pairs, apply merge, re-count new pairs
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
            out = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms2 = tuple(out)
            for i in range(len(syms2) - 1):
                p = (syms2[i], syms2[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
            new_words[syms2] = new_words.get(syms2, 0) + c
        words = new_words
    return merges


def train_bpe(df: DataFrame, text_col: str = "text",
              vocab_size: int = 512,
              max_words: int = 1_000_000) -> list[tuple[str, str]]:
    """Distributed word counting (one groupBy over the corpus, map-side
    combinable) capped at the top `max_words` words by (count desc,
    word asc) — the only corpus-sized stage — then the deterministic
    driver-side merge loop. The driver holds O(max_words), never the
    corpus."""
    wc = (
        df.select(F.explode(
            F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").count()
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    return train_bpe_from_counts([(r["word"], r["count"]) for r in wc],
                                 vocab_size)


# ------------------------------------------------------------- encoding
def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE merge of one word."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


BPE_SCHEMA = "doc_id long, n_bpe_tokens int, bpe_tokens array<string>"


def bpe_encode_table(df: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text", id_col: str = "doc_id",
                     keep_tokens: bool = False) -> DataFrame:
    """(doc_id, n_bpe_tokens[, bpe_tokens]) per document. The merge
    table is a plain broadcast-sized list captured in the closure;
    per-batch word memoization means each DISTINCT word in an Arrow
    batch is merged once regardless of its frequency."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            ids, counts, toks = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                doc_tokens: list[str] = []
                # NULL text -> 0 tokens (str(None) would tokenize the
                # literal word 'none'), matching train_bpe's split
                for w in ("" if text is None else str(text)).lower().split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    doc_tokens.extend(enc)
                ids.append(did)
                counts.append(len(doc_tokens))
                toks.append(doc_tokens if keep_tokens else [])
            yield pd.DataFrame({
                "doc_id": ids,
                "n_bpe_tokens": pd.Series(counts, dtype="int32"),
                "bpe_tokens": toks,
            })

    return df.select(F.col(id_col).alias(id_col),
                     F.col(text_col)).mapInPandas(run, schema=BPE_SCHEMA)
