"""Byte-pair-encoding tokenizer: distributed training + encoding.

The training recipe follows how production trainers (HuggingFace
tokenizers, SentencePiece) actually work: BPE merge learning never
iterates over the corpus — it iterates over the WORD-FREQUENCY table,
which is vocabulary-bounded. So the distributed part is exactly one
corpus-scale aggregation (word counts, map-side combined), capped to
the top-V words; the merge loop then runs on that bounded table
driver-side (Sennrich et al. 2016, Algorithm 1). At 100 TB the word
count is the only thing that grows; V stays a config knob.

Encoding applies the learned merges greedily by rank. The merge table
is tiny (``num_merges`` rows, KBs), so it broadcasts into an
Arrow-batched pandas iterator — zero shuffle, scan-speed.

Determinism: counts are exact integers; the best-pair choice breaks
ties on (count DESC, pair lexicographic ASC) — a total order — so the
learned merges are identical on any cluster size or partitioning.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions import text as X

END_OF_WORD = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text",
                top_v: int = 10_000) -> DataFrame:
    """(word, n) for the ``top_v`` most frequent words — ONE corpus
    shuffle with map-side combine, then TakeOrdered for the bounded
    cap (ties broken on the word so membership is deterministic)."""
    return (
        docs.select(F.explode(X.tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(top_v)
    )


def _pair_counts(seqs: list[tuple[list[str], int]]) -> Counter:
    c: Counter = Counter()
    for sym, n in seqs:
        for a, b in zip(sym, sym[1:]):
            c[(a, b)] += n
    return c


def learn_merges(counts: list[tuple[str, int]],
                 num_merges: int) -> list[tuple[str, str]]:
    """Sennrich Algorithm 1 over a word-frequency list: each round
    merges the most frequent adjacent symbol pair (count DESC, pair
    ASC tie-break) in every word, stopping early when no pair repeats."""
    seqs = [(list(w) + [END_OF_WORD], n) for w, n in counts]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = _pair_counts(seqs)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:  # a pair seen once compresses nothing
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        for i, (sym, n) in enumerate(seqs):
            if a not in sym:
                continue
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            seqs[i] = (out, n)
    return merges


def train_bpe(docs: DataFrame, num_merges: int = 200,
              top_v: int = 10_000) -> list[tuple[str, str]]:
    """Distributed word count → driver-side merge learning. The
    collect is bounded by ``top_v`` BY CONSTRUCTION (the same bounded
    driver transfer as the IVF training sample)."""
    rows = word_counts(docs, top_v=top_v).collect()
    return learn_merges([(r.word, r.n) for r in rows], num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the standard BPE
    inference rule — mirrors training order, so training words round-
    trip to their final training segmentation)."""
    sym = list(word) + [END_OF_WORD]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def encode_docs(docs: DataFrame, merges: list[tuple[str, str]],
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_pieces, first_pieces) per document — merges broadcast
    inside the Arrow-batched closure, zero shuffle. ``first_pieces``
    is a '|'-joined STRING (driver-hashable, the array-output rule)."""
    ranks = {p: i for i, p in enumerate(merges)}
    schema = "doc_id long, n_pieces long, first_pieces string"

    def batches(it):
        for pdf in it:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"].fillna("")):
                pieces: list[str] = []
                for w in _py_tokenize(text):
                    pieces.extend(encode_word(w, ranks))
                out.append((doc_id, len(pieces), "|".join(pieces[:12])))
            yield pd.DataFrame(out, columns=["doc_id", "n_pieces",
                                             "first_pieces"])

    return docs.select("doc_id", F.col(text_col).alias("text")) \
        .mapInPandas(batches, schema)


def _py_tokenize(text: str) -> list[str]:
    """Python mirror of functions.text.tokenize (lowercase \\w+).

    ``re.ASCII`` is load-bearing: Java regex (Spark's split, which
    produced the word counts this encoder's merges were trained on)
    treats ``\\w`` as ASCII-only, while Python 3 defaults to Unicode —
    without the flag 'café' tokenizes differently here than in
    training and the encoded pieces leave the trained vocabulary."""
    import re

    return [t for t in re.split(r"\W+", text.lower(), flags=re.ASCII) if t]
