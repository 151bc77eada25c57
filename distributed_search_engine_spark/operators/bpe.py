"""Byte-pair-encoding tokenizer: distributed training pass + distributed
encode (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units" §3.2).

Completes the ``text_analysis.bpe_pair_counts`` kernel (one gated merge
iteration) into a full tokenizer:

- **train**: the corpus-scale work is ONE ``groupBy(word)`` — after that
  the distinct-word table is vocab-sized (Heaps' law: ~1M words at
  100 TB), so the merge loop runs on the driver over a dict that fits in
  memory, exactly like production BPE trainers (HuggingFace/SentencePiece
  train on word counts, not the raw stream). ``max_vocab_words`` caps the
  collected table (count-desc, word-asc — deterministic) as the knob for
  adversarial vocabularies.
- **encode**: merges broadcast to executors; an Arrow-batched pandas UDF
  applies them per DISTINCT word in the batch (per-batch word cache —
  Zipf makes the hit rate ~(1 - vocab/stream) so the per-word merge loop
  runs ~vocab times per batch, not ~stream times).

Word-internal BPE without an end-of-word marker: subwords of a word
concatenate back to the word (round-trip tested). The merge-apply is the
rank-order variant (apply merge 1 to every word, then merge 2, ...) —
equivalent to the min-rank greedy loop because ranks are consistent, and
O(|word|) per merge via a single left-to-right scan.

The TRAIN loop is iterative with data-dependent ranks (genuinely
non-SQL), but the ENCODE of a fixed trained merge list is deterministic —
so the driver-contract entry is a FULL hash gate against a Python-
materialized expected table (``__spark_entry__._bpe_expected_sql``: same
tokenizer + these kernels, inlined as VALUES with a per-doc subword-
sequence md5). pytest additionally pins the algorithmic contract,
including a cross-check that train()'s first merge equals the gated
``text_bpe_pairs`` top-1.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import text as T


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    c: Counter = Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += n
    return c


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """One left-to-right non-overlapping pass merging ``pair``."""
    a, b = pair
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 200,
    max_vocab_words: int = 200_000,
    doc_id_col: str = "doc_id",
    content_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in rank
    order. Ties break (count desc, pair asc) — fully deterministic, and
    rank 1 equals the gated ``bpe_pair_counts`` top row by construction.

    The driver loop is the textbook O(n_merges * vocab) form; production
    trainers amortize with an inverted pair->words index, which drops in
    here without changing results (the loop is driver-side Python either
    way — the DISTRIBUTED cost is only the word-count groupBy)."""
    wc = (
        docs.select(F.explode(T.tokens_col(F.col(content_col))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("wc"))
        .orderBy(F.desc("wc"), F.asc("tok"))
        .limit(max_vocab_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in wc:
        vocab[tuple(r["tok"])] = vocab.get(tuple(r["tok"]), 0) + r["wc"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            m = _merge_word(syms, best)
            nxt[m] = nxt.get(m, 0) + n
        vocab = nxt
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Min-rank greedy merge loop (GPT-2-style apply); equivalent to
    applying the merges in rank order."""
    syms: tuple[str, ...] = tuple(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair)
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    doc_id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_subwords, subwords): the corpus encoded with a
    trained merge list. Map-side only — the merge table rides the closure
    (vocab-sized; Spark broadcasts task binaries >1 MB automatically, or
    pass fewer merges), no shuffle, no collect."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def enc(col: pd.Series) -> pd.Series:
        cache: dict[str, tuple[str, ...]] = {}
        out = []
        for text in col:
            subs: list[str] = []
            for w in T.tokenize_py(text or ""):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                subs.extend(got)
            out.append(subs)
        return pd.Series(out)

    nw = F.size(
        F.filter(T.tokens_col(F.col(content_col)), lambda t: t != F.lit(""))
    )
    return docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        nw.cast("int").alias("n_words"),
        enc(F.col(content_col)).alias("subwords"),
    ).select(
        "doc_id",
        "n_words",
        F.size("subwords").cast("int").alias("n_subwords"),
        "subwords",
    )
